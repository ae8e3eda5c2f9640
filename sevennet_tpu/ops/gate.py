"""Equivariant gate nonlinearity (e3nn ``nn.Gate`` equivalent).

Input layout: e3nn's ``_Sortcut`` convention — the scalar part is
``(irreps_scalars + irreps_gates)`` *stably sorted by irrep and
simplified*, followed by the gated irreps (this is what the reference's
``EquivariantGate.get_gate_irreps_in`` returns,
``sevenn/nn/equivariant_gate.py:50-55``; verified against the frozen
reference TorchScript in tests/test_deployed_golden.py). When scalars and
gates are all ``0e`` (every non-parity model) the sort is a no-op and the
layout degenerates to plain ``scalars + gates + gated``. Output:
``act(scalars) + act(gates) * gated``.

The elementwise product with a scalar gate is exactly multiplicative: the
e3nn elementwise TP's ``sqrt(2l+1)`` path weight cancels the
``1/sqrt(2l+1)`` of the (l,0,l) Wigner table. Activations use
``normalize2mom`` constants (see :mod:`sevennet_tpu.ops.activations`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax.numpy as jnp

from ..irreps import Irrep, Irreps, MulIrrep
from .activations import NORMALIZED_ACTIVATION, ACT_PARITY

__all__ = ["GateSpec", "gate_apply"]


@dataclass(frozen=True)
class GateSpec:
    """Built from the *output* irreps of a layer (scalars first is NOT
    assumed; blocks are classified by l)."""

    irreps_out: Irreps  # the layer output irreps (post-gate)
    act_scalar: Tuple[Tuple[str, str], ...]  # (('e','silu'), ('o','tanh'))
    act_gate: Tuple[Tuple[str, str], ...]
    # derived
    irreps_scalars: Irreps = field(default=Irreps())
    irreps_gates: Irreps = field(default=Irreps())
    irreps_gated: Irreps = field(default=Irreps())
    # e3nn _Sortcut layout of the scalar part: (('s'|'g', entry_index), ...)
    # in input order — the stable sort of scalars+gates by irrep
    sc_entries: Tuple[Tuple[str, int], ...] = field(default=())

    def __post_init__(self):
        if len(self.irreps_scalars) or len(self.irreps_gates) or len(self.irreps_gated):
            return
        scalars = [mi for mi in self.irreps_out if mi.ir.l == 0]
        gated = [mi for mi in self.irreps_out if mi.ir.l > 0]
        gate_p = 1 if any(mi.ir.p == 1 for mi in scalars) else -1
        gates = [MulIrrep(mi.mul, Irrep(0, gate_p)) for mi in gated]
        entries = [("s", i) for i in range(len(scalars))] + [
            ("g", i) for i in range(len(gates))
        ]
        pool = {"s": scalars, "g": gates}
        entries.sort(key=lambda e: pool[e[0]][e[1]].ir._sort_key())  # stable
        object.__setattr__(self, "irreps_scalars", Irreps(scalars))
        object.__setattr__(self, "irreps_gates", Irreps(gates))
        object.__setattr__(self, "irreps_gated", Irreps(gated))
        object.__setattr__(self, "sc_entries", tuple(entries))

    @property
    def irreps_in(self) -> Irreps:
        pool = {"s": self.irreps_scalars, "g": self.irreps_gates}
        head = Irreps([pool[kind][i] for kind, i in self.sc_entries])
        return head.simplify() + self.irreps_gated

    def _act(self, table, p: int):
        d = dict(table)
        name = d["e" if p == 1 else "o"]
        if p == -1:
            assert ACT_PARITY.get(name, 0) == -1, (
                f"activation {name} for odd scalars must be an odd function"
            )
        return NORMALIZED_ACTIVATION[name]


def gate_apply(spec: GateSpec, x):
    """x: (..., irreps_in.dim) -> (..., irreps_out.dim).

    Output block order: scalars then gated, which equals ``irreps_out`` order
    because SevenNet layer irreps are sorted (scalars first).
    """
    n_s = spec.irreps_scalars.dim
    n_g = spec.irreps_gates.dim
    # split the sortcut head back into scalar / gate blocks (e3nn _Sortcut
    # inverse): walk the stably-sorted entries and route each block
    pool = {"s": spec.irreps_scalars, "g": spec.irreps_gates}
    s_blocks = [None] * len(spec.irreps_scalars)
    g_blocks = [None] * len(spec.irreps_gates)
    off = 0
    for kind, i in spec.sc_entries:
        mi = pool[kind][i]
        blk = x[..., off : off + mi.dim]
        (s_blocks if kind == "s" else g_blocks)[i] = blk
        off += mi.dim
    assert off == n_s + n_g
    gated = x[..., off:]

    pieces = []
    for mi, blk in zip(spec.irreps_scalars, s_blocks):
        act = spec._act(spec.act_scalar, mi.ir.p)
        pieces.append(act(blk))
    # activate gates
    g_act = []
    for mi, blk in zip(spec.irreps_gates, g_blocks):
        act = spec._act(spec.act_gate, mi.ir.p)
        g_act.append(act(blk))
    # multiply gated blocks (ir_mul layout: (2l+1, mul), gate broadcasts
    # over the spherical dimension)
    off = 0
    for mi, g in zip(spec.irreps_gated, g_act):
        blk = gated[..., off : off + mi.dim]
        lead = blk.shape[:-1]
        blk = blk.reshape(*lead, mi.ir.dim, mi.mul) * g[..., None, :]
        pieces.append(blk.reshape(*lead, mi.dim))
        off += mi.dim
    return jnp.concatenate(pieces, axis=-1)
