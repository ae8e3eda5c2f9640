"""Equivariant gate nonlinearity (e3nn ``nn.Gate`` equivalent).

Input layout: ``scalars + gates + gated`` (concatenated irreps, in that
order, exactly the ``get_gate_irreps_in`` convention of the reference
``EquivariantGate``, ``sevenn/nn/equivariant_gate.py:13-59``). Output:
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

    def __post_init__(self):
        if len(self.irreps_scalars) or len(self.irreps_gates) or len(self.irreps_gated):
            return
        scalars = [mi for mi in self.irreps_out if mi.ir.l == 0]
        gated = [mi for mi in self.irreps_out if mi.ir.l > 0]
        gate_p = 1 if any(mi.ir.p == 1 for mi in scalars) else -1
        gates = [MulIrrep(mi.mul, Irrep(0, gate_p)) for mi in gated]
        object.__setattr__(self, "irreps_scalars", Irreps(scalars))
        object.__setattr__(self, "irreps_gates", Irreps(gates))
        object.__setattr__(self, "irreps_gated", Irreps(gated))

    @property
    def irreps_in(self) -> Irreps:
        return self.irreps_scalars + self.irreps_gates + self.irreps_gated

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
    scalars = x[..., :n_s]
    gates = x[..., n_s : n_s + n_g]
    gated = x[..., n_s + n_g :]

    pieces = []
    off = 0
    for mi in spec.irreps_scalars:
        act = spec._act(spec.act_scalar, mi.ir.p)
        pieces.append(act(scalars[..., off : off + mi.dim]))
        off += mi.dim
    # activate gates
    g_act = []
    off = 0
    for mi in spec.irreps_gates:
        act = spec._act(spec.act_gate, mi.ir.p)
        g_act.append(act(gates[..., off : off + mi.dim]))
        off += mi.dim
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
