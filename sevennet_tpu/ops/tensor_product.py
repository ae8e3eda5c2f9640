"""Equivariant tensor products.

Two flavors used by the NequIP-style interaction block:

- :class:`ConvTPSpec` — the per-edge ``uvu`` tensor product between node
  features and spherical-harmonic filters with per-edge weights from the
  radial MLP. Mirrors the instruction construction of the reference
  ``IrrepsConvolution`` (``sevenn/nn/convolution.py:61-91``): one instruction
  per ``(x block, filter block, output irrep)`` triple with ``l3`` allowed by
  a target irreps set; outputs sorted by irrep (stable), instructions sorted
  by output block; per-edge weight vector is consumed in sorted-instruction
  order, ``mul_x`` entries each.

- :class:`FCTPSpec` — the fully-connected (``uvw``) tensor product used for
  the 'nequip' self-connection (``sevenn/nn/self_connection.py:11-67``),
  with internal weights of shape ``(mul1, mul2, mul_out)`` per instruction.

Normalization follows e3nn (``normalization='component'``,
``path_normalization='element'``): instruction path weight
``sqrt((2*l3+1) / fan)`` where ``fan`` sums ``num_elements`` over
instructions sharing the output block (``num_elements``: ``mul2`` for uvu,
``mul1*mul2`` for uvw). Wigner tables from :mod:`sevennet_tpu.so3.wigner`
match e3nn >= 0.5.0 exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..irreps import Irreps, MulIrrep
from ..so3.wigner import real_wigner_3j

__all__ = [
    "ConvTPSpec",
    "conv_tp_weight_numel",
    "conv_tp_apply",
    "FCTPSpec",
    "fctp_init",
    "fctp_apply",
]


@dataclass(frozen=True)
class ConvTPSpec:
    """uvu tensor product x (x) filter with external per-edge weights."""

    irreps_x: Irreps
    irreps_filter: Irreps
    irreps_out_target: Irreps  # which output irreps are kept (l-drop filter)
    # derived
    irreps_mid: Irreps = field(default=Irreps())
    # (i_in1, i_in2, i_out_sorted, path_weight), sorted by i_out
    instructions: Tuple[Tuple[int, int, int, float], ...] = field(default=())
    # same triples in construction (enumeration) order: the weight layout of
    # pre-v0.11 reference checkpoints and frozen TorchScript deployments
    # (reference sorts instructions since v0.11 for cuEq compatibility and
    # permutes old weights at load: sevenn/scripts/backward_compatibility.py:79-160)
    instructions_enum: Tuple[Tuple[int, int, int], ...] = field(default=())

    def __post_init__(self):
        if self.instructions:
            return
        ins = []
        mid: List[MulIrrep] = []
        for i, mi_x in enumerate(self.irreps_x):
            for j, mi_f in enumerate(self.irreps_filter):
                for ir_out in mi_x.ir * mi_f.ir:
                    if ir_out in self.irreps_out_target:
                        k = len(mid)
                        mid.append(MulIrrep(mi_x.mul, ir_out))
                        ins.append((i, j, k))
        irreps_mid = Irreps(mid)
        irreps_mid_sorted, p, _ = irreps_mid.sort()
        ins = [(i, j, p[k]) for (i, j, k) in ins]
        ins_enum = tuple(ins)
        ins.sort(key=lambda t: t[2])
        # path weights: fan = sum of num_elements (mul2) over same output block;
        # each uvu instruction has its own output block here so fan = mul2.
        fan = {}
        for i, j, k in ins:
            fan[k] = fan.get(k, 0) + self.irreps_filter[j].mul
        full = tuple(
            (
                i,
                j,
                k,
                float(np.sqrt(irreps_mid_sorted[k].ir.dim / fan[k])),
            )
            for (i, j, k) in ins
        )
        object.__setattr__(self, "irreps_mid", irreps_mid_sorted)
        object.__setattr__(self, "instructions", full)
        object.__setattr__(self, "instructions_enum", ins_enum)

    @property
    def weight_numel(self) -> int:
        return sum(self.irreps_x[i].mul * self.irreps_filter[j].mul
                   for i, j, _, _ in self.instructions)


def conv_tp_weight_numel(spec: ConvTPSpec) -> int:
    return spec.weight_numel


def conv_tp_apply(spec: ConvTPSpec, x, filt, weight):
    """Per-edge message: x (E, dim_x), filt (E, dim_f), weight (E, numel)
    -> (E, dim_mid).

    Weight entries are consumed per instruction (sorted order), mul_x*mul_f
    each, mirroring e3nn TensorProduct with shared_weights=False.
    """
    xs = spec.irreps_x.slices()
    fs = spec.irreps_filter.slices()
    E = x.shape[0]
    out = [None] * len(spec.irreps_mid)
    w_off = 0
    for i, j, k, pw in spec.instructions:
        mi_x = spec.irreps_x[i]
        mi_f = spec.irreps_filter[j]
        mi_o = spec.irreps_mid[k]
        assert mi_f.mul == 1, "filter irreps must have multiplicity 1"
        w3j = jnp.asarray(
            real_wigner_3j(mi_x.ir.l, mi_f.ir.l, mi_o.ir.l), dtype=x.dtype
        )
        # ir_mul layout: block = (2l+1, mul); minor dim = multiplicity
        xb = x[:, xs[i]].reshape(E, mi_x.ir.dim, mi_x.mul)
        fb = filt[:, fs[j]]  # (E, d2)
        wb = weight[:, w_off : w_off + mi_x.mul]  # (E, mul)
        w_off += mi_x.mul * mi_f.mul
        # tmp[e, m1, m3] = sum_m2 w3j[m1, m2, m3] fb[e, m2]  (tiny)
        tmp = jnp.einsum("mnp,en->emp", w3j, fb)
        xw = xb * (pw * wb)[:, None, :]  # (E, d1, mul)
        # batched small-contraction over m; output minor dim = mul
        msg = jnp.einsum("emp,emu->epu", tmp, xw)
        out[k] = msg if out[k] is None else out[k] + msg
    # Assemble output. Under the ir_mul layout, adjacent blocks with the
    # SAME irrep must be joined along the mul axis before flattening so the
    # downstream Linear (built on irreps_mid.simplify()) reads one
    # contiguous (2l+1, total_mul) block with multiplicities in sorted-block
    # order (= e3nn's simplified order).
    pieces = []
    k = 0
    n_blocks = len(spec.irreps_mid)
    while k < n_blocks:
        ir = spec.irreps_mid[k].ir
        group = []
        while k < n_blocks and spec.irreps_mid[k].ir == ir:
            mi = spec.irreps_mid[k]
            blk = out[k]
            if blk is None:
                blk = jnp.zeros((E, mi.ir.dim, mi.mul), dtype=x.dtype)
            group.append(blk)
            k += 1
        joined = group[0] if len(group) == 1 else jnp.concatenate(group, axis=-1)
        pieces.append(joined.reshape(E, -1))
    return jnp.concatenate(pieces, axis=-1)


@dataclass(frozen=True)
class FCTPSpec:
    """Fully-connected (uvw) tensor product with internal weights."""

    irreps_in1: Irreps
    irreps_in2: Irreps
    irreps_out: Irreps
    # derived: (i1, i2, i_out, path_weight)
    instructions: Tuple[Tuple[int, int, int, float], ...] = field(default=())

    def __post_init__(self):
        if self.instructions:
            return
        ins = []
        for i1, mi1 in enumerate(self.irreps_in1):
            for i2, mi2 in enumerate(self.irreps_in2):
                for i_out, mi_o in enumerate(self.irreps_out):
                    if mi_o.ir in mi1.ir * mi2.ir:
                        ins.append((i1, i2, i_out))
        fan = {}
        for i1, i2, i_out in ins:
            fan[i_out] = fan.get(i_out, 0) + (
                self.irreps_in1[i1].mul * self.irreps_in2[i2].mul
            )
        full = tuple(
            (
                i1,
                i2,
                i_out,
                float(np.sqrt(self.irreps_out[i_out].ir.dim / fan[i_out])),
            )
            for (i1, i2, i_out) in ins
        )
        object.__setattr__(self, "instructions", full)

    @property
    def weight_shapes(self) -> List[Tuple[int, int, int]]:
        return [
            (
                self.irreps_in1[i1].mul,
                self.irreps_in2[i2].mul,
                self.irreps_out[io].mul,
            )
            for i1, i2, io, _ in self.instructions
        ]

    @property
    def weight_numel(self) -> int:
        return sum(a * b * c for a, b, c in self.weight_shapes)


def fctp_init(key, spec: FCTPSpec, dtype=jnp.float32):
    keys = jax.random.split(key, max(len(spec.instructions), 1))
    ws = [
        jax.random.normal(k, shape, dtype=dtype)
        for k, shape in zip(keys, spec.weight_shapes)
    ]
    return {"w": ws}


def fctp_apply(spec: FCTPSpec, params, x1, x2):
    """x1: (N, dim1), x2: (N, dim2) -> (N, dim_out)."""
    s1 = spec.irreps_in1.slices()
    s2 = spec.irreps_in2.slices()
    N = x1.shape[0]
    out = [None] * len(spec.irreps_out)
    for (i1, i2, io, pw), w in zip(spec.instructions, params["w"]):
        mi1, mi2, mio = spec.irreps_in1[i1], spec.irreps_in2[i2], spec.irreps_out[io]
        w3j = jnp.asarray(
            real_wigner_3j(mi1.ir.l, mi2.ir.l, mio.ir.l), dtype=x1.dtype
        )
        # ir_mul layout: (2l+1, mul) blocks
        xb = x1[:, s1[i1]].reshape(N, mi1.ir.dim, mi1.mul)
        yb = x2[:, s2[i2]].reshape(N, mi2.ir.dim, mi2.mul)
        blk = pw * jnp.einsum("nmu,nkv,mkp,uvw->npw", xb, yb, w3j, w)
        out[io] = blk if out[io] is None else out[io] + blk
    pieces = []
    for io, mi in enumerate(spec.irreps_out):
        blk = out[io]
        if blk is None:
            blk = jnp.zeros((N, mi.ir.dim, mi.mul), dtype=x1.dtype)
        pieces.append(blk.reshape(N, mi.dim))
    return jnp.concatenate(pieces, axis=-1)
