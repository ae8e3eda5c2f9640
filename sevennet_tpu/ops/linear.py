"""Equivariant linear layer (e3nn ``o3.Linear`` equivalent).

An equivariant linear map mixes multiplicities within each irrep block and
never mixes different irreps. Weight layout, instruction order and
normalization mirror e3nn so stock SevenNet checkpoints load exactly:

- instructions: ``(i_in, i_out)`` for every pair with equal irreps,
  generated with ``i_in`` as the outer loop;
- forward scaling ``alpha(i_out) = 1/sqrt(fan_in)`` with
  ``fan_in = sum(mul_in)`` over instructions into ``i_out``
  (e3nn ``path_normalization='element'``);
- weights are stored per instruction as ``(mul_in, mul_out)`` matrices; the
  flat checkpoint vector is their row-major concatenation;
- biases exist only for scalar (0e) outputs and are unscaled.

Used by the reference as ``IrrepsLinear`` (``sevenn/nn/linear.py:14-100``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..irreps import Irreps

__all__ = ["LinearSpec", "linear_init", "linear_apply", "linear_pack", "linear_unpack"]


@dataclass(frozen=True)
class LinearSpec:
    irreps_in: Irreps
    irreps_out: Irreps
    biases: bool = False
    # derived
    instructions: Tuple[Tuple[int, int, float], ...] = field(default=())

    def __post_init__(self):
        if self.instructions:
            return
        ins = [
            (i_in, i_out)
            for i_in, mi_in in enumerate(self.irreps_in)
            for i_out, mi_out in enumerate(self.irreps_out)
            if mi_in.ir == mi_out.ir
        ]
        fan = {}
        for i_in, i_out in ins:
            fan[i_out] = fan.get(i_out, 0) + self.irreps_in[i_in].mul
        full = tuple(
            (i_in, i_out, float(1.0 / np.sqrt(fan[i_out]))) for i_in, i_out in ins
        )
        object.__setattr__(self, "instructions", full)

    @property
    def weight_shapes(self) -> List[Tuple[int, int]]:
        return [
            (self.irreps_in[i].mul, self.irreps_out[j].mul)
            for i, j, _ in self.instructions
        ]

    @property
    def bias_numel(self) -> int:
        if not self.biases:
            return 0
        return sum(mi.mul for mi in self.irreps_out if mi.ir.l == 0 and mi.ir.p == 1)


def linear_init(key, spec: LinearSpec, dtype=jnp.float32):
    ws = []
    keys = jax.random.split(key, max(len(spec.instructions), 1))
    for k, shape in zip(keys, spec.weight_shapes):
        ws.append(jax.random.normal(k, shape, dtype=dtype))
    params = {"w": ws}
    if spec.biases:
        params["b"] = jnp.zeros((spec.bias_numel,), dtype=dtype)
    return params


def linear_apply(spec: LinearSpec, params, x):
    """x: (..., dim_in) -> (..., dim_out).

    TPU layout note: feature blocks are stored **ir_mul** — ``(2l+1, mul)``
    within the flat axis — so the minor (lane) dimension is the
    multiplicity (>=32) rather than the tiny spherical dimension; the block
    matmul contracts the lane axis on the MXU. (Same trick as
    cuEquivariance's 'ir_mul' layout.) The layout is internal: checkpoint
    weights act on multiplicity indices only and are layout-independent.
    """
    in_slices = spec.irreps_in.slices()
    out_blocks: List[Optional[jnp.ndarray]] = [None] * len(spec.irreps_out)
    lead = x.shape[:-1]
    for (i_in, i_out, alpha), w in zip(spec.instructions, params["w"]):
        mi_in = spec.irreps_in[i_in]
        d = mi_in.ir.dim
        xb = x[..., in_slices[i_in]].reshape(*lead, d, mi_in.mul)
        yb = jnp.einsum("...du,uv->...dv", xb, w) * alpha
        if out_blocks[i_out] is None:
            out_blocks[i_out] = yb
        else:
            out_blocks[i_out] = out_blocks[i_out] + yb

    if spec.biases and "b" in params:
        b = params["b"]
        off = 0
        for j, mi in enumerate(spec.irreps_out):
            if mi.ir.l == 0 and mi.ir.p == 1:
                bj = b[off : off + mi.mul].reshape(
                    (1,) * len(lead) + (1, mi.mul)
                )
                if out_blocks[j] is None:
                    out_blocks[j] = jnp.broadcast_to(bj, (*lead, 1, mi.mul)).astype(x.dtype)
                else:
                    out_blocks[j] = out_blocks[j] + bj
                off += mi.mul

    pieces = []
    for j, mi in enumerate(spec.irreps_out):
        blk = out_blocks[j]
        if blk is None:
            blk = jnp.zeros((*lead, mi.ir.dim, mi.mul), dtype=x.dtype)
        pieces.append(blk.reshape(*lead, mi.dim))
    return jnp.concatenate(pieces, axis=-1)


def linear_pack(spec: LinearSpec, params) -> np.ndarray:
    """Flatten instruction weights to the e3nn checkpoint layout."""
    return np.concatenate([np.asarray(w).reshape(-1) for w in params["w"]] or [np.zeros(0)])


def linear_unpack(spec: LinearSpec, flat: np.ndarray, bias: Optional[np.ndarray] = None):
    ws = []
    off = 0
    for shape in spec.weight_shapes:
        n = shape[0] * shape[1]
        ws.append(jnp.asarray(flat[off : off + n].reshape(shape)))
        off += n
    assert off == len(flat), f"weight numel mismatch: {off} != {len(flat)}"
    params = {"w": ws}
    if spec.biases:
        assert bias is not None and len(bias) == spec.bias_numel
        params["b"] = jnp.asarray(bias)
    return params
