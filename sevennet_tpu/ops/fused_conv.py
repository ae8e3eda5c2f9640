"""Production Pallas TPU kernel: fused radial-MLP + uvu tensor product +
neighbor reduction over the dense (N, K) layout.

TPU analogue of the reference's kernel accelerators (cuEquivariance /
FlashTP / OpenEquivariance, ``sevenn/nn/cue_helper.py:53-124``,
``flash_helper.py:32-48``): one kernel per atom block computes the radial
weights from the edge embedding (the (N, K, numel) weight tensor never
exists in HBM), contracts the Wigner-coupled ``uvu`` product, and reduces
over the K neighbor slots — all in VMEM.

Key structure (round-2 redesign; round-1's fori_loop+switch kernel was
5.9x slower than XLA because it serialized the VPU work):

- the radial MLP and the packed Wigner contraction ``tmp = sh @ W3J^T``
  are MXU matmuls on (T, ·) edge blocks;
- the 15-instruction uvu TP is **fully unrolled** at trace time;
  (m, p) pairs whose w3j column is structurally zero are skipped;
- edge blocks are **k-major** (row t = k*A + a): the K-reduction becomes
  a log2(K) chain of sublane halving adds on 8-aligned slices — measured
  16.6 ms/layer cheaper than the a-major ``(A, K, mul).sum(1)``
  sublane-group reduce, which Mosaic scalarizes into strided sub-tile
  adds;
- each (instruction, p) owns a disjoint output column range, so stores
  need no accumulation;
- per-edge weights never leave VMEM;
- in-kernel matmuls run ``precision=HIGHEST`` (bf16x3 passes): the kernel
  matches the fp32 XLA path to ~1e-6 (default bf16 passes gave 2e-2).

Forward only in this module; :mod:`ops.dense_conv` wires it (and the
mirror-edge backward) into ``jax.custom_vjp``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..so3.wigner import real_wigner_3j
from .activations import NORMALIZE2MOM_CST
from .dense_conv import mid_layout
from .mlp import ScalarMLPSpec
from .tensor_product import ConvTPSpec

__all__ = ["make_fused_conv_fwd", "fused_conv_block_atoms"]


def _instr_tables(conv: ConvTPSpec, parity_flip: bool = False):
    """Static per-instruction metadata + the packed Wigner matrix.

    Returns (instr, w3j_pack, dim_mid, numel) where ``w3j_pack`` is
    (R, dim_f) with one row per *active* (instruction, m, p) pair:
    ``tmp = sh @ w3j_pack.T`` yields every scalar the TP inner loop
    broadcasts. ``parity_flip`` multiplies each instruction by
    (-1)^l_filter (the mirror-edge backward table, see dense_conv.py).
    """
    xs = conv.irreps_x.slices()
    fs = conv.irreps_filter.slices()
    layout, dim_mid = mid_layout(conv)

    rows: List[np.ndarray] = []
    instr = []
    w_off = 0
    dim_f = conv.irreps_filter.dim
    for idx, (i, j, k, pw) in enumerate(conv.instructions):
        mi_x = conv.irreps_x[i]
        mi_f = conv.irreps_filter[j]
        mi_o = conv.irreps_mid[k]
        d1, d3, mul = mi_x.ir.dim, mi_o.ir.dim, mi_x.mul
        w3j = np.asarray(
            real_wigner_3j(mi_x.ir.l, mi_f.ir.l, mi_o.ir.l), np.float64
        ) * pw
        if parity_flip:
            w3j = w3j * ((-1.0) ** mi_f.ir.l)
        fsl = fs[j]
        mp = []
        for m in range(d1):
            for p in range(d3):
                colv = w3j[m, :, p]
                if np.any(colv != 0.0):
                    row = np.zeros(dim_f, np.float64)
                    row[fsl.start : fsl.stop] = colv
                    mp.append((m, p, len(rows)))
                    rows.append(row)
        g_start, p_dim, u_off, u_tot = layout[k]
        instr.append(
            dict(
                x_start=xs[i].start, d1=d1, d3=d3, mul=mul,
                w_start=w_off, mp=tuple(mp),
                g_start=g_start, u_off=u_off, u_tot=u_tot,
            )
        )
        w_off += mul
    w3j_pack = np.stack(rows, 0).astype(np.float32)  # (R, dim_f)
    return instr, w3j_pack, dim_mid, w_off


def fused_conv_block_atoms(K: int, target_t: int = 1536) -> int:
    """Pick atoms-per-block A (multiple of 8, A*K near target_t)."""
    assert K % 8 == 0, "dense neighbor capacity K must be a multiple of 8"
    return max(8, int(round(target_t / K / 8)) * 8)


def to_k_major(arr_nk, A: int):
    """(N, K, ...) -> flat (N*K, ...) rows ordered ``b*K*A + k*A + a``
    (the kernel's k-major block layout). N must be a multiple of A."""
    N, K = arr_nk.shape[0], arr_nk.shape[1]
    assert N % A == 0, (N, A)
    tail = arr_nk.shape[2:]
    return (
        arr_nk.reshape(N // A, A, K, *tail)
        .swapaxes(1, 2)
        .reshape(N * K, *tail)
    )


def from_k_major_edges(arr_flat, N: int, K: int, A: int):
    """Inverse of :func:`to_k_major` for flat per-edge arrays."""
    tail = arr_flat.shape[1:]
    return (
        arr_flat.reshape(N // A, K, A, *tail)
        .swapaxes(1, 2)
        .reshape(N, K, *tail)
    )


def make_fused_conv_fwd(
    conv: ConvTPSpec,
    mlp_spec: ScalarMLPSpec,
    A: int,
    K: int,
    act: str = "silu",
    interpret: bool = False,
):
    """Build the jittable fused forward.

    Returned fn:
        (xg (N*K, dim_x), emb (N*K, n_basis), sh (N*K, dim_f),
         mlp_ws: tuple of MLP weights (d_in, d_out))
        -> (N, dim_mid) conv output (pre-denominator).

    Edge arrays must be in **k-major block order**: flat row
    ``b*A*K + k*A + a`` holds neighbor slot ``k`` of atom ``b*A + a``
    (use :func:`to_k_major` / permute the src indices before the gather).
    The caller does the XLA-side gather ``x[src]``; N must be a multiple
    of A. Zeroed padding edges (emb == 0) contribute exactly zero because
    the radial MLP has no biases.
    """
    instr, w3j_pack_np, dim_mid, numel = _instr_tables(conv)
    dim_x = conv.irreps_x.dim
    dim_f = conv.irreps_filter.dim
    n_basis = mlp_spec.dims[0]
    R = w3j_pack_np.shape[0]
    T = A * K
    cst = NORMALIZE2MOM_CST[act]
    assert act == "silu"
    n_mlp = len(mlp_spec.dims) - 1
    inv_sqrt = [1.0 / math.sqrt(d) for d in mlp_spec.dims[:-1]]

    dot_kw = dict(
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    def _k_reduce(acc):
        """(K*A, mul) k-major -> (A, mul) by sublane halving adds.

        All slice offsets are multiples of A (>= 8 sublanes): no Mosaic
        relayout — this replaces the 16.6 ms/layer a-major
        ``(A, K, mul).sum(1)`` strided reduce.
        """
        rows = acc.shape[0]
        while rows > A:
            if (rows // A) % 2 == 0:
                half = rows // 2
                acc = acc[:half, :] + acc[half:, :]
                rows = half
            else:
                # odd chunk count: fold the last A-chunk into the first
                acc = jnp.concatenate(
                    [acc[:A, :] + acc[rows - A :, :], acc[A : rows - A, :]], 0
                )
                rows -= A
        return acc

    def kernel(xg_ref, emb_ref, sh_ref, *rest):
        mlp_refs = rest[:n_mlp]
        w3j_ref = rest[n_mlp]
        out_ref = rest[n_mlp + 1]

        # ---- radial MLP on MXU (e3nn FullyConnectedNet semantics) ----
        h = emb_ref[:]
        for li, wref in enumerate(mlp_refs):
            h = jnp.dot(h, wref[:], **dot_kw) * inv_sqrt[li]
            if li < n_mlp - 1:
                h = jax.nn.silu(h) * cst
        # h: (T, numel)

        # ---- Wigner scalars on MXU: (T, R) ----
        tmp = jnp.dot(sh_ref[:], w3j_ref[:].T, **dot_kw)

        xg = xg_ref[:]
        # ---- uvu TP: unrolled lane-broadcast FMAs + halving K-reduce ----
        for ins in instr:
            d1, d3, mul = ins["d1"], ins["d3"], ins["mul"]
            x0, w0 = ins["x_start"], ins["w_start"]
            wb = h[:, w0 : w0 + mul]                        # (T, mul)
            xw = [
                xg[:, x0 + m * mul : x0 + (m + 1) * mul] * wb
                for m in range(d1)
            ]
            by_p: Dict[int, Any] = {}
            for m, p, r in ins["mp"]:
                term = xw[m] * tmp[:, r : r + 1]
                by_p[p] = term if p not in by_p else by_p[p] + term
            g0, u_off, u_tot = ins["g_start"], ins["u_off"], ins["u_tot"]
            for p in range(d3):
                start = g0 + p * u_tot + u_off
                if p in by_p:
                    out_ref[:, start : start + mul] = _k_reduce(by_p[p])
                else:
                    out_ref[:, start : start + mul] = jnp.zeros(
                        (A, mul), jnp.float32
                    )

    def fused(xg, emb, sh, mlp_ws):
        NK = xg.shape[0]
        assert NK % T == 0, (NK, T)
        n_blocks = NK // T
        grid = (n_blocks,)
        in_specs = [
            pl.BlockSpec((T, dim_x), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, n_basis), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, dim_f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for w in mlp_ws
        ] + [
            pl.BlockSpec((R, dim_f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (A, dim_mid), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_blocks * A, dim_mid), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(xg, emb, sh, *mlp_ws, jnp.asarray(w3j_pack_np))
        return out

    return fused
