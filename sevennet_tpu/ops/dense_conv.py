"""Fused dense-neighbor equivariant convolution with a custom (mirror-edge)
backward pass.

This is the TPU analogue of the reference's kernel-accelerated tensor
product (cuEquivariance / FlashTP, ``sevenn/nn/cue_helper.py:53-124``,
``sevenn/nn/flash_helper.py:32-48``): one fused op computes the radial MLP,
the ``uvu`` tensor product and the neighbor-sum for a block of atoms, never
materializing per-edge messages in HBM.

Why a custom VJP
----------------
XLA's autodiff of the forward (a) stores per-edge intermediates
(``(N,K,m,u)`` tensors whose tiny minor dims pad to (8,128) tiles — up to
40x HBM inflation) as residuals, and (b) transposes the feature gather
``x[src]`` into a scatter-add, the slowest index op on TPU. The custom
backward instead:

- recomputes everything from ``(x, emb, sh)`` (full rematerialization —
  residuals are just the layer inputs), and
- computes the x-cotangent as a SECOND dense convolution over the mirror
  edges. The neighbor list is symmetric (every directed edge has its
  reverse), so the edges with ``src = b`` are exactly the mirrors of row
  ``b``'s edges: same radial weight (same length), spherical harmonics
  flipped by parity ``(-1)^l``. The scatter becomes a gather of the
  message cotangent — the same memory-access pattern as the forward.

The whole backward streams over atom blocks like the forward; no
cross-block reductions exist because the mirror trick keeps every term
row-local.

Training's double backward (grad-of-forces losses) works because the inner
force ``grad`` consumes the custom rule during tracing; the outer grad then
differentiates the (plain-jnp) backward function with ordinary reverse-mode
AD.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..so3.wigner import real_wigner_3j
from .mlp import ScalarMLPSpec, scalar_mlp_apply
from .tensor_product import ConvTPSpec

__all__ = ["dense_conv_apply", "mid_layout"]


def mid_layout(conv: ConvTPSpec):
    """Flat-output layout bookkeeping.

    The forward joins same-irrep mid blocks along the mul axis (sorted
    block order). Returns, per instruction k: (group_start, p_dim,
    u_offset_in_group, u_total_of_group), all in flat-feature coordinates.
    """
    n_blocks = len(conv.irreps_mid)
    group_of = [0] * n_blocks
    groups = []  # (start_flat, p, u_total)
    kk = 0
    start = 0
    while kk < n_blocks:
        ir = conv.irreps_mid[kk].ir
        u_tot = 0
        first = kk
        while kk < n_blocks and conv.irreps_mid[kk].ir == ir:
            group_of[kk] = len(groups)
            u_tot += conv.irreps_mid[kk].mul
            kk += 1
        groups.append((start, ir.dim, u_tot))
        start += ir.dim * u_tot
    # per-instruction u offsets within the group
    u_off = [0] * n_blocks
    seen: Dict[int, int] = {}
    for k in range(n_blocks):
        g = group_of[k]
        u_off[k] = seen.get(g, 0)
        seen[g] = u_off[k] + conv.irreps_mid[k].mul
    out = []
    for k in range(n_blocks):
        g = group_of[k]
        out.append((groups[g][0], groups[g][1], u_off[k], groups[g][2]))
    return tuple(out), start  # layout, dim_mid


def _weight_offsets(conv: ConvTPSpec):
    offs = []
    w_off = 0
    for i, j, k, pw in conv.instructions:
        offs.append(w_off)
        w_off += conv.irreps_x[i].mul
    return tuple(offs), w_off


def _tp_forward_block(conv, xg, sh, w, out_dtype=jnp.float32):
    """xg (A,K,dim_x), sh (A,K,dim_f), w (A,K,numel) -> (A, dim_mid)."""
    A, K = sh.shape[0], sh.shape[1]
    dtype = xg.dtype
    xs = conv.irreps_x.slices()
    fs = conv.irreps_filter.slices()
    w_offs, _ = _weight_offsets(conv)
    out = [None] * len(conv.irreps_mid)
    for idx, (i, j, k, pw) in enumerate(conv.instructions):
        mi_x, mi_o = conv.irreps_x[i], conv.irreps_mid[k]
        w3j = jnp.asarray(
            real_wigner_3j(mi_x.ir.l, conv.irreps_filter[j].ir.l, mi_o.ir.l),
            dtype,
        )
        xb = xg[:, :, xs[i]].reshape(A, K, mi_x.ir.dim, mi_x.mul)
        fb = sh[:, :, fs[j]]
        wb = w[:, :, w_offs[idx] : w_offs[idx] + mi_x.mul]
        tmp = jnp.einsum("mnp,akn->akmp", w3j, fb)
        xw = xb * (pw * wb)[:, :, None, :]
        msg = jnp.einsum(
            "akmp,akmu->apu", tmp, xw, preferred_element_type=out_dtype
        )
        out[k] = msg if out[k] is None else out[k] + msg
    pieces = []
    kk = 0
    nb = len(conv.irreps_mid)
    while kk < nb:
        ir = conv.irreps_mid[kk].ir
        group = []
        while kk < nb and conv.irreps_mid[kk].ir == ir:
            mi = conv.irreps_mid[kk]
            blk = out[kk]
            if blk is None:
                blk = jnp.zeros((A, mi.ir.dim, mi.mul), out_dtype)
            group.append(blk)
            kk += 1
        joined = group[0] if len(group) == 1 else jnp.concatenate(group, -1)
        pieces.append(joined.reshape(A, -1))
    return jnp.concatenate(pieces, axis=-1)


def _tp_backward_block(
    conv,
    layout,
    xg,      # (A,K,dim_x)  compute dtype
    sh,      # (A,K,dim_f)
    w,       # (A,K,numel)
    yg,      # (A,K,dim_mid) gathered message cotangent (mirror neighbors)
    yrow,    # (A,dim_mid)   row-local message cotangent
):
    """Returns (xbar (A,dim_x) fp32, shbar (A,K,dim_f) fp32,
    wbar (A,K,numel) fp32) for this atom block."""
    A, K = sh.shape[0], sh.shape[1]
    dtype = xg.dtype
    xs = conv.irreps_x.slices()
    fs = conv.irreps_filter.slices()
    w_offs, numel = _weight_offsets(conv)

    xbar_blocks = [None] * len(conv.irreps_x)
    shbar = [None] * len(conv.irreps_filter)
    wbar = [None] * len(conv.instructions)

    for idx, (i, j, k, pw) in enumerate(conv.instructions):
        mi_x, mi_f, mi_o = (
            conv.irreps_x[i],
            conv.irreps_filter[j],
            conv.irreps_mid[k],
        )
        m, n_d, p = mi_x.ir.dim, mi_f.ir.dim, mi_o.ir.dim
        u = mi_x.mul
        w3j = jnp.asarray(
            real_wigner_3j(mi_x.ir.l, mi_f.ir.l, mi_o.ir.l), dtype
        )
        fb = sh[:, :, fs[j]]
        wb = (pw * w[:, :, w_offs[idx] : w_offs[idx] + u]).astype(dtype)
        xb = xg[:, :, xs[i]].reshape(A, K, m, u)
        tmp = jnp.einsum("mnp,akn->akmp", w3j, fb)  # (A,K,m,p)

        g_start, p_dim, u_off, u_tot = layout[k]
        # row-local cotangent block (A,p,u) and gathered (A,K,p,u)
        yrow_b = yrow[:, g_start : g_start + p_dim * u_tot].reshape(
            A, p_dim, u_tot
        )[:, :, u_off : u_off + u]
        yg_b = yg[:, :, g_start : g_start + p_dim * u_tot].reshape(
            A, K, p_dim, u_tot
        )[:, :, :, u_off : u_off + u]

        # --- x-cotangent via mirror edges: sh parity-flipped, same w ---
        tmp_m = tmp * jnp.asarray((-1.0) ** mi_f.ir.l, dtype)
        yw = yg_b * wb[:, :, None, :]  # (A,K,p,u)
        xb_bar = jnp.einsum(
            "akmp,akpu->amu", tmp_m, yw, preferred_element_type=jnp.float32
        )
        xbar_blocks[i] = (
            xb_bar if xbar_blocks[i] is None else xbar_blocks[i] + xb_bar
        )

        # --- weight cotangent (row-local) ---
        r = jnp.einsum("akmp,akmu->akpu", tmp, xb)
        wb_bar = jnp.einsum(
            "akpu,apu->aku", r, yrow_b, preferred_element_type=jnp.float32
        ) * pw
        wbar[idx] = wb_bar

        # --- sh cotangent (row-local) ---
        xw = xb * wb[:, :, None, :]
        s0 = jnp.einsum("akmu,apu->akmp", xw, yrow_b)
        sh_bar = jnp.einsum(
            "mnp,akmp->akn", w3j, s0, preferred_element_type=jnp.float32
        )
        shbar[j] = sh_bar if shbar[j] is None else shbar[j] + sh_bar

    xbar = jnp.concatenate(
        [
            (
                xbar_blocks[i]
                if xbar_blocks[i] is not None
                else jnp.zeros(
                    (A, conv.irreps_x[i].ir.dim, conv.irreps_x[i].mul),
                    jnp.float32,
                )
            ).reshape(A, -1)
            for i in range(len(conv.irreps_x))
        ],
        axis=-1,
    )
    shbar_full = jnp.concatenate(
        [
            (
                shbar[j]
                if shbar[j] is not None
                else jnp.zeros((A, K, conv.irreps_filter[j].ir.dim), jnp.float32)
            )
            for j in range(len(conv.irreps_filter))
        ],
        axis=-1,
    )
    wbar_full = jnp.concatenate(wbar, axis=-1)
    return xbar, shbar_full, wbar_full


def _pad_blocks(arr, n, a_blk):
    pad = (-n) % a_blk
    if pad:
        arr = jnp.concatenate(
            [arr, jnp.zeros((pad,) + arr.shape[1:], arr.dtype)]
        )
    return arr, (n + pad) // a_blk


def _mlp_cast(mlp_spec, cd, params, e):
    p16 = jax.tree.map(lambda a: a.astype(cd), params)
    return scalar_mlp_apply(mlp_spec, p16, e.astype(cd))


_FWD_BUDGET = 1 << 26  # elements of the largest per-edge tensor per block
_BWD_BUDGET = 1 << 26


def _auto_block(n, k, width, budget):
    """Pick a streaming block size bounding the (A, K, width) buffers."""
    blk = max(budget // max(k * width, 1), 64)
    blk = (blk // 8) * 8
    return 0 if blk >= n else blk


def _fwd_blocks(conv, mlp_spec, block_atoms, cd, mlp_params, x, emb, sh, src):
    N, K = src.shape
    if block_atoms <= 0:
        _, numel = _weight_offsets(conv)
        block_atoms = _auto_block(N, K, numel, _FWD_BUDGET)
    x16 = x.astype(cd)

    def block(emb_b, sh_b, src_b):
        w = _mlp_cast(mlp_spec, cd, mlp_params, emb_b)
        xg = x16[src_b]
        return _tp_forward_block(conv, xg, sh_b.astype(cd), w)

    if block_atoms <= 0 or N <= block_atoms:
        return block(emb, sh, src)
    emb_p, nblk = _pad_blocks(emb, N, block_atoms)
    sh_p, _ = _pad_blocks(sh, N, block_atoms)
    src_p, _ = _pad_blocks(src, N, block_atoms)
    _, ys = jax.lax.scan(
        lambda _, inp: (None, block(*inp)),
        None,
        (
            emb_p.reshape(nblk, block_atoms, K, -1),
            sh_p.reshape(nblk, block_atoms, K, -1),
            src_p.reshape(nblk, block_atoms, K),
        ),
    )
    return ys.reshape(nblk * block_atoms, -1)[:N]


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _dense_conv(conv, mlp_spec, block_atoms, cd, mlp_params, x, emb, sh, src):
    return _fwd_blocks(conv, mlp_spec, block_atoms, cd, mlp_params, x, emb, sh, src)


def _dense_conv_fwd(conv, mlp_spec, block_atoms, cd, mlp_params, x, emb, sh, src):
    out = _fwd_blocks(conv, mlp_spec, block_atoms, cd, mlp_params, x, emb, sh, src)
    return out, (mlp_params, x, emb, sh, src)


def _dense_conv_bwd(conv, mlp_spec, block_atoms, cd, res, ybar):
    mlp_params, x, emb, sh, src = res
    layout, dim_mid = mid_layout(conv)
    N, K = src.shape
    if block_atoms <= 0:
        block_atoms = _auto_block(N, K, dim_mid, _BWD_BUDGET)
    x16 = x.astype(cd)
    y16 = ybar.astype(cd)

    def block(emb_b, sh_b, src_b, yrow_b):
        # vjp through the radial MLP gives both emb and param cotangents
        w, mlp_vjp = jax.vjp(
            lambda p, e: _mlp_cast(mlp_spec, cd, p, e), mlp_params, emb_b
        )
        xg = x16[src_b]
        yg = y16[src_b]
        xbar_b, shbar_b, wbar_b = _tp_backward_block(
            conv, layout, xg, sh_b.astype(cd), w, yg, yrow_b.astype(cd)
        )
        dmlp, dembed = mlp_vjp(wbar_b.astype(cd))
        return xbar_b, shbar_b, dembed.astype(jnp.float32), dmlp

    if block_atoms <= 0 or N <= block_atoms:
        xbar, shbar, embbar, dmlp = block(emb, sh, src, ybar)
        dmlp = jax.tree.map(lambda a: a.astype(jnp.float32), dmlp)
    else:
        emb_p, nblk = _pad_blocks(emb, N, block_atoms)
        sh_p, _ = _pad_blocks(sh, N, block_atoms)
        src_p, _ = _pad_blocks(src, N, block_atoms)
        y_p, _ = _pad_blocks(ybar, N, block_atoms)
        zero_mlp = jax.tree.map(
            lambda a: jnp.zeros(a.shape, jnp.float32), mlp_params
        )

        def body(acc, inp):
            xbar_b, shbar_b, embbar_b, dmlp = block(*inp)
            acc = jax.tree.map(
                lambda a, b: a + b.astype(jnp.float32), acc, dmlp
            )
            return acc, (xbar_b, shbar_b, embbar_b)

        dmlp, (xbar, shbar, embbar) = jax.lax.scan(
            body,
            zero_mlp,
            (
                emb_p.reshape(nblk, block_atoms, K, -1),
                sh_p.reshape(nblk, block_atoms, K, -1),
                src_p.reshape(nblk, block_atoms, K),
                y_p.reshape(nblk, block_atoms, -1),
            ),
        )
        xbar = xbar.reshape(nblk * block_atoms, -1)[:N]
        shbar = shbar.reshape(nblk * block_atoms, K, -1)[:N]
        embbar = embbar.reshape(nblk * block_atoms, K, -1)[:N]
    dmlp = jax.tree.map(lambda g, p: g.astype(p.dtype), dmlp, mlp_params)
    return (
        dmlp,
        xbar.astype(x.dtype),
        embbar.astype(emb.dtype),
        shbar.astype(sh.dtype),
        np.zeros(src.shape, jax.dtypes.float0),
    )


_dense_conv.defvjp(_dense_conv_fwd, _dense_conv_bwd)


def dense_conv_apply(
    conv: ConvTPSpec,
    mlp_spec: ScalarMLPSpec,
    mlp_params,
    x,          # (N, dim_x) node features
    emb_nk,     # (N, K, n_basis) masked radial embedding (zero on padding)
    sh_nk,      # (N, K, dim_f) spherical harmonics of edge vectors
    src_nk,     # (N, K) int32 neighbor (sender) indices
    *,
    block_atoms: int = 0,
    compute_dtype=jnp.float32,
):
    """Fused radial-MLP + uvu TP + neighbor-sum with mirror-edge backward.

    ``block_atoms > 0`` streams atoms through ``lax.scan`` blocks of that
    size (HBM-bounded for large systems). Output is float32 (N, dim_mid).
    """
    return _dense_conv(
        conv,
        mlp_spec,
        int(block_atoms),
        jnp.dtype(compute_dtype),
        mlp_params,
        x,
        emb_nk,
        sh_nk,
        src_nk,
    )
