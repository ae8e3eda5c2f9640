"""Production Pallas TPU kernels: fused radial-MLP + uvu tensor product +
neighbor reduction over the dense (N, K) layout, forward and backward.

TPU analogue of the reference's kernel accelerators (cuEquivariance /
FlashTP / OpenEquivariance, ``sevenn/nn/cue_helper.py:53-124``,
``flash_helper.py:32-48``): one kernel per atom block computes the radial
weights from the edge embedding (the (N, K, numel) weight tensor never
exists in HBM), contracts the Wigner-coupled ``uvu`` product, and reduces
over the K neighbor slots — all in VMEM.

Design (round-2, measured on v5e; see scripts_dev/r2_fused_breakdown.py):

- **feature-major layout** ``(feat, T)`` inside the kernel: multiplicities
  (32/64/128) sit on sublanes — no (8,128) lane padding waste. The
  edge-major variant wasted 2-4x of every vector op (19.6 ms/layer);
  feature-major runs 7.5 ms vs 17.5 ms for the XLA einsum path.
- edge blocks are **k-major** (lane t = k*A + a): the K-reduction is a
  log2(K) chain of ``pltpu.roll`` + add lane folds (the a-major
  ``(A,K,mul).sum(1)`` strided reduce cost 16.6 ms/layer).
- radial MLP and the packed Wigner contraction are MXU matmuls at
  ``precision=HIGHEST`` (default bf16 passes gave 2e-2 errors; HIGHEST
  matches the fp32 XLA path to ~1e-6).
- the 15-instruction uvu TP is fully unrolled; (m, p) pairs whose w3j
  column is structurally zero are skipped.
- results accumulate in a ``(dim, A)`` VMEM scratch; ONE transpose per
  block writes the edge-major output.

Backward (mirror/scatter hybrid): everything except the x-cotangent is
row-local — the kernel consumes the *receiver's* message cotangent
(``ybar`` rows broadcast across the K lanes) and emits per-edge
``dxg`` contributions plus row-local ``dsh``/``demb`` and (optionally)
radial-MLP weight gradients. The caller turns ``dxg`` into ``dx`` with a
mirror-permutation gather + K-sum (symmetric neighbor lists pair every
edge with its reverse) — a gather, never a scatter (XLA scatter-add
measured 14 ms/layer in round 1). See ``pair_e3gnn_parallel.cpp:404-441``
for the reference's analogous manual reverse pass.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

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

__all__ = [
    "EdgeEmbedSpec",
    "make_fused_conv_fwd",
    "make_fused_conv_bwd",
    "fused_conv_apply",
    "fused_conv_apply_vec",
    "fused_conv_apply_ext",
    "fused_conv_apply_ext_vec",
    "to_k_major_rows",
    "from_k_major_rows",
    "fused_conv_block_atoms",
    "fused_conv_bwd_block_atoms",
    "to_k_major",
    "from_k_major",
    "mirror_map",
    "mirror_map_numpy",
]

_DOT = dict(
    preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
)
_VMEM_LIMIT = 110 * 1024 * 1024


def chunk_threshold() -> int:
    """Gathered-edge-tensor size (bytes) above which the conv streams in
    row chunks (scatter-add or ring backward) instead of the unchunked
    mirror path. Env-overridable for tests and tuning."""
    import os

    return int(
        os.environ.get("SEVENNET_TPU_CHUNK_THRESHOLD", 3_000_000_000)
    )


def _auto_interpret(flag):
    """Pallas interpret mode when not on TPU (CPU tests)."""
    if flag is not None:
        return flag
    return jax.default_backend() != "tpu"


def _instr_tables(conv: ConvTPSpec):
    """Static per-instruction metadata + the packed Wigner matrix (R, dim_f):
    one row per active (instruction, m, p) pair; ``tmp = w3j_pack @ sh^T``."""
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


from dataclasses import dataclass


@dataclass(frozen=True)
class EdgeEmbedSpec:
    """Static description of the edge embedding computed IN-KERNEL by the
    vec-mode fused conv (round 4): Bessel radial basis x cutoff envelope +
    real spherical harmonics, both evaluated from the raw edge vectors on
    the VPU instead of materializing (N*K, n_basis)/(N*K, dim_f) arrays in
    HBM (those pad their minor dims to 128 lanes — 14-16x wasted HBM
    traffic per conv layer, plus their k-major relayouts and backward
    chains). Mirrors ``sevenn/nn/edge_embedding.py`` semantics exactly;
    padded edge slots must carry a sentinel vector with r > cutoff so the
    clamped envelope zeroes them."""

    n_basis: int
    cutoff: float
    cutoff_kind: str   # "poly_cut" | "XPLOR"
    cutoff_arg: float  # p (poly) or cutoff_on (XPLOR)
    lmax: int

    @property
    def dim_f(self) -> int:
        return (self.lmax + 1) ** 2


def _env_rows(r, es: EdgeEmbedSpec):
    """Cutoff envelope + its r-derivative on (1, L) rows, both clamped to
    exactly zero beyond the cutoff (see ops/radial.py for why)."""
    if es.cutoff_kind == "poly_cut":
        p = float(int(es.cutoff_arg))
        x = r * (1.0 / es.cutoff)
        c0 = (p + 1.0) * (p + 2.0) / 2.0
        c1 = p * (p + 2.0)
        c2 = p * (p + 1.0) / 2.0
        xp = x ** int(p)
        val = 1.0 - c0 * xp + c1 * xp * x - c2 * xp * x * x
        dval = (
            -c0 * p * xp / jnp.maximum(x, 1e-12)
            + c1 * (p + 1.0) * xp
            - c2 * (p + 2.0) * xp * x
        ) * (1.0 / es.cutoff)
        inside = x < 1.0
        return (
            jnp.where(inside, val, 0.0),
            jnp.where(inside, dval, 0.0),
        )
    on = float(es.cutoff_arg)
    on_sq = on * on
    cut_sq = es.cutoff * es.cutoff
    r_sq = r * r
    inv = 1.0 / (cut_sq - on_sq) ** 3
    a = cut_sq - r_sq
    b = cut_sq + 2.0 * r_sq - 3.0 * on_sq
    smooth = a * a * b * inv
    dsmooth = (-4.0 * r * a * b + 4.0 * r * a * a) * inv
    mid = (r >= on) & (r < es.cutoff)
    env = jnp.where(r < on, 1.0, jnp.where(r < es.cutoff, smooth, 0.0))
    denv = jnp.where(mid, dsmooth, 0.0)
    return env, denv


def _mons_rows(u, lmax: int):
    """Monomial rows per degree l: list over l of (n_mon(l), L) arrays
    built from the (3, L) unit-vector rows (each degree-l monomial is a
    parent degree-(l-1) monomial times one coordinate)."""
    from ..so3.spherical import monomials

    one = jnp.ones_like(u[:1])
    mons = [one, u]
    for l in range(2, lmax + 1):
        prev_idx = {m: k for k, m in enumerate(monomials(l - 1))}
        rows = []
        for (a, b, c) in monomials(l):
            if a > 0:
                rows.append(
                    mons[l - 1][prev_idx[(a - 1, b, c)] : prev_idx[(a - 1, b, c)] + 1]
                    * u[0:1]
                )
            elif b > 0:
                rows.append(
                    mons[l - 1][prev_idx[(a, b - 1, c)] : prev_idx[(a, b - 1, c)] + 1]
                    * u[1:2]
                )
            else:
                rows.append(
                    mons[l - 1][prev_idx[(a, b, c - 1)] : prev_idx[(a, b, c - 1)] + 1]
                    * u[2:3]
                )
        mons.append(jnp.concatenate(rows, axis=0))
    return mons


def _emb_sh_fwd_rows(v, coef, es: EdgeEmbedSpec):
    """(3, L) edge vectors + (n_basis, 1) Bessel coeffs -> row-major
    ``emb (n_basis, L)``, ``sh (dim_f, L)`` plus recomputable aux values.
    Pure jnp on 2-D row arrays: runs identically inside Mosaic kernels and
    at XLA level (the second-order reference)."""
    from ..so3.spherical import sh_coefficients

    r2 = jnp.sum(v * v, axis=0, keepdims=True)
    r = jnp.maximum(jnp.sqrt(r2), 1e-12)
    rinv = 1.0 / r
    u = v * rinv
    env, denv = _env_rows(r, es)
    pref = 2.0 / es.cutoff
    sr = jnp.sin(coef * r)                     # (n_basis, L)
    emb = sr * (pref * rinv * env)
    mons = _mons_rows(u, es.lmax)
    shs = [jnp.ones_like(u[:1])]
    if es.lmax >= 1:
        shs.append(math.sqrt(3.0) * u)
    for l in range(2, es.lmax + 1):
        # scalar-unrolled C_l @ mons_l: the tables are tiny and sparse, and
        # Pallas kernels cannot capture array constants
        C = np.asarray(sh_coefficients(l))
        for m in range(2 * l + 1):
            row = None
            for k in range(C.shape[1]):
                c = float(C[m, k])
                if c == 0.0:
                    continue
                t = c * mons[l][k : k + 1]
                row = t if row is None else row + t
            shs.append(row if row is not None else jnp.zeros_like(u[:1]))
    sh = jnp.concatenate(shs, axis=0)
    return emb, sh, (r, rinv, u, env, denv, sr, mons)


def _emb_sh_bwd_rows(aux, coef, es: EdgeEmbedSpec, demb, dsh,
                     want_dcoef: bool):
    """Chain (demb (n_basis, L), dsh (dim_f, L)) back to the edge vectors:
    returns ``dv (3, L)`` (and ``dcoef (n_basis, 1)`` when requested)."""
    from ..so3.spherical import sh_deriv_tables

    r, rinv, u, env, denv, sr, mons = aux
    pref = 2.0 / es.cutoff
    cr = jnp.cos(coef * r)                     # (n_basis, L)
    # emb_n = pref * sin(c_n r) / r * env(r)
    demb_dr = pref * (
        coef * cr * (rinv * env) + sr * (denv * rinv - env * rinv * rinv)
    )
    dr = jnp.sum(demb * demb_dr, axis=0, keepdims=True)  # (1, L)
    du = None
    if es.lmax >= 1:
        du = math.sqrt(3.0) * dsh[1:4]
    off = 4
    for l in range(2, es.lmax + 1):
        dsh_l = dsh[off : off + 2 * l + 1]
        off += 2 * l + 1
        G = np.asarray(sh_deriv_tables(l))      # (3, 2l+1, n_mon(l-1))
        parts = []
        for c in range(3):
            # scalar-unrolled sum_m dsh_l[m] * (G[c] @ mons_{l-1}) — the
            # tables are tiny/sparse and kernels cannot capture constants
            acc = None
            for m in range(2 * l + 1):
                for k in range(G.shape[2]):
                    g = float(G[c, m, k])
                    if g == 0.0:
                        continue
                    t = g * (dsh_l[m : m + 1] * mons[l - 1][k : k + 1])
                    acc = t if acc is None else acc + t
            parts.append(acc if acc is not None
                         else jnp.zeros_like(dsh[:1]))
        du = du + jnp.concatenate(parts, axis=0)
    if du is None:
        dv = u * dr
    else:
        udu = jnp.sum(u * du, axis=0, keepdims=True)
        dv = (du - u * udu) * rinv + u * dr
    if not want_dcoef:
        return dv, None
    # d emb_n / d c_n = pref * r cos(c_n r) / r * env = pref * cos * env
    dcoef = jnp.sum(demb * (pref * cr * env), axis=1, keepdims=True)
    return dv, dcoef


def to_k_major_rows(arr_rows, A: int, K: int):
    """(rows, N*K) receiver-row-major lanes -> k-major block lane order
    ``t = b*K*A + k*A + a`` (the transposed-array analogue of
    :func:`to_k_major`; cheap — lanes move, rows are tiny)."""
    rows, NK = arr_rows.shape
    N = NK // K
    assert N % A == 0, (N, A)
    return (
        arr_rows.reshape(rows, N // A, A, K)
        .swapaxes(2, 3)
        .reshape(rows, NK)
    )


def from_k_major_rows(arr_rows, A: int, K: int):
    """Inverse of :func:`to_k_major_rows`."""
    rows, NK = arr_rows.shape
    N = NK // K
    return (
        arr_rows.reshape(rows, N // A, K, A)
        .swapaxes(2, 3)
        .reshape(rows, NK)
    )


def fused_conv_block_atoms(K: int, target_t: int = 2816) -> int:
    """Atoms per block A for the FORWARD kernel.

    Round-3 rule (measured end-to-end on v5e, BENCH r3 logs): pick the
    largest multiple of 8 with ``A*K <= target_t`` whose lane count
    ``T = A*K`` is a multiple of 128 — unaligned T (e.g. 24*72 = 1728 =
    13.5 x 128) ran the full MD step 1.4-3x slower despite similar
    isolated-kernel times. At K=72 this picks A=32 (T=2304): 68.7 ms/step
    at 3k atoms vs 84.5 for round 2's A=24.

    Round-4 refinement: among aligned (A, T) choices prefer the one whose
    K-reduce fold chain stays slice-add-aligned the deepest (every halving
    with ``(half_k*A) % 128 == 0`` is a cheap aligned slice-add; the rest
    fall back to ``pltpu.roll`` — ~3x dearer). Measured: K=64 A=40
    (fold breaks at half_k=8) ran the 10k MD step at 182.9 ms vs 172.5
    for K=64 A=32 (aligned to half_k=4)."""
    assert K % 8 == 0, "dense neighbor capacity K must be a multiple of 8"
    import os

    target_t = int(os.environ.get("SEVENNET_TPU_TARGET_T", target_t))

    def fold_depth(A: int) -> int:
        k, d = K, 0
        while k % 2 == 0 and ((k // 2) * A) % 128 == 0:
            k //= 2
            d += 1
        return d

    best, best_score = 8, (-1, 0)
    for A in range(8, max(target_t // K, 8) + 1, 8):
        if A * K <= target_t and (A * K) % 128 == 0:
            score = (fold_depth(A), A)
            if score > best_score:
                best, best_score = A, score
    if best == 8 and (8 * K) % 128 != 0:
        # no aligned choice (e.g. K=40): fall back to the nearest size
        best = max(8, int(round(target_t / K / 8)) * 8)
    return best


def fused_conv_bwd_block_atoms(A_fwd: int, K: int = 0,
                               target_t: int = 2816) -> int:
    """Backward block size: the largest divisor of the forward block (so
    the padded atom capacity stays divisible) whose T_b = A_b*K stays at or
    under ``target_t``. Since the per-instruction ybt tiling (round 3)
    the backward fits scoped VMEM at the forward's own block size, so this
    normally returns ``A_fwd`` — which lets the backward reuse the
    forward's gathered/k-major tensors with no relayout."""
    import os

    env = os.environ.get("SEVENNET_TPU_BWD_A")
    if env:
        return int(env)
    if not K:
        return A_fwd // 2 if A_fwd % 2 == 0 and A_fwd > 8 else A_fwd
    # largest divisor of A_fwd that is a multiple of 8, fits target_t, and
    # keeps T_b lane-aligned (see fused_conv_block_atoms); else smallest
    # multiple-of-8 divisor
    cands = [
        d for d in range(8, A_fwd + 1, 8)
        if A_fwd % d == 0 and d * K <= target_t and (d * K) % 128 == 0
    ]
    if cands:
        return cands[-1]
    cands = [d for d in range(8, A_fwd + 1, 8) if A_fwd % d == 0]
    return cands[0] if cands else A_fwd


def to_k_major(arr_nk, A: int):
    """(N, K, ...) -> flat (N*K, ...) rows ordered ``b*K*A + k*A + a``."""
    N, K = arr_nk.shape[0], arr_nk.shape[1]
    assert N % A == 0, (N, A)
    tail = arr_nk.shape[2:]
    return (
        arr_nk.reshape(N // A, A, K, *tail)
        .swapaxes(1, 2)
        .reshape(N * K, *tail)
    )


def from_k_major(arr_flat, N: int, K: int, A: int):
    """Inverse of :func:`to_k_major`: flat k-major -> (N, K, ...)."""
    tail = arr_flat.shape[1:]
    return (
        arr_flat.reshape(N // A, K, A, *tail)
        .swapaxes(1, 2)
        .reshape(N, K, *tail)
    )


def mirror_map_numpy(src_nk, shift_nk, edge_mask_nk) -> np.ndarray:
    """Host-side :func:`mirror_map` (vectorized numpy; used by the
    calculator where graphs are built host-side anyway)."""
    src = np.asarray(src_nk, np.int64)
    mask = np.asarray(edge_mask_nk, bool)
    N, K = src.shape
    sh = np.rint(np.asarray(shift_nk)).astype(np.int64)
    smax = 4
    base = 2 * smax + 1
    code = ((sh[..., 0] + smax) * base + (sh[..., 1] + smax)) * base + (
        sh[..., 2] + smax
    )
    mcode = ((-sh[..., 0] + smax) * base + (-sh[..., 1] + smax)) * base + (
        -sh[..., 2] + smax
    )
    dst = np.repeat(np.arange(N, dtype=np.int64), K).reshape(N, K)
    big = base ** 3
    key = (dst * N + src) * big + code          # identity of each edge
    want = (src * N + dst) * big + mcode        # identity of its mirror
    flat_self = dst * K + np.tile(np.arange(K, dtype=np.int64), (N, 1))
    kf = np.where(mask, key, -1).reshape(-1)
    order = np.argsort(kf)
    pos = np.searchsorted(kf[order], want.reshape(-1))
    pos = np.clip(pos, 0, N * K - 1)
    hit = kf[order][pos] == want.reshape(-1)
    mir = np.where(hit & mask.reshape(-1), order[pos], flat_self.reshape(-1))
    return mir.reshape(N, K).astype(np.int32)


def mirror_map(src_nk, shift_nk, edge_mask_nk, chunk: int = 256):
    """Flat (dst-major) index of each edge's mirror: for the edge at slot
    (i, k) = (i <- j, S), find the slot (j, k') holding (j <- i, -S).

    Jit-able direct search, chunked over receiver atoms to bound the
    (chunk, K, K) candidate tensors; int32 throughout. Padded or unmatched
    slots map to themselves (their cotangent contributions are zero).
    Requires a symmetric list — cell list / full NL guarantee this.
    Computed once per neighbor rebuild, not per step.
    """
    N, K = src_nk.shape
    smax = 4
    base = 2 * smax + 1
    sh = jnp.round(shift_nk).astype(jnp.int32)
    code = (
        (sh[..., 0] + smax) * base + (sh[..., 1] + smax)
    ) * base + (sh[..., 2] + smax)          # (N, K) int32 < 729
    mcode = (
        (-sh[..., 0] + smax) * base + (-sh[..., 1] + smax)
    ) * base + (-sh[..., 2] + smax)

    pad = (-N) % chunk
    if pad:
        padz = lambda a, fill=0: jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)]
        )
        src_p = padz(src_nk)
        code_p = padz(code)
        mcode_p = padz(mcode, -1)
        mask_p = padz(edge_mask_nk.astype(jnp.int32))
    else:
        src_p, code_p, mcode_p = src_nk, code, mcode
        mask_p = edge_mask_nk.astype(jnp.int32)
    nb = (N + pad) // chunk
    i_idx = jnp.arange(N + pad, dtype=jnp.int32)

    def block(b):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, b * chunk, chunk, 0)
        j_blk = sl(src_p)                      # (B, K)
        srcj = src_p[j_blk]                    # (B, K, K)
        codej = code_p[j_blk]                  # (B, K, K)
        i_tgt = sl(i_idx)[:, None, None]       # (B, 1, 1)
        want = sl(mcode_p)[:, :, None]         # (B, K, 1)
        match = (srcj == i_tgt) & (codej == want)
        found = jnp.any(match, axis=2)
        kprime = jnp.argmax(match, axis=2).astype(jnp.int32)
        mir_b = j_blk * K + kprime
        self_b = (sl(i_idx)[:, None] * K
                  + jnp.arange(K, dtype=jnp.int32)[None, :])
        ok = found & (sl(mask_p) > 0)
        return jnp.where(ok, mir_b, self_b)

    mir = jax.lax.map(block, jnp.arange(nb))
    return mir.reshape(-1, K)[:N].astype(jnp.int32)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def make_fused_conv_fwd(
    conv: ConvTPSpec,
    mlp_spec: ScalarMLPSpec,
    A: int,
    K: int,
    act: str = "silu",
    interpret: Optional[bool] = None,
    embed: Optional[EdgeEmbedSpec] = None,
):
    """Returns fn(xg, emb, sh, mlp_ws) -> (N, dim_mid).

    All edge arrays flat in **k-major block order** (:func:`to_k_major`);
    ``xg = x[to_k_major(src)]`` is gathered by the caller. Zeroed padding
    edges contribute exactly zero (the radial MLP has no biases).

    With ``embed`` set (vec mode), the signature becomes
    ``fn(xg, vec (3, N*K) k-major lanes, coef (n_basis, 1), mlp_ws)`` and
    the Bessel basis / envelope / spherical harmonics are computed
    in-kernel from the edge vectors (sentinel vectors with r > cutoff on
    padded slots).
    """
    instr, w3j_pack_np, dim_mid, numel = _instr_tables(conv)
    dim_x = conv.irreps_x.dim
    dim_f = conv.irreps_filter.dim
    n_basis = mlp_spec.dims[0]
    if embed is not None:
        assert embed.dim_f == dim_f and embed.n_basis == n_basis, (
            embed, dim_f, n_basis,
        )
    R = w3j_pack_np.shape[0]
    T = A * K
    cst = NORMALIZE2MOM_CST[act]
    assert act == "silu"
    n_mlp = len(mlp_spec.dims) - 1
    inv_sqrt = [1.0 / math.sqrt(d) for d in mlp_spec.dims[:-1]]

    def _kfold(acc):
        """(mul, T) k-major lanes -> (mul, A) via fold-add lane reductions.

        Folds whose half-width is a multiple of the 128-lane tile are
        plain aligned slice-adds (no lane rotation — ~3x cheaper than
        ``pltpu.roll``; the roll chain was HALF the forward kernel cost,
        scripts_dev/r3_fwd_knockout.py). A peel-to-power-of-two step
        keeps the chain aligned for any K divisible by 4 at A=32
        (72 -> 36 -> [peel 4] 32 -> 16 -> 8 -> 4, all aligned); rolls
        remain only for the narrow (<=4-chunk) tail.
        """
        kcur = K
        while kcur > 1:
            w = kcur * A
            half_k = kcur // 2
            if kcur % 2 == 0 and (half_k * A) % 128 == 0:
                half = half_k * A
                acc = acc[:, :half] + acc[:, half:w]
                kcur = half_k
                continue
            p2 = 1 << (kcur.bit_length() - 1)
            if p2 == kcur:
                p2 //= 2
            tail_k = kcur - p2
            if (
                0 < tail_k <= p2
                and (p2 * A) % 128 == 0
                and (tail_k * A) % 128 == 0
            ):
                tw = tail_k * A
                head = acc[:, : p2 * A]
                folded = head[:, :tw] + acc[:, p2 * A : w]
                acc = jnp.concatenate([folded, head[:, tw:]], axis=1)
                kcur = p2
                continue
            if kcur % 2 == 0:
                half = half_k * A
                acc = acc[:, :half] + pltpu.roll(acc, w - half, 1)[:, :half]
                kcur = half_k
            else:
                head = acc[:, : (kcur - 1) * A]
                tail = pltpu.roll(acc, A, 1)[:, :A]  # last chunk to front
                acc = head + jnp.pad(tail, ((0, 0), (0, (kcur - 2) * A)))
                kcur -= 1
        return acc

    def kernel(xg_ref, emb_ref, sh_ref, *rest):
        mlp_refs = rest[:n_mlp]
        w3j_ref = rest[n_mlp]
        out_ref = rest[n_mlp + 1]
        scr = rest[n_mlp + 2]

        xgT = xg_ref[:].T          # (dim_x, T)
        if embed is not None:
            # emb_ref = vec (3, T) rows; sh_ref = coef (n_basis, 1)
            embT, shT, _ = _emb_sh_fwd_rows(emb_ref[:], sh_ref[:], embed)
        else:
            embT = emb_ref[:].T    # (n_basis, T)
            shT = sh_ref[:].T      # (dim_f, T)

        h = embT
        for li, wref in enumerate(mlp_refs):
            h = jnp.dot(wref[:].T, h, **_DOT) * inv_sqrt[li]
            if li < n_mlp - 1:
                h = jax.nn.silu(h) * cst
        tmp = jnp.dot(w3j_ref[:], shT, **_DOT)  # (R, T)

        for ins in instr:
            d1, d3, mul = ins["d1"], ins["d3"], ins["mul"]
            x0, w0 = ins["x_start"], ins["w_start"]
            wb = h[w0 : w0 + mul, :]
            xw = [
                xgT[x0 + m * mul : x0 + (m + 1) * mul, :] * wb
                for m in range(d1)
            ]
            by_p: Dict[int, Any] = {}
            for m, p, r in ins["mp"]:
                term = xw[m] * tmp[r : r + 1, :]
                by_p[p] = term if p not in by_p else by_p[p] + term
            g0, u_off, u_tot = ins["g_start"], ins["u_off"], ins["u_tot"]
            for p in range(d3):
                start = g0 + p * u_tot + u_off
                if p in by_p:
                    scr[start : start + mul, :] = _kfold(by_p[p])
                else:
                    scr[start : start + mul, :] = jnp.zeros(
                        (mul, A), jnp.float32
                    )
        out_ref[:] = scr[:].T

    def fused(xg, emb, sh, mlp_ws):
        # vec mode: emb = vec (3, NK) k-major lanes, sh = coef (n_basis, 1)
        NK = xg.shape[0]
        assert NK % T == 0, (NK, T)
        n_blocks = NK // T
        if embed is not None:
            edge_specs = [
                pl.BlockSpec((3, T), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_basis, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
        else:
            edge_specs = [
                pl.BlockSpec((T, n_basis), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, dim_f), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ]
        in_specs = [
            pl.BlockSpec((T, dim_x), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + edge_specs + [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for w in mlp_ws
        ] + [
            pl.BlockSpec((R, dim_f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        return pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (A, dim_mid), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_blocks * A, dim_mid), jnp.float32),
            scratch_shapes=[pltpu.VMEM((dim_mid, A), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            interpret=_auto_interpret(interpret),
        )(xg, emb, sh, *mlp_ws, jnp.asarray(w3j_pack_np))

    return fused


# ---------------------------------------------------------------------------
# backward kernel (row-local part)
# ---------------------------------------------------------------------------


def make_fused_conv_bwd(
    conv: ConvTPSpec,
    mlp_spec: ScalarMLPSpec,
    A: int,
    K: int,
    act: str = "silu",
    param_grads: bool = True,
    interpret: Optional[bool] = None,
):
    """Returns fn(xg, emb, sh, ybar, mlp_ws) ->
        (dxg (N*K, dim_x), demb (N*K, n_basis), dsh (N*K, dim_f)
         [, dmlp_ws tuple])

    ``ybar`` is the (N, dim_mid) cotangent of the conv output; ``dxg`` rows
    are per-edge contributions to ``dx[src[edge]]`` — the caller reduces
    them with :func:`mirror_map` (gather + K-sum). Everything else is
    row-local and exact. Param grads double the MXU work; disable for MD.
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
    dims = mlp_spec.dims
    inv_sqrt = [1.0 / math.sqrt(d) for d in dims[:-1]]

    def kernel(xg_ref, emb_ref, sh_ref, ybar_ref, *rest):
        mlp_refs = rest[:n_mlp]
        w3j_ref = rest[n_mlp]
        outs = rest[n_mlp + 1 :]
        dxg_ref, demb_ref, dsh_ref = outs[0], outs[1], outs[2]
        dw_refs = outs[3 : 3 + n_mlp] if param_grads else ()
        dxscr = outs[3 + n_mlp] if param_grads else outs[3]

        xgT = xg_ref[:].T
        embT = emb_ref[:].T
        shT = sh_ref[:].T
        ybT = ybar_ref[:].T        # (dim_mid, A)

        # ---- recompute the radial MLP, keeping pre-activations ----
        h = embT
        hs = [h]          # inputs of each layer (post-activation)
        zs = []           # pre-activations
        for li, wref in enumerate(mlp_refs):
            z = jnp.dot(wref[:].T, h, **_DOT) * inv_sqrt[li]
            zs.append(z)
            h = jax.nn.silu(z) * cst if li < n_mlp - 1 else z
            hs.append(h)
        w_edge = hs[-1]            # (numel, T)
        tmp = jnp.dot(w3j_ref[:], shT, **_DOT)  # (R, T)

        dw_blocks = {}  # w_start -> (mul, T) weight cotangent block
        dtmp_rows = [None] * R
        dx_blocks = {}  # x row offset -> (mul, T), summed across instructions

        for ins in instr:
            d1, d3, mul = ins["d1"], ins["d3"], ins["mul"]
            x0, w0 = ins["x_start"], ins["w_start"]
            wb = w_edge[w0 : w0 + mul, :]
            g0, u_off, u_tot = ins["g_start"], ins["u_off"], ins["u_tot"]
            # receiver cotangent tiles: (mul, A) -> (mul, T) k-major tile
            ybt = {}
            for p in range(d3):
                start = g0 + p * u_tot + u_off
                yb = ybT[start : start + mul, :]
                ybt[p] = jnp.concatenate([yb] * K, axis=1)
            # dx contributions (per edge, to be mirror-reduced); multiple
            # instructions share the same x input block -> accumulate
            for m in range(d1):
                acc = None
                for mm, p, r in ins["mp"]:
                    if mm != m:
                        continue
                    t = ybt[p] * tmp[r : r + 1, :]
                    acc = t if acc is None else acc + t
                dxm = acc * wb
                key = x0 + m * mul
                dx_blocks[key] = (
                    dxm if key not in dx_blocks else dx_blocks[key] + dxm
                )
            # dw and dtmp
            dwb = None
            for m, p, r in ins["mp"]:
                q = xgT[x0 + m * mul : x0 + (m + 1) * mul, :] * ybt[p]
                contrib = q * tmp[r : r + 1, :]
                dwb = contrib if dwb is None else dwb + contrib
                # dtmp row: sum over mul of q * wb
                dtmp_rows[r] = jnp.sum(q * wb, axis=0, keepdims=True)
            dw_blocks[w0] = dwb

        for key, dxm in dx_blocks.items():
            dxscr[key : key + dxm.shape[0], :] = dxm
        # x blocks no instruction consumes (e.g. odd-parity inputs of the
        # last layer, whose products all fall outside the target irreps)
        # get no write above — zero them or the scratch returns garbage
        spans = sorted((k, k + v.shape[0]) for k, v in dx_blocks.items())
        cur = 0
        for a, b in spans + [(dim_x, dim_x)]:
            if a > cur:
                dxscr[cur:a, :] = jnp.zeros((a - cur, T), jnp.float32)
            cur = max(cur, b)

        # assemble dw_edge (numel, T) from per-instruction blocks
        dw_edge = jnp.concatenate(
            [dw_blocks[ins["w_start"]] for ins in instr], axis=0
        )  # (numel, T)
        dtmp = jnp.concatenate(
            [dtmp_rows[r] for r in range(R)], axis=0
        )  # (R, T)

        # dsh via the packed Wigner matrix
        dshT = jnp.dot(w3j_ref[:].T, dtmp, **_DOT)  # (dim_f, T)
        dsh_ref[:] = dshT.T

        # ---- MLP backward ----
        g = dw_edge  # cotangent at layer output (numel, T)
        for li in range(n_mlp - 1, -1, -1):
            if param_grads:
                # dW_li = hs[li] @ g^T scaled; stored (d_in, d_out)
                dW = jnp.dot(hs[li], g.T, **_DOT) * inv_sqrt[li]
                is_first = pl.program_id(0) == 0

                @pl.when(is_first)
                def _(dref=dw_refs[li], val=dW):
                    dref[:] = val

                @pl.when(jnp.logical_not(is_first))
                def _(dref=dw_refs[li], val=dW):
                    dref[:] = dref[:] + val

            g = jnp.dot(mlp_refs[li][:], g, **_DOT) * inv_sqrt[li]
            if li > 0:
                z = zs[li - 1]
                sig = jax.nn.sigmoid(z)
                dsilu = sig * (1.0 + z * (1.0 - sig))
                g = g * (dsilu * cst)
        demb_ref[:] = g.T
        dxg_ref[:] = dxscr[:].T

    def fused_bwd(xg, emb, sh, ybar, mlp_ws):
        NK = xg.shape[0]
        assert NK % T == 0, (NK, T)
        n_blocks = NK // T
        in_specs = [
            pl.BlockSpec((T, dim_x), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, n_basis), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, dim_f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((A, dim_mid), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for w in mlp_ws
        ] + [
            pl.BlockSpec((R, dim_f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((NK, dim_x), jnp.float32),
            jax.ShapeDtypeStruct((NK, n_basis), jnp.float32),
            jax.ShapeDtypeStruct((NK, dim_f), jnp.float32),
        ]
        out_specs = [
            pl.BlockSpec((T, dim_x), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, n_basis), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, dim_f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        if param_grads:
            for w in mlp_ws:
                out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
                out_specs.append(
                    pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
                )
        res = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=[pltpu.VMEM((dim_x, T), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            interpret=_auto_interpret(interpret),
        )(xg, emb, sh, ybar, *mlp_ws, jnp.asarray(w3j_pack_np))
        if param_grads:
            return res[0], res[1], res[2], tuple(res[3:])
        return res[0], res[1], res[2]

    return fused_bwd


def make_fused_conv_bwd2(
    conv: ConvTPSpec,
    mlp_spec: ScalarMLPSpec,
    A: int,
    K: int,
    act: str = "silu",
    param_grads: bool = True,
    interpret: Optional[bool] = None,
    embed: Optional[EdgeEmbedSpec] = None,
    dxg_dtype=jnp.float32,
    out_slots: int = 1,
):
    """Round-3 backward kernel: same contract as :func:`make_fused_conv_bwd`
    but with the redundant products factored out (measured 60% of model cost
    in round 2 — the reverse pass the reference pays C++/cuEq for,
    ``pair_e3gnn_parallel.cpp:404-441``):

    - the dx-path accumulator ``acc_m = sum_p ybt[p] * tmp[r(m,p)]`` is
      REUSED for the weight cotangent: ``dw = sum_m xg[m] * acc_m`` —
      the old kernel recomputed ``q = xg[m]*ybt[p]`` and ``q*tmp[r]`` per
      (m, p, r) triple (2x sum_mp_mul extra element-ops per edge).
    - ``dtmp[r] = sum_u xw[m]*ybt[p]`` uses the forward's ``xw = xg*wb``
      products instead of forming ``q`` separately.
    - the receiver-cotangent tiles ``ybt`` are built with ONE broadcast of
      the whole (dim_mid, A) block to (dim_mid, K, A) instead of per-p
      K-fold `concatenate` chains.
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
    dims = mlp_spec.dims
    inv_sqrt = [1.0 / math.sqrt(d) for d in dims[:-1]]

    def kernel(xg_ref, emb_ref, sh_ref, ybar_ref, *rest):
        mlp_refs = rest[:n_mlp]
        w3j_ref = rest[n_mlp]
        outs = rest[n_mlp + 1 :]
        if embed is None:
            dxg_ref, demb_ref, dsh_ref = outs[0], outs[1], outs[2]
            n_fixed = 3
        else:
            dxg_ref, dvec_ref = outs[0], outs[1]
            n_fixed = 2
        dw_refs = outs[n_fixed : n_fixed + n_mlp] if param_grads else ()
        dcoef_ref = (
            outs[n_fixed + n_mlp] if (param_grads and embed is not None)
            else None
        )
        dxscr = outs[-1]

        xgT = xg_ref[:].T
        if embed is not None:
            # emb_ref = vec (3, T) rows; sh_ref = coef (n_basis, 1)
            embT, shT, emb_aux = _emb_sh_fwd_rows(
                emb_ref[:], sh_ref[:], embed
            )
        else:
            embT = emb_ref[:].T
            shT = sh_ref[:].T
        ybT = ybar_ref[:].T        # (dim_mid, A)
        # receiver-cotangent tiles are built per INSTRUCTION (the d3*mul
        # rows an instruction consumes, tiled K times across the k-major
        # lanes t = k*A + a) instead of materializing the full (dim_mid, T)
        # tile: at T = 2816 that single buffer was 35 MB of scoped VMEM —
        # the reason the backward block had to stay at half the forward's
        # size (round-3 notes). Per-p concat chains (round-2 bwd) were
        # slower; per-instruction is the same data volume as the full tile
        # but transient.
        ybt_cache: Dict[Any, Any] = {}

        def ybt_tile(g0, u_tot, u_off, mul, d3):
            key = (g0, u_tot, u_off, mul, d3)
            if key not in ybt_cache:
                rows = jnp.concatenate(
                    [
                        ybT[g0 + p * u_tot + u_off :, :][:mul, :]
                        for p in range(d3)
                    ],
                    axis=0,
                )  # (d3*mul, A)
                # lane-tile (d3*mul, A) -> (d3*mul, T): pltpu.repeat lowers
                # to Mosaic's native lane-broadcast instead of a K-element
                # concatenate chain (one full extra pass over the tile);
                # env-gated for A/B on hardware
                if int(os.environ.get("SEVENNET_TPU_YBT_REPEAT", 1)):
                    ybt_cache[key] = pltpu.repeat(rows, K, axis=1)
                else:
                    ybt_cache[key] = jnp.concatenate([rows] * K, axis=1)
            return ybt_cache[key]

        # ---- recompute the radial MLP, keeping pre-activations ----
        h = embT
        hs = [h]
        zs = []
        for li, wref in enumerate(mlp_refs):
            z = jnp.dot(wref[:].T, h, **_DOT) * inv_sqrt[li]
            zs.append(z)
            h = jax.nn.silu(z) * cst if li < n_mlp - 1 else z
            hs.append(h)
        w_edge = hs[-1]            # (numel, T)
        tmp = jnp.dot(w3j_ref[:], shT, **_DOT)  # (R, T)

        dw_blocks = {}
        dtmp_rows = [None] * R
        dx_blocks = {}

        for ins in instr:
            d1, d3, mul = ins["d1"], ins["d3"], ins["mul"]
            x0, w0 = ins["x_start"], ins["w_start"]
            wb = w_edge[w0 : w0 + mul, :]
            g0, u_off, u_tot = ins["g_start"], ins["u_off"], ins["u_tot"]
            tile = ybt_tile(g0, u_tot, u_off, mul, d3)
            ybt = {p: tile[p * mul : (p + 1) * mul, :] for p in range(d3)}
            xw = [
                xgT[x0 + m * mul : x0 + (m + 1) * mul, :] * wb
                for m in range(d1)
            ]
            dwb = None
            for m in range(d1):
                acc = None
                for mm, p, r in ins["mp"]:
                    if mm != m:
                        continue
                    t = ybt[p] * tmp[r : r + 1, :]
                    acc = t if acc is None else acc + t
                if acc is None:
                    continue
                key = x0 + m * mul
                dxm = acc * wb
                dx_blocks[key] = (
                    dxm if key not in dx_blocks else dx_blocks[key] + dxm
                )
                # dw reuses acc: sum_m xg[m] * acc_m  (== sum_mp q*tmp)
                contrib = xgT[x0 + m * mul : x0 + (m + 1) * mul, :] * acc
                dwb = contrib if dwb is None else dwb + contrib
            for m, p, r in ins["mp"]:
                # dtmp[r] = sum_u q*wb = sum_u xw[m]*ybt[p]
                dtmp_rows[r] = jnp.sum(
                    xw[m] * ybt[p], axis=0, keepdims=True
                )
            dw_blocks[ins["w_start"]] = dwb

        for key, dxm in dx_blocks.items():
            dxscr[key : key + dxm.shape[0], :] = dxm
        spans = sorted((k, k + v.shape[0]) for k, v in dx_blocks.items())
        cur = 0
        for a, b in spans + [(dim_x, dim_x)]:
            if a > cur:
                dxscr[cur:a, :] = jnp.zeros((a - cur, T), jnp.float32)
            cur = max(cur, b)

        dw_edge = jnp.concatenate(
            [dw_blocks[ins["w_start"]] for ins in instr], axis=0
        )
        dtmp = jnp.concatenate([dtmp_rows[r] for r in range(R)], axis=0)

        dshT = jnp.dot(w3j_ref[:].T, dtmp, **_DOT)
        if embed is None:
            dsh_ref[:] = dshT.T

        g = dw_edge
        for li in range(n_mlp - 1, -1, -1):
            if param_grads:
                dW = jnp.dot(hs[li], g.T, **_DOT) * inv_sqrt[li]
                is_first = pl.program_id(0) == 0

                @pl.when(is_first)
                def _(dref=dw_refs[li], val=dW):
                    dref[:] = val

                @pl.when(jnp.logical_not(is_first))
                def _(dref=dw_refs[li], val=dW):
                    dref[:] = dref[:] + val

            g = jnp.dot(mlp_refs[li][:], g, **_DOT) * inv_sqrt[li]
            if li > 0:
                z = zs[li - 1]
                sig = jax.nn.sigmoid(z)
                dsilu = sig * (1.0 + z * (1.0 - sig))
                g = g * (dsilu * cst)
        if embed is None:
            demb_ref[:] = g.T
        else:
            # chain demb (g) + dsh back to the edge vectors in-kernel
            dv, dcoef = _emb_sh_bwd_rows(
                emb_aux, sh_ref[:], embed, g, dshT,
                want_dcoef=param_grads,
            )
            dvec_ref[:] = dv
            if param_grads:
                is_first0 = pl.program_id(0) == 0

                @pl.when(is_first0)
                def _():
                    dcoef_ref[:] = dcoef

                @pl.when(jnp.logical_not(is_first0))
                def _():
                    dcoef_ref[:] = dcoef_ref[:] + dcoef
        dxg_ref[:] = dxscr[:].T.astype(dxg_dtype)

    # out_slots > 1 (ring rolling buffer, round 5): the dxg output is one
    # SLOT of a (out_slots*NK, dim_x) buffer, selected by a scalar-prefetch
    # index — the kernel writes its chunk's dxg directly into the ring
    # buffer (aliased in/out, in-place) instead of producing a fresh
    # (NK, dim_x) array that the caller dynamic-update-slices in (a full
    # extra HBM read+write of the largest backward tensor per chunk).
    slotted = out_slots > 1
    if slotted:
        # index maps gain the trailing scalar-prefetch ref argument
        def _row(i, s=None):
            return (i, 0)

        def _col(i, s=None):
            return (0, i)

        def _fix(i, s=None):
            return (0, 0)
    else:
        _row = lambda i: (i, 0)      # noqa: E731
        _col = lambda i: (0, i)      # noqa: E731
        _fix = lambda i: (0, 0)      # noqa: E731

    def fused_bwd(*args):
        if slotted:
            slot, buf, xg, emb, sh, ybar, mlp_ws = args
        else:
            xg, emb, sh, ybar, mlp_ws = args
        # vec mode: emb = vec (3, NK) k-major lanes, sh = coef (n_basis, 1)
        NK = xg.shape[0]
        assert NK % T == 0, (NK, T)
        n_blocks = NK // T
        if embed is not None:
            edge_specs = [
                pl.BlockSpec((3, T), _col, memory_space=pltpu.VMEM),
                pl.BlockSpec((n_basis, 1), _fix, memory_space=pltpu.VMEM),
            ]
        else:
            edge_specs = [
                pl.BlockSpec((T, n_basis), _row, memory_space=pltpu.VMEM),
                pl.BlockSpec((T, dim_f), _row, memory_space=pltpu.VMEM),
            ]
        in_specs = [
            pl.BlockSpec((T, dim_x), _row, memory_space=pltpu.VMEM),
        ] + edge_specs + [
            pl.BlockSpec((A, dim_mid), _row, memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(w.shape, _fix, memory_space=pltpu.VMEM)
            for w in mlp_ws
        ] + [
            pl.BlockSpec((R, dim_f), _fix, memory_space=pltpu.VMEM),
        ]
        if slotted:
            out_shape = [
                jax.ShapeDtypeStruct((out_slots * NK, dim_x), dxg_dtype)
            ]
            out_specs = [
                pl.BlockSpec(
                    (T, dim_x),
                    lambda i, s: (s[0] * n_blocks + i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
        else:
            out_shape = [jax.ShapeDtypeStruct((NK, dim_x), dxg_dtype)]
            out_specs = [
                pl.BlockSpec((T, dim_x), _row, memory_space=pltpu.VMEM),
            ]
        if embed is not None:
            out_shape.append(jax.ShapeDtypeStruct((3, NK), jnp.float32))
            out_specs.append(
                pl.BlockSpec((3, T), _col, memory_space=pltpu.VMEM)
            )
        else:
            out_shape += [
                jax.ShapeDtypeStruct((NK, n_basis), jnp.float32),
                jax.ShapeDtypeStruct((NK, dim_f), jnp.float32),
            ]
            out_specs += [
                pl.BlockSpec((T, n_basis), _row, memory_space=pltpu.VMEM),
                pl.BlockSpec((T, dim_f), _row, memory_space=pltpu.VMEM),
            ]
        if param_grads:
            for w in mlp_ws:
                out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
                out_specs.append(
                    pl.BlockSpec(w.shape, _fix, memory_space=pltpu.VMEM)
                )
            if embed is not None:
                out_shape.append(
                    jax.ShapeDtypeStruct((n_basis, 1), jnp.float32)
                )
                out_specs.append(
                    pl.BlockSpec((n_basis, 1), _fix, memory_space=pltpu.VMEM)
                )
        # the in-specs above re-order kernel args as (xg, emb|vec, sh|coef,
        # ybar, ...) — match the kernel signature by passing in that order
        if slotted:
            def kernel_slotted(slot_ref, buf_ref, *rest):
                kernel(*rest)

            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_blocks,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + in_specs,
                out_specs=tuple(out_specs),
                scratch_shapes=[pltpu.VMEM((dim_x, T), jnp.float32)],
            )
            res = pl.pallas_call(
                kernel_slotted,
                grid_spec=grid_spec,
                out_shape=tuple(out_shape),
                # buf (input 1; the scalar slot index is input 0) IS the
                # dxg output buffer: in-place slot write, no copy
                input_output_aliases={1: 0},
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=_VMEM_LIMIT
                ),
                interpret=_auto_interpret(interpret),
            )(slot, buf, xg, emb, sh, ybar, *mlp_ws,
              jnp.asarray(w3j_pack_np))
        else:
            res = pl.pallas_call(
                kernel,
                grid=(n_blocks,),
                in_specs=in_specs,
                out_specs=tuple(out_specs),
                out_shape=tuple(out_shape),
                scratch_shapes=[pltpu.VMEM((dim_x, T), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=_VMEM_LIMIT
                ),
                interpret=_auto_interpret(interpret),
            )(xg, emb, sh, ybar, *mlp_ws, jnp.asarray(w3j_pack_np))
        n_fixed = 2 if embed is not None else 3
        if param_grads:
            return (*res[:n_fixed], tuple(res[n_fixed:]))
        return tuple(res[:n_fixed])

    return fused_bwd


# ---------------------------------------------------------------------------
# custom_vjp wrapper (the production conv op)
# ---------------------------------------------------------------------------


_KERNEL_CACHE: Dict = {}


def _make_bwd_op(conv, mlp_spec, A_b, K, param_grads, bwd_kernel,
                 embed: Optional[EdgeEmbedSpec] = None):
    """Wrap the Pallas backward kernel in its OWN custom_vjp so the conv's
    backward rule is itself differentiable — the VJP-of-VJP the force-loss
    grad-of-grad needs in training (the reference gets this from torch
    autograd over cuEq/FlashTP kernels, ``sevenn/nn/cue_helper.py:53-124``).
    The second-order rule differentiates an XLA reference implementation of
    the same pullback (``jax.vjp`` over the dense TP forward), which the
    fused-vs-XLA equivalence tests pin to the kernel to ~1e-6.

    In vec mode (``embed``) the op signature is
    ``op(mlp_ws, xg, vec_km (3, N*K), coef (n_basis, 1), ybar)`` and it
    returns ``(dxg, dvec[, (dws..., dcoef)])``."""
    from .dense_conv import _tp_forward_block
    from .mlp import scalar_mlp_apply

    if embed is not None:
        def ref(mlp_ws, xg, vec_km, coef, ybar):
            N = ybar.shape[0]

            def f(ws, coef_, xg_f, vec_f):
                emb, sh, _ = _emb_sh_fwd_rows(vec_f, coef_, embed)
                xg_nk = from_k_major(xg_f, N, K, A_b)
                emb_nk = from_k_major(emb.T, N, K, A_b)
                sh_nk = from_k_major(sh.T, N, K, A_b)
                w = scalar_mlp_apply(mlp_spec, {"w": list(ws)}, emb_nk)
                return _tp_forward_block(conv, xg_nk, sh_nk, w)

            _, pull = jax.vjp(f, tuple(mlp_ws), coef, xg, vec_km)
            dws, dcoef, dxg, dvec = pull(ybar)
            dxg = dxg.reshape(-1, conv.irreps_x.dim)
            if param_grads:
                return dxg, dvec, (*dws, dcoef)
            return dxg, dvec

        @jax.custom_vjp
        def op(mlp_ws, xg, vec_km, coef, ybar):
            return bwd_kernel(xg, vec_km, coef, ybar, tuple(mlp_ws))

        def fwd_rule(mlp_ws, xg, vec_km, coef, ybar):
            return (
                op(mlp_ws, xg, vec_km, coef, ybar),
                (mlp_ws, xg, vec_km, coef, ybar),
            )

        def bwd_rule(res, g):
            return jax.vjp(ref, *res)[1](g)

        op.defvjp(fwd_rule, bwd_rule)
        return op

    def ref(mlp_ws, xg, emb_km, sh_km, ybar):
        N = ybar.shape[0]

        def f(ws, xg_f, emb_f, sh_f):
            xg_nk = from_k_major(xg_f, N, K, A_b)
            emb_nk = from_k_major(emb_f, N, K, A_b)
            sh_nk = from_k_major(sh_f, N, K, A_b)
            w = scalar_mlp_apply(mlp_spec, {"w": list(ws)}, emb_nk)
            return _tp_forward_block(conv, xg_nk, sh_nk, w)

        _, pull = jax.vjp(f, tuple(mlp_ws), xg, emb_km, sh_km)
        dws, dxg, demb, dsh = pull(ybar)
        # k-major flat outputs, same contract as the kernel
        dxg = dxg.reshape(-1, conv.irreps_x.dim)
        demb = demb.reshape(-1, mlp_spec.dims[0])
        dsh = dsh.reshape(-1, conv.irreps_filter.dim)
        if param_grads:
            return dxg, demb, dsh, tuple(dws)
        return dxg, demb, dsh

    @jax.custom_vjp
    def op(mlp_ws, xg, emb_km, sh_km, ybar):
        return bwd_kernel(xg, emb_km, sh_km, ybar, tuple(mlp_ws))

    def fwd_rule(mlp_ws, xg, emb_km, sh_km, ybar):
        return (
            op(mlp_ws, xg, emb_km, sh_km, ybar),
            (mlp_ws, xg, emb_km, sh_km, ybar),
        )

    def bwd_rule(res, g):
        return jax.vjp(ref, *res)[1](g)

    op.defvjp(fwd_rule, bwd_rule)
    return op


def save_xg_bytes() -> int:
    """Per-layer size cap (bytes of the gathered (N*K, dim_x) tensor) under
    which the forward's gather + k-major relayouts are SAVED as residuals
    for the backward instead of recomputed: the backward then runs at the
    forward's block size and re-reads the same buffers — no regather, no
    relayout (one full HBM round-trip of the largest tensor per layer
    saved). All mid layers' xg stay live through the backward, so the cap
    bounds peak HBM (~4x cap + activations for SevenNet-0)."""
    import os

    return int(os.environ.get("SEVENNET_TPU_SAVE_XG", 2_400_000_000))


def _get_kernels(conv, mlp_spec, A, K, param_grads, A_b=None, embed=None):
    import os

    use_bwd2 = bool(int(os.environ.get("SEVENNET_TPU_BWD2", 1)))
    if A_b is None:
        A_b = fused_conv_bwd_block_atoms(A, K)
    key = (conv, mlp_spec, A, K, param_grads, use_bwd2, A_b, embed)
    if key not in _KERNEL_CACHE:
        if embed is not None:
            # bf16 per-edge x-cotangents halve the mirror/scatter HBM
            # traffic; only without param_grads (the MD path) — the
            # second-order XLA reference is fp32 and its cotangent
            # structure must match the kernel outputs
            dxg_bf16 = (
                not param_grads
                and bool(int(os.environ.get("SEVENNET_TPU_DXG_BF16", 0)))
            )
            bwd_kernel = make_fused_conv_bwd2(
                conv, mlp_spec, A_b, K, param_grads=param_grads, embed=embed,
                dxg_dtype=jnp.bfloat16 if dxg_bf16 else jnp.float32,
            )
            bwd_op = _make_bwd_op(
                conv, mlp_spec, A_b, K, param_grads, bwd_kernel, embed=embed
            )
            _KERNEL_CACHE[key] = (
                make_fused_conv_fwd(conv, mlp_spec, A, K, embed=embed),
                lambda xg, vec, coef, ybar, ws: bwd_op(ws, xg, vec, coef, ybar),
                A_b,
            )
            return _KERNEL_CACHE[key]
        mk = make_fused_conv_bwd2 if use_bwd2 else make_fused_conv_bwd
        bwd_kernel = mk(conv, mlp_spec, A_b, K, param_grads=param_grads)
        bwd_op = _make_bwd_op(conv, mlp_spec, A_b, K, param_grads, bwd_kernel)
        _KERNEL_CACHE[key] = (
            make_fused_conv_fwd(conv, mlp_spec, A, K),
            lambda xg, emb, sh, ybar, ws: bwd_op(ws, xg, emb, sh, ybar),
            A_b,
        )
    return _KERNEL_CACHE[key]


def _get_slotted_bwd(conv, mlp_spec, A, K, span, embed):
    """Ring-buffer backward kernel (vec mode, MD path — no param grads, not
    differentiable further): writes dxg straight into slot ``j % span`` of
    the caller's rolling buffer. Cached separately from the second-order-
    capable ops in :func:`_get_kernels`."""
    import os

    A_b = fused_conv_bwd_block_atoms(A, K)
    key = ("slotted", conv, mlp_spec, A, K, span, A_b, embed)
    if key not in _KERNEL_CACHE:
        dxg_bf16 = bool(int(os.environ.get("SEVENNET_TPU_DXG_BF16", 0)))
        _KERNEL_CACHE[key] = (
            make_fused_conv_bwd2(
                conv, mlp_spec, A_b, K, param_grads=False, embed=embed,
                dxg_dtype=jnp.bfloat16 if dxg_bf16 else jnp.float32,
                out_slots=span,
            ),
            A_b,
        )
    return _KERNEL_CACHE[key]


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_conv(conv, mlp_spec, A, param_grads, mlp_ws, x, emb_nk, sh_nk,
                src_nk, mir_nk):
    K = src_nk.shape[1]
    fwd, _, _ = _get_kernels(conv, mlp_spec, A, K, param_grads)
    xg = x[to_k_major(src_nk, A)]
    out = fwd(
        xg,
        to_k_major(emb_nk, A),
        to_k_major(sh_nk, A),
        tuple(mlp_ws),
    )
    return out


def _save_xg(conv, A, K, N) -> bool:
    """Static policy: stash the forward's gathered xg (+ k-major emb/sh)
    for the backward? Requires the backward to run at the forward's block
    size; bounded by :func:`save_xg_bytes` so all layers' xg staying live
    through the backward cannot blow HBM. When off, the backward uses a
    DIFFERENT block size on purpose — its regather is then structurally
    distinct from the forward's, so XLA cannot CSE the two gathers into
    one long-lived buffer behind our back."""
    A_b = fused_conv_bwd_block_atoms(A, K)
    return (
        A_b == A and N * K * conv.irreps_x.dim * 4 <= save_xg_bytes()
    )


def _fused_conv_fwd_rule(conv, mlp_spec, A, param_grads, mlp_ws, x, emb_nk,
                         sh_nk, src_nk, mir_nk):
    # out always comes from the wrapped primal: grad-of-grad differentiates
    # THIS rule, and the raw pallas fwd kernel has no JVP — re-entering
    # _fused_conv keeps second-order differentiation on the custom rules
    out = _fused_conv(conv, mlp_spec, A, param_grads, mlp_ws, x, emb_nk,
                      sh_nk, src_nk, mir_nk)
    K = src_nk.shape[1]
    if not _save_xg(conv, A, K, x.shape[0]):
        return out, (mlp_ws, x, emb_nk, sh_nk, src_nk, mir_nk)
    # saved-gather residuals: identical HLO to the primal's internals, so
    # XLA CSEs them into ONE gather/relayout whose buffers the backward
    # then reuses directly
    xg = x[to_k_major(src_nk, A)]
    emb_km = to_k_major(emb_nk, A)
    sh_km = to_k_major(sh_nk, A)
    return out, (mlp_ws, xg, emb_km, sh_km, mir_nk)


def _fused_conv_bwd_rule(conv, mlp_spec, A, param_grads, res, ybar):
    if len(res) == 5:
        # saved-gather mode: backward at the forward's block size, reusing
        # the forward's gathered xg and k-major emb/sh (no regather, no
        # relayout)
        mlp_ws, xg, emb_km, sh_km, mir_nk = res
        N, K = mir_nk.shape
        A_b = A
        _, bwd, _ = _get_kernels(conv, mlp_spec, A, K, param_grads, A_b=A)
        outs = bwd(xg, emb_km, sh_km, ybar, tuple(mlp_ws))
        x_dtype = xg.dtype
        emb_dtype, sh_dtype = emb_km.dtype, sh_km.dtype
    else:
        mlp_ws, x, emb_nk, sh_nk, src_nk, mir_nk = res
        N, K = src_nk.shape
        _, bwd, A_b = _get_kernels(conv, mlp_spec, A, K, param_grads)
        src_km = to_k_major(src_nk, A_b)
        xg = x[src_km]
        outs = bwd(
            xg,
            to_k_major(emb_nk, A_b),
            to_k_major(sh_nk, A_b),
            ybar,
            tuple(mlp_ws),
        )
        x_dtype = x.dtype
        emb_dtype, sh_dtype = emb_nk.dtype, sh_nk.dtype
    if param_grads:
        dxg_km, demb_km, dsh_km, dmlp = outs
        dmlp = tuple(g.astype(w.dtype) for g, w in zip(dmlp, mlp_ws))
    else:
        dxg_km, demb_km, dsh_km = outs
        dmlp = tuple(jnp.zeros_like(w) for w in mlp_ws)
    # dx: per-edge contributions live at the edge's own (receiver) slot in
    # k-major order; the contribution TARGETS the sender. Mirror gather:
    # dx[n] = sum_k dxg[mirror of (n, k)] — the mirror of (n,k) is the edge
    # where n is the sender. Index the K-MAJOR dxg directly (row-major ->
    # k-major index arithmetic) instead of rematerializing a row-major
    # copy first: from_k_major is a genuine (NK, dim_x) data movement
    # (~1.5 GB/layer at 10k) XLA cannot fuse into the gather.
    r_loc = mir_nk // K
    kk = mir_nk - r_loc * K
    km = (r_loc // A_b) * (K * A_b) + kk * A_b + (r_loc % A_b)
    dx = jnp.sum(dxg_km[km.reshape(-1)].reshape(N, K, -1), axis=1)
    demb = from_k_major(demb_km, N, K, A_b)
    dsh = from_k_major(dsh_km, N, K, A_b)
    return (
        dmlp,
        dx.astype(x_dtype),
        demb.astype(emb_dtype),
        dsh.astype(sh_dtype),
        np.zeros((N, K), jax.dtypes.float0),
        np.zeros(mir_nk.shape, jax.dtypes.float0),
    )


_fused_conv.defvjp(_fused_conv_fwd_rule, _fused_conv_bwd_rule)


# ---------------------------------------------------------------------------
# vec-mode variants (round 4): edge vectors in, embedding computed in-kernel.
# vec_km is (3, N*K) with k-major block lane order (to_k_major_rows); coef
# is the (n_basis, 1) trainable Bessel frequency column.
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fused_conv_v(conv, mlp_spec, A, param_grads, embed, mlp_ws, coef, x,
                  vec_km, src_nk, mir_nk):
    K = src_nk.shape[1]
    fwd, _, _ = _get_kernels(conv, mlp_spec, A, K, param_grads, embed=embed)
    xg = x[to_k_major(src_nk, A)]
    return fwd(xg, vec_km, coef, tuple(mlp_ws))


def _fused_conv_v_fwd_rule(conv, mlp_spec, A, param_grads, embed, mlp_ws,
                           coef, x, vec_km, src_nk, mir_nk):
    out = _fused_conv_v(conv, mlp_spec, A, param_grads, embed, mlp_ws, coef,
                        x, vec_km, src_nk, mir_nk)
    K = src_nk.shape[1]
    if not _save_xg(conv, A, K, x.shape[0]):
        return out, (mlp_ws, coef, x, vec_km, src_nk, mir_nk)
    xg = x[to_k_major(src_nk, A)]
    return out, (mlp_ws, coef, xg, vec_km, mir_nk)


def _fused_conv_v_bwd_rule(conv, mlp_spec, A, param_grads, embed, res, ybar):
    if len(res) == 5:
        mlp_ws, coef, xg, vec_km, mir_nk = res
        N, K = mir_nk.shape
        A_b = A
        _, bwd, _ = _get_kernels(conv, mlp_spec, A, K, param_grads, A_b=A,
                                 embed=embed)
        vec_b = vec_km
        x_rows = None
    else:
        mlp_ws, coef, x, vec_km, src_nk, mir_nk = res
        N, K = src_nk.shape
        _, bwd, A_b = _get_kernels(conv, mlp_spec, A, K, param_grads,
                                   embed=embed)
        src_km = to_k_major(src_nk, A_b)
        xg = x[src_km]
        vec_b = (
            to_k_major_rows(from_k_major_rows(vec_km, A, K), A_b, K)
            if A_b != A else vec_km
        )
        x_rows = x
    outs = bwd(xg, vec_b, coef, ybar, tuple(mlp_ws))
    if param_grads:
        dxg_km, dvec_b, extras = outs
        dmlp = tuple(
            g.astype(w.dtype) for g, w in zip(extras[:-1], mlp_ws)
        )
        dcoef = extras[-1].astype(coef.dtype)
    else:
        dxg_km, dvec_b = outs
        dmlp = tuple(jnp.zeros_like(w) for w in mlp_ws)
        dcoef = jnp.zeros_like(coef)
    dvec = (
        to_k_major_rows(from_k_major_rows(dvec_b, A_b, K), A, K)
        if A_b != A else dvec_b
    )
    # dx via the mirror-permutation gather (see _fused_conv_bwd_rule)
    r_loc = mir_nk // K
    kk = mir_nk - r_loc * K
    km = (r_loc // A_b) * (K * A_b) + kk * A_b + (r_loc % A_b)
    dx = jnp.sum(
        dxg_km[km.reshape(-1)].astype(jnp.float32).reshape(N, K, -1), axis=1
    )
    x_dtype = xg.dtype if x_rows is None else x_rows.dtype
    return (
        dmlp,
        dcoef,
        dx.astype(x_dtype),
        dvec.astype(vec_km.dtype),
        np.zeros((N, K), jax.dtypes.float0),
        np.zeros(mir_nk.shape, jax.dtypes.float0),
    )


_fused_conv_v.defvjp(_fused_conv_v_fwd_rule, _fused_conv_v_bwd_rule)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _fused_conv_chunked_v(conv, mlp_spec, A, param_grads, embed, RC, mlp_ws,
                          coef, x, vec_rows, src_nk):
    # vec_rows is ROW-major (3, N*K) — each chunk dynamic-slices its own
    # lane span and converts to k-major (cheap: 3 rows). NEVER reshape it
    # to (3, nb, RCK) and permute for scan xs: XLA pads the permuted copy's
    # minor dims to (8, 128) tiles — 42.7x expansion, 4.2 GB at 100k atoms
    N, K = src_nk.shape
    fwd, _, _ = _get_kernels(conv, mlp_spec, A, K, param_grads, embed=embed)
    nb = N // RC
    RCK = RC * K

    def chunk(carry, sl):
        i, src_c = sl
        vec_c = jax.lax.dynamic_slice_in_dim(vec_rows, i * RCK, RCK, 1)
        xg = x[to_k_major(src_c, A)]
        out = fwd(xg, to_k_major_rows(vec_c, A, K), coef, tuple(mlp_ws))
        return carry, jax.lax.optimization_barrier(out)

    src_s = src_nk.reshape(nb, RC, K)
    _, outs = jax.lax.scan(
        chunk, 0, (jnp.arange(nb, dtype=jnp.int32), src_s)
    )
    return outs.reshape(N, -1)


def _fused_conv_chunked_v_fwd(conv, mlp_spec, A, param_grads, embed, RC,
                              mlp_ws, coef, x, vec_rows, src_nk):
    out = _fused_conv_chunked_v(conv, mlp_spec, A, param_grads, embed, RC,
                                mlp_ws, coef, x, vec_rows, src_nk)
    return out, (mlp_ws, coef, x, vec_rows, src_nk)


def _fused_conv_chunked_v_bwd(conv, mlp_spec, A, param_grads, embed, RC,
                              res, ybar):
    mlp_ws, coef, x, vec_rows, src_nk = res
    N, K = src_nk.shape
    dim_x = conv.irreps_x.dim
    _, bwd, A_b = _get_kernels(conv, mlp_spec, A, K, param_grads,
                               embed=embed)
    nb = N // RC
    RCK = RC * K

    def chunk(carry, sl):
        dx, dmlp, dcoef, dvec = carry
        i, src_c, yb_c = sl
        src_km = to_k_major(src_c, A_b)
        xg = x[src_km]
        vec_c = jax.lax.dynamic_slice_in_dim(vec_rows, i * RCK, RCK, 1)
        outs = bwd(xg, to_k_major_rows(vec_c, A_b, K), coef, yb_c,
                   tuple(mlp_ws))
        if param_grads:
            dxg_km, dvec_b, extras = outs
            dmlp = tuple(a + b for a, b in zip(dmlp, extras[:-1]))
            dcoef = dcoef + extras[-1]
        else:
            dxg_km, dvec_b = outs
        # accumulate dvec IN-PLACE in the carry (scan aliases carry
        # buffers) — stacked ys would be permuted+padded by XLA (42.7x)
        dvec = jax.lax.dynamic_update_slice_in_dim(
            dvec, from_k_major_rows(dvec_b, A_b, K), i * RCK, 1
        )
        dx = dx.at[src_km].add(dxg_km.astype(dx.dtype))
        return (dx, dmlp, dcoef, dvec), None

    src_s = src_nk.reshape(nb, RC, K)
    yb_s = ybar.reshape(nb, RC, -1)
    dmlp0 = tuple(jnp.zeros_like(w) for w in mlp_ws)
    dcoef0 = jnp.zeros_like(coef)
    dvec0 = jnp.zeros((3, N * K), jnp.float32)
    (dx, dmlp, dcoef, dvec), _ = jax.lax.scan(
        chunk,
        (jnp.zeros((x.shape[0], dim_x), x.dtype), dmlp0, dcoef0, dvec0),
        (jnp.arange(nb, dtype=jnp.int32), src_s, yb_s),
    )
    dmlp = tuple(g.astype(w.dtype) for g, w in zip(dmlp, mlp_ws))
    return (
        dmlp,
        dcoef.astype(coef.dtype),
        dx.astype(x.dtype),
        dvec.astype(vec_rows.dtype),
        np.zeros(src_nk.shape, jax.dtypes.float0),
    )


_fused_conv_chunked_v.defvjp(_fused_conv_chunked_v_fwd,
                             _fused_conv_chunked_v_bwd)


# ---------------------------------------------------------------------------
# chunked variant for large systems: the (N*K, dim_x) gathered input and the
# (N*K, dim_x) backward edge-cotangent never materialize in full — row
# chunks stream through lax.scan, and dx accumulates by scatter-add (the
# mirror gather needs the full dxg array, so the unchunked path keeps it;
# scatter costs more per edge but bounds memory for 100k+ atoms).
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fused_conv_chunked(conv, mlp_spec, A, param_grads, RC, mlp_ws, x,
                        emb_nk, sh_nk, src_nk):
    # receiver rows come from src_nk: x may be LARGER (extended set with
    # ghost rows in distributed MD — senders beyond the local receivers)
    N, K = src_nk.shape
    fwd, _, _ = _get_kernels(conv, mlp_spec, A, K, param_grads)

    def chunk(carry, sl):
        emb_c, sh_c, src_c = sl
        xg = x[to_k_major(src_c, A)]
        out = fwd(xg, to_k_major(emb_c, A), to_k_major(sh_c, A),
                  tuple(mlp_ws))
        # keep the scan's output stacking OUT of the pallas fusion (XLA
        # otherwise stack-allocates the full stacked buffer in scoped vmem)
        return carry, jax.lax.optimization_barrier(out)

    nb = N // RC
    sl = tuple(
        a.reshape(nb, RC, *a.shape[1:]) for a in (emb_nk, sh_nk, src_nk)
    )
    _, outs = jax.lax.scan(chunk, 0, sl)
    return outs.reshape(N, -1)


def _fused_conv_chunked_fwd(conv, mlp_spec, A, param_grads, RC, mlp_ws, x,
                            emb_nk, sh_nk, src_nk):
    out = _fused_conv_chunked(conv, mlp_spec, A, param_grads, RC, mlp_ws,
                              x, emb_nk, sh_nk, src_nk)
    return out, (mlp_ws, x, emb_nk, sh_nk, src_nk)


def _fused_conv_chunked_bwd(conv, mlp_spec, A, param_grads, RC, res, ybar):
    mlp_ws, x, emb_nk, sh_nk, src_nk = res
    N, K = src_nk.shape
    dim_x = conv.irreps_x.dim
    _, bwd, A_b = _get_kernels(conv, mlp_spec, A, K, param_grads)
    nb = N // RC

    def chunk(carry, sl):
        dx, dmlp = carry
        emb_c, sh_c, src_c, yb_c = sl
        src_km = to_k_major(src_c, A_b)
        xg = x[src_km]
        # NOTE: emb/sh must be in the BACKWARD kernel's block layout (A_b)
        # — passing the forward's (A) layout mispairs the per-edge rows
        # whenever A_b != A (caught by test_chunked_bwd_block_mismatch)
        outs = bwd(xg, to_k_major(emb_c, A_b), to_k_major(sh_c, A_b), yb_c,
                   tuple(mlp_ws))
        if param_grads:
            dxg_km, demb_km, dsh_km, dmlp_c = outs
            dmlp = tuple(a + b for a, b in zip(dmlp, dmlp_c))
        else:
            dxg_km, demb_km, dsh_km = outs
        dx = dx.at[src_km].add(dxg_km)
        return (dx, dmlp), (
            from_k_major(demb_km, RC, K, A_b),
            from_k_major(dsh_km, RC, K, A_b),
        )

    sl = tuple(
        a.reshape(nb, RC, *a.shape[1:])
        for a in (emb_nk, sh_nk, src_nk, ybar)
    )
    dmlp0 = tuple(jnp.zeros_like(w) for w in mlp_ws)
    (dx, dmlp), (demb, dsh) = jax.lax.scan(
        chunk, (jnp.zeros((x.shape[0], dim_x), x.dtype), dmlp0), sl
    )
    dmlp = tuple(g.astype(w.dtype) for g, w in zip(dmlp, mlp_ws))
    return (
        dmlp,
        dx.astype(x.dtype),
        demb.reshape(emb_nk.shape).astype(emb_nk.dtype),
        dsh.reshape(sh_nk.shape).astype(sh_nk.dtype),
        np.zeros(src_nk.shape, jax.dtypes.float0),
    )


_fused_conv_chunked.defvjp(_fused_conv_chunked_fwd, _fused_conv_chunked_bwd)


# ---------------------------------------------------------------------------
# ring mirror backward: the memory-bounded chunked path WITHOUT the
# scatter-add (the 50k+ per-atom cost cliff, PLAN.md round-2 table). Atoms
# must be cell-sorted so every edge's mirror lies within one row chunk of
# its own row, circularly (the MD engine measures the window host-side,
# interleaves the y/z cell order to keep PBC-wrapped neighbors row-local,
# and re-checks the bound at every rebuild). The backward then needs only
# the CURRENT chunk's per-edge dx contributions: the chunks whose mirrors
# can point into it are exactly (i-1, i, i+1), a contiguous row span in an
# extended dx buffer with one chunk of halo rows on each end — each
# iteration gathers the current dxg into that span (mirror-permutation
# gather + K-fold, never scatter), and the two halo spans fold back onto
# the wrapped chunks at the end. A first ring-buffer variant kept 3 chunks
# of dxg live and OOM'd at 100k (3.8 GB); this one holds one transient
# chunk and a 230 MB extended accumulator.
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fused_conv_ring(conv, mlp_spec, A, param_grads, RC, mlp_ws, x,
                     emb_nk, sh_nk, src_nk, mir_nk):
    N, K = src_nk.shape
    fwd, _, _ = _get_kernels(conv, mlp_spec, A, K, param_grads)

    def chunk(carry, sl):
        emb_c, sh_c, src_c = sl
        xg = x[to_k_major(src_c, A)]
        out = fwd(xg, to_k_major(emb_c, A), to_k_major(sh_c, A),
                  tuple(mlp_ws))
        return carry, jax.lax.optimization_barrier(out)

    nb = N // RC
    sl = tuple(
        a.reshape(nb, RC, *a.shape[1:]) for a in (emb_nk, sh_nk, src_nk)
    )
    _, outs = jax.lax.scan(chunk, 0, sl)
    return outs.reshape(N, -1)


def _fused_conv_ring_fwd(conv, mlp_spec, A, param_grads, RC, mlp_ws, x,
                         emb_nk, sh_nk, src_nk, mir_nk):
    out = _fused_conv_ring(conv, mlp_spec, A, param_grads, RC, mlp_ws, x,
                           emb_nk, sh_nk, src_nk, mir_nk)
    return out, (mlp_ws, x, emb_nk, sh_nk, src_nk, mir_nk)


def _fused_conv_ring_bwd(conv, mlp_spec, A, param_grads, RC, res, ybar):
    mlp_ws, x, emb_nk, sh_nk, src_nk, mir_nk = res
    N, K = src_nk.shape
    dim_x = conv.irreps_x.dim
    n_basis = mlp_spec.dims[0]
    dim_f = conv.irreps_filter.dim
    _, bwd, A_b = _get_kernels(conv, mlp_spec, A, K, param_grads)
    nb = N // RC
    RCK = RC * K
    assert nb >= 3, "ring backward needs at least 3 row chunks"

    def slc(a, start, span=1):
        return jax.lax.dynamic_slice_in_dim(a, start, span * RC, 0)

    # circular 3-chunk mirror spans: pad mir with one wrapped chunk on
    # each end so the span for chunk i is always contiguous (tiny: int32)
    mir_ext = jnp.concatenate([mir_nk[N - RC:], mir_nk, mir_nk[:RC]], 0)

    def iteration(carry, i):
        # accumulation happens IN-PLACE in the carry (scan aliases carry
        # buffers): stacked ys at 100k cost ~1.5 GB of padded copies on
        # top of the outputs themselves
        dmlp, dx_ext, demb, dsh = carry
        start = i * RC
        src_c = slc(src_nk, start)
        src_km = to_k_major(src_c, A_b)
        xg = x[src_km]
        outs = bwd(
            xg,
            to_k_major(slc(emb_nk, start), A_b),
            to_k_major(slc(sh_nk, start), A_b),
            slc(ybar, start),
            tuple(mlp_ws),
        )
        if param_grads:
            dxg_km, demb_km, dsh_km, dmlp_c = outs
            dmlp = tuple(a + b for a, b in zip(dmlp, dmlp_c))
        else:
            dxg_km, demb_km, dsh_km = outs
        demb = jax.lax.dynamic_update_slice_in_dim(
            demb, from_k_major(demb_km, RC, K, A_b), start, 0
        )
        dsh = jax.lax.dynamic_update_slice_in_dim(
            dsh, from_k_major(dsh_km, RC, K, A_b), start, 0
        )
        # mirror rows of chunks (i-1, i, i+1): the only rows whose mirrors
        # can point into chunk i (window contract). Gather straight from
        # the K-MAJOR dxg (no row-major rematerialization).
        m3 = slc(mir_ext, start, 3)               # (3RC, K), flat in N*K
        q = m3 // RCK
        sel = q == i
        o = jnp.where(sel, m3 - i * RCK, 0)       # row-major offset in chunk
        r_loc = o // K
        kk = o - r_loc * K
        km = (r_loc // A_b) * (K * A_b) + kk * A_b + r_loc - (r_loc // A_b) * A_b
        contrib = jnp.where(
            sel[..., None], dxg_km[km.reshape(-1)].reshape(3 * RC, K, dim_x),
            0.0,
        ).sum(axis=1)                             # (3RC, dim_x)
        cur = slc(dx_ext, start, 3)
        dx_ext = jax.lax.dynamic_update_slice_in_dim(
            dx_ext, cur + contrib, start, 0
        )
        return (dmlp, dx_ext, demb, dsh), None

    dmlp0 = tuple(jnp.zeros_like(w) for w in mlp_ws)
    dx_ext0 = jnp.zeros((N + 2 * RC, dim_x), jnp.float32)
    demb0 = jnp.zeros(emb_nk.shape, jnp.float32)
    dsh0 = jnp.zeros(sh_nk.shape, jnp.float32)
    (dmlp, dx_ext, demb, dsh), _ = jax.lax.scan(
        iteration, (dmlp0, dx_ext0, demb0, dsh0),
        jnp.arange(nb, dtype=jnp.int32),
    )
    # fold the wrapped halo spans back onto chunks nb-1 and 0
    dx = dx_ext[RC : RC + N]
    dx = dx.at[N - RC :].add(dx_ext[:RC])
    dx = dx.at[:RC].add(dx_ext[N + RC :])
    dmlp = tuple(g.astype(w.dtype) for g, w in zip(dmlp, mlp_ws))
    return (
        dmlp,
        dx.astype(x.dtype),
        demb.astype(emb_nk.dtype),
        dsh.astype(sh_nk.dtype),
        np.zeros(src_nk.shape, jax.dtypes.float0),
        np.zeros(mir_nk.shape, jax.dtypes.float0),
    )


_fused_conv_ring.defvjp(_fused_conv_ring_fwd, _fused_conv_ring_bwd)


# ---------------------------------------------------------------------------
# vec-mode ring mirror backward (round 4): the ring/halo accumulation above
# combined with the in-kernel edge embedding, generalized to a W-chunk
# mirror window. This replaces the scatter-add per-chunk dx accumulation
# (the 100k trace's #1 cost: 145 ms/layer/step of colliding scatters at
# ~25% efficiency) with a contiguous (2W+1)-chunk mirror GATHER: each
# iteration reads its own dxg exactly once per hit (misses index row 0 —
# cache-resident), accumulating into a halo-extended dx. W =
# ceil(mirror_window_rows / RC); the cell-interleaved sort bounds the
# window (~1.3 x-layers), and the engine re-checks the contract at every
# rebuild (ring_overflow -> grow). The r3 1-chunk ring lost at 100k only
# because the window forced RC up to 9.1k rows (3x dxg reads of huge
# chunks); decoupling W from RC keeps chunks edge_chunk-sized.
# ---------------------------------------------------------------------------


def _window_gather_on() -> bool:
    """Window-local xg gathers in the ring paths (round 5): the ring
    contract guarantees every edge's source atom lies within W chunks of
    its receiver chunk, so each chunk dynamic-slices the (2W+1)*RC-row
    window (~45 MB at 100k) into a contiguous table and gathers locally.
    Measured 2546 -> 1868 ms/step at 100k (-27%): in-context XLA row
    gathers run ~4x faster from tens-of-MB tables (the isolated
    r5_gather_probe shows a flat rate — the effect only appears in full
    programs, cf. the 10k trace's 3.4 vs 14.9 ns/row)."""
    import os

    return bool(int(os.environ.get("SEVENNET_TPU_WINDOW_GATHER", 1)))


def _windowed_xg(x_ext, src_c, i, W, RC, nb, N, A):
    """Gather chunk i's x rows from its span window of the extended table
    (``x_ext = concat([x, x[:span*RC]])``)."""
    base = jnp.mod(i - W, nb) * RC
    span = 2 * W + 1
    xs = jax.lax.dynamic_slice_in_dim(x_ext, base, span * RC, 0)
    loc = jnp.mod(src_c - base, N)
    return xs[to_k_major(loc, A)]


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6))
def _fused_conv_ring_v(conv, mlp_spec, A, param_grads, embed, RC, W, mlp_ws,
                       coef, x, vec_rows, src_nk, mir_nk):
    N, K = src_nk.shape
    fwd, _, _ = _get_kernels(conv, mlp_spec, A, K, param_grads, embed=embed)
    nb = N // RC
    RCK = RC * K
    span = 2 * W + 1
    windowed = _window_gather_on() and span < nb
    x_ext = jnp.concatenate([x, x[: span * RC]], 0) if windowed else None

    def chunk(carry, sl):
        i, src_c = sl
        vec_c = jax.lax.dynamic_slice_in_dim(vec_rows, i * RCK, RCK, 1)
        if windowed:
            xg = _windowed_xg(x_ext, src_c, i, W, RC, nb, N, A)
        else:
            xg = x[to_k_major(src_c, A)]
        out = fwd(xg, to_k_major_rows(vec_c, A, K), coef, tuple(mlp_ws))
        return carry, jax.lax.optimization_barrier(out)

    src_s = src_nk.reshape(nb, RC, K)
    _, outs = jax.lax.scan(
        chunk, 0, (jnp.arange(nb, dtype=jnp.int32), src_s)
    )
    return outs.reshape(N, -1)


def _fused_conv_ring_v_fwd(conv, mlp_spec, A, param_grads, embed, RC, W,
                           mlp_ws, coef, x, vec_rows, src_nk, mir_nk):
    out = _fused_conv_ring_v(conv, mlp_spec, A, param_grads, embed, RC, W,
                             mlp_ws, coef, x, vec_rows, src_nk, mir_nk)
    return out, (mlp_ws, coef, x, vec_rows, src_nk, mir_nk)


def _fused_conv_ring_v_bwd(conv, mlp_spec, A, param_grads, embed, RC, W,
                           res, ybar):
    """Rolling-buffer mirror backward (round 5, rev 2: pinned wrap slots).

    The r4 halo variant gathered a (2W+1)-chunk mirror span against EVERY
    chunk's transient dxg with a hit mask — span x redundant gather
    traffic (measured 9.2 s/step at 100k with W=3). Here a rolling HBM
    buffer keeps the window's dxg chunks live and each destination chunk
    gathers its K mirrors EXACTLY ONCE — the same total gather traffic
    as the unchunked mirror path, with bounded memory.

    Slot map: chunks 0..2W-1 are PINNED in dedicated slots
    span..span+2W-1 (never overwritten — the wrapped windows of the
    first and last W destinations need them after the scan), all other
    chunks cycle through slot c % span. Iteration j computes chunk j's
    dxg into its slot and emits dx for destination i = j-W when the
    destination's window is fully computed and non-wrapping (j >= 2W);
    after the scan a gather-only epilogue emits the 2W wrapped-window
    destinations (0..W-1 need the last-computed high chunks, nb-W..nb-1
    the pinned low chunks). Exactly nb kernel calls — the rev-1 design
    recomputed 2W prologue chunks per layer (~22% extra backward kernel
    and xg-gather cost at 100k) and needed nb % (2W+1) == 0, which
    inflated W at bench geometry."""
    mlp_ws, coef, x, vec_rows, src_nk, mir_nk = res
    N, K = src_nk.shape
    dim_x = conv.irreps_x.dim
    _, bwd, A_b = _get_kernels(conv, mlp_spec, A, K, param_grads,
                               embed=embed)
    nb = N // RC
    RCK = RC * K
    span = 2 * W + 1
    S = span + 2 * W  # cycling slots + pinned wrap slots
    assert nb >= span, (
        f"ring backward needs >= 2W+1 = {span} row chunks (have {nb})"
    )

    def slot_of(c):
        return jnp.where(c < 2 * W, span + c, jnp.mod(c, span))

    def slc(a, start):
        return jax.lax.dynamic_slice_in_dim(a, start, RC, 0)

    windowed = _window_gather_on() and span < nb
    x_ext = jnp.concatenate([x, x[: span * RC]], 0) if windowed else None

    def chunk_inputs(j):
        start = j * RC
        src_c = slc(src_nk, start)
        if windowed:
            xg = _windowed_xg(x_ext, src_c, j, W, RC, nb, N, A_b)
        else:
            xg = x[to_k_major(src_c, A_b)]
        vec_c = jax.lax.dynamic_slice_in_dim(vec_rows, start * K, RCK, 1)
        return xg, to_k_major_rows(vec_c, A_b, K), slc(ybar, start)

    if param_grads:
        def chunk_dxg(buf, j):
            """Kernel on chunk j; dxg is update-sliced into the buffer."""
            xg, vec_c, yb = chunk_inputs(j)
            dxg_km, dvec_b, extras = bwd(xg, vec_c, coef, yb, tuple(mlp_ws))
            buf = jax.lax.dynamic_update_slice_in_dim(
                buf, dxg_km, slot_of(j) * RCK, 0
            )
            return buf, dvec_b, extras
    else:
        # MD path: the slotted kernel writes dxg DIRECTLY into the
        # rolling buffer (aliased output, scalar-prefetch slot index) —
        # saves a full HBM read+write of the (RCK, dim_x) dxg per chunk
        bwd_slot, A_b_s = _get_slotted_bwd(conv, mlp_spec, A, K, S,
                                           embed)
        assert A_b_s == A_b

        def chunk_dxg(buf, j):
            xg, vec_c, yb = chunk_inputs(j)
            slot = slot_of(jnp.asarray(j, jnp.int32)).astype(
                jnp.int32).reshape(1)
            buf, dvec_b = bwd_slot(slot, buf, xg, vec_c, coef, yb,
                                   tuple(mlp_ws))
            return buf, dvec_b, ()

    import os as _os_r

    dxg_dt = (
        jnp.bfloat16
        if (not param_grads
            and bool(int(_os_r.environ.get("SEVENNET_TPU_DXG_BF16", 0))))
        else jnp.float32
    )

    def emit(buf, i):
        """dx for destination chunk i: every mirror of its rows lies in
        chunks i-W..i+W (ring contract, re-checked at each rebuild), all
        live in the buffer — gather each dxg row once, no masks (bf16
        rows when SEVENNET_TPU_DXG_BF16 — half traffic)."""
        mir_c = slc(mir_nk, i * RC)                     # (RC, K) global
        q_m = mir_c // RCK
        o = mir_c - q_m * RCK
        r_loc = o // K
        kk = o - r_loc * K
        km = (
            (r_loc // A_b) * (K * A_b) + kk * A_b
            + r_loc - (r_loc // A_b) * A_b
        )
        rows = slot_of(q_m) * RCK + km
        return (
            buf[rows.reshape(-1)]
            .astype(jnp.float32)
            .reshape(RC, K, dim_x)
            .sum(axis=1)
        )

    buf = jnp.zeros((S * RCK, dim_x), dxg_dt)

    def iteration(carry, j):
        dmlp, dcoef, dvec, buf = carry
        buf, dvec_b, extras = chunk_dxg(buf, j)
        if param_grads:
            dmlp = tuple(a + b for a, b in zip(dmlp, extras[:-1]))
            dcoef = dcoef + extras[-1]
        # dvec accumulates IN-PLACE in the carry: stacked ys would be
        # permuted+padded by XLA (42.7x expansion at 100k atoms)
        dvec = jax.lax.dynamic_update_slice_in_dim(
            dvec, from_k_major_rows(dvec_b, A_b, K), j * RCK, 1
        )
        # emit destination j-W, whose full window is now computed; the
        # first 2W iterations skip (their destinations wrap — the
        # epilogue below emits them from the pinned/live slots)
        contrib = jax.lax.cond(
            j >= 2 * W,
            lambda: emit(buf, j - W),
            lambda: jnp.zeros((RC, dim_x), jnp.float32),
        )
        return (dmlp, dcoef, dvec, buf), contrib

    dmlp0 = tuple(jnp.zeros_like(w) for w in mlp_ws)
    dcoef0 = jnp.zeros_like(coef)
    dvec0 = jnp.zeros((3, N * K), jnp.float32)
    (dmlp, dcoef, dvec, buf), ys = jax.lax.scan(
        iteration, (dmlp0, dcoef0, dvec0, buf),
        jnp.arange(nb, dtype=jnp.int32),
    )
    # ys[j] holds destination j-W -> destination d sits at ys[d+W]
    dx = jnp.roll(ys, -W, axis=0).reshape(N, dim_x)
    # epilogue: the 2W wrapped-window destinations — the first W need
    # the last-computed high chunks, the last W the pinned low chunks;
    # gather-only, no kernel recompute
    for d in list(range(W)) + list(range(nb - W, nb)):
        dx = jax.lax.dynamic_update_slice_in_dim(
            dx, emit(buf, d), d * RC, 0
        )
    dmlp = tuple(g.astype(w.dtype) for g, w in zip(dmlp, mlp_ws))
    return (
        dmlp,
        dcoef.astype(coef.dtype),
        dx.astype(x.dtype),
        dvec.astype(vec_rows.dtype),
        np.zeros(src_nk.shape, jax.dtypes.float0),
        np.zeros(mir_nk.shape, jax.dtypes.float0),
    )


_fused_conv_ring_v.defvjp(_fused_conv_ring_v_fwd, _fused_conv_ring_v_bwd)


def fused_conv_apply(
    conv: ConvTPSpec,
    mlp_spec: ScalarMLPSpec,
    mlp_params,
    x,          # (N, dim_x)
    emb_nk,     # (N, K, n_basis), zero on padded slots
    sh_nk,      # (N, K, dim_f)
    src_nk,     # (N, K) int32
    mir_nk,     # (N, K) int32 flat mirror indices (mirror_map)
    *,
    block_atoms: int = 0,
    param_grads: bool = True,
    row_chunk: int = 0,
    ring: bool = False,
):
    """Fused Pallas conv with the mirror-reduced backward. ``x`` padding
    rows must be inert (gathered but masked by zero emb). ``row_chunk``
    (atoms, rounded to the block size) streams the gather + kernels in
    chunks and switches the backward to scatter-add accumulation — the
    memory-bounded mode for 100k+ atoms. ``ring=True`` (requires
    cell-sorted atoms with every mirror within one row chunk, and
    ``row_chunk`` dividing the atom capacity into >= 3 chunks) replaces
    that scatter with the ring-buffer mirror gather."""
    K = src_nk.shape[1]
    A = block_atoms or fused_conv_block_atoms(K)
    n = x.shape[0]
    assert n % A == 0, (
        f"atom capacity {n} must be a multiple of the conv block size {A}"
    )
    ws = tuple(mlp_params["w"]) if isinstance(mlp_params, dict) else tuple(mlp_params)
    if ring and row_chunk and row_chunk < n:
        RC = (row_chunk // A) * A
        assert RC > 0 and n % RC == 0 and n // RC >= 3, (
            f"ring backward needs row_chunk ({RC}) to divide the atom "
            f"capacity ({n}) into >= 3 chunks"
        )
        return _fused_conv_ring(
            conv, mlp_spec, A, bool(param_grads), RC, ws, x, emb_nk,
            sh_nk, src_nk, mir_nk,
        )
    if row_chunk and row_chunk < n:
        # pad the row count to a multiple of the chunk instead of shrinking
        # the chunk to a divisor of n (awkward factorizations collapsed RC
        # to tiny values — 139 chunks/layer at 20k atoms, 6.5 s/step).
        # Padded rows carry zero emb -> zero weights -> zero contributions,
        # and their scatter targets (src=0) receive exact zeros.
        RC = max(A, (row_chunk // A) * A)
        Np = -(-n // RC) * RC
        if Np > n:
            pad = Np - n
            x_p = jnp.pad(x, ((0, pad), (0, 0)))
            emb_p = jnp.pad(emb_nk, ((0, pad), (0, 0), (0, 0)))
            sh_p = jnp.pad(sh_nk, ((0, pad), (0, 0), (0, 0)))
            src_p = jnp.pad(src_nk, ((0, pad), (0, 0)))
        else:
            x_p, emb_p, sh_p, src_p = x, emb_nk, sh_nk, src_nk
        out = _fused_conv_chunked(
            conv, mlp_spec, A, bool(param_grads), RC, ws, x_p, emb_p,
            sh_p, src_p,
        )
        return out[:n]
    return _fused_conv(
        conv, mlp_spec, A, bool(param_grads), ws, x, emb_nk, sh_nk,
        src_nk, mir_nk,
    )


def fused_conv_apply_vec(
    conv: ConvTPSpec,
    mlp_spec: ScalarMLPSpec,
    mlp_params,
    bessel_coef,  # (n_basis, 1)
    embed: EdgeEmbedSpec,
    x,          # (N, dim_x)
    vec_rows,   # (3, N*K) ROW-major (receiver-major) edge vectors;
                # sentinel vectors with r > cutoff on padded slots
    src_nk,     # (N, K) int32
    mir_nk,     # (N, K) int32 flat mirror indices (mirror_map)
    *,
    block_atoms: int = 0,
    param_grads: bool = True,
    row_chunk: int = 0,
    ring: int = 0,
):
    """Vec-mode fused Pallas conv: the Bessel basis, cutoff envelope and
    spherical harmonics are computed in-kernel from the raw edge vectors
    (forward AND backward — the backward chains the sh/emb cotangents to
    ``dvec`` in-kernel). Eliminates the (N*K, n_basis)/(N*K, dim_f) HBM
    arrays, whose minor dims pad to 128 lanes (14-16x traffic waste), their
    k-major relayouts, and their XLA backward chains. See
    :func:`fused_conv_apply` for the chunking and ring contracts."""
    K = src_nk.shape[1]
    A = block_atoms or fused_conv_block_atoms(K)
    n = x.shape[0]
    assert n % A == 0, (n, A)
    ws = tuple(mlp_params["w"]) if isinstance(mlp_params, dict) else tuple(mlp_params)
    if ring and row_chunk and row_chunk < n:
        W = int(ring)  # mirror window in chunks (True -> 1)
        RC = (row_chunk // A) * A
        assert RC > 0 and n % RC == 0 and n // RC >= 2 * W + 1, (
            f"ring backward needs row_chunk ({RC}) to divide the atom "
            f"capacity ({n}) into >= 2W+1 = {2 * W + 1} chunks"
        )
        return _fused_conv_ring_v(
            conv, mlp_spec, A, bool(param_grads), embed, RC, W, ws,
            bessel_coef, x, vec_rows, src_nk, mir_nk,
        )
    if row_chunk and row_chunk < n:
        RC = max(A, (row_chunk // A) * A)
        Np = -(-n // RC) * RC
        if Np > n:
            pad = Np - n
            x_p = jnp.pad(x, ((0, pad), (0, 0)))
            src_p = jnp.pad(src_nk, ((0, pad), (0, 0)))
            # padded slots must stay beyond the cutoff (sentinel vectors)
            vec_p = jnp.concatenate(
                [
                    vec_rows,
                    jnp.zeros((3, pad * K), vec_rows.dtype)
                    .at[0].set(2.0 * embed.cutoff),
                ],
                axis=1,
            )
        else:
            x_p, src_p, vec_p = x, src_nk, vec_rows
        out = _fused_conv_chunked_v(
            conv, mlp_spec, A, bool(param_grads), embed, RC, ws,
            bessel_coef, x_p, vec_p, src_p,
        )
        return out[:n]
    return _fused_conv_v(
        conv, mlp_spec, A, bool(param_grads), embed, ws, bessel_coef, x,
        to_k_major_rows(vec_rows, A, K), src_nk, mir_nk,
    )


def fused_conv_apply_ext_vec(
    conv: ConvTPSpec,
    mlp_spec: ScalarMLPSpec,
    mlp_params,
    bessel_coef,
    embed: EdgeEmbedSpec,
    x_ext,      # (N_ext, dim_x) — local rows first, then ghosts
    vec_rows,   # (3, N*K) ROW-major edge vectors (sentinels on padding)
    src_nk,     # (N, K) int32 indices into x_ext
    *,
    block_atoms: int = 0,
    param_grads: bool = True,
    row_chunk: int = 0,
):
    """Vec-mode fused conv over an EXTENDED sender set (distributed MD
    ghosts) — always the scatter-add chunked backward, like
    :func:`fused_conv_apply_ext`."""
    N, K = src_nk.shape
    A = block_atoms or fused_conv_block_atoms(K)
    ws = tuple(mlp_params["w"]) if isinstance(mlp_params, dict) else tuple(mlp_params)
    RC = max(A, ((row_chunk or N) // A) * A)
    Np = -(-N // RC) * RC
    if Np > N:
        pad = Np - N
        src_nk = jnp.pad(src_nk, ((0, pad), (0, 0)))
        vec_rows = jnp.concatenate(
            [
                vec_rows,
                jnp.zeros((3, pad * K), vec_rows.dtype)
                .at[0].set(2.0 * embed.cutoff),
            ],
            axis=1,
        )
    out = _fused_conv_chunked_v(
        conv, mlp_spec, A, bool(param_grads), embed, RC, ws, bessel_coef,
        x_ext, vec_rows, src_nk,
    )
    return out[:N]


def fused_conv_apply_ext(
    conv: ConvTPSpec,
    mlp_spec: ScalarMLPSpec,
    mlp_params,
    x_ext,      # (N_ext, dim_x) — local rows first, then ghosts
    emb_nk,     # (N, K, n_basis), zero on padded slots
    sh_nk,      # (N, K, dim_f)
    src_nk,     # (N, K) int32 indices into x_ext
    *,
    block_atoms: int = 0,
    param_grads: bool = True,
    row_chunk: int = 0,
):
    """Fused Pallas conv whose senders index an EXTENDED feature set
    (owned + ghost rows — distributed domain decomposition). Receiver rows
    come from ``src_nk``; ``x_ext`` may be larger. Always uses the
    scatter-add backward: the mirror reduction assumes a symmetric neighbor
    list, which domain boundaries break (a ghost sender's reverse edge
    lives on the neighboring device). The x-cotangent therefore covers
    ghost rows too and flows back through the halo exchange's transpose."""
    N, K = src_nk.shape
    A = block_atoms or fused_conv_block_atoms(K)
    ws = tuple(mlp_params["w"]) if isinstance(mlp_params, dict) else tuple(mlp_params)
    RC = max(A, ((row_chunk or N) // A) * A)
    Np = -(-N // RC) * RC
    if Np > N:
        pad = Np - N
        emb_nk = jnp.pad(emb_nk, ((0, pad), (0, 0), (0, 0)))
        sh_nk = jnp.pad(sh_nk, ((0, pad), (0, 0), (0, 0)))
        src_nk = jnp.pad(src_nk, ((0, pad), (0, 0)))
    out = _fused_conv_chunked(
        conv, mlp_spec, A, bool(param_grads), RC, ws, x_ext, emb_nk,
        sh_nk, src_nk,
    )
    return out[:N]
