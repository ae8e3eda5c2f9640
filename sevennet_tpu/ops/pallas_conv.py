"""Pallas TPU kernel: fused radial-MLP + uvu tensor product + neighbor
reduction over the dense (N, K) layout.

This is the TPU analogue of the reference's kernel-level accelerators
(cuEquivariance / FlashTP / OpenEquivariance, ``sevenn/nn/*_helper.py``):
one kernel per atom block computes the radial weights from the edge
embedding (never materializing the (N, K, weight_numel) tensor in HBM),
contracts the Wigner-coupled tensor product, and reduces over the K
neighbor slots in VMEM.

Status: compiles and runs on hardware (v5e), numerically validated against
the XLA dense path; NOT yet the production default — measured 118.8 ms vs
XLA's 20.3 ms for a SevenNet-0 layer at N=3072, K=96 (the per-instruction
fori_loop + lax.switch that bounds VMEM also serializes the VPU work and
blocks pipelining). Hardware constraints learned: output block's
second-to-last dim must be a multiple of 8 (a_block >= 8); a fully
unrolled 15-instruction body exceeds the 16 MB scoped VMEM (65 MB, no
temporary reuse), hence the loop/switch. Round-2 direction: unroll with
pl.run_scoped-reused scratch instead of switch, tile the mul axis to 128
lanes, and fold the K-reduction into MXU dots. Forward only — gradients
fall back to XLA.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..irreps import Irreps
from ..ops.activations import NORMALIZE2MOM_CST
from ..so3.wigner import real_wigner_3j

__all__ = ["dense_conv_pallas", "make_dense_conv_kernel"]


def _group_layout(irreps_mid: Irreps):
    """Column layout of the grouped ir_mul output: list of
    (k, group_col_start, d, mul_offset_in_group, group_mul_total)."""
    out = []
    col = 0
    k = 0
    nb = len(irreps_mid)
    while k < nb:
        ir = irreps_mid[k].ir
        group = []
        mul_total = 0
        while k < nb and irreps_mid[k].ir == ir:
            group.append((k, irreps_mid[k].mul))
            mul_total += irreps_mid[k].mul
            k += 1
        moff = 0
        for kk, mul in group:
            out.append((kk, col, ir.dim, moff, mul_total, mul))
            moff += mul
        col += ir.dim * mul_total
    return out, col


def make_dense_conv_kernel(conv_spec, mlp_spec, a_block: int, K: int,
                           act: str = "silu", interpret: bool = False):
    """Build a jittable fused conv: (x, emb, sh, src, mlp_ws) -> (N, dim_mid).

    ``conv_spec``: ConvTPSpec; ``mlp_spec``: ScalarMLPSpec. Edge arrays are
    in the (N, K) dense layout, pre-flattened to (N*K, ...); ``x`` is the
    full node-feature array (the gather happens in XLA before the kernel).
    """
    irreps_x = conv_spec.irreps_x
    irreps_f = conv_spec.irreps_filter
    irreps_mid = conv_spec.irreps_mid
    dim_x = irreps_x.dim
    dim_f = irreps_f.dim
    layout, dim_mid = _group_layout(irreps_mid)
    assert dim_mid == irreps_mid.dim
    layout_by_k = {entry[0]: entry for entry in layout}

    xs = irreps_x.slices()
    fs = irreps_f.slices()
    cst = NORMALIZE2MOM_CST[act]
    act_fn = {"silu": jax.nn.silu}[act] if act == "silu" else None
    n_mlp = len(mlp_spec.dims) - 1

    # static per-instruction metadata
    instr = []
    w_off = 0
    for i, j, k, pw in conv_spec.instructions:
        mi_x = irreps_x[i]
        mi_f = irreps_f[j]
        mi_o = irreps_mid[k]
        w3j = real_wigner_3j(mi_x.ir.l, mi_f.ir.l, mi_o.ir.l) * pw
        # pre-transpose for the in-kernel matmul: (d2, d1*d3) so that
        # tmp[e, m, p] = sum_n w3j[m, n, p] * Y[e, n]
        w3j_t = np.ascontiguousarray(
            np.asarray(w3j, np.float32).transpose(1, 0, 2).reshape(
                mi_f.ir.dim, -1
            )
        )
        instr.append(
            dict(
                x_sl=xs[i], f_sl=fs[j], w_sl=slice(w_off, w_off + mi_x.mul),
                d1=mi_x.ir.dim, d2=mi_f.ir.dim, d3=mi_o.ir.dim, mul=mi_x.mul,
                w3j=w3j_t, k=k,
            )
        )
        w_off += mi_x.mul

    T = a_block * K

    def kernel(xg_ref, emb_ref, sh_ref, *rest):
        mlp_refs = rest[:n_mlp]
        w3j_refs = rest[n_mlp:-1]
        out_ref = rest[-1]
        # radial MLP in VMEM (e3nn FullyConnectedNet semantics)
        h = emb_ref[:]
        for li, wref in enumerate(mlp_refs):
            w = wref[:]
            h = jnp.dot(h, w, preferred_element_type=jnp.float32) / math.sqrt(
                w.shape[0]
            )
            if li < n_mlp - 1:
                h = jax.nn.silu(h) * cst

        # 2D-only compute (Mosaic-friendly): blocks are flat ir_mul columns,
        # every slice below is a static 2D column slice. Instructions run in
        # a fori_loop with a lax.switch so Mosaic allocates VMEM for ONE
        # instruction's temporaries, not the unrolled sum of all of them.
        out_ref[:] = jnp.zeros_like(out_ref)

        def make_branch(ii):
            ins = instr[ii]

            def branch(_):
                d1, d3, mul = ins["d1"], ins["d3"], ins["mul"]
                xw_flat = xg_ref[:, ins["x_sl"]]  # (T, d1*mul), ir_mul layout
                fb = sh_ref[:, ins["f_sl"]]
                wb = h[:, ins["w_sl"]]  # (T, mul)
                w3j = w3j_refs[ii][:]  # (d2, d1*d3)
                tmp = jnp.dot(fb, w3j, preferred_element_type=jnp.float32)
                _, col, d, moff, mul_total, _ = layout_by_k[ins["k"]]
                for p in range(d3):
                    acc = None
                    for m in range(d1):
                        term = (
                            tmp[:, m * d3 + p][:, None]
                            * xw_flat[:, m * mul : (m + 1) * mul]
                        )
                        acc = term if acc is None else acc + term
                    acc = acc * wb  # (T, mul)
                    red = acc.reshape(a_block, K, mul).sum(axis=1)  # (A, mul)
                    start = col + p * mul_total + moff
                    out_ref[:, start : start + mul] = (
                        out_ref[:, start : start + mul] + red
                    )
                return 0

            return branch

        branches = [make_branch(ii) for ii in range(len(instr))]

        def body(jj, carry):
            jax.lax.switch(jj, branches, 0)
            return carry

        jax.lax.fori_loop(0, len(instr), body, 0)

    def fused(x, emb, sh, src, mlp_ws):
        n_atoms = x.shape[0]
        assert n_atoms % a_block == 0, (n_atoms, a_block)
        grid = (n_atoms // a_block,)
        xg = x[src.reshape(-1)]  # (N*K, dim_x) gather stays in XLA
        in_specs = [
            pl.BlockSpec((T, dim_x), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (T, mlp_spec.dims[0]), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((T, dim_f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for w in mlp_ws
        ] + [
            pl.BlockSpec(
                (ins["d2"], ins["d1"] * ins["d3"]),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            )
            for ins in instr
        ]
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (a_block, dim_mid), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_atoms, dim_mid), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(
            xg,
            emb.reshape(-1, mlp_spec.dims[0]),
            sh.reshape(-1, dim_f),
            *mlp_ws,
            *[
                jnp.asarray(ins["w3j"], jnp.float32)
                for ins in instr
            ],
        )

    return fused


def dense_conv_pallas(conv_spec, mlp_spec, x, emb, sh, src, mlp_ws,
                      a_block: int = 8, interpret: bool = False):
    """Convenience wrapper; emb/sh/src in (N, K, ...) layout."""
    K = src.shape[1]
    fused = make_dense_conv_kernel(conv_spec, mlp_spec, a_block, K,
                                   interpret=interpret)
    return fused(x, emb, sh, src, mlp_ws)
