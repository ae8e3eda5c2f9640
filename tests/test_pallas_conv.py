"""Pallas fused dense-conv kernel vs the XLA dense path (interpreter mode
on CPU; on-hardware profiling happens via scripts_dev)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sevennet_tpu.irreps import Irreps, infer_irreps_out
from sevennet_tpu.ops.mlp import ScalarMLPSpec, scalar_mlp_apply, scalar_mlp_init
from sevennet_tpu.ops.pallas_conv import dense_conv_pallas
from sevennet_tpu.ops.tensor_product import ConvTPSpec
from sevennet_tpu.so3.wigner import real_wigner_3j


def _xla_dense_reference(conv, mlp_spec, x, emb, sh, src, mlp_ws):
    """Mirror of model._convolve_dense (grouped ir_mul assembly)."""
    N, K = src.shape
    w = scalar_mlp_apply(mlp_spec, {"w": list(mlp_ws)}, emb)
    xg = x[src]
    xs = conv.irreps_x.slices()
    fs = conv.irreps_filter.slices()
    out = [None] * len(conv.irreps_mid)
    w_off = 0
    for i, j, k, pw in conv.instructions:
        mi_x, mi_f, mi_o = conv.irreps_x[i], conv.irreps_filter[j], conv.irreps_mid[k]
        w3j = jnp.asarray(real_wigner_3j(mi_x.ir.l, mi_f.ir.l, mi_o.ir.l), x.dtype)
        xb = xg[:, :, xs[i]].reshape(N, K, mi_x.ir.dim, mi_x.mul)
        fb = sh[:, :, fs[j]]
        wb = w[:, :, w_off : w_off + mi_x.mul]
        w_off += mi_x.mul
        tmp = jnp.einsum("mnp,akn->akmp", w3j, fb)
        xw = xb * (pw * wb)[:, :, None, :]
        msg = jnp.einsum("akmp,akmu->apu", tmp, xw)
        out[k] = msg if out[k] is None else out[k] + msg
    pieces = []
    kk = 0
    nb = len(conv.irreps_mid)
    while kk < nb:
        ir = conv.irreps_mid[kk].ir
        grp = []
        while kk < nb and conv.irreps_mid[kk].ir == ir:
            mi = conv.irreps_mid[kk]
            blk = out[kk]
            if blk is None:
                blk = jnp.zeros((N, mi.ir.dim, mi.mul), x.dtype)
            grp.append(blk)
            kk += 1
        pieces.append(
            (grp[0] if len(grp) == 1 else jnp.concatenate(grp, -1)).reshape(N, -1)
        )
    return jnp.concatenate(pieces, -1)


@pytest.mark.parametrize("parity", [
    pytest.param(False, marks=pytest.mark.slow), True])
def test_pallas_kernel_matches_xla(parity):
    x_ir = Irreps("16x0e+8x1o+4x2e" if parity else "16x0e+8x1e+4x2e")
    f_ir = Irreps.spherical_harmonics(2, -1 if parity else 1)
    tgt = infer_irreps_out(x_ir, f_ir, 2, "full")
    conv = ConvTPSpec(x_ir, f_ir, tgt)
    mlp = ScalarMLPSpec((8, 16, conv.weight_numel))

    N, K = 16, 8
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, x_ir.dim))
    emb = jax.random.normal(jax.random.PRNGKey(1), (N, K, 8)) * 0.3
    sh = jax.random.normal(jax.random.PRNGKey(2), (N, K, f_ir.dim))
    src = jax.random.randint(jax.random.PRNGKey(3), (N, K), 0, N)
    mlp_ws = scalar_mlp_init(jax.random.PRNGKey(4), mlp)["w"]

    ref = _xla_dense_reference(conv, mlp, x, emb, sh, src, mlp_ws)
    got = dense_conv_pallas(conv, mlp, x, emb, sh, src, mlp_ws,
                            a_block=4, interpret=True)
    assert got.shape == ref.shape
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    assert err < 1e-4, err
