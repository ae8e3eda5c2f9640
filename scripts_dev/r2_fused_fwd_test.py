"""Validate + time the feature-major fused conv forward kernel.

Usage: python r2_fused_fwd_test.py [interp|hw]
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")
mode = sys.argv[1] if len(sys.argv) > 1 else "interp"
if mode == "interp":
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
if mode == "interp":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from sevennet_tpu.irreps import Irreps, infer_irreps_out
from sevennet_tpu.ops.tensor_product import ConvTPSpec
from sevennet_tpu.ops.mlp import ScalarMLPSpec, scalar_mlp_init, scalar_mlp_apply
from sevennet_tpu.ops.dense_conv import _tp_forward_block
from sevennet_tpu.ops.fused_conv import make_fused_conv_fwd, to_k_major

f_ir = Irreps.spherical_harmonics(2, 1)


def build(x_str):
    x_ir = Irreps(x_str)
    tgt = infer_irreps_out(x_ir, f_ir, 2, "full")
    conv = ConvTPSpec(x_ir, f_ir, tgt)
    mlp = ScalarMLPSpec((8, 64, 64, conv.weight_numel))
    return conv, mlp


def ref_conv(conv, mlp, mlp_p, x, emb, sh, src):
    """XLA reference via dense_conv's forward block."""
    N, K = src.shape
    w = scalar_mlp_apply(mlp, mlp_p, emb)
    xg = x[src]
    return _tp_forward_block(conv, xg, sh, w)


def check(x_str, N, K, A, interpret):
    conv, mlp = build(x_str)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (N, conv.irreps_x.dim)) * 0.5
    src = jax.random.randint(ks[1], (N, K), 0, N)
    sh = jax.random.normal(ks[2], (N, K, f_ir.dim)) * 0.5
    emb = jax.random.normal(ks[3], (N, K, 8)) * 0.3
    mlp_p = scalar_mlp_init(ks[4], mlp)
    ws_t = tuple(jnp.asarray(w) for w in mlp_p["w"])

    fused = make_fused_conv_fwd(conv, mlp, A, K, interpret=interpret)
    src_km = to_k_major(src, A)
    xg = x[src_km]
    out = fused(xg, to_k_major(emb, A), to_k_major(sh, A), ws_t)
    ref = ref_conv(conv, mlp, mlp_p, x, emb, sh, src)
    err = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref)))
    print(f"{x_str:24s} N={N} K={K} A={A}: max err {err:.2e} (scale {scale:.2f})",
          flush=True)
    return err


def time_hw(x_str, N, K, A):
    conv, mlp = build(x_str)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (N, conv.irreps_x.dim)) * 0.5
    src = jax.random.randint(ks[1], (N, K), 0, N)
    sh = jax.random.normal(ks[2], (N, K, f_ir.dim)) * 0.5
    emb = jax.random.normal(ks[3], (N, K, 8)) * 0.3
    mlp_p = scalar_mlp_init(ks[4], mlp)
    ws_t = tuple(jnp.asarray(w) for w in mlp_p["w"])
    fused = make_fused_conv_fwd(conv, mlp, A, K)

    def run_kernel_only(x, emb, sh, src, n):
        xg = x[to_k_major(src, A)]
        e2 = to_k_major(emb, A); s2 = to_k_major(sh, A)
        def body(acc, _):
            o = fused(xg + 1e-30 * acc, e2, s2, ws_t)
            return acc + o[0, 0] * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return acc

    def run_full(x, emb, sh, src, n):
        e2 = to_k_major(emb, A); s2 = to_k_major(sh, A)
        src_km = to_k_major(src, A)
        def body(acc, _):
            xg = (x + 1e-30 * acc)[src_km]
            o = fused(xg, e2, s2, ws_t)
            return acc + o[0, 0] * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return acc

    for name, run in [("kernel-only", run_kernel_only), ("gather+kernel", run_full)]:
        n1, n2 = 20, 120
        f1 = jax.jit(lambda x, e, s, sr: run(x, e, s, sr, n1))
        f2 = jax.jit(lambda x, e, s, sr: run(x, e, s, sr, n2))
        t0 = time.time(); float(f1(x, emb, sh, src)); c = time.time() - t0
        float(f2(x, emb, sh, src))
        best = 1e9
        for _ in range(3):
            t0 = time.time(); float(f1(x, emb, sh, src)); t1 = time.time() - t0
            t0 = time.time(); float(f2(x, emb, sh, src)); t2 = time.time() - t0
            best = min(best, (t2 - t1) / (n2 - n1))
        print(f"{x_str:24s} {name:14s} N={N} K={K} A={A}: "
              f"{best*1e3:7.2f} ms/layer (compile {c:.0f}s)", flush=True)


if mode == "interp":
    check("128x0e", 64, 32, 8, True)
    check("128x0e+64x1e+32x2e", 64, 32, 8, True)
    check("128x0e+64x1e+32x2e", 64, 16, 16, True)
else:
    check("128x0e+64x1e+32x2e", 3072, 96, 16, False)
    time_hw("128x0e+64x1e+32x2e", 3072, 96, 16)
