"""Time the PRODUCTION fused conv fwd/bwd kernels in isolation at 10k
mid-layer shapes (no gather, no scatter) — for iterating on in-kernel
changes like the fold chain.

Usage: python scripts_dev/r3_kernel_time.py [fwd|bwd|both]
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")
import jax, jax.numpy as jnp
import numpy as np

from sevennet_tpu.irreps import Irreps, infer_irreps_out
from sevennet_tpu.ops.tensor_product import ConvTPSpec
from sevennet_tpu.ops.mlp import ScalarMLPSpec, scalar_mlp_init
from sevennet_tpu.ops.fused_conv import (
    make_fused_conv_fwd, make_fused_conv_bwd2, fused_conv_block_atoms,
    fused_conv_bwd_block_atoms,
)

what = sys.argv[1] if len(sys.argv) > 1 else "both"
N, K = 10048, 72  # divisible by A=32 and A_b (16/32)
x_ir = Irreps("128x0e+64x1e+32x2e")
f_ir = Irreps.spherical_harmonics(2, 1)
tgt = infer_irreps_out(x_ir, f_ir, 2, "full")
conv = ConvTPSpec(x_ir, f_ir, tgt)
mlp = ScalarMLPSpec((8, 64, 64, conv.weight_numel))
A = fused_conv_block_atoms(K)
dim_mid = conv.irreps_mid.dim
NK = N * K
print(f"N={N} K={K} A={A} dim_mid={dim_mid}", flush=True)

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 6)
xg = jax.random.normal(ks[0], (NK, 480)) * 0.5
emb = jax.random.normal(ks[1], (NK, 8)) * 0.3
sh = jax.random.normal(ks[2], (NK, 9)) * 0.5
ybar = jax.random.normal(ks[3], (N, dim_mid)) * 0.1
mlp_p = scalar_mlp_init(ks[4], mlp)
ws = tuple(jnp.asarray(w) for w in mlp_p["w"])


def timeit(f, *args, reps=20):
    """Tunnel-safe: run reps inside a scan with a data dependence, fetch a
    scalar (block_until_ready does NOT block through the axon tunnel)."""
    @jax.jit
    def many(*a):
        def body(c, _):
            out = f(a[0] + c, *a[1:])
            if isinstance(out, tuple):
                out = out[0]
            return jnp.sum(out[:1, :1]) * 1e-20, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return c
    float(many(*args))  # compile+warm
    t0 = time.perf_counter()
    r = float(many(*args))
    return (time.perf_counter() - t0) / reps * 1e3


if what in ("fwd", "both"):
    fwd = make_fused_conv_fwd(conv, mlp, A, K)
    t = timeit(jax.jit(lambda *a: fwd(*a[:3], tuple(a[3:]))), xg, emb, sh, *ws)
    print(f"fwd  {t:7.2f} ms/layer  ({t/N*1e5:.2f} us/100atoms)", flush=True)

if what in ("bwd", "both"):
    A_b = fused_conv_bwd_block_atoms(A, K)
    bwd = make_fused_conv_bwd2(conv, mlp, A_b, K, param_grads=False)
    # bwd consumes k-major blocks at A_b; shapes only matter for timing
    t = timeit(
        jax.jit(lambda *a: bwd(*a[:4], tuple(a[4:]))), xg, emb, sh, ybar, *ws
    )
    print(f"bwd2 {t:7.2f} ms/layer", flush=True)
