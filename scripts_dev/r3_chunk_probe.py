"""Chunked fused-conv timing at 100k mid-layer shapes, sweeping the row
chunk RC: isolates the per-chunk overheads (gather, kernel, scatter-add)
from the full-engine step so chunk-size tuning doesn't need a 5-minute
engine compile per point.

Usage: python scripts_dev/r3_chunk_probe.py [RC_atoms ...]   # on TPU
       default sweep: 2048 4096 8192 16384

Prints fwd and fwd+bwd ms/layer per RC, plus an isolated scatter-add
timing at the same shapes.
"""
import sys, time, os, math
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")

import jax, jax.numpy as jnp
import numpy as np

from sevennet_tpu.irreps import Irreps, infer_irreps_out
from sevennet_tpu.ops.tensor_product import ConvTPSpec
from sevennet_tpu.ops.mlp import ScalarMLPSpec, scalar_mlp_init
from sevennet_tpu.ops.fused_conv import (
    _fused_conv_chunked, fused_conv_block_atoms, to_k_major,
)

RCS = [int(a) for a in sys.argv[1:]] or [2048, 4096, 8192, 16384]
N, K = 100096, 72
x_ir = Irreps("128x0e+64x1e+32x2e")
f_ir = Irreps.spherical_harmonics(2, 1)
tgt = infer_irreps_out(x_ir, f_ir, 2, "full")
conv = ConvTPSpec(x_ir, f_ir, tgt)
mlp = ScalarMLPSpec((8, 64, 64, conv.weight_numel))
A = fused_conv_block_atoms(K)
dim_mid = conv.irreps_mid.dim
print(f"N={N} K={K} A={A} dim_mid={dim_mid}", flush=True)

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 6)
x = jax.random.normal(ks[0], (N, 480)) * 0.5
emb = jax.random.normal(ks[1], (N, K, 8)) * 0.3
sh = jax.random.normal(ks[2], (N, K, 9)) * 0.5
# realistic src: neighbors within a +-4000-row window (cell-sorted order)
rng = np.random.default_rng(0)
src_np = (
    np.arange(N)[:, None] + rng.integers(-4000, 4000, size=(N, K))
) % N
src = jnp.asarray(src_np, jnp.int32)
ybar = jax.random.normal(ks[3], (N, dim_mid)) * 0.1
mlp_p = scalar_mlp_init(ks[4], mlp)
ws = tuple(jnp.asarray(w) for w in mlp_p["w"])


def timeit(f, *args, reps=3):
    o = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / reps * 1e3


for rc in RCS:
    rc_pad = (rc // A) * A
    if N % rc_pad:
        # probe needs RC | N; round N's divisor search
        cand = [d for d in range(rc_pad, rc_pad + 20 * A, A) if N % d == 0]
        if not cand:
            print(f"RC={rc}: no divisor near, skip")
            continue
        rc_pad = cand[0]

    def fwd_only(x, emb, sh, src):
        return _fused_conv_chunked(conv, mlp, A, False, rc_pad, ws, x,
                                   emb, sh, src)

    def fwd_bwd(x, emb, sh, src, yb):
        _, vjp = jax.vjp(lambda x_, e_, s_: fwd_only(x_, e_, s_, src),
                         x, emb, sh)
        return vjp(yb)[0]

    try:
        tf = timeit(jax.jit(fwd_only), x, emb, sh, src)
        tb = timeit(jax.jit(fwd_bwd), x, emb, sh, src, ybar)
        print(f"RC={rc_pad:6d} (nb={N//rc_pad:3d})  fwd {tf:7.1f} ms  "
              f"fwd+bwd {tb:7.1f} ms", flush=True)
    except Exception as e:
        print(f"RC={rc_pad}: FAILED {type(e).__name__}: {e}", flush=True)


# isolated scatter-add cost at one chunk's shapes (per layer = nb scatters)
rc0 = 2304
src_km = to_k_major(src[:rc0], A)
dxg = jax.random.normal(ks[5], (rc0 * K, 480))


def scat(dx, dxg):
    return dx.at[src_km].add(dxg)


dx0 = jnp.zeros((N, 480))
t = timeit(jax.jit(scat), dx0, dxg)
nb = N // rc0
print(f"isolated scatter: {t:.1f} ms/chunk x nb={nb} -> {t * nb:.0f} "
      f"ms/layer-equivalent", flush=True)
