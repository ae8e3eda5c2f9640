"""Ablation micro-benchmarks for the conv hot path on TPU."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

E = int(sys.argv[1]) if len(sys.argv) > 1 else 160_000
N = int(sys.argv[2]) if len(sys.argv) > 2 else 3072

from sevennet_tpu.irreps import Irreps, infer_irreps_out
from sevennet_tpu.ops.tensor_product import ConvTPSpec, conv_tp_apply
from sevennet_tpu.ops.mlp import ScalarMLPSpec, scalar_mlp_apply, scalar_mlp_init
from sevennet_tpu.so3.spherical import spherical_harmonics

x_ir = Irreps("128x0e+64x1e+32x2e")
f_ir = Irreps.spherical_harmonics(2, 1)
tgt = infer_irreps_out(x_ir, f_ir, 2, "full")
conv = ConvTPSpec(x_ir, f_ir, tgt)
mlp = ScalarMLPSpec((8, 64, 64, conv.weight_numel))

key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (N, x_ir.dim))
src = jax.random.randint(key, (E,), 0, N)
dst = jnp.sort(jax.random.randint(key, (E,), 0, N))
emb = jax.random.normal(key, (E, 8))
ev = jax.random.normal(key, (E, 3))
mlp_params = scalar_mlp_init(key, mlp)

def _fetch(out):
    # force a real device->host value fetch (block_until_ready does not
    # actually block through the axon tunnel)
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])

def timeit(name, fn, *args, reps=10):
    t0 = time.time()
    _fetch(fn(*args))
    c = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = _fetch(fn(*args))
    print(f"{name}: compile {c:.1f}s run {(time.time()-t0)/reps*1e3:.2f} ms", flush=True)

print(f"E={E} N={N} dim_x={x_ir.dim} dim_mid={conv.irreps_mid.dim} wnumel={conv.weight_numel}", flush=True)

# 1. gather
timeit("gather x[src]", jax.jit(lambda x, s: x[s]), x, src)
# 2. radial MLP
timeit("radial MLP", jax.jit(lambda p, e: scalar_mlp_apply(mlp, p, e)), mlp_params, emb)
# 3. spherical harmonics
timeit("SH l<=2", jax.jit(lambda v: spherical_harmonics(2, v)), ev)
# 4. TP alone (precomputed inputs)
sh = spherical_harmonics(2, ev)
w = scalar_mlp_apply(mlp, mlp_params, emb)
xg = x[src]
timeit("uvu TP", jax.jit(lambda a, b, c: conv_tp_apply(conv, a, b, c)), xg, sh, w)
# 5. segment_sum sorted vs not
msg = jax.random.normal(key, (E, conv.irreps_mid.dim))
timeit("segsum sorted", jax.jit(lambda m, d: jax.ops.segment_sum(m, d, N, indices_are_sorted=True)), msg, dst)
timeit("segsum unsorted", jax.jit(lambda m, d: jax.ops.segment_sum(m, d, N)), msg, src)
# 6. full conv block fused
def full(x, emb, ev, src, dst, p):
    sh = spherical_harmonics(2, ev)
    w = scalar_mlp_apply(mlp, p, emb)
    msg = conv_tp_apply(conv, x[src], sh, w)
    return jax.ops.segment_sum(msg, dst, N, indices_are_sorted=True)
timeit("full conv block", jax.jit(full), x, emb, ev, src, dst, mlp_params)
# 7. big matmul reference point
a = jax.random.normal(key, (8192, 2048)); b = jax.random.normal(key, (2048, 2048))
timeit("ref matmul 8192x2048x2048", jax.jit(lambda a, b: a @ b), a, b)
