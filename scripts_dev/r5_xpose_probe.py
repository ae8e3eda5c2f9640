"""Round-5 probe: what do the in-kernel (T, dim_x) transposes cost at
bench shapes, vs the full vec fwd/bwd kernels?

The fused kernels compute feature-major ((dim_x, T) tiles, lane folds)
but all HBM arrays are row-major, so each kernel transposes its inputs
and outputs in VMEM. If the transposes are a large fraction of kernel
time, a row-major kernel rewrite (sublane folds instead of lane folds)
is the next 10k lever; if not, skip it.

Usage: python scripts_dev/r5_xpose_probe.py [n_atoms]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sevennet_tpu.irreps import Irreps, infer_irreps_out
from sevennet_tpu.ops.fused_conv import (
    EdgeEmbedSpec,
    _get_kernels,
    fused_conv_block_atoms,
    fused_conv_bwd_block_atoms,
)
from sevennet_tpu.ops.mlp import ScalarMLPSpec, scalar_mlp_init
from sevennet_tpu.ops.tensor_product import ConvTPSpec

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2560
K = 64
REPS = 8

x_ir = Irreps("128x0e+64x1e+32x2e")
f_ir = Irreps.spherical_harmonics(2, 1)
tgt = infer_irreps_out(x_ir, f_ir, 2, "full")
conv = ConvTPSpec(x_ir, f_ir, tgt)
mlp = ScalarMLPSpec((8, 64, 64, conv.weight_numel))
embed = EdgeEmbedSpec(n_basis=8, cutoff=5.0, cutoff_kind="XPLOR",
                      cutoff_arg=4.5, lmax=2)
A = fused_conv_block_atoms(K)
A_b = fused_conv_bwd_block_atoms(A, K)
dim_x, dim_mid = conv.irreps_x.dim, None
fwd, bwd, A_b = _get_kernels(conv, mlp, A, K, False, embed=embed)

NK = N * K
ks = jax.random.split(jax.random.PRNGKey(0), 4)
xg = jax.jit(lambda k: jax.random.normal(k, (NK, dim_x)) * 0.3)(ks[0])
vec = jax.jit(lambda k: jax.random.normal(k, (3, NK)))(ks[1])
coef = jax.jit(lambda k: jax.random.normal(k, (8, 1)))(ks[2])
mlp_ws = tuple(jnp.asarray(w) for w in scalar_mlp_init(
    jax.random.PRNGKey(0), mlp)["w"])
out0 = jax.jit(lambda *a: fwd(*a[:3], a[3:]))(xg, vec, coef, *mlp_ws)
dim_mid = out0.shape[1]
ybar = jax.jit(lambda k: jax.random.normal(k, (N, dim_mid)))(ks[3])
print("# data ready", flush=True)


def timed(label, fn, *args):
    # args passed through jit (closing over big arrays trips the axon
    # remote-compile HTTP 413 limit)
    def body(c, _):
        r = fn(*args_inner)
        leaf = jax.tree_util.tree_leaves(r)[0]
        return c, jax.lax.optimization_barrier(leaf.ravel()[0])

    def outer(*a):
        global args_inner
        args_inner = a
        return jax.lax.scan(body, 0, None, length=REPS)[1].sum()

    f = jax.jit(outer)
    float(f(*args))
    t0 = time.perf_counter()
    float(f(*args))
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{label:28s} {dt:8.2f} ms", flush=True)
    return dt


# bare transpose kernel at the backward's block size
T_b = A_b * K


def xpose_kernel(in_ref, out_ref):
    out_ref[:] = in_ref[:].T


def xpose(arr):
    NB = arr.shape[0] // T_b
    return pl.pallas_call(
        xpose_kernel,
        grid=(NB,),
        in_specs=[pl.BlockSpec((T_b, dim_x), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((dim_x, T_b), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((dim_x, NK), jnp.float32),
    )(arr)


def xpose2(arr):
    """transpose in + transpose out (round trip, the bwd kernel's dxg)"""
    NB = arr.shape[0] // T_b

    def k2(in_ref, out_ref):
        out_ref[:] = in_ref[:].T.T

    return pl.pallas_call(
        k2,
        grid=(NB,),
        in_specs=[pl.BlockSpec((T_b, dim_x), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T_b, dim_x), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NK, dim_x), jnp.float32),
    )(arr)


print(f"# N={N} K={K} A={A} A_b={A_b} dim_x={dim_x} dim_mid={dim_mid} "
      f"device={jax.devices()[0]}")
t_f = timed("fwd kernel", lambda a, b, c, *w: fwd(a, b, c, w), xg, vec, coef, *mlp_ws)
t_b = timed("bwd kernel", lambda a, b, c, y, *w: bwd(a, b, c, y, w), xg, vec, coef, ybar, *mlp_ws)
t_x = timed("bare (T,480) transpose", xpose, xg)
t_x2 = timed("transpose round trip", xpose2, xg)
print(f"# one transpose pass = {t_x:.2f} ms -> fwd has ~1 in-transpose "
      f"({t_x / t_f * 100:.0f}% of fwd), bwd ~1 in + 1 out "
      f"({(t_x2) / t_b * 100:.0f}% of bwd)")
