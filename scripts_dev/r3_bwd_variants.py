"""Round-3 backward-kernel variants: correctness (CPU interpret) + timing
(TPU, in-scan amortized). Layer-1 SevenNet-0 shapes.

Usage:
  JAX_PLATFORMS=cpu python scripts_dev/r3_bwd_variants.py check
  python scripts_dev/r3_bwd_variants.py time [A ...]   # on TPU
  python scripts_dev/r3_bwd_variants.py glue           # mirror-gather cost
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
    make_fused_conv_bwd, make_fused_conv_bwd2, make_fused_conv_fwd,
    to_k_major, _instr_tables,
)

which_arg = sys.argv[1] if len(sys.argv) > 1 else "check"
N, K = (256, 16) if which_arg == "check" else (3072, 88)
x_ir = Irreps("128x0e+64x1e+32x2e")
f_ir = Irreps.spherical_harmonics(2, 1)
tgt = infer_irreps_out(x_ir, f_ir, 2, "full")
conv = ConvTPSpec(x_ir, f_ir, tgt)
mlp = ScalarMLPSpec((8, 64, 64, conv.weight_numel))
instr, w3j_pack_np, dim_mid, numel = _instr_tables(conv)
dim_x, dim_f = x_ir.dim, f_ir.dim
print(f"N={N} K={K} dim_x={dim_x} dim_mid={dim_mid} numel={numel} "
      f"R={w3j_pack_np.shape[0]}", flush=True)

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 6)
x = jax.random.normal(ks[0], (N, dim_x)) * 0.5
src = jax.random.randint(ks[1], (N, K), 0, N)
sh = jax.random.normal(ks[2], (N, K, dim_f)) * 0.5
emb = jax.random.normal(ks[3], (N, K, 8)) * 0.3
ybar = jax.random.normal(ks[5], (N, dim_mid)) * 0.2
mlp_p = scalar_mlp_init(ks[4], mlp)
mlp_ws = tuple(jnp.asarray(w) for w in mlp_p["w"])


def inputs_for(A):
    return (x[to_k_major(src, A)], to_k_major(emb, A).reshape(-1, 8),
            to_k_major(sh, A).reshape(-1, dim_f), ybar)


def check():
    A = 8
    xg, e2, s2, yb = inputs_for(A)
    for pg in (False, True):
        b0 = make_fused_conv_bwd(conv, mlp, A, K, param_grads=pg, interpret=True)
        b2 = make_fused_conv_bwd2(conv, mlp, A, K, param_grads=pg, interpret=True)
        o0 = b0(xg, e2, s2, yb, mlp_ws)
        o2 = b2(xg, e2, s2, yb, mlp_ws)
        flat0 = jax.tree_util.tree_leaves(o0)
        flat2 = jax.tree_util.tree_leaves(o2)
        for i, (a, b) in enumerate(zip(flat0, flat2)):
            err = float(jnp.max(jnp.abs(a - b)))
            scale = float(jnp.max(jnp.abs(a))) + 1e-30
            print(f"pg={pg} out[{i}] maxdiff {err:.2e} (scale {scale:.2e})",
                  flush=True)
            assert err <= 1e-4 * scale + 1e-6, (i, err, scale)
    print("bwd2 == bwd OK", flush=True)


def timed(name, fn, args, n1=10, n2=60):
    def loop(n):
        def run(*a):
            def body(acc, _):
                o = fn(a[0] + 1e-30 * acc, *a[1:])
                first = jax.tree_util.tree_leaves(o)[0]
                return acc + first[0, 0] * 1e-30, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return acc
        return run
    f1 = jax.jit(loop(n1)); f2 = jax.jit(loop(n2))
    t0 = time.time(); float(f1(*args)); c = time.time() - t0
    float(f2(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.time(); float(f1(*args)); a = time.time() - t0
        t0 = time.time(); float(f2(*args)); b = time.time() - t0
        best = min(best, (b - a) / (n2 - n1))
    print(f"{name:28s} {best*1e3:7.2f} ms/layer (compile {c:.0f}s)", flush=True)


def time_variants(A_list):
    for A in A_list:
        xg, e2, s2, yb = inputs_for(A)
        args = (xg, e2, s2, yb, mlp_ws)
        try:
            timed(f"bwd  A={A} (round-2)",
                  lambda *a, A=A: make_fused_conv_bwd(conv, mlp, A, K, param_grads=False)(*a),
                  args)
        except Exception as e:
            print(f"bwd A={A} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        try:
            timed(f"bwd2 A={A}",
                  lambda *a, A=A: make_fused_conv_bwd2(conv, mlp, A, K, param_grads=False)(*a),
                  args)
        except Exception as e:
            print(f"bwd2 A={A} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
    # forward for reference
    for A in A_list:
        xg, e2, s2, yb = inputs_for(A)
        try:
            timed(f"fwd  A={A}",
                  lambda xg, e2, s2, A=A: make_fused_conv_fwd(conv, mlp, A, K)(xg, e2, s2, mlp_ws),
                  (xg, e2, s2))
        except Exception as e:
            print(f"fwd A={A} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


def glue():
    """mirror-gather + K-sum cost on (N*K, dim_x)."""
    from sevennet_tpu.ops.fused_conv import mirror_map_numpy
    dxg = jax.random.normal(key, (N * K, dim_x))
    mir = jnp.asarray(np.random.randint(0, N * K, (N, K)), jnp.int32)

    def red(dxg, mir):
        return jnp.sum(dxg[mir.reshape(-1)].reshape(N, K, -1), axis=1)
    timed("mirror gather+Ksum", red, (dxg, mir))

    def scat(dxg, srcf):
        return jnp.zeros((N, dim_x)).at[srcf].add(dxg)
    timed("scatter-add", scat, (dxg, src.reshape(-1)))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "check"
    if which == "check":
        check()
    elif which == "time":
        A_list = [int(a) for a in sys.argv[2:]] or [8, 16]
        time_variants(A_list)
    elif which == "glue":
        glue()
