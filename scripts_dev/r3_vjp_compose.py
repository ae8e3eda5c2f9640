"""Time the FULL conv op (custom_vjp fwd + cotangent pullback incl. mirror
gather) for both backward kernels — reproduces the production composition
that made bwd2 3x slower end-to-end despite a faster isolated kernel.

Usage: python scripts_dev/r3_vjp_compose.py [target_t]
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")

import jax, jax.numpy as jnp
import numpy as np

from sevennet_tpu.irreps import Irreps, infer_irreps_out
from sevennet_tpu.ops.tensor_product import ConvTPSpec
from sevennet_tpu.ops.mlp import ScalarMLPSpec, scalar_mlp_init

N, K = 3000, 72
LAYER = os.environ.get("VJP_LAYER", "1")
f_ir = Irreps.spherical_harmonics(2, 1)
if LAYER == "0":
    x_ir = Irreps("128x0e")
    tgt = infer_irreps_out(x_ir, f_ir, 2, "full")
elif LAYER == "4":
    x_ir = Irreps("128x0e+64x1e+32x2e")
    tgt = infer_irreps_out(x_ir, f_ir, 0, "full")
else:
    x_ir = Irreps("128x0e+64x1e+32x2e")
    tgt = infer_irreps_out(x_ir, f_ir, 2, "full")
conv = ConvTPSpec(x_ir, f_ir, tgt)
mlp = ScalarMLPSpec((8, 64, 64, conv.weight_numel))
dim_x, dim_f = x_ir.dim, f_ir.dim

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 6)
x = jax.random.normal(ks[0], (N, dim_x)) * 0.5
src = jax.random.randint(ks[1], (N, K), 0, N)
sh = jax.random.normal(ks[2], (N, K, dim_f)) * 0.5
emb = jax.random.normal(ks[3], (N, K, 8)) * 0.3
mir = jnp.asarray(np.random.randint(0, N * K, (N, K)), jnp.int32)
mlp_p = scalar_mlp_init(ks[4], mlp)


def run_one(tag, target_t, bwd2, a_b=None):
    os.environ["SEVENNET_TPU_TARGET_T"] = str(target_t)
    os.environ["SEVENNET_TPU_BWD2"] = "1" if bwd2 else "0"
    if a_b:
        os.environ["SEVENNET_TPU_BWD_A"] = str(a_b)
    else:
        os.environ.pop("SEVENNET_TPU_BWD_A", None)
    import importlib
    import sevennet_tpu.ops.fused_conv as fc
    fc._KERNEL_CACHE.clear()

    A = fc.fused_conv_block_atoms(K)

    def f(x, emb, sh):
        return fc.fused_conv_apply(
            conv, mlp, mlp_p, x, emb, sh, src, mir,
            block_atoms=A, param_grads=False,
        )

    dim_mid = f(x, emb, sh).shape[1] if False else None

    def loss_like(x, emb, sh):
        out = f(x, emb, sh)
        return out

    def step(x, emb, sh, ct):
        out, pull = jax.vjp(loss_like, x, emb, sh)
        dx, demb, dsh = pull(ct)
        return (jnp.sum(out[0, :4]) + jnp.sum(dx[0, :4]) + jnp.sum(demb[0, 0])
                + jnp.sum(dsh[0, 0]))

    ct = jax.random.normal(ks[5], f(x, emb, sh).shape) * 0.1

    def loop(n):
        def run(x, emb, sh, ct):
            def body(acc, _):
                v = step(x + 1e-30 * acc, emb, sh, ct)
                return acc + v * 1e-30, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return acc
        return run

    f1 = jax.jit(loop(10)); f2 = jax.jit(loop(40))
    t0 = time.time(); float(f1(x, emb, sh, ct)); c = time.time() - t0
    float(f2(x, emb, sh, ct))
    best = 1e9
    for _ in range(3):
        t0 = time.time(); float(f1(x, emb, sh, ct)); a = time.time() - t0
        t0 = time.time(); float(f2(x, emb, sh, ct)); b = time.time() - t0
        best = min(best, (b - a) / 30)
    print(f"{tag:32s} A={A:3d} {best*1e3:7.2f} ms/convop (compile {c:.0f}s)",
          flush=True)


if __name__ == "__main__":
    import json
    cfgs = json.loads(os.environ.get(
        "VJP_CFGS", "[[1536,24,0],[1536,24,1]]"))
    for tt, ab, b2 in cfgs:
        try:
            run_one(f"vjp T{tt} A_b={ab} bwd2={b2}", tt, b2, ab)
        except Exception as e:
            print(f"T{tt} A_b={ab} bwd2={b2} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
