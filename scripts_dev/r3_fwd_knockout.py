"""Forward-kernel internal knockout at engine shapes (K=72, A=32): which
phase dominates — input transposes, radial MLP, TP elementwise, k-folds,
or the output transpose? Each variant removes one phase (results are
wrong; only timing matters).

Usage: python scripts_dev/r3_fwd_knockout.py [variant ...]
  variants: full nomlp notp nofold noxpose nothing
"""
import sys, time, os, math
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sevennet_tpu.irreps import Irreps, infer_irreps_out
from sevennet_tpu.ops.tensor_product import ConvTPSpec
from sevennet_tpu.ops.mlp import ScalarMLPSpec, scalar_mlp_init
from sevennet_tpu.ops.fused_conv import _instr_tables, _DOT
from sevennet_tpu.ops.activations import NORMALIZE2MOM_CST

N, K, A = 10016, 72, 32
T = A * K
x_ir = Irreps("128x0e+64x1e+32x2e")
f_ir = Irreps.spherical_harmonics(2, 1)
tgt = infer_irreps_out(x_ir, f_ir, 2, "full")
conv = ConvTPSpec(x_ir, f_ir, tgt)
mlp = ScalarMLPSpec((8, 64, 64, conv.weight_numel))
instr, w3j_pack_np, dim_mid, numel = _instr_tables(conv)
dim_x, dim_f, n_basis = x_ir.dim, f_ir.dim, 8
R = w3j_pack_np.shape[0]
cst = NORMALIZE2MOM_CST["silu"]
n_mlp = len(mlp.dims) - 1
inv_sqrt = [1.0 / math.sqrt(d) for d in mlp.dims[:-1]]
NK = N * K
NB = NK // T
print(f"N={N} K={K} A={A} T={T} NB={NB} dim_mid={dim_mid}", flush=True)

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 5)
xg = jax.random.normal(ks[0], (NK, dim_x)) * 0.5
emb = jax.random.normal(ks[1], (NK, n_basis)) * 0.3
sh = jax.random.normal(ks[2], (NK, dim_f)) * 0.5
mlp_p = scalar_mlp_init(ks[3], mlp)
mlp_ws = tuple(jnp.asarray(w) for w in mlp_p["w"])


def make(variant):
    do_mlp = variant not in ("nomlp", "nothing")
    do_tp = variant not in ("notp", "nothing")
    do_fold = variant not in ("nofold",)

    def _kfold(acc):
        kcur = K
        while kcur > 1:
            w = kcur * A
            if kcur % 2 == 0:
                half = (kcur // 2) * A
                acc = acc[:, :half] + pltpu.roll(acc, w - half, 1)[:, :half]
                kcur //= 2
            else:
                head = acc[:, : (kcur - 1) * A]
                tail = pltpu.roll(acc, A, 1)[:, :A]
                acc = head + jnp.pad(tail, ((0, 0), (0, (kcur - 2) * A)))
                kcur -= 1
        return acc

    def kernel(xg_ref, emb_ref, sh_ref, *rest):
        mlp_refs = rest[:n_mlp]
        w3j_ref = rest[n_mlp]
        out_ref = rest[n_mlp + 1]
        scr = rest[n_mlp + 2]
        xgT = xg_ref[:].T
        embT = emb_ref[:].T
        shT = sh_ref[:].T
        if do_mlp:
            h = embT
            for li, wref in enumerate(mlp_refs):
                h = jnp.dot(wref[:].T, h, **_DOT) * inv_sqrt[li]
                if li < n_mlp - 1:
                    h = jax.nn.silu(h) * cst
        else:
            h = jnp.broadcast_to(embT[:1, :] * 0.1, (numel, T))
        tmp = jnp.dot(w3j_ref[:], shT, **_DOT)
        if not do_tp:
            scr[:, :] = jnp.broadcast_to(
                (h[:1, :1] + tmp[:1, :1]), (dim_mid, A)
            )
        else:
            for ins in instr:
                d1, d3, mul = ins["d1"], ins["d3"], ins["mul"]
                x0, w0 = ins["x_start"], ins["w_start"]
                wb = h[w0 : w0 + mul, :]
                xw = [
                    xgT[x0 + m * mul : x0 + (m + 1) * mul, :] * wb
                    for m in range(d1)
                ]
                by_p = {}
                for m, p, r in ins["mp"]:
                    term = xw[m] * tmp[r : r + 1, :]
                    by_p[p] = term if p not in by_p else by_p[p] + term
                g0, u_off, u_tot = ins["g_start"], ins["u_off"], ins["u_tot"]
                for p in range(d3):
                    start = g0 + p * u_tot + u_off
                    if p in by_p:
                        if do_fold:
                            scr[start : start + mul, :] = _kfold(by_p[p])
                        else:
                            scr[start : start + mul, :] = by_p[p][:, :A]
                    else:
                        scr[start : start + mul, :] = jnp.zeros(
                            (mul, A), jnp.float32
                        )
        out_ref[:] = scr[:].T

    in_specs = [
        pl.BlockSpec((T, dim_x), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, n_basis), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((T, dim_f), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in mlp_ws
    ] + [
        pl.BlockSpec((R, dim_f), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((A, dim_mid), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB * A, dim_mid), jnp.float32),
        scratch_shapes=[pltpu.VMEM((dim_mid, A), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
    )


def timed(name, f, args, n1=3, n2=9):
    def loop(n):
        def run(xg, *rest):
            def body(carry, _):
                xg2 = jax.lax.dynamic_update_slice(
                    xg, carry.reshape(1, 1), (0, 0)
                )
                o = f(xg2, *rest)
                return o[0, 0] * 1e-30, None
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
    print(f"{name:12s} {best*1e3:7.2f} ms/layer (compile {c:.0f}s)", flush=True)


args = (xg, emb, sh, *mlp_ws, jnp.asarray(w3j_pack_np))
for v in (sys.argv[1:] or ["full", "nomlp", "notp", "nofold", "nothing"]):
    try:
        timed(v, make(v), args)
    except Exception as e:
        print(f"{v} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
