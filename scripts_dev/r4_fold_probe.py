"""K-fold strategy probe for the fused conv forward kernel at 10k shapes.

Variants:
  prod     production fold (aligned halving + peel + roll tail)
  sliceadd unaligned static slice-adds all the way (no roll, one small pad)
  group4   TP terms accumulated per 4-neighbor group (128 lanes) into a
           (rows, 128) accumulator; tail fold 128->A only
  group8   same with 8-neighbor groups (256 lanes)

Usage: python scripts_dev/r4_fold_probe.py [variant ...]
"""
import sys, time, os, math
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sevennet_tpu.irreps import Irreps, infer_irreps_out
from sevennet_tpu.ops.tensor_product import ConvTPSpec
from sevennet_tpu.ops.mlp import ScalarMLPSpec, scalar_mlp_init
from sevennet_tpu.ops.fused_conv import _instr_tables, _DOT, make_fused_conv_fwd
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


def _fold_sliceadd(acc, kcur, a):
    """(mul, kcur*a) -> (mul, a): halve with static (possibly unaligned)
    slice-adds; odd tail chunk padded onto the head once."""
    while kcur > 1:
        if kcur % 2 == 0:
            half = (kcur // 2) * a
            acc = acc[:, :half] + acc[:, half : 2 * half]
            kcur //= 2
        else:
            head = acc[:, : (kcur - 1) * a]
            tail = acc[:, (kcur - 1) * a :]
            acc = head + jnp.pad(tail, ((0, 0), (0, (kcur - 2) * a)))
            kcur -= 1
    return acc


def make(variant):
    if variant == "prod":
        return make_fused_conv_fwd(conv, mlp, A, K)

    def kernel(xg_ref, emb_ref, sh_ref, *rest):
        mlp_refs = rest[:n_mlp]
        w3j_ref = rest[n_mlp]
        out_ref = rest[n_mlp + 1]
        scr = rest[n_mlp + 2]
        xgT = xg_ref[:].T
        embT = emb_ref[:].T
        shT = sh_ref[:].T
        h = embT
        for li, wref in enumerate(mlp_refs):
            h = jnp.dot(wref[:].T, h, **_DOT) * inv_sqrt[li]
            if li < n_mlp - 1:
                h = jax.nn.silu(h) * cst
        tmp = jnp.dot(w3j_ref[:], shT, **_DOT)

        if variant == "sliceadd":
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
                        scr[start : start + mul, :] = _fold_sliceadd(
                            by_p[p], K, A
                        )
                    else:
                        scr[start : start + mul, :] = jnp.zeros(
                            (mul, A), jnp.float32
                        )
        else:
            kg = 4 if variant == "group4" else 8
            ngroups = K // kg
            gw = kg * A
            for ins in instr:
                d1, d3, mul = ins["d1"], ins["d3"], ins["mul"]
                x0, w0 = ins["x_start"], ins["w_start"]
                g0, u_off, u_tot = ins["g_start"], ins["u_off"], ins["u_tot"]
                by_p = {}
                for g in range(ngroups):
                    lo = g * gw
                    wb = h[w0 : w0 + mul, lo : lo + gw]
                    xw = [
                        xgT[x0 + m * mul : x0 + (m + 1) * mul, lo : lo + gw]
                        * wb
                        for m in range(d1)
                    ]
                    for m, p, r in ins["mp"]:
                        term = xw[m] * tmp[r : r + 1, lo : lo + gw]
                        by_p[p] = term if p not in by_p else by_p[p] + term
                for p in range(d3):
                    start = g0 + p * u_tot + u_off
                    if p in by_p:
                        scr[start : start + mul, :] = _fold_sliceadd(
                            by_p[p], kg, A
                        )
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


def check(variant):
    """numerical equivalence vs production"""
    ref = make("prod")(xg, emb, sh, mlp_ws)
    f = make(variant)
    got = f(xg, emb, sh, *mlp_ws, jnp.asarray(w3j_pack_np))
    d = float(jnp.abs(ref - got).max())
    print(f"{variant} maxdiff vs prod: {d:.2e}", flush=True)


if __name__ == "__main__":
    variants = sys.argv[1:] or ["prod", "sliceadd", "group4", "group8"]
    prod_fn = None
    for v in variants:
        f = make(v)
        if v == "prod":
            args = (xg, emb, sh, mlp_ws)
            def pf(xg_, *rest):  # adapt signature for timed()
                return f(xg_, rest[0], rest[1], tuple(rest[2:2 + n_mlp]))
            try:
                timed(v, pf, (xg, emb, sh, *mlp_ws), n1=3, n2=9)
            except Exception as e:
                print(f"{v} FAILED: {type(e).__name__}: {str(e)[:160]}",
                      flush=True)
            continue
        try:
            timed(v, f, (xg, emb, sh, *mlp_ws, jnp.asarray(w3j_pack_np)))
            check(v)
        except Exception as e:
            print(f"{v} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
