"""Breakdown of the fused conv kernel cost: partial kernels isolate the
radial MLP, the Wigner matmul, the TP FMAs, the K-reduce, and the stores.
Also checks matmul precision (HIGHEST) impact on accuracy + time.
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")

import jax, jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sevennet_tpu.irreps import Irreps, infer_irreps_out
from sevennet_tpu.ops.tensor_product import ConvTPSpec
from sevennet_tpu.ops.mlp import ScalarMLPSpec, scalar_mlp_init, scalar_mlp_apply
from sevennet_tpu.ops.fused_conv import _instr_tables
from sevennet_tpu.ops.activations import NORMALIZE2MOM_CST
import math

N, K, A = 3072, 96, int(sys.argv[1]) if len(sys.argv) > 1 else 16
x_ir = Irreps("128x0e+64x1e+32x2e")
f_ir = Irreps.spherical_harmonics(2, 1)
tgt = infer_irreps_out(x_ir, f_ir, 2, "full")
conv = ConvTPSpec(x_ir, f_ir, tgt)
mlp = ScalarMLPSpec((8, 64, 64, conv.weight_numel))
instr, w3j_pack_np, dim_mid, numel = _instr_tables(conv)
dim_x, dim_f, n_basis = x_ir.dim, f_ir.dim, 8
R = w3j_pack_np.shape[0]
T = A * K
cst = NORMALIZE2MOM_CST["silu"]
inv_sqrt = [1.0 / math.sqrt(d) for d in mlp.dims[:-1]]
n_mlp = 3
print(f"N={N} K={K} A={A} T={T} R={R} dim_mid={dim_mid}", flush=True)

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 5)
x = jax.random.normal(ks[0], (N, dim_x)) * 0.5
src = jax.random.randint(ks[1], (N, K), 0, N)
sh = jax.random.normal(ks[2], (N, K, dim_f)) * 0.5
emb = jax.random.normal(ks[3], (N, K, 8)) * 0.3
mlp_p = scalar_mlp_init(ks[4], mlp)
mlp_ws = tuple(jnp.asarray(w) for w in mlp_p["w"])
xg_full = x[src.reshape(-1)]
emb2, sh2 = emb.reshape(-1, 8), sh.reshape(-1, dim_f)

PREC = jax.lax.Precision.HIGHEST


ONES_BD = np.zeros((T, A), np.float32)
for t in range(T):
    ONES_BD[t, t % A] = 1.0  # k-major: lane t = k*A + a
ONES_BD_AMAJ = np.zeros((T, A), np.float32)
for t in range(T):
    ONES_BD_AMAJ[t, t // K] = 1.0  # a-major: t = a*K + k


def build(variant, precision=None):
    def kernel(xg_ref, emb_ref, sh_ref, ones_ref, *rest):
        mlp_refs = rest[:n_mlp]
        w3j_ref = rest[n_mlp]
        out_ref = rest[n_mlp + 1]
        kw = dict(preferred_element_type=jnp.float32)
        if precision is not None:
            kw["precision"] = precision

        h = emb_ref[:]
        for li, wref in enumerate(mlp_refs):
            h = jnp.dot(h, wref[:], **kw) * inv_sqrt[li]
            if li < n_mlp - 1:
                h = jax.nn.silu(h) * cst
        if variant == "mlp":
            out_ref[:] = jnp.pad(h[:A], ((0, 0), (0, dim_mid - h.shape[1])))
            return
        tmp = jnp.dot(sh_ref[:], w3j_ref[:].T, **kw)
        if variant == "tmp":
            out_ref[:] = jnp.pad(tmp[:A], ((0, 0), (0, dim_mid - R)))
            return
        def mmred(acc):
            return jax.lax.dot_general(
                ones_ref[:], acc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

        def kred(acc):
            rows = acc.shape[0]
            while rows > A:
                if (rows // A) % 2 == 0:
                    half = rows // 2
                    acc = acc[:half, :] + acc[half:, :]
                    rows = half
                else:
                    acc = jnp.concatenate(
                        [acc[:A, :] + acc[rows - A:, :], acc[A:rows - A, :]], 0)
                    rows -= A
            return acc

        xg = xg_ref[:]
        if variant == "tp":
            total = jnp.zeros((T, 128), jnp.float32)
        elif variant in ("tpred", "tpredk", "tpredmm", "tpredmm_amaj"):
            total = jnp.zeros((A, 128), jnp.float32)
        for ins in instr:
            d1, d3, mul = ins["d1"], ins["d3"], ins["mul"]
            x0, w0 = ins["x_start"], ins["w_start"]
            wb = h[:, w0:w0 + mul]
            xw = [xg[:, x0 + m*mul : x0 + (m+1)*mul] * wb for m in range(d1)]
            by_p = {}
            for m, p, r in ins["mp"]:
                term = xw[m] * tmp[:, r:r + 1]
                by_p[p] = term if p not in by_p else by_p[p] + term
            if variant == "tp":
                for p, acc in by_p.items():
                    total = total + jnp.pad(acc, ((0, 0), (0, 128 - mul)))
                continue
            if variant == "tpred":
                for p, acc in by_p.items():
                    red = acc.reshape(A, K, mul).sum(axis=1)
                    total = total + jnp.pad(red, ((0, 0), (0, 128 - mul)))
                continue
            if variant == "tpredk":
                for p, acc in by_p.items():
                    red = kred(acc)
                    total = total + jnp.pad(red, ((0, 0), (0, 128 - mul)))
                continue
            if variant in ("tpredmm", "tpredmm_amaj"):
                for p, acc in by_p.items():
                    red = mmred(acc)
                    total = total + jnp.pad(red, ((0, 0), (0, 128 - mul)))
                continue
            if variant == "storek":
                for p, acc in by_p.items():
                    # aligned 128-wide store at an aligned offset
                    red = kred(acc)
                    col = (ins["g_start"] // 128) * 128 % (dim_mid - 128)
                    out_ref[:, col:col + 128] = jnp.pad(
                        red, ((0, 0), (0, 128 - mul)))
                continue
            g0, u_off, u_tot = ins["g_start"], ins["u_off"], ins["u_tot"]
            for p in range(d3):
                start = g0 + p*u_tot + u_off
                if p in by_p:
                    if variant == "fullk":
                        red = kred(by_p[p])
                    elif variant == "fullmm":
                        red = mmred(by_p[p])
                    else:
                        red = by_p[p].reshape(A, K, mul).sum(axis=1)
                    out_ref[:, start:start+mul] = red
                else:
                    out_ref[:, start:start+mul] = jnp.zeros((A, mul), jnp.float32)
        if variant == "tp":
            out_ref[:] = jnp.pad(total[:A], ((0, 0), (0, dim_mid - 128)))
        elif variant in ("tpred", "tpredk", "tpredmm", "tpredmm_amaj"):
            out_ref[:] = jnp.pad(total, ((0, 0), (0, dim_mid - 128)))

    ones = ONES_BD_AMAJ if variant.endswith("_amaj") else ONES_BD

    def fused(xg, emb, sh):
        n_blocks = xg.shape[0] // T
        in_specs = [
            pl.BlockSpec((T, dim_x), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, n_basis), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, dim_f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
             for w in mlp_ws] + [
            pl.BlockSpec((R, dim_f), lambda i: (0, 0), memory_space=pltpu.VMEM)]
        return pl.pallas_call(
            kernel, grid=(n_blocks,), in_specs=in_specs,
            out_specs=pl.BlockSpec((A, dim_mid), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_blocks*A, dim_mid), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100*1024*1024),
        )(xg, emb, sh, jnp.asarray(ones), *mlp_ws, jnp.asarray(w3j_pack_np))
    return fused


def timed(name, fn, n1=20, n2=120):
    def loop(n):
        def run(xg, emb, sh):
            def body(acc, _):
                o = fn(xg + 1e-30*acc, emb, sh)
                return acc + o[0, 0]*1e-30, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return acc
        return run
    f1 = jax.jit(loop(n1)); f2 = jax.jit(loop(n2))
    t0 = time.time(); float(f1(xg_full, emb2, sh2)); c = time.time()-t0
    float(f2(xg_full, emb2, sh2))
    best = 1e9
    for _ in range(3):
        t0 = time.time(); float(f1(xg_full, emb2, sh2)); t1 = time.time()-t0
        t0 = time.time(); float(f2(xg_full, emb2, sh2)); t2 = time.time()-t0
        best = min(best, (t2-t1)/(n2-n1))
    print(f"{name:22s} {best*1e3:7.2f} ms/layer (compile {c:.0f}s)", flush=True)


def build_feat(variant="full", A_=A):
    """Feature-major kernel: everything (feat, T); mul on sublanes."""
    T_ = A_ * K
    O_np = np.zeros((T_, A_), np.float32)
    for t in range(T_):
        O_np[t, t // K] = 1.0  # a-major

    def kernel(xg_ref, emb_ref, sh_ref, ones_ref, *rest):
        mlp_refs = rest[:n_mlp]
        w3j_ref = rest[n_mlp]
        out_ref = rest[n_mlp + 1]
        kw = dict(preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
        xgT = xg_ref[:].T          # (480, T)
        embT = emb_ref[:].T        # (8, T)
        shT = sh_ref[:].T          # (9, T)
        if variant == "transpose":
            out_ref[:] = jnp.pad(
                xgT[:, :dim_mid].T[:A_] if T_ >= dim_mid else
                jnp.pad(xgT.T[:A_], ((0,0),(0,dim_mid-dim_x))),
                ((0,0),(0,0)))
            return
        h = embT
        for li, wref in enumerate(mlp_refs):
            h = jnp.dot(wref[:].T, h, **kw) * inv_sqrt[li]
            if li < n_mlp - 1:
                h = jax.nn.silu(h) * cst
        tmp = jnp.dot(w3j_ref[:], shT, **kw)   # (R, T)

        def mmred(acc):
            # (mul, T) x (T, A) -> (mul, A)
            return jax.lax.dot_general(
                acc, ones_ref[:], (((1,), (0,)), ((), ())), **kw)

        for ins in instr:
            d1, d3, mul = ins["d1"], ins["d3"], ins["mul"]
            x0, w0 = ins["x_start"], ins["w_start"]
            wb = h[w0:w0 + mul, :]
            xw = [xgT[x0 + m*mul : x0 + (m+1)*mul, :] * wb for m in range(d1)]
            by_p = {}
            for m, p, r in ins["mp"]:
                term = xw[m] * tmp[r:r + 1, :]
                by_p[p] = term if p not in by_p else by_p[p] + term
            g0, u_off, u_tot = ins["g_start"], ins["u_off"], ins["u_tot"]
            for p in range(d3):
                start = g0 + p*u_tot + u_off
                if p in by_p:
                    out_ref[:, start:start+mul] = mmred(by_p[p]).T
                else:
                    out_ref[:, start:start+mul] = jnp.zeros((A_, mul), jnp.float32)

    def fused(xg, emb, sh):
        n_blocks = xg.shape[0] // T_
        in_specs = [
            pl.BlockSpec((T_, dim_x), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T_, n_basis), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T_, dim_f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T_, A_), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
             for w in mlp_ws] + [
            pl.BlockSpec((R, dim_f), lambda i: (0, 0), memory_space=pltpu.VMEM)]
        return pl.pallas_call(
            kernel, grid=(n_blocks,), in_specs=in_specs,
            out_specs=pl.BlockSpec((A_, dim_mid), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_blocks*A_, dim_mid), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100*1024*1024),
        )(xg, emb, sh, jnp.asarray(O_np), *mlp_ws, jnp.asarray(w3j_pack_np))
    return fused


def build_featroll(A_=A, prec="high", mlp_only=False, tponly=False):
    """Feature-major + k-major lanes + roll-based K fold + one final
    transpose via a (dim_mid, A) scratch."""
    from jax.experimental.pallas import tpu as pltpu2
    T_ = A_ * K
    PREC2 = jax.lax.Precision.HIGHEST  # Mosaic supports DEFAULT/HIGHEST only

    def kernel(xg_ref, emb_ref, sh_ref, *rest):
        mlp_refs = rest[:n_mlp]
        w3j_ref = rest[n_mlp]
        out_ref = rest[n_mlp + 1]
        scr = rest[n_mlp + 2]
        kw = dict(preferred_element_type=jnp.float32, precision=PREC2)
        xgT = xg_ref[:].T
        embT = emb_ref[:].T
        shT = sh_ref[:].T
        h = embT
        for li, wref in enumerate(mlp_refs):
            h = jnp.dot(wref[:].T, h, **kw) * inv_sqrt[li]
            if li < n_mlp - 1:
                h = jax.nn.silu(h) * cst
        tmp = jnp.dot(w3j_ref[:], shT, **kw)
        if mlp_only:
            out_ref[:] = jnp.pad((h[:, :A_] + tmp[:, :A_][: h.shape[0]]
                                  if False else h[:, :A_]).T,
                                 ((0, 0), (0, dim_mid - h.shape[0])))
            return

        def kfold(acc):
            # lanes are k-major: lane = k*A_ + a; fold K down to 1
            kcur = K
            while kcur > 1:
                if kcur % 2 == 0:
                    half = (kcur // 2) * A_
                    acc = acc[:, :half] + pltpu2.roll(acc, acc.shape[1] - half, 1)[:, :half]
                    kcur //= 2
                else:
                    acc = acc[:, : (kcur - 1) * A_] + jnp.pad(
                        pltpu2.roll(acc, A_, 1)[:, :A_],
                        ((0, 0), (0, (kcur - 2) * A_)))
                    kcur -= 1
            return acc  # (mul, A_)

        for ins in instr:
            d1, d3, mul = ins["d1"], ins["d3"], ins["mul"]
            x0, w0 = ins["x_start"], ins["w_start"]
            wb = h[w0:w0 + mul, :]
            xw = [xgT[x0 + m*mul : x0 + (m+1)*mul, :] * wb for m in range(d1)]
            by_p = {}
            for m, p, r in ins["mp"]:
                term = xw[m] * tmp[r:r + 1, :]
                by_p[p] = term if p not in by_p else by_p[p] + term
            g0, u_off, u_tot = ins["g_start"], ins["u_off"], ins["u_tot"]
            for p in range(d3):
                start = g0 + p*u_tot + u_off
                if p in by_p:
                    scr[start:start + mul, :] = kfold(by_p[p])
                else:
                    scr[start:start + mul, :] = jnp.zeros((mul, A_), jnp.float32)
        out_ref[:] = scr[:].T

    def fused(xg, emb, sh):
        n_blocks = xg.shape[0] // T_
        in_specs = [
            pl.BlockSpec((T_, dim_x), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T_, n_basis), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T_, dim_f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
             for w in mlp_ws] + [
            pl.BlockSpec((R, dim_f), lambda i: (0, 0), memory_space=pltpu.VMEM)]
        return pl.pallas_call(
            kernel, grid=(n_blocks,), in_specs=in_specs,
            out_specs=pl.BlockSpec((A_, dim_mid), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_blocks*A_, dim_mid), jnp.float32),
            scratch_shapes=[pltpu.VMEM((dim_mid, A_), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100*1024*1024),
        )(xg, emb, sh, *mlp_ws, jnp.asarray(w3j_pack_np))
    return fused


def kmaj(arr, A_=A):
    """(N,K,...) -> flat k-major (b*K*A + k*A + a)."""
    NN, KK = arr.shape[0], arr.shape[1]
    tail = arr.shape[2:]
    return (arr.reshape(NN // A_, A_, KK, *tail).swapaxes(1, 2)
            .reshape(NN * KK, *tail))


which = sys.argv[2] if len(sys.argv) > 2 else "all"
if which in ("all", "acc"):
    # accuracy: full kernel with HIGHEST precision vs fp32 XLA-highest ref
    full_hi = build("full", PREC)
    out_hi = full_hi(xg_full, emb2, sh2)
    with jax.default_matmul_precision("highest"):
        w = scalar_mlp_apply(mlp, mlp_p, emb)
        from sevennet_tpu.ops.dense_conv import _tp_forward_block
        ref = jax.jit(lambda xg, sh, w: _tp_forward_block(conv, xg, sh, w))(
            x[src], sh, w)
    err = float(jnp.max(jnp.abs(out_hi - ref.reshape(N, dim_mid))))
    print(f"full+HIGHEST vs XLA-highest: max err {err:.2e}", flush=True)
if which in ("all", "time"):
    timed("mlp (default prec)", build("mlp"))
    timed("mlp (HIGHEST)", build("mlp", PREC))
    timed("tmp only", build("tmp"))
    timed("tp no-reduce", build("tp"))
    timed("tp + reduce", build("tpred"))
    timed("full (default)", build("full"))
    timed("full (HIGHEST)", build("full", PREC))
if which == "k":
    timed("tp + kred (pad-add)", build("tpredk"))
    timed("tp + kred + aligned store", build("storek"))
    timed("fullk (kred, real stores)", build("fullk"))
if which == "mm":
    timed("tp + mmred (pad-add)", build("tpredmm"))
    timed("tp + mmred a-major", build("tpredmm_amaj"))
    timed("fullmm (real stores)", build("fullmm"))

if which == "feat":
    # correctness first
    f = build_feat("full")
    out = f(xg_full, emb2, sh2)
    with jax.default_matmul_precision("highest"):
        w = scalar_mlp_apply(mlp, mlp_p, emb)
        from sevennet_tpu.ops.dense_conv import _tp_forward_block
        ref = jax.jit(lambda xg, sh, w: _tp_forward_block(conv, xg, sh, w))(
            x[src], sh, w)
    err = float(jnp.max(jnp.abs(out - ref.reshape(N, dim_mid))))
    print(f"feat-major vs XLA-highest: max err {err:.2e}", flush=True)
    timed("feat-major full", build_feat("full"))

if which == "featroll":
    xg_km = x[kmaj(src).reshape(-1)] if False else x[kmaj(src)]
    emb_km, sh_km = kmaj(emb).reshape(-1, 8), kmaj(sh).reshape(-1, dim_f)
    f = build_featroll()
    out = f(xg_km, emb_km, sh_km)
    with jax.default_matmul_precision("highest"):
        w = scalar_mlp_apply(mlp, mlp_p, emb)
        from sevennet_tpu.ops.dense_conv import _tp_forward_block
        ref = jax.jit(lambda xg, sh, w: _tp_forward_block(conv, xg, sh, w))(
            x[src], sh, w)
    err = float(jnp.max(jnp.abs(out - ref.reshape(N, dim_mid))))
    print(f"featroll vs XLA-highest: max err {err:.2e}", flush=True)
    def t2(name, fn):
        def loop(n):
            def run(xg, emb, sh):
                def body(acc, _):
                    o = fn(xg + 1e-30*acc, emb, sh)
                    return acc + o[0, 0]*1e-30, None
                acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
                return acc
            return run
        f1 = jax.jit(loop(20)); f2 = jax.jit(loop(120))
        t0 = time.time(); float(f1(xg_km, emb_km, sh_km)); c = time.time()-t0
        float(f2(xg_km, emb_km, sh_km))
        best = 1e9
        for _ in range(3):
            t0 = time.time(); float(f1(xg_km, emb_km, sh_km)); a = time.time()-t0
            t0 = time.time(); float(f2(xg_km, emb_km, sh_km)); b = time.time()-t0
            best = min(best, (b-a)/100)
        print(f"{name:28s} {best*1e3:7.2f} ms/layer (compile {c:.0f}s)", flush=True)
    t2("featroll full (HIGH)", build_featroll())
    t2("featroll mlp-only (HIGH)", build_featroll(mlp_only=True))
    t2("featroll full A=32", build_featroll(A_=32))
