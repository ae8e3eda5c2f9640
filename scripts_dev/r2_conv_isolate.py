"""Isolate conv-layer cost components at N=3072, K=98."""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")

import jax, jax.numpy as jnp
import numpy as np

from sevennet_tpu.irreps import Irreps, infer_irreps_out
from sevennet_tpu.ops.tensor_product import ConvTPSpec
from sevennet_tpu.ops.mlp import ScalarMLPSpec, scalar_mlp_apply, scalar_mlp_init
from sevennet_tpu.so3.wigner import real_wigner_3j

N, K = 3072, 98
x_ir = Irreps("128x0e+64x1e+32x2e")
f_ir = Irreps.spherical_harmonics(2, 1)
tgt = infer_irreps_out(x_ir, f_ir, 2, "full")
conv = ConvTPSpec(x_ir, f_ir, tgt)
mlp = ScalarMLPSpec((8, 64, 64, conv.weight_numel))
key = jax.random.PRNGKey(0)
k1, k2, k3, k4, k5 = jax.random.split(key, 5)
x = jax.random.normal(k1, (N, x_ir.dim)) * 0.5
src_nk = jax.random.randint(k2, (N, K), 0, N)
sh_nk = jax.random.normal(k3, (N, K, f_ir.dim)) * 0.5
emb_nk = jax.random.normal(k4, (N, K, 8)) * 0.3
xg_pre = jax.random.normal(k5, (N, K, x_ir.dim)) * 0.5
w_pre = jax.random.normal(k5, (N, K, conv.weight_numel)) * 0.3
mlp_p = scalar_mlp_init(jax.random.PRNGKey(9), mlp)
xs = x_ir.slices()
fs = f_ir.slices()

def timed(name, fn, *args, iters=8, reps=3):
    def loop(*a):
        def body(acc, _):
            aa = [q + (1e-30*acc).astype(q.dtype) if q.dtype != jnp.int32 else q for q in a]
            out = fn(*aa)
            return acc + jnp.sum(out).astype(jnp.float32)*1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.), None, length=iters)
        return acc
    f = jax.jit(loop)
    t0 = time.time(); float(f(*args)); c = time.time()-t0
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); float(f(*args)); best = min(best, time.time()-t0)
    print(f"{name:44s} compile {c:4.0f}s  {best/iters*1e3:8.2f} ms/iter", flush=True)

def tp_only(xg, sh, w):
    out = [None] * len(conv.irreps_mid)
    w_off = 0
    for i, j, k, pw in conv.instructions:
        mi_x, mi_o = conv.irreps_x[i], conv.irreps_mid[k]
        w3j = jnp.asarray(real_wigner_3j(mi_x.ir.l, conv.irreps_filter[j].ir.l, mi_o.ir.l), xg.dtype)
        xb = xg[:, :, xs[i]].reshape(N, K, mi_x.ir.dim, mi_x.mul)
        fb = sh[:, :, fs[j]]
        wb = w[:, :, w_off:w_off+mi_x.mul]
        w_off += mi_x.mul
        tmp = jnp.einsum("mnp,akn->akmp", w3j, fb)
        xw = xb * wb[:, :, None, :]
        msg = jnp.einsum("akmp,akmu->apu", tmp, xw)
        out[k] = msg if out[k] is None else out[k] + msg
    return jnp.concatenate([o.reshape(N, -1) for o in out], -1)

# E1: TP only, pre-gathered x, pre-computed w (pure einsum cost)
timed("E1 TP einsums only (pregathered)", tp_only, xg_pre, sh_nk, w_pre)
# E1b same in bf16
timed("E1b TP einsums bf16", lambda a,b,c: tp_only(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), c.astype(jnp.bfloat16)), xg_pre, sh_nk, w_pre)
# E2: gather + weighted K-sum, no TP (traffic floor shape)
timed("E2 gather + w*sum_k (no TP)", lambda x, w: jnp.einsum("aku,akv->av", w[:, :, :480], x[src_nk]), x, w_pre)
# E3: MLP only
timed("E3 radial MLP", lambda e: scalar_mlp_apply(mlp, mlp_p, e), emb_nk)
# E4: tmp einsums only
def tmps(sh):
    outs = []
    for i, j, k, pw in conv.instructions:
        mi_x, mi_o = conv.irreps_x[i], conv.irreps_mid[k]
        w3j = jnp.asarray(real_wigner_3j(mi_x.ir.l, conv.irreps_filter[j].ir.l, mi_o.ir.l), sh.dtype)
        outs.append(jnp.einsum("mnp,akn->akmp", w3j, sh[:, :, fs[j]]).reshape(N, K, -1))
    return jnp.concatenate(outs, -1)
timed("E4 tmp(sh) einsums only", tmps, sh_nk)
# E5: per-instruction dots via explicit reshape to (a, p, K*m) x (a, K*m, u)
def tp_dotg(xg, sh, w):
    out = []
    w_off = 0
    for i, j, k, pw in conv.instructions:
        mi_x, mi_o = conv.irreps_x[i], conv.irreps_mid[k]
        m, p, u = mi_x.ir.dim, mi_o.ir.dim, mi_x.mul
        w3j = jnp.asarray(real_wigner_3j(mi_x.ir.l, conv.irreps_filter[j].ir.l, mi_o.ir.l), xg.dtype)
        xb = xg[:, :, xs[i]].reshape(N, K, m, u)
        fb = sh[:, :, fs[j]]
        wb = w[:, :, w_off:w_off+mi_x.mul]
        w_off += mi_x.mul
        tmp = jnp.einsum("mnp,akn->akmp", w3j, fb).reshape(N, K*m, p)
        xw = (xb * wb[:, :, None, :]).reshape(N, K*m, u)
        out.append(jax.lax.dot_general(tmp, xw, (((1,), (1,)), ((0,), (0,)))).reshape(N, -1))
    return jnp.concatenate(out, -1)
timed("E5 TP as dot_general (a,Km,p)x(a,Km,u)", tp_dotg, xg_pre, sh_nk, w_pre)
# E6: full conv but using x already bf16 + gather
def full_bf16(x, emb, sh):
    w = scalar_mlp_apply(mlp, mlp_p, emb.astype(jnp.bfloat16))
    xg = x.astype(jnp.bfloat16)[src_nk]
    return tp_only(xg, sh.astype(jnp.bfloat16), w)
timed("E6 full conv bf16 (mlp+gather+tp)", full_bf16, x, emb_nk, sh_nk)
