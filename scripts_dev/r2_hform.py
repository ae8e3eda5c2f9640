"""H-formulation probe: contract K once via a clean batched matmul.

  xw_all[a,k, (ij: m,u)] = x[src][a,k, block i] * w_ij[a,k,u]   (2496 wide)
  H[a, n, c] = sum_k sh[a,k,n] * xw_all[a,k,c]                  (one batched dot)
  msg[a,p,u] = sum_{m,n} w3j[m,n,p] * H[a, n, (ij,m,u)]         (no K axis)
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")

import jax, jax.numpy as jnp
import numpy as np

from sevennet_tpu.irreps import Irreps, infer_irreps_out
from sevennet_tpu.ops.tensor_product import ConvTPSpec
from sevennet_tpu.so3.wigner import real_wigner_3j

N, K = 3072, 98
x_ir = Irreps("128x0e+64x1e+32x2e")
f_ir = Irreps.spherical_harmonics(2, 1)
tgt = infer_irreps_out(x_ir, f_ir, 2, "full")
conv = ConvTPSpec(x_ir, f_ir, tgt)
key = jax.random.PRNGKey(0)
k1, k2, k3, k4 = jax.random.split(key, 4)
x = jax.random.normal(k1, (N, x_ir.dim)) * 0.5
src_nk = jax.random.randint(k2, (N, K), 0, N)
sh_nk = jax.random.normal(k3, (N, K, f_ir.dim)) * 0.5
w_pre = jax.random.normal(k4, (N, K, conv.weight_numel)) * 0.3
xs = x_ir.slices()
fs = f_ir.slices()

# per-instruction segments in the xw_all axis
segs = []
c_off = 0
w_off = 0
for i, j, k, pw in conv.instructions:
    m, u = conv.irreps_x[i].ir.dim, conv.irreps_x[i].mul
    segs.append((i, j, k, pw, c_off, w_off, m, u))
    c_off += m * u
    w_off += u
C_ALL = c_off
print("C_ALL:", C_ALL, flush=True)

def hform(x, sh, w, dtype=jnp.float32):
    x = x.astype(dtype); sh = sh.astype(dtype); w = w.astype(dtype)
    xg = x[src_nk]  # (N,K,480)
    pieces = []
    for (i, j, k, pw, c0, w0, m, u) in segs:
        xb = xg[:, :, xs[i]]  # (N,K,m*u)
        wb = w[:, :, w0:w0+u]
        # weight repeats over m: tile along the feature axis
        xw = xb.reshape(N, K, m, u) * (pw * wb)[:, :, None, :]
        pieces.append(xw.reshape(N, K, m * u))
    xw_all = jnp.concatenate(pieces, -1)  # (N, K, 2496)
    H = jnp.einsum("akn,akc->anc", sh, xw_all)  # (N, 9, 2496)
    out = [None] * len(conv.irreps_mid)
    for (i, j, k, pw, c0, w0, m, u) in segs:
        mi_o = conv.irreps_mid[k]
        p = mi_o.ir.dim
        w3j = jnp.asarray(real_wigner_3j(conv.irreps_x[i].ir.l, conv.irreps_filter[j].ir.l, mi_o.ir.l), dtype)
        Hb = H[:, fs[j], c0:c0+m*u].reshape(N, w3j.shape[1], m, u)
        msg = jnp.einsum("mnp,anmu->apu", w3j, Hb)
        out[k] = msg if out[k] is None else out[k] + msg
    pieces = []
    kk = 0
    nb = len(conv.irreps_mid)
    while kk < nb:
        ir = conv.irreps_mid[kk].ir
        grp = []
        while kk < nb and conv.irreps_mid[kk].ir == ir:
            grp.append(out[kk]); kk += 1
        pieces.append((grp[0] if len(grp) == 1 else jnp.concatenate(grp, -1)).reshape(N, -1))
    return jnp.concatenate(pieces, -1).astype(jnp.float32)

# reference for correctness
def ref(x, sh, w):
    out = [None] * len(conv.irreps_mid)
    xg = x[src_nk]
    for (i, j, k, pw, c0, w0, m, u) in segs:
        mi_o = conv.irreps_mid[k]
        w3j = jnp.asarray(real_wigner_3j(conv.irreps_x[i].ir.l, conv.irreps_filter[j].ir.l, mi_o.ir.l), x.dtype)
        xb = xg[:, :, xs[i]].reshape(N, K, m, u)
        fb = sh[:, :, fs[j]]
        wb = w[:, :, w0:w0+u]
        tmp = jnp.einsum("mnp,akn->akmp", w3j, fb)
        xw = xb * (pw * wb)[:, :, None, :]
        msg = jnp.einsum("akmp,akmu->apu", tmp, xw)
        out[k] = msg if out[k] is None else out[k] + msg
    pieces = []
    kk = 0
    nb = len(conv.irreps_mid)
    while kk < nb:
        ir = conv.irreps_mid[kk].ir
        grp = []
        while kk < nb and conv.irreps_mid[kk].ir == ir:
            grp.append(out[kk]); kk += 1
        pieces.append((grp[0] if len(grp) == 1 else jnp.concatenate(grp, -1)).reshape(N, -1))
    return jnp.concatenate(pieces, -1)

o1 = jax.jit(hform)(x, sh_nk, w_pre)
o2 = jax.jit(ref)(x, sh_nk, w_pre)
print("max err:", float(jnp.max(jnp.abs(o1 - o2))), flush=True)

def timed(name, fn, *args, iters=8, reps=3):
    def loop(*a):
        def body(acc, _):
            aa = [q + (1e-30*acc).astype(q.dtype) for q in a]
            return acc + jnp.sum(fn(*aa)).astype(jnp.float32)*1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.), None, length=iters)
        return acc
    f = jax.jit(loop)
    t0 = time.time(); float(f(*args)); c = time.time()-t0
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); float(f(*args)); best = min(best, time.time()-t0)
    print(f"{name:40s} compile {c:4.0f}s  {best/iters*1e3:8.2f} ms/iter", flush=True)

def timed_grad(name, fn, *args, iters=6, reps=3):
    g = jax.grad(lambda *a: jnp.sum(fn(*a)), argnums=(0, 1, 2))
    def loop(*a):
        def body(acc, _):
            aa = [q + (1e-30*acc).astype(q.dtype) for q in a]
            gs = g(*aa)
            return acc + sum(jnp.sum(q) for q in gs).astype(jnp.float32)*1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.), None, length=iters)
        return acc
    f = jax.jit(loop)
    t0 = time.time(); float(f(*args)); c = time.time()-t0
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); float(f(*args)); best = min(best, time.time()-t0)
    print(f"{name:40s} compile {c:4.0f}s  {best/iters*1e3:8.2f} ms/iter", flush=True)

timed("H-form fp32 fwd", hform, x, sh_nk, w_pre)
timed("H-form bf16 fwd", lambda a,b,c: hform(a,b,c,jnp.bfloat16), x, sh_nk, w_pre)
timed_grad("H-form fp32 fwd+bwd", hform, x, sh_nk, w_pre)
timed_grad("H-form bf16 fwd+bwd", lambda a,b,c: hform(a,b,c,jnp.bfloat16), x, sh_nk, w_pre)
