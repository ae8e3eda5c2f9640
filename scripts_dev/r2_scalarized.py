"""Scalarized-(m,p) conv: tiny dims become unrolled python loops over
broadcast-mul + K-reduce ops on clean (A,K,u) tiles; all w3j*sh coefficients
come from ONE (A*K,9)@(9,179) matmul.
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

# Build the coefficient matrix: C[(9), T] where T enumerates (ins, m, p)
# triples; c[a,k,t] = sum_n w3j[m,n,p]*pw * sh[a,k,n]
triples = []   # (ins_idx, i, m_idx, p_idx, k_out, u, w_off, x_off)
cols = []
w_off = 0
for idx, (i, j, k, pw) in enumerate(conv.instructions):
    mi_x, mi_o = conv.irreps_x[i], conv.irreps_mid[k]
    m_d, p_d, u = mi_x.ir.dim, mi_o.ir.dim, mi_x.mul
    w3j = real_wigner_3j(mi_x.ir.l, conv.irreps_filter[j].ir.l, mi_o.ir.l)
    sl = fs[j]
    for mm in range(m_d):
        for pp in range(p_d):
            col = np.zeros(9)
            col[sl.start:sl.stop] = w3j[mm, :, pp] * pw
            if np.any(col != 0):
                triples.append((idx, i, mm, pp, k, u, w_off))
                cols.append(col)
    w_off += u
CMAT = jnp.asarray(np.stack(cols, 1), jnp.float32)  # (9, T)
T = CMAT.shape[1]
print("T (nonzero triples):", T, flush=True)

def scalarized(x, sh, w, dtype=jnp.float32):
    x = x.astype(dtype); sh = sh.astype(dtype); w = w.astype(dtype)
    cm = CMAT.astype(dtype)
    xg = x[src_nk]  # (N,K,480)
    c = (sh.reshape(N * K, 9) @ cm).reshape(N, K, T)  # one matmul
    out = {}
    for t, (idx, i, mm, pp, kout, u, w0) in enumerate(triples):
        x0 = xs[i].start + mm * u
        xsl = xg[:, :, x0:x0 + u]            # (N,K,u)
        wsl = w[:, :, w0:w0 + u]             # (N,K,u)
        contrib = jnp.sum(c[:, :, t, None] * xsl * wsl, axis=1)  # (N,u)
        key_ = (kout, pp)
        out[key_] = contrib if key_ not in out else out[key_] + contrib
    # assemble (same grouped layout as reference)
    blocks = {}
    for kout in range(len(conv.irreps_mid)):
        mi = conv.irreps_mid[kout]
        cols_ = [out.get((kout, pp), jnp.zeros((N, mi.mul), dtype)) for pp in range(mi.ir.dim)]
        blocks[kout] = jnp.stack(cols_, 1)  # (N,p,u)
    pieces = []
    kk = 0
    nb = len(conv.irreps_mid)
    while kk < nb:
        ir = conv.irreps_mid[kk].ir
        grp = []
        while kk < nb and conv.irreps_mid[kk].ir == ir:
            grp.append(blocks[kk]); kk += 1
        pieces.append((grp[0] if len(grp) == 1 else jnp.concatenate(grp, -1)).reshape(N, -1))
    return jnp.concatenate(pieces, -1).astype(jnp.float32)

def ref(x, sh, w):
    out = [None] * len(conv.irreps_mid)
    xg = x[src_nk]
    w_off = 0
    for i, j, k, pw in conv.instructions:
        mi_x, mi_o = conv.irreps_x[i], conv.irreps_mid[k]
        w3j = jnp.asarray(real_wigner_3j(mi_x.ir.l, conv.irreps_filter[j].ir.l, mi_o.ir.l), x.dtype)
        xb = xg[:, :, xs[i]].reshape(N, K, mi_x.ir.dim, mi_x.mul)
        fb = sh[:, :, fs[j]]
        wb = w[:, :, w_off:w_off + mi_x.mul]
        w_off += mi_x.mul
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
            mi = conv.irreps_mid[kk]
            blk = out[kk] if out[kk] is not None else jnp.zeros((N, mi.ir.dim, mi.mul), x.dtype)
            grp.append(blk); kk += 1
        pieces.append((grp[0] if len(grp) == 1 else jnp.concatenate(grp, -1)).reshape(N, -1))
    return jnp.concatenate(pieces, -1)

o1 = jax.jit(scalarized)(x, sh_nk, w_pre)
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

timed("scalarized fp32 fwd", scalarized, x, sh_nk, w_pre)
timed("scalarized bf16 fwd", lambda a,b,c: scalarized(a,b,c,jnp.bfloat16), x, sh_nk, w_pre)
timed_grad("scalarized fp32 fwd+bwd", scalarized, x, sh_nk, w_pre)
timed_grad("scalarized bf16 fwd+bwd", lambda a,b,c: scalarized(a,b,c,jnp.bfloat16), x, sh_nk, w_pre)
