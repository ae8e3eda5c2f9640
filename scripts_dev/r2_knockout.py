"""Knock out individual ops in the dense conv forward to find the dominant cost.
N=3072, K=98, real SevenNet-0 mid-layer instruction set.
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
xg = jax.random.normal(k1, (N, K, x_ir.dim)) * 0.5
sh_nk = jax.random.normal(k3, (N, K, f_ir.dim)) * 0.5
w_pre = jax.random.normal(k4, (N, K, conv.weight_numel)) * 0.3
xs = x_ir.slices()
fs = f_ir.slices()
print("n_instructions:", len(conv.instructions), "dim_mid:", conv.irreps_mid.dim, flush=True)

def timed(name, fn, *args, iters=8, reps=3):
    def loop(*a):
        def body(acc, _):
            aa = [q + (1e-30*acc).astype(q.dtype) for q in a]
            out = fn(*aa)
            return acc + jnp.sum(out).astype(jnp.float32)*1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.), None, length=iters)
        return acc
    f = jax.jit(loop)
    t0 = time.time(); float(f(*args)); c = time.time()-t0
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); float(f(*args)); best = min(best, time.time()-t0)
    print(f"{name:46s} compile {c:4.0f}s  {best/iters*1e3:8.2f} ms/iter", flush=True)

def conv_fn(xg, sh, w, do_tmp=True, do_xw=True, do_msg=True):
    out = []
    w_off = 0
    for i, j, k, pw in conv.instructions:
        mi_x, mi_o = conv.irreps_x[i], conv.irreps_mid[k]
        m, p, u = mi_x.ir.dim, mi_o.ir.dim, mi_x.mul
        w3j = jnp.asarray(real_wigner_3j(mi_x.ir.l, conv.irreps_filter[j].ir.l, mi_o.ir.l), xg.dtype)
        xb = xg[:, :, xs[i]].reshape(N, K, m, u)
        fb = sh[:, :, fs[j]]
        wb = w[:, :, w_off:w_off+u]
        w_off += u
        if do_tmp:
            tmp = jnp.einsum("mnp,akn->akmp", w3j, fb)
        else:
            tmp = jnp.broadcast_to(fb[:, :, :1, None], (N, K, m, p)) * 0.1
        if do_xw:
            xw = xb * (pw * wb)[:, :, None, :]
        else:
            xw = xb
        if do_msg:
            msg = jnp.einsum("akmp,akmu->apu", tmp, xw)
        else:
            msg = xw.sum(1) * tmp.sum((1, 3))[:, :, None]  # cheap stand-in (a,m,u)->use
            msg = jnp.broadcast_to(msg[:, :1, :], (N, p, u))
        out.append(msg.reshape(N, -1))
    return jnp.concatenate(out, -1)

timed("full (tmp+xw+msg)", conv_fn, xg, sh_nk, w_pre)
timed("no tmp einsum", lambda a,b,c: conv_fn(a,b,c,do_tmp=False), xg, sh_nk, w_pre)
timed("no xw product", lambda a,b,c: conv_fn(a,b,c,do_xw=False), xg, sh_nk, w_pre)
timed("no msg einsum", lambda a,b,c: conv_fn(a,b,c,do_msg=False), xg, sh_nk, w_pre)

# alternative msg contraction orders
def msg_as_kfirst(xg, sh, w):
    """contract m per-edge first (q = tmp.T @ xb), then weighted K-sum."""
    out = []
    w_off = 0
    for i, j, k, pw in conv.instructions:
        mi_x, mi_o = conv.irreps_x[i], conv.irreps_mid[k]
        m, p, u = mi_x.ir.dim, mi_o.ir.dim, mi_x.mul
        w3j = jnp.asarray(real_wigner_3j(mi_x.ir.l, conv.irreps_filter[j].ir.l, mi_o.ir.l), xg.dtype)
        xb = xg[:, :, xs[i]].reshape(N, K, m, u)
        fb = sh[:, :, fs[j]]
        wb = w[:, :, w_off:w_off+u]
        w_off += u
        tmp = jnp.einsum("mnp,akn->akmp", w3j, fb)
        q = jnp.einsum("akmp,akmu->akpu", tmp, xb)
        msg = jnp.einsum("akpu,aku->apu", q, pw * wb)
        out.append(msg.reshape(N, -1))
    return jnp.concatenate(out, -1)
timed("alt: m-contract per edge, then K-sum", msg_as_kfirst, xg, sh_nk, w_pre)

# alternative: contract K and m via reshape to single dot (a, p, K*m)x(a, K*m, u)
# but materializing tmp TRANSPOSED: produce (a, p, k, m)? einsum does internally.
# try: single fused 4-operand einsum, let XLA pick
def msg_single_einsum(xg, sh, w):
    out = []
    w_off = 0
    for i, j, k, pw in conv.instructions:
        mi_x, mi_o = conv.irreps_x[i], conv.irreps_mid[k]
        m, p, u = mi_x.ir.dim, mi_o.ir.dim, mi_x.mul
        w3j = jnp.asarray(real_wigner_3j(mi_x.ir.l, conv.irreps_filter[j].ir.l, mi_o.ir.l), xg.dtype)
        xb = xg[:, :, xs[i]].reshape(N, K, m, u)
        fb = sh[:, :, fs[j]]
        wb = w[:, :, w_off:w_off+u]
        w_off += u
        msg = pw * jnp.einsum("mnp,akn,akmu,aku->apu", w3j, fb, xb, wb)
        out.append(msg.reshape(N, -1))
    return jnp.concatenate(out, -1)
timed("alt: 4-operand einsum (XLA path choice)", msg_single_einsum, xg, sh_nk, w_pre)
