"""Conv-layer formulation shootout at N=3000, K=98 (SevenNet-0 layer-1 shapes).

Variants:
  V0  current per-instruction dense conv (incl radial MLP)
  V1  V0 with bf16 gather/einsums (fp32 params, bf16 compute)
  V2  grouped-by-x-block einsum (j-stacked, padded P) bf16
  V3  V2 + custom_vjp mirror-edge backward (no scatter in bwd)
Each timed fwd and fwd+bwd (grad wrt x, emb, sh).
"""
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
k1, k2, k3, k4 = jax.random.split(key, 4)
x = jax.random.normal(k1, (N, x_ir.dim)) * 0.5
src_nk = jax.random.randint(k2, (N, K), 0, N)
sh_nk = jax.random.normal(k3, (N, K, f_ir.dim)) * 0.5
emb_nk = jax.random.normal(k4, (N, K, 8)) * 0.3
mlp_p = scalar_mlp_init(jax.random.PRNGKey(9), mlp)
print(f"N={N} K={K} dim_x={x_ir.dim} dim_mid={conv.irreps_mid.dim} numel={conv.weight_numel}", flush=True)

xs = x_ir.slices()
fs = f_ir.slices()

# ---------------- V0: current per-instruction ----------------
def v0(x, emb, sh, dtype=jnp.float32):
    w = scalar_mlp_apply(mlp, mlp_p, emb)
    xg = x[src_nk]
    out = [None] * len(conv.irreps_mid)
    w_off = 0
    for i, j, k, pw in conv.instructions:
        mi_x, mi_o = conv.irreps_x[i], conv.irreps_mid[k]
        w3j = jnp.asarray(real_wigner_3j(mi_x.ir.l, conv.irreps_filter[j].ir.l, mi_o.ir.l), dtype)
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
            grp.append(out[kk]); kk += 1
        pieces.append((grp[0] if len(grp) == 1 else jnp.concatenate(grp, -1)).reshape(N, -1))
    return jnp.concatenate(pieces, -1)

def v1(x, emb, sh):
    b = jnp.bfloat16
    out = v0(x.astype(b), emb.astype(b), sh.astype(b), dtype=b)
    return out.astype(jnp.float32)

# ---------------- V2: grouped by x-block, j-stacked ----------------
# per x-block i: instructions (i, j) -> out irrep k. For fixed i, stack over
# the instruction index t: W3J_i[t, m, n, p<=Pmax] zero-padded on p.
# msg_i[a, t, p, u] = sum_{k,m} tmp_i[a,k,t,m,p] * (xg_i * w_it)[a,k,m,u]
# tmp_i via one matmul: sh (A*K, 9) @ W3Jflat_i (9, t*m*Pmax)
groups = {}
w_off = 0
for i, j, k, pw in conv.instructions:
    mul = conv.irreps_x[i].mul
    groups.setdefault(i, []).append((j, k, pw, w_off))
    w_off += mul

def make_group_tables(dtype=jnp.float32):
    tabs = {}
    for i, ins in groups.items():
        mi_x = conv.irreps_x[i]
        m = mi_x.ir.dim
        Pmax = max(conv.irreps_mid[k].ir.dim for (_, k, _, _) in ins)
        T = len(ins)
        W = np.zeros((9, T, m, Pmax), np.float64)
        for t, (j, k, pw, _) in enumerate(ins):
            w3j = real_wigner_3j(mi_x.ir.l, conv.irreps_filter[j].ir.l, conv.irreps_mid[k].ir.l)
            sl = fs[j]
            W[sl.start:sl.stop, t, :, :w3j.shape[2]] = np.transpose(w3j, (1, 0, 2)) * pw
        tabs[i] = (jnp.asarray(W.reshape(9, T * m * Pmax), dtype), T, m, Pmax)
    return tabs

TABS32 = make_group_tables(jnp.float32)
TABS16 = make_group_tables(jnp.bfloat16)

def v2(x, emb, sh, dtype=jnp.bfloat16):
    tabs = TABS16 if dtype == jnp.bfloat16 else TABS32
    x = x.astype(dtype); emb = emb.astype(dtype); sh = sh.astype(dtype)
    w = scalar_mlp_apply(mlp, mlp_p, emb)  # (N,K,numel)
    xg = x[src_nk]
    outs = {}
    for i, ins in groups.items():
        Wf, T, m, Pmax = tabs[i]
        mi_x = conv.irreps_x[i]
        u = mi_x.mul
        tmp = (sh.reshape(N * K, 9) @ Wf).reshape(N, K, T, m, Pmax)
        # stack weights for this block: (N,K,T,u)
        wts = jnp.stack([w[:, :, off:off + u] for (_, _, _, off) in ins], axis=2)
        xb = xg[:, :, xs[i]].reshape(N, K, m, u)
        xw = xb[:, :, None, :, :] * wts[:, :, :, None, :]  # (N,K,T,m,u)
        msg = jnp.einsum("aktmp,aktmu->atpu", tmp, xw)  # contract k,m
        outs[i] = msg  # (N, T, Pmax, u)
    # assemble to irreps_mid layout (same ordering as V0)
    blocks = {}
    for i, ins in groups.items():
        for t, (j, k, pw, off) in enumerate(ins):
            mi_o = conv.irreps_mid[k]
            blocks[k] = outs[i][:, t, :mi_o.ir.dim, :]
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

def v2f(x, emb, sh):
    return v2(x, emb, sh, dtype=jnp.float32)

# ---------------- timing ----------------
def timed(name, fn, iters=8, reps=3):
    def loop(x, emb, sh):
        def body(acc, _):
            out = fn(x + 1e-30 * acc, emb + 1e-30 * acc, sh + 1e-30 * acc)
            return acc + jnp.sum(out).astype(jnp.float32) * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.), None, length=iters)
        return acc
    f = jax.jit(loop)
    t0 = time.time(); float(f(x, emb_nk, sh_nk)); c = time.time() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); float(f(x, emb_nk, sh_nk)); best = min(best, time.time() - t0)
    print(f"{name:36s} compile {c:4.0f}s  {best/iters*1e3:8.2f} ms/iter", flush=True)

def timed_grad(name, fn, iters=6, reps=3):
    g = jax.grad(lambda x, e, s: jnp.sum(fn(x, e, s)), argnums=(0, 1, 2))
    def loop(x, emb, sh):
        def body(acc, _):
            gx, ge, gs = g(x + 1e-30 * acc, emb + 1e-30 * acc, sh + 1e-30 * acc)
            return acc + (jnp.sum(gx) + jnp.sum(ge) + jnp.sum(gs)).astype(jnp.float32) * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.), None, length=iters)
        return acc
    f = jax.jit(loop)
    t0 = time.time(); float(f(x, emb_nk, sh_nk)); c = time.time() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); float(f(x, emb_nk, sh_nk)); best = min(best, time.time() - t0)
    print(f"{name:36s} compile {c:4.0f}s  {best/iters*1e3:8.2f} ms/iter", flush=True)

# correctness cross-check (fp32 grouping vs V0)
o0 = jax.jit(v0)(x, emb_nk, sh_nk)
o2 = jax.jit(v2f)(x, emb_nk, sh_nk)
print("V2f vs V0 max err:", float(jnp.max(jnp.abs(o0 - o2))), flush=True)

timed("V0 fp32 per-instruction", v0)
timed("V1 bf16 per-instruction", v1)
timed("V2 bf16 grouped", v2)
timed("V2f fp32 grouped", v2f)
timed_grad("V0 fp32 +bwd", v0)
timed_grad("V1 bf16 +bwd", v1)
timed_grad("V2 bf16 +bwd", v2)
