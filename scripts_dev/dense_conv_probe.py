"""Compare flat-edge vs dense (N,K) conv formulations on TPU, timed inside
a scan to amortize the ~32 ms tunnel dispatch floor."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from sevennet_tpu.irreps import Irreps, infer_irreps_out
from sevennet_tpu.ops.tensor_product import ConvTPSpec, conv_tp_apply
from sevennet_tpu.ops.mlp import ScalarMLPSpec, scalar_mlp_apply, scalar_mlp_init
from sevennet_tpu.so3.wigner import real_wigner_3j

N, K = 3072, 56
E = N * K
x_ir = Irreps("128x0e+64x1e+32x2e")
f_ir = Irreps.spherical_harmonics(2, 1)
tgt = infer_irreps_out(x_ir, f_ir, 2, "full")
conv = ConvTPSpec(x_ir, f_ir, tgt)
mlp = ScalarMLPSpec((8, 64, 64, conv.weight_numel))
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (N, x_ir.dim))
src_nk = jax.random.randint(key, (N, K), 0, N)
sh_nk = jax.random.normal(key, (N, K, f_ir.dim))
w_nk = jax.random.normal(key, (N, K, conv.weight_numel)) * 0.1
src = src_nk.reshape(-1)
dst = jnp.repeat(jnp.arange(N, dtype=jnp.int32), K)
sh_e = sh_nk.reshape(E, -1)
w_e = w_nk.reshape(E, -1)

def flat_block(x, src, dst, sh_e, w_e):
    msg = conv_tp_apply(conv, x[src], sh_e, w_e)
    return jax.ops.segment_sum(msg, dst, num_segments=N, indices_are_sorted=True)

def dense_block(x, src_nk, sh_nk, w_nk):
    w_e = w_nk.reshape(N*K, -1)
    xg = x[src_nk]  # (N, K, dim_x)
    xs = x_ir.slices()
    out_groups = {}
    w_off = 0
    for i, j, k, pw in conv.instructions:
        mi_x, mi_f, mi_o = conv.irreps_x[i], conv.irreps_filter[j], conv.irreps_mid[k]
        w3j = jnp.asarray(real_wigner_3j(mi_x.ir.l, mi_f.ir.l, mi_o.ir.l), x.dtype)
        xb = xg[:, :, xs[i]].reshape(N, K, mi_x.ir.dim, mi_x.mul)
        fb = sh_nk[:, :, f_ir.slices()[j]]
        wb = w_e.reshape(N, K, -1)[:, :, w_off:w_off+mi_x.mul]
        w_off += mi_x.mul
        tmp = jnp.einsum("mnp,akn->akmp", w3j, fb)
        xw = xb * (pw * wb)[:, :, None, :]
        msg = jnp.einsum("akmp,akmu->apu", tmp, xw)   # contract m AND K at once
        out_groups.setdefault(k, []).append(msg)
    pieces = []
    kk = 0
    nb = len(conv.irreps_mid)
    while kk < nb:
        ir = conv.irreps_mid[kk].ir
        grp = []
        while kk < nb and conv.irreps_mid[kk].ir == ir:
            grp.append(sum(out_groups[kk]) if kk in out_groups else
                       jnp.zeros((N, conv.irreps_mid[kk].ir.dim, conv.irreps_mid[kk].mul), x.dtype))
            kk += 1
        pieces.append((grp[0] if len(grp)==1 else jnp.concatenate(grp, -1)).reshape(N, -1))
    return jnp.concatenate(pieces, -1)

def timed(name, block, *arrs):
    def loop(x, *arrs):
        def body2(acc, _):
            return acc + block(x, *arrs).sum(), None
        acc, _ = jax.lax.scan(body2, 0.0, None, length=10)
        return acc
    f = jax.jit(loop)
    t0 = time.time(); float(f(x, *arrs)); c = time.time()-t0
    t0 = time.time()
    for _ in range(3): float(f(x, *arrs))
    per = (time.time()-t0)/3/10*1e3
    print(f"{name}: compile {c:.0f}s, {per:.1f} ms/iter", flush=True)

print(f"N={N} K={K} E={E}", flush=True)
timed("flat conv", flat_block, src, dst, sh_e, w_e)
timed("dense conv", dense_block, src_nk, sh_nk, w_nk)
# fwd+bwd
def timed_grad(name, block, *arrs):
    g = jax.grad(lambda x, *a: block(x, *a).sum())
    def loop(x, *arrs):
        def body2(acc, _):
            return acc + g(x, *arrs).sum(), None
        acc, _ = jax.lax.scan(body2, 0.0, None, length=10)
        return acc
    f = jax.jit(loop)
    t0 = time.time(); float(f(x, *arrs)); c = time.time()-t0
    t0 = time.time()
    for _ in range(3): float(f(x, *arrs))
    per = (time.time()-t0)/3/10*1e3
    print(f"{name} +bwd: compile {c:.0f}s, {per:.1f} ms/iter", flush=True)
timed_grad("flat conv", flat_block, src, dst, sh_e, w_e)
timed_grad("dense conv", dense_block, src_nk, sh_nk, w_nk)
