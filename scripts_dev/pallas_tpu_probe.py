import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from sevennet_tpu.irreps import Irreps, infer_irreps_out
from sevennet_tpu.ops.mlp import ScalarMLPSpec, scalar_mlp_init, scalar_mlp_apply
from sevennet_tpu.ops.pallas_conv import make_dense_conv_kernel
from sevennet_tpu.ops.tensor_product import ConvTPSpec

x_ir = Irreps("128x0e+64x1e+32x2e")
f_ir = Irreps.spherical_harmonics(2, 1)
tgt = infer_irreps_out(x_ir, f_ir, 2, "full")
conv = ConvTPSpec(x_ir, f_ir, tgt)
mlp = ScalarMLPSpec((8, 64, 64, conv.weight_numel))

N, K, A = 3072, 96, 8
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (N, x_ir.dim))
emb = jax.random.normal(key, (N, K, 8)) * 0.3
sh = jax.random.normal(key, (N, K, f_ir.dim))
src = jax.random.randint(key, (N, K), 0, N)
mlp_ws = scalar_mlp_init(key, mlp)["w"]

fused = make_dense_conv_kernel(conv, mlp, A, K)
# correctness vs XLA dense on hardware (single eval)
out = fused(x, emb, sh, src, mlp_ws)
print("pallas out ok:", out.shape, float(jnp.abs(out).mean()), flush=True)

def timed(name, fn):
    def loop(x, emb, sh, src, ws):
        def body(acc, _):
            return acc + fn(x + 1e-30*acc, emb, sh, src, ws).sum(), None
        acc, _ = jax.lax.scan(body, 0.0, None, length=5)
        return acc
    f = jax.jit(loop)
    t0=time.time(); float(f(x, emb, sh, src, mlp_ws)); c=time.time()-t0
    t0=time.time(); float(f(x, emb, sh, src, mlp_ws))
    print(f"{name}: compile {c:.0f}s, {(time.time()-t0)/5*1e3:.1f} ms/iter", flush=True)

timed("pallas fused conv", lambda x, e, s, sr, ws: fused(x, e, s, sr, ws))

# XLA dense reference timing
from sevennet_tpu.so3.wigner import real_wigner_3j
def xla_dense(x, emb, sh, src, ws):
    w = scalar_mlp_apply(mlp, {"w": list(ws)}, emb)
    xg = x[src]
    xs = conv.irreps_x.slices(); fs = conv.irreps_filter.slices()
    out = [None]*len(conv.irreps_mid)
    w_off = 0
    for i, j, k, pw in conv.instructions:
        mi_x, mi_f, mi_o = conv.irreps_x[i], conv.irreps_filter[j], conv.irreps_mid[k]
        w3j = jnp.asarray(real_wigner_3j(mi_x.ir.l, mi_f.ir.l, mi_o.ir.l), x.dtype)
        xb = xg[:, :, xs[i]].reshape(N, K, mi_x.ir.dim, mi_x.mul)
        fb = sh[:, :, fs[j]]
        wb = w[:, :, w_off:w_off+mi_x.mul]; w_off += mi_x.mul
        tmp = jnp.einsum("mnp,akn->akmp", w3j, fb)
        xw = xb * (pw*wb)[:, :, None, :]
        msg = jnp.einsum("akmp,akmu->apu", tmp, xw)
        out[k] = msg if out[k] is None else out[k]+msg
    return jnp.concatenate([o.reshape(N,-1) for o in out], -1)
timed("xla dense conv   ", xla_dense)
