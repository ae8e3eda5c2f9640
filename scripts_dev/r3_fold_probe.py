"""K-fold strategies probe at engine shapes: roll-chain vs MXU matmul
against a constant 0/1 fold matrix (bf16 hi/lo split for accuracy) vs one
big fold. Standalone kernels that ONLY fold (mul,T)->(mul,A) tiles summing
to dim_mid rows, measuring the reduction phase in isolation + accuracy.

Usage: python scripts_dev/r3_fold_probe.py [variant ...]
  variants: roll mxu2 mxu3 bigroll
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, K, A = 10016, 72, 32
T = A * K
DM = 3136          # dim_mid rows total
NB = (N * K) // T
# tile structure like the real kernel: rows in groups of mul
MULS = [128] * 8 + [64] * 22 + [32] * 22  # 1024 + 1408 + 704 = 3136
assert sum(MULS) == DM

x = jax.random.normal(jax.random.PRNGKey(0), (NB * T, DM // 8)) * 0.5
# input to fold: per-block (DM, T) conceptually; we emulate with a
# (T, DM/8) input block expanded in-kernel to control HBM traffic; the
# fold work itself uses a scratch (DM, T) filled from the input.

def make(variant):
    fold_np = np.zeros((T, A), np.float32)
    fold_np[np.arange(T), np.arange(T) % A] = 1.0
    fold_c = jnp.asarray(fold_np)
    DOT = dict(preferred_element_type=jnp.float32)

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

    def kernel(in_ref, f_ref, out_ref, scr):
        base = in_ref[:].T  # (DM/8, T)
        start = 0
        for mul in MULS:
            # build a (mul, T) tile from the input (cheap repeat)
            tile = base[(start // 8) % (DM // 8) : , :][:mul, :]
            if tile.shape[0] < mul:
                tile = jnp.concatenate(
                    [tile, base[: mul - tile.shape[0], :]], 0
                )
            if variant == "roll":
                scr[start : start + mul, :] = _kfold(tile)
            elif variant == "mxu2":
                hi = tile.astype(jnp.bfloat16)
                lo = (tile - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                r = jnp.dot(hi, f_ref[:].astype(jnp.bfloat16), **DOT) + \
                    jnp.dot(lo, f_ref[:].astype(jnp.bfloat16), **DOT)
                scr[start : start + mul, :] = r
            elif variant == "mxu3":
                a1 = tile.astype(jnp.bfloat16)
                r1 = tile - a1.astype(jnp.float32)
                a2 = r1.astype(jnp.bfloat16)
                a3 = (r1 - a2.astype(jnp.float32)).astype(jnp.bfloat16)
                fb = f_ref[:].astype(jnp.bfloat16)
                r = (jnp.dot(a1, fb, **DOT) + jnp.dot(a2, fb, **DOT)
                     + jnp.dot(a3, fb, **DOT))
                scr[start : start + mul, :] = r
            start += mul
        if variant == "bigroll":
            scr[:, :] = _kfold(
                jnp.concatenate([base] * 8, 0)
            )
        out_ref[:] = scr[:].T

    return pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((T, DM // 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, A), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((A, DM), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB * A, DM), jnp.float32),
        scratch_shapes=[pltpu.VMEM((DM, A), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110*1024*1024),
    ), fold_c


def timed(name, f, args, n1=3, n2=9):
    def loop(n):
        def run(x, *rest):
            def body(carry, _):
                x2 = jax.lax.dynamic_update_slice(x, carry.reshape(1, 1), (0, 0))
                o = f(x2, *rest)
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
    print(f"{name:10s} {best*1e3:7.2f} ms/layer-fold (compile {c:.0f}s)", flush=True)


ref_out = None
for v in (sys.argv[1:] or ["roll", "mxu2", "mxu3"]):
    try:
        f, fold_c = make(v)
        out = f(x, fold_c)
        if v == "roll":
            ref_out = out
        elif ref_out is not None:
            rel = float(jnp.max(jnp.abs(out - ref_out)) /
                        (jnp.max(jnp.abs(ref_out)) + 1e-30))
            print(f"{v} max rel err vs roll: {rel:.2e}", flush=True)
        timed(v, f, (x, fold_c))
    except Exception as e:
        print(f"{v} FAILED: {type(e).__name__}: {str(e)[:150]}", flush=True)
