"""Mosaic in-kernel gather probe: can a Pallas TPU kernel gather dynamic
rows from a VMEM-resident (N, D) table, and how fast?

Variants:
  take     — jnp.take(x_ref[:], idx, axis=0)
  onehot   — one-hot matmul (known-works baseline, FLOP-heavy)
Usage: python scripts_dev/r3_gather_probe.py [variant ...]
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D, T = 10016, 480, 2304   # x table; block lanes (A=32, K=72)
NB = 313                      # number of edge blocks (~NK/T)
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (N, D))
idx = jax.random.randint(jax.random.PRNGKey(1), (NB * T,), 0, N, jnp.int32)

def make_take(interpret=False):
    def kernel(x_ref, idx_ref, out_ref):
        rows = jnp.take(x_ref[:], idx_ref[:], axis=0)
        out_ref[:] = rows
    return pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((N, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB * T, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120*1024*1024),
        interpret=interpret,
    )

def timed(name, fn, args, n1=4, n2=16):
    def loop(n):
        def run(*a):
            def body(acc, _):
                o = fn(*a)
                return acc + o[0, 0] * 1e-30, None
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
    print(f"{name:22s} {best*1e3:7.2f} ms (compile {c:.0f}s)", flush=True)

which = sys.argv[1:] or ["take"]
if "take" in which:
    try:
        f = make_take()
        out = f(x, idx)
        ref = x[idx]
        err = float(jnp.max(jnp.abs(out - ref)))
        print("take maxdiff:", err, flush=True)
        timed("pallas take-gather", f, (x, idx))
    except Exception as e:
        print(f"take FAILED: {type(e).__name__}: {str(e)[:400]}", flush=True)
if "xla" in which:
    g = jax.jit(lambda x, idx: x[idx])
    timed("xla gather", g, (x, idx))
