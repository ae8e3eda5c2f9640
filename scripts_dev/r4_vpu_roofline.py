"""VPU throughput roofline: elementwise fp32 mul-add chains in a Pallas
kernel, VMEM-resident. Tells us the ceiling for the TP phase.

Usage: python scripts_dev/r4_vpu_roofline.py
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, COLS = 128, 2304
ITERS = 64          # mul+add pairs per element per kernel pass
NB = 64             # grid blocks


def kernel(a_ref, b_ref, o_ref):
    a = a_ref[:]
    b = b_ref[:]
    acc = jnp.zeros_like(a)
    for i in range(ITERS):
        acc = acc + a * b        # 2 ops/elem
        a = a + 1e-9             # prevent CSE
    o_ref[:] = acc


f = pl.pallas_call(
    kernel,
    grid=(NB,),
    in_specs=[
        pl.BlockSpec((ROWS, COLS), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ROWS, COLS), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((ROWS, COLS), lambda i: (i, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((NB * ROWS, COLS), jnp.float32),
)

a = jax.random.normal(jax.random.PRNGKey(0), (NB * ROWS, COLS))
b = jax.random.normal(jax.random.PRNGKey(1), (NB * ROWS, COLS))


def timed(reps=8):
    @jax.jit
    def many(a, b):
        def body(c, _):
            o = f(a + c, b)
            return o[0, 0] * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return c
    float(many(a, b))
    t0 = time.perf_counter()
    float(many(a, b))
    dt = (time.perf_counter() - t0) / reps
    ops = NB * ROWS * COLS * ITERS * 3  # mul+add+bump
    print(f"{dt*1e3:.2f} ms/pass -> {ops/dt/1e12:.2f} T VPU ops/s")


timed()
