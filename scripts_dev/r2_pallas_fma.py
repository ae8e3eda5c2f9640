"""FMA-throughput probes with enough in-kernel work to beat tunnel noise.

Every fori_loop body is carry-dependent so nothing is hoisted.
Differential scan timing cancels the ~32 ms axon dispatch floor.
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")

import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 1024
REP = 16


def difftime(call, args, n1=50, n2=250):
    def loop(n):
        def run(*a):
            def body(acc, _):
                return acc + call(*a, acc)[0, 0] * 1e-30, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return acc
        return run
    f1 = jax.jit(loop(n1)); f2 = jax.jit(loop(n2))
    float(f1(*args)); float(f2(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.time(); float(f1(*args)); t1 = time.time() - t0
        t0 = time.time(); float(f2(*args)); t2 = time.time() - t0
        best = min(best, (t2 - t1) / (n2 - n1))
    return best


def report(name, fn):
    try:
        print(f"{name}: {fn()}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e).splitlines()[0][:160]}",
              flush=True)


def fma(feat_major, mul, R=133):
    """R broadcast-FMAs, x operand perturbed by carry each rep."""
    if feat_major:
        def kernel(x_ref, t_ref, out_ref):
            xv = x_ref[:]
            def rep(i, acc):
                xi = xv + acc  # carry-dependent
                for r in range(R):
                    acc = acc + xi * t_ref[r % 8, :][None, :]
                return acc * 1e-8
            out_ref[:] = jax.lax.fori_loop(
                0, REP, rep, jnp.zeros((mul, T), jnp.float32))
        xshape, tshape = (mul, T), (8, T)
    else:
        def kernel(x_ref, t_ref, out_ref):
            xv = x_ref[:]
            def rep(i, acc):
                xi = xv + acc
                for r in range(R):
                    acc = acc + xi * t_ref[:, r % 8][:, None]
                return acc * 1e-8
            out_ref[:] = jax.lax.fori_loop(
                0, REP, rep, jnp.zeros((T, mul), jnp.float32))
        xshape, tshape = (T, mul), (T, 8)

    x = jnp.asarray(np.random.randn(*xshape), jnp.float32)
    tm = jnp.asarray(np.random.randn(*tshape), jnp.float32)
    call = lambda x, tm, acc: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(xshape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x + 1e-30 * acc, tm)
    dt = difftime(call, (x, tm))
    flops = mul * T * R * REP * 2
    return f"{dt*1e6:7.0f} us/call {flops/dt/1e12:5.2f} TFLOP/s"


def kreduce(A=8, mul=128):
    K = T // A
    def kernel(x_ref, out_ref):
        xv = x_ref[:]
        def rep(i, acc):
            xi = xv + acc[0, 0]
            return acc + xi.reshape(A, K, mul).sum(axis=1) * 1e-8
        out_ref[:] = jax.lax.fori_loop(
            0, REP, rep, jnp.zeros((A, mul), jnp.float32))
    x = jnp.asarray(np.random.randn(T, mul), jnp.float32)
    call = lambda x, acc: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((A, mul), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x + 1e-30 * acc)
    dt = difftime(call, (x,))
    return f"{dt/REP*1e6:7.2f} us/reduce ({T}x{mul})"


def mm(m, k, n, dtype=jnp.float32):
    def kernel(a_ref, b_ref, out_ref):
        a = a_ref[:]; b = b_ref[:]
        def rep(i, acc):
            ai = a + acc[0:1, 0:1].astype(a.dtype) * 1e-20
            return acc * 0.5 + jnp.dot(
                ai, b, preferred_element_type=jnp.float32)
        out_ref[:] = jax.lax.fori_loop(
            0, REP, rep, jnp.zeros((m, n), jnp.float32))
    a = jnp.asarray(np.random.randn(m, k), dtype)
    b = jnp.asarray(np.random.randn(k, n), dtype)
    call = lambda a, b, acc: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a + (1e-30 * acc).astype(dtype), b)
    dt = difftime(call, (a, b))
    flops = 2 * m * k * n * REP
    return f"{dt*1e6:7.0f} us/call {flops/dt/1e12:5.2f} TFLOP/s"


report("feat-major mul=128", lambda: fma(True, 128))
report("feat-major mul= 64", lambda: fma(True, 64))
report("feat-major mul= 32", lambda: fma(True, 32))
report("edge-major mul=128", lambda: fma(False, 128))
report("edge-major mul= 64", lambda: fma(False, 64))
report("edge-major mul= 32", lambda: fma(False, 32))
report("kreduce A=8 mul=128 ", lambda: kreduce(8, 128))
report("kreduce A=8 mul=3136", lambda: kreduce(8, 3136))
report("mm 1024x64x960      ", lambda: mm(1024, 64, 960))
report("mm 1024x64x960 bf16 ", lambda: mm(1024, 64, 960, jnp.bfloat16))
report("mm 1024x9x185       ", lambda: mm(1024, 9, 185))
