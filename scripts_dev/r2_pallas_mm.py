"""Isolate the in-kernel matmul compile crash + measure matmul TFLOP/s."""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")

import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def mm(m, k, n, dtype=jnp.float32, rep=REP):
    def kernel(a_ref, b_ref, s_ref, out_ref):
        b = b_ref[:]
        def body(i, acc):
            # perturb a by the loop index via s_ref scalar (carry-dependent
            # through no hoistable structure)
            ai = a_ref[:] * (1.0 + s_ref[0, 0] * i.astype(jnp.float32)
                             ).astype(a_ref.dtype)
            return acc * 0.5 + jnp.dot(ai, b, preferred_element_type=jnp.float32)
        out_ref[:] = jax.lax.fori_loop(
            0, rep, body, jnp.zeros((m, n), jnp.float32))
    a = jnp.asarray(np.random.randn(m, k), dtype)
    b = jnp.asarray(np.random.randn(k, n), dtype)
    s = jnp.zeros((1, 1), jnp.float32)
    call = lambda a, b, acc: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b, s + 1e-30 * acc)
    dt = difftime(call, (a, b))
    flops = 2 * m * k * n * rep
    return f"{dt*1e6:7.0f} us/call {flops/dt/1e12:6.2f} TFLOP/s"


def transpose(m, n):
    def kernel(a_ref, s_ref, out_ref):
        def body(i, acc):
            ai = a_ref[:] * (1.0 + s_ref[0, 0] * i.astype(jnp.float32))
            return acc * 0.5 + ai.T
        out_ref[:] = jax.lax.fori_loop(
            0, REP, body, jnp.zeros((n, m), jnp.float32))
    a = jnp.asarray(np.random.randn(m, n), jnp.float32)
    s = jnp.zeros((1, 1), jnp.float32)
    call = lambda a, acc: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a + 1e-30 * acc, s)
    dt = difftime(call, (a,))
    return f"{dt/REP*1e6:7.2f} us/transpose ({m}x{n})"


def lanereduce(rows, K=128, A=8):
    """(rows, A*K) -> (rows, A): sum K consecutive lanes, via reshape+sum."""
    T = A * K
    def kernel(a_ref, s_ref, out_ref):
        def body(i, acc):
            ai = a_ref[:] * (1.0 + s_ref[0, 0] * i.astype(jnp.float32))
            return acc * 0.5 + ai.reshape(rows, A, K).sum(axis=2)
        out_ref[:] = jax.lax.fori_loop(
            0, REP, body, jnp.zeros((rows, A), jnp.float32))
    a = jnp.asarray(np.random.randn(rows, T), jnp.float32)
    s = jnp.zeros((1, 1), jnp.float32)
    call = lambda a, acc: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, A), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a + 1e-30 * acc, s)
    dt = difftime(call, (a,))
    return f"{dt/REP*1e6:7.2f} us/reduce ({rows}x{T})"


def subreduce(T=1024, mul=128, A=8):
    """(A*K, mul) -> (A, mul): sublane-group reduce."""
    K = T // A
    def kernel(a_ref, s_ref, out_ref):
        def body(i, acc):
            ai = a_ref[:] * (1.0 + s_ref[0, 0] * i.astype(jnp.float32))
            return acc * 0.5 + ai.reshape(A, K, mul).sum(axis=1)
        out_ref[:] = jax.lax.fori_loop(
            0, REP, body, jnp.zeros((A, mul), jnp.float32))
    a = jnp.asarray(np.random.randn(T, mul), jnp.float32)
    s = jnp.zeros((1, 1), jnp.float32)
    call = lambda a, acc: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((A, mul), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a + 1e-30 * acc, s)
    dt = difftime(call, (a,))
    return f"{dt/REP*1e6:7.2f} us/reduce ({T}x{mul})"


report("mm 1024x64x960 f32", lambda: mm(1024, 64, 960))
report("mm 1024x64x960 bf16", lambda: mm(1024, 64, 960, jnp.bfloat16))
report("mm 960x64x1024 f32 (featmaj mlp)", lambda: mm(960, 64, 1024))
report("mm 1024x9x185  f32", lambda: mm(1024, 9, 185))
report("mm 185x9x1024  f32", lambda: mm(185, 16, 1024))
report("mm 480x512x1024 f32 (onehot gather)", lambda: mm(480, 512, 1024))
report("mm 1024x512x480 f32 (onehot gather em)", lambda: mm(1024, 512, 480))
report("transpose 1024x480", lambda: transpose(1024, 480))
report("transpose 1024x960", lambda: transpose(1024, 960))
report("lanereduce 128 rows", lambda: lanereduce(128))
report("lanereduce 960 rows", lambda: lanereduce(960))
report("subreduce  mul=128 ", lambda: subreduce(1024, 128))
report("subreduce  mul=960 ", lambda: subreduce(1024, 960))
