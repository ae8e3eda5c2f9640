"""Probe: can the uvu TP ride the MXU via a per-atom dense (N, K) layout?

Formulation: out[i, p, u] = sum_{k, m} T[i, k*m, p] * XW[i, k*m, u]
 — a batched matmul contracting over (neighbors x m1), replacing both the
per-edge TP einsum AND the segment-sum scatter.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

N, K = 3072, 64
key = jax.random.PRNGKey(0)

def _fetch(out):
    return float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])

def timeit(name, fn, *args, reps=10):
    t0 = time.time(); _fetch(fn(*args)); c = time.time() - t0
    t0 = time.time()
    for _ in range(reps): _fetch(fn(*args))
    print(f"{name}: compile {c:.1f}s run {(time.time()-t0)/reps*1e3:.2f} ms", flush=True)

# dispatch floor
timeit("floor (tiny op)", jax.jit(lambda x: x + 1), jnp.ones((8, 128)))

# 1e-block shape: m=3, p-stack=21 (outputs 0e..3e-ish), u=64
for (m, p, u, tag) in [(3, 21, 64, "1e-block"), (1, 3, 128, "0e-block"), (5, 25, 32, "2e-block")]:
    T = jax.random.normal(key, (N, K * m, p))
    XW = jax.random.normal(key, (N, K * m, u))
    f = jax.jit(lambda T, XW: jnp.einsum("icp,icu->ipu", T, XW))
    flops = 2 * N * K * m * p * u
    t0 = time.time(); _fetch(f(T, XW)); c = time.time() - t0
    t0 = time.time()
    for _ in range(10): _fetch(f(T, XW))
    dt = (time.time() - t0) / 10
    print(f"dense-TP {tag} (m={m},p={p},u={u}): {dt*1e3:.2f} ms, {flops/dt/1e12:.2f} TFLOP/s", flush=True)

# the same work in the flat-edge formulation for comparison (E = N*K)
E = N * K
for (m, p, u, tag) in [(3, 21, 64, "1e-block")]:
    tmp = jax.random.normal(key, (E, m, p))
    xw = jax.random.normal(key, (E, m, u))
    f = jax.jit(lambda t, x: jnp.einsum("emp,emu->epu", t, x))
    flops = 2 * E * m * p * u
    t0 = time.time(); _fetch(f(tmp, xw)); c = time.time() - t0
    t0 = time.time()
    for _ in range(10): _fetch(f(tmp, xw))
    dt = (time.time() - t0) / 10
    print(f"flat-TP {tag}: {dt*1e3:.2f} ms, {flops/dt/1e12:.2f} TFLOP/s", flush=True)

# big-batch matmul reference for peak
a = jax.random.normal(key, (4096, 4096)); b = jax.random.normal(key, (4096, 4096))
f = jax.jit(lambda a, b: a @ b)
t0 = time.time(); _fetch(f(a, b)); _ = time.time() - t0
t0 = time.time()
for _ in range(10): _fetch(f(a, b))
dt = (time.time() - t0) / 10
print(f"matmul 4096^3: {dt*1e3:.2f} ms, {2*4096**3/dt/1e12:.2f} TFLOP/s", flush=True)
