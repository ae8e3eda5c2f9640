"""Throughput of batched small matmuls (the MXU-TP formulation) on v5e.

Per atom i and path group g: Y_i = S_i (d3, K*d1) @ XW_i (K*d1, mul).
SevenNet-0 fwd shapes at K=72:
  g0: (9, 72)  @ (72, 128)
  g1: (20, 216) @ (216, 64)
  g2: (22, 360) @ (360, 32)

Variants:
  xla      XLA-level dot_general with leading batch dim N
  pallas   in-kernel batched dot per A-atom block
  pallasf  in-kernel, batch folded into M: (A*d3, K*d1) @ block-shared? --
           invalid math, measured only as an MXU upper bound for the shape

Usage: python scripts_dev/r4_batched_dot_probe.py [variant ...]
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 10016
A = 32
GROUPS = [(9, 72, 128), (20, 216, 64), (22, 360, 32)]
HI = dict(precision=jax.lax.Precision.HIGHEST,
          preferred_element_type=jnp.float32)

useful = sum(d3 * kk * mul * 2 for d3, kk, mul in GROUPS) * N
print(f"useful flops/layer: {useful/1e9:.1f} G", flush=True)


def timed(name, fn, args, reps=10):
    @jax.jit
    def many(*a):
        def body(c, _):
            outs = fn(jax.tree.map(lambda x: x + c * 1e-30, a))
            s = sum(jnp.sum(o[..., :1, :1]) for o in outs)
            return s * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return c
    t0 = time.time(); float(many(*args)); comp = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); float(many(*args))
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:10s} {best*1e3:7.2f} ms/layer -> {useful/best/1e12:5.1f}"
          f" useful TF/s (compile {comp:.0f}s)", flush=True)


key = jax.random.PRNGKey(0)
Ss = [jax.random.normal(jax.random.fold_in(key, i), (N, d3, kk)) * 0.1
      for i, (d3, kk, mul) in enumerate(GROUPS)]
XWs = [jax.random.normal(jax.random.fold_in(key, 10 + i), (N, kk, mul)) * 0.1
       for i, (d3, kk, mul) in enumerate(GROUPS)]


def xla_fn(args):
    Ss, XWs = args[:3], args[3:]
    return [
        jax.lax.dot_general(S, XW, (((2,), (1,)), ((0,), (0,))), **HI)
        for S, XW in zip(Ss, XWs)
    ]


def make_pallas():
    NB = N // A

    def kernel(*refs):
        ins = refs[: 2 * len(GROUPS)]
        outs = refs[2 * len(GROUPS):]
        for gi, (d3, kk, mul) in enumerate(GROUPS):
            S = ins[gi][:]           # (A, d3, kk)
            XW = ins[len(GROUPS) + gi][:]  # (A, kk, mul)
            Y = jax.lax.dot_general(
                S, XW, (((2,), (1,)), ((0,), (0,))), **HI
            )
            outs[gi][:] = Y

    in_specs = []
    for d3, kk, mul in GROUPS:
        in_specs.append(pl.BlockSpec((A, d3, kk), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    for d3, kk, mul in GROUPS:
        in_specs.append(pl.BlockSpec((A, kk, mul), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    out_specs = [
        pl.BlockSpec((A, d3, mul), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        for d3, kk, mul in GROUPS
    ]
    f = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((N, d3, mul), jnp.float32)
                   for d3, kk, mul in GROUPS],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )

    def fn(args):
        return list(f(*args))
    return fn


if __name__ == "__main__":
    variants = sys.argv[1:] or ["xla", "pallas"]
    for v in variants:
        try:
            if v == "xla":
                timed(v, xla_fn, (*Ss, *XWs))
            elif v == "pallas":
                timed(v, make_pallas(), (*Ss, *XWs))
        except Exception as e:
            print(f"{v} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
