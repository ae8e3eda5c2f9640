"""Probe Mosaic capabilities on the axon v5e that decide the round-2 fused
conv kernel design:

  P1  lane-dim dynamic gather in-kernel (take_along_axis, idx bcast on rows)
  P2  sublane-dim dynamic gather (take_along_axis on axis 0)
  P3  sublane broadcast FMA throughput in feat-major (feat, T) layout
  P4  edge-major (T, feat) FMA throughput with (T,1) lane broadcasts

Timing: differential between scan lengths to cancel the ~32 ms axon
dispatch floor.
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")

import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 512     # window atoms
T = 1024    # edges per block
DX = 480


def report(name, fn):
    try:
        r = fn()
        print(f"{name}: OK {r}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


def difftime(f, args, n1=40, n2=240):
    """f(args, length) -> scalar-returning jitted fn; returns sec/iter."""
    f1 = jax.jit(lambda *a: f(*a, n1))
    f2 = jax.jit(lambda *a: f(*a, n2))
    float(f1(*args)); float(f2(*args))
    t1 = min(time.time() - t0 for t0 in [time.time()] if float(f1(*args)) is not None or True)
    # do it properly
    t0 = time.time(); float(f1(*args)); t1 = time.time() - t0
    t0 = time.time(); float(f2(*args)); t2 = time.time() - t0
    return (t2 - t1) / (n2 - n1)


# ---------- P1: lane gather via take_along_axis ----------
def p1():
    def kernel(tbl_ref, idx_ref, out_ref):
        idx = jnp.broadcast_to(idx_ref[0:1, :], (DX, T))
        out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx, axis=1)

    tbl = jnp.asarray(np.random.randn(DX, W), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, W, (1, T)), jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((DX, T), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl, idx)
    ref = jnp.take(tbl, idx[0], axis=1)
    err = float(jnp.max(jnp.abs(out - ref)))

    # throughput: gather a (DX, T) block per iter
    def loop(tbl, idx, n):
        def body(acc, _):
            o = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((DX, T), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tbl + 1e-30 * acc, idx)
            return acc + o[0, 0] * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return acc
    dt = difftime(loop, (tbl, idx))
    gb = DX * T * 4 / 1e9
    return f"err {err:.1e}, {dt*1e6:.0f} us/blk, {gb/dt:.0f} GB/s"


# ---------- P2: sublane gather ----------
def p2():
    def kernel(tbl_ref, idx_ref, out_ref):
        idx = jnp.broadcast_to(idx_ref[:, 0:1], (T, DX))
        out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx, axis=0)

    tbl = jnp.asarray(np.random.randn(W, DX), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, W, (T, 1)), jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, DX), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl, idx)
    ref = jnp.take(tbl, idx[:, 0], axis=0)
    return f"err {float(jnp.max(jnp.abs(out - ref))):.1e}"


# ---------- P3/P4: FMA throughput ----------
def fma_probe(feat_major: bool):
    MUL, R = 64, 133  # 8512 FMA elements per edge equivalent

    if feat_major:
        def kernel(x_ref, t_ref, out_ref):
            acc = jnp.zeros((MUL, T), jnp.float32)
            xv = x_ref[:]
            for r in range(R):
                row = t_ref[r % 8, :][None, :]
                acc = acc + xv * row
            out_ref[:] = acc
        xshape, tshape = (MUL, T), (8, T)
    else:
        def kernel(x_ref, t_ref, out_ref):
            acc = jnp.zeros((T, MUL), jnp.float32)
            xv = x_ref[:]
            for r in range(R):
                col = t_ref[:, r % 8][:, None]
                acc = acc + xv * col
            out_ref[:] = acc
        xshape, tshape = (T, MUL), (T, 8)

    x = jnp.asarray(np.random.randn(*xshape), jnp.float32)
    tm = jnp.asarray(np.random.randn(*tshape), jnp.float32)
    call = lambda x, tm: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(xshape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, tm)

    def loop(x, tm, n):
        def body(acc, _):
            return acc + call(x + 1e-30 * acc, tm)[0, 0] * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return acc

    dt = difftime(loop, (x, tm))
    flops = MUL * T * R * 2
    return f"{dt*1e6:.0f} us/call, {flops/dt/1e12:.2f} TFLOP/s"


report("P1 lane gather   ", p1)
report("P2 sublane gather", p2)
report("P3 feat-major FMA", lambda: fma_probe(True))
report("P4 edge-major FMA", lambda: fma_probe(False))
