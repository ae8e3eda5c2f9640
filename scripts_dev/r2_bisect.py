"""Bisect: why is forces-in-nve-scan 287ms but forces-standalone 79ms?"""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")

import jax, jax.numpy as jnp
import numpy as np

from sevennet_tpu.model import build_model_spec
from sevennet_tpu.model.model import model_init, model_compute
from sevennet_tpu.md import MDEngine
from sevennet_tpu.md.engine import _graph_from_state
from bench import water_box

N_ATOMS = 3000
pos, Z, cell = water_box(N_ATOMS // 3)
spec = build_model_spec({
    "cutoff": 5.0, "channel": 128, "lmax": 2, "is_parity": False,
    "num_convolution_layer": 5,
    "irreps_manual": ["128x0e"] + ["128x0e+64x1e+32x2e"] * 4 + ["128x0e"],
    "weight_nn_hidden_neurons": [64, 64],
    "radial_basis": {"radial_basis_name": "bessel", "bessel_basis_num": 8},
    "cutoff_function": {"cutoff_function_name": "XPLOR", "cutoff_on": 4.5},
    "self_connection_type": "linear", "conv_denominator": 35.0,
    "chemical_species": ["H", "O"], "_edge_chunk": 0, "_remat": False,
})
params = model_init(jax.random.PRNGKey(0), spec)
engine = MDEngine(spec, params, cell, matmul_precision="default")
state = engine.make_state(pos, Z, temperature=300.0)
spec = engine.spec
cell_j = jnp.asarray(cell, jnp.float32)
graph = _graph_from_state(state, cell_j)
print("pos dtype:", state.positions.dtype, "shift dtype:", state.edge_shift.dtype, flush=True)

def timed(name, make_loop, iters=6, reps=3):
    f = jax.jit(make_loop(iters))
    t0 = time.time(); float(f()); c = time.time()-t0
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); float(f()); best = min(best, time.time()-t0)
    print(f"{name:52s} compile {c:4.0f}s  {best/iters*1e3:8.2f} ms/iter", flush=True)

# A. probe-style: perturb graph positions by acc, model_compute
def mkA(iters):
    def loop():
        def body(acc, _):
            g = graph.replace(positions=graph.positions + 1e-30*acc) if hasattr(graph,'replace') else graph
            out = model_compute(spec, params, g, compute_stress=False)
            return acc + out["forces"].sum()*1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.), None, length=iters)
        return acc
    return loop

# B. carry positions as scan state, update by tiny force step
def mkB(iters):
    def loop():
        def body(p, _):
            g = graph.replace(positions=p)
            out = model_compute(spec, params, g, compute_stress=False)
            return p + 1e-9*out["forces"], None
        pfin, _ = jax.lax.scan(body, graph.positions, None, length=iters)
        return pfin.sum()
    return loop

# C. carry positions, call engine._forces via state replace
def mkC(iters):
    def loop():
        def body(p, _):
            s = state.replace(positions=p)
            f, e = engine._forces(s)
            return p + 1e-9*f, None
        pfin, _ = jax.lax.scan(body, state.positions, None, length=iters)
        return pfin.sum()
    return loop

# D. carry the whole MDState, forces only
def mkD(iters):
    def loop():
        def body(s, _):
            f, e = engine._forces(s)
            return s.replace(positions=s.positions + 1e-9*f), None
        sfin, _ = jax.lax.scan(body, state, None, length=iters)
        return sfin.positions.sum()
    return loop

try:
    import dataclasses
    if not hasattr(graph, 'replace'):
        graph.replace = None
except Exception:
    pass

timed("A perturbed-const graph", mkA)
timed("B carry positions", mkB)
timed("C carry positions via state", mkC)
timed("D carry full MDState", mkD)
