"""Where does the MD step's non-model time go? Time engine step pieces."""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")

import jax, jax.numpy as jnp
import numpy as np

from sevennet_tpu.model import build_model_spec
from sevennet_tpu.model.model import model_init
from sevennet_tpu.md import MDEngine
from sevennet_tpu.md.integrators import nve_step
from sevennet_tpu.md.neighbor import rebuild_neighbors
from bench import water_box

N_ATOMS = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
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
print(f"K={engine.spec.edge_dense_k}", flush=True)

def timed_scan(name, step, state, iters=10, reps=3):
    def loop(s):
        s, _ = jax.lax.scan(lambda st, _: (step(st), None), s, None, length=iters)
        return s
    f = jax.jit(loop)
    t0 = time.time(); out = f(state); float(out.potential_energy); c = time.time()-t0
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); float(f(state).potential_energy); best = min(best, time.time()-t0)
    print(f"{name:40s} compile {c:5.0f}s  {best/iters*1e3:8.2f} ms/step", flush=True)

cell_j = jnp.asarray(cell, jnp.float32)

# a. full engine step (rebuild-cond + nve)
full = engine._step_fn("nve", 0.01)
timed_scan("full step (cond-rebuild + nve)", lambda s: full(s, None)[0], state)

# b. nve only, no rebuild check
timed_scan("nve only (no rebuild check)", lambda s: nve_step(s, engine._forces, 0.01), state)

# c. rebuild EVERY step (no cond)
def step_rebuild(s):
    s = engine._rebuild(s)
    return nve_step(s, engine._forces, 0.01)
timed_scan("nve + unconditional rebuild", step_rebuild, state, iters=5)

# d. rebuild alone
def reb(s):
    return engine._rebuild(s)
timed_scan("rebuild alone", reb, state, iters=5)
