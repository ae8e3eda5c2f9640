"""In-scan timing of the FULL flagship model at bench scale: forward and
forward+grad, remat on/off, dense K sweep."""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from sevennet_tpu.md import MDEngine
from sevennet_tpu.md.neighbor import build_cell_list_spec
from sevennet_tpu.model import build_model_spec
from sevennet_tpu.model.model import model_init, model_compute, model_energy
from sevennet_tpu.data.graph import GraphBatch

N = int(sys.argv[1]) if len(sys.argv) > 1 else 3000

spec0 = build_model_spec({
    "cutoff": 5.0, "channel": 128, "lmax": 2, "is_parity": False,
    "num_convolution_layer": 5,
    "irreps_manual": ["128x0e"] + ["128x0e+64x1e+32x2e"] * 4 + ["128x0e"],
    "cutoff_function": {"cutoff_function_name": "XPLOR", "cutoff_on": 4.5},
    "self_connection_type": "linear", "conv_denominator": 35.0,
    "chemical_species": ["H", "O"],
})
params = model_init(jax.random.PRNGKey(0), spec0)

# bench-like water box
from bench import water_box
pos, Z, cell = water_box(N // 3)
engine = MDEngine(spec0, params, cell, dense=True)
state = engine.make_state(pos, Z)
print(f"n={len(Z)} K={engine.cl_spec.neighbor_capacity} "
      f"edges_cap={state.edge_src.shape[0]}", flush=True)

from sevennet_tpu.md.engine import _graph_from_state
graph = _graph_from_state(state, jnp.asarray(cell, jnp.float32))
spec_dense = engine.spec  # has edge_dense_k set


def timed(name, fn, *args, iters=5):
    # the carry perturbs the positions so the body is NOT loop-invariant
    # (XLA would otherwise hoist the whole model out of the scan)
    def loop(p, g):
        def body(acc, _):
            g2 = g.replace(positions=g.positions + 1e-30 * acc)
            return acc + fn(p, g2), None
        acc, _ = jax.lax.scan(body, 0.0, None, length=iters)
        return acc
    f = jax.jit(loop)
    t0 = time.time(); float(f(*args)); c = time.time() - t0
    t0 = time.time(); float(f(*args))
    per = (time.time() - t0) / iters * 1e3
    print(f"{name}: compile {c:.0f}s, {per:.1f} ms/iter", flush=True)


for tag, sp in [
    ("dense remat", spec_dense),
    ("dense noremat", dataclasses.replace(spec_dense, remat_layers=False)),
]:
    timed(f"{tag} fwd",
          lambda p, g, sp=sp: jnp.sum(model_energy(sp, p, g, g.edge_vectors())["energy"]),
          params, graph)
    timed(f"{tag} fwd+forces",
          lambda p, g, sp=sp: jnp.sum(model_compute(sp, p, g, compute_stress=False)["forces"]),
          params, graph)
