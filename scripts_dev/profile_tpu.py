"""Profile flagship model pieces on the TPU: forward, forward+grad, MD step.

Run: python scripts_dev/profile_tpu.py [n_atoms]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from sevennet_tpu.model import build_model_spec
from sevennet_tpu.model.model import model_init, model_compute, model_energy
from sevennet_tpu.data import batch_graphs, graph_from_arrays, neighbor_list_numpy

N = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
EDGE_CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 16384

print("device:", jax.devices()[0].device_kind, flush=True)

spec = build_model_spec({
    "cutoff": 5.0, "channel": 128, "lmax": 2, "is_parity": False,
    "num_convolution_layer": 5,
    "irreps_manual": ["128x0e"] + ["128x0e+64x1e+32x2e"] * 4 + ["128x0e"],
    "cutoff_function": {"cutoff_function_name": "XPLOR", "cutoff_on": 4.5},
    "self_connection_type": "linear", "conv_denominator": 35.0,
    "chemical_species": ["H", "O"], "_edge_chunk": EDGE_CHUNK,
})
params = model_init(jax.random.PRNGKey(0), spec)

# water-density box
vol = N * 10.0  # ~0.1 atoms/A^3
box = vol ** (1 / 3)
rng = np.random.default_rng(0)
pos = rng.uniform(0, box, (N, 3))
Z = np.where(np.arange(N) % 3 == 0, 8, 1)
cell = np.eye(3) * box
t0 = time.time()
dst, src, S = neighbor_list_numpy(pos, 5.0, cell, True)
print(f"host NL: {time.time()-t0:.2f}s, {len(dst)} edges", flush=True)
e_cap = int(len(dst) * 1.15) // 256 * 256 + 256
gb = batch_graphs([graph_from_arrays(pos, spec.z_to_type[Z], src, dst, S, cell)],
                  n_atoms_cap=(N // 256 + 1) * 256, n_edges_cap=e_cap)

def _fetch(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])

def timeit(name, fn, *args, reps=5):
    t0 = time.time()
    out = fn(*args)
    _fetch(out)
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        _fetch(fn(*args))
    run_t = (time.time() - t0) / reps
    print(f"{name}: compile {compile_t:.1f}s, run {run_t*1e3:.1f} ms", flush=True)
    return out

# energy only
f_e = jax.jit(lambda p, g: model_energy(spec, p, g, g.edge_vectors())["energy"])
timeit("energy fwd", f_e, params, gb)

# energy + forces
f_c = jax.jit(lambda p, g: model_compute(spec, p, g, compute_stress=False)["forces"])
timeit("energy+forces", f_c, params, gb)

# with stress
f_s = jax.jit(lambda p, g: model_compute(spec, p, g, compute_stress=True)["stress"])
timeit("energy+forces+stress", f_s, params, gb)

# training step (double backward)
from sevennet_tpu.train.loss import LossConfig, compute_losses

cfg = LossConfig()

def loss(p, g):
    out = model_compute(spec, p, g)
    return compute_losses(out, g, cfg)[0]

f_g = jax.jit(jax.grad(loss))
timeit("train grad (double bwd)", f_g, params, gb, reps=3)
