#!/usr/bin/env python
"""Distributed MD example: NVE water over a device mesh (1-D slabs or 3-D
bricks). On a CPU host this runs on virtual devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/run_distributed_md.py

On a TPU pod slice the same code shards over the real mesh.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# some environments preset JAX_PLATFORMS via sitecustomize; re-assert the
# user's choice so the virtual CPU device count takes effect
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except RuntimeError:
        pass

import numpy as np
from jax.sharding import Mesh

from sevennet_tpu.model import build_model_spec
from sevennet_tpu.model.model import model_init
from sevennet_tpu.parallel.md import DistributedMDEngine

spec = build_model_spec(
    {"cutoff": 4.5, "channel": 16, "lmax": 1, "is_parity": False,
     "num_convolution_layer": 2, "self_connection_type": "linear",
     "chemical_species": ["H", "O"], "conv_denominator": 30.0}
)
params = model_init(jax.random.PRNGKey(0), spec)

rng = np.random.default_rng(0)
box = 24.0
side = 8                       # jittered cubic lattice (a random gas
n = side ** 3                  # clusters and blows the toy capacities)
grid = (np.stack(np.meshgrid(*[np.arange(side)] * 3,
                             indexing="ij"), -1).reshape(-1, 3) + 0.5)
pos = grid * (box / side) + rng.normal(scale=0.15, size=(n, 3))
Z = np.where(np.arange(n) % 3 == 0, 8, 1)
cell = np.eye(3) * box

n_dev = jax.device_count()
devs = np.array(jax.devices())
if n_dev >= 8:
    mesh = Mesh(devs[:8].reshape(2, 2, 2), ("dx", "dy", "dz"))  # 3-D bricks
elif n_dev >= 2:
    mesh = Mesh(devs[:2], ("dd",))  # 1-D slabs
else:
    raise SystemExit("need >= 2 devices (set xla_force_host_platform_device_count)")

engine = DistributedMDEngine(spec, params, cell, mesh, skin=0.5)
state = engine.make_state(pos, Z, temperature=300.0)
print(f"mesh {mesh.devices.shape}: initial PE {float(state.potential_energy):+.4f} eV")
state, (pe, ke) = engine.run(state, 50, dt=0.2, chunk=25)
tot = np.asarray(pe) + np.asarray(ke)
print(f"after 50 NVE steps: PE {float(pe[-1]):+.4f} eV, "
      f"energy drift {abs(tot[-1]-tot[0]):.2e} eV, "
      f"atoms conserved: {int(np.asarray(state.atom_mask).sum())}/{n}")
