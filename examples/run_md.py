#!/usr/bin/env python
"""Minimal MD example: NVT water with a randomly initialized SevenNet-0-like
model (swap in a trained checkpoint path for real physics).

    python examples/run_md.py [checkpoint]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from sevennet_tpu.md import MDEngine
from sevennet_tpu.model import build_model_spec
from sevennet_tpu.model.model import model_init

if len(sys.argv) > 1:
    from sevennet_tpu.io.native_checkpoint import load_checkpoint

    spec, params, _ = load_checkpoint(sys.argv[1])
else:
    spec = build_model_spec(
        {"cutoff": 4.5, "channel": 16, "lmax": 1, "is_parity": False,
         "num_convolution_layer": 2, "self_connection_type": "linear",
         "chemical_species": ["H", "O"], "conv_denominator": 30.0}
    )
    params = model_init(jax.random.PRNGKey(0), spec)

rng = np.random.default_rng(0)
box = 12.0
n = 96
pos = rng.uniform(0, box, (n, 3))
Z = np.where(np.arange(n) % 3 == 0, 8, 1)
cell = np.eye(3) * box

engine = MDEngine(spec, params, cell)
state = engine.make_state(pos, Z, temperature=300.0)
print(f"initial PE {float(state.potential_energy):+.4f} eV, "
      f"T {float(state.temperature()):.0f} K")
state, (pe, ke) = engine.run(state, 100, dt=0.5, integrator="langevin",
                             temperature=300.0, friction=0.02)
print(f"after 50 fs: PE {float(pe[-1]):+.4f} eV, T {float(state.temperature()):.0f} K")
