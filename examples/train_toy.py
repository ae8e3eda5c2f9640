#!/usr/bin/env python
"""Minimal training example on a synthetic dataset.

    python examples/train_toy.py
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sevennet_tpu.atoms import AtomsLite
from sevennet_tpu.data.extxyz import write_extxyz
from sevennet_tpu.scripts.train import train_run

rng = np.random.default_rng(0)
frames = []
for _ in range(16):
    n = 8
    pos = rng.uniform(0, 7, (n, 3))
    Z = rng.choice([8, 1], n)
    frames.append(AtomsLite(positions=pos, numbers=Z, cell=np.eye(3) * 7,
                            pbc=True, energy=float(-2.0 * n),
                            forces=rng.normal(size=(n, 3)) * 0.05))
wd = tempfile.mkdtemp(prefix="sevennet_tpu_toy_")
data = os.path.join(wd, "train.extxyz")
write_extxyz(data, frames)

train_run(
    {"cutoff": 4.0, "channel": 8, "lmax": 1, "is_parity": False,
     "num_convolution_layer": 2, "chemical_species": "auto",
     "self_connection_type": "linear", "conv_denominator": "avg_num_neigh",
     "shift": "per_atom_energy_mean", "scale": "force_rms"},
    {"epoch": 5, "optimizer": "adam", "optim_param": {"lr": 0.002}},
    {"batch_size": 4, "load_trainset_path": [data], "ratio": 0.25},
    working_dir=wd,
)
print("artifacts in", wd)
print(open(os.path.join(wd, "lc.csv")).read())
