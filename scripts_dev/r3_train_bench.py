"""Training-step throughput: dense XLA conv vs fused Pallas kernels
(grad-of-grad through _make_bwd_op) on TPU.

SevenNet-0 arch, one batch of water graphs, full E+F(+S) loss, adam.
Usage: python scripts_dev/r3_train_bench.py [n_mol] [mode]
  mode: dense | fused   (default: both)
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")

import dataclasses
import jax
import numpy as np

from bench import water_box
from sevennet_tpu.data import batch_graphs, graph_from_arrays, neighbor_list_numpy
from sevennet_tpu.model import build_model_spec
from sevennet_tpu.model.model import model_init
from sevennet_tpu.train import Trainer, TrainerConfig

n_mol = int(sys.argv[1]) if len(sys.argv) > 1 else 256
modes = sys.argv[2:] or ["dense", "fused"]

cfg = {
    "cutoff": 5.0, "channel": 128, "lmax": 2, "is_parity": False,
    "num_convolution_layer": 5,
    "irreps_manual": ["128x0e", "128x0e+64x1e+32x2e", "128x0e+64x1e+32x2e",
                      "128x0e+64x1e+32x2e", "128x0e+64x1e+32x2e", "128x0e"],
    "weight_nn_hidden_neurons": [64, 64],
    "radial_basis": {"radial_basis_name": "bessel", "bessel_basis_num": 8},
    "cutoff_function": {"cutoff_function_name": "XPLOR", "cutoff_on": 4.5},
    "self_connection_type": "linear",
    "conv_denominator": 35.0,
    "chemical_species": ["H", "O"],
    "_edge_chunk": 0, "_remat": False,
}
spec0 = build_model_spec(cfg)
params = model_init(jax.random.PRNGKey(0), spec0)

pos, Z, cell = water_box(n_mol)
species = spec0.z_to_type[Z]
dst, src, S = neighbor_list_numpy(pos, spec0.cutoff, cell, (True, True, True))
rng = np.random.default_rng(0)
g = graph_from_arrays(
    pos, species, src, dst, S, cell,
    energy=-3.0 * len(Z), forces=rng.normal(size=(len(Z), 3)) * 0.1,
    stress=rng.normal(size=6) * 0.01,
)
n = len(Z)
counts = np.bincount(dst, minlength=n)


def run(mode):
    if mode == "fused":
        from sevennet_tpu.ops.fused_conv import fused_conv_block_atoms

        k = -(-int(counts.max()) // 8) * 8
        A = fused_conv_block_atoms(k)
        n_cap = -(-n // A) * A
        gb = batch_graphs([g], n_atoms_cap=n_cap, dense_k=k, with_mirror=True)
        spec = dataclasses.replace(
            spec0, edge_dense_k=k, conv_fused=True, conv_param_grads=True
        )
        print(f"fused layout K={k} A={A} n_cap={n_cap}", flush=True)
    else:
        k = int(counts.max())
        gb = batch_graphs([g], n_atoms_cap=n, dense_k=k)
        spec = dataclasses.replace(spec0, edge_dense_k=k)
        print(f"dense layout K={k}", flush=True)

    trainer = Trainer(spec, params, TrainerConfig())
    t0 = time.time()
    losses, _ = trainer.train_step(gb)
    print(f"warm (compile) {time.time()-t0:.0f}s loss "
          f"{float(losses['total']):.6f}", flush=True)
    steps = 20
    t0 = time.time()
    for _ in range(steps):
        losses, _ = trainer.train_step(gb)
    float(losses["total"])
    dt = (time.time() - t0) / steps
    print(f"{mode}: {dt*1e3:.1f} ms/train-step "
          f"({n} atoms, {n/dt:.0f} atom-steps/s)", flush=True)


for m in modes:
    run(m)
