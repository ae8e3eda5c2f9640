"""Round-4 probe: user-surface single-point latency (VERDICT #6).

Measures the ASE-calculator path end-to-end on the real TPU:
- SevenNetTPUCalculator.calculate() per-call wall time at 3k atoms
  (flagship SevenNet-0 arch, random weights), steady state (same bucket,
  warm compile) — the reference's primary user surface
  (/root/reference/sevenn/calculator.py:20-233);
- per-phase split (host NL / graph build / device call);
- BatchedCalculator throughput on a batch of small systems
  (the TorchSim surface, /root/reference/sevenn/torchsim.py:183-292).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bench import flagship_spec, water_box
from sevennet_tpu.atoms import AtomsLite
from sevennet_tpu.calculator import SevenNetTPUCalculator
from sevennet_tpu.batched import BatchedCalculator
from sevennet_tpu.model.model import model_init


def main():
    n_mol = int(os.environ.get("CALC_MOL", 1000))
    pos, Z, cell = water_box(n_mol)
    n = len(Z)
    spec = flagship_spec(n)
    params = model_init(jax.random.PRNGKey(0), spec)
    calc = SevenNetTPUCalculator(spec, params=params)
    atoms = AtomsLite(positions=pos, numbers=Z, cell=cell, pbc=True)

    print(f"# single-point latency, {n} atoms, device="
          f"{jax.devices()[0].platform}", file=sys.stderr)
    t0 = time.perf_counter()
    res = calc.calculate(atoms)
    print(f"# first call (compile): {time.perf_counter()-t0:.1f} s",
          file=sys.stderr)

    # steady state: jitter positions (same bucket) like an MD driver would
    rng = np.random.default_rng(1)
    times = []
    for i in range(8):
        atoms2 = AtomsLite(
            positions=pos + rng.normal(scale=0.01, size=pos.shape),
            numbers=Z, cell=cell, pbc=True,
        )
        t0 = time.perf_counter()
        res = calc.calculate(atoms2)
        float(res["energy"])
        times.append(time.perf_counter() - t0)
    times = np.array(times[1:]) * 1e3
    print(f"calculator_single_point_ms: median {np.median(times):.1f} "
          f"min {times.min():.1f} max {times.max():.1f}")

    # phase split
    from sevennet_tpu.data.neighborlist import neighbor_list_numpy
    t0 = time.perf_counter()
    neighbor_list_numpy(pos, spec.cutoff, cell, True)
    print(f"phase_nl_ms: {1e3*(time.perf_counter()-t0):.1f}")

    # batched throughput: 32 small systems per call
    small = []
    rng = np.random.default_rng(2)
    for i in range(32):
        p, z, c = water_box(32, seed=i)
        small.append(AtomsLite(positions=p, numbers=z, cell=c, pbc=True))
    bc = BatchedCalculator(spec, params=params)
    bc.calculate(small)  # compile
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = bc.calculate(small)
    dt = (time.perf_counter() - t0) / reps
    n_at = sum(len(a.numbers) for a in small)
    print(f"batched_32x96atoms_ms_per_call: {1e3*dt:.1f} "
          f"({n_at/dt:.0f} atom-evals/s)")


if __name__ == "__main__":
    main()
