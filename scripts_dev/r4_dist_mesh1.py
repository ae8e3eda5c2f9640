"""Round-4 probe (VERDICT #5): DistributedMDEngine on a mesh=(1,) of the
single real TPU chip — the only distributed perf datapoint measurable in
this environment. Reports step time + ghost/packing overhead vs the serial
MDEngine at the same size.

Usage: python scripts_dev/r4_dist_mesh1.py [n_mol] [steps]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
from jax.sharding import Mesh

from bench import water_box, flagship_spec
from sevennet_tpu.md import MDEngine
from sevennet_tpu.model.model import model_init
from sevennet_tpu.parallel.md import DistributedMDEngine


def time_run(eng, st, steps, chunk):
    st, _ = eng.run(st, chunk, dt=0.01, chunk=chunk)  # compile+warm
    float(st.potential_energy)
    t0 = time.perf_counter()
    st, _ = eng.run(st, steps, dt=0.01, chunk=chunk)
    float(st.potential_energy)
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    n_mol = int(sys.argv[1]) if len(sys.argv) > 1 else 3333
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    chunk = max(1, steps // 2)
    pos, Z, cell = water_box(n_mol)
    n = len(Z)
    spec = flagship_spec(n)
    params = model_init(jax.random.PRNGKey(0), spec)
    dev = jax.devices()[0]
    print(f"# {n} atoms on {dev.platform}", file=sys.stderr)

    serial = MDEngine(spec, params, cell)
    st = serial.make_state(pos, Z, temperature=300.0)
    ms_serial = time_run(serial, st, steps, chunk)
    print(f"serial_ms_per_step: {ms_serial:.1f}")

    mesh = Mesh(np.array([dev]), axis_names=("dd",))
    dist = DistributedMDEngine(spec, params, cell, mesh, skin=0.4)
    dst = dist.make_state(pos, Z, temperature=300.0, seed=0)
    ms_dist = time_run(dist, dst, steps, chunk)
    print(f"distributed_mesh1_ms_per_step: {ms_dist:.1f} "
          f"(fused={dist.fused})")
    print(f"ghost_overhead: {ms_dist / ms_serial:.2f}x")


if __name__ == "__main__":
    main()
