"""100k ring-vs-scatter backward probe: engine config + step time.

Usage: python scripts_dev/r3_ring_probe.py [n_mol] [ring0|ring1|both]
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")

import numpy as np

n_mol = int(sys.argv[1]) if len(sys.argv) > 1 else 33333
modes = sys.argv[2:] or ["ring1", "ring0"]

from bench import water_box, flagship_spec
from sevennet_tpu.model.model import model_init
from sevennet_tpu.md import MDEngine
import jax

pos, Z, cell = water_box(n_mol)
n = len(Z)
spec = flagship_spec(n)
params = model_init(jax.random.PRNGKey(0), spec)


def run(ring):
    os.environ["SEVENNET_TPU_RING"] = "1" if ring else "0"
    eng = MDEngine(spec, params, cell, matmul_precision="default")
    t0 = time.time()
    st = eng.make_state(pos, Z, temperature=300.0)
    print(f"[ring={ring}] make_state {time.time()-t0:.1f}s  "
          f"k_model={eng.k_model} row_chunk={eng.row_chunk} "
          f"ring_nb={getattr(eng, '_ring_nb', '?')} "
          f"window={getattr(eng, '_ring_window', '?')} "
          f"n_cap={st.positions.shape[0]}", flush=True)
    t0 = time.time()
    st, _ = eng.run(st, 3, dt=0.01, chunk=3)
    float(st.potential_energy)
    print(f"[ring={ring}] warm(compile) {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    st, _ = eng.run(st, 6, dt=0.01, chunk=3)
    float(st.potential_energy)
    dt = (time.time() - t0) / 6
    print(f"[ring={ring}] {dt*1e3:.0f} ms/step ({n/dt:.0f} atom-steps/s)",
          flush=True)


for m in modes:
    run(m == "ring1")
