"""Dump optimized HLO of the exact MD scan the bench runs (engine
_run_cache program) and summarize the biggest non-kernel fusions.

Usage: python scripts_dev/r4_hlo_dump.py [n_mol] [chunk]
Writes /tmp/r4_step.hlo and prints a size/ops summary of named fusions.
"""
import sys, os, re
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")
import jax
import numpy as np
from bench import water_box, flagship_spec
from sevennet_tpu.model.model import model_init
from sevennet_tpu.md import MDEngine

n_mol = int(sys.argv[1]) if len(sys.argv) > 1 else 3333
chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 20
pos, Z, cell = water_box(n_mol)
spec = flagship_spec(len(Z))
params = model_init(jax.random.PRNGKey(0), spec)
eng = MDEngine(spec, params, cell, matmul_precision="default")
st = eng.make_state(pos, Z, temperature=300.0)

# warm exactly like the bench (fills _run_cache with the timed program)
st, _ = eng.run(st, chunk, dt=0.01, integrator="nve", chunk=chunk)
(key, jitted), = list(eng._run_cache.items())
txt = jitted.lower(st).compile().as_text()
out = "/tmp/r4_step.hlo"
with open(out, "w") as f:
    f.write(txt)
print(f"wrote {len(txt)/1e6:.1f} MB to {out}")

# print every fusion/reduce/copy computation header with its output shape
pat = re.compile(r"^\s*(ROOT )?%?((fusion|reduce_sum|copy|add_add_fusion|"
                 r"add_multiply_fusion|divide_multiply_fusion|"
                 r"broadcast_multiply_fusion|transpose)[.\w]*) = (\S+)")
sizes = []
for line in txt.splitlines():
    m = pat.match(line)
    if m:
        sizes.append((m.group(2), m.group(4), line.strip()[:260]))
for name, shape, line in sizes:
    print(f"{name:40s} {shape}")
