"""Dump optimized HLO of the 10k MD step and summarize the big fusions.

Usage: python scripts_dev/r4_hlo_dump.py [n_mol]
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
pos, Z, cell = water_box(n_mol)
spec = flagship_spec(len(Z))
params = model_init(jax.random.PRNGKey(0), spec)
eng = MDEngine(spec, params, cell, matmul_precision="default")
st = eng.make_state(pos, Z, temperature=300.0)

# compile the same scan bench uses
fn, args = eng._compiled_scan if hasattr(eng, "_compiled_scan") else (None, None)
step = eng._step_fn("nve", 0.01)


def scan3(state):
    state, aux = jax.lax.scan(step, state, None, length=3)
    return state


lowered = jax.jit(scan3).lower(st)
comp = lowered.compile()
txt = comp.as_text()
out = "/tmp/r4_step10k.hlo"
with open(out, "w") as f:
    f.write(txt)
print(f"wrote {len(txt)/1e6:.1f} MB to {out}")

# summarize the named fusions of interest
want = re.compile(
    r"^\s*(ROOT\s+)?%?(fusion\.(13\d\d|12\d\d)|add_add_fusion\.\d+|"
    r"reduce_sum\.6\d\d|divide_multiply_fusion\.\d+|copy\.19\d\d)\b.*$"
)
for line in txt.splitlines():
    m = want.match(line)
    if m:
        print(line.strip()[:400])
