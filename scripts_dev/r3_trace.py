"""Capture a profiler trace of N MD steps at a given size; aggregate op durations.

Usage: python scripts_dev/r3_trace.py [n_mol] [steps]
"""
import sys, os, time, json, gzip, glob, collections
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")
import jax
import numpy as np
from bench import water_box, flagship_spec
from sevennet_tpu.model.model import model_init
from sevennet_tpu.md import MDEngine

n_mol = int(sys.argv[1]) if len(sys.argv) > 1 else 3333
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
logdir = "/tmp/r3_trace"
os.system(f"rm -rf {logdir}")

pos, Z, cell = water_box(n_mol)
spec = flagship_spec(len(Z))
params = model_init(jax.random.PRNGKey(0), spec)
eng = MDEngine(spec, params, cell, matmul_precision="default")
st = eng.make_state(pos, Z, temperature=300.0)
st, _ = eng.run(st, steps, dt=0.01, chunk=steps)  # compile
float(st.potential_energy)

jax.profiler.start_trace(logdir)
st, _ = eng.run(st, steps, dt=0.01, chunk=steps)
float(st.potential_energy)
jax.profiler.stop_trace()

files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", files, flush=True)
agg = collections.Counter()
total = 0
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pidname = ev.get("pid")
        name = ev.get("name", "")
        dur = ev.get("dur", 0)
        args = ev.get("args", {}) or {}
        # keep device-side compute events only (TensorCore lanes)
        cat = args.get("device_type", "")
        agg[(name.split(".")[0][:60])] += dur
        total += dur
for (name,), dur in []:
    pass
top = agg.most_common(40)
print(f"total accounted: {total/1e3:.1f} ms over {steps} steps")
for name, dur in top:
    print(f"{dur/1e3/steps:9.3f} ms/step  {name}")
