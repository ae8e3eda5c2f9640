"""Step-cost split at 3k: energy-only forward vs energy+forces, in-scan."""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from bench import water_box
from sevennet_tpu.model import build_model_spec
from sevennet_tpu.model.model import model_init, model_energy, model_compute
from sevennet_tpu.md import MDEngine
from sevennet_tpu.md.engine import _graph_from_state

import sys as _sys
n_mol = int(_sys.argv[1]) if len(_sys.argv) > 1 else 1000
pos, Z, cell = water_box(n_mol)
spec = build_model_spec({
    "cutoff": 5.0, "channel": 128, "lmax": 2, "is_parity": False,
    "num_convolution_layer": 5,
    "irreps_manual": ["128x0e", "128x0e+64x1e+32x2e", "128x0e+64x1e+32x2e",
                      "128x0e+64x1e+32x2e", "128x0e+64x1e+32x2e", "128x0e"],
    "weight_nn_hidden_neurons": [64, 64],
    "radial_basis": {"radial_basis_name": "bessel", "bessel_basis_num": 8},
    "cutoff_function": {"cutoff_function_name": "XPLOR", "cutoff_on": 4.5},
    "self_connection_type": "linear", "conv_denominator": 35.0,
    "chemical_species": ["H", "O"],
    "_edge_chunk": int(__import__("os").environ.get("SPLIT_EDGE_CHUNK", 0)), "_remat": False,
})
params = model_init(jax.random.PRNGKey(0), spec)
eng = MDEngine(spec, params, cell, fused=True, matmul_precision="default")
st = eng.make_state(pos, Z)
graph = _graph_from_state(st, st.cell)
spec_f = eng.spec  # with dense/fused/truncation applied

def time_scan(fn, n=10):
    # carry positions and feed the output back so nothing hoists
    def body(p, _):
        out = fn(graph.replace(positions=p))
        leaf = jax.tree_util.tree_leaves(out)[0]
        return p + 1e-12 * jnp.sum(leaf), jnp.sum(leaf)
    run = jax.jit(
        lambda p: jax.lax.scan(body, p, None, length=n)[1]
    )
    p0 = graph.positions
    float(run(p0)[0])
    t0 = time.time()
    float(run(p0)[-1])
    return (time.time() - t0) / n

with jax.default_matmul_precision("default"):
    e_only = time_scan(lambda g: model_energy(spec_f, params, g, g.edge_vectors())["energy"])
    print(f"energy-only fwd: {e_only*1e3:.1f} ms", flush=True)
    full = time_scan(lambda g: model_compute(spec_f, params, g, compute_stress=False)["forces"])
    print(f"energy+forces:  {full*1e3:.1f} ms (bwd = {1e3*(full-e_only):.1f})", flush=True)
    fulls = time_scan(lambda g: model_compute(spec_f, params, g, compute_stress=True)["forces"])
    print(f"+stress:        {fulls*1e3:.1f} ms", flush=True)
