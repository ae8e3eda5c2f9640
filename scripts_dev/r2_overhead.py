"""Measure non-conv overhead: model fwd+bwd with conv replaced by a stub."""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")

import jax, jax.numpy as jnp
import numpy as np
from sevennet_tpu.model import build_model_spec
from sevennet_tpu.model.model import model_init, model_compute
from sevennet_tpu.md import MDEngine
from sevennet_tpu.md.engine import _graph_from_state
from bench import water_box
import sevennet_tpu.model.model as M

pos, Z, cell = water_box(1000)
spec = build_model_spec({
    "cutoff": 5.0, "channel": 128, "lmax": 2, "is_parity": False,
    "num_convolution_layer": 5,
    "irreps_manual": ["128x0e"] + ["128x0e+64x1e+32x2e"] * 4 + ["128x0e"],
    "weight_nn_hidden_neurons": [64, 64],
    "radial_basis": {"radial_basis_name": "bessel", "bessel_basis_num": 8},
    "cutoff_function": {"cutoff_function_name": "XPLOR", "cutoff_on": 4.5},
    "self_connection_type": "linear", "conv_denominator": 35.0,
    "chemical_species": ["H", "O"], "_edge_chunk": 0, "_remat": False,
    "_conv_custom_vjp": False,
})
params = model_init(jax.random.PRNGKey(0), spec)
engine = MDEngine(spec, params, cell, matmul_precision="default")
state = engine.make_state(pos, Z, temperature=300.0)
spec = engine.spec
graph = _graph_from_state(state, jnp.asarray(cell, jnp.float32))
print("K =", spec.edge_dense_k, flush=True)

def timed(name, fn, *args, iters=6, reps=3):
    def loop(*a):
        def body(acc, _):
            aa = [q.replace(positions=q.positions + 1e-30*acc) if hasattr(q, 'positions')
                  else q for q in a]
            out = fn(*aa)
            return acc + jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32)*1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.), None, length=iters)
        return acc
    f = jax.jit(loop)
    t0 = time.time(); float(f(*args)); c = time.time()-t0
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); float(f(*args)); best = min(best, time.time()-t0)
    print(f"{name:44s} compile {c:4.0f}s  {best/iters*1e3:8.2f} ms/iter", flush=True)

# full model
timed("model_compute fwd+bwd (real conv)", lambda g: model_compute(spec, params, g, compute_stress=False)["forces"], graph)

# stub conv: row-sum of gathered x padded to dim_mid (keeps gather + K-reduce, kills TP+MLP)
orig = M._convolve_dense
def stub(spec_, layer, conv_params, x, edge_emb, sh, edge_src, n_atoms):
    K = spec_.edge_dense_k
    dim_mid = layer.conv.irreps_mid.dim
    xg = x[edge_src.reshape(n_atoms, K)]
    s = (xg * edge_emb.reshape(n_atoms, K, -1).sum(-1, keepdims=True)).sum(1)
    reps = -(-dim_mid // s.shape[-1])
    return jnp.tile(s, (1, reps))[:, :dim_mid] * (sh.sum() * 1e-30 + 1.0)
M._convolve_dense = stub
timed("model fwd+bwd (stub conv, keeps gather)", lambda g: model_compute(spec, params, g, compute_stress=False)["forces"], graph)

# stub conv without gather either
def stub2(spec_, layer, conv_params, x, edge_emb, sh, edge_src, n_atoms):
    dim_mid = layer.conv.irreps_mid.dim
    K = spec_.edge_dense_k
    s = x * edge_emb.reshape(n_atoms, K, -1).sum((1, 2), keepdims=False).reshape(n_atoms, 1)
    reps = -(-dim_mid // s.shape[-1])
    return jnp.tile(s, (1, reps))[:, :dim_mid] * (sh.sum() * 1e-30 + 1.0)
M._convolve_dense = stub2
timed("model fwd+bwd (stub conv, no gather)", lambda g: model_compute(spec, params, g, compute_stress=False)["forces"], graph)
M._convolve_dense = orig
