"""Round-2 perf breakdown: where do 292 ms/step go at 3k atoms?

Times each piece of the MD step in-scan (amortizing the ~32 ms tunnel
dispatch floor), with an accumulator-perturbation guard against XLA
hoisting loop-invariant work.
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")

import jax, jax.numpy as jnp
import numpy as np

from sevennet_tpu.model import build_model_spec
from sevennet_tpu.model.model import model_init, model_compute, model_energy, _convolve_dense
from sevennet_tpu.md import MDEngine
from sevennet_tpu.ops.mlp import scalar_mlp_apply
from sevennet_tpu.ops.radial import bessel_basis, xplor_cutoff
from sevennet_tpu.so3.spherical import spherical_harmonics

N_ATOMS = int(sys.argv[1]) if len(sys.argv) > 1 else 3000

sys.path.insert(0, "/root/repo")
from bench import water_box

pos, Z, cell = water_box(N_ATOMS // 3)
spec = build_model_spec({
    "cutoff": 5.0, "channel": 128, "lmax": 2, "is_parity": False,
    "num_convolution_layer": 5,
    "irreps_manual": ["128x0e"] + ["128x0e+64x1e+32x2e"] * 4 + ["128x0e"],
    "weight_nn_hidden_neurons": [64, 64],
    "radial_basis": {"radial_basis_name": "bessel", "bessel_basis_num": 8},
    "cutoff_function": {"cutoff_function_name": "XPLOR", "cutoff_on": 4.5},
    "self_connection_type": "linear", "conv_denominator": 35.0,
    "chemical_species": ["H", "O"],
    "_edge_chunk": 0, "_remat": False,
})
params = model_init(jax.random.PRNGKey(0), spec)
engine = MDEngine(spec, params, cell, matmul_precision="default")
state = engine.make_state(pos, Z, temperature=300.0)
spec = engine.spec  # edge_dense_k now set
K = spec.edge_dense_k
N = state.n_atoms_cap
print(f"N={N} K={K} device={jax.devices()[0].device_kind}", flush=True)

from sevennet_tpu.md.engine import _graph_from_state
cell_j = jnp.asarray(cell, jnp.float32)
graph = _graph_from_state(state, cell_j)

def timed(name, fn, *args, iters=8, reps=3):
    """fn(*args) -> scalar-reducible pytree; runs iters times inside a scan."""
    def loop(*a):
        def body(acc, _):
            # perturb the first float arg by acc so the body can't be hoisted
            aa = [q + 1e-30 * acc if hasattr(q, 'dtype') and q.dtype in (jnp.float32, jnp.bfloat16) else q for q in a]
            out = fn(*aa)
            leaf = jax.tree.leaves(out)[0]
            return acc + jnp.sum(leaf).astype(jnp.float32) * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return acc
    f = jax.jit(loop)
    t0 = time.time(); float(f(*args)); c = time.time() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); float(f(*args)); best = min(best, time.time() - t0)
    print(f"{name:42s} compile {c:5.0f}s  {best/iters*1e3:8.2f} ms/iter", flush=True)

# dense-layout edge arrays (as model sees them)
ev = graph.edge_vectors()
r = jnp.linalg.norm(jnp.where(graph.edge_mask[:, None], ev, jnp.array([1.,0.,0.])), axis=-1)
basis = bessel_basis(r, params["edge_embedding"]["bessel_coeffs"], spec.cutoff)
env = xplor_cutoff(r, spec.cutoff, 4.5)
edge_emb = basis * (env * graph.edge_mask.astype(jnp.float32))[:, None]
sh = spherical_harmonics(2, jnp.where(graph.edge_mask[:, None], ev, jnp.array([1.,0.,0.])))
x0 = jax.random.normal(jax.random.PRNGKey(1), (N, 480)) * 0.5

layer = spec.layers[1]  # full-width layer
cp = params["t1_convolution"] if "t1_convolution" in params else params[f"{layer.t}_convolution"]

# 1. full MD force call (fwd+bwd, all layers)
timed("model_compute fwd+bwd (forces)", lambda p, g: model_compute(spec, p, g, compute_stress=False)["forces"], params, graph, iters=4)
# 2. energy fwd only
timed("model_energy fwd", lambda p, g: model_energy(spec, p, g, g.edge_vectors())["energy"], params, graph, iters=4)
# 3. one dense conv layer (incl radial MLP), fwd
conv_fwd = lambda x, emb, s: _convolve_dense(spec, layer, cp, x, emb, s, graph.edge_src, N)
timed("conv layer fwd (dense, incl MLP)", conv_fwd, x0, edge_emb, sh)
# 4. one dense conv layer fwd+bwd wrt x
conv_g = jax.grad(lambda x, emb, s: conv_fwd(x, emb, s).sum(), argnums=(0, 1, 2))
timed("conv layer fwd+bwd (x,emb,sh)", conv_g, x0, edge_emb, sh)
# 5. gather only
src_nk = graph.edge_src.reshape(N, K)
timed("gather x[src] fp32", lambda x: x[src_nk], x0)
timed("gather x[src] bf16", lambda x: x.astype(jnp.bfloat16)[src_nk], x0)
# 6. radial MLP only over (N*K, 8)
timed("radial MLP (E,8)->(E,960)", lambda e: scalar_mlp_apply(layer.radial_mlp, cp["weight_nn"], e.reshape(N, K, -1)), edge_emb)
# 7. sh over (E,3)
timed("spherical harmonics lmax2", lambda v: spherical_harmonics(2, v), ev)
# 8. scatter-add backward of gather (the thing mirror-bwd eliminates)
ct = jax.random.normal(jax.random.PRNGKey(2), (N, K, 480)) * 0.1
def scat(x, ct):
    _, vjp = jax.vjp(lambda xx: xx[src_nk], x)
    return vjp(ct)[0]
timed("gather-transpose scatter-add", scat, x0, ct)
