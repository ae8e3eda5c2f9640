"""Fused-kernel MD on the real TPU: numerics vs the XLA dense path +
step timing at 3k atoms (SevenNet-0 arch)."""
import sys, time, os
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sevennet_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from bench import water_box
from sevennet_tpu.model import build_model_spec
from sevennet_tpu.model.model import model_init
from sevennet_tpu.md import MDEngine

n = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 40
pos, Z, cell = water_box(n // 3)
spec = build_model_spec({
    "cutoff": 5.0, "channel": 128, "lmax": 2, "is_parity": False,
    "num_convolution_layer": 5,
    "irreps_manual": ["128x0e", "128x0e+64x1e+32x2e", "128x0e+64x1e+32x2e",
                      "128x0e+64x1e+32x2e", "128x0e+64x1e+32x2e", "128x0e"],
    "weight_nn_hidden_neurons": [64, 64],
    "radial_basis": {"radial_basis_name": "bessel", "bessel_basis_num": 8},
    "cutoff_function": {"cutoff_function_name": "XPLOR", "cutoff_on": 4.5},
    "self_connection_type": "linear",
    "conv_denominator": 35.0,
    "chemical_species": ["H", "O"],
    "_edge_chunk": 0,
    "_remat": False,
})
params = model_init(jax.random.PRNGKey(0), spec)

print(f"N={len(pos)}", flush=True)

# correctness: single-point energy/forces fused vs XLA-dense
e_x = MDEngine(spec, params, cell, fused=False)
s_x = e_x.make_state(pos, Z)
e_f = MDEngine(spec, params, cell, fused=True,
               sort_atoms=bool(int(os.environ.get("SORT_ATOMS", 0))))
s_f = e_f.make_state(pos, Z)
pe_x, pe_f = float(s_x.potential_energy), float(s_f.potential_energy)
nreal = len(pos)
fx = np.asarray(s_x.forces)[:nreal]
ff = np.asarray(s_f.forces)[:nreal]
print(f"PE xla {pe_x:.4f} fused {pe_f:.4f} diff {abs(pe_x-pe_f):.2e}", flush=True)
print(f"force maxdiff {np.abs(fx-ff).max():.2e} mae {np.abs(fx-ff).mean():.2e} "
      f"(scale {np.abs(fx).max():.2e})", flush=True)

# timing — warm with the SAME chunk as the timed run (scan length is part
# of the compile key; mismatched chunks time a fresh compile)
for name, eng, st in (("xla", e_x, s_x), ("fused", e_f, s_f)):
    st2 = eng.make_state(pos, Z, temperature=300.0, seed=1)
    t0 = time.time()
    st2, _ = eng.run(st2, steps, dt=0.5, chunk=steps)  # warm (compiles)
    print(f"{name}: warm {(time.time()-t0):.0f}s", flush=True)
    t0 = time.time()
    st2, _ = eng.run(st2, steps, dt=0.5, chunk=steps)
    dt = (time.time() - t0) / steps
    print(f"{name}: {dt*1e3:.1f} ms/step -> {0.5*86400/dt/1e6:.3f} ns/day",
          flush=True)
