"""Debug distributed MD vs serial: single-point, then step-by-step."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from sevennet_tpu.io import load_sevennet_checkpoint
from sevennet_tpu.md import MDEngine
from sevennet_tpu.md.state import ATOMIC_MASSES, EV_A_AMU_TO_A_FS2, KB_EV
from sevennet_tpu.parallel.md import DistributedMDEngine

spec, params = load_sevennet_checkpoint(
    "/root/reference/tests/data/checkpoints/cp_0.pth"
)
rng = np.random.default_rng(11)
L = 19.2
cell = np.eye(3) * L
pts, Zs = [], []
for i in range(8):
    for j in range(4):
        for k in range(4):
            base = np.array([i * L / 8, j * L / 4, k * L / 4])
            pts.append(base + [0.6, 0.6, 0.6])
            Zs.append(72 if (i + j + k) % 3 == 0 else 8)
pos = np.asarray(pts) + rng.normal(scale=0.08, size=(len(pts), 3))
Z = np.asarray(Zs)
n = len(pos)

masses = ATOMIC_MASSES[Z]
sigma = np.sqrt(KB_EV * 600.0 / masses) * np.sqrt(EV_A_AMU_TO_A_FS2)
vel = rng.normal(size=pos.shape) * sigma[:, None]
vel -= (masses[:, None] * vel).sum(0) / masses.sum()

eng_s = MDEngine(spec, params, cell, skin=0.5, dense=False, fused=False)
st_s = eng_s.make_state(pos, Z)
st_s = st_s.replace(velocities=jnp.asarray(vel, jnp.float32))

devs = np.array(jax.devices()[:4])
mesh = Mesh(devs, ("dd",))
eng_d = DistributedMDEngine(spec, params, cell, mesh, skin=0.5, axis=0)
st_d = eng_d.make_state(pos, Z, velocities=vel)

print("single-point: serial PE", float(st_s.potential_energy),
      "dist PE", float(st_d.potential_energy), flush=True)

# force comparison at t=0: map dist forces back to global order
fs = np.asarray(st_s.forces)[:n]
pd = np.asarray(st_d.positions)
fd = np.asarray(st_d.forces)
md = np.asarray(st_d.atom_mask)
ps_flat = np.asarray(st_s.positions)[:n]
# match atoms by position
from scipy.spatial import cKDTree
tree = cKDTree(ps_flat)
err = 0.0
for d in range(4):
    for a in np.flatnonzero(md[d]):
        dist, idx = tree.query(pd[d, a])
        assert dist < 1e-5, (d, a, dist)
        err = max(err, np.abs(fd[d, a] - fs[idx]).max())
print("max force diff @t0:", err, flush=True)

for it in range(10):
    st_s, (pe_s, _) = eng_s.run(st_s, 5, dt=1.0, chunk=5)
    st_d, (pe_d, _) = eng_d.run(st_d, 5, dt=1.0, chunk=5)
    print(f"steps {5*(it+1):3d}: serial {np.asarray(pe_s)[-1]:.6f} "
          f"dist {np.asarray(pe_d)[-1]:.6f} "
          f"diff {abs(np.asarray(pe_s)[-1]-np.asarray(pe_d)[-1]):.2e}",
          flush=True)

# --- localize: which atoms have wrong forces at t=0? ---
st_d2 = eng_d.make_state(pos, Z, velocities=vel)
pd = np.asarray(st_d2.positions)
fd = np.asarray(st_d2.forces)
md = np.asarray(st_d2.atom_mask)
errs = []
for d in range(4):
    for a in np.flatnonzero(md[d]):
        dist, idx = tree.query(pd[d, a])
        e = np.abs(fd[d, a] - fs[idx]).max()
        ratio = (np.linalg.norm(fd[d, a]) /
                 max(np.linalg.norm(fs[idx]), 1e-12))
        errs.append((e, d, a, pd[d, a, 0] % (L / 4), ratio))
errs.sort(reverse=True)
print("worst 12 (err, dev, slot, x-in-slab, |fd|/|fs|):")
for e in errs[:12]:
    print(f"  {e[0]:.4f} dev{e[1]} slot{e[2]} x={e[3]:.2f} r={e[4]:.3f}")
ok = sum(1 for e in errs if e[0] < 1e-4)
print(f"{ok}/{len(errs)} atoms OK (<1e-4)")
