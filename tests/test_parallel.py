"""Domain-decomposition consistency: the distributed model over an n-device
mesh must reproduce the single-device model to float tolerance — the same
pillar the reference tests with serial vs ``mpirun -np N`` LAMMPS runs
(``tests/lammps_tests/test_lammps.py:367-374``)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from sevennet_tpu.model import build_model_spec
from sevennet_tpu.model.model import model_init

from .conftest import build_graph, compute


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(5)
    n = 40
    box = 16.0
    pos = rng.uniform(0, box, (n, 3))
    Z = rng.choice([72, 8], n)
    cell = np.eye(3) * box
    return pos, Z, cell


@pytest.fixture(scope="module")
def spec_params():
    spec = build_model_spec(
        {
            "cutoff": 3.5,
            "channel": 4,
            "lmax": 2,
            "is_parity": True,
            "num_convolution_layer": 3,
            "chemical_species": ["Hf", "O"],
            "self_connection_type": "nequip",
            "conv_denominator": 6.0,
            "shift": -1.0,
            "scale": 0.5,
        }
    )
    params = model_init(jax.random.PRNGKey(0), spec)
    return spec, params


def _mesh(n):
    devs = jax.devices()[:n]
    assert len(devs) == n
    return Mesh(np.array(devs), axis_names=("dd",))


@pytest.mark.parametrize(
    "n_dev",
    [
        pytest.param(1, marks=pytest.mark.slow),
        pytest.param(2, marks=pytest.mark.smoke),
        pytest.param(4, marks=pytest.mark.slow),
    ],
)
def test_distributed_matches_serial(system, spec_params, n_dev):
    from sevennet_tpu.parallel import distributed_compute, partition_system

    pos, Z, cell = system
    spec, params = spec_params
    species = spec.z_to_type[Z]

    # serial reference
    gb = build_graph(spec, pos, Z, cell)
    ref = compute(spec, params, gb)
    e_ref = float(ref["energy"][0])
    f_ref = np.asarray(ref["forces"])[: len(pos)]
    s_ref = np.asarray(ref["stress"])[0]

    dd = partition_system(pos, species, cell, spec.cutoff, n_dev)
    out = distributed_compute(spec, params, dd, _mesh(n_dev))

    assert abs(float(out["energy"]) - e_ref) < 5e-4, (float(out["energy"]), e_ref)

    # forces: map device-local rows back to global order
    f_dist = np.zeros_like(f_ref)
    F = np.asarray(out["forces"]).reshape(n_dev, dd.n_local_cap, 3)
    for d in range(n_dev):
        for i in range(dd.n_local_cap):
            g = dd.owner_global_idx[d, i]
            if g >= 0:
                f_dist[g] = F[d, i]
    assert np.abs(f_dist - f_ref).max() < 2e-4, np.abs(f_dist - f_ref).max()

    s_dist = np.asarray(out["stress"])
    assert np.abs(s_dist - s_ref).max() < 2e-5


def test_partition_covers_all_atoms(system, spec_params):
    from sevennet_tpu.parallel import partition_system

    pos, Z, cell = system
    spec, _ = spec_params
    species = spec.z_to_type[Z]
    dd = partition_system(pos, species, cell, spec.cutoff, 4)
    owned = dd.owner_global_idx[dd.owner_global_idx >= 0]
    assert sorted(owned.tolist()) == list(range(len(pos)))
    # every edge lands on the owner of its dst
    assert dd.edge_mask.sum() > 0


def test_partition_rejects_thin_slabs(system, spec_params):
    from sevennet_tpu.parallel import partition_system

    pos, Z, cell = system
    spec, _ = spec_params
    species = spec.z_to_type[Z]
    with pytest.raises(ValueError):
        partition_system(pos, species, cell, spec.cutoff, 8)  # 2 A slabs < cutoff


@pytest.mark.parametrize("mesh_shape,names", [
    ((4,), ("dd",)),          # 1-D slabs
    ((2, 2, 2), ("dx", "dy", "dz")),  # 3-D bricks, staged CommBrick swaps
])
@pytest.mark.slow
def test_distributed_md_matches_serial(mesh_shape, names):
    """Domain-decomposed NVE over a virtual mesh == single-device MD over
    >= 50 steps (energies + sorted positions), with migration and in-scan
    rebuilds exercised (reference parallel algorithm,
    pair_e3gnn_parallel.cpp:194-506 + comm_brick.cpp staged swaps)."""
    import jax
    from jax.sharding import Mesh

    from sevennet_tpu.io import load_sevennet_checkpoint
    from sevennet_tpu.md import MDEngine
    from sevennet_tpu.parallel.md import DistributedMDEngine

    spec, params = load_sevennet_checkpoint(
        "/root/reference/tests/data/checkpoints/cp_0.pth"
    )
    rng = np.random.default_rng(11)
    L = 19.2
    cell = np.eye(3) * L
    # 4x2x2 supercell-ish lattice of HfO2 units, jittered
    pts = []
    Zs = []
    for i in range(8):
        for j in range(4):
            for k in range(4):
                base = np.array([i * L / 8, j * L / 4, k * L / 4])
                pts.append(base + [0.6, 0.6, 0.6])
                Zs.append(72 if (i + j + k) % 3 == 0 else 8)
    pos = np.asarray(pts) + rng.normal(scale=0.08, size=(len(pts), 3))
    Z = np.asarray(Zs)
    n = len(pos)

    # shared initial velocities (hot enough to force migrations)
    from sevennet_tpu.md.state import ATOMIC_MASSES, EV_A_AMU_TO_A_FS2, KB_EV

    masses = ATOMIC_MASSES[Z]
    sigma = np.sqrt(KB_EV * 600.0 / masses) * np.sqrt(EV_A_AMU_TO_A_FS2)
    vel = rng.normal(size=pos.shape) * sigma[:, None]
    vel -= (masses[:, None] * vel).sum(0) / masses.sum()

    # serial reference
    import jax.numpy as jnp

    eng_s = MDEngine(spec, params, cell, skin=0.5, dense=False, fused=False)
    st_s = eng_s.make_state(pos, Z)
    st_s = st_s.replace(velocities=jnp.asarray(vel, jnp.float32))
    st_s, (pe_s, ke_s) = eng_s.run(st_s, 50, dt=1.0, chunk=25)

    # distributed over the mesh
    nd = int(np.prod(mesh_shape))
    devs = np.array(jax.devices()[:nd]).reshape(mesh_shape)
    mesh = Mesh(devs, names)
    eng_d = DistributedMDEngine(spec, params, cell, mesh, skin=0.5)
    st_d = eng_d.make_state(pos, Z, velocities=vel)
    st_d, (pe_d, ke_d) = eng_d.run(st_d, 50, dt=1.0, chunk=25)

    pe_s, pe_d = np.asarray(pe_s), np.asarray(pe_d)
    ke_s, ke_d = np.asarray(ke_s), np.asarray(ke_d)
    # energy trajectories agree to fp32 tolerances
    assert np.abs(pe_s - pe_d).max() < 5e-3 * max(1.0, np.abs(pe_s).max()), (
        np.abs(pe_s - pe_d).max()
    )
    assert np.abs(ke_s - ke_d).max() < 5e-3 * max(1.0, np.abs(ke_s).max())
    # no atoms lost through migration
    assert int(np.asarray(st_d.atom_mask).sum()) == n
    # final positions agree as sets (owners shuffle atoms across devices)
    ps = np.asarray(st_s.positions)[: n]
    pd = eng_d.gather_positions(st_d)
    order_s = np.lexsort(ps.T)
    order_d = np.lexsort(pd.T)
    np.testing.assert_allclose(
        ps[order_s], pd[order_d], atol=5e-3
    )


@pytest.mark.slow
def test_distributed_thermostats_regulate():
    """Distributed NVT: Nose-Hoover (global-KE chain) and Langevin
    (per-device noise) heat a cold system toward the target over a 2x2
    brick mesh."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from sevennet_tpu.io import load_sevennet_checkpoint
    from sevennet_tpu.md.state import KB_EV
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
                pts.append(np.array([i * L / 8, j * L / 4, k * L / 4]) + 0.6)
                Zs.append(72 if (i + j + k) % 3 == 0 else 8)
    pos = np.asarray(pts) + rng.normal(scale=0.08, size=(len(pts), 3))
    Z = np.asarray(Zs)
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("dx", "dy"))
    ndof = 3 * len(pos)

    for integ, kw in [
        ("nose_hoover", dict(temperature=500.0, tau=25.0)),
        ("langevin", dict(temperature=500.0, friction=0.05)),
    ]:
        eng = DistributedMDEngine(spec, params, cell, mesh, skin=0.5)
        st = eng.make_state(pos, Z, temperature=100.0, seed=3)
        st, (pe, ke) = eng.run(st, 80, dt=1.0, chunk=40,
                               integrator=integ, **kw)
        T = 2 * np.asarray(ke) / (ndof * KB_EV)
        assert T[-1] > 250.0, (integ, T[-1])  # heated well past 100 K
        assert np.isfinite(np.asarray(pe)).all()
        assert int(np.asarray(st.atom_mask).sum()) == len(pos)


@pytest.mark.slow
def test_distributed_stress_matches_serial():
    """Strain-probe stress over a 2x2x2 brick mesh == the serial engine's
    (edge-local virial stays exact under decomposition,
    reference force_output.py:197-228)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from sevennet_tpu.io import load_sevennet_checkpoint
    from sevennet_tpu.md import MDEngine
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
                pts.append(np.array([i * L / 8, j * L / 4, k * L / 4]) + 0.6)
                Zs.append(72 if (i + j + k) % 3 == 0 else 8)
    pos = np.asarray(pts) + rng.normal(scale=0.08, size=(len(pts), 3))
    Z = np.asarray(Zs)

    es = MDEngine(spec, params, cell, dense=False, fused=False)
    s_serial = np.asarray(es.make_state(pos, Z).stress)

    devs = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("dx", "dy", "dz"))
    ed = DistributedMDEngine(spec, params, cell, mesh, skin=0.5)
    sd = ed.make_state(pos, Z)
    e, stress, forces = ed.compute_stress(sd)
    np.testing.assert_allclose(np.asarray(stress), s_serial, atol=1e-8)
    assert np.isfinite(float(e))


@pytest.mark.slow
def test_distributed_fused_conv_matches_xla():
    """The fused Pallas conv over the extended (owned+ghost) set with the
    scatter-add backward (`fused_conv_apply_ext`) reproduces the XLA
    distributed path: the mirror backward is unusable across domain
    boundaries, so this is the kernel MD runs multi-chip."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from sevennet_tpu.io import load_sevennet_checkpoint
    from sevennet_tpu.parallel.md import DistributedMDEngine

    spec, params = load_sevennet_checkpoint(
        "/root/reference/tests/data/checkpoints/cp_0.pth"
    )
    rng = np.random.default_rng(3)
    L = 12.8
    cell = np.eye(3) * L
    pts, Zs = [], []
    for i in range(4):
        for j in range(4):
            for k in range(4):
                pts.append(np.array([i, j, k]) * L / 4 + 0.4)
                Zs.append(72 if (i + j + k) % 3 == 0 else 8)
    pos = np.asarray(pts) + rng.normal(scale=0.05, size=(len(pts), 3))
    Z = np.asarray(Zs)

    devs = np.array(jax.devices()[:2]).reshape(2)
    mesh = Mesh(devs, ("dd",))
    outs = {}
    for fused in (False, True):
        eng = DistributedMDEngine(spec, params, cell, mesh, skin=0.5,
                                  fused=fused)
        st = eng.make_state(pos, Z, temperature=500.0, seed=7)
        st, (pe, ke) = eng.run(st, 6, dt=1.0, chunk=3)
        outs[fused] = (np.asarray(pe), eng.gather_positions(st))
    pe_x, px = outs[False]
    pe_f, pf = outs[True]
    assert np.abs(pe_x - pe_f).max() < 2e-3 * max(1.0, np.abs(pe_x).max()), (
        np.abs(pe_x - pe_f).max()
    )
    np.testing.assert_allclose(
        px[np.lexsort(px.T)], pf[np.lexsort(pf.T)], atol=2e-3
    )


@pytest.mark.slow
def test_distributed_md_triclinic_matches_serial():
    """Triclinic cell over a 2x2 brick mesh: the fractional-space brick
    decomposition (prism bricks, the CommBrick triclinic analogue,
    comm_brick.cpp:1057-1123) must reproduce the serial engine. Closes the
    round-2 orthogonal-only restriction (parallel/md.py)."""
    import jax
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
    rng = np.random.default_rng(13)
    L = 19.2
    # sheared prism (rows = lattice vectors)
    cell = np.array([
        [L, 0.0, 0.0],
        [0.22 * L, L, 0.0],
        [0.10 * L, 0.15 * L, L],
    ])
    frac = []
    Zs = []
    for i in range(6):
        for j in range(4):
            for k in range(4):
                frac.append([(i + 0.5) / 6, (j + 0.5) / 4, (k + 0.5) / 4])
                Zs.append(72 if (i + j + k) % 3 == 0 else 8)
    pos = np.asarray(frac) @ cell + rng.normal(scale=0.08, size=(len(frac), 3))
    Z = np.asarray(Zs)
    n = len(pos)

    masses = ATOMIC_MASSES[Z]
    sigma = np.sqrt(KB_EV * 500.0 / masses) * np.sqrt(EV_A_AMU_TO_A_FS2)
    vel = rng.normal(size=pos.shape) * sigma[:, None]
    vel -= (masses[:, None] * vel).sum(0) / masses.sum()

    eng_s = MDEngine(spec, params, cell, skin=0.5, dense=False, fused=False)
    st_s = eng_s.make_state(pos, Z)
    st_s = st_s.replace(velocities=jnp.asarray(vel, jnp.float32))
    st_s, (pe_s, ke_s) = eng_s.run(st_s, 40, dt=1.0, chunk=20)

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("dx", "dy"))
    eng_d = DistributedMDEngine(spec, params, cell, mesh, skin=0.5)
    st_d = eng_d.make_state(pos, Z, velocities=vel)
    st_d, (pe_d, ke_d) = eng_d.run(st_d, 40, dt=1.0, chunk=20)

    pe_s, pe_d = np.asarray(pe_s), np.asarray(pe_d)
    ke_s, ke_d = np.asarray(ke_s), np.asarray(ke_d)
    assert np.abs(pe_s - pe_d).max() < 5e-3 * max(1.0, np.abs(pe_s).max()), (
        np.abs(pe_s - pe_d).max()
    )
    assert np.abs(ke_s - ke_d).max() < 5e-3 * max(1.0, np.abs(ke_s).max())
    assert int(np.asarray(st_d.atom_mask).sum()) == n
    ps = np.asarray(st_s.positions)[:n]
    pd = eng_d.gather_positions(st_d)
    # wrap both into the cell before set-comparison (frac space)
    inv = np.linalg.inv(cell)
    def wrapped(p):
        f = p @ inv
        f -= np.floor(f)
        return f @ cell
    ps, pd = wrapped(ps), wrapped(pd)
    np.testing.assert_allclose(
        ps[np.lexsort(ps.T)], pd[np.lexsort(pd.T)], atol=5e-3
    )


@pytest.mark.slow
def test_distributed_d3_matches_serial():
    """Distributed MD with D3 dispersion == serial MD with D3 over a 2x2
    brick mesh (the reference runs ``pair d3`` alongside the parallel pair
    style under LAMMPS domain decomposition, ``pair_d3.cu`` +
    ``pair_e3gnn_parallel.cpp:194-506``): ghost coordination numbers ride
    the halo exchange; forces include the dC6/dCN cross-device terms."""
    import jax
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
    rng = np.random.default_rng(7)
    L = 19.2
    cell = np.eye(3) * L
    pts, Zs = [], []
    for i in range(6):
        for j in range(4):
            for k in range(4):
                pts.append([(i + 0.5) * L / 6, (j + 0.5) * L / 4,
                            (k + 0.5) * L / 4])
                Zs.append(72 if (i + j + k) % 3 == 0 else 8)
    pos = np.asarray(pts) + rng.normal(scale=0.08, size=(len(pts), 3))
    Z = np.asarray(Zs)
    n = len(pos)

    masses = ATOMIC_MASSES[Z]
    sigma = np.sqrt(KB_EV * 500.0 / masses) * np.sqrt(EV_A_AMU_TO_A_FS2)
    vel = rng.normal(size=pos.shape) * sigma[:, None]
    vel -= (masses[:, None] * vel).sum(0) / masses.sum()

    d3 = {"functional": "pbe", "damping": "bj", "cutoff": 6.0}
    eng_s = MDEngine(spec, params, cell, skin=0.5, dense=False, fused=False,
                     d3=d3)
    st_s = eng_s.make_state(pos, Z)
    st_s = st_s.replace(velocities=jnp.asarray(vel, jnp.float32))
    st_s, (pe_s, ke_s) = eng_s.run(st_s, 30, dt=1.0, chunk=15)

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("dx", "dy"))
    eng_d = DistributedMDEngine(spec, params, cell, mesh, skin=0.5, d3=d3)
    assert abs(float(eng_d.d3_params.cutoff)
               - float(eng_s.d3_params.cutoff)) < 1e-9
    st_d = eng_d.make_state(pos, Z, velocities=vel)
    st_d, (pe_d, ke_d) = eng_d.run(st_d, 30, dt=1.0, chunk=15)

    pe_s, pe_d = np.asarray(pe_s), np.asarray(pe_d)
    ke_s, ke_d = np.asarray(ke_s), np.asarray(ke_d)
    assert np.abs(pe_s - pe_d).max() < 5e-3 * max(1.0, np.abs(pe_s).max()), (
        np.abs(pe_s - pe_d).max()
    )
    assert np.abs(ke_s - ke_d).max() < 5e-3 * max(1.0, np.abs(ke_s).max())
    assert int(np.asarray(st_d.atom_mask).sum()) == n
    ps = np.asarray(st_s.positions)[:n] % L
    pd = eng_d.gather_positions(st_d) % L
    np.testing.assert_allclose(
        ps[np.lexsort(ps.T)], pd[np.lexsort(pd.T)], atol=5e-3
    )


@pytest.mark.slow
def test_distributed_npt_matches_serial():
    """Distributed MTK NPT == serial MTK NPT over a 2x2 brick mesh: the
    replicated piston (psum'd global KE + strain-probe virial) must
    reproduce the serial ``mtk_npt_step`` trajectory, including the cell
    breathing (the LAMMPS ``fix npt`` surface the reference's parallel
    pair style relies on)."""
    import jax
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
    rng = np.random.default_rng(21)
    L = 19.2
    cell = np.eye(3) * L
    pts, Zs = [], []
    for i in range(6):
        for j in range(4):
            for k in range(4):
                pts.append([(i + 0.5) * L / 6, (j + 0.5) * L / 4,
                            (k + 0.5) * L / 4])
                Zs.append(72 if (i + j + k) % 3 == 0 else 8)
    pos = np.asarray(pts) + rng.normal(scale=0.08, size=(len(pts), 3))
    Z = np.asarray(Zs)
    n = len(pos)

    masses = ATOMIC_MASSES[Z]
    sigma = np.sqrt(KB_EV * 300.0 / masses) * np.sqrt(EV_A_AMU_TO_A_FS2)
    vel = rng.normal(size=pos.shape) * sigma[:, None]
    vel -= (masses[:, None] * vel).sum(0) / masses.sum()

    kw = dict(temperature=300.0, pressure=0.0, tau_t=40.0, tau_p=200.0)

    eng_s = MDEngine(spec, params, cell, skin=0.5, dense=False, fused=False)
    st_s = eng_s.make_state(pos, Z)
    st_s = st_s.replace(velocities=jnp.asarray(vel, jnp.float32))
    v0 = float(st_s.volume())
    st_s, (pe_s, ke_s) = eng_s.run(st_s, 30, dt=0.5, chunk=15,
                                   integrator="npt", **kw)
    v1 = float(st_s.volume())
    scale_s = (v1 / v0) ** (1.0 / 3.0)

    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("dx", "dy"))
    eng_d = DistributedMDEngine(spec, params, cell, mesh, skin=0.5,
                                scale_budget=0.9)
    st_d = eng_d.make_state(pos, Z, velocities=vel)
    st_d, (pe_d, ke_d) = eng_d.run(st_d, 30, dt=0.5, chunk=15,
                                   integrator="npt", **kw)
    scale_d = float(np.asarray(st_d.cell_scale).reshape(-1)[0])

    assert abs(v1 - v0) > 1e-6  # piston moved
    pe_s, pe_d = np.asarray(pe_s), np.asarray(pe_d)
    ke_s, ke_d = np.asarray(ke_s), np.asarray(ke_d)
    assert np.abs(pe_s - pe_d).max() < 5e-3 * max(1.0, np.abs(pe_s).max()), (
        np.abs(pe_s - pe_d).max()
    )
    assert np.abs(ke_s - ke_d).max() < 5e-3 * max(1.0, np.abs(ke_s).max())
    assert abs(scale_s - scale_d) < 5e-4, (scale_s, scale_d)
    assert int(np.asarray(st_d.atom_mask).sum()) == n


@pytest.mark.slow
def test_distributed_md_mesh1_runs():
    """mesh=(1,) DistributedMDEngine: the degenerate single-device
    decomposition (every axis extent owned by one device) must run
    without ghost bands or migration — regression for the Dv==1
    migration mask marking every staying atom as lo-bound (rel ==
    Dv-1 == 0) and overflowing the migrate buffer (round 5; the only
    distributed configuration measurable on one real chip)."""
    import numpy as np
    from jax.sharding import Mesh

    from sevennet_tpu.md import MDEngine
    from sevennet_tpu.parallel.md import DistributedMDEngine
    from sevennet_tpu.model import build_model_spec

    spec = build_model_spec({
        "cutoff": 3.0, "channel": 8, "lmax": 1, "is_parity": False,
        "num_convolution_layer": 2,
        "irreps_manual": ["8x0e", "8x0e+4x1e", "8x0e"],
        "weight_nn_hidden_neurons": [8, 8],
        "radial_basis": {"radial_basis_name": "bessel",
                         "bessel_basis_num": 4},
        "cutoff_function": {"cutoff_function_name": "XPLOR",
                            "cutoff_on": 2.5},
        "self_connection_type": "linear", "conv_denominator": 8.0,
        "chemical_species": ["H", "O"],
    })
    params = model_init(jax.random.PRNGKey(0), spec)
    rng = np.random.default_rng(5)
    cell = np.eye(3) * 14.0
    pos = rng.uniform(0, 14.0, (48, 3))
    Z = np.where(rng.random(48) < 0.5, 1, 8)
    mesh = Mesh(np.array([jax.devices()[0]]), axis_names=("dd",))
    dist = DistributedMDEngine(spec, params, cell, mesh, skin=0.4,
                               matmul_precision="highest")
    st = dist.make_state(pos, Z, temperature=50.0, seed=0)
    assert not bool(st.nl_overflow)
    st, (pe, _) = dist.run(st, 3, dt=0.2, chunk=3)

    ser = MDEngine(spec, params, cell, fused=False, sort_atoms=False,
                   matmul_precision="highest")
    ss = ser.make_state(pos, Z, temperature=50.0, seed=0)
    ss, (pe_s, _) = ser.run(ss, 3, dt=0.2, chunk=3)
    np.testing.assert_allclose(
        np.asarray(pe), np.asarray(pe_s), rtol=0, atol=5e-4
    )
