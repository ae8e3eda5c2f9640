import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sevennet_tpu.data import neighbor_list_numpy
from sevennet_tpu.md.neighbor import build_cell_list_spec, rebuild_neighbors


def _edge_set(dst, src, S, mask=None):
    dst, src, S = np.asarray(dst), np.asarray(src), np.asarray(S)
    if mask is not None:
        m = np.asarray(mask)
        dst, src, S = dst[m], src[m], S[m]
    return set(zip(dst.tolist(), src.tolist(),
                   *[S[:, i].astype(int).tolist() for i in range(3)]))


@pytest.mark.parametrize("box,n", [
    pytest.param(12.0, 40, marks=pytest.mark.slow), (9.0, 25)])
def test_cell_list_matches_host_nl(box, n):
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, box, (n, 3))
    cell = np.eye(3) * box
    cutoff = 3.5
    spec = build_cell_list_spec(cell, n, cutoff, skin=0.0)
    src, dst, S, mask, overflow, pos_w = rebuild_neighbors(
        spec, jnp.asarray(pos, jnp.float32), jnp.asarray(cell, jnp.float32),
        jnp.ones(n, bool),
    )
    assert not bool(overflow)
    got = _edge_set(dst, src, S, mask)
    hdst, hsrc, hS = neighbor_list_numpy(pos, cutoff, cell, True)
    expect = _edge_set(hdst, hsrc, hS)
    assert got == expect


@pytest.mark.slow
def test_cell_list_triclinic():
    rng = np.random.default_rng(1)
    cell = np.array([[10.0, 0, 0], [1.5, 9.0, 0], [-0.8, 0.6, 9.5]])
    n = 30
    frac = rng.uniform(0, 1, (n, 3))
    pos = frac @ cell
    cutoff = 3.0
    spec = build_cell_list_spec(cell, n, cutoff, skin=0.0)
    src, dst, S, mask, overflow, _ = rebuild_neighbors(
        spec, jnp.asarray(pos, jnp.float32), jnp.asarray(cell, jnp.float32),
        jnp.ones(n, bool),
    )
    assert not bool(overflow)
    assert _edge_set(dst, src, S, mask) == _edge_set(
        *neighbor_list_numpy(pos, cutoff, cell, True)
    )


@pytest.mark.slow
def test_cell_list_edge_dst_sorted():
    rng = np.random.default_rng(2)
    pos = rng.uniform(0, 10, (20, 3))
    cell = np.eye(3) * 10
    spec = build_cell_list_spec(cell, 20, 3.0, skin=0.5)
    src, dst, S, mask, overflow, _ = rebuild_neighbors(
        spec, jnp.asarray(pos, jnp.float32), jnp.asarray(cell, jnp.float32),
        jnp.ones(20, bool),
    )
    d = np.asarray(dst)
    assert (np.diff(d) >= 0).all()


def test_overflow_flag():
    # tiny capacities must raise the overflow flag, not crash
    from sevennet_tpu.md.neighbor import CellListSpec

    rng = np.random.default_rng(3)
    pos = rng.uniform(0, 8, (30, 3))
    cell = np.eye(3) * 8
    spec = CellListSpec(n_cells=(2, 2, 2), cell_capacity=2, neighbor_capacity=3,
                        cutoff=3.5, edge_cap=32)
    *_, overflow, _ = rebuild_neighbors(
        spec, jnp.asarray(pos, jnp.float32), jnp.asarray(cell, jnp.float32),
        jnp.ones(30, bool),
    )
    assert bool(overflow)


@pytest.mark.slow
def test_nve_energy_conservation(small_spec_params=None):
    """Short NVE with the reference checkpoint on CPU: total energy drift
    small and decreasing with dt."""
    from sevennet_tpu.io import load_sevennet_checkpoint
    from sevennet_tpu.md import MDEngine

    spec, params = load_sevennet_checkpoint(
        "/root/reference/tests/data/checkpoints/cp_0.pth"
    )
    rng = np.random.default_rng(0)
    a = 9.6
    cell = np.eye(3) * a
    pts = [((np.array([i, j, k]) + 0.5) / 3) * a
           for i in range(3) for j in range(3) for k in range(3)]
    pos = np.asarray(pts) + rng.normal(scale=0.05, size=(27, 3))
    Z = np.array([72] * 9 + [8] * 18)
    engine = MDEngine(spec, params, cell)
    state = engine.make_state(pos, Z, temperature=300.0, seed=1)
    e0 = float(state.potential_energy) + float(state.kinetic_energy())
    state, (pe, ke) = engine.run(state, 30, dt=0.5, integrator="nve")
    et = np.asarray(pe) + np.asarray(ke)
    drift = abs(float(et[-1]) - e0)
    assert drift < 5e-3, drift  # eV over 15 fs, 27 atoms (fp32)
    # langevin stays finite and near target temperature
    state2 = engine.make_state(pos, Z, temperature=300.0, seed=2)
    state2, _ = engine.run(state2, 20, dt=1.0, integrator="langevin",
                           temperature=300.0, friction=0.05)
    assert np.isfinite(np.asarray(state2.positions)).all()
    assert 50 < float(state2.temperature()) < 900


def test_dense_conv_matches_flat():
    """MD dense-neighbor conv path == flat edge-list path (same checkpoint)."""
    import dataclasses

    from sevennet_tpu.io import load_sevennet_checkpoint
    from sevennet_tpu.md import MDEngine

    spec, params = load_sevennet_checkpoint(
        "/root/reference/tests/data/checkpoints/cp_0.pth"
    )
    rng = np.random.default_rng(4)
    a = 9.6
    cell = np.eye(3) * a
    pos = rng.uniform(0, a, (24, 3))
    Z = np.array([72] * 8 + [8] * 16)

    e_dense = MDEngine(spec, params, cell, dense=True)
    s_dense = e_dense.make_state(pos, Z)
    e_flat = MDEngine(spec, params, cell, dense=False)
    s_flat = e_flat.make_state(pos, Z)

    assert abs(float(s_dense.potential_energy) - float(s_flat.potential_energy)) < 1e-4
    f1 = np.asarray(s_dense.forces)
    f2 = np.asarray(s_flat.forces)
    assert np.abs(f1 - f2).max() < 1e-4


def test_dense_streaming_matches_unchunked():
    """Atom-block streaming (edge_chunk) must not change dense results."""
    import dataclasses

    from sevennet_tpu.io import load_sevennet_checkpoint
    from sevennet_tpu.md import MDEngine

    spec, params = load_sevennet_checkpoint(
        "/root/reference/tests/data/checkpoints/cp_0.pth"
    )
    rng = np.random.default_rng(7)
    a = 9.6
    cell = np.eye(3) * a
    pos = rng.uniform(0, a, (24, 3))
    Z = np.array([72] * 8 + [8] * 16)
    s1 = MDEngine(
        dataclasses.replace(spec, edge_chunk=0), params, cell, dense=True
    ).make_state(pos, Z)
    s2 = MDEngine(
        dataclasses.replace(spec, edge_chunk=64), params, cell, dense=True
    ).make_state(pos, Z)
    assert abs(float(s1.potential_energy) - float(s2.potential_energy)) < 1e-5
    assert np.abs(np.asarray(s1.forces) - np.asarray(s2.forces)).max() < 1e-5


def _hfo2_engine(seed=0):
    from sevennet_tpu.io import load_sevennet_checkpoint
    from sevennet_tpu.md import MDEngine

    spec, params = load_sevennet_checkpoint(
        "/root/reference/tests/data/checkpoints/cp_0.pth"
    )
    rng = np.random.default_rng(seed)
    a = 9.6
    cell = np.eye(3) * a
    pts = [((np.array([i, j, k]) + 0.5) / 3) * a
           for i in range(3) for j in range(3) for k in range(3)]
    pos = np.asarray(pts) + rng.normal(scale=0.05, size=(27, 3))
    Z = np.array([72] * 9 + [8] * 18)
    return MDEngine(spec, params, cell), pos, Z, cell


def test_engine_stress_and_pressure_sign():
    """Virial pressure from the engine must match -dE/dV (FD over isotropic
    scaling) at zero velocity. Uses a compressed box so P >> fp32 noise."""
    engine, pos, Z, cell = _hfo2_engine(3)
    # compress for a strong positive pressure signal. 0.82 (not 0.94): the
    # e3nn gate/sort semantics fix (pinned by reference TorchScript
    # execution, see test_deployed_golden) changed what this RANDOM-weight
    # model predicts, and at 6% compression its pressure is legitimately
    # slightly negative (virial and -dE/dV agree to 0.3% there — the FD
    # consistency this test actually guards held throughout)
    comp = 0.82

    def state_at_scale(s):
        eng2, _, _, _ = _hfo2_engine(3)
        eng2.cell = cell * s
        return eng2, eng2.make_state(np.asarray(pos) * s, Z)

    eng0, st0 = state_at_scale(comp)
    p_virial = float(st0.pressure())  # kinetic term = 0

    h = 0.01
    v0 = float(np.abs(np.linalg.det(cell * comp)))
    _, st_p = state_at_scale(comp * (1 + h))
    _, st_m = state_at_scale(comp * (1 - h))
    e_p, e_m = float(st_p.potential_energy), float(st_m.potential_energy)
    dV = v0 * ((1 + h) ** 3 - (1 - h) ** 3)
    p_fd = -(e_p - e_m) / dV
    assert p_virial > 0  # compressed -> positive pressure
    assert abs(p_virial - p_fd) < 0.15 * abs(p_fd) + 2e-4, (p_virial, p_fd)


def test_nose_hoover_regulates_temperature():
    engine, pos, Z, cell = _hfo2_engine(5)
    state = engine.make_state(pos, Z, temperature=600.0, seed=2)
    state, _ = engine.run(state, 60, dt=1.0, integrator="nose_hoover",
                          temperature=300.0, tau=20.0)
    t = float(state.temperature())
    assert np.isfinite(t)
    assert 100.0 < t < 700.0  # pulled toward target from 600 start
    assert np.isfinite(np.asarray(state.positions)).all()


def test_npt_berendsen_changes_volume():
    engine, pos, Z, cell = _hfo2_engine(6)
    state = engine.make_state(pos, Z, temperature=300.0, seed=3)
    v0 = float(state.volume())
    # target a strong positive pressure -> box should shrink... or at least
    # the barostat must move volume and stay finite
    state, _ = engine.run(state, 30, dt=1.0, integrator="npt_berendsen",
                          temperature=300.0, pressure=0.0, tau_p=200.0)
    v1 = float(state.volume())
    assert np.isfinite(v1) and v1 > 0
    assert abs(v1 - v0) > 1e-6  # barostat actually acted
    assert np.isfinite(np.asarray(state.positions)).all()


def test_trajectory_dump_roundtrip(tmp_path):
    from sevennet_tpu.data.extxyz import read_extxyz

    engine, pos, Z, cell = _hfo2_engine(7)
    state = engine.make_state(pos, Z, temperature=300.0, seed=4)
    path = str(tmp_path / "traj.extxyz")
    state, _ = engine.run(state, 10, dt=0.5, chunk=5, traj_path=path,
                          traj_every=5)
    frames = read_extxyz(path)
    assert len(frames) == 3  # initial + 2 dumps
    assert len(frames[0]) == 27
    assert frames[-1].energy is not None
    assert frames[-1].forces is not None
    np.testing.assert_allclose(
        frames[-1].positions, np.asarray(state.positions)[:27], atol=1e-4
    )


def test_md_cli_runner(tmp_path):
    """sevennet-tpu md: yaml-driven MD (the LAMMPS-input-script analogue)
    end to end — thermo CSV + extxyz trajectory readable by our reader."""
    import numpy as np

    from sevennet_tpu.scripts.md_run import run_md_from_config

    struct = tmp_path / "start.extxyz"
    struct.write_text(
        "8\n"
        'Lattice="6.0 0.0 0.0 0.0 6.0 0.0 0.0 0.0 6.0" '
        'Properties=species:S:1:pos:R:3 pbc="T T T"\n'
        "Hf 0.5 0.5 0.5\nO 2.1 0.6 0.4\nHf 3.5 0.5 3.4\nO 0.4 3.6 0.6\n"
        "Hf 0.6 3.4 3.6\nO 3.4 3.6 0.5\nHf 3.6 0.4 0.6\nO 2.4 2.5 2.6\n"
    )
    cfg = {"md": {
        "checkpoint": "/root/reference/tests/data/checkpoints/cp_0.pth",
        "structure": str(struct),
        "ensemble": "nve",
        "steps": 10, "dt": 0.2, "temperature": 200.0, "chunk": 5,
        "trajectory": str(tmp_path / "traj.extxyz"), "traj_every": 5,
        "log": str(tmp_path / "thermo.csv"),
        "fused": False,
    }}
    out = run_md_from_config(cfg, log=lambda *a: None)
    assert len(out["thermo"]) == 2
    assert np.isfinite(out["thermo"][-1]["pe"])
    assert (tmp_path / "thermo.csv").read_text().startswith("step,")
    from sevennet_tpu.data.extxyz import read_extxyz

    frames = read_extxyz(str(tmp_path / "traj.extxyz"))
    assert len(frames) >= 2 and len(frames[0]) == 8


def test_read_poscar(tmp_path):
    from sevennet_tpu.data.vasp import read_poscar

    p = tmp_path / "POSCAR"
    p.write_text(
        "HfO2 test\n1.0\n5.1 0.0 0.0\n0.0 5.1 0.0\n0.0 0.0 5.1\n"
        "Hf O\n2 2\nDirect\n"
        "0.0 0.0 0.0\n0.5 0.5 0.0\n0.25 0.25 0.25\n0.75 0.75 0.25\n"
    )
    at = read_poscar(str(p))
    assert len(at) == 4
    assert list(at.numbers) == [72, 72, 8, 8]
    import numpy as np

    np.testing.assert_allclose(at.positions[1], [2.55, 2.55, 0.0])


@pytest.mark.slow
def test_sorted_atoms_matches_unsorted():
    """MDEngine(sort_atoms=True): cell-id atom reordering at rebuilds is
    physics-neutral; state.atom_index recovers the input order."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import water_box
    from sevennet_tpu.md import MDEngine
    from sevennet_tpu.model import build_model_spec
    from sevennet_tpu.model.model import model_init

    pos, Z, cell = water_box(60)
    spec = build_model_spec({
        "cutoff": 5.0, "channel": 8, "lmax": 1, "is_parity": False,
        "num_convolution_layer": 2, "self_connection_type": "linear",
        "conv_denominator": 35.0, "chemical_species": ["H", "O"],
        "_edge_chunk": 0, "_remat": False,
    })
    params = model_init(jax.random.PRNGKey(0), spec)

    e1 = MDEngine(spec, params, cell, fused=False, sort_atoms=False)
    s1 = e1.make_state(pos, Z, temperature=300.0, seed=2)
    vel = np.asarray(s1.velocities)
    s1, (pe1, _) = e1.run(s1, 30, dt=1.0, chunk=15)

    e2 = MDEngine(spec, params, cell, fused=False, sort_atoms=True)
    s2 = e2.make_state(pos, Z)
    idx0 = np.asarray(s2.atom_index)
    s2 = s2.replace(velocities=jnp.asarray(vel[idx0]))
    s2, (pe2, _) = e2.run(s2, 30, dt=1.0, chunk=15)

    assert np.abs(np.asarray(pe1) - np.asarray(pe2)).max() < 1e-3
    n = len(pos)
    p2 = np.asarray(s2.positions)[:n]
    idx = np.asarray(s2.atom_index)[:n]
    p2u = np.empty_like(p2)
    p2u[idx] = p2
    np.testing.assert_allclose(
        np.asarray(s1.positions)[:n], p2u, atol=1e-4
    )


def test_md_runner_poscar_input(tmp_path):
    """md yaml runner accepts VASP POSCAR structures."""
    from sevennet_tpu.scripts.md_run import run_md_from_config

    p = tmp_path / "POSCAR"
    p.write_text(
        "HfO2\n1.0\n6.0 0.0 0.0\n0.0 6.0 0.0\n0.0 0.0 6.0\n"
        "Hf O\n4 4\nDirect\n"
        "0.08 0.09 0.10\n0.58 0.08 0.57\n0.09 0.57 0.58\n0.59 0.60 0.08\n"
        "0.33 0.10 0.09\n0.10 0.34 0.58\n0.61 0.33 0.33\n0.40 0.62 0.42\n"
    )
    out = run_md_from_config({"md": {
        "checkpoint": "/root/reference/tests/data/checkpoints/cp_0.pth",
        "structure": str(p), "ensemble": "langevin", "steps": 6,
        "dt": 0.2, "temperature": 300.0, "chunk": 3, "fused": False,
    }}, log=lambda *a: None)
    import numpy as np

    assert np.isfinite(out["thermo"][-1]["pe"])


def test_auto_capacity_growth():
    """A deliberately undersized neighbor capacity triggers the in-run
    auto-growth (snapshot -> bigger capacities -> recompile -> retry), the
    dynamic analogue of LAMMPS' buffer growth (pair_e3gnn.cpp:283-288)."""
    import jax
    import numpy as np

    from bench import water_box
    from sevennet_tpu.md import MDEngine
    from sevennet_tpu.md.neighbor import build_cell_list_spec
    from sevennet_tpu.model import build_model_spec
    from sevennet_tpu.model.model import model_init

    pos, Z, cell = water_box(60)
    spec = build_model_spec({
        "cutoff": 5.0, "channel": 8, "lmax": 1, "is_parity": False,
        "num_convolution_layer": 2, "self_connection_type": "linear",
        "conv_denominator": 35.0, "chemical_species": ["H", "O"],
        "_edge_chunk": 0, "_remat": False,
    })
    params = model_init(jax.random.PRNGKey(0), spec)
    # undersized: half the real max neighbor count
    from sevennet_tpu.data.neighborlist import neighbor_list_numpy

    dst, _, _ = neighbor_list_numpy(pos, 5.6, cell, (True, True, True))
    true_max = int(np.bincount(dst, minlength=len(pos)).max())
    small = build_cell_list_spec(cell, len(pos), 5.0, 0.6,
                                 neighbor_capacity=max(true_max // 2, 4))
    eng = MDEngine(spec, params, cell, fused=False, cl_spec=small)
    st = eng.make_state(pos, Z, temperature=300.0)
    st, (pe, ke) = eng.run(st, 10, dt=0.5, chunk=5)
    assert np.isfinite(np.asarray(pe)).all()
    assert not bool(st.nl_overflow)
    assert eng.cl_spec.neighbor_capacity > max(true_max // 2, 4)


@pytest.mark.slow
def test_npt_mtk_conserves_invariant():
    """MTK Nose-Hoover NPT (fix-npt analogue): the extended-system
    invariant H' = PE+KE+thermostat+barostat+P*V must be ~conserved, and
    the barostat must actually move the volume."""
    from sevennet_tpu.md.integrators import npt_conserved_quantity

    engine, pos, Z, cell = _hfo2_engine(7)
    state = engine.make_state(pos, Z, temperature=300.0, seed=4)
    v0 = float(state.volume())
    kw = dict(temperature=300.0, pressure=0.0, tau_t=40.0, tau_p=200.0)
    h0 = float(npt_conserved_quantity(state, **kw))
    hs = [h0]
    for _ in range(4):
        state, _ = engine.run(state, 20, dt=0.5, integrator="npt", **kw)
        hs.append(float(npt_conserved_quantity(state, **kw)))
    v1 = float(state.volume())
    assert np.isfinite(v1) and v1 > 0
    assert abs(v1 - v0) > 1e-6  # piston moved
    drift = max(abs(h - h0) for h in hs)
    # 27 atoms, 80 x 0.5 fs, fp32: a broken integrator drifts ~eV here
    assert drift < 0.05, (hs, drift)
    assert np.isfinite(np.asarray(state.positions)).all()


@pytest.mark.slow
def test_engine_ring_backward_matches_dense(monkeypatch):
    """End-to-end ring-chunked fused MD (auto cell-sort + window check +
    ring-buffer backward) == the plain dense XLA engine on a small gas,
    with the chunk threshold forced down so the ring path engages."""
    from sevennet_tpu.md import MDEngine
    from sevennet_tpu.model import build_model_spec
    from sevennet_tpu.model.model import model_init

    monkeypatch.setenv("SEVENNET_TPU_CHUNK_THRESHOLD", "1")
    monkeypatch.setenv("SEVENNET_TPU_TARGET_T", "128")
    monkeypatch.setenv("SEVENNET_TPU_RING", "1")  # default off (perf)
    import sevennet_tpu.ops.fused_conv as fc

    fc._KERNEL_CACHE.clear()
    spec = build_model_spec({
        "cutoff": 3.0,
        "channel": 8,
        "lmax": 1,
        "is_parity": False,
        "num_convolution_layer": 2,
        "irreps_manual": ["8x0e", "8x0e+4x1e", "8x0e"],
        "weight_nn_hidden_neurons": [8, 8],
        "radial_basis": {"radial_basis_name": "bessel", "bessel_basis_num": 4},
        "cutoff_function": {"cutoff_function_name": "XPLOR", "cutoff_on": 2.5},
        "self_connection_type": "linear",
        "conv_denominator": 8.0,
        "chemical_species": ["H", "O"],
        "_edge_chunk": 256,
    })
    params = model_init(jax.random.PRNGKey(0), spec)
    rng = np.random.default_rng(7)
    cell = np.eye(3) * 26.0
    pos = rng.uniform(0, 26.0, (240, 3))
    Z = np.where(rng.random(240) < 0.5, 1, 8)

    e_ring = MDEngine(spec, params, cell, fused=True)
    s_ring = e_ring.make_state(pos, Z, temperature=50.0, seed=3)
    assert e_ring._ring_nb >= 3 and e_ring.sort_atoms, (
        e_ring._ring_nb, e_ring.row_chunk)
    assert e_ring.spec.conv_ring
    e_ref = MDEngine(spec, params, cell, fused=False, sort_atoms=False)
    s_ref = e_ref.make_state(pos, Z, temperature=50.0, seed=3)

    def unsort(state):
        order = np.argsort(np.asarray(state.atom_index))
        return (np.asarray(state.forces)[order],
                np.asarray(state.positions)[order])

    f1, p1 = unsort(s_ring)
    f0, p0 = unsort(s_ref)
    n = len(pos)
    np.testing.assert_allclose(f1[:n], f0[:n], atol=5e-5)
    np.testing.assert_allclose(
        float(s_ring.potential_energy), float(s_ref.potential_energy),
        atol=1e-4,
    )

    s_ring, _ = e_ring.run(s_ring, 3, dt=0.5, integrator="nve", chunk=3)
    s_ref, _ = e_ref.run(s_ref, 3, dt=0.5, integrator="nve", chunk=3)
    _, p1 = unsort(s_ring)
    _, p0 = unsort(s_ref)
    np.testing.assert_allclose(p1[:n], p0[:n], atol=1e-4)


def test_host_initial_build_matches_device_rebuild(monkeypatch):
    """make_state's host-side numpy graph construction (round 5 — skips
    the standalone jit(_rebuild), whose remote compile cost up to 20 min
    at 100k atoms) produces the same initial physics as the device
    rebuild, sorted and unsorted, including a ring-engaged engine."""
    from bench import water_box
    from sevennet_tpu.model import build_model_spec
    from sevennet_tpu.model.model import model_init
    from sevennet_tpu.md import MDEngine

    pos, Z, cell = water_box(80)
    spec = build_model_spec(
        {"cutoff": 5.0, "chemical_species": ["H", "O"], "_remat": False,
         "_edge_chunk": 512}
    )
    params = model_init(jax.random.PRNGKey(0), spec)
    # chunk threshold forced down so the ring/sorted machinery engages
    monkeypatch.setenv("SEVENNET_TPU_CHUNK_THRESHOLD", "100000")

    def forces_of(host_build):
        monkeypatch.setenv("SEVENNET_TPU_HOST_BUILD", str(int(host_build)))
        eng = MDEngine(spec, params, cell, fused=True,
                       matmul_precision="highest")
        st = eng.make_state(pos, Z)
        f = np.asarray(st.forces)
        idx = np.asarray(st.atom_index)
        out = np.zeros((len(Z), 3), f.dtype)
        ok = idx < len(Z)
        out[idx[ok]] = f[ok]
        return eng, out, float(st.potential_energy)

    e1, f1, pe1 = forces_of(True)
    e0, f0, pe0 = forces_of(False)
    assert e1._ring_nb and e1.sort_atoms  # the 100k-scale configuration
    np.testing.assert_allclose(f1, f0, atol=5e-5)
    assert abs(pe1 - pe0) < 1e-4
