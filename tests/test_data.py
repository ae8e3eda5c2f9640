import numpy as np
import pytest

from sevennet_tpu.atoms import AtomsLite
from sevennet_tpu.data.dataset import GraphDataset
from sevennet_tpu.data.extxyz import read_extxyz, write_extxyz


@pytest.fixture()
def frames(tmp_path):
    rng = np.random.default_rng(0)
    out = []
    for i in range(6):
        n = 4 + i
        cell = np.eye(3) * (5.0 + 0.3 * i)
        pos = rng.uniform(0, 5, (n, 3))
        Z = rng.choice([8, 1], n)
        out.append(
            AtomsLite(
                positions=pos,
                numbers=Z,
                cell=cell,
                pbc=True,
                energy=float(-3.0 * n + rng.normal()),
                forces=rng.normal(size=(n, 3)),
                stress=rng.normal(size=6) * 0.01,
            )
        )
    return out


def test_extxyz_roundtrip(tmp_path, frames):
    path = str(tmp_path / "data.extxyz")
    write_extxyz(path, frames)
    back = read_extxyz(path)
    assert len(back) == len(frames)
    for a, b in zip(frames, back):
        assert np.allclose(a.positions, b.positions, atol=1e-8)
        assert (a.numbers == b.numbers).all()
        assert np.allclose(a.cell, b.cell, atol=1e-8)
        assert abs(a.energy - b.energy) < 1e-8
        assert np.allclose(a.forces, b.forces, atol=1e-8)
        assert np.allclose(a.stress, b.stress, atol=1e-12)


def test_dataset_statistics(frames):
    ds = GraphDataset(frames, cutoff=4.0)
    st = ds.statistics
    pae = np.array([f.energy / len(f) for f in frames])
    assert abs(st["per_atom_energy_mean"] - pae.mean()) < 1e-8
    assert abs(st["per_atom_energy_std"] - pae.std()) < 1e-8
    fcat = np.concatenate([f.forces.reshape(-1) for f in frames])
    assert abs(st["force_rms"] - np.sqrt((fcat**2).mean())) < 1e-8
    assert st["avg_num_neigh"] > 0
    # elemwise reference energies: ridge solution reproduces energies roughly
    ref = np.asarray(st["elemwise_reference_energies"])
    for f in frames:
        est = sum(ref[z] for z in f.numbers)
        assert abs(est - f.energy) < 5.0


def test_dataset_batching(frames):
    from sevennet_tpu.model.build import symbols_to_type_map

    tm = symbols_to_type_map(["H", "O"])
    z2t = -np.ones(120, np.int32)
    for z, t in tm.items():
        z2t[z] = t
    ds = GraphDataset(frames, cutoff=4.0).build(z2t)
    batches = list(ds.batches(batch_size=4, pad_multiple=32))
    assert len(batches) == 2
    total_real = sum(int(np.asarray(b.atom_mask).sum()) for b in batches)
    assert total_real == sum(len(f) for f in frames)
    # capacities are multiples of 32
    for b in batches:
        assert b.n_atoms_cap % 32 == 0 and b.n_edges_cap % 32 == 0


def test_nan_labels_masked(frames):
    """Frames without labels produce NaN labels that losses must mask."""
    import jax

    from sevennet_tpu.model import build_model_spec
    from sevennet_tpu.model.model import model_init
    from sevennet_tpu.train.loss import LossConfig, compute_losses

    from .conftest import compute

    frames2 = [
        AtomsLite(positions=f.positions, numbers=f.numbers, cell=f.cell, pbc=True)
        for f in frames[:2]
    ]  # no labels at all
    spec = build_model_spec(
        {"cutoff": 4.0, "channel": 4, "lmax": 1, "num_convolution_layer": 2,
         "chemical_species": ["H", "O"], "conv_denominator": 10.0}
    )
    params = model_init(jax.random.PRNGKey(0), spec)
    ds = GraphDataset(frames2, cutoff=4.0).build(spec.z_to_type)
    gb = next(ds.batches(2))
    out = compute(spec, params, gb)
    total, losses = compute_losses(out, gb, LossConfig())
    assert np.isfinite(float(total))
    assert float(losses["energy"]) == 0.0  # all unlabeled -> masked to zero
    assert float(losses["force"]) == 0.0


def test_outcar_reader():
    import os

    path = "/root/reference/example_inputs/data/label_1/OUTCAR_1"
    if not os.path.exists(path):
        pytest.skip("reference OUTCAR not available")
    from sevennet_tpu.data.vasp import read_outcar

    frames = read_outcar(path)
    assert len(frames) >= 1
    f = frames[-1]
    assert len(f) == 96
    assert sorted(set(f.symbols)) == ["Hf", "O"]
    assert f.energy is not None and f.energy < 0
    assert f.forces.shape == (96, 3)
    assert f.stress.shape == (6,)
    assert abs(np.linalg.det(f.cell)) > 100


def test_structure_list_reader(tmp_path):
    import os

    base = "/root/reference/example_inputs/data"
    if not os.path.exists(base):
        pytest.skip("reference example data not available")
    sl = tmp_path / "structure_list"
    sl.write_text(
        f"[train]\n{base}/label_1/OUTCAR_1 :\n[valid]\n{base}/label_2/OUTCAR_6 0\n"
    )
    from sevennet_tpu.data.vasp import read_structure_list

    groups = read_structure_list(str(sl))
    assert set(groups) == {"train", "valid"}
    assert len(groups["train"]) >= 1 and len(groups["valid"]) == 1


def test_dataset_cache_roundtrip(frames, tmp_path):
    from sevennet_tpu.model.build import symbols_to_type_map

    tm = symbols_to_type_map(["H", "O"])
    z2t = -np.ones(120, np.int32)
    for z, t in tm.items():
        z2t[z] = t
    ds = GraphDataset(frames, cutoff=4.0).build(z2t)
    _ = ds.statistics
    path = str(tmp_path / "cache")
    ds.save_cache(path)
    ds2 = GraphDataset.load_cache(path)
    assert len(ds2.graphs) == len(ds.graphs)
    assert abs(ds2.statistics["force_rms"] - ds.statistics["force_rms"]) < 1e-9
    b1 = next(ds.batches(3))
    b2 = next(ds2.batches(3))
    assert np.allclose(np.asarray(b1.positions), np.asarray(b2.positions))
    assert np.allclose(np.asarray(b1.energy), np.asarray(b2.energy), equal_nan=True)


def test_lazy_batches(frames):
    from sevennet_tpu.model.build import symbols_to_type_map

    tm = symbols_to_type_map(["H", "O"])
    z2t = -np.ones(120, np.int32)
    for z, t in tm.items():
        z2t[z] = t
    ds_eager = GraphDataset(frames, cutoff=4.0).build(z2t)
    ds_lazy = GraphDataset(frames, cutoff=4.0, z_to_type=z2t)
    for b1, b2 in zip(ds_eager.batches(3), ds_lazy.batches(3, lazy=True)):
        assert np.allclose(np.asarray(b1.positions), np.asarray(b2.positions))
        assert (np.asarray(b1.edge_src) == np.asarray(b2.edge_src)).all()


def test_multiprocess_build_matches_serial(frames):
    """processes>1 graph build (reference mp.Pool graph_build,
    dataload.py:226-269) produces identical graphs."""
    z2t = -np.ones(119, np.int64)
    z2t[1], z2t[8] = 0, 1
    ds1 = GraphDataset(list(frames), 4.0).build(z2t)
    ds2 = GraphDataset(list(frames), 4.0).build(z2t, processes=2)
    assert len(ds1.graphs) == len(ds2.graphs)
    for g1, g2 in zip(ds1.graphs, ds2.graphs):
        assert np.allclose(g1.positions, g2.positions)
        assert np.array_equal(np.asarray(g1.edge_src), np.asarray(g2.edge_src))
        assert np.allclose(g1.edge_shift, g2.edge_shift)


def test_read_structures_dispatch(tmp_path, frames):
    """Universal reader: extxyz + POSCAR natively; unknown formats raise a
    helpful error when ASE is absent (reference dataload.py:351-519)."""
    from sevennet_tpu.data.readers import read_structures

    path = str(tmp_path / "data.extxyz")
    write_extxyz(path, frames)
    back = read_structures(path)
    assert len(back) == len(frames)

    poscar = tmp_path / "POSCAR"
    poscar.write_text(
        "test\n1.0\n4.0 0 0\n0 4.0 0\n0 0 4.0\nO H\n1 1\nCartesian\n"
        "0 0 0\n1.0 0 0\n"
    )
    ats = read_structures(str(poscar))
    assert len(ats) == 1 and len(ats[0]) == 2
    assert sorted(ats[0].numbers.tolist()) == [1, 8]

    weird = tmp_path / "data.cif"
    weird.write_text("not really a cif\n")
    try:
        import ase  # noqa: F401
        has_ase = True
    except ImportError:
        has_ase = False
    if not has_ase:
        with pytest.raises(ValueError, match="ASE"):
            read_structures(str(weird))

    ds = GraphDataset.from_files(path, 4.0)
    assert len(ds) == len(frames)


def test_error_recorder_matches_manual(frames):
    """ErrorRecorder streaming values == closed-form numpy on the same
    predictions (reference metric semantics: vector RMSE, per-atom energy,
    kbar stress; error_recorder.py:168-218)."""
    import jax

    from sevennet_tpu.data.graph import batch_graphs
    from sevennet_tpu.data.dataset import atoms_to_graph
    from sevennet_tpu.train.error_recorder import ErrorRecorder, RecorderSpec
    from sevennet_tpu.train.loss import TO_KBAR

    z2t = np.full(120, -1, np.int64)
    z2t[1], z2t[8] = 0, 1
    graphs = [atoms_to_graph(a, 4.0, z2t) for a in frames]
    rng = np.random.default_rng(1)

    spec = RecorderSpec.from_config([
        ("Energy", "RMSE"), ("TotalEnergy", "RMSE"), ("Force", "RMSE"),
        ("Force", "ComponentRMSE"), ("Force", "MAE"), ("Stress", "RMSE"),
        ("TotalLoss", "None"),
    ])
    rec = ErrorRecorder(spec)

    # manual accumulators
    e_sq, e_tot_sq, ng = 0.0, 0.0, 0
    f_sq, f_abs, na = 0.0, 0.0, 0
    s_sq = 0.0
    for i in range(0, len(graphs), 2):
        gb = batch_graphs(graphs[i : i + 2])
        out = {
            "energy": np.asarray(gb.energy) + rng.normal(size=gb.energy.shape) * 0.5,
            "forces": np.asarray(gb.forces) + rng.normal(size=gb.forces.shape) * 0.1,
            "stress": np.asarray(gb.stress) + rng.normal(size=gb.stress.shape) * 0.01,
        }
        out = {k: np.nan_to_num(np.asarray(v, np.float32)) for k, v in out.items()}
        out_j = {k: jax.numpy.asarray(v) for k, v in out.items()}
        rec.update(out_j, gb)
        gm = np.asarray(gb.graph_mask)
        am = np.asarray(gb.atom_mask)
        nat = np.asarray(gb.num_atoms)
        de = (out["energy"] - np.asarray(gb.energy))[gm]
        e_sq += np.sum((de / nat[gm]) ** 2)
        e_tot_sq += np.sum(de**2)
        ng += gm.sum()
        df = (out["forces"] - np.asarray(gb.forces))[am]
        f_sq += np.sum(df**2)
        f_abs += np.sum(np.abs(df))
        na += am.sum()
        dstr = (out["stress"] - np.asarray(gb.stress))[gm] * TO_KBAR
        s_sq += np.sum(dstr**2)

    got = rec.get_current()
    assert np.isclose(got["Energy_RMSE"], np.sqrt(e_sq / ng), rtol=1e-4)
    assert np.isclose(got["TotalEnergy_RMSE"], np.sqrt(e_tot_sq / ng), rtol=1e-4)
    assert np.isclose(got["Force_RMSE"], np.sqrt(f_sq / na), rtol=1e-4)
    assert np.isclose(got["Force_ComponentRMSE"], np.sqrt(f_sq / (3 * na)), rtol=1e-4)
    assert np.isclose(got["Force_MAE"], f_abs / (3 * na), rtol=1e-4)
    assert np.isclose(got["Stress_RMSE"], np.sqrt(s_sq / ng), rtol=1e-4)
    assert np.isfinite(got["TotalLoss"])
    # display surface
    md = rec.get_metric_dict(with_unit=True)
    assert any(k.startswith("Force_RMSE (eV/") for k in md)
    assert "Energy_RMSE (eV/atom)" in md
    dct = rec.get_dct("valid")
    assert any(k.startswith("valid_") for k in dct)
