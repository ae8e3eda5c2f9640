"""Multi-fidelity (modality) support: one-hot appended to selected linears
(reference patch_modality, model_build.py:185-230) and modal-wise rescale
(sevenn/nn/scale.py ModalWiseRescale)."""

import dataclasses

import jax
import numpy as np
import pytest

from sevennet_tpu.model import build_model_spec
from sevennet_tpu.model.model import model_init

from .conftest import build_graph, compute

MODAL_CONFIG = {
    "cutoff": 4.0,
    "channel": 4,
    "lmax": 1,
    "is_parity": False,
    "num_convolution_layer": 2,
    "chemical_species": ["Hf", "O"],
    "self_connection_type": "linear",
    "conv_denominator": 6.0,
    "use_modality": True,
    "num_modalities": 2,
    "modal_map": {"pbe": 0, "scan": 1},
    "use_modal_node_embedding": False,
    "use_modal_self_inter_intro": True,
    "use_modal_self_inter_outro": True,
    "use_modal_output_block": True,
    "use_modal_wise_shift": True,
    "use_modal_wise_scale": False,
    "shift": [[-1.0, -2.0], [-1.5, -2.5]],  # (modal, species)
    "scale": [0.5, 0.7],  # per species
}


@pytest.fixture(scope="module")
def modal_model():
    spec = build_model_spec(MODAL_CONFIG)
    params = model_init(jax.random.PRNGKey(0), spec)
    return spec, params


def test_modal_spec(modal_model):
    spec, params = modal_model
    assert spec.num_modalities == 2
    assert "0_self_interaction_1" in spec.modal_linears
    assert "reduce_input_to_hidden" in spec.modal_linears
    assert "onehot_to_feature_x" not in spec.modal_linears
    # modal block appended to si1 input irreps
    assert spec.layers[0].si1.irreps_in.dim == spec.layers[0].irreps_x.dim + 2
    # modal-wise shift array
    assert np.asarray(params["rescale_atomic_energy"]["shift"]).shape == (2, 2)
    assert np.asarray(params["rescale_atomic_energy"]["scale"]).shape == (2,)


def test_modal_changes_prediction(modal_model):
    spec, params = modal_model
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 6, (8, 3))
    Z = rng.choice([72, 8], 8)
    gb0 = build_graph(spec, pos, Z, np.eye(3) * 6.0)
    gb1 = gb0.replace(modal=gb0.modal + 1)
    e0 = float(compute(spec, params, gb0)["energy"][0])
    e1 = float(compute(spec, params, gb1)["energy"][0])
    assert abs(e0 - e1) > 1e-6  # modalities genuinely differ
    assert np.isfinite(e0) and np.isfinite(e1)


def test_modal_batch_consistency(modal_model):
    """A batch with mixed modalities == separate single evaluations."""
    import jax.numpy as jnp

    from sevennet_tpu.data import batch_graphs, graph_from_arrays, neighbor_list_numpy

    spec, params = modal_model
    rng = np.random.default_rng(1)
    singles = []
    graphs = []
    for modal in (0, 1):
        pos = rng.uniform(0, 6, (6, 3))
        Z = rng.choice([72, 8], 6)
        species = spec.z_to_type[Z]
        dst, src, S = neighbor_list_numpy(pos, spec.cutoff, np.eye(3) * 6, True)
        g = graph_from_arrays(pos, species, src, dst, S, np.eye(3) * 6, modal=modal)
        graphs.append(g)
        singles.append(float(compute(spec, params, batch_graphs([g]))["energy"][0]))
    big = batch_graphs(graphs, n_atoms_cap=16, n_edges_cap=1024, n_graphs_cap=3)
    out = compute(spec, params, big)
    assert abs(float(out["energy"][0]) - singles[0]) < 1e-4
    assert abs(float(out["energy"][1]) - singles[1]) < 1e-4


def test_append_modality(modal_model):
    """Appending a modality preserves predictions for existing modalities."""
    from sevennet_tpu.scripts.modal_tools import append_modality

    spec, params = modal_model
    rng = np.random.default_rng(2)
    pos = rng.uniform(0, 6, (8, 3))
    Z = rng.choice([72, 8], 8)
    gb = build_graph(spec, pos, Z, np.eye(3) * 6.0)
    e_before = float(compute(spec, params, gb)["energy"][0])

    cfg2, params2 = append_modality(dict(MODAL_CONFIG), params, "r2scan", copy_from=1)
    spec2 = build_model_spec(cfg2)
    assert spec2.num_modalities == 3
    e_after = float(compute(spec2, params2, gb)["energy"][0])
    assert abs(e_before - e_after) < 1e-5
    # new modality initialized from modality 1
    gb1 = gb.replace(modal=gb.modal + 1)
    gb2 = gb.replace(modal=gb.modal + 2)
    e1 = float(compute(spec2, params2, gb1)["energy"][0])
    e2 = float(compute(spec2, params2, gb2)["energy"][0])
    assert abs(e1 - e2) < 1e-5


def test_pinned_modal(modal_model):
    """select_modality pins the modality: pinned spec output == unpinned
    with graph.modal set to that index, regardless of graph.modal."""
    import dataclasses

    spec, params = modal_model
    rng = np.random.default_rng(1)
    pos = rng.uniform(0, 6, (8, 3))
    Z = rng.choice([72, 8], 8)
    gb0 = build_graph(spec, pos, Z, np.eye(3) * 6.0)
    gb1 = gb0.replace(modal=gb0.modal + 1)  # modality 1

    spec_pin = dataclasses.replace(spec, pinned_modal=1)
    e_ref = float(compute(spec, params, gb1)["energy"][0])
    e_pin0 = float(compute(spec_pin, params, gb0)["energy"][0])
    e_unpinned0 = float(compute(spec, params, gb0)["energy"][0])
    assert abs(e_pin0 - e_ref) < 1e-6
    assert abs(e_pin0 - e_unpinned0) > 1e-6


def test_select_modality_tool(modal_model):
    from sevennet_tpu.model import build_model_spec
    from sevennet_tpu.scripts.modal_tools import select_modality

    cfg = dict(MODAL_CONFIG)
    cfg2, params2 = select_modality(cfg, modal_model[1], "scan")
    spec2 = build_model_spec(cfg2)
    assert spec2.pinned_modal == 1


def test_multimodal_dataset_and_training(tmp_path):
    """Two-modality training end-to-end: combined statistics, per-graph
    modality in batches, loss decreases."""
    from sevennet_tpu.atoms import AtomsLite
    from sevennet_tpu.data.extxyz import write_extxyz
    from sevennet_tpu.data.modal_dataset import MultiModalDataset
    from sevennet_tpu.scripts.train import train_run

    rng = np.random.default_rng(3)
    for name, e_base in (("pbe", -1.0), ("scan", -2.0)):
        frames = []
        for i in range(6):
            n = 5
            pos = rng.uniform(0, 6, (n, 3))
            frames.append(AtomsLite(
                positions=pos, numbers=rng.choice([8, 1], n),
                cell=np.eye(3) * 6.0, pbc=True,
                energy=e_base * n + 0.05 * rng.normal(),
                forces=rng.normal(size=(n, 3)) * 0.1,
            ))
        write_extxyz(str(tmp_path / f"{name}.extxyz"), frames)

    entries = [
        {"data_modality": "pbe",
         "file_list": [{"file": str(tmp_path / "pbe.extxyz")}],
         "data_weight": {"energy": 1.0, "force": 0.5}},
        {"data_modality": "scan",
         "file_list": [{"file": str(tmp_path / "scan.extxyz")}]},
    ]
    mm = MultiModalDataset.from_config(entries, 4.0)
    assert sorted(mm.modal_map) == ["pbe", "scan"]
    # modal-wise per-atom energy means differ by construction
    means = mm.per_atom_energy_mean
    assert means[0] > means[1]
    assert np.isfinite(mm.force_rms) and mm.force_rms > 0
    # data weights folded into structures
    g = mm.datasets["pbe"].build(np.arange(120)).graphs[0]
    assert abs(float(g.data_weight[0][1]) - 0.5) < 1e-6

    model_cfg = {
        "cutoff": 4.0, "channel": 4, "lmax": 1, "is_parity": False,
        "num_convolution_layer": 2, "chemical_species": "auto",
        "conv_denominator": 8.0,
        "use_modality": True,
        "use_modal_self_inter_intro": True,
        "use_modal_output_block": True,
        "use_modal_wise_shift": True,
        "shift": "per_atom_energy_mean", "scale": 1.0,
    }
    tcfg = {"epoch": 4, "optim_param": {"lr": 0.01}, "train_shuffle": True,
            "per_epoch": 10}
    data_cfg = {"load_trainset_path": entries, "batch_size": 4}
    train_run(model_cfg, tcfg, data_cfg, working_dir=str(tmp_path / "run"),
              max_epochs=4)
    import csv

    with open(tmp_path / "run" / "lc.csv") as f:
        rows = list(csv.DictReader(f))
    first = float(rows[0]["train_loss_total"])
    last = float(rows[-1]["train_loss_total"])
    assert last < first, (first, last)
