"""Cross-framework parity at FLAGSHIP width (VERDICT r3 item 4).

The cp_0-based tests cover a 4-8-channel toy architecture; here we run the
full 128-channel/5-layer SevenNet-0 architecture (and the lmax=3 l3i5
architecture) with randomly initialized weights through the independent
float64 torch evaluator (``tests/torch_eval.py``), sharing the weights via
the reference-layout state-dict export
(:func:`sevennet_tpu.io.torch_checkpoint.state_dict_from_params`).

Reference pattern: ``/root/reference/tests/unit_tests/test_pretrained.py:32-62``
(golden E/F/S agreement), applied at the production width instead of 4-8
channels.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from sevennet_tpu.io.torch_checkpoint import state_dict_from_params
from sevennet_tpu.model import build_model_spec
from sevennet_tpu.model.model import model_init

from .conftest import build_graph, compute


def _layer_plan(spec):
    return {
        "embed_out": str(spec.embed_linear.irreps_out),
        "readout_hidden": str(spec.readout1.irreps_out),
        "layers": [
            {
                "x": str(L.si1.irreps_in),
                "filter": str(L.conv.irreps_filter),
                "target": str(L.conv.irreps_out_target),
                "gate_in": str(L.si2.irreps_out),
                "out": str(L.gate.irreps_out),
            }
            for L in spec.layers
        ],
    }


def _cfg_for_torch(spec, cutoff_function):
    type_map = {}
    for z, t in enumerate(np.asarray(spec.z_to_type)):
        if t >= 0:
            type_map[int(z)] = int(t)
    return {
        "cutoff": float(spec.cutoff),
        "_type_map": type_map,
        "lmax": int(spec.lmax_edge),
        "act_scalar": {"e": "silu", "o": "tanh"},
        "act_gate": {"e": "silu", "o": "tanh"},
        "act_radial": "silu",
        "_normalize_sph": True,
        "cutoff_function": cutoff_function,
    }


def _run_parity(cfg_model, cutoff_function, hfo2, tol_f=1e-3):
    from .torch_eval import evaluate_state

    pos, Z, cell = hfo2
    spec = build_model_spec(cfg_model)
    params = model_init(jax.random.PRNGKey(7), spec)
    # nontrivial shift/scale so the rescale path is exercised
    params["rescale_atomic_energy"]["shift"] = (
        params["rescale_atomic_energy"]["shift"] - 2.5
    )
    params["rescale_atomic_energy"]["scale"] = (
        params["rescale_atomic_energy"]["scale"] * 1.7
    )
    sd_np = state_dict_from_params(spec, params)
    sd = {k: torch.as_tensor(np.asarray(v, np.float64)) for k, v in sd_np.items()}
    golden = evaluate_state(
        sd, _cfg_for_torch(spec, cutoff_function), pos, Z, cell,
        _layer_plan(spec),
    )

    gb = build_graph(spec, pos, Z, cell, n_atoms_cap=16, n_edges_cap=800)
    out = compute(spec, params, gb)
    e = float(out["energy"][0])
    f = np.asarray(out["forces"])[: len(pos)]
    s = np.asarray(out["stress"])[0]

    de = abs(e - golden["energy"]) / max(1.0, abs(golden["energy"]))
    mae = np.abs(f - golden["forces"]).mean()
    assert de < 5e-5, (e, golden["energy"])
    assert mae < tol_f, f"force MAE vs torch fp64: {mae:.2e} eV/A"
    assert np.abs(s - golden["stress"]).max() < 5e-4, (s, golden["stress"])


def test_flagship_sevennet0_arch_parity(hfo2_structure):
    """128-channel / 5-layer / lmax 2 / XPLOR / linear self-connection —
    the SevenNet-0 production architecture (presets/sevennet-0.yaml)."""
    cfg = {
        "cutoff": 5.0,
        "channel": 128,
        "lmax": 2,
        "is_parity": False,
        "num_convolution_layer": 5,
        "irreps_manual": [
            "128x0e",
            "128x0e+64x1e+32x2e",
            "128x0e+64x1e+32x2e",
            "128x0e+64x1e+32x2e",
            "128x0e+64x1e+32x2e",
            "128x0e",
        ],
        "weight_nn_hidden_neurons": [64, 64],
        "radial_basis": {"radial_basis_name": "bessel", "bessel_basis_num": 8},
        "cutoff_function": {"cutoff_function_name": "XPLOR", "cutoff_on": 4.5},
        "self_connection_type": "linear",
        "conv_denominator": 35.0,
        "chemical_species": ["Hf", "O"],
        "_remat": False,
    }
    _run_parity(
        cfg, {"cutoff_function_name": "XPLOR", "cutoff_on": 4.5},
        hfo2_structure,
    )


@pytest.mark.slow
def test_l3i5_arch_parity(hfo2_structure):
    """128-channel / 5-layer / lmax 3 / poly cutoff / nequip
    self-connection — the l3i5 architecture (presets/sevennet-l3i5.yaml)."""
    cfg = {
        "cutoff": 5.0,
        "channel": 128,
        "lmax": 3,
        "is_parity": False,
        "num_convolution_layer": 5,
        "irreps_manual": [
            "128x0e",
            "128x0e+64x1e+32x2e+32x3e",
            "128x0e+64x1e+32x2e+32x3e",
            "128x0e+64x1e+32x2e+32x3e",
            "128x0e+64x1e+32x2e+32x3e",
            "128x0e",
        ],
        "weight_nn_hidden_neurons": [64, 64],
        "radial_basis": {"radial_basis_name": "bessel", "bessel_basis_num": 8},
        "cutoff_function": {
            "cutoff_function_name": "poly_cut", "poly_cut_p_value": 6,
        },
        "self_connection_type": "nequip",
        "conv_denominator": 35.0,
        "chemical_species": ["Hf", "O"],
        "_remat": False,
    }
    _run_parity(
        cfg,
        {"cutoff_function_name": "poly_cut", "poly_cut_p_value": 6},
        hfo2_structure,
    )
