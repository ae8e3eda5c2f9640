"""Cross-framework numerical parity: torch fp64 evaluator vs this framework.

The torch side (``tests/torch_eval.py``) implements the SevenNet forward
independently — mul_ir layout, checkpoint w3j buffers, reference module
semantics — and runs in float64. Agreement here is the cross-framework
analogue of the reference's pretrained golden tests
(``/root/reference/tests/unit_tests/test_pretrained.py:32-62``), replacing
the round-1 self-generated goldens.

Tolerances: the JAX side runs float32, so parity is bounded by fp32
round-off; the BASELINE force target (<1 meV/A) is asserted directly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

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


@pytest.fixture(scope="module")
def torch_golden(reference_checkpoint_path, hfo2_structure, small_spec_params):
    from .torch_eval import evaluate

    spec, _ = small_spec_params
    pos, Z, cell = hfo2_structure
    return evaluate(reference_checkpoint_path, pos, Z, cell, _layer_plan(spec))


pytestmark = pytest.mark.smoke


def test_energy_parity(small_spec_params, hfo2_structure, torch_golden):
    spec, params = small_spec_params
    pos, Z, cell = hfo2_structure
    gb = build_graph(spec, pos, Z, cell, n_atoms_cap=16, n_edges_cap=300)
    out = compute(spec, params, gb)
    e_jax = float(out["energy"][0])
    assert abs(e_jax - torch_golden["energy"]) < 5e-5, (
        e_jax, torch_golden["energy"]
    )


def test_force_parity(small_spec_params, hfo2_structure, torch_golden):
    spec, params = small_spec_params
    pos, Z, cell = hfo2_structure
    gb = build_graph(spec, pos, Z, cell, n_atoms_cap=16, n_edges_cap=300)
    out = compute(spec, params, gb)
    f_jax = np.asarray(out["forces"])[: len(pos)]
    mae = np.abs(f_jax - torch_golden["forces"]).mean()
    assert mae < 1e-3, f"force MAE vs torch fp64: {mae:.2e} eV/A"  # BASELINE
    assert np.abs(f_jax - torch_golden["forces"]).max() < 5e-3


def test_stress_parity(small_spec_params, hfo2_structure, torch_golden):
    spec, params = small_spec_params
    pos, Z, cell = hfo2_structure
    gb = build_graph(spec, pos, Z, cell, n_atoms_cap=16, n_edges_cap=300)
    out = compute(spec, params, gb)
    s_jax = np.asarray(out["stress"])[0]
    assert np.abs(s_jax - torch_golden["stress"]).max() < 1e-5
