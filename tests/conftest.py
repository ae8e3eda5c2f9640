import os

import numpy as np
import pytest

REFERENCE_CP = "/root/reference/tests/data/checkpoints/cp_0.pth"

# ---------------------------------------------------------------------------
# Test-time partition (round 5): `pytest -m "not slow"` must finish < 10 min
# on ONE CPU core (the judging budget; mirrors the reference's quick CI gate,
# /root/reference/.github/workflows/test.yml:30-43). The names below are the
# long-running redundancy — each is either a heavier parametrization of a
# case that stays in the quick set, or a long-soak variant of a family whose
# core semantics another quick test pins. Measured single-core durations in
# parentheses (round-5 run, full suite = 1755 s; after this partition the
# quick set is ~540 s). `pytest -m smoke` (~85 s) remains the 2-minute gate.
# ---------------------------------------------------------------------------
_SLOW_BY_NAME = {
    # kernel equivalence: keep chunked[False], vec_ring[False-2-8],
    # backward[False], bwd_block_mismatch[False], grad_of_grad[emb]
    "test_fused_conv.py::test_fused_chunked_matches_unchunked[True]",  # 82 s
    "test_fused_conv.py::test_fused_grad_of_grad_matches_xla[sh]",     # 42 s
    "test_fused_conv.py::test_fused_ring_matches_unchunked[False]",    # 34 s
    "test_fused_conv.py::test_fused_ring_matches_unchunked[True]",     # 21 s
    "test_fused_conv.py::test_fused_bwd_block_mismatch[True]",         # 32 s
    "test_fused_conv.py::test_fused_backward_matches_xla[True]",       # 27 s
    "test_fused_conv.py::test_fused_vec_ring_matches_unchunked[True-2-8]",   # 29 s
    "test_fused_conv.py::test_fused_vec_ring_matches_unchunked[True-1-16]",  # 23 s
    "test_fused_conv.py::test_fused_vec_ring_matches_unchunked[False-1-16]", # 23 s
    "test_dense_conv.py::test_backward_matches_autodiff[0]",           # 33 s
    "test_dense_conv.py::test_double_backward_force_training",         # 40 s
    # MD engine: quick set keeps NVE/Langevin equivalence + overflow
    # recovery; ensembles/soaks/IO move out
    "test_md.py::test_dense_streaming_matches_unchunked",              # 63 s
    "test_md.py::test_engine_stress_and_pressure_sign",                # 53 s
    "test_md.py::test_dense_conv_matches_flat",                        # 38 s
    "test_md.py::test_npt_berendsen_changes_volume",                   # 37 s
    "test_md.py::test_md_cli_runner",                                  # 35 s
    "test_md.py::test_nose_hoover_regulates_temperature",              # 34 s
    "test_md.py::test_trajectory_dump_roundtrip",                      # 30 s
    "test_md.py::test_md_runner_poscar_input",                         # 27 s
    "test_md.py::test_auto_capacity_growth",                           # 25 s
    # trainer: keep test_train_loop_decreases_loss + continue smoke
    "test_train.py::test_kill_and_resume_reproduces_run",              # 57 s
    "test_train.py::test_train_fused_matches_dense",                   # 54 s
    # calculator: keep test_batched_calculator + ASE smoke
    "test_calculator.py::test_fused_calculator_matches_flat",          # 63 s
    "test_calculator.py::test_bucketing_reuses_compilation",           # 30 s
    # one structure [0] stays smoke; [2] (triclinic) stays quick
    "test_deployed_golden.py::test_serial_deployed_parity[1]",         # 25 s
    "test_parallel.py::test_distributed_matches_serial[1]",            # 20 s
    "test_model.py::test_batching_consistency",                        # 44 s
    "test_model.py::test_second_derivatives_exist",                    # 29 s
    "test_d3.py::test_d3_in_md_engine",                                # 67 s
    "test_checkpoint.py::test_energy_forces_consistency",              # 33 s
    "test_modal.py::test_multimodal_dataset_and_training",             # 23 s
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.nodeid.split("tests/")[-1]
        if name in _SLOW_BY_NAME:
            item.add_marker(pytest.mark.slow)


def has_reference():
    return os.path.exists(REFERENCE_CP)


@pytest.fixture(scope="session")
def reference_checkpoint_path():
    if not has_reference():
        pytest.skip("reference checkpoint not available")
    return REFERENCE_CP


@pytest.fixture(scope="session")
def small_spec_params(reference_checkpoint_path):
    from sevennet_tpu.io import load_sevennet_checkpoint

    return load_sevennet_checkpoint(reference_checkpoint_path)


@pytest.fixture(scope="session")
def hfo2_structure():
    """12-atom jittered fluorite-like HfO2 cell (Hf x4, O x8)."""
    rng = np.random.default_rng(42)
    a = 5.1
    cell = np.eye(3) * a
    frac = np.array(
        [
            [0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5],
            [0.25, 0.25, 0.25], [0.75, 0.75, 0.25], [0.75, 0.25, 0.75],
            [0.25, 0.75, 0.75], [0.75, 0.75, 0.75], [0.25, 0.25, 0.75],
            [0.25, 0.75, 0.25], [0.75, 0.25, 0.25],
        ]
    )
    pos = frac @ cell + rng.normal(scale=0.05, size=(12, 3))
    Z = np.array([72] * 4 + [8] * 8)
    return pos, Z, cell


def build_graph(spec, pos, Z, cell, pbc=True, n_atoms_cap=None, n_edges_cap=None):
    from sevennet_tpu.data import (
        batch_graphs,
        graph_from_arrays,
        neighbor_list_numpy,
    )

    species = spec.z_to_type[Z]
    assert (species >= 0).all()
    dst, src, shifts = neighbor_list_numpy(pos, spec.cutoff, cell, pbc)
    g = graph_from_arrays(pos, species, src, dst, shifts, cell)
    return batch_graphs([g], n_atoms_cap=n_atoms_cap, n_edges_cap=n_edges_cap)


_JIT_COMPUTE_CACHE = {}


def compute(spec, params, graph):
    """Jitted model_compute keyed by spec (remat in eager mode is pathologically
    slow; production always runs under jit)."""
    import jax

    from sevennet_tpu.model.model import model_compute

    if spec not in _JIT_COMPUTE_CACHE:
        _JIT_COMPUTE_CACHE[spec] = jax.jit(
            lambda p, g: model_compute(spec, p, g)
        )
    return _JIT_COMPUTE_CACHE[spec](params, graph)
