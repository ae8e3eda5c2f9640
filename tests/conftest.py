import os

import numpy as np
import pytest

REFERENCE_CP = "/root/reference/tests/data/checkpoints/cp_0.pth"


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
