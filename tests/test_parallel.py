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


@pytest.mark.parametrize("n_dev", [1, 2, 4])
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
