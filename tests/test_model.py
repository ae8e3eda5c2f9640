import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sevennet_tpu.data import batch_graphs, graph_from_arrays, neighbor_list_numpy
from sevennet_tpu.model import build_model_spec
from sevennet_tpu.model.model import model_init

from .conftest import build_graph, compute

SMALL_CONFIG = {
    "cutoff": 4.0,
    "channel": 4,
    "lmax": 2,
    "is_parity": True,
    "num_convolution_layer": 3,
    "chemical_species": ["Hf", "O"],
    "self_connection_type": "nequip",
    "conv_denominator": 5.0,
    "shift": -1.5,
    "scale": 2.0,
}


@pytest.fixture(scope="module")
def small_model():
    spec = build_model_spec(SMALL_CONFIG)
    params = model_init(jax.random.PRNGKey(0), spec)
    return spec, params


def _random_structure(seed=7, n=10, box=6.0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, box, (n, 3))
    Z = rng.choice([72, 8], size=n)
    cell = np.eye(3) * box
    return pos, Z, cell


def test_forward_shapes(small_model):
    spec, params = small_model
    pos, Z, cell = _random_structure()
    gb = build_graph(spec, pos, Z, cell)
    out = compute(spec, params, gb)
    assert out["energy"].shape == (1,)
    assert out["forces"].shape == (gb.n_atoms_cap, 3)
    assert out["stress"].shape == (1, 6)
    assert np.isfinite(np.asarray(out["energy"])).all()
    assert np.isfinite(np.asarray(out["forces"])).all()


def test_padding_does_not_change_results(small_model):
    spec, params = small_model
    pos, Z, cell = _random_structure()
    g1 = build_graph(spec, pos, Z, cell)
    g2 = build_graph(spec, pos, Z, cell, n_atoms_cap=32, n_edges_cap=g1.n_edges_cap + 100)
    o1 = compute(spec, params, g1)
    o2 = compute(spec, params, g2)
    assert abs(float(o1["energy"][0]) - float(o2["energy"][0])) < 1e-5
    n = len(pos)
    assert np.abs(np.asarray(o1["forces"])[:n] - np.asarray(o2["forces"])[:n]).max() < 1e-5
    assert np.abs(np.asarray(o2["forces"])[n:]).max() == 0.0


def test_batching_consistency(small_model):
    """Two structures in one padded batch == each evaluated alone."""
    spec, params = small_model
    singles, graphs = [], []
    for seed in (1, 2):
        pos, Z, cell = _random_structure(seed=seed, n=8 + seed)
        species = spec.z_to_type[Z]
        dst, src, S = neighbor_list_numpy(pos, spec.cutoff, cell, True)
        g = graph_from_arrays(pos, species, src, dst, S, cell)
        graphs.append(g)
        singles.append(compute(spec, params, batch_graphs([g])))
    big = batch_graphs(graphs, n_atoms_cap=32, n_edges_cap=2048, n_graphs_cap=3)
    out = compute(spec, params, big)
    n1 = 9
    for i, single in enumerate(singles):
        assert abs(float(out["energy"][i]) - float(single["energy"][0])) < 1e-4
        assert np.abs(np.asarray(out["stress"])[i] - np.asarray(single["stress"])[0]).max() < 1e-5
    f_big = np.asarray(out["forces"])
    assert np.abs(f_big[:n1] - np.asarray(singles[0]["forces"])[:n1]).max() < 1e-5
    assert np.abs(f_big[n1:n1 + 10] - np.asarray(singles[1]["forces"])[:10]).max() < 1e-5


def test_rotation_invariance(small_model):
    from scipy.spatial.transform import Rotation

    spec, params = small_model
    pos, Z, cell = _random_structure(seed=3)
    R = Rotation.from_rotvec([0.4, -0.2, 0.9]).as_matrix()
    g1 = build_graph(spec, pos, Z, cell)
    g2 = build_graph(spec, pos @ R.T, Z, cell @ R.T)
    o1 = compute(spec, params, g1)
    o2 = compute(spec, params, g2)
    assert abs(float(o1["energy"][0]) - float(o2["energy"][0])) < 1e-4
    # forces rotate covariantly
    f1 = np.asarray(o1["forces"])[: len(pos)]
    f2 = np.asarray(o2["forces"])[: len(pos)]
    assert np.abs(f1 @ R.T - f2).max() < 1e-4


def test_translation_and_permutation_invariance(small_model):
    spec, params = small_model
    pos, Z, cell = _random_structure(seed=5)
    e0 = float(compute(spec, params, build_graph(spec, pos, Z, cell))["energy"][0])
    # translation (with PBC wrap handled by NL)
    e_t = float(
        compute(spec, params, build_graph(spec, pos + 1.234, Z, cell))["energy"][0]
    )
    assert abs(e0 - e_t) < 1e-4
    # permutation
    perm = np.random.default_rng(0).permutation(len(pos))
    e_p = float(
        compute(spec, params, build_graph(spec, pos[perm], Z[perm], cell))["energy"][0]
    )
    assert abs(e0 - e_p) < 1e-4


def test_forces_match_position_gradient(small_model):
    """Edge-based force assembly == -dE/dpos with a fixed edge list."""
    from sevennet_tpu.model.model import model_energy

    spec, params = small_model
    pos, Z, cell = _random_structure(seed=11)
    gb = build_graph(spec, pos, Z, cell)
    out = compute(spec, params, gb)

    def etot(p):
        g2 = gb.replace(positions=p)
        return jnp.sum(model_energy(spec, params, g2, g2.edge_vectors())["energy"])

    f_pos = -np.asarray(jax.jit(jax.grad(etot))(gb.positions))
    assert np.abs(np.asarray(out["forces"]) - f_pos).max() < 1e-5


def test_stress_finite_difference(small_model):
    """Virial stress == dE/d(strain) / V by finite differences."""
    spec, params = small_model
    pos, Z, cell = _random_structure(seed=13, n=8, box=5.5)
    out = compute(spec, params, build_graph(spec, pos, Z, cell))
    stress = np.asarray(out["stress"])[0]  # (xx,yy,zz,xy,yz,zx), -virial/V

    def energy_strained(eps_mat):
        strained_cell = cell @ (np.eye(3) + eps_mat).T
        strained_pos = pos @ (np.eye(3) + eps_mat).T
        gb = build_graph(spec, strained_pos, Z, strained_cell)
        return float(compute(spec, params, gb)["energy"][0])

    V = abs(np.linalg.det(cell))
    h = 1e-3
    # xx component
    eps = np.zeros((3, 3)); eps[0, 0] = h
    em = np.zeros((3, 3)); em[0, 0] = -h
    fd_xx = (energy_strained(eps) - energy_strained(em)) / (2 * h) / V
    assert abs(-fd_xx - stress[0]) < 5e-3 * max(1.0, abs(stress[0]))


def test_second_derivatives_exist(small_model):
    """Force loss training needs grad-of-grad through the conv stack."""
    spec, params = small_model
    pos, Z, cell = _random_structure(seed=17, n=6)
    gb = build_graph(spec, pos, Z, cell)

    def loss(p):
        out = compute(spec, p, gb)
        return jnp.sum(out["forces"] ** 2) + out["energy"][0] ** 2

    from jax.flatten_util import ravel_pytree

    grads = jax.jit(jax.grad(loss))(params)
    flat, _ = ravel_pytree(grads)
    assert np.isfinite(np.asarray(flat)).all()
    assert float(jnp.abs(flat).max()) > 0


def test_isolated_atom(small_model):
    """A single atom with no edges must not produce NaN (reference guards
    this case in IrrepsScatterGatterFusedConvolution, convolution.py:265-268)."""
    spec, params = small_model
    pos = np.zeros((1, 3))
    Z = np.array([8])
    species = spec.z_to_type[Z]
    g = graph_from_arrays(
        pos, species,
        np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros((0, 3)),
        None,
    )
    gb = batch_graphs([g], n_atoms_cap=4, n_edges_cap=8)
    out = compute(spec, params, gb)
    assert np.isfinite(float(out["energy"][0]))
    assert np.isfinite(np.asarray(out["forces"])).all()


def test_linear_self_connection_and_no_parity():
    cfg = dict(SMALL_CONFIG)
    cfg.update({"is_parity": False, "self_connection_type": "linear", "lmax": 1,
                "num_convolution_layer": 2})
    spec = build_model_spec(cfg)
    params = model_init(jax.random.PRNGKey(1), spec)
    pos, Z, cell = _random_structure(seed=19, n=6)
    out = compute(spec, params, build_graph(spec, pos, Z, cell))
    assert np.isfinite(float(out["energy"][0]))
