import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sevennet_tpu.atoms import AtomsLite
from sevennet_tpu.d3 import D3Calculator, D3Params, d3_energy


def _pair_graph(r):
    numbers = jnp.asarray([18, 18], jnp.int32)  # Ar2
    dst = jnp.asarray([0, 1], jnp.int32)
    src = jnp.asarray([1, 0], jnp.int32)
    ev = jnp.asarray([[r, 0, 0], [-r, 0, 0]], jnp.float32)
    mask = jnp.ones(2, bool)
    return numbers, dst, src, ev, mask


def test_dimer_attractive_and_decaying():
    p = D3Params.from_functional("pbe", "bj")
    es = [float(d3_energy(p, *_pair_graph(r))) for r in (3.8, 5.0, 8.0, 15.0)]
    assert all(e < 0 for e in es)
    assert es[0] < es[1] < es[2] < es[3]  # monotonically weaker
    # r^-6 tail: E(8)/E(15) ~ (15/8)^6 within damping corrections
    ratio = es[2] / es[3]
    assert 0.5 * (15 / 8) ** 6 < ratio < 2.0 * (15 / 8) ** 6


def test_zero_damping_variant():
    p = D3Params.from_functional("pbe", "zero")
    e = float(d3_energy(p, *_pair_graph(3.8)))
    assert e < 0 and np.isfinite(e)


def test_forces_fd():
    calc = D3Calculator("pbe", "damp_bj")
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 5, (6, 3))
    at = AtomsLite(positions=pos, numbers=np.array([8, 1, 1, 6, 7, 18]))
    res = calc.calculate(at)
    f = res["forces"]
    h = 1e-3
    for idx, ax in [(0, 0), (3, 2)]:
        pp, pm = pos.copy(), pos.copy()
        pp[idx, ax] += h
        pm[idx, ax] -= h
        ep = calc.calculate(AtomsLite(positions=pp, numbers=at.numbers))["energy"]
        em = calc.calculate(AtomsLite(positions=pm, numbers=at.numbers))["energy"]
        fd = -(ep - em) / (2 * h)
        assert abs(fd - f[idx, ax]) < 5e-5, (fd, f[idx, ax])


def test_rotation_invariance_and_golden():
    from scipy.spatial.transform import Rotation

    calc = D3Calculator("pbe", "damp_bj")
    rng = np.random.default_rng(1)
    pos = rng.uniform(0, 6, (8, 3))
    Z = np.array([14, 14, 8, 8, 8, 8, 1, 1])
    e1 = calc.calculate(AtomsLite(positions=pos, numbers=Z))["energy"]
    R = Rotation.from_rotvec([0.3, 0.6, -0.2]).as_matrix()
    e2 = calc.calculate(AtomsLite(positions=pos @ R.T, numbers=Z))["energy"]
    assert abs(e1 - e2) < 1e-6
    # frozen regression value of THIS implementation (fp32)
    assert abs(e1 - (-0.127477)) < 5e-4, e1


def test_periodic_stress():
    calc = D3Calculator("pbe", "damp_bj", cutoff_ang=12.0)
    cell = np.eye(3) * 4.0
    pos = np.array([[0.0, 0, 0], [2.0, 2.0, 2.0]])
    at = AtomsLite(positions=pos, numbers=np.array([29, 29]), cell=cell, pbc=True)
    res = calc.calculate(at)
    assert res["energy"] < 0
    assert "stress" in res and np.isfinite(res["stress"]).all()
    # attractive interaction -> system wants to contract -> ASE stress
    # (dE/d(strain)/V) has a positive trace
    assert res["stress"][:3].sum() > 0


def test_cn_limits():
    """Isolated atom: CN=0; C6 equals the lowest-CN reference."""
    p = D3Params.from_functional("pbe", "bj")
    numbers = jnp.asarray([6], jnp.int32)
    e = float(
        d3_energy(
            p,
            numbers,
            jnp.zeros(1, jnp.int32),
            jnp.zeros(1, jnp.int32),
            jnp.ones((1, 3), jnp.float32),
            jnp.zeros(1, bool),
        )
    )
    assert e == 0.0
