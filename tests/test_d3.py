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


def test_cross_framework_golden_h2o():
    """Reference CUDA-D3 golden for a distorted H2O molecule
    (/root/reference/tests/unit_tests/test_calculator.py:221-231) — a true
    cross-framework check of the D3 physics, not a self-golden."""
    at = AtomsLite(
        positions=np.array(
            [[0.0, 0.2, 0.12], [0.0, 0.76, -0.48], [0.0, -0.76, -0.48]]
        ),
        numbers=np.array([8, 1, 1]),
        cell=None,
        pbc=False,
    )
    calc = D3Calculator()  # pbe, BJ — reference defaults
    res = calc.calculate(at)
    assert abs(res["energy"] - (-0.009889134535170716)) < 2e-6
    ref_f = np.array([
        [0.0, 2.04263840e-03, 1.27477674e-03],
        [0.0, -9.90038901e-05, 1.18046682e-06],
        [0.0, -1.94363451e-03, -1.27595721e-03],
    ])
    np.testing.assert_allclose(res["forces"], ref_f, atol=5e-6)


def test_cross_framework_golden_nacl_pbc():
    """Reference CUDA-D3 golden for strained rocksalt NaCl
    (/root/reference/tests/unit_tests/test_calculator.py:192-218):
    energy, forces AND stress with the full ~50 A lattice sum."""
    cell = np.array(
        [[1.0, 2.815, 2.815], [2.815, 0.0, 2.815], [2.815, 2.815, 0.0]]
    )
    at = AtomsLite(
        positions=np.array([[0.0, 0.0, 0.0], [2.815, 0.0, 0.0]]),
        numbers=np.array([11, 17]),
        cell=cell,
        pbc=True,
    )
    calc = D3Calculator()
    res = calc.calculate(at)
    assert abs(res["energy"] - (-0.531393751583389)) < 5e-5
    ref_f = np.array([
        [-0.00570205, 0.00107457, 0.00107459],
        [0.00570205, -0.00107457, -0.00107459],
    ])
    np.testing.assert_allclose(res["forces"], ref_f, atol=2e-5)
    ref_s = np.array([
        1.52403705e-02, 1.50417333e-02, 1.50417321e-02,
        -3.22684163e-05, -5.05532863e-05, -5.05586994e-05,
    ])
    np.testing.assert_allclose(res["stress"], ref_s, atol=2e-5)


def test_d3_in_md_engine():
    """MDEngine(d3=...) runs dispersion inside the jitted step; the
    initial energy/forces match D3Calculator at the same (engine-bounded)
    cutoff added to the bare model."""
    from sevennet_tpu.io import load_sevennet_checkpoint
    from sevennet_tpu.md import MDEngine

    spec, params = load_sevennet_checkpoint(
        "/root/reference/tests/data/checkpoints/cp_0.pth"
    )
    rng = np.random.default_rng(3)
    L = 9.6
    cell = np.eye(3) * L
    pts, Zs = [], []
    for i in range(4):
        for j in range(2):
            for k in range(2):
                pts.append([i * L / 4 + 0.9, j * L / 2 + 0.9, k * L / 2 + 0.9])
                Zs.append(72 if (i + j) % 2 == 0 else 8)
    pos = np.asarray(pts) + rng.normal(scale=0.05, size=(len(pts), 3))
    Z = np.asarray(Zs)

    eng0 = MDEngine(spec, params, cell, fused=False)
    st0 = eng0.make_state(pos, Z)
    eng3 = MDEngine(spec, params, cell, fused=False,
                    d3={"functional": "pbe", "damping": "damp_bj"})
    st3 = eng3.make_state(pos, Z)
    cut = eng3.d3_params.cutoff
    assert cut < L - eng3.skin + 1e-9  # bounded by the box for the cell list

    calc = D3Calculator(cutoff_ang=cut)
    at = AtomsLite(positions=pos, numbers=Z, cell=cell, pbc=True)
    res = calc.calculate(at)

    e_model = float(st0.potential_energy)
    e_both = float(st3.potential_energy)
    assert abs((e_both - e_model) - res["energy"]) < 5e-5
    n = len(pos)
    f_d3 = np.asarray(st3.forces)[:n] - np.asarray(st0.forces)[:n]
    np.testing.assert_allclose(f_d3, res["forces"], atol=5e-5)

    # a few NVE steps with D3 on: finite and conserving-ish
    st3, (pe, ke) = eng3.run(st3, 10, dt=0.2, chunk=5)
    tot = np.asarray(pe) + np.asarray(ke)
    assert np.isfinite(tot).all()
    assert abs(tot[-1] - tot[0]) < 5e-3


def test_bounded_cutoff_semantics():
    """Opt-in box bound: full cutoff for molecules/large boxes, 3 heights
    (never below the CN cutoff) for small periodic cells."""
    import numpy as np

    from sevennet_tpu.d3 import D3Params, bounded_cutoff

    p = D3Params.from_functional("pbe", "bj")
    assert bounded_cutoff(p, None, False) == p.cutoff
    # large box: bound inactive
    assert bounded_cutoff(p, np.eye(3) * 100.0, (True,) * 3) == p.cutoff
    # small box: 3 * height, floored at the CN cutoff
    small = bounded_cutoff(p, np.eye(3) * 5.0, (True,) * 3)
    assert abs(small - max(15.0, p.cn_cutoff)) < 1e-9
    assert small < p.cutoff
