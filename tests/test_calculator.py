import numpy as np
import pytest

from sevennet_tpu.atoms import AtomsLite
from sevennet_tpu.calculator import SevenNetD3Calculator, SevenNetTPUCalculator


@pytest.fixture(scope="module")
def calc(reference_checkpoint_path):
    return SevenNetTPUCalculator(reference_checkpoint_path)


def test_single_point(calc, hfo2_structure):
    pos, Z, cell = hfo2_structure
    at = AtomsLite(positions=pos, numbers=Z, cell=cell, pbc=True)
    res = calc.calculate(at)
    assert set(res) >= {"energy", "forces", "energies", "stress"}
    assert abs(res["energies"].sum() - res["energy"]) < 1e-4
    assert res["forces"].shape == (12, 3)
    # momentum conservation: PBC forces sum to ~0
    assert np.abs(res["forces"].sum(0)).max() < 1e-3


@pytest.mark.slow
def test_molecule_no_stress(calc):
    at = AtomsLite.from_symbols(["O", "O"], [[0, 0, 0], [1.3, 0, 0]])
    res = calc.calculate(at)
    assert "stress" not in res
    # equal and opposite forces along the bond
    assert np.abs(res["forces"][0] + res["forces"][1]).max() < 1e-5


def test_unknown_species_raises(calc):
    at = AtomsLite.from_symbols(["Au"], [[0, 0, 0]])
    with pytest.raises(ValueError, match="atomic numbers"):
        calc.calculate(at)


def test_bucketing_reuses_compilation(calc):
    rng = np.random.default_rng(0)
    # 5 and 7 atoms bucket to the same capacities -> one compiled program
    for n in (5, 7, 6):
        at = AtomsLite(
            positions=rng.uniform(0, 5, (n, 3)),
            numbers=np.full(n, 8),
            cell=np.eye(3) * 5.0,
            pbc=True,
        )
        res = calc.calculate(at)
        assert np.isfinite(res["energy"])


def test_combined_d3_calculator(calc, hfo2_structure):
    pos, Z, cell = hfo2_structure
    at = AtomsLite(positions=pos, numbers=Z, cell=cell, pbc=True)
    base = calc.calculate(at)
    combo = SevenNetD3Calculator(calc, functional="pbe", cutoff_ang=10.0)
    res = combo.calculate(at)
    # dispersion lowers the energy
    assert res["energy"] < base["energy"]
    assert res["forces"].shape == (12, 3)
    assert "stress" in res


@pytest.mark.slow
def test_batched_calculator(reference_checkpoint_path, hfo2_structure):
    from sevennet_tpu.batched import BatchedCalculator

    pos, Z, cell = hfo2_structure
    bc = BatchedCalculator(reference_checkpoint_path)
    a1 = AtomsLite(positions=pos, numbers=Z, cell=cell, pbc=True)
    a2 = AtomsLite(positions=pos * 1.02, numbers=Z, cell=cell * 1.02, pbc=True)
    out = bc.calculate([a1, a2])
    assert len(out) == 2
    single = SevenNetTPUCalculator(reference_checkpoint_path).calculate(a1)
    assert abs(out[0]["energy"] - single["energy"]) < 1e-4
    assert np.abs(out[0]["forces"] - single["forces"]).max() < 1e-4


def test_fused_calculator_matches_flat(reference_checkpoint_path, hfo2_structure):
    """calculator(fused=True) — dense slot layout + fused Pallas kernels
    (interpret mode on CPU) — matches the flat XLA path (the reference's
    accelerator-equivalence pattern, tests/unit_tests/test_cueq.py)."""
    pos, Z, cell = hfo2_structure
    at = AtomsLite(positions=pos, numbers=Z, cell=cell, pbc=True)
    flat = SevenNetTPUCalculator(reference_checkpoint_path, fused=False)
    fused = SevenNetTPUCalculator(reference_checkpoint_path, fused=True)
    r1 = flat.calculate(at)
    r2 = fused.calculate(at)
    assert abs(r1["energy"] - r2["energy"]) < 2e-5 * max(abs(r1["energy"]), 1)
    np.testing.assert_allclose(r2["forces"], r1["forces"], atol=5e-5)
    np.testing.assert_allclose(r2["stress"], r1["stress"], atol=5e-6)
