"""Checkpoint-compatibility tests against the committed reference checkpoint.

The reference checkpoint cp_0.pth (HfO2, channel 4, lmax 2, 3 layers,
parity on) exercises every weight-layout path: FCTP self-connection, uvu
convolutions with 15 instructions, two-block gate linears. Loading it here
with strict shape asserts validates instruction-layout parity with e3nn.

Golden values below were produced by THIS framework (fp64) at its first
validated state — they pin numerical behavior against regressions (the
reference torch stack cannot run in this environment; physics correctness is
established by the FD/equivariance tests in test_model.py).
"""

import jax
import numpy as np
import pytest



from .conftest import REFERENCE_CP, build_graph, compute


def test_load_shapes(small_spec_params):
    spec, params = small_spec_params
    assert spec.cutoff == 4.0
    assert spec.num_species == 2
    assert len(spec.layers) == 3
    assert spec.parity is True
    # layer-1 conv has 15 instructions (validated against weight_nn out dim 60)
    assert len(spec.layers[1].conv.instructions) == 15
    assert spec.layers[1].radial_mlp.dims[-1] == 60
    # gate input of layer 1: 4x0e+16x0e+4x1o+4x1e+4x2e+4x2o
    assert spec.layers[1].si2.irreps_out.dim == 84


def test_energy_forces_consistency(small_spec_params, hfo2_structure):
    spec, params = small_spec_params
    pos, Z, cell = hfo2_structure
    gb = build_graph(spec, pos, Z, cell, n_atoms_cap=16, n_edges_cap=300)
    out = compute(spec, params, gb)
    e = float(out["energy"][0])
    f = np.asarray(out["forces"])[: len(pos)]
    assert np.isfinite(e)
    # FD check with the same (padded) edge list via strained positions
    import jax.numpy as jnp
    from sevennet_tpu.model.model import model_energy

    def etot(p):
        g2 = gb.replace(positions=p)
        return jnp.sum(model_energy(spec, params, g2, g2.edge_vectors())["energy"])

    p0 = np.asarray(gb.positions)
    h = 1e-2
    pp, pm = p0.copy(), p0.copy()
    pp[3, 1] += h
    pm[3, 1] -= h
    fd = -(float(etot(jnp.asarray(pp))) - float(etot(jnp.asarray(pm)))) / (2 * h)
    assert abs(fd - f[3, 1]) < 2e-4


def test_golden_regression(small_spec_params, hfo2_structure):
    """Frozen outputs of this framework on cp_0 weights + the HfO2 fixture."""
    spec, params = small_spec_params
    pos, Z, cell = hfo2_structure
    gb = build_graph(spec, pos, Z, cell, n_atoms_cap=16, n_edges_cap=300)
    out = compute(spec, params, gb)
    e = float(out["energy"][0])
    # Values re-frozen after the round-4 e3nn-semantics fixes (irrep sort
    # order 0o<0e, gate _Sortcut head layout) that were pinned against the
    # reference's own deployed TorchScript (tests/test_deployed_golden.py).
    assert abs(e - 0.06793477) < 2e-5, e
    f = np.asarray(out["forces"])
    assert abs(float(f[3, 1]) - (-0.00923972)) < 2e-5
    s = np.asarray(out["stress"])[0]
    assert np.isfinite(s).all()


def test_atomic_energies_sum(small_spec_params, hfo2_structure):
    import jax.numpy as jnp

    from sevennet_tpu.model.model import model_energy

    spec, params = small_spec_params
    pos, Z, cell = hfo2_structure
    gb = build_graph(spec, pos, Z, cell)
    out = model_energy(spec, params, gb, gb.edge_vectors())
    assert abs(float(jnp.sum(out["atomic_energy"])) - float(out["energy"][0])) < 1e-5


def test_pretrained_registry(tmp_path, monkeypatch):
    """Name -> path resolution through $SEVENN_TPU_CHECKPOINT_DIR
    (reference sevenn/util.py:264-312, without the network download)."""
    import pytest

    from sevennet_tpu.io.registry import (
        get_available_pretrained_models,
        load_model,
        resolve_checkpoint,
    )

    assert "sevennet-0" in get_available_pretrained_models()
    # unknown name
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint("sevennet-nonexistent-model")
    # not downloaded yet: mentions the searched dirs
    monkeypatch.setenv("SEVENN_TPU_CHECKPOINT_DIR", str(tmp_path))
    with pytest.raises(FileNotFoundError, match="searched"):
        resolve_checkpoint("7net-omat")
    # drop a checkpoint in the search dir under the canonical basename
    import shutil

    shutil.copy(REFERENCE_CP, str(tmp_path / "checkpoint_sevennet_0.pth"))
    p = resolve_checkpoint("7net-0")
    assert p == str(tmp_path / "checkpoint_sevennet_0.pth")
    spec, params = load_model("SevenNet-0")
    assert spec.cutoff > 0
    # a plain existing path passes straight through
    assert resolve_checkpoint(REFERENCE_CP) == REFERENCE_CP


def test_download_checksum_verification(tmp_path):
    """download_checkpoint verifies a pinned sha256 and cleans up on
    mismatch; an unpinned download records a trust-on-first-use digest
    (reference download path: sevenn/util.py:224-261)."""
    import hashlib
    import json

    import pytest

    from sevennet_tpu.io.registry import download_checkpoint

    src = tmp_path / "asset.pth"
    src.write_bytes(b"checkpoint-bytes")
    url = "file://" + str(src)
    good = hashlib.sha256(b"checkpoint-bytes").hexdigest()

    cache = tmp_path / "cache"
    dest = cache / "asset.pth"
    # wrong pin: raises, no partial or final file left behind
    with pytest.raises(IOError, match="sha256 mismatch"):
        download_checkpoint(str(dest), url, sha256="0" * 64)
    assert not dest.exists() and not (cache / "asset.pth.partial").exists()
    # correct pin: succeeds
    assert download_checkpoint(str(dest), url, sha256=good) == str(dest)
    dest.unlink()
    # unpinned: succeeds and records a TOFU digest in the cache dir
    download_checkpoint(str(dest), url, sha256=None)
    table = json.loads((cache / "checksums.json").read_text())
    assert table["asset.pth"] == good


def test_resolve_uses_pinned_checksum(tmp_path, monkeypatch):
    """resolve_checkpoint consults the pinned-digest table for the
    download it performs, so a corrupted asset cannot load."""
    import pytest

    import sevennet_tpu.io.registry as registry

    src = tmp_path / "checkpoint_fake.pth"
    src.write_bytes(b"payload")
    monkeypatch.setenv("SEVENN_TPU_CHECKPOINT_DIR", str(tmp_path / "cache"))
    pins = tmp_path / "pins.json"
    pins.write_text('{"checkpoint_fake.pth": "%s"}' % ("0" * 64))
    monkeypatch.setenv("SEVENN_TPU_CHECKSUMS", str(pins))
    monkeypatch.setitem(
        registry._REGISTRY, "sevennet-fake",
        registry._Entry("checkpoint_fake.pth", "file://" + str(src)))
    with pytest.raises(FileNotFoundError, match="sha256 mismatch"):
        registry.resolve_checkpoint("sevennet-fake")
    # pin the real digest: download succeeds
    pins.write_text(
        '{"checkpoint_fake.pth": "%s"}' % registry._file_sha256(str(src)))
    p = registry.resolve_checkpoint("sevennet-fake")
    assert p.endswith("checkpoint_fake.pth")


def test_legacy_name_and_config_patches():
    """Pre-2024 checkpoints: space-named modules, 'denumerator', dropped
    keys (reference scripts/backward_compatibility.py)."""
    import numpy as np

    from sevennet_tpu.io.torch_checkpoint import (
        patch_old_config,
        patch_old_state_dict,
    )

    sd = {
        "EdgeEmbedding.basis_function.coeffs": np.zeros(8),
        "0 self interaction 1.linear.weight": np.zeros(4),
        "0 convolution.denumerator": np.asarray([12.0]),
        "rescale atomic energy.shift": np.asarray([0.1]),
        "onehot_to_feature_x.linear.weight": np.zeros(2),
    }
    out = patch_old_state_dict(sd)
    assert "edge_embedding.basis_function.coeffs" in out
    assert "0_self_interaction_1.linear.weight" in out
    assert "0_convolution.denominator" in out
    assert "rescale_atomic_energy.shift" in out
    assert "onehot_to_feature_x.linear.weight" in out

    cfg = patch_old_config({
        "version": "0.9.3",
        "cutoff_function": {"cutoff_function_name": "XPLOR",
                            "poly_cut_p_value": 6, "cutoff_on": 4.5},
        "train_avg_num_neigh": True,
    })
    assert "poly_cut_p_value" not in cfg["cutoff_function"]
    assert cfg["train_denominator"] is True
    assert cfg["conv_denominator"] == 0.0
    # modern configs pass through untouched
    cfg2 = patch_old_config({"version": "0.11.0", "conv_denominator": 35.0})
    assert cfg2["conv_denominator"] == 35.0


def test_load_model_native_dir(tmp_path, small_spec_params):
    """CLI get_model (.pth -> native dir) round-trips through
    registry.load_model with identical parameters."""
    import jax
    import numpy as np

    from sevennet_tpu.cli.main import main
    from sevennet_tpu.io.registry import load_model

    out = str(tmp_path / "deployed")
    assert main(["get_model", REFERENCE_CP, "--out", out]) == 0
    spec, params = small_spec_params
    spec2, params2 = load_model(out)
    assert spec2.cutoff == spec.cutoff
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_profiling_step_timer():
    import jax.numpy as jnp

    from sevennet_tpu.profiling import step_timer

    with step_timer() as t:
        x = jnp.ones(8) * 2
        t.lap(x)
        t.lap()
    assert len(t.laps) == 2 and t.mean >= 0.0
