import numpy as np
import pytest

from sevennet_tpu.so3 import real_wigner_3j, spherical_harmonics
from sevennet_tpu.so3.spherical import sh_coefficients


pytestmark = pytest.mark.smoke


def test_w3j_frobenius_norm():
    for l1, l2, l3 in [(1, 1, 1), (1, 1, 2), (2, 2, 3), (3, 2, 1), (0, 2, 2)]:
        w = real_wigner_3j(l1, l2, l3)
        assert abs(np.linalg.norm(w) - 1.0) < 1e-12


def test_w3j_l0_identity():
    # (l, 0, l) coupling is identity / sqrt(2l+1)
    for l in range(4):
        w = real_wigner_3j(l, 0, l)
        assert np.allclose(w[:, 0, :], np.eye(2 * l + 1) / np.sqrt(2 * l + 1))


def test_w3j_111_cross_product():
    # coupling of two vectors to a vector is the Levi-Civita tensor / sqrt(6)
    w = real_wigner_3j(1, 1, 1)
    eps = np.zeros((3, 3, 3))
    for i, j, k in [(0, 1, 2), (1, 2, 0), (2, 0, 1)]:
        eps[i, j, k] = 1
        eps[j, i, k] = -1
    assert np.allclose(np.abs(w), np.abs(eps) / np.sqrt(6))


def test_w3j_matches_e3nn_checkpoint(reference_checkpoint_path):
    torch = pytest.importorskip("torch")
    cp = torch.load(reference_checkpoint_path, map_location="cpu", weights_only=False)
    sd = cp["model_state_dict"]
    prefix = "1_convolution.convolution._compiled_main_left_right._w3j"
    found = 0
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        l1, l2, l3 = (int(s) for s in k.rsplit("_w3j_", 1)[1].split("_"))
        assert np.abs(real_wigner_3j(l1, l2, l3) - v.numpy()).max() < 1e-6
        found += 1
    assert found == 8


def test_sh_explicit_l1_l2():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(40, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    Y = np.asarray(spherical_harmonics(2, v, normalize=False))
    x, y, z = v[:, 0], v[:, 1], v[:, 2]
    assert np.allclose(Y[:, 0], 1.0)
    assert np.allclose(Y[:, 1:4], np.sqrt(3) * v, atol=1e-6)
    s15, s5 = np.sqrt(15), np.sqrt(5)
    expected = np.stack(
        [s15 * x * z, s15 * x * y, s5 / 2 * (3 * y * y - 1), s15 * y * z,
         s15 / 2 * (z * z - x * x)],
        axis=1,
    )
    assert np.abs(Y[:, 4:9] - expected).max() < 1e-6


def test_sh_addition_theorem():
    from numpy.polynomial.legendre import legval

    rng = np.random.default_rng(1)
    v1 = rng.normal(size=(30, 3))
    v1 /= np.linalg.norm(v1, axis=1, keepdims=True)
    v2 = rng.normal(size=(30, 3))
    v2 /= np.linalg.norm(v2, axis=1, keepdims=True)
    Y1 = np.asarray(spherical_harmonics(4, v1, normalize=False))
    Y2 = np.asarray(spherical_harmonics(4, v2, normalize=False))
    dots = (v1 * v2).sum(1)
    for l in range(5):
        sl = slice(l * l, (l + 1) ** 2)
        gram = (Y1[:, sl] * Y2[:, sl]).sum(1)
        c = np.zeros(l + 1)
        c[l] = 1
        assert np.abs(gram - (2 * l + 1) * legval(dots, c)).max() < 1e-5


def test_sh_w3j_consistency():
    """Gaunt-type consistency: the w3j-projection of Y_l1 (x) Y_l2 evaluated at
    the same direction must be proportional to Y_l3 — guarantees the SH basis
    and the coupling tables share one convention."""
    rng = np.random.default_rng(2)
    v = rng.normal(size=(20, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    Y = np.asarray(spherical_harmonics(4, v, normalize=False))

    def blk(l):
        return Y[:, l * l:(l + 1) ** 2]

    for l1, l2, l3 in [(1, 1, 2), (1, 2, 3), (2, 2, 4), (2, 2, 2), (1, 3, 4)]:
        w = real_wigner_3j(l1, l2, l3)
        proj = np.einsum("abc,na,nb->nc", w, blk(l1), blk(l2))
        # proportional per-row with a CONSTANT ratio across directions
        ratio = (proj * blk(l3)).sum(1) / (blk(l3) ** 2).sum(1)
        assert ratio.std() < 1e-6 * max(1.0, abs(ratio.mean()))  # f32 SH values
        resid = proj - ratio[:, None] * blk(l3)
        assert np.abs(resid).max() < 1e-6


def test_sh_normalize_flag():
    v = np.array([[0.3, -2.0, 1.1]])
    Yn = np.asarray(spherical_harmonics(2, v, normalize=True))
    Yu = np.asarray(spherical_harmonics(2, v / np.linalg.norm(v), normalize=False))
    assert np.abs(Yn - Yu).max() < 1e-6


def test_sh_gradients_finite_at_zero():
    import jax
    import jax.numpy as jnp

    # padded edges are replaced by unit fallback vectors in the model, but the
    # SH itself must be finite (no NaN) for tiny vectors after the guard
    def f(v):
        return spherical_harmonics(2, v, normalize=True).sum()

    g = jax.grad(f)(jnp.array([1.0, 0.0, 0.0]))
    assert np.isfinite(np.asarray(g)).all()
