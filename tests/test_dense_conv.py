"""Parity of the fused dense conv (custom mirror-edge VJP) vs plain autodiff.

The mirror backward requires a SYMMETRIC neighbor grid (every directed edge
present in both rows), which is what the cell list and the host full
neighbor list both produce; the fixture builds one explicitly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sevennet_tpu.irreps import Irreps, infer_irreps_out
from sevennet_tpu.ops.dense_conv import dense_conv_apply, _tp_forward_block
from sevennet_tpu.ops.mlp import ScalarMLPSpec, scalar_mlp_apply, scalar_mlp_init
from sevennet_tpu.ops.tensor_product import ConvTPSpec
from sevennet_tpu.so3.spherical import spherical_harmonics


def _symmetric_fixture(seed=0, n=24, k=8, lmax=2):
    """Random positions in a box; per-row neighbor slots from a full NL so
    the grid is symmetric. Returns (x, emb, sh, src, pos)."""
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, 6.0, (n, 3))
    # full pairwise within cutoff, open boundaries
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    cutoff = 3.5
    src_nk = np.zeros((n, k), np.int32)
    val = np.zeros((n, k), bool)
    for i in range(n):
        nbrs = np.where((d[i] < cutoff) & (np.arange(n) != i))[0][:k]
        src_nk[i, : len(nbrs)] = nbrs
        val[i, : len(nbrs)] = True
    # make symmetric: drop pairs whose mirror got truncated
    for i in range(n):
        for s in range(k):
            if val[i, s]:
                j = src_nk[i, s]
                if not (val[j] & (src_nk[j] == i)).any():
                    val[i, s] = False
    x_ir = Irreps("8x0e+4x1e+2x2e")
    f_ir = Irreps.spherical_harmonics(lmax, 1)
    tgt = infer_irreps_out(x_ir, f_ir, lmax, "full")
    conv = ConvTPSpec(x_ir, f_ir, tgt)
    mlp = ScalarMLPSpec((4, 8, conv.weight_numel))
    x = jnp.asarray(rng.normal(size=(n, x_ir.dim)), jnp.float32)
    vec = pos[src_nk] - pos[:, None, :]
    vec = np.where(val[:, :, None], vec, np.array([1.0, 0, 0]))
    sh = spherical_harmonics(lmax, jnp.asarray(vec, jnp.float32))
    # radial embedding must be a function of edge LENGTH only (as in the
    # model: bessel(r) * cutoff(r)), so mirror edges share the same weight
    r = np.linalg.norm(vec, axis=-1)
    freqs = np.array([0.7, 1.3, 2.1, 3.4])
    emb = np.sin(r[:, :, None] * freqs) * val[:, :, None]
    emb = jnp.asarray(emb, jnp.float32)
    mlp_p = scalar_mlp_init(jax.random.PRNGKey(3), mlp)
    return conv, mlp, mlp_p, x, emb, sh, jnp.asarray(src_nk)


def _reference(conv, mlp, mlp_p, x, emb, sh, src):
    w = scalar_mlp_apply(mlp, mlp_p, emb)
    return _tp_forward_block(conv, x[src], sh, w)


@pytest.mark.parametrize("block_atoms", [0, 8])
def test_forward_matches_reference(block_atoms):
    conv, mlp, mlp_p, x, emb, sh, src = _symmetric_fixture()
    out = dense_conv_apply(
        conv, mlp, mlp_p, x, emb, sh, src, block_atoms=block_atoms
    )
    ref = _reference(conv, mlp, mlp_p, x, emb, sh, src)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("block_atoms", [0, 8])
def test_backward_matches_autodiff(block_atoms):
    conv, mlp, mlp_p, x, emb, sh, src = _symmetric_fixture()
    ct = jax.random.normal(jax.random.PRNGKey(7), (x.shape[0],))

    def loss_custom(mlp_p, x, emb, sh):
        out = dense_conv_apply(
            conv, mlp, mlp_p, x, emb, sh, src, block_atoms=block_atoms
        )
        return jnp.sum(jnp.tanh(out) * ct[:, None])

    def loss_ref(mlp_p, x, emb, sh):
        return jnp.sum(jnp.tanh(_reference(conv, mlp, mlp_p, x, emb, sh, src)) * ct[:, None])

    g_c = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(mlp_p, x, emb, sh)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(mlp_p, x, emb, sh)
    for a, b in zip(jax.tree.leaves(g_c), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)


def test_double_backward_force_training():
    """Outer grad over a force-style (inner-grad) loss must work and match."""
    conv, mlp, mlp_p, x, emb, sh, src = _symmetric_fixture(n=12, k=6)

    def make_energy(convfn):
        def energy(mlp_p, emb):
            out = convfn(mlp_p, emb)
            return jnp.sum(out ** 2)
        return energy

    e_c = make_energy(
        lambda p, e: dense_conv_apply(conv, mlp, p, x, e, sh, src)
    )
    e_r = make_energy(lambda p, e: _reference(conv, mlp, p, x, e, sh, src))

    def loss(energy_fn, mlp_p):
        f = jax.grad(energy_fn, argnums=1)(mlp_p, emb)  # "forces" wrt emb
        return jnp.sum(f ** 2)

    g_c = jax.grad(lambda p: loss(e_c, p))(mlp_p)
    g_r = jax.grad(lambda p: loss(e_r, p))(mlp_p)
    for a, b in zip(jax.tree.leaves(g_c), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3)
