import jax
import jax.numpy as jnp
import numpy as np

from sevennet_tpu.irreps import Irreps
from sevennet_tpu.ops import (
    GateSpec,
    LinearSpec,
    ScalarMLPSpec,
    gate_apply,
    linear_apply,
    linear_init,
    scalar_mlp_apply,
    scalar_mlp_init,
)
from sevennet_tpu.ops.activations import NORMALIZE2MOM_CST
from sevennet_tpu.ops.linear import linear_pack, linear_unpack
from sevennet_tpu.ops.tensor_product import ConvTPSpec, FCTPSpec, conv_tp_apply, fctp_apply, fctp_init


def test_linear_instruction_layout():
    # two scalar output blocks -> fan_in shared, layout in instruction order
    spec = LinearSpec(Irreps("12x0e+16x1o"), Irreps("4x0e+8x0e+4x1o"))
    assert [(i, j) for i, j, _ in spec.instructions] == [(0, 0), (0, 1), (1, 2)]
    alphas = [a for _, _, a in spec.instructions]
    assert abs(alphas[0] - 1 / np.sqrt(12)) < 1e-12
    assert abs(alphas[1] - 1 / np.sqrt(12)) < 1e-12
    assert abs(alphas[2] - 1 / np.sqrt(16)) < 1e-12


def test_linear_pack_roundtrip():
    spec = LinearSpec(Irreps("3x0e+2x1e"), Irreps("5x0e+2x1e"))
    params = linear_init(jax.random.PRNGKey(0), spec)
    flat = linear_pack(spec, params)
    assert flat.shape == (3 * 5 + 2 * 2,)
    params2 = linear_unpack(spec, flat)
    for a, b in zip(params["w"], params2["w"]):
        assert np.allclose(a, b)


def test_linear_equivariance_zero_for_unmatched():
    spec = LinearSpec(Irreps("4x0e"), Irreps("2x0e+3x1o"))
    params = linear_init(jax.random.PRNGKey(1), spec)
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 4))
    y = linear_apply(spec, params, x)
    assert y.shape == (5, 2 + 9)
    assert np.abs(np.asarray(y[:, 2:])).max() == 0.0  # no path into 1o


def test_linear_variance_preserving():
    spec = LinearSpec(Irreps("256x0e"), Irreps("256x0e"))
    params = linear_init(jax.random.PRNGKey(3), spec)
    x = jax.random.normal(jax.random.PRNGKey(4), (64, 256))
    y = linear_apply(spec, params, x)
    assert abs(float(jnp.var(y)) - 1.0) < 0.2


def test_conv_tp_instruction_count_sevennet0_layer1():
    x = Irreps("128x0e+64x1e+32x2e")
    f = Irreps("1x0e+1x1e+1x2e")
    from sevennet_tpu.irreps import infer_irreps_out

    tgt = infer_irreps_out(x, f, 2, "full")
    spec = ConvTPSpec(x, f, tgt)
    assert len(spec.instructions) == 15
    # x-block paths: 0e->3 outs, 1e->6 outs (l3<=2 kept), 2e->6 outs
    assert spec.weight_numel == 128 * 3 + 64 * 6 + 32 * 6
    assert spec.irreps_mid.simplify().dim == tgt.dim


def test_conv_tp_scalar_product():
    # 0e (x) 0e -> 0e path is a plain weighted product with pw=1
    x = Irreps("2x0e")
    f = Irreps("1x0e")
    spec = ConvTPSpec(x, f, Irreps("2x0e"))
    E = 4
    xv = jax.random.normal(jax.random.PRNGKey(0), (E, 2))
    fv = jnp.ones((E, 1))
    w = jnp.ones((E, 2))
    out = conv_tp_apply(spec, xv, fv, w)
    assert np.allclose(np.asarray(out), np.asarray(xv), atol=1e-6)


def test_fctp_scalar_case():
    # (0e x 0e -> 0e) uvw: out_w = sum_uv W[u,v,w] x_u y_v / sqrt(mul1*mul2)
    spec = FCTPSpec(Irreps("3x0e"), Irreps("2x0e"), Irreps("4x0e"))
    params = fctp_init(jax.random.PRNGKey(5), spec)
    x = jax.random.normal(jax.random.PRNGKey(6), (7, 3))
    y = jax.random.normal(jax.random.PRNGKey(7), (7, 2))
    out = fctp_apply(spec, params, x, y)
    w = np.asarray(params["w"][0])
    expect = np.einsum("nu,nv,uvw->nw", np.asarray(x), np.asarray(y), w) / np.sqrt(6)
    assert np.abs(np.asarray(out) - expect).max() < 1e-5


def test_gate_scalar_identity_structure():
    spec = GateSpec(
        Irreps("4x0e+2x1o"),
        (("e", "silu"), ("o", "tanh")),
        (("e", "silu"), ("o", "tanh")),
    )
    # e3nn _Sortcut head: scalars+gates sorted and *simplified* (4x0e and
    # the 2x0e gates merge into 6x0e)
    assert repr(spec.irreps_in) == "6x0e+2x1o"
    x = jnp.concatenate(
        [jnp.zeros((1, 4)), jnp.ones((1, 2)) * 0.5, jnp.ones((1, 6))], axis=-1
    )
    y = gate_apply(spec, x)
    assert y.shape == (1, 4 + 6)
    # gated part = silu(0.5)*cst * 1
    import math

    g = 0.5 / (1 + math.exp(-0.5)) * NORMALIZE2MOM_CST["silu"]
    assert np.abs(np.asarray(y[0, 4:]) - g).max() < 1e-6


def test_scalar_mlp_layout():
    spec = ScalarMLPSpec((8, 64, 64, 12), act="silu")
    params = scalar_mlp_init(jax.random.PRNGKey(8), spec)
    assert [w.shape for w in params["w"]] == [(8, 64), (64, 64), (64, 12)]
    x = jax.random.normal(jax.random.PRNGKey(9), (5, 8))
    y = scalar_mlp_apply(spec, params, x)
    assert y.shape == (5, 12)


def test_conv_tp_equivariance():
    """Full uvu TP message must be rotation-equivariant: scalar invariants
    built from outputs at rotated inputs must match."""
    from scipy.spatial.transform import Rotation

    from sevennet_tpu.irreps import infer_irreps_out
    from sevennet_tpu.so3 import spherical_harmonics

    x_ir = Irreps("3x0e+2x1o+1x2e")
    f_ir = Irreps.spherical_harmonics(2, -1)
    tgt = infer_irreps_out(x_ir, f_ir, 2, "full")
    spec = ConvTPSpec(x_ir, f_ir, tgt)

    rng = np.random.default_rng(0)
    E = 6
    vecs = rng.normal(size=(E, 3))
    w = jnp.asarray(rng.normal(size=(E, spec.weight_numel)), jnp.float32)

    # build x from spherical harmonics of auxiliary vectors so we know how it rotates
    aux = rng.normal(size=(E, 3))

    def feats(v_aux):
        Y = spherical_harmonics(2, jnp.asarray(v_aux, jnp.float32))
        # 3x0e from Y0, 2x1o from Y1, 1x2e from Y2 (ir_mul layout: the mul
        # axis is minor within each block)
        return jnp.concatenate(
            [
                jnp.tile(Y[:, :1], (1, 3)),
                jnp.repeat(Y[:, 1:4], 2, axis=-1),
                Y[:, 4:9],
            ],
            axis=-1,
        )

    def out_norms(v_edge, v_aux):
        Yf = spherical_harmonics(2, jnp.asarray(v_edge, jnp.float32))
        o = conv_tp_apply(spec, feats(v_aux), Yf, w)
        # grouped ir_mul assembly: norms per SIMPLIFIED block (full irrep
        # groups) are the rotation invariants
        return np.asarray(
            jnp.stack(
                [jnp.linalg.norm(o[:, s]) for s in spec.irreps_mid.simplify().slices()]
            )
        )

    R = Rotation.from_rotvec([0.3, 0.7, -0.4]).as_matrix()
    n1 = out_norms(vecs, aux)
    n2 = out_norms(vecs @ R.T, aux @ R.T)
    assert np.abs(n1 - n2).max() < 1e-4


def test_cutoff_envelopes_vanish_beyond_cutoff():
    """MD cell lists carry skin-shell edges (r > cutoff); the envelopes
    must be EXACTLY zero there or those edges leak weight into the conv
    (regression: un-clamped XPLOR shifted a 3k-atom MD energy by 7 meV/atom)."""
    import jax.numpy as jnp
    import numpy as np

    from sevennet_tpu.ops.radial import poly_cutoff, xplor_cutoff

    r = jnp.asarray(np.linspace(0.1, 7.0, 200))
    for env in (poly_cutoff(r, 5.0, 6), xplor_cutoff(r, 5.0, 4.5)):
        env = np.asarray(env)
        beyond = np.asarray(r) >= 5.0
        assert np.all(env[beyond] == 0.0)
        assert np.all(env[~beyond] >= -1e-7)
        assert env[0] > 0.99  # ~1 near r=0
