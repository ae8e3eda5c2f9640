from sevennet_tpu.irreps import Irrep, Irreps, full_tensor_product_irreps, infer_irreps_out


import pytest

pytestmark = pytest.mark.smoke


def test_parse_repr():
    ir = Irreps("128x0e+64x1o+32x2e")
    assert ir.dim == 128 + 64 * 3 + 32 * 5
    assert ir.num_irreps == 224
    assert ir.lmax == 2
    assert repr(ir) == "128x0e+64x1o+32x2e"


def test_sort_order():
    # e3nn canonical order: 0o < 0e < 1o < 1e < 2o < 2e — by (l, p), odd
    # first.  Pinned against reference *execution*: the frozen TorchScript
    # deployment lays out sorted conv-mid blocks as [0o, 0e, 1o, 1e]
    # (tests/test_deployed_golden.py).
    ir = Irreps("1x2o+1x0o+1x1e+1x0e+1x2e+1x1o")
    srt, p, inv = ir.sort()
    assert repr(srt) == "1x0o+1x0e+1x1o+1x1e+1x2o+1x2e"
    # p maps old->new; check roundtrip
    assert [ir[i] for i in inv] == list(srt)


def test_sort_stable():
    ir = Irreps("128x0e+64x0e+3x1e+32x0e")
    srt, p, inv = ir.sort()
    assert repr(srt) == "128x0e+64x0e+32x0e+3x1e"


def test_tensor_product_irreps():
    x = Irreps("128x0e+64x1e+32x2e")
    f = Irreps("1x0e+1x1e+1x2e")
    out = full_tensor_product_irreps(x, f)
    assert out.count("0e") == 128 + 64 + 32


def test_infer_irreps_out_sevennet0_schedule():
    """Reproduce the SevenNet-0 irreps schedule (preset irreps_manual says
    128x0e+64x1e+32x2e between layers)."""
    f = Irreps.spherical_harmonics(2, 1)  # no parity
    x = Irreps("128x0e")
    out = infer_irreps_out(x, f, 2, "full", fix_multiplicity=False)
    assert repr(out) == "128x0e+128x1e+128x2e"
    # last layer: scalars only, even
    out_last = infer_irreps_out(Irreps("128x0e+64x1e+32x2e"), f, 0, "even", 128)
    assert repr(out_last) == "128x0e"


def test_infer_irreps_parity():
    f = Irreps.spherical_harmonics(2, -1)  # 0e+1o+2e
    x = Irreps("4x0e")
    out = infer_irreps_out(x, f, 2, "full", 4)
    assert repr(out) == "4x0e+4x1o+4x2e"
    x2 = out
    out2 = infer_irreps_out(x2, f, 2, "full", 4)
    assert repr(out2) == "4x0e+4x1o+4x1e+4x2o+4x2e"
