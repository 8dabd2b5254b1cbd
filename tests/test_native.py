"""Native C++ codec vs numpy fallback equivalence."""
import numpy as np
import pytest

from miraculix_tpu.io import bed, codec, native


pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native codec unavailable")


@pytest.fixture(scope="module")
def geno():
    g = bed.simulate_genotypes(517, 1333, seed=55, missing_rate=0.03)
    return g


def _numpy_only(fn, *args, **kw):
    lib, tried = native._lib, native._tried
    native._lib, native._tried = None, True
    try:
        return fn(*args, **kw)
    finally:
        native._lib, native._tried = lib, tried


def test_plink_roundtrip_native(geno):
    plink = codec.dense_to_plink(geno)
    plink_np = _numpy_only(codec.dense_to_plink, geno)
    np.testing.assert_array_equal(plink, plink_np)
    back = codec.plink_to_dense(plink, geno.shape[0])
    np.testing.assert_array_equal(back, geno)


def test_pack_native_matches_numpy(geno):
    w = codec.pack_planar16(geno)
    w_np = _numpy_only(codec.pack_planar16, geno)
    np.testing.assert_array_equal(w, w_np)


def test_pack_strided_view(geno):
    wt = codec.pack_planar16(geno.T)
    wt_c = codec.pack_planar16(np.ascontiguousarray(geno.T))
    np.testing.assert_array_equal(wt, wt_c)


def test_freq_native_matches_numpy(geno):
    f = codec.allele_freq(geno)
    f_np = _numpy_only(codec.allele_freq, geno)
    np.testing.assert_allclose(f, f_np, atol=1e-12)


def test_transpose_and_missing_count(geno):
    t = native.transpose_u8(geno)
    np.testing.assert_array_equal(t, geno.T)
    assert native.count_missing(geno) == int((geno == 3).sum())
