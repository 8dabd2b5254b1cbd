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


def test_bed_ingest_fused_matches_fallback(tmp_path, rng):
    """Fused native .bed ingestion (io.native.bed_ingest) must be
    bit-identical to decode+pack, including missing handling and both
    frequency caches."""
    from miraculix_tpu import geno as G
    from miraculix_tpu.io import bed, native

    if native.get_lib() is None or not hasattr(native.get_lib(), "mx_bed_ingest"):
        import pytest
        pytest.skip("native codec unavailable")
    g = bed.simulate_genotypes(203, 1401, seed=15, missing_rate=0.04)
    p = str(tmp_path / "f.bed")
    bed.write_bed(p, g)
    fast = G.from_bed(p)
    slow = G.from_dense(bed.read_bed_genotypes(p)[0])
    np.testing.assert_array_equal(np.asarray(fast.zq_n), np.asarray(slow.zq_n))
    np.testing.assert_array_equal(np.asarray(fast.zq_t), np.asarray(slow.zq_t))
    np.testing.assert_allclose(np.asarray(fast.freq), np.asarray(slow.freq),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(fast.pseudo_freq),
                               np.asarray(slow.pseudo_freq), atol=1e-6)


def test_bed_colstats_exact(tmp_path):
    """Per-individual sum/called straight off the payload: exact vs a
    missing-aware numpy oracle, including the ragged last byte."""
    from miraculix_tpu.io import bed, native

    if native.get_lib() is None or not hasattr(native.get_lib(),
                                               "mx_bed_colstats"):
        import pytest
        pytest.skip("native codec unavailable")
    g = bed.simulate_genotypes(509, 1203, seed=4, missing_rate=0.07)
    p = str(tmp_path / "cs.bed")
    bed.write_bed(p, g)
    payload, n_snps, n_indiv = bed.read_bed_payload(p)
    s, c = native.bed_colstats(payload, n_snps, n_indiv)
    miss = g == 3
    np.testing.assert_array_equal(
        s, np.where(miss, 0, g).astype(np.int64).sum(axis=1))
    np.testing.assert_array_equal(c, (~miss).sum(axis=1))
