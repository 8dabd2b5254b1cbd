"""Codec round-trip and .bed I/O tests.

Mirrors the reference's consistency tests (tests/dgemm_compressed/test.jl:
packed dims, transpose round-trip via decompression, freq checks).
"""
import numpy as np
import pytest

from miraculix_tpu.io import bed, codec


def _random_geno(rng, indiv, snps, missing_rate=0.0):
    g = rng.integers(0, 3, size=(indiv, snps)).astype(np.uint8)
    if missing_rate:
        g = np.where(rng.random((indiv, snps)) < missing_rate, np.uint8(3), g)
    return g


@pytest.mark.parametrize("indiv,snps", [(17, 33), (64, 128), (101, 953)])
def test_plink_roundtrip(rng, indiv, snps):
    g = _random_geno(rng, indiv, snps, missing_rate=0.05)
    plink = codec.dense_to_plink(g)
    assert plink.shape == ((indiv + 3) // 4, snps)
    back = codec.plink_to_dense(plink, indiv)
    np.testing.assert_array_equal(back, g)


def test_plink_transpose(rng):
    indiv, snps = 53, 117
    g = _random_geno(rng, indiv, snps)
    plink = codec.dense_to_plink(g)
    plink_t = codec.plink_transpose_packed(plink, indiv, snps)
    assert plink_t.shape == ((snps + 3) // 4, indiv)
    back = codec.plink_to_dense(plink_t, snps)
    np.testing.assert_array_equal(back, g.T)


@pytest.mark.parametrize("indiv,snps", [(10, 7), (100, 2000), (257, 4097)])
def test_planar16_roundtrip(rng, indiv, snps):
    g = _random_geno(rng, indiv, snps)
    words = codec.pack_planar16(g)
    rp, kw = codec.planar16_dims(indiv, snps)
    assert words.shape == (rp, kw)
    assert words.dtype == np.uint32
    back = codec.unpack_planar16(words, indiv, snps)
    np.testing.assert_array_equal(back, g)


def test_planar16_zeroes_missing(rng):
    g = _random_geno(rng, 20, 40, missing_rate=0.3)
    words = codec.pack_planar16(g)
    back = codec.unpack_planar16(words, 20, 40)
    np.testing.assert_array_equal(back, np.where(g == 3, 0, g))


def test_allele_freq_excludes_missing():
    g = np.array([[0, 2], [1, 3], [2, 3], [3, 2]], dtype=np.uint8)
    f = codec.allele_freq(g)
    # col 0: called 0,1,2 -> 3/(2*3); col 1: called 2,2 -> 4/(2*2)
    np.testing.assert_allclose(f, [0.5, 1.0])


def test_bed_roundtrip(tmp_path, rng):
    g = _random_geno(rng, 37, 91, missing_rate=0.02)
    path = str(tmp_path / "panel.bed")
    bed.write_bed(path, g)
    plink, n_snps, n_indiv = bed.read_bed(path)
    assert (n_indiv, n_snps) == (37, 91)
    geno, freq = bed.read_bed_genotypes(path)
    np.testing.assert_array_equal(geno, g)
    np.testing.assert_allclose(freq, codec.allele_freq(g))


def test_bed_magic_check(tmp_path):
    p = tmp_path / "bad.bed"
    p.write_bytes(b"xyz123")
    (tmp_path / "bad.fam").write_text("a\n")
    (tmp_path / "bad.bim").write_text("a\n")
    with pytest.raises(ValueError, match="magic"):
        bed.read_bed(str(p))


def test_freq_file_roundtrip(tmp_path, rng):
    f = rng.random(13)
    path = str(tmp_path / "x.freq")
    bed.write_freq(path, f)
    back = bed.read_freq(path)
    np.testing.assert_allclose(back, f, atol=1e-9)


def test_simulate_hwe():
    g = bed.simulate_genotypes(5000, 50, seed=1)
    assert g.shape == (5000, 50)
    assert set(np.unique(g)) <= {0, 1, 2}
    f = codec.allele_freq(g)
    assert (f > 0.0).all() and (f < 0.65).all()


def test_unpack_planar16_cols_matches_full():
    from miraculix_tpu.io import codec

    rng = np.random.default_rng(4)
    g = rng.integers(0, 3, size=(37, 533)).astype(np.uint8)
    words = codec.pack_planar16(g, row_mult=8)
    idx = np.sort(rng.choice(533, size=101, replace=False))
    full = codec.unpack_planar16(words, 37, 533)
    got = codec.unpack_planar16_cols(words, 37, idx)
    np.testing.assert_array_equal(got, full[:, idx])
