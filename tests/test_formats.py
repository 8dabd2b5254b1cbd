"""Coding registry / Transform / haplotype tests.

Model: the reference's standalone differential driver (src/miraculix/
main.cc:583-760) — create matrices in OneByte (oracle) coding, transform
into the coding under test, verify elementwise equivalence.
"""
import numpy as np
import pytest

from miraculix_tpu import formats
from miraculix_tpu.formats import Coding
from miraculix_tpu.io import bed

GENO_CODINGS_UNDER_TEST = [
    Coding.TWO_BIT, Coding.THREE_BIT, Coding.PLINK, Coding.FIVE_CODES,
    Coding.FOUR_BIT, Coding.ONE_BYTE, Coding.FOUR_BYTE, Coding.PLANAR16,
]


@pytest.fixture(scope="module")
def dense():
    return bed.simulate_genotypes(37, 211, seed=77)


@pytest.mark.parametrize("coding", GENO_CODINGS_UNDER_TEST)
def test_coding_roundtrip(dense, coding):
    buf = formats.encode(dense, coding)
    back = formats.decode(buf, coding, 37, 211)
    np.testing.assert_array_equal(back, dense)


def test_one_bit_roundtrip():
    g = (bed.simulate_genotypes(20, 50, seed=1) > 0).astype(np.uint8)
    buf = formats.encode(g, Coding.ONE_BIT)
    np.testing.assert_array_equal(formats.decode(buf, Coding.ONE_BIT, 20, 50), g)


def test_one_bit_rejects_genotype_2(dense):
    with pytest.raises(ValueError, match="0/1"):
        formats.encode(dense, Coding.ONE_BIT)


def test_five_codes_density(dense):
    buf = formats.encode(dense, Coding.FIVE_CODES)
    assert buf.shape == (-(-37 // 5), 211)  # 5 genotypes per byte


@pytest.mark.parametrize("to_coding", [Coding.TWO_BIT, Coding.PLINK,
                                       Coding.PLANAR16])
def test_transform_any_to_any(dense, to_coding):
    src = formats.CodedMatrix(formats.encode(dense, Coding.ONE_BYTE),
                              Coding.ONE_BYTE, 211, 37)
    dst = formats.transform(src, to_coding)
    np.testing.assert_array_equal(dst.dense(), dense)


def test_transform_subselection(dense):
    src = formats.CodedMatrix(formats.encode(dense, Coding.PLINK),
                              Coding.PLINK, 211, 37)
    sel_s, sel_i = [3, 7, 100, 200], [0, 5, 36]
    dst = formats.transform(src, Coding.ONE_BYTE, sel_snps=sel_s,
                            sel_indiv=sel_i)
    np.testing.assert_array_equal(dst.dense(), dense[np.ix_(sel_i, sel_s)])
    assert (dst.indiv, dst.snps) == (3, 4)


def test_transform_transpose(dense):
    src = formats.CodedMatrix(formats.encode(dense, Coding.ONE_BYTE),
                              Coding.ONE_BYTE, 211, 37)
    dst = formats.transform(src, Coding.TWO_BIT, transpose=True)
    np.testing.assert_array_equal(dst.dense(), dense.T)


def test_transform_from_file(tmp_path, dense):
    path = str(tmp_path / "f.bed")
    bed.write_bed(path, dense)
    m = formats.from_file(path, Coding.FIVE_CODES)
    np.testing.assert_array_equal(m.dense(), dense)


def test_zero_geno(dense):
    src = formats.CodedMatrix(formats.encode(dense, Coding.ONE_BYTE),
                              Coding.ONE_BYTE, 211, 37)
    out = formats.zero_geno(src, snps=[1, 2], indiv=[0, 3])
    d = out.dense()
    assert (d[np.ix_([0, 3], [1, 2])] == 0).all()
    d[np.ix_([0, 3], [1, 2])] = dense[np.ix_([0, 3], [1, 2])]
    np.testing.assert_array_equal(d, dense)


# ---------------------------------------------------------------------------
# haplotypes
# ---------------------------------------------------------------------------

def test_rhaplomatrix_frequencies():
    freq = np.linspace(0.1, 0.9, 30)
    m = formats.rhaplomatrix(freq, indiv=4000, seed=2)
    assert m.is_haplo and m.coding == Coding.TWO_BIT_HAPLO
    geno = formats.haplo_to_geno(m.dense())
    emp = geno.mean(axis=0) / 2.0
    assert np.abs(emp - freq).max() < 0.05  # HWE sampling tolerance


@pytest.mark.parametrize("coding", [Coding.ONE_BIT_HAPLO,
                                    Coding.TWO_BIT_HAPLO,
                                    Coding.ONE_BYTE_HAPLO,
                                    Coding.FOUR_BYTE_HAPLO,
                                    Coding.EIGHT_BYTE_HAPLO])
def test_haplo_coding_roundtrip(coding):
    m = formats.rhaplomatrix(np.full(40, 0.4), indiv=25, seed=3,
                             coding=Coding.TWO_BIT_HAPLO)
    dense = m.dense()
    buf = formats.encode(dense, coding)
    np.testing.assert_array_equal(formats.decode(buf, coding, 25, 40), dense)


def test_haplo_to_geno_transform():
    m = formats.rhaplomatrix(np.full(16, 0.5), indiv=10, seed=4)
    g = formats.transform(m, Coding.ONE_BYTE, haplo_to_geno=True)
    assert not g.is_haplo
    want = (m.dense() & 1) + ((m.dense() >> 1) & 1)
    np.testing.assert_array_equal(g.dense(), want)


def test_haplo_geno_guard(dense):
    src = formats.CodedMatrix(formats.encode(dense, Coding.ONE_BYTE),
                              Coding.ONE_BYTE, 211, 37)
    with pytest.raises(ValueError):
        formats.transform(src, Coding.TWO_BIT_HAPLO)
