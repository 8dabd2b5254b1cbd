"""C-API facade tests: the reference's Julia/Fortran call sequences
translated 1:1 (tests/dgemm_compressed/test.jl,
tests/sparse_plink/test_sparse_plink.f90)."""
import numpy as np
import pytest

from miraculix_tpu import api
from miraculix_tpu.io import bed, codec
from miraculix_tpu.ops import ref_impl


@pytest.fixture()
def fileset(tmp_path):
    g = bed.simulate_genotypes(123, 800, seed=33)
    path = str(tmp_path / "t.bed")
    bed.write_bed(path, g)
    return path, g


def test_full_reference_call_sequence(fileset, rng):
    """The exact flow of tests/dgemm_compressed/test.jl."""
    path, g = fileset
    api.set_options(use_gpu=True, print_details=0)
    plink, n_snps, n_indiv = bed.read_bed(path)
    plink_t = codec.plink_transpose_packed(plink, n_indiv, n_snps)
    freq = codec.allele_freq(g)

    obj = api.plink2compressed(plink, plink_t, n_snps, n_indiv, freq, 10)

    b = rng.standard_normal((n_snps, 10))
    b_t = rng.standard_normal((n_indiv, 10))
    c = api.dgemm_compressed("N", obj, 10, b)
    c_t = api.dgemm_compressed("T", obj, 10, b_t)

    want = ref_impl.dgemm_oracle(g, b, freq, trans="n", center=True)
    want_t = ref_impl.dgemm_oracle(g, b_t, freq, trans="t", center=True)
    assert np.abs(c - want).max() < 1e-1          # reference tolerance
    assert np.abs(c_t - want_t).max() < 1e-1
    assert np.abs(c - want).max() / np.abs(want).max() < 1e-4  # ours

    f_out = api.get_compressed_freq(obj)
    np.testing.assert_allclose(f_out, freq, atol=1e-6)

    api.free_compressed(obj)
    assert obj.zq_n is None


def test_output_buffer_filled_in_place(fileset, rng):
    path, g = fileset
    plink, n_snps, n_indiv = bed.read_bed(path)
    api.set_options()
    obj = api.plink2compressed(plink, None, n_snps, n_indiv)
    b = rng.standard_normal((n_snps, 2))
    c_buf = np.zeros((n_indiv, 2))
    ret = api.dgemm_compressed("N", obj, 2, b, n_snps, c_buf, n_indiv)
    assert ret is c_buf and np.abs(c_buf).max() > 0


def test_do_not_center_option(fileset, rng):
    path, g = fileset
    plink, n_snps, n_indiv = bed.read_bed(path)
    api.set_options(do_not_center=1)
    obj = api.plink2compressed(plink, None, n_snps, n_indiv)
    b = rng.standard_normal((n_snps, 2))
    c = api.dgemm_compressed("N", obj, 2, b)
    want = ref_impl.dgemm_oracle(g, b, None, center=False)
    assert np.abs(c - want).max() / np.abs(want).max() < 1e-4
    api.set_options()  # reset


def test_dgemm_plink_direct(fileset, rng):
    """dgemm_plink: no explicit preprocessing step (5codesAPI.c:112-130)."""
    path, g = fileset
    plink, n_snps, n_indiv = bed.read_bed(path)
    api.set_options()
    b = rng.standard_normal((n_snps, 3))
    c = api.dgemm_plink("N", plink, None, n_snps, n_indiv, None, 3, b)
    want = ref_impl.dgemm_oracle(g, b, None, center=False)
    assert np.abs(c - want).max() / np.abs(want).max() < 1e-4


def test_sparse_times_plink_reference_case(tmp_path):
    """The hard-coded CSR case of tests/sparse_plink/test_sparse_plink.f90:
    S [2 x 5] (1-based CSR), C = S @ Z."""
    g = bed.simulate_genotypes(5, 40, seed=44)  # 5 individuals
    path = str(tmp_path / "s.bed")
    bed.write_bed(path, g)
    plink, n_snps, n_indiv = bed.read_bed(path)

    ia = np.array([1, 5, 8])
    ja = np.array([1, 2, 3, 5, 1, 2, 5])
    a = np.array([0.5, 0.5, -1.0, 0.0, -1.0, 0.5, -1.0])
    api.set_options()
    c = api.sparse_times_plink("N", "N", plink, None, n_snps, n_indiv,
                               2, ia, ja, a)
    s_dense = np.zeros((2, 5))
    rows = np.repeat(np.arange(2), np.diff(ia - 1))
    s_dense[rows, ja - 1] = a
    want = s_dense @ g.astype(np.float64)
    assert c.shape == (2, n_snps)
    np.testing.assert_allclose(c, want, atol=1e-5)


def test_sparse_times_plink_transposed_geno(tmp_path, rng):
    g = bed.simulate_genotypes(30, 12, seed=45)
    path = str(tmp_path / "s2.bed")
    bed.write_bed(path, g)
    plink, n_snps, n_indiv = bed.read_bed(path)
    # S maps SNPs now: [3, 12]
    s = (rng.random((3, 12)) < 0.3) * rng.standard_normal((3, 12))
    ia = np.concatenate([[0], np.cumsum((s != 0).sum(axis=1))]) + 1
    ja = np.nonzero(s)[1] + 1
    a = s[s != 0]
    c = api.sparse_times_plink("N", "T", plink, None, n_snps, n_indiv,
                               3, ia, ja, a)
    want = s @ g.astype(np.float64).T
    np.testing.assert_allclose(c, want, atol=1e-5)


def test_sparse_times_plink_transposed_sparse(tmp_path, rng):
    """transsparse='T': the CSR triplets describe Sᵀ storage
    (5codesAPI.c:135-157 transS semantics)."""
    g = bed.simulate_genotypes(24, 10, seed=46)
    path = str(tmp_path / "s3.bed")
    bed.write_bed(path, g)
    plink, n_snps, n_indiv = bed.read_bed(path)
    # stored matrix [indiv, n_idx] = Sᵀ; effective S = storedᵀ [n_idx, indiv]
    stored = (rng.random((24, 3)) < 0.3) * rng.standard_normal((24, 3))
    ia = np.concatenate([[0], np.cumsum((stored != 0).sum(axis=1))]) + 1
    ja = np.nonzero(stored)[1] + 1
    a = stored[stored != 0]
    c = api.sparse_times_plink("T", "N", plink, None, n_snps, n_indiv,
                               3, ia, ja, a)
    want = stored.T @ g.astype(np.float64)
    np.testing.assert_allclose(c, want, atol=1e-4)
