"""R-API surface tests (zzzR.c entries) + checkpointing + sliced .bed."""
import numpy as np
import pytest

import miraculix_tpu as mx
from miraculix_tpu import parallel, rapi
from miraculix_tpu.formats import Coding, CodedMatrix, encode
from miraculix_tpu.io import bed, codec


@pytest.fixture(scope="module")
def coded():
    g = bed.simulate_genotypes(45, 160, seed=88)
    return g, CodedMatrix(encode(g, Coding.TWO_BIT), Coding.TWO_BIT, 160, 45)


def test_create_and_fill(coded):
    g, _ = coded
    m = rapi.create_snp_matrix(160, 45)
    assert (m.dense() == 0).all()
    m = rapi.fill_snp_matrix(m, g)
    np.testing.assert_array_equal(m.dense(), g)


def test_vector012matrix(coded, rng):
    g, m = coded
    v = rng.standard_normal(45)
    np.testing.assert_allclose(rapi.vector012matrix(v, m),
                               v @ g.astype(np.float64), atol=1e-9)
    w = rng.standard_normal(160)
    np.testing.assert_allclose(rapi.matrixvector012(m, w),
                               g.astype(np.float64) @ w, atol=1e-9)


def test_geno_vector_and_vector_geno(coded, rng):
    g, m = coded
    v = rng.standard_normal((160, 2))
    got = rapi.geno_vector(m, v)
    np.testing.assert_allclose(got, g.astype(np.float64) @ v, atol=1e-3)
    w = rng.standard_normal((45, 2))
    got_t = rapi.vector_geno(m, w)
    np.testing.assert_allclose(got_t, g.astype(np.float64).T @ w, atol=1e-3)


def test_crossprod_int(coded):
    g, m = coded
    got = rapi.crossprod_int(m)
    want = g.astype(np.int64) @ g.astype(np.int64).T
    np.testing.assert_array_equal(got, want)


def test_vector_rel_matrix(coded, rng):
    g, m = coded
    v = rng.standard_normal(45)
    got = rapi.vector_rel_matrix(m, v)[:, 0]
    z = g.astype(np.float64)
    want = z @ (z.T @ v)
    np.testing.assert_allclose(got, want, atol=1e-4 * np.abs(want).max())


def test_substract_centered_and_freq(coded):
    g, m = coded
    f = rapi.allele_freq(m)
    c = rapi.substract_centered(m)
    np.testing.assert_allclose(c, g.astype(np.float64) - 2 * f[None, :])


def test_transpose(coded):
    g, m = coded
    mt = rapi.transpose(m)
    np.testing.assert_array_equal(mt.dense(), g.T)


def test_introspection():
    assert rapi.exists_coding(Coding.FIVE_CODES)
    assert rapi.exists_variant(256)
    assert not rapi.exists_variant(-1)


def test_save_load_roundtrip(tmp_path, coded, rng):
    g, _ = coded
    gm = mx.from_dense(g)
    p = str(tmp_path / "panel.npz")
    mx.geno.save(p, gm)
    gm2 = mx.geno.load(p)
    b = rng.standard_normal((160, 2))
    np.testing.assert_allclose(np.asarray(mx.dgemm(gm, b)),
                               np.asarray(mx.dgemm(gm2, b)), atol=1e-6)


def test_read_bed_slice(tmp_path):
    g = bed.simulate_genotypes(21, 333, seed=89, missing_rate=0.02)
    path = str(tmp_path / "s.bed")
    bed.write_bed(path, g)
    full, n_snps, n_indiv = bed.read_bed(path)
    sl, ns, ni = bed.read_bed_slice(path, 100, 250)
    assert (ns, ni) == (333, 21)
    np.testing.assert_array_equal(sl, full[:, 100:250])
    np.testing.assert_array_equal(codec.plink_to_dense(sl, 21), g[:, 100:250])


def test_shard_from_bed_matches_memory(tmp_path, rng):
    g = bed.simulate_genotypes(40, 3000, seed=90)
    path = str(tmp_path / "m.bed")
    bed.write_bed(path, g)
    mesh = parallel.make_mesh(4)
    sg_mem = parallel.shard_genotypes(g, mesh)
    sg_bed = parallel.shard_genotypes_from_bed(path, mesh)
    b = rng.standard_normal((3000, 2))
    c1 = np.asarray(parallel.sharded_dgemm(sg_mem, b))
    c2 = np.asarray(parallel.sharded_dgemm(sg_bed, b))
    np.testing.assert_allclose(c1, c2, atol=1e-4)


def test_rapi_options_debug_centered():
    """copyoptions / Debug / StopDebug / get_centered entries
    (reference zzzR.c:93,111-112,116)."""
    import os

    from miraculix_tpu import rapi
    from miraculix_tpu.options import Options, set_global_options

    set_global_options(Options(normalize=True))
    snap = rapi.copy_options()
    assert snap.normalize is True
    snap.normalize = False  # mutating the copy must not touch the global
    assert rapi.copy_options().normalize is True

    rapi.debug()
    assert os.environ["MIRACULIX_TPU_PRINT_LEVEL"] == "3"
    rapi.stop_debug()
    assert os.environ["MIRACULIX_TPU_PRINT_LEVEL"] == "0"

    assert rapi.get_centered() is None
    rapi.set_centered(np.arange(4.0))
    np.testing.assert_array_equal(rapi.get_centered(), np.arange(4.0))
    rapi.set_centered(None)
    set_global_options(Options())


def test_rapi_exists_and_origins():
    from miraculix_tpu import rapi

    assert rapi.exists_tiling(1024)
    assert not rapi.exists_tiling(1000, minimum=16)
    assert rapi.exists_allele_freq(rapi.Coding.TWO_BIT)
    m = np.array([[2, 1, 5, 1], [1, 2, 3, 2]])
    codes = rapi.codeOrigins(m)
    np.testing.assert_array_equal(rapi.decodeOrigins(codes), m)
