"""GRM / LD crossproduct correctness vs dense oracles.

Mirrors reference tests/crossproduct/test_grm.jl (dense-oracle path, centered
and uncentered, odd edge dims like 953x752) and test_ld.jl.
"""
import numpy as np
import pytest

import miraculix_tpu as mx
from miraculix_tpu.io import bed
from miraculix_tpu.ops import ref_impl


@pytest.mark.parametrize("indiv,snps", [(40, 100), (128, 512), (95, 753)])
def test_crossprod_exact_integers(rng, indiv, snps):
    g = bed.simulate_genotypes(indiv, snps, seed=7)
    gm = mx.from_dense(g)
    m = np.asarray(mx.snp_crossprod(gm))
    want = ref_impl.crossprod_oracle(g)
    np.testing.assert_array_equal(m, want)  # bf16xbf16->f32 is EXACT here


def test_crossprod_snpmajor(rng):
    g = bed.simulate_genotypes(60, 200, seed=8)
    gm = mx.from_dense(g)
    m = np.asarray(mx.snp_crossprod(gm, snpmajor_output=True))
    want = ref_impl.crossprod_oracle(g, snpmajor_output=True)
    np.testing.assert_array_equal(m, want)


@pytest.mark.parametrize("indiv,snps", [(100, 400), (953, 752)])
def test_grm_matches_definition(rng, indiv, snps):
    """Schlather decomposition == direct P Z Zt P / sigma2 (docs/grm.md)."""
    g = bed.simulate_genotypes(indiv, snps, seed=9)
    gm = mx.from_dense(g)
    got = np.asarray(mx.grm(gm), dtype=np.float64)
    want = ref_impl.grm_oracle(g, np.asarray(gm.freq, np.float64))
    assert np.abs(got - want).max() < 1e-4
    assert np.allclose(got, got.T)


def test_grm_unscaled(rng):
    g = bed.simulate_genotypes(50, 150, seed=10)
    gm = mx.from_dense(g)
    got = np.asarray(mx.grm(gm, scale=False), dtype=np.float64)
    want = ref_impl.grm_oracle(g, np.asarray(gm.freq, np.float64), scale=False)
    assert np.abs(got - want).max() < 1e-3


def test_ld_matches_oracle(rng):
    g = bed.simulate_genotypes(300, 80, seed=11)
    gm = mx.from_dense(g)
    got = np.asarray(mx.ld(gm), dtype=np.float64)
    want = ref_impl.ld_oracle(g, np.asarray(gm.freq, np.float64))
    assert np.abs(got - want).max() < 1e-4
    # r^2 diagonal is exactly 1
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-6)
    # LD against the empirical correlation of allele counts
    z = g.astype(np.float64)
    corr = np.corrcoef(z.T)
    # ld() centers by 2f (allele freq), not the sample mean; they coincide
    # because mean = 2f by definition
    assert np.abs(got - corr).max() < 1e-4
