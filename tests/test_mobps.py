"""MoBPS bridge tests: origin packing round-trip, recombination
reconstruction, mutations, on-the-fly relationship."""
import numpy as np
import pytest

from miraculix_tpu import mobps


def test_code_origins_roundtrip(rng):
    m = np.stack([
        rng.integers(1, 64, 50),
        rng.integers(1, 3, 50),
        rng.integers(1, 1 << 22, 50),
        rng.integers(1, 9, 50),
    ], axis=1)
    codes = mobps.code_origins(m)
    np.testing.assert_array_equal(mobps.decode_origins(codes), m)


def test_code_origins_bounds():
    with pytest.raises(ValueError):
        mobps.code_origins(np.array([[0, 1, 1, 1]]))
    with pytest.raises(ValueError):
        mobps.code_origins(np.array([[1, 3, 1, 1]]))


def _toy_population(snps=20):
    rng = np.random.default_rng(5)
    founders = {}
    for nr in (1, 2):
        founders[(1, 1, nr)] = mobps.Individual(
            haplo=rng.integers(0, 2, (2, snps)).astype(np.uint8))
        founders[(1, 2, nr)] = mobps.Individual(
            haplo=rng.integers(0, 2, (2, snps)).astype(np.uint8))
    # child: haplotype 0 = dad's hap0 until snp 8, then dad's hap1;
    #        haplotype 1 = mom's hap1 throughout, with a mutation at snp 3
    child = mobps.Individual(
        recombi=([0.0, 8.0, snps * 1.0], [0.0, snps * 1.0]),
        origins=(
            mobps.code_origins(np.array([[1, 1, 1, 1], [1, 1, 1, 2]])),
            mobps.code_origins(np.array([[1, 2, 1, 2]])),
        ),
        mutations=((), (3,)),
    )
    pop = mobps.Population(
        snps=snps,
        individuals={**founders, (2, 1, 1): child},
    )
    return pop, founders


def test_compute_snps_founder():
    pop, founders = _toy_population()
    g = mobps.compute_snps(pop, [1], [1], [1])
    want = founders[(1, 1, 1)].haplo.sum(axis=0)
    np.testing.assert_array_equal(g[0], want)


def test_compute_snps_recombination_and_mutation():
    pop, founders = _toy_population()
    g = mobps.compute_snps(pop, [2], [1], [1])[0]
    dad = founders[(1, 1, 1)].haplo
    mom = founders[(1, 2, 1)].haplo
    hap0 = np.concatenate([dad[0][:8], dad[1][8:]])
    hap1 = mom[1].copy()
    hap1[3] ^= 1
    np.testing.assert_array_equal(g, hap0 + hap1)


def test_compute_snps_window():
    pop, _ = _toy_population()
    g_full = mobps.compute_snps(pop, [2], [1], [1])
    g_win = mobps.compute_snps(pop, [2], [1], [1], from_snp=5, to_snp=15)
    np.testing.assert_array_equal(g_win[0], g_full[0][5:15])


def test_compute_relationship():
    pop, _ = _toy_population()
    gmat = np.asarray(mobps.compute_relationship(
        pop, [1, 1, 2], [1, 2, 1], [1, 1, 1]))
    assert gmat.shape == (3, 3)
    assert np.allclose(gmat, gmat.T)
