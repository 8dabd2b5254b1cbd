"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The reference has no distributed layer (SURVEY.md §2.5); these tests define
the new contract: N-device results == 1-device results == dense oracle.
"""
import jax
import numpy as np
import pytest

import miraculix_tpu as mx
from miraculix_tpu import parallel, solve
from miraculix_tpu.io import bed
from miraculix_tpu.ops import ref_impl


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return parallel.make_mesh(8)


@pytest.fixture(scope="module")
def panel():
    g = bed.simulate_genotypes(80, 5000, seed=21)
    return g


def test_shard_roundtrip_shapes(mesh8, panel):
    sg = parallel.shard_genotypes(panel, mesh8)
    assert sg.snps == 5000 and sg.indiv == 80
    assert sg.zq_n.shape[1] == 8 * sg.kw_local
    assert sg.zq_t.shape[0] == 8 * sg.spd


@pytest.mark.parametrize("trans", ["n", "t"])
@pytest.mark.parametrize("center", [False, True])
def test_sharded_dgemm_matches_oracle(rng, mesh8, panel, trans, center):
    sg = parallel.shard_genotypes(panel, mesh8)
    freq = np.asarray(
        mx.from_dense(panel).freq, np.float64)
    rows_b = 5000 if trans == "n" else 80
    b = rng.standard_normal((rows_b, 3))
    got = np.asarray(parallel.sharded_dgemm(sg, b, trans=trans, center=center))
    want = ref_impl.dgemm_oracle(panel, b, freq, trans=trans, center=center)
    assert np.abs(got - want).max() / max(1.0, np.abs(want).max()) < 1e-4


def test_sharded_matches_single_device(rng, mesh8, panel):
    """1-chip vs N-chip equality (SURVEY.md §4 multi-node test plan)."""
    mesh1 = parallel.make_mesh(1)
    sg8 = parallel.shard_genotypes(panel, mesh8)
    sg1 = parallel.shard_genotypes(panel, mesh1)
    b = rng.standard_normal((5000, 2))
    c8 = np.asarray(parallel.sharded_dgemm(sg8, b, trans="n"))
    c1 = np.asarray(parallel.sharded_dgemm(sg1, b, trans="n"))
    # f32 partials reduce in a different order across meshes
    np.testing.assert_allclose(c8, c1, atol=1e-4 * np.abs(c1).max())


def test_sharded_grm(mesh8, panel):
    sg = parallel.shard_genotypes(panel, mesh8)
    got = np.asarray(parallel.sharded_grm(sg), dtype=np.float64)
    freq = np.asarray(mx.from_dense(panel).freq, np.float64)
    want = ref_impl.grm_oracle(panel, freq)
    assert np.abs(got - want).max() < 1e-4


def test_sharded_grm_scatter(mesh8, panel):
    sg = parallel.shard_genotypes(panel, mesh8)
    full = np.asarray(parallel.sharded_grm(sg, scatter=False), np.float64)
    scat = np.asarray(parallel.sharded_grm(sg, scatter=True), np.float64)
    n = sg.indiv
    np.testing.assert_allclose(scat[:n, :n], full, rtol=1e-5, atol=1e-5)
    # padding must be exactly zero
    assert np.abs(scat[n:, :]).max() == 0.0
    assert np.abs(scat[:, n:]).max() == 0.0


def test_sharded_grm_matvec(rng, mesh8, panel):
    sg = parallel.shard_genotypes(panel, mesh8)
    freq = np.asarray(mx.from_dense(panel).freq, np.float64)
    zc = panel.astype(np.float64) - 2.0 * freq[None, :]
    v = rng.standard_normal((80, 2))
    got = np.asarray(parallel.sharded_grm_matvec(sg, v))
    want = zc @ (zc.T @ v)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-4


def test_sharded_cg_solve(rng, mesh8, panel):
    sg = parallel.shard_genotypes(panel, mesh8)
    freq = np.asarray(mx.from_dense(panel).freq, np.float64)
    zc = panel.astype(np.float64) - 2.0 * freq[None, :]
    gmat = zc @ zc.T
    lam = 100.0
    b = rng.standard_normal(80)
    res = parallel.sharded_cg_solve(sg, b, lam=lam, tol=1e-8, maxiter=1000)
    want = np.linalg.solve(gmat + lam * np.eye(80), b)
    assert np.abs(np.asarray(res.x) - want).max() < 1e-4


def test_save_load_sharded(tmp_path, rng):
    from miraculix_tpu import parallel
    from miraculix_tpu.io import bed
    from miraculix_tpu.parallel.sharded import load_sharded, save_sharded

    g = bed.simulate_genotypes(40, 700, seed=8)
    mesh = parallel.make_mesh(8)
    sg = parallel.shard_genotypes(g, mesh)
    p = str(tmp_path / "panel.npz")
    save_sharded(p, sg)
    sg2 = load_sharded(p, parallel.make_mesh(8))
    # wide path (n > 64) exercises the per-device packing structure that a
    # different-device-count reload would scramble
    b = rng.standard_normal((700, 72)).astype(np.float32)
    c1 = np.asarray(parallel.sharded_dgemm(sg, b, trans="n"))
    c2 = np.asarray(parallel.sharded_dgemm(sg2, b, trans="n"))
    np.testing.assert_allclose(c1, c2, atol=1e-4)
    with pytest.raises(ValueError):
        load_sharded(p, parallel.make_mesh(4))  # device count must match


def test_sharded_grm_diag_and_pcg(mesh8, panel):
    """Sharded exact diagonal == single-chip grm_diag; preconditioned
    sharded CG solves to the same answer."""
    import jax.numpy as jnp

    from miraculix_tpu.parallel import (shard_genotypes, sharded_cg_solve,
                                        sharded_grm_diag)

    g = panel
    gm = mx.from_dense(g)
    sg = shard_genotypes(g, mesh8)
    got = np.asarray(sharded_grm_diag(sg))
    want = np.asarray(solve.grm_diag(gm))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    rng = np.random.default_rng(9)
    b = jnp.asarray(rng.standard_normal(g.shape[0]), jnp.float32)
    res = sharded_cg_solve(sg, b, lam=40.0, tol=1e-5, maxiter=2000,
                           precondition=True)
    f = np.asarray(gm.freq, np.float64)
    zc = g.astype(np.float64) - 2.0 * f[None, :]
    want_x = np.linalg.solve(zc @ zc.T + 40.0 * np.eye(g.shape[0]),
                             np.asarray(b))
    assert np.abs(np.asarray(res.x) - want_x).max() / np.abs(want_x).max() \
        < 1e-4


def test_sharded_snp_sq_stats_and_weighted_diag(rng, mesh8, panel):
    """Direct oracles for the round-5 GWAS primitives: per-SNP sum z^2
    (diag Z'Z) and the SNP-weighted centered diagonal that preconditions
    the sharded LOCO CG."""
    sg = parallel.shard_genotypes(panel, mesh8)
    zsq = np.asarray(parallel.sharded_snp_sq_stats(sg), np.float64)
    zf = panel.astype(np.float64)
    np.testing.assert_allclose(zsq, (zf ** 2).sum(axis=0), rtol=0, atol=0)

    w_real = (rng.random(5000) < 0.7).astype(np.float64)
    w_pad = np.zeros(sg.freq.shape[0], np.float32)
    w_pad[:5000] = w_real
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    w_sh = jax.device_put(w_pad, NamedSharding(
        sg.zq_n.sharding.mesh, P(sg.axis)))
    got = np.asarray(parallel.sharded_weighted_grm_diag(sg, w_sh),
                     np.float64)
    f = np.asarray(mx.from_dense(panel).freq, np.float64)
    zc = zf - 2.0 * f[None, :]
    want = (w_real[None, :] * zc ** 2).sum(axis=1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)
