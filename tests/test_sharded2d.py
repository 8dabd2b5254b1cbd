"""2D mesh (individuals x SNPs) sharding correctness on the 8-device
virtual CPU mesh: every op must match the single-chip oracle exactly
(1-chip vs N-chip equality, SURVEY.md §4 multi-node test plan)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from miraculix_tpu import parallel
from miraculix_tpu.io import bed
from miraculix_tpu.ops import ref_impl


@pytest.fixture(scope="module")
def mesh():
    return parallel.make_mesh_2d(8)  # 2 x 4 or 4 x 2


@pytest.fixture(scope="module")
def panel():
    g = bed.simulate_genotypes(70, 900, seed=11)
    return g


def test_mesh_shape(mesh):
    di, dk = mesh.shape["i"], mesh.shape["k"]
    assert di * dk == 8


def test_sharded_dgemm_2d_both_orientations(mesh, panel, rng):
    sg = parallel.shard_genotypes_2d(panel, mesh)
    f = ref_impl.allele_freq_oracle(panel, axis=0)

    b = rng.standard_normal((900, 3)).astype(np.float32)
    bp = parallel.pad_snp_vec(sg, jnp.asarray(b))
    c = np.asarray(parallel.sharded_dgemm_2d(sg, bp, trans="n"))[:70]
    want = ref_impl.dgemm_oracle(panel, b.astype(np.float64), f, trans="n")
    assert np.abs(c - want).max() / max(1.0, np.abs(want).max()) < 1e-4

    bt = rng.standard_normal((70, 3)).astype(np.float32)
    btp = parallel.pad_indiv_vec(sg, jnp.asarray(bt))
    ct = np.asarray(parallel.sharded_dgemm_2d(sg, btp, trans="t"))[:900]
    wantt = ref_impl.dgemm_oracle(panel, bt.astype(np.float64), f, trans="t")
    assert np.abs(ct - wantt).max() / max(1.0, np.abs(wantt).max()) < 1e-4


def test_sharded_grm_2d(mesh, panel):
    sg = parallel.shard_genotypes_2d(panel, mesh)
    g2 = np.asarray(parallel.sharded_grm_2d(sg))[:70, :70]
    f = ref_impl.allele_freq_oracle(panel, axis=0)
    want = ref_impl.grm_oracle(panel, f)
    assert np.abs(g2 - want).max() < 1e-4


def test_sharded_cg_2d_matches_dense(mesh, panel, rng):
    sg = parallel.shard_genotypes_2d(panel, mesh)
    f = ref_impl.allele_freq_oracle(panel, axis=0)
    b = rng.standard_normal(70).astype(np.float32)
    lam = 80.0
    res = parallel.sharded_cg_solve_2d(sg, jnp.asarray(b), lam=lam,
                                       tol=1e-6, maxiter=300)
    x = np.asarray(res.x)[:70]
    zc = np.where(panel == 3, 0, panel).astype(np.float64) - 2.0 * f[None, :]
    a = zc @ zc.T + lam * np.eye(70)
    np.testing.assert_allclose(a @ x, b, atol=5e-3)


def test_2d_matches_1d(mesh, panel, rng):
    """Cross-layout equality: 2D result == 1D result == single-chip."""
    sg2 = parallel.shard_genotypes_2d(panel, mesh)
    mesh1 = parallel.make_mesh(8)
    sg1 = parallel.shard_genotypes(panel, mesh1)
    b = rng.standard_normal((900, 2)).astype(np.float32)
    c2 = np.asarray(parallel.sharded_dgemm_2d(
        sg2, parallel.pad_snp_vec(sg2, jnp.asarray(b)), trans="n"))[:70]
    c1 = np.asarray(parallel.sharded_dgemm(sg1, jnp.asarray(b), trans="n"))[:70]
    np.testing.assert_allclose(c2, c1, atol=1e-3)


def test_shard_2d_from_bed_matches_dense(mesh, panel, tmp_path, rng):
    """2D block ingestion straight from .bed (per-block reads) must match
    in-memory 2D sharding exactly."""
    from miraculix_tpu.io import bed

    p = str(tmp_path / "p2d.bed")
    bed.write_bed(p, panel)
    sg_mem = parallel.shard_genotypes_2d(panel, mesh)
    sg_bed = parallel.shard_genotypes_2d_from_bed(p, mesh)
    np.testing.assert_array_equal(np.asarray(sg_bed.zq_n),
                                  np.asarray(sg_mem.zq_n))
    np.testing.assert_array_equal(np.asarray(sg_bed.zq_t),
                                  np.asarray(sg_mem.zq_t))
    np.testing.assert_allclose(np.asarray(sg_bed.freq),
                               np.asarray(sg_mem.freq), atol=1e-6)


def test_sharded_fuzz_vs_single_chip(mesh, rng):
    """Random-shape sweep: 1D and 2D distributed dgemm must match the
    single-chip oracle on every draw."""
    for trial in range(4):
        indiv = int(rng.integers(10, 120))
        snps = int(rng.integers(20, 900))
        n = int(rng.integers(1, 6))
        g = bed.simulate_genotypes(indiv, snps, seed=100 + trial)
        f = ref_impl.allele_freq_oracle(g, axis=0)
        b = rng.standard_normal((snps, n)).astype(np.float32)
        want = ref_impl.dgemm_oracle(g, b.astype(np.float64), f, trans="n")
        scale = max(1.0, np.abs(want).max())

        sg1 = parallel.shard_genotypes(g, parallel.make_mesh(8))
        c1 = np.asarray(parallel.sharded_dgemm(sg1, jnp.asarray(b),
                                               trans="n"))[:indiv]
        assert np.abs(c1 - want).max() / scale < 1e-4, ("1d", indiv, snps, n)

        sg2 = parallel.shard_genotypes_2d(g, mesh)
        c2 = np.asarray(parallel.sharded_dgemm_2d(
            sg2, parallel.pad_snp_vec(sg2, jnp.asarray(b)),
            trans="n"))[:indiv]
        assert np.abs(c2 - want).max() / scale < 1e-4, ("2d", indiv, snps, n)


def test_sharded2d_grm_diag_and_pcg(mesh, panel):
    """2D exact diagonal == single-chip grm_diag on the real rows;
    preconditioned 2D CG reaches the same solution."""
    import jax.numpy as jnp
    import numpy as np

    import miraculix_tpu as mx
    from miraculix_tpu import solve
    from miraculix_tpu.parallel import (shard_genotypes_2d,
                                        sharded_cg_solve_2d,
                                        sharded_grm_diag_2d)

    g = panel
    sg = shard_genotypes_2d(g, mesh)
    gm = mx.from_dense(g)
    got = np.asarray(sharded_grm_diag_2d(sg))[: g.shape[0]]
    want = np.asarray(solve.grm_diag(gm))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    rng = np.random.default_rng(11)
    b = jnp.asarray(rng.standard_normal(g.shape[0]), jnp.float32)
    res = sharded_cg_solve_2d(sg, b, lam=30.0, tol=1e-5, maxiter=2000,
                              precondition=True)
    f = np.asarray(gm.freq, np.float64)
    zc = g.astype(np.float64) - 2.0 * f[None, :]
    want_x = np.linalg.solve(zc @ zc.T + 30.0 * np.eye(g.shape[0]),
                             np.asarray(b))
    x = np.asarray(res.x)[: g.shape[0]]
    assert np.abs(x - want_x).max() / np.abs(want_x).max() < 1e-4


def test_multi_v_solver_2d_matches_dense(mesh, panel):
    """gblup._multi_v_solver on a 2D-sharded container: the traced-Sg/Se
    device CG must match a dense f64 Kronecker solve (and so the
    single-chip path tested in test_gblup)."""
    from miraculix_tpu import gblup

    n, t, m = panel.shape[0], 2, 3
    sg2d = parallel.shard_genotypes_2d(panel, mesh)
    f = np.asarray(sg2d.freq, np.float64)[: panel.shape[1]]
    zc = panel.astype(np.float64) - 2 * f
    sig2 = float(sg2d.sigma2)
    gs = zc @ zc.T / sig2

    sgm = np.array([[1.0, 0.4], [0.4, 0.9]])
    sem = np.array([[0.8, 0.1], [0.1, 1.1]])
    v = np.kron(gs, sgm) + np.kron(np.eye(n), sem)

    rng = np.random.default_rng(7)
    b3 = rng.standard_normal((n, t, m))
    solve = gblup._multi_v_solver(sg2d, t, np.diag(gs), cg_tol=1e-6,
                                  cg_maxiter=3000)
    x3, _ = solve(b3, sgm, sem)
    x_ref = np.linalg.solve(v, b3.reshape(n * t, m))
    rel = (np.linalg.norm(x3.reshape(n * t, m) - x_ref, axis=0)
           / np.linalg.norm(x_ref, axis=0))
    assert rel.max() < 3e-4, rel
