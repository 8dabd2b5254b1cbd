"""On-device correctness drive: every production path on the REAL TPU chip.

The test suite runs on the CPU backend (conftest forces jax_platforms=cpu);
this drive re-runs the core numerical claims on actual hardware — Mosaic
compilation, bf16/int8 MXU behavior, VMEM limits — with small panels and
oracle comparisons.  Run from /root/repo:  python - < tools/tpu_drive.py

Exit code 0 = every assertion passed.
"""
import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
assert jax.default_backend() != "cpu", "this drive needs the real chip"

from miraculix_tpu import GenoMatrix, dgemm, from_dense, grm, ld  # noqa: E402
from miraculix_tpu.io import bed  # noqa: E402
from miraculix_tpu.ops import dgemm as dg  # noqa: E402
from miraculix_tpu.ops.grm import packed_crossprod, dominance_grm  # noqa: E402
from miraculix_tpu.ops.sparse import sparse_times_geno_segsum  # noqa: E402
from miraculix_tpu import solve as slv  # noqa: E402
from miraculix_tpu.solve.sparse import (SparseTriangularSolver,  # noqa: E402
                                        simulate_pedigree_factor)
from miraculix_tpu.solve.cg import grm_cg_solve  # noqa: E402
from miraculix_tpu.gblup import (estimate_h2_reml,  # noqa: E402
                                 simulate_phenotypes)

rng = np.random.default_rng(7)
INDIV, SNPS = 1_024, 8_192
g = bed.simulate_genotypes(INDIV, SNPS, seed=3)          # missing-free
gm = from_dense(g)
gz = g.astype(np.float64)
freq = np.asarray(gm.freq, np.float64)
zc = gz - 2 * freq[None, :]

ok = []


def check(name, got, want, tol):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-30)
    status = "PASS" if err < tol else "FAIL"
    ok.append(err < tol)
    print(f"{status} {name}: rel {err:.2e} (tol {tol:g})", flush=True)


# --- dgemm: trans x centering x precision tiers ------------------------------
b_n = rng.standard_normal((SNPS, 32))
b_t = rng.standard_normal((INDIV, 32))
check("dgemm n centered", dgemm(gm, b_n, trans="n"), zc @ b_n, 1e-4)
check("dgemm t centered", dgemm(gm, b_t, trans="t"), zc.T @ b_t, 1e-4)
check("dgemm n raw", dgemm(gm, b_n, center=False), gz @ b_n, 1e-4)
check("dgemm n f32", dgemm(gm, b_n, center=False, precision="f32"),
      gz @ b_n, 1e-5)
# f64 tier: host-orchestrated exact path — full f64 inputs and outputs
# regardless of jax_enable_x64 (the epilogue runs host-side in numpy)
check("dgemm n f64", dgemm(gm, b_n, center=False, precision="f64"),
      gz @ b_n, 1e-12)
check("dgemm n f64 centered", dgemm(gm, b_n, center=True, precision="f64"),
      zc @ b_n, 1e-12)
check("dgemm n bf16", dgemm(gm, b_n, center=False, precision="bf16"),
      gz @ b_n, 5e-2)

# wide schedule, both kernel variants
b_w = jnp.asarray(rng.standard_normal((SNPS, 128)), jnp.float32)
want_w = gz @ np.asarray(b_w, np.float64)
for pp in (False, True):
    got = np.asarray(dg.packed_matmul(gm.zq_n, b_w, per_plane=pp))[:INDIV]
    check(f"packed_matmul wide per_plane={pp}", got, want_w, 1e-5)

# --- crossprod / GRM / LD (incl. exact missing corrections) ------------------
m_exact = np.asarray(packed_crossprod(gm.zq_n), np.int64)[:INDIV, :INDIV]
check("crossprod exact int32", m_exact, gz @ gz.T, 1e-15)

gmiss = bed.simulate_genotypes(256, 2048, seed=21, missing_rate=0.05)
gmm = from_dense(gmiss, keep_missing_info=True)
fm = np.asarray(gmm.freq, np.float64)
zcm = np.where(gmiss == 3, 0.0, gmiss.astype(np.float64) - 2 * fm[None, :])
check("grm missing-corrected", grm(gmm, scale=False), zcm @ zcm.T, 1e-4)
cov = zcm.T @ zcm
sd = np.sqrt(np.diag(cov))
sd[sd == 0] = 1.0
check("ld missing-corrected", ld(gmm), cov / np.outer(sd, sd), 1e-3)
dg_mat = np.asarray(dominance_grm(gm))
ok.append(bool(np.isfinite(dg_mat).all()))
print(f"{'PASS' if ok[-1] else 'FAIL'} dominance grm finite", flush=True)

# --- sparse x geno segment-sum (CSR) -----------------------------------------
nidx = 300
nnz_per = rng.integers(1, 12, nidx)
row_ptr = np.concatenate([[0], np.cumsum(nnz_per)]) + 1        # 1-based
col_idx = rng.integers(0, INDIV, row_ptr[-1] - 1) + 1
vals = rng.standard_normal(row_ptr[-1] - 1)
s_dense = np.zeros((nidx, INDIV))
for i in range(nidx):
    s0, s1 = row_ptr[i] - 1, row_ptr[i + 1] - 1
    np.add.at(s_dense[i], col_idx[s0:s1] - 1, vals[s0:s1])
got = sparse_times_geno_segsum(gm, row_ptr, col_idx, vals, n_idx=nidx)
check("sparse_times_geno_segsum", got, s_dense @ gz, 1e-4)

# --- solvers -------------------------------------------------------------------
a = rng.standard_normal((256, 300))
apd = a @ a.T + 256 * np.eye(256)
bb = rng.standard_normal((256, 4))
res = slv.dense_solve(jnp.asarray(apd, jnp.float32),
                      jnp.asarray(bb, jnp.float32), calc_logdet=True)
check("dense_solve", res.x, np.linalg.solve(apd, bb), 1e-3)
check("dense_solve logdet", float(res.logdet),
      np.linalg.slogdet(apd)[1], 1e-4)

rows, cols, valsL, nped = *simulate_pedigree_factor(20_000, avg_offdiag=6,
                                                    seed=5), 20_000
st = SparseTriangularSolver(rows, cols, valsL, nped)
b_s = rng.standard_normal((nped, 4))
x = np.asarray(st.solve_lltx(jnp.asarray(b_s, jnp.float32), refine=1),
               np.float64)
import scipy.sparse as sp  # noqa: E402
L = sp.coo_matrix((valsL, (rows - 1, cols - 1)), shape=(nped, nped)).tocsr()
want = sp.linalg.spsolve_triangular(
    sp.csr_matrix(L.T), sp.linalg.spsolve_triangular(L, b_s, lower=True),
    lower=False)
check("sparse solve_lltx n=20k (refine=1)", x, want, 1e-4)
st.free()

# CG GBLUP on device: (G + I) x = y with mean-imputed centered Z
y = rng.standard_normal(INDIV)
sol = grm_cg_solve(gm, jnp.asarray(y, jnp.float32), lam=1.0, scale=True,
                   tol=1e-6, maxiter=500)
gmat = zc @ zc.T / (2 * (freq * (1 - freq)).sum())
check("grm_cg_solve", sol.x, np.linalg.solve(gmat + np.eye(INDIV), y), 1e-3)

# --- applications ---------------------------------------------------------------
y_sim, _ = simulate_phenotypes(g, h2=0.5, seed=11)
h2, info = estimate_h2_reml(gm, y_sim, max_iter=10, seed=0)
print(f"INFO reml h2-hat = {h2:.3f} (sim 0.5, converged={info['converged']})",
      flush=True)
ok.append(0.2 < h2 < 0.8)

print("=" * 60, flush=True)
print(("ALL PASS" if all(ok) else "FAILURES") + f"  ({sum(ok)}/{len(ok)})",
      flush=True)
raise SystemExit(0 if all(ok) else 1)
