"""GBLUP pipeline: GRM -> randomized PCA -> BLUE/BLUP estimation.

Reference: examples/gblup/calculate_gblup.jl — read panel, GRM, randomized
eigendecomposition (Halko) for population-structure covariates, then

    beta_hat = (Xᵀ (G + lam I)⁻¹ X)⁻¹ Xᵀ (G + lam I)⁻¹ y      (BLUE)
    u        = (G + lam I)⁻¹ (y - X beta_hat)
    g_hat    = G u                                             (BLUP)

with lam = sigma_e^2 / sigma_u^2 = (1 - h2) / h2.  Everything runs on
device; ``solver='cg'`` never materializes G (the operator is two packed
matmuls per product), which is the production path for 100K+ individuals.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .geno import GenoMatrix, from_bed
from .ops.grm import grm
from .solve.cg import grm_cg_solve, grm_matvec
from .solve.dense import dense_solve


def randomized_grm_pca(
    g: GenoMatrix,
    k: int = 10,
    oversample: int = 8,
    power_iters: int = 2,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k eigenpairs of the (unscaled, centered) GRM via the Halko
    randomized range finder, G applied implicitly as Z_c(Z_cᵀ ·) — the
    reference's randomized_snp_pca (calculate_gblup.jl:152-158) without
    ever forming G.

    Returns (eigenvalues [k], eigenvectors [indiv, k]).
    """
    n = g.indiv
    rng = np.random.default_rng(seed)
    omega = jnp.asarray(rng.standard_normal((n, k + oversample)), jnp.float32)
    y = grm_matvec(g, omega)
    for _ in range(power_iters):
        q, _ = jnp.linalg.qr(y)
        y = grm_matvec(g, q)
    q, _ = jnp.linalg.qr(y)
    t = q.T @ grm_matvec(g, q)
    t = 0.5 * (t + t.T)
    w, v = jnp.linalg.eigh(t)
    idx = jnp.argsort(w)[::-1][:k]
    return np.asarray(w[idx]), np.asarray(q @ v[:, idx])


@dataclasses.dataclass
class GBLUPResult:
    beta: np.ndarray        # fixed effects (intercept + PCs)
    g_hat: np.ndarray       # genomic values (BLUP)
    fitted: np.ndarray      # X beta + g_hat
    pcs: Optional[np.ndarray]
    cg_iterations: int = 0


def gblup(
    g: GenoMatrix,
    y: np.ndarray,
    h2: float = 0.5,
    n_pcs: int = 10,
    solver: str = "cg",
    tol: float = 1e-4,
    maxiter: int = 2000,
    seed: int = 0,
) -> GBLUPResult:
    """Full GBLUP estimation (calculate_gblup.jl:163-199 semantics).

    The mixed-model scale: G is VanRaden-scaled (sigma^2 normalized), so
    lam = (1 - h2)/h2 directly.
    """
    n = g.indiv
    lam = (1.0 - h2) / h2
    y = np.asarray(y, dtype=np.float64).reshape(n)

    pcs = None
    if n_pcs > 0:
        _, pcs = randomized_grm_pca(g, k=n_pcs, seed=seed)
        x = np.concatenate([np.ones((n, 1)), pcs], axis=1)
    else:
        x = np.ones((n, 1))
    p = x.shape[1]

    rhs = jnp.asarray(np.concatenate([x, y[:, None]], axis=1), jnp.float32)
    sigma2 = float(g.sigma2)

    if solver == "cg":
        # scaled-G operator: (G/sigma2 + lam I) b = rhs, one block solve
        res = grm_cg_solve(g, rhs, lam=lam * sigma2, scale=False,
                           tol=tol, maxiter=maxiter)
        b = np.asarray(res.x, np.float64) * sigma2  # un-scale: see below
        iters = int(res.iterations)
        # grm_cg_solve solved (Zc Zcᵀ + lam*sigma2 I) b' = rhs, i.e.
        # sigma2 (G_scaled + lam I) b' = rhs  =>  b = sigma2 * b'
    else:
        gmat = grm(g, scale=True, dtype=jnp.float32)
        gmat = gmat + lam * jnp.eye(n, dtype=gmat.dtype)
        b = np.asarray(dense_solve(gmat, rhs).x, np.float64)
        iters = 0

    bx, by = b[:, :p], b[:, p]
    xtbx = x.T @ bx
    xtby = x.T @ by
    beta = np.linalg.solve(xtbx, xtby)

    if solver == "cg":
        res_u = grm_cg_solve(
            g, jnp.asarray((y - x @ beta)[:, None], jnp.float32),
            lam=lam * sigma2, scale=False, tol=tol, maxiter=maxiter)
        u = np.asarray(res_u.x, np.float64)[:, 0] * sigma2
        iters += int(res_u.iterations)
        g_hat = np.asarray(
            grm_matvec(g, jnp.asarray(u[:, None], jnp.float32)),
            np.float64)[:, 0] / sigma2
    else:
        u = np.asarray(dense_solve(
            gmat, jnp.asarray((y - x @ beta)[:, None], jnp.float32)).x,
            np.float64)[:, 0]
        g_hat = np.asarray((gmat - lam * jnp.eye(n)) @ u, np.float64)

    fitted = x @ beta + g_hat
    return GBLUPResult(beta=beta, g_hat=g_hat, fitted=fitted, pcs=pcs,
                       cg_iterations=iters)


def simulate_phenotypes(
    geno: np.ndarray,
    h2: float = 0.5,
    n_qtl: int = 100,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Additive phenotype simulation (the role of MoBPS in the reference's
    example): random QTL effects + environmental noise scaled to h2.
    Returns (phenotypes, true breeding values)."""
    rng = np.random.default_rng(seed)
    n, s = geno.shape
    qtl = rng.choice(s, size=min(n_qtl, s), replace=False)
    eff = rng.standard_normal(len(qtl))
    z = np.where(geno == 3, 0, geno).astype(np.float64)
    bv = (z[:, qtl] - z[:, qtl].mean(0)) @ eff
    bv /= bv.std() + 1e-12
    e = rng.standard_normal(n) * np.sqrt((1 - h2) / h2)
    return bv + e, bv


def run_gblup(bed_path: str, h2: float = 0.5, pcs: int = 10,
              solver: str = "cg") -> int:
    """CLI entry: full pipeline on a .bed fileset; phenotypes from the .fam
    6th column when present, else simulated with known breeding values."""
    from .io import bed as bedio

    g = from_bed(bed_path)
    geno, _ = bedio.read_bed_genotypes(bed_path)
    fam = open(bed_path[:-4] + ".fam").read().split()
    pheno_col = np.array(fam[5::6], dtype=object)
    bv_true = None
    try:
        y = pheno_col.astype(np.float64)
        if np.all(y == -9):
            raise ValueError
    except ValueError:
        y, bv_true = simulate_phenotypes(geno, h2=h2)
        print("(.fam has no phenotypes — simulated with known BVs)")

    res = gblup(g, y, h2=h2, n_pcs=pcs, solver=solver)
    print(f"beta: {np.round(res.beta[:3], 4)}... "
          f"(CG iterations: {res.cg_iterations})")
    if bv_true is not None:
        cor = np.corrcoef(res.g_hat, bv_true)[0, 1]
        print(f"cor(estimated BV, true BV) = {cor:.3f}")
    cor_fit = np.corrcoef(res.fitted, y)[0, 1]
    print(f"cor(fitted, phenotype)     = {cor_fit:.3f}")
    return 0
