"""Single-step GBLUP (ssGBLUP): the H-matrix mixed-model equations that
combine pedigree and genomic information, solved matrix-free on TPU.

This is the evaluation MiXBLUP actually runs with the reference's two
engines — the sparse pedigree solves (src/cuda/solve_cuda.cu:281-882 via
modmiraculix_gpu.f90:80-157) and the packed-genotype GEMM
(src/bindings/Fortran/mod5codesapi.f90) — composed here into one
framework-native application.  Following Aguilar et al. (2010) /
Christensen & Lund (2010):

    H^-1 = A^-1 + [ 0   0                              ]
                  [ 0   tau * Gw^-1  -  omega * A22^-1 ]

with A^-1 the sparse pedigree inverse (Henderson's rules,
:mod:`miraculix_tpu.pedigree`), Gw = (1-blend) * G_VanRaden + blend * I
the blended genomic relationship of the genotyped subset, and A22 the
pedigree relationship among genotyped animals.  Nothing is densified:

- A^-1 v      : one COO segment-sum SpMV;
- Gw^-1 v2    : Jacobi-preconditioned CG whose matvec is two packed
                Pallas passes over the SNP panel (G never formed);
- A22^-1 v2   : the sparse-block identity A22^-1 = A22blk - A21blk *
                (A11blk)^-1 * A12blk on the BLOCKS OF A^-1 (all sparse),
                with the inner (A11)^-1 again a Jacobi CG;
- the MME     : one outer block CG over [beta; u].

The entire solve compiles to a single XLA program (nested
``lax.while_loop`` CGs inside the outer CG's matvec).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .geno import GenoMatrix
from .pedigree import SparseCOO, a_inverse, check_pedigree
from .solve.cg import cg, grm_diag, grm_matvec


def _normalized_cg(matvec, b, tol, maxiter, minv=None):
    """CG with a per-column normalized RHS so the ABSOLUTE tolerance of
    :func:`solve.cg.cg` behaves relatively — the inner solves of a nested
    operator must not change character with the outer iterate's scale."""
    norm = jnp.linalg.norm(b, axis=0, keepdims=True)
    safe = jnp.where(norm > 0, norm, 1.0)
    r = cg(matvec, b / safe, tol=tol, maxiter=maxiter, minv=minv)
    return r.x * safe


def _split_coo(rows, cols, vals, group, pos):
    """Split symmetric COO by the (group[row], group[col]) block."""
    gr, gc = group[rows], group[cols]
    out = {}
    for name, mr, mc in (("11", 0, 0), ("12", 0, 1), ("22", 1, 1)):
        m = (gr == mr) & (gc == mc)
        out[name] = (pos[rows[m]], pos[cols[m]], vals[m])
    return out


class SingleStepHInv:
    """Matrix-free H^-1 over all pedigree animals.

    ``geno_ids``: 1-based pedigree ids of the SNP panel's rows (so
    ``geno_ids[i]`` is the animal whose genotypes are row i of ``g``).
    ``blend`` is the identity fraction mixed into G (VanRaden 2008's
    0.95*G + 0.05*I default guards a singular G); ``tau``/``omega`` are
    the Aguilar scaling knobs (1, 1 = standard ssGBLUP).
    """

    def __init__(self, sire, dam, g: GenoMatrix, geno_ids, *,
                 blend: float = 0.05, tau: float = 1.0, omega: float = 1.0,
                 inner_tol: float = 1e-6, inner_maxiter: int = 1000,
                 f: Optional[np.ndarray] = None):
        n = check_pedigree(sire, dam)
        geno_ids = np.asarray(geno_ids, np.int64)
        if geno_ids.min() < 1 or geno_ids.max() > n:
            raise ValueError("geno_ids must be 1-based pedigree ids")
        if len(np.unique(geno_ids)) != len(geno_ids):
            raise ValueError("geno_ids must be unique")
        if g.indiv != len(geno_ids):
            raise ValueError(f"panel has {g.indiv} rows, geno_ids has "
                             f"{len(geno_ids)}")
        self.n, self.g = n, g
        self.tau, self.omega, self.blend = tau, omega, blend
        self.inner_tol, self.inner_maxiter = inner_tol, inner_maxiter

        rows, cols, vals = a_inverse(sire, dam, f=f)
        self.ainv = SparseCOO(rows, cols, vals, (n, n))

        # group: 0 = non-genotyped, 1 = genotyped; pos = index within group
        group = np.zeros(n, np.int64)
        group[geno_ids - 1] = 1
        pos = np.zeros(n, np.int64)
        pos[group == 0] = np.arange(n - len(geno_ids))
        # genotyped animals are positioned by PANEL ROW, so block vectors
        # align with the GenoMatrix without any further permutation
        pos[geno_ids - 1] = np.arange(len(geno_ids))
        n2 = len(geno_ids)
        n1 = n - n2
        self.n1, self.n2 = n1, n2
        blocks = _split_coo(rows, cols, vals, group, pos)
        self.a11 = SparseCOO(*blocks["11"], (n1, n1))
        self.a12 = SparseCOO(*blocks["12"], (n1, n2))
        self.a22 = SparseCOO(*blocks["22"], (n2, n2))
        self.geno_rows = jnp.asarray(geno_ids - 1, jnp.int32)

        sigma2 = float(g.sigma2)
        self._gw_diag = ((1.0 - blend) * grm_diag(g, center=True)
                         / sigma2 + blend)
        self._gw_minv = 1.0 / self._gw_diag
        a11d = self.a11.diag()
        self._a11_minv = jnp.where(a11d > 0, 1.0 / a11d, 1.0)
        self._sigma2 = sigma2

    # -- block operators (v2: [n2, k]) ------------------------------------
    def _gw(self, v2):
        gv = grm_matvec(self.g, v2, center=True, scale=False) / self._sigma2
        return (1.0 - self.blend) * gv + self.blend * v2

    def gw_inv(self, v2):
        """Gw^-1 v2 by Jacobi-preconditioned CG on the packed panel."""
        return _normalized_cg(self._gw, v2, self.inner_tol,
                              self.inner_maxiter, minv=self._gw_minv)

    def a22_inv(self, v2):
        """A22^-1 v2 from the blocks of the SPARSE A^-1:
        A22^-1 = A22blk - A21blk (A11blk)^-1 A12blk."""
        if self.n1 == 0:
            return self.a22.matvec(v2)
        t = self.a12.matvec(v2)                       # A12blk v2   [n1, k]
        w = _normalized_cg(self.a11.matvec, t, self.inner_tol,
                           self.inner_maxiter, minv=self._a11_minv)
        return self.a22.matvec(v2) - self.a12.matvec(w, trans="t")

    def matvec(self, v):
        """H^-1 v for v [n] or [n, k]."""
        squeeze = v.ndim == 1
        vv = v[:, None] if squeeze else v
        out = self.ainv.matvec(vv)
        v2 = vv[self.geno_rows]
        corr = self.tau * self.gw_inv(v2) - self.omega * self.a22_inv(v2)
        out = out.at[self.geno_rows].add(corr)
        return out[:, 0] if squeeze else out

    def diag_approx(self):
        """Positive diagonal surrogate for Jacobi preconditioning of the
        MME (diag(A^-1) plus the genotyped blocks' diagonal surrogates —
        not the exact diag(H^-1), which has no cheap closed form)."""
        d = self.ainv.diag()
        # diag(Gw^-1) ~ 1/diag(Gw); diag(A22^-1) ~ 1 (relationship diag
        # ~ 1+F): crude but only steers Jacobi convergence, not the answer
        corr = self.tau * self._gw_minv - self.omega
        d = d.at[self.geno_rows].add(jnp.maximum(corr, 0.0))
        return jnp.maximum(d, 1e-3)


class SSGBLUPResult(NamedTuple):
    beta: np.ndarray          # fixed effects [p]
    u: np.ndarray             # breeding values, ALL animals [n]
    iterations: int           # outer CG iterations
    residual_norm: float


def ssgblup(
    y: np.ndarray,
    hinv: SingleStepHInv,
    obs_ids: Optional[np.ndarray] = None,
    x: Optional[np.ndarray] = None,
    h2: float = 0.5,
    tol: float = 1e-5,
    maxiter: int = 2000,
) -> SSGBLUPResult:
    """Solve Henderson's MME for y = X beta + W u + e with u over ALL
    pedigree animals and var(u) = sigma_u^2 H:

        [ X'X   X'W            ] [beta]   [X'y]
        [ W'X   W'W + lam H^-1 ] [ u  ] = [W'y],   lam = (1-h2)/h2

    ``obs_ids``: 1-based animal of each phenotype record (defaults to
    1..n_obs); repeated records per animal are allowed.  ``x``: fixed
    design [n_obs, p] (default intercept).  One outer Jacobi block-CG;
    every H^-1 application is the nested operator above.
    """
    n = hinv.n
    y = np.asarray(y, np.float64).reshape(-1)
    n_obs = len(y)
    if obs_ids is None:
        obs_ids = np.arange(1, n_obs + 1)
    obs_ids = np.asarray(obs_ids, np.int64)
    if obs_ids.min() < 1 or obs_ids.max() > n:
        raise ValueError("obs_ids must be 1-based pedigree ids")
    if x is None:
        x = np.ones((n_obs, 1))
    x = np.asarray(x, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    p = x.shape[1]
    lam = (1.0 - h2) / h2

    obs = jnp.asarray(obs_ids - 1, jnp.int32)
    xj = jnp.asarray(x, jnp.float32)
    yj = jnp.asarray(y, jnp.float32)

    def w_apply(u):                     # W u: per-record animal effect
        return u[obs]

    def wt_apply(r):                    # W' r: sum records into animals
        return jax.ops.segment_sum(r, obs, num_segments=n)

    def mme(z):
        beta, u = z[:p], z[p:]
        fitted = xj @ beta + w_apply(u)
        top = xj.T @ fitted
        bottom = wt_apply(fitted) + lam * hinv.matvec(u)
        return jnp.concatenate([top, bottom])

    rhs = jnp.concatenate([xj.T @ yj, wt_apply(yj)])
    counts = jax.ops.segment_sum(jnp.ones_like(yj), obs, num_segments=n)
    dprec = jnp.concatenate([jnp.sum(xj * xj, axis=0),
                             counts + lam * hinv.diag_approx()])
    minv = 1.0 / dprec

    scale = float(jnp.linalg.norm(rhs))
    run = jax.jit(lambda b: cg(mme, b, tol=tol, maxiter=maxiter, minv=minv))
    res = run(rhs / scale)
    z = np.asarray(res.x, np.float64) * scale
    return SSGBLUPResult(z[:p], z[p:], int(res.iterations),
                         float(jnp.max(res.residual_norm)) * scale)


def run_ssgblup(bed_path: str, pedigree_path: str,
                pheno_path: Optional[str] = None, out: str = "ebv.tsv",
                h2: float = 0.5, blend: float = 0.05, tau: float = 1.0,
                omega: float = 1.0, tol: float = 1e-5,
                inner_tol: float = 1e-6, no_inbreeding: bool = False) -> int:
    """CLI entry: single-step evaluation from files.

    - ``bed_path``: PLINK fileset of the GENOTYPED animals; the .fam
      within-family id (column 2) must match the pedigree labels.
    - ``pedigree_path``: animal/sire/dam per line, arbitrary labels
      (:func:`pedigree.read_pedigree`); genotyped animals absent from the
      file are appended as founders (warned).
    - ``pheno_path``: two-column file (animal label, value) — phenotypes
      may cover ANY pedigree animal, genotyped or not.  Defaults to the
      .fam 6th column (genotyped animals only; -9 = missing).

    Writes a TSV of EBVs for every pedigree animal.
    """
    from .geno import from_bed
    from .pedigree import read_pedigree

    sire, dam, labels = read_pedigree(pedigree_path)
    g = from_bed(bed_path)
    with open(bed_path[:-4] + ".fam") as fh:
        fam = [ln.split() for ln in fh if ln.strip()]
    iids = [f[1] for f in fam]
    if len(iids) != g.indiv:
        raise SystemExit(f".fam has {len(iids)} animals, panel {g.indiv}")

    code = {lab: i + 1 for i, lab in enumerate(labels)}
    extra = [iid for iid in iids if iid not in code]
    if extra:
        print(f"warning: {len(extra)} genotyped animals missing from the "
              f"pedigree — appended as founders (e.g. {extra[:3]})")
        n0 = len(labels)
        labels = labels + extra
        sire = np.concatenate([sire, np.zeros(len(extra), np.int64)])
        dam = np.concatenate([dam, np.zeros(len(extra), np.int64)])
        code.update({lab: n0 + i + 1 for i, lab in enumerate(extra)})
    geno_ids = np.array([code[iid] for iid in iids], np.int64)

    if pheno_path:
        obs_l, y_l = [], []
        with open(pheno_path) as fh:
            for lineno, ln in enumerate(fh, 1):
                ln = ln.split("#", 1)[0].strip()
                if not ln:
                    continue
                a, v = ln.split()[:2]
                if a not in code:
                    raise SystemExit(f"{pheno_path}:{lineno}: animal {a!r} "
                                     "not in the pedigree")
                obs_l.append(code[a])
                y_l.append(float(v))
        obs_ids = np.array(obs_l, np.int64)
        y = np.array(y_l)
    else:
        y_all = np.array([f[5] for f in fam], np.float64)
        keep = y_all != -9
        if not keep.any():
            raise SystemExit("no phenotypes: .fam column 6 is all -9 and "
                             "no --pheno file given")
        obs_ids = geno_ids[keep]
        y = y_all[keep]
    print(f"{len(labels)} pedigree animals, {g.indiv} genotyped, "
          f"{len(y)} records")

    f = np.zeros(len(labels)) if no_inbreeding else None
    hinv = SingleStepHInv(sire, dam, g, geno_ids, blend=blend, tau=tau,
                          omega=omega, inner_tol=inner_tol, f=f)
    res = ssgblup(y, hinv, obs_ids=obs_ids, h2=h2, tol=tol)
    with open(out, "w") as fh:
        fh.write("animal\tebv\tgenotyped\n")
        gset = set(geno_ids.tolist())
        for i, lab in enumerate(labels):
            fh.write(f"{lab}\t{res.u[i]:.6g}\t{int(i + 1 in gset)}\n")
    print(f"wrote {out}: EBVs for {len(labels)} animals "
          f"(outer CG iterations: {res.iterations}, "
          f"residual {res.residual_norm:.2e})")
    print(f"fixed effects: {np.round(res.beta, 4)}")
    return 0
