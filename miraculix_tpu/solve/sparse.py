"""Sparse triangular solves (the MiXBLUP single-step path).

The reference uploads a COO lower-triangular factor once
(``sparse2gpu``: cusparseCreateCoo + SpSM analysis,
src/cuda/solve_cuda.cu:281-882), then serves repeated
``dcsrtrsv_solve_gpu('n'/'t')`` calls; the Fortran layer composes the
two-triangle solve L(Lᵀx)=B with an optional row permutation
(src/bindings/Fortran/modmiraculix_gpu.f90:80-157).

A TPU has no sparse triangular-solve unit; the latency-bound dependency
chain of SpSM is hostile to wide SIMD anyway.  Our equivalent keeps the
same init-once/solve-many lifecycle but materializes the factor as a dense
blocked triangle once at init and serves solves with XLA's blocked
``triangular_solve`` on the MXU — for the equation sizes the reference
targets (pedigree/genotype factors up to ~7e4, tests/solve/test.jl:177-191)
the dense triangle fits comfortably in HBM and the solve is
bandwidth-optimal.  Panels beyond dense reach should use the CG path
(miraculix_tpu.solve.cg) — the reference makes the same trade
(examples/iterative_solver).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class SparseTriangularSolver:
    """Init-once / solve-many triangular solver (lifecycle of ``sparse2gpu``
    / ``dcsrtrsv_solve_gpu`` / ``free_sparse_gpu``, solve_cuda.h:54-74).

    Parameters mirror the reference: COO triplets (1-based indices by
    default, as the Fortran callers supply them), matrix size, and an
    optional row permutation applied as in ``c_solve_gpu_perm``
    (modmiraculix_gpu.f90:80-126).
    """

    def __init__(
        self,
        rows: np.ndarray,
        cols: np.ndarray,
        vals: np.ndarray,
        n: int,
        index_base: int = 1,
        lower: bool = True,
        dtype=jnp.float64,
    ):
        rows = np.asarray(rows, dtype=np.int64) - index_base
        cols = np.asarray(cols, dtype=np.int64) - index_base
        vals = np.asarray(vals)
        if rows.min() < 0 or rows.max() >= n or cols.min() < 0 or cols.max() >= n:
            raise ValueError("COO indices out of range")
        dense = np.zeros((n, n), dtype=np.float64)
        dense[rows, cols] = vals
        tri = np.tril(dense) if lower else np.triu(dense)
        if not np.array_equal(tri, dense):
            raise ValueError(
                f"matrix has entries outside the {'lower' if lower else 'upper'} triangle"
            )
        if (np.abs(np.diag(dense)) == 0).any():
            raise ValueError("triangular factor has zero diagonal")
        self.n = n
        self.lower = lower
        self.l = jnp.asarray(dense, dtype=dtype)

    def solve(self, b: jax.Array, trans: str = "n") -> jax.Array:
        """Solve L x = b ('n') or Lᵀ x = b ('t')."""
        trans = trans.lower()
        squeeze = b.ndim == 1
        if squeeze:
            b = b[:, None]
        b = b.astype(self.l.dtype)
        if trans == "n":
            x = jax.scipy.linalg.solve_triangular(self.l, b, lower=self.lower)
        elif trans == "t":
            x = jax.scipy.linalg.solve_triangular(
                self.l, b, lower=self.lower, trans=1
            )
        else:
            raise ValueError(f"trans must be 'n' or 't', got {trans!r}")
        return x[:, 0] if squeeze else x

    def solve_lltx(
        self, b: jax.Array, perm: Optional[np.ndarray] = None,
        index_base: int = 1,
    ) -> jax.Array:
        """Full normal-equation solve L Lᵀ x = b with optional symmetric row
        permutation, matching ``c_solve_gpu_perm``/``_noperm``
        (modmiraculix_gpu.f90:80-157)."""
        squeeze = b.ndim == 1
        if squeeze:
            b = b[:, None]
        if perm is not None:
            p = jnp.asarray(np.asarray(perm, dtype=np.int64) - index_base)
            b = b[p]
        y = self.solve(b, trans="n")
        x = self.solve(y, trans="t")
        if perm is not None:
            x = jnp.zeros_like(x).at[p].set(x)
        return x[:, 0] if squeeze else x

    def free(self) -> None:
        """Release device memory (``free_sparse_gpu`` parity)."""
        self.l = None
