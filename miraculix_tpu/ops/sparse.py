"""Sparse matrix x compressed genotype products (MiXBLUP single-step path).

Reference: ``sparse_times_plink`` (src/miraculix/5codesAPI.c:135-157) backed
by the register-blocked CSR kernel ``sparseTGeno`` (src/miraculix/
plinkUint.cc:352-479).  Semantics (tests/sparse_plink/test_sparse_plink.f90):
S is a CSR matrix [n_idx, indiv]; the op returns C [n_idx, snps] = S @ Z.

TPU-native strategy: the contraction S·Z runs over individuals, exactly the
axis our transposed packed buffer contracts — so C = (Zᵀ · Sᵀ)ᵀ is ONE call
of the packed Pallas matmul with the (densified) sparse transpose as the
dense RHS.  The MXU eats structured sparsity for free at these densities
(pedigree incidence matrices are a few nonzeros per row); a gather/
segment-sum path for extreme scale can come later.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geno import GenoMatrix
from .common import on_cpu
from .dgemm import packed_matmul


def csr_to_dense(
    row_ptr: np.ndarray,
    col_idx: np.ndarray,
    vals: np.ndarray,
    n_rows: int,
    n_cols: int,
    index_base: int = 1,
) -> np.ndarray:
    """CSR/Yale triplets -> dense [n_rows, n_cols] (1-based by default, as
    the reference's Fortran callers supply them)."""
    row_ptr = np.asarray(row_ptr, dtype=np.int64) - index_base
    col_idx = np.asarray(col_idx, dtype=np.int64) - index_base
    vals = np.asarray(vals, dtype=np.float64)
    if len(row_ptr) != n_rows + 1:
        raise ValueError(f"row_ptr must have {n_rows + 1} entries")
    dense = np.zeros((n_rows, n_cols), dtype=np.float64)
    rows = np.repeat(np.arange(n_rows), np.diff(row_ptr))
    np.add.at(dense, (rows, col_idx), vals)
    return dense


def sparse_times_geno(
    g: GenoMatrix,
    row_ptr: np.ndarray,
    col_idx: np.ndarray,
    vals: np.ndarray,
    n_idx: int,
    trans_sparse: str = "n",
    trans_geno: str = "n",
    index_base: int = 1,
    precision: str = "f32",
    interpret: Optional[bool] = None,
) -> jax.Array:
    """C = op(S) @ op(Z):

    - trans_geno='n': op(Z) = Z [indiv, snps], S maps individuals,
      C [n_idx, snps].
    - trans_geno='t': op(Z) = Zᵀ [snps, indiv], S maps SNPs,
      C [n_idx, indiv].
    - trans_sparse='t': S is stored transposed ([cols, n_idx] CSR) and used
      as Sᵀ.

    Matches ``sparse_times_plink(transS, transC, ...)``
    (5codesAPI.c:135-157); no centering (the reference path has none).
    ``precision`` defaults to "f32" (HIGHEST-precision matmul, ~1e-7
    relative) because the reference's sparseTGeno kernel accumulates in
    exact double (plinkUint.cc:352-479); "fast" (bf16-split) and "f64"
    (chunked float64 outer accumulation) are also accepted.
    """
    if interpret is None:
        interpret = on_cpu()
    tg = trans_geno.lower()
    ts = trans_sparse.lower()
    if tg == "n":
        contract, out_cols = g.indiv, g.snps
    else:
        contract, out_cols = g.snps, g.indiv

    if ts == "n":
        s = csr_to_dense(row_ptr, col_idx, vals, n_idx, contract, index_base)
        st = s.T  # [contract, n_idx]
    else:
        st = csr_to_dense(row_ptr, col_idx, vals, contract, n_idx, index_base)

    # Cᵀ = op(Z)ᵀ @ Sᵀ: the packed buffer whose ROWS are the product's
    # output axis and whose packed axis is `contract` is exactly the other
    # orientation — one packed matmul, then transpose.
    zq_other = g.zq_t if tg == "n" else g.zq_n
    stj = jnp.asarray(st, jnp.float32)
    if precision == "f64":
        from .dgemm import packed_matmul_f64

        out = packed_matmul_f64(zq_other, stj, interpret=interpret)
        return out[:out_cols].T
    # tall schedule wants the packing whose ROWS are the contraction axis
    # and whose DECODED COLUMNS are the output axis — the same-orientation
    # buffer (the opposite of the wide schedule's input)
    zq_same = g.zq_n if tg == "n" else g.zq_t
    if precision == "f32" and n_idx <= 128 and stj.shape[0] <= zq_same.shape[0]:
        from .dgemm import packed_matmul_tall

        out = packed_matmul_tall(zq_same, stj, mode="f32",
                                 interpret=interpret)
        return out[:out_cols].T
    out = packed_matmul(zq_other, stj, split=(precision == "fast"),
                        interpret=interpret)
    return out[:out_cols].T  # [n_idx, out_cols]
