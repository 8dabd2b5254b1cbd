"""Dense float64 oracle implementations (numpy).

Test-time ground truth, playing the role of the reference's OneByte coding
comparisons (src/miraculix/main.cc:583-760) and the dense-BLAS oracles in its
Julia tests (tests/dgemm_compressed/test.jl:96-105,
tests/crossproduct/test_grm.jl:114-142).
"""
from __future__ import annotations

import numpy as np


def _clean(geno: np.ndarray) -> np.ndarray:
    g = np.asarray(geno, dtype=np.float64)
    return np.where(g == 3, 0.0, g)  # missing -> 0 (ignore_missings path)


def dgemm_oracle(
    geno: np.ndarray,
    b: np.ndarray,
    freq: np.ndarray,
    trans: str = "n",
    center: bool = True,
    normalize: bool = False,
    respect_missings: bool = False,
) -> np.ndarray:
    """C = (Z - 2·1fᵀ) @ B  /  its transpose; Z = geno [indiv, snps]."""
    z = _clean(geno)
    f = np.asarray(freq, dtype=np.float64)
    if center:
        zc = z - 2.0 * f[None, :]
        if respect_missings:
            zc = np.where(np.asarray(geno) == 3, 0.0, zc)
    else:
        zc = z
    c = zc @ b if trans.lower() == "n" else zc.T @ b
    if normalize:
        c = c / (2.0 * np.sum(f * (1.0 - f)))
    return c


def crossprod_oracle(geno: np.ndarray, snpmajor_output: bool = False) -> np.ndarray:
    z = _clean(geno)
    return (z.T @ z) if snpmajor_output else (z @ z.T)


def grm_oracle(geno: np.ndarray, freq: np.ndarray, scale: bool = True) -> np.ndarray:
    """Centered GRM directly from the definition G = P Z Zᵀ Pᵀ / 2Σp(1-p)
    with P = I - 11ᵀ/n (docs/grm.md:1-10)."""
    z = _clean(geno)
    n = z.shape[0]
    zc = z - z.mean(axis=0, keepdims=True)
    gmat = zc @ zc.T
    if scale:
        f = np.asarray(freq, dtype=np.float64)
        gmat = gmat / (2.0 * np.sum(f * (1.0 - f)))
    return gmat


def ld_oracle(geno: np.ndarray, freq: np.ndarray) -> np.ndarray:
    z = _clean(geno)
    n = z.shape[0]
    f = np.asarray(freq, dtype=np.float64)
    m = z.T @ z - 4.0 * n * np.outer(f, f)
    sigma = np.sqrt(np.diag(m))
    return m / sigma[:, None] / sigma[None, :]
