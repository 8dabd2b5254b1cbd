"""MiXBLUP-style sparse triangular solve: init once, solve many.

The reference serves this path through sparse2gpu / dcsrtrsv_solve_gpu /
free_sparse_gpu (src/cuda/solve_cuda.cu:281-882) with the Fortran layer
composing L(L^T x) = B plus a row permutation
(src/bindings/Fortran/modmiraculix_gpu.f90:80-157).  Here the factor is a
simulated pedigree-shaped lower triangle; the solver is the blocked O(nnz)
substitution (miraculix_tpu.solve.sparse).

Run from the repo root:  python examples/mixblup_sparse_solve.py [n]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

import numpy as np

from miraculix_tpu.solve.sparse import (SparseTriangularSolver,
                                        simulate_pedigree_factor)


def main(n: int = 200_000, ncol: int = 12) -> None:
    print(f"simulating pedigree factor: n={n}, ~10 nnz/row")
    r, c, v = simulate_pedigree_factor(n, avg_offdiag=9,
                                       bandwidth=max(n // 16, 1), seed=0)
    t0 = time.time()
    slv = SparseTriangularSolver(r, c, v, n)   # init-once analysis
    print(f"analysis: {time.time() - t0:.1f} s "
          f"(nnz={slv.nnz}, {slv.nb} blocks of {slv.bs})")

    rng = np.random.default_rng(0)
    b = rng.standard_normal((n, ncol)).astype(np.float32)

    # solve-many lifecycle: repeated L L^T x = b on the same handle
    for rep in range(3):
        t0 = time.time()
        x = slv.solve_lltx(b, refine=1)
        resid = float(np.linalg.norm(
            np.asarray(slv.matvec(slv.matvec(x, trans="t"))) - b)
            / np.linalg.norm(b))
        print(f"solve {rep + 1}: {time.time() - t0:.2f} s  "
              f"rel resid {resid:.2e}")

    # permuted variant (c_solve_gpu_perm semantics)
    perm = rng.permutation(n) + 1
    x_p = slv.solve_lltx(b[:, 0], perm=perm)
    print(f"permuted solve ok: |x_p| = {float(np.abs(x_p).max()):.3f}")
    slv.free()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200_000)
