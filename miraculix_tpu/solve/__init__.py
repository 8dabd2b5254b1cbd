"""Equation-system solvers: on-device CG (GBLUP), dense Cholesky/logdet,
relationship-matrix solve, sparse triangular solves."""
from .cg import CGResult, cg, grm_cg_solve, grm_matvec
from .dense import (DenseSolveResult, RelMatResult, chol2inv, dense_solve,
                    solve_relmat, sqrt_posdef, x_cinv_y_logdet)
from .sparse import SparseTriangularSolver

__all__ = [
    "CGResult",
    "DenseSolveResult",
    "RelMatResult",
    "SparseTriangularSolver",
    "cg",
    "chol2inv",
    "dense_solve",
    "grm_cg_solve",
    "grm_matvec",
    "solve_relmat",
    "sqrt_posdef",
    "x_cinv_y_logdet",
]
