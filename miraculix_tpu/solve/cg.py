"""Conjugate-gradient solvers, fully on-device.

The reference's GBLUP iterative path (examples/iterative_solver/
grm_solve_cg.jl:109-134) runs CG in host Julia, crossing host<->device twice
per iteration — an overhead its own authors flag ("A further boost ... if
the whole PCG is transferred to the GPU", src/cuda/dgemm_compressed_cuda.cu:
251-253).  Here the entire loop is a jitted ``lax.while_loop``: the operator
G·v = Z_c (Z_cᵀ v) is two packed Pallas matmuls, the dot products are XLA
reductions (and become psum collectives under shard_map in
miraculix_tpu.parallel), and nothing leaves the chip until convergence.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..geno import GenoMatrix
from ..ops.dgemm import dgemm


class CGResult(NamedTuple):
    x: jax.Array          # solution [n, k]
    iterations: jax.Array  # scalar int32
    residual_norm: jax.Array  # [k] final residual 2-norms


def cg(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    tol: float = 1e-2,
    maxiter: int = 1000,
) -> CGResult:
    """Block conjugate gradient for SPD operators; each RHS column iterates
    with its own alpha/beta (mathematically identical to k independent CG
    runs, reference grm_solve_cg.jl:109-134, but batched on the MXU).

    ``b`` may be [n] or [n, k]. Stops when every column's residual norm is
    below ``tol`` or after ``maxiter`` iterations.
    """
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    x = jnp.zeros_like(b) if x0 is None else (x0[:, None] if squeeze else x0)

    r = b - matvec(x)
    p = r
    rs = jnp.sum(r * r, axis=0)  # [k]

    def cond(state):
        _, _, _, rs, it = state
        return jnp.logical_and(it < maxiter,
                               jnp.any(jnp.sqrt(rs) > tol))

    def body(state):
        x, r, p, rs, it = state
        ap = matvec(p)
        denom = jnp.sum(p * ap, axis=0)
        alpha = jnp.where(denom > 0, rs / denom, 0.0)
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * ap
        rs_new = jnp.sum(r * r, axis=0)
        beta = jnp.where(rs > 0, rs_new / rs, 0.0)
        p = r + beta[None, :] * p
        return x, r, p, rs_new, it + 1

    x, r, p, rs, it = jax.lax.while_loop(
        cond, body, (x, r, p, rs, jnp.int32(0))
    )
    x_out = x[:, 0] if squeeze else x
    return CGResult(x_out, it, jnp.sqrt(rs))


def grm_matvec(
    g: GenoMatrix,
    v: jax.Array,
    center: bool = True,
    scale: bool = False,
    precision: str = "fast",
) -> jax.Array:
    """G·v with G the (optionally VanRaden-scaled) relationship matrix,
    WITHOUT materializing G: two dgemm passes over the packed genotypes
    (the reference's GRM_vec, grm_solve_cg.jl:74-84)."""
    zv = dgemm(g, v, trans="t", center=center, precision=precision)
    gv = dgemm(g, zv, trans="n", center=center, precision=precision)
    if scale:
        gv = gv / g.sigma2.astype(gv.dtype)
    return gv


@functools.partial(
    jax.jit,
    static_argnames=("center", "scale", "tol", "maxiter", "lam", "precision"),
)
def grm_cg_solve(
    g: GenoMatrix,
    b: jax.Array,
    lam: float = 0.0,
    center: bool = True,
    scale: bool = False,
    tol: float = 1e-2,
    maxiter: int = 1000,
    precision: str = "fast",
) -> CGResult:
    """Solve (G + lam·I) x = b on-device, G = Z_c Z_cᵀ (optionally /sigma^2).

    The GBLUP work-horse: with lam = sigma_e^2/sigma_u^2 this is the mixed-
    model equation solve of examples/gblup/calculate_gblup.jl:163-185.
    """
    def op(v):
        gv = grm_matvec(g, v, center=center, scale=scale, precision=precision)
        if lam:
            gv = gv + lam * v
        return gv

    return cg(op, b, tol=tol, maxiter=maxiter)
