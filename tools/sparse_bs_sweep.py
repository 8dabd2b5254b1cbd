"""Sparse-solver block-size sweep on the real chip (round-2 queued item).

The substitution's wall time trades scan length (n/bs sequential steps)
against per-step work (the [bs, bs] MXU matmul + the padded gather whose
width is the max per-block off-diagonal count, which GROWS with bs).
Measures init + LL^T solve per bs on the reference-shaped factor
(n = 1e6, ~10 nnz/row, ncol = 12).  Run: python - < tools/sparse_bs_sweep.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from miraculix_tpu.solve.sparse import (SparseTriangularSolver,
                                        simulate_pedigree_factor)

print("devices:", jax.devices(), flush=True)
N, NCOL = 1_000_000, 12
r, c, v = simulate_pedigree_factor(N, avg_offdiag=9, bandwidth=N // 16,
                                   seed=0)
rng = np.random.default_rng(0)
b = jnp.asarray(rng.standard_normal((N, NCOL)), jnp.float32)

for bs in (128, 256, 512, 1024):
    t0 = time.time()
    slv = SparseTriangularSolver(r, c, v, N, bs=bs, dtype=jnp.float32)
    init_s = time.time() - t0
    x = slv.solve_lltx(b)
    jax.block_until_ready(x)
    resid = float(jnp.linalg.norm(slv.matvec(slv.matvec(x, trans="t")) - b)
                  / jnp.linalg.norm(b))
    t0 = time.time()
    for _ in range(3):
        x = slv.solve_lltx(b)
    # force real execution: host transfer, not block_until_ready
    s = float(x[0, 0])
    per = (time.time() - t0) / 3
    print(f"bs={bs:5d}: init {init_s:6.1f} s  solve {per:6.2f} s/call  "
          f"rel-resid {resid:.2e}  (sink {s:.3g})", flush=True)
    slv.free()
