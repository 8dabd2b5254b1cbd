"""Sparse-solver block-size A/B on the real chip, drift-protected.

The substitution's wall time trades scan length (n/bs sequential steps)
against per-step work (the [bs, bs] MXU matmul + the padded gather whose
width is the max per-block off-diagonal count, which GROWS with bs).

Protocol: both solvers are built and compiled FIRST, then timed in
INTERLEAVED pairs (512, 256, 512, 256, ...) with a host-transfer sink per
measurement; report per-pair differences and their median — device speed
over the shared tunnel drifts on multi-second scales, so only paired
differences are trustworthy (CLAUDE.md timing invariant; the per-solve
signal here is ~1 s, far above the ~28 ms tunnel roundtrip, so wall deltas
of paired 3-solve runs are adequate where sub-ms kernels need the
scan-differencing machinery).  Run: python - < tools/sparse_bs_sweep.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from miraculix_tpu.solve.sparse import (SparseTriangularSolver,
                                        simulate_pedigree_factor)

print("devices:", jax.devices(), flush=True)
N, NCOL, PAIRS, REPS = 1_000_000, 12, 5, 3
r, c, v = simulate_pedigree_factor(N, avg_offdiag=9, bandwidth=N // 16,
                                   seed=0)
rng = np.random.default_rng(0)
b = jnp.asarray(rng.standard_normal((N, NCOL)), jnp.float32)

solvers = {}
for bs in (512, 256):
    t0 = time.time()
    solvers[bs] = SparseTriangularSolver(r, c, v, N, bs=bs,
                                         dtype=jnp.float32)
    jax.block_until_ready(solvers[bs]._dinv)
    init_s = time.time() - t0
    t0 = time.time()
    x = solvers[bs].solve_lltx(b)
    sink = float(x[0, 0])
    print(f"bs={bs}: init {init_s:.1f} s, first solve+compile "
          f"{time.time() - t0:.1f} s (sink {sink:.3g})", flush=True)


def timed(bs):
    t0 = time.time()
    for _ in range(REPS):
        x = solvers[bs].solve_lltx(b)
    float(x[0, 0])
    return (time.time() - t0) / REPS

diffs, t512s, t256s = [], [], []
for k in range(PAIRS):
    t512 = timed(512)
    t256 = timed(256)
    diffs.append(t256 - t512)
    t512s.append(t512)
    t256s.append(t256)
    print(f"pair {k}: bs512 {t512:.3f} s  bs256 {t256:.3f} s  "
          f"diff {t256 - t512:+.3f} s", flush=True)

print(f"median bs512 {np.median(t512s):.3f} s, bs256 "
      f"{np.median(t256s):.3f} s, median pair diff "
      f"{np.median(diffs):+.3f} s ({'512 wins' if np.median(diffs) > 0 else '256 wins'})",
      flush=True)
