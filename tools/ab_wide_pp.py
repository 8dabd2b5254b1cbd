"""A/B: wide-schedule split kernel, concat-then-two-dots vs per-plane dots.

Round-2 queued measurement (BENCHMARKS.md): the per-plane restructure won
219->193 us on the tall schedule and is expected to help the wide schedule
(ncol > 64) the same way.  Run from /root/repo:  python - < tools/ab_wide_pp.py

Protocol: interleaved 1-vs-N lax.scan differencing, median of pairs
(benchmark._timed_scan_b) — the only method that reports true device time
over the axon tunnel.
"""
import numpy as np
import jax.numpy as jnp

from miraculix_tpu.io import bed, codec
from miraculix_tpu.ops.dgemm import packed_matmul
from miraculix_tpu.benchmark import _timed_scan_b

SNPS, INDIV, ITERS = 262_144, 4_096, 32

g = bed.simulate_genotypes(INDIV, SNPS, seed=0)
zq = jnp.asarray(codec.pack_planar16(np.where(g == 3, 0, g), row_mult=256))
rng = np.random.default_rng(0)

for ncol in (128, 256):
    b = jnp.asarray(rng.standard_normal((SNPS, ncol)), jnp.float32)
    for pp in (False, True, False, True):          # repeat to expose drift
        per = _timed_scan_b(
            lambda zq, b, pp=pp: packed_matmul(zq, b, per_plane=pp),
            zq, b, ITERS)
        tops = INDIV * SNPS * ncol / per / 1e12
        print(f"ncol={ncol} per_plane={pp}: {per*1e6:9.1f} us/call "
              f"{tops:6.1f} T geno-col-ops/s  MXU~{tops*4/197:.2f}",
              flush=True)
