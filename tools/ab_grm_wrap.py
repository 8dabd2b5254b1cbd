"""A/B: wrapped-pair triangle grid vs masked rectangular grid (GRM crossprod).

The wrapped grid (ops.grm._crossprod_wrap_kernel) enumerates only real
upper-triangle blocks — the masked grid fetched every sub-diagonal tile and
idled on it (VERDICT r3 Weak #1).  Alternating paired readings per the
CLAUDE.md timing rule: configs decided only on interleaved pairs.
Run: python - < tools/ab_grm_wrap.py   (from /root/repo, axon backend)
"""
import numpy as np
import jax
import jax.numpy as jnp

from miraculix_tpu.benchmark import _timed_scan_zq
from miraculix_tpu.io import bed, codec
from miraculix_tpu.ops.grm import packed_crossprod

print("devices:", jax.devices(), flush=True)
ITERS = 8
for snps, indiv in [(65_536, 4_096), (262_144, 4_096), (65_536, 16_384)]:
    g = bed.simulate_genotypes(indiv, snps, seed=0)
    zq = jnp.asarray(codec.pack_planar16(np.where(g == 3, 0, g),
                                         row_mult=512))
    for pairno in range(3):
        row = []
        for wrap in (True, False):
            per = _timed_scan_zq(
                lambda z, w=wrap: packed_crossprod(z, wrap=w), zq,
                iters=ITERS)
            ops = 2.0 * indiv * indiv * snps / per
            row.append((wrap, per, ops))
        for wrap, per, ops in row:
            print(f"{snps}x{indiv} wrap={int(wrap)} pair{pairno}: "
                  f"{per*1e3:8.2f} ms {ops/1e12:6.0f} T-equiv "
                  f"tri-MXU {ops / (2 * 394.8e12):.3f}", flush=True)
    del zq, g
