"""Wrapped-grid GRM tile sweep: raise arithmetic intensity (decode VPU work
per MXU op) with bigger symmetric tiles now the wrapped grid halves DMA.
Interleaved pairs vs the 512/512 default per the CLAUDE.md timing rule.
Run: python - < tools/ab_grm_wrap2.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from miraculix_tpu.benchmark import _timed_scan_zq
from miraculix_tpu.io import bed, codec
from miraculix_tpu.ops.grm import packed_crossprod

print("devices:", jax.devices(), flush=True)
ITERS = 8
SNPS, INDIV = 262_144, 4_096
g = bed.simulate_genotypes(INDIV, SNPS, seed=0)
zq = jnp.asarray(codec.pack_planar16(np.where(g == 3, 0, g), row_mult=512))

configs = [
    (1024, 128),
    (1024, 256),
    (1024, 512),
    (2048, 128),
    (512, 256),
    (512, 1024),
]


def run(ti, tkw):
    return _timed_scan_zq(
        lambda z: packed_crossprod(z, tile_i=ti, tile_j=ti, tile_kw=tkw),
        zq, iters=ITERS)


base_ti, base_tkw = 512, 512
for ti, tkw in configs:
    try:
        per_c = run(ti, tkw)          # candidate (compiles first)
        per_b = run(base_ti, base_tkw)  # interleaved baseline reading
        ops_c = 2.0 * INDIV * INDIV * SNPS / per_c
        ops_b = 2.0 * INDIV * INDIV * SNPS / per_b
        print(f"ti={ti} tkw={tkw}: {per_c*1e3:7.2f} ms {ops_c/1e12:5.0f} T "
              f"(base {per_b*1e3:7.2f} ms {ops_b/1e12:5.0f} T) "
              f"ratio {per_b/per_c:.3f}", flush=True)
    except Exception as e:
        print(f"ti={ti} tkw={tkw}: FAILED {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)
