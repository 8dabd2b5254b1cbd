"""GRM crossprod tile sweep on the v5e (push past 0.70 int8-triangle MXU).

Per-plane kernel VMEM per grid step is small (zi + zj word tiles + the
int32 out tile), so larger/asymmetric tiles may amortize decode further —
but Mosaic's 16 MB scoped-VMEM stack killed symmetric 1024 tiles before
(CLAUDE.md).  Interleaved 1-vs-N scan differencing per config.
Run: python - < tools/ab_grm_tiles.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from miraculix_tpu.benchmark import _timed_scan_zq
from miraculix_tpu.io import bed, codec
from miraculix_tpu.ops.grm import packed_crossprod

print("devices:", jax.devices(), flush=True)
SNPS, INDIV, ITERS = 262_144, 4_096, 8
g = bed.simulate_genotypes(INDIV, SNPS, seed=0)
zq = jnp.asarray(codec.pack_planar16(np.where(g == 3, 0, g), row_mult=256))
kw = zq.shape[1]

configs = [
    (512, 512, 512),    # current default
    (512, 512, 1024),
    (512, 512, 2048),
    (1024, 512, 256),
    (512, 1024, 256),
    (1024, 512, 512),
    (256, 512, 512),
    (512, 256, 512),
]
for ti, tj, tkw in configs:
    if kw % tkw or INDIV % ti or INDIV % tj:
        print(f"ti={ti} tj={tj} tkw={tkw}: skipped (divisibility)",
              flush=True)
        continue
    try:
        per = _timed_scan_zq(
            lambda z, ti=ti, tj=tj, tkw=tkw: packed_crossprod(
                z, tile_i=ti, tile_j=tj, tile_kw=tkw),
            zq, iters=ITERS)
        ops = 2.0 * INDIV * INDIV * SNPS / per
        print(f"ti={ti} tj={tj} tkw={tkw}: {per*1e3:8.2f} ms "
              f"{ops/1e12:6.0f} T-equiv  tri-MXU {ops/ (2*394.8e12):.3f}",
              flush=True)
    except Exception as e:  # Mosaic OOM etc.
        print(f"ti={ti} tj={tj} tkw={tkw}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
