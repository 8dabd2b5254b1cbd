"""A/B: tall-schedule dgemm tile_s sweep + plane-pairing variants on the
large-K panels (VERDICT r4 Next #4: many_snps 0.61 / medium 0.69 -> >=0.75).

Protocol: interleaved base/full scan pairs, median of >=5 (CLAUDE.md timing
invariant).  Run from /root/repo on the real TPU:

    python tools/ab_tall_dgemm.py [panel ...]
"""
import functools
import statistics
import sys
import time

import numpy as np

PANELS = {
    "small": (65536, 4096),
    "medium": (262144, 4096),
    "many_snps": (1048576, 2048),
}
NCOL = 32
PEAK = 197e12


def main():
    import jax
    import jax.numpy as jnp

    from miraculix_tpu.io import bed, codec
    from miraculix_tpu.ops.dgemm import packed_matmul_tall

    names = sys.argv[1:] or ["medium", "many_snps"]
    rng = np.random.default_rng(0)
    for name in names:
        snps, indiv = PANELS[name]
        g = bed.simulate_genotypes(indiv, snps, seed=0)
        gt = np.ascontiguousarray(np.where(g == 3, 0, g).T)
        zq_t = jnp.asarray(codec.pack_planar16(gt, row_mult=256))
        b = jnp.asarray(rng.standard_normal((snps, NCOL)), jnp.float32)

        def make(iters, tile_s, pp):
            @jax.jit
            def many(zq_t, b):
                def body(bcur, _):
                    out = packed_matmul_tall(zq_t, bcur, tile_s=tile_s,
                                             pair_planes=pp)
                    return bcur * (1 + out[0, 0] * 1e-30), None
                bfin, _ = jax.lax.scan(body, b, None, length=iters)
                return jnp.float32(bfin[0, 0])
            return functools.partial(many, zq_t, b)

        iters = 64 if name != "many_snps" else 32
        for tile_s in (4096, 8192, 16384):
            if zq_t.shape[0] % tile_s:
                continue
            for pp in (False, True):
                f1, fn = make(1, tile_s, pp), make(iters + 1, tile_s, pp)
                float(f1()), float(fn())
                diffs = []
                for _ in range(5):
                    t0 = time.time(); float(fn()); tf = time.time() - t0
                    t0 = time.time(); float(f1()); tb = time.time() - t0
                    diffs.append((tf - tb) / iters)
                per = statistics.median(diffs)
                mxu = 4.0 * indiv * snps * NCOL / per / PEAK
                print(f"{name} tile_s={tile_s} pair={int(pp)}: "
                      f"per={per*1e3:.3f} ms mxu={mxu:.3f} "
                      f"(spread {min(diffs)*1e3:.3f}-"
                      f"{max(diffs)*1e3:.3f})", flush=True)


if __name__ == "__main__":
    main()
