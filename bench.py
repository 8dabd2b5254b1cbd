"""Benchmark: dgemm_compressed throughput on one TPU chip.

Metric: genotype-column-ops/s = snps * indiv * ncol / wall-second for the
centered dgemm_compressed ('n').  Baseline = the only quantitative number the
reference publishes: the 5codes CPU kernel at 150,000 SNPs x 150,000
individuals, repetV=32 columns, 10 cores, best row-chunk -> 5.1 s
(src/miraculix/5codesIntern.h:35-50) = 1.412e11 geno-col-ops/s.

Timing method (see .claude/skills/verify/SKILL.md): N iterations inside one
jit via lax.scan with a data dependence, host-transfer sync, and iters=1 vs
iters=N+1 differencing — the only method that reports true device time over
the axon tunnel.  Prints ONE JSON line.
"""
import functools
import json
import time

import numpy as np

BASELINE_GENO_COL_OPS = 150_000 * 150_000 * 32 / 5.1  # = 1.412e11

# Physical ceiling for THIS metric: the centered 'n' path is a 2-pass bf16
# hi/lo split, i.e. 4 MXU flops per geno-col-op, so at v5e's ~197 TFLOP/s
# bf16 peak the metric cannot exceed ~49.3 T.  A reading above this is
# measurement error by definition (VERDICT r4 Weak #1) and is flagged.
PEAK_BF16_FLOPS = 197e12
ROOFLINE_OPS = PEAK_BF16_FLOPS / 4.0

# Panel sized to be decode/bandwidth-bound but quick to build/transfer:
# 4096 indiv x 65536 snps packed = 67 MB, ncol=32 (the baseline's repetV).
INDIV, SNPS, NCOL = 4096, 65536, 32


def _probe_backend(timeout_s: float = 300.0) -> None:
    """Fail FAST (nonzero exit, clear stderr) when the TPU tunnel is down
    instead of hanging forever in backend init — observed 2026-08-17: the
    axon backend either raises UNAVAILABLE or blocks indefinitely."""
    import sys
    import threading

    err = []

    def probe():
        try:
            import jax
            jax.devices()
        except Exception as e:  # noqa: BLE001 - report any init failure
            err.append(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        print(f"bench: TPU backend init still hung after {timeout_s:.0f}s "
              "(tunnel outage?) — aborting", file=sys.stderr, flush=True)
        import os
        os._exit(3)
    if err:
        print(f"bench: TPU backend unavailable: {err[0]!r}", file=sys.stderr,
              flush=True)
        raise SystemExit(3)


def main() -> None:
    from miraculix_tpu.utils.compcache import enable_compilation_cache

    enable_compilation_cache()
    _probe_backend()
    import jax
    import jax.numpy as jnp

    from miraculix_tpu.io import bed, codec
    from miraculix_tpu.ops.dgemm import packed_matmul_tall

    g = bed.simulate_genotypes(INDIV, SNPS, seed=0)
    # ncol=32 < 64 -> the tall transposed schedule is the production path
    # dgemm() selects; it contracts over the rows of the transposed packing.
    gt = np.ascontiguousarray(np.where(g == 3, 0, g).T)
    zq_t = jnp.asarray(codec.pack_planar16(gt, row_mult=256))
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((SNPS, NCOL)), jnp.float32)
    fvec = jnp.asarray(codec.allele_freq(g).astype(np.float32))

    def step(zq_t, b, f):
        c = packed_matmul_tall(zq_t, b)
        return c - 2.0 * (f.astype(c.dtype) @ b.astype(c.dtype))[None, :]

    def make(iters):
        @jax.jit
        def many(zq_t, b, f):
            def body(bcur, _):
                out = step(zq_t, bcur, f)
                # scalar feed-forward: serializes iterations, costs nothing
                return bcur * (1 + out[0, 0] * 1e-30), None
            bfin, _ = jax.lax.scan(body, b, None, length=iters)
            return jnp.float32(bfin[0, 0])
        return functools.partial(many, zq_t, b, fvec)

    # 256 iterations so the differenced signal (~50-70 ms) dominates the
    # ~28 ms tunnel roundtrip (at the old 64 the signal RIVALLED one
    # roundtrip and the headline read above the physical roofline), and
    # INTERLEAVED base/full pairs so multi-second device-speed drift (shared
    # tunnel) cannot land between the two measurements of one difference.
    n_iters = 256
    f_base, f_full = make(1), make(n_iters + 1)
    float(f_base())  # compile both before any timing
    float(f_full())

    def once(fn):
        t0 = time.time()
        float(fn())  # host transfer = real sync over the tunnel
        return time.time() - t0

    # median of 9 pairwise differences: min is optimistically biased when
    # per-call noise rivals the differenced signal and has reported
    # >roofline throughput.  The QUARTILE SPREAD of the pairwise estimates
    # is published alongside the median (VERDICT r4 Weak #1: perf claims
    # need error bars).
    import statistics
    diffs = sorted((once(f_full) - once(f_base)) / n_iters
                   for _ in range(9))
    per = statistics.median(diffs)
    if per <= 0:
        per = min(once(f_full) for _ in range(3)) / (n_iters + 1)
        diffs = [per]

    ops = INDIV * SNPS * NCOL / per
    q1, q3 = diffs[len(diffs) // 4], diffs[(3 * len(diffs)) // 4]
    spread_pct = round(100.0 * (q3 - q1) / per, 1) if per > 0 else None
    result = {
        "metric": "dgemm_compressed geno-col-ops/s (centered 'n', "
                  f"{SNPS}x{INDIV} ncol={NCOL}, 1 chip)",
        "value": round(ops / 1e12, 3),
        "unit": "Tera-ops/s",
        "vs_baseline": round(ops / BASELINE_GENO_COL_OPS, 2),
        "spread": spread_pct,          # interquartile range, % of median
        "n_pairs": len(diffs),
        "roofline_frac": round(ops / ROOFLINE_OPS, 3),
    }
    if ops > ROOFLINE_OPS:
        # physically impossible reading -> the measurement, not the
        # kernel, is wrong; flag instead of publishing silently
        result["roofline_warning"] = True
    print(json.dumps(result))


if __name__ == "__main__":
    main()
