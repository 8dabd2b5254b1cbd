"""A/B: 1M-SNP reference-panel GRM — single-call K-grid vs the 16-chunk
fori_loop (VERDICT r4 Next #5: 0.74 -> >=0.80 tri-MXU).

The chunked sweep pays a [21248, 21248] int32 HBM accumulator add per
chunk (16 x 1.8 GB of extra traffic) plus per-chunk generation; the
single-call form folds the whole K axis into the kernel grid's
accumulating dimension (out_ref stays in VMEM per tile).  Run from
/root/repo on the real TPU:  python tools/ab_grm_ref.py
"""
import functools
import statistics
import time

import jax
import jax.numpy as jnp

ROWS, KW = 21504, 65536          # 21504 = 512*42: no autopad copy
CHUNK = 4096
PEAK_INT8 = 394e12


def gen_full():
    """[ROWS, KW] packed words with every 2-bit field in {0,1,2},
    generated chunk-by-chunk into one buffer (a single random.bits of the
    full 5.6 GB would need ~22 GB of temporaries)."""
    @jax.jit
    def build(key):
        buf = jnp.zeros((ROWS, KW), jnp.int32)

        def body(i, carry):
            key, buf = carry
            key, sub = jax.random.split(key)
            r = jax.random.bits(sub, (ROWS, CHUNK), jnp.uint32).astype(
                jnp.int32)
            a = r & 0x55555555
            b = (r >> 1) & 0x55555555
            words = ((b & ~a) << 1) | (a & ~b)
            return key, jax.lax.dynamic_update_slice(buf, words,
                                                     (0, i * CHUNK))
        _, buf = jax.lax.fori_loop(0, KW // CHUNK, body, (key, buf))
        return buf
    return build(jax.random.PRNGKey(0))


def main():
    from miraculix_tpu.ops.grm import packed_crossprod

    zq = gen_full()
    zq.block_until_ready()
    print("panel generated", flush=True)

    def mk(nit):
        @jax.jit
        def many(zq):
            def body(z, _):
                out = packed_crossprod(z)
                s = (out[0, 0].astype(jnp.int32) >> 31).astype(jnp.uint32)
                z = z.at[0, 0].set(
                    (z[0, 0].astype(jnp.uint32) ^ s).astype(jnp.int32))
                return z, None
            zf, _ = jax.lax.scan(body, zq, None, length=nit)
            return jnp.float32(zf[0, 0] & 1)
        return many

    iters = 2
    f1, fn = mk(1), mk(iters + 1)
    float(f1(zq)); float(fn(zq))
    diffs = []
    for _ in range(5):
        t0 = time.time(); float(fn(zq)); tf = time.time() - t0
        t0 = time.time(); float(f1(zq)); tb = time.time() - t0
        diffs.append((tf - tb) / iters)
    per = statistics.median(diffs)
    tri_ops = float(ROWS) * ROWS * 16 * KW     # upper-triangle convention
    print(f"single-call: per={per:.3f} s tri-MXU={tri_ops / per / PEAK_INT8:.3f} "
          f"(spread {min(diffs):.3f}-{max(diffs):.3f}); "
          f"panel-rate {2 * tri_ops / per / 1e12:.0f} T-equiv", flush=True)


if __name__ == "__main__":
    main()
