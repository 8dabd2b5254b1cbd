"""SNP-matrix crossproducts: M = Z Zᵀ (GRM) / M = Zᵀ Z (LD), on the MXU.

TPU-native replacement for the reference's popcount SIMD kernels
(src/miraculix/2bitIntern.h:31-160) and the 4-bit tensor-core CUTLASS path
with its custom mma.sync PTX microkernel (src/cuda/snp_multiply_cuda.h:124-197,
.cu:38-382).  Here: decode planar16 tiles in-register to int8 and run
int8 x int8 -> int32 MXU dots — the exact TPU analogue of the reference's
u4xu4->s32 tensor-core path, at 2x the bf16 MXU rate (measured 518 vs 307
Tops/s-equiv on v5e at 4096x131072).  Every product term is <= 4, so the
int32 accumulator is EXACT while 4*snps < 2^31, i.e. up to ~536M SNPs
(the reference's int32 range discussion, docs/grm.md:12).

Finishing steps (all O(m^2), done in XLA):
- GRM (VanRaden, via the Schlather decomposition docs/grm.md:5-10 and
  src/bindings/Julia/crossproduct.jl:83-110):
      M -= (m·1ᵀ + 1·mᵀ)/n;  M += (Σm)/n²;  M /= 2 Σ p(1-p)
  with m = M·1 the column sums of the raw integer crossproduct.
- LD correlation r (crossproduct.jl:128-152; NB the reference's docstring
  claims R² but its computation — and its own test against `plink --r
  square`, tests/crossproduct/test_ld.jl — produce the signed r):
      M -= 4n·ffᵀ;  M /= σσᵀ with σ = sqrt(diag(M)).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geno import GenoMatrix
from .common import call32, on_cpu, pick_tile

# swept on v5e at 4096..16384 indiv x 65536..131072 snps: symmetric
# 512x512 triangle tiles win (551-556 Tops/s-equiv).  Asymmetric tiles
# (tile_i != tile_j) are supported — a wide j-tile amortizes the i-tile
# decode — but measured slower end to end: fewer streamed rows per
# stationary MXU load outweigh the decode savings, and the wide tile
# fattens the diagonal band the triangle skip cannot drop.
DEFAULT_TILE_M = 512
DEFAULT_TILE_KW = 512
DEFAULT_TILE_I = 512
DEFAULT_TILE_J = 512


def _plane_prod_int8(zi, zj):
    """Σ_m decode_plane_m(zi) @ decode_plane_m(zj)ᵀ as 16 PER-PLANE int8
    MXU dots: planes are disjoint K-slices of the contraction, so the sum
    is exactly the one-dot result — but issuing them separately lets
    Mosaic overlap plane m+1's VPU decode with plane m's matmul (the
    concat form serialized decode and MXU; same restructure as the dgemm
    tall kernel, measured there 219→193 us)."""
    from .common import _SHIFTS

    acc = None
    for m in range(16):
        di = ((zi >> _SHIFTS[m]) & 3).astype(jnp.int8)
        dj = ((zj >> _SHIFTS[m]) & 3).astype(jnp.int8)
        p = jax.lax.dot_general(
            di, dj,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = p if acc is None else acc + p
    return acc


def _crossprod_kernel(zi_ref, zj_ref, out_ref):
    """acc[i, j] += decode(zq[i-tile]) @ decode(zq[j-tile])ᵀ  (int8 MXU)."""
    k = pl.program_id(2)
    prod = _plane_prod_int8(zi_ref[...], zj_ref[...])

    @pl.when(k == 0)
    def _init():
        out_ref[...] = prod

    @pl.when(k != 0)
    def _acc():
        out_ref[...] = out_ref[...] + prod


def _crossprod_tri_kernel(zi_ref, zj_ref, out_ref, *, ti, tj):
    """Upper-triangle-only variant for ASYMMETRIC ti/tj tiles: blocks
    entirely below the diagonal skip the MXU work (the reference computes
    only the upper triangle too and mirrors on the host,
    snp_multiply_cuda.cu:194-340).  Skipped tiles still pay their DMA and
    a pipeline bubble per skipped grid step — the symmetric-tile default
    uses the wrapped-pair grid (``_crossprod_wrap_kernel``) instead, which
    enumerates only real upper-triangle blocks."""
    i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    compute = (j + 1) * tj > i * ti  # block touches or crosses the diagonal

    @pl.when(compute)
    def _compute():
        prod = _plane_prod_int8(zi_ref[...], zj_ref[...])

        @pl.when(k == 0)
        def _init():
            out_ref[...] = prod

        @pl.when(k != 0)
        def _acc():
            out_ref[...] = out_ref[...] + prod

    @pl.when(jnp.logical_and(jnp.logical_not(compute), k == 0))
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)


def _autopad_rows(zq: jax.Array, preferred: int) -> jax.Array:
    """Zero-pad the row axis when that unlocks ``preferred``-sized tiles at
    <= 10 % extra MXU work, or when no >= 128 tile divides the axis at all.

    Exact: zero rows contribute zero products; callers slice the output
    back.  21,248 individuals (the padded form of the reference's 21k
    benchmark panels) only admit 256-tiles; padding to 21,504 runs
    512-tiles — measured 428 -> 523 T-equiv on v5e.
    """
    rows, kw = zq.shape
    up = -(-rows // preferred) * preferred
    try:
        have = pick_tile(rows, preferred, 128)
    except ValueError:
        have = 0
        if up * up * 10 > rows * rows * 11:
            up = -(-rows // 128) * 128  # cheapest valid padding
    if have < preferred and (have == 0 or up * up * 10 <= rows * rows * 11):
        zq = jnp.concatenate(
            [zq, jnp.zeros((up - rows, kw), zq.dtype)], axis=0)
    return zq


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "tile_kw",
                                              "interpret", "triangle",
                                              "tile_m"))
def packed_crossprod(
    zq: jax.Array,
    *,
    tile_i: int = DEFAULT_TILE_I,
    tile_j: int = DEFAULT_TILE_J,
    tile_kw: int = DEFAULT_TILE_KW,
    interpret: bool = False,
    triangle: bool = True,
    tile_m: int = None,  # legacy alias: sets both tile_i and tile_j
) -> jax.Array:
    """Raw integer crossproduct decode(zq) @ decode(zq)ᵀ -> int32 [rows, rows].

    Exact while 4*snps < 2^31 (see module docstring).
    ``triangle=True`` computes only blocks touching or above the diagonal
    (~2x less MXU work) and reconstructs the rest with one elementwise
    pass; tiles are asymmetric to amortize the decode (module constants).
    """
    rows, kw = zq.shape
    if 4 * 16 * kw >= 2 ** 31:
        # int32 accumulator capacity (the analogue of the reference's f64
        # exactness guard snps*n^2*4 <= 2^52, haplogeno.cc:742-744)
        raise ValueError(
            f"{16 * kw} packed SNP columns could overflow the exact int32 "
            "accumulator (limit ~536M); chunk the SNP axis and sum partials")
    if tile_m is not None:
        tile_i = tile_j = tile_m
    # out blocks are (ti, tj): Mosaic needs the last dim % 128 (and the
    # second-to-last % 8), so row tiles below 128 cannot lower — fail with
    # the clear pick_tile message instead of the Mosaic one
    if min(tile_i, tile_j) < 128:
        pick_tile(rows, min(tile_i, tile_j), 128)  # raises the clear message
    nrows = rows
    zq = _autopad_rows(zq, max(tile_i, tile_j))
    rows = zq.shape[0]
    ti = pick_tile(rows, tile_i, 128)
    tj = pick_tile(rows, tile_j, 128)
    tile_kw = pick_tile(kw, tile_kw, 128)
    grid = (rows // ti, rows // tj, kw // tile_kw)

    tri = triangle and rows > max(ti, tj)
    cost = pl.CostEstimate(
        flops=2 * rows * rows * 16 * kw // (2 if tri else 1),
        bytes_accessed=2 * rows * kw * 4 * (rows // ti) + rows * rows * 4,
        transcendentals=0,
    )
    w = call32(pl.pallas_call(
        (functools.partial(_crossprod_tri_kernel, ti=ti, tj=tj)
         if tri else _crossprod_kernel),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ti, tile_kw), lambda i, j, k: (i, k)),
            pl.BlockSpec((tj, tile_kw), lambda i, j, k: (j, k)),
        ],
        out_specs=pl.BlockSpec((ti, tj), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((rows, rows), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    ), zq, zq)
    if not tri:
        return w[:nrows, :nrows]
    # reconstruct: element (r, c) was computed iff its BLOCK touches or
    # crosses the diagonal; otherwise take the mirrored element (computed
    # on the other side).  Diagonal-crossing blocks are computed fully and
    # correctly on both sides, so `where` (not add) is the right merge.
    r_blk = jnp.arange(rows, dtype=jnp.int32) // ti * ti
    c_blk = jnp.arange(rows, dtype=jnp.int32) // tj * tj
    computed = (c_blk[None, :] + tj) > r_blk[:, None]
    return jnp.where(computed, w, w.T)[:nrows, :nrows]


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_kw", "interpret"))
def packed_crossprod_rect(
    zq_a: jax.Array,
    zq_b: jax.Array,
    *,
    tile_m: int = DEFAULT_TILE_M,
    tile_kw: int = DEFAULT_TILE_KW,
    interpret: bool = False,
) -> jax.Array:
    """Rectangular integer crossproduct decode(zq_a) @ decode(zq_b)ᵀ ->
    int32 [rows_a, rows_b].  The off-diagonal GRM tile primitive for 2D
    distributed layouts (the reference's individual-pair tile loop,
    snp_multiply_cuda.cu:194-340, with tiles living on different chips)."""
    rows_a, kw = zq_a.shape
    rows_b, kw_b = zq_b.shape
    if kw != kw_b:
        raise ValueError("packed K widths differ")
    if 4 * 16 * kw >= 2 ** 31:
        raise ValueError(
            f"{16 * kw} packed SNP columns could overflow the exact int32 "
            "accumulator (limit ~536M); chunk the SNP axis and sum partials")
    if tile_m < 128:
        pick_tile(rows_a, tile_m, 128)  # raises the clear message
    na, nb = rows_a, rows_b
    zq_a = _autopad_rows(zq_a, tile_m)
    zq_b = _autopad_rows(zq_b, tile_m)
    rows_a, rows_b = zq_a.shape[0], zq_b.shape[0]
    tile_a = pick_tile(rows_a, tile_m, 128)
    tile_b = pick_tile(rows_b, tile_m, 128)
    grid = (rows_a // tile_a, rows_b // tile_b, kw // pick_tile(kw, tile_kw, 128))
    tkw = pick_tile(kw, tile_kw, 128)
    return call32(pl.pallas_call(
        _crossprod_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_a, tkw), lambda i, j, k: (i, k)),
            pl.BlockSpec((tile_b, tkw), lambda i, j, k: (j, k)),
        ],
        out_specs=pl.BlockSpec((tile_a, tile_b), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((rows_a, rows_b), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    ), zq_a, zq_b)[:na, :nb]


def snp_crossprod(
    g: GenoMatrix,
    snpmajor_output: bool = False,
    interpret: Optional[bool] = None,
    **tiles,
) -> jax.Array:
    """Integer crossproduct (reference snp_multiply_gpu,
    src/cuda/snp_multiply_cuda.cu:38-382).

    snpmajor_output=False -> M = Z Zᵀ, [indiv, indiv] (GRM direction)
    snpmajor_output=True  -> M = Zᵀ Z, [snps, snps]   (LD direction)
    """
    if interpret is None:
        interpret = on_cpu()
    if snpmajor_output:
        m = packed_crossprod(g.zq_t, interpret=interpret, **tiles)
        return m[: g.snps, : g.snps]
    m = packed_crossprod(g.zq_n, interpret=interpret, **tiles)
    return m[: g.indiv, : g.indiv]


def _missing_d_csr(g):
    """The exact "add-back" matrix D for missing genotypes: D[i, s] = 2f_s
    at each recorded missing coordinate.  A missing entry was packed as 0
    and centering subtracted 2f_s, so its centered value is -2f_s; the
    reference semantics (Missings list corrections,
    src/miraculix/Vector.matrix.D.cc:179-208) make it contribute 0 — i.e.
    the exact centered matrix is Zc + D.  Returns 1-based CSR of D plus
    d2[i] = (D · 2f)[i]."""
    import numpy as np

    mi = np.asarray(g.miss_rows_n, np.int64)
    ms = np.asarray(g.miss_cols_n, np.int64)
    f = np.asarray(g.freq, np.float64)
    order = np.argsort(mi, kind="stable")
    mi, ms = mi[order], ms[order]
    w = 2.0 * f[ms]
    ia = np.concatenate([[0], np.cumsum(np.bincount(mi, minlength=g.indiv))]) + 1
    d2 = np.zeros(g.indiv)
    np.add.at(d2, mi, w * 2.0 * f[ms])
    return ia, ms + 1, w, d2, (mi, ms)


def _ddt_dense(rows, cols, w, n_rows, n_cols):
    """(sparse D) @ (sparse D)ᵀ as a dense [n_rows, n_rows] array (host;
    nnz = #missing entries, so this is cheap at realistic missing rates)."""
    import numpy as np
    from scipy import sparse

    d = sparse.csr_matrix((w, (rows, cols)), shape=(n_rows, n_cols))
    return np.asarray((d @ d.T).todense())


def grm(
    g: GenoMatrix,
    scale: bool = True,
    dtype=jnp.float32,
    correct_missing: Optional[bool] = None,
    interpret: Optional[bool] = None,
    **tiles,
) -> jax.Array:
    """VanRaden genomic relationship matrix via the Schlather decomposition
    (docs/grm.md:5-10; Julia finish crossproduct.jl:91-107).

    ``correct_missing``: apply the exact missing-genotype correction from
    the recorded missing index lists (reference Missings semantics,
    Vector.matrix.D.cc:179-208) — each missing entry then contributes
    exactly 0 to the centered product (mean imputation), instead of the
    -2f_s bias the raw packed 0 leaves behind.  Default: on whenever the
    panel carries missing info (``from_dense(..., keep_missing_info=True)``).
    """
    n = g.indiv
    m = snp_crossprod(g, snpmajor_output=False, interpret=interpret, **tiles)
    m = m.astype(dtype)
    if correct_missing is None:
        correct_missing = g.miss_rows_n is not None
    if correct_missing and g.miss_rows_n is None:
        raise ValueError("correct_missing requires a panel built with "
                         "keep_missing_info=True")
    if correct_missing:
        from .dgemm import dgemm
        from .sparse import sparse_times_geno

        f = g.freq.astype(dtype)
        # exact centering by 2f (the Schlather colsum identity assumes no
        # missing): Zc Zcᵀ = ZZᵀ - u1ᵀ - 1uᵀ + (4Σf²)11ᵀ, u = Z(2f)
        u = dgemm(g, 2.0 * g.freq[:, None], trans="n", center=False,
                  precision="f32", interpret=interpret)[:, 0].astype(dtype)
        m = m - u[None, :] - u[:, None] + 4.0 * jnp.sum(f * f)
        ia, ja, w, d2, (mi, ms) = _missing_d_csr(g)
        a = sparse_times_geno(
            g, ia, ja, w, g.indiv, trans_geno="t",
            precision="f32", interpret=interpret)  # D Zᵀ [indiv, indiv]
        a = a.astype(dtype) - jnp.asarray(d2, dtype)[:, None]  # D Zcᵀ
        ddt = jnp.asarray(_ddt_dense(mi, ms, w, g.indiv, g.snps), dtype)
        m = m + a + a.T + ddt
    else:
        colsum = jnp.sum(m, axis=1)
        total = jnp.sum(colsum)
        m = m - colsum[None, :] / n - colsum[:, None] / n + total / (n * n)
    if scale:
        m = m / g.sigma2.astype(dtype)
    return m


def ld(
    g: GenoMatrix,
    dtype=jnp.float32,
    squared: bool = False,
    correct_missing: Optional[bool] = None,
    interpret: Optional[bool] = None,
    **tiles,
) -> jax.Array:
    """LD matrix: centered SNP-SNP correlation r of allele counts
    (reference crossproduct.jl:128-152, validated against `plink --r`).
    ``squared=True`` returns r² (the LD-pruning statistic).

    ``correct_missing`` mirrors :func:`grm`: with the recorded missing
    lists, the centered crossproduct becomes exactly (Zc + D)ᵀ(Zc + D)
    (missing entries contribute 0 — mean imputation), which also makes the
    diagonal an exact non-negative variance.  Default: on whenever the
    panel carries missing info.
    """
    n = g.indiv
    m = snp_crossprod(g, snpmajor_output=True, interpret=interpret, **tiles)
    m = m.astype(dtype)
    f = g.freq.astype(dtype)
    if correct_missing is None:
        correct_missing = g.miss_rows_n is not None
    if correct_missing and g.miss_rows_n is None:
        raise ValueError("correct_missing requires a panel built with "
                         "keep_missing_info=True")
    if not correct_missing:
        # no-missing identity: column sums of Z equal 2nf
        m = m - (4.0 * n) * f[:, None] * f[None, :]
    else:
        from .sparse import sparse_times_geno

        # exact centering by 2f with missing packed as 0:
        # ZcᵀZc = ZᵀZ - (2f)sᵀ - s(2f)ᵀ + 4n ffᵀ,  s = Zᵀ1 (snp sums)
        s = g.snp_sums().astype(dtype)
        m = (m - (2.0 * f)[:, None] * s[None, :]
             - s[:, None] * (2.0 * f)[None, :]
             + (4.0 * n) * f[:, None] * f[None, :])
        ia, ja, w, _, (mi, ms) = _missing_d_csr(g)
        # Dᵀ Zc = Dᵀ Z - (Dᵀ1)(2f)ᵀ; CSR of Dᵀ grouped by SNP:
        import numpy as np

        order = np.argsort(ms, kind="stable")
        mi_s, ms_s = mi[order], ms[order]
        w_s = 2.0 * np.asarray(g.freq, np.float64)[ms_s]
        ia_t = np.concatenate(
            [[0], np.cumsum(np.bincount(ms_s, minlength=g.snps))]) + 1
        a = sparse_times_geno(
            g, ia_t, mi_s + 1, w_s, g.snps, trans_geno="n",
            precision="f32", interpret=interpret)  # Dᵀ Z [snps, snps]
        colsum_d = jnp.asarray(
            np.bincount(ms, weights=w, minlength=g.snps), dtype)
        a = a.astype(dtype) - colsum_d[:, None] * (2.0 * f)[None, :]
        dtd = jnp.asarray(_ddt_dense(ms, mi, w, g.snps, g.indiv), dtype)
        m = m + a + a.T + dtd
    # guard degenerate SNPs: monomorphic (zero variance) or, on uncorrected
    # missing-heavy panels, a slightly negative diagonal (freq excludes
    # missing while the crossproduct counted them as 0) — divide by 1
    # there instead of emitting NaN rows.
    diag = jnp.maximum(jnp.diagonal(m), 0.0)
    sigma = jnp.where(diag > 0, jnp.sqrt(diag), 1.0)
    m = m / sigma[:, None] / sigma[None, :]
    return m * m if squared else m


def ld_windowed(
    g: GenoMatrix,
    window: int,
    row_block: int = 4096,
    squared: bool = False,
    out: Optional["np.ndarray"] = None,
    chrom=None,
):
    """Banded LD: ``out[s, d]`` = r(SNP ``s``, SNP ``s+d+1``) for
    d in [0, window) — the LD-PRUNING shape.  O(snps x window) memory where
    the full r matrix is O(snps²) (4 TB at 1M SNPs vs 4 GB at window=1024);
    entries whose partner runs past the panel are 0.

    ``chrom`` (per-SNP labels, any dtype): entries whose pair spans a
    chromosome boundary are zeroed — plink/gcta window per chromosome, and
    cross-chromosome r is sampling noise that would otherwise leak into LD
    scores and pruning decisions.

    Device work per row block: ONE rectangular int8 crossproduct of the
    block's transposed packing against the block+window row range — the
    same exact-integer kernel as :func:`ld`, with the variance diagonal
    from the one-pass packed row stats (no full crossproduct needed).
    Missing genotypes are treated as :func:`ld_blocked` treats them
    (packed 0, frequency excludes missing; no correction term).

    Out-of-core: pass a HOST-resident panel (``from_bed(path,
    device_put=False)``) — row blocks transfer H2D per step, so the packed
    panel never needs to fit HBM.
    """
    import numpy as np

    from .common import on_cpu, packed_row_sq_stats

    interpret = on_cpu()
    zq = g.zq_t
    snps, n = g.snps, g.indiv
    if window < 1:
        raise ValueError("window must be >= 1")
    rb = max(512, (row_block // 512) * 512)
    wb = -(-window // 512) * 512          # padded window for tiling
    nb = -(-snps // rb)
    if chrom is not None:
        chrom = np.asarray(chrom)
        if chrom.shape[0] != snps:
            raise ValueError(f"chrom has {chrom.shape[0]} labels for "
                             f"{snps} SNPs")
    if out is None:
        out = np.zeros((snps, window), dtype=np.float32)
    f = np.asarray(g.freq, dtype=np.float64)
    # variance diagonal without any crossproduct: Σ_i z² is exact row
    # stats of the TRANSPOSED packing; var = Σz² - 4 n f²
    zsq = np.asarray(jax.jit(packed_row_sq_stats)(zq), np.float64)[:snps]
    var = zsq - 4.0 * n * f * f
    sigma = np.where(var > 0, np.sqrt(var), 1.0)

    rows_pad = zq.shape[0]

    def rows(a0, a1):
        sl = zq[a0:min(a1, rows_pad)]
        if sl.shape[0] == a1 - a0:
            return jnp.asarray(sl)
        return jnp.zeros((a1 - a0, zq.shape[1]),
                         zq.dtype).at[: sl.shape[0]].set(jnp.asarray(sl))

    for i in range(nb):
        r0, r1 = i * rb, min((i + 1) * rb, snps)
        nrow = r1 - r0
        zi = rows(r0, r0 + rb)
        zj = rows(r0, r0 + rb + wb)
        tile = np.asarray(packed_crossprod_rect(
            zi, zj, interpret=interpret)).astype(np.float64)
        tile = tile[:nrow]
        c1 = min(r0 + rb + window, snps) - r0   # valid partner columns
        tile[:, c1:] = 0.0
        tile[:, :c1] -= (4.0 * n) * np.outer(f[r0:r1], f[r0: r0 + c1])
        # band extraction: row k pairs with columns k+1 .. k+window
        sw = np.lib.stride_tricks.sliding_window_view(
            tile, window, axis=1)  # [nrow, width-window+1, window]
        band = sw[np.arange(nrow), np.arange(nrow) + 1]
        partner = np.minimum(r0 + np.arange(nrow)[:, None] + 1
                             + np.arange(window)[None, :], snps - 1)
        band = band / (sigma[r0:r1][:, None] * sigma[partner])
        valid = (r0 + np.arange(nrow)[:, None] + 1
                 + np.arange(window)[None, :]) < snps
        if chrom is not None:
            valid &= chrom[partner] == chrom[r0:r1][:, None]
        out[r0:r1] = np.where(valid, band, 0.0).astype(np.float32)
    if squared:
        np.square(out, out=out)
    return out


def ld_score(
    g: GenoMatrix,
    window: int = 512,
    row_block: int = 4096,
    adjusted: bool = True,
    chrom=None,
):
    """Per-SNP LD score: 1 + Σ r² over all partners within ``window``
    positions (both directions) — the gcta64 ``--ld-score`` statistic the
    reference's benchmark suite runs as a comparator
    (utils/benchmark/benchmark_suite.jl:230-273), the input of LD-score
    regression.  ``adjusted`` applies GCTA's small-sample correction
    r²_adj = r² − (1 − r²)/(n − 2) to every real pair.

    ``chrom`` (per-SNP labels): pairs spanning a chromosome boundary never
    contribute — gcta windows per chromosome, and with ``adjusted=False``
    the raw r² of ~window unlinked cross-chromosome pairs would inflate
    boundary SNPs' scores by about window/(n-2).

    Runs off the banded r of :func:`ld_windowed` (O(snps·window) memory and
    device work), so it streams panels whose full LD matrix never fits.
    Returns float64 [snps].
    """
    import numpy as np

    snps, n = g.snps, g.indiv
    window = min(window, max(snps - 1, 1))
    band = ld_windowed(g, window, row_block=row_block, squared=True,
                       chrom=chrom)
    if adjusted:
        if n < 3:
            raise ValueError("adjusted LD scores need >= 3 individuals")
        # in place on the f32 band (O(snps*window) is the whole footprint);
        # out-of-panel (and cross-chromosome) partners must stay exactly 0
        band -= (1.0 - band) / np.float32(n - 2)
        for d in range(window):
            band[max(snps - d - 1, 0):, d] = 0.0
        if chrom is not None:
            ch = np.asarray(chrom)
            partner = np.minimum(np.arange(snps)[:, None] + 1
                                 + np.arange(window)[None, :], snps - 1)
            band[ch[partner] != ch[:, None]] = 0.0
    score = 1.0 + band.sum(axis=1, dtype=np.float64)
    for d in range(window):  # incoming pairs: band[s-d-1, d] contributes to s
        score[d + 1:] += band[: snps - d - 1, d]
    return score


def ld_prune(
    g: GenoMatrix,
    window: int = 512,
    r2_threshold: float = 0.2,
    row_block: int = 4096,
    chrom=None,
):
    """Greedy pairwise LD pruning (the `plink --indep-pairwise` workflow):
    scan SNPs left to right; for every still-kept pair within ``window``
    whose r² exceeds ``r2_threshold``, drop the member with the LOWER MAF
    (ties drop the later SNP).  Returns a boolean keep-mask [snps].

    ``chrom`` (per-SNP labels, any dtype): pairs spanning a chromosome
    boundary are never pruning candidates — plink windows per chromosome,
    and cross-chromosome r² is sampling noise at small n.

    Runs off the banded r² of :func:`ld_windowed` (O(snps x window) device
    work + memory), so it scales to panels whose full LD matrix could
    never be formed.
    """
    import numpy as np

    band2 = ld_windowed(g, window=window, row_block=row_block, squared=True,
                        chrom=chrom)
    snps = g.snps
    f = np.asarray(g.freq, np.float64)
    maf = np.minimum(f, 1.0 - f)
    keep = np.ones(snps, bool)
    for s in range(snps):
        if not keep[s]:
            continue
        hi = min(s + 1 + window, snps)
        part = np.arange(s + 1, hi)
        mask = keep[part] & (band2[s, : hi - s - 1] > r2_threshold)
        if not mask.any():
            continue
        bad = part[mask]
        # drop the lower-MAF member of each offending pair
        drop_self = maf[s] < maf[bad]
        if drop_self.any():
            keep[s] = False
            # s is gone: its remaining pairs are moot
            keep[bad[~drop_self]] = False
            continue
        keep[bad] = False
    return keep


def _row_block_fn(zq, rb: int):
    """Row-block slicer for out-of-core loops: returns block i of ``rb``
    packed rows (device or host source), zero-padding a ragged last block."""
    def block(i):
        sl = zq[i * rb: (i + 1) * rb]
        if sl.shape[0] == rb:
            return jnp.asarray(sl)
        return jnp.zeros((rb, zq.shape[1]), jnp.uint32).at[: sl.shape[0]].set(
            jnp.asarray(sl))
    return block


def grm_blocked(
    source,
    row_block: int = 8192,
    scale: bool = True,
    out: Optional["np.ndarray"] = None,
):
    """Out-of-core GRM for panels whose relationship matrix (or packed
    [missing genotypes, if any, contribute -2f bias per entry here — the
    exact correction path lives in grm(); blocked sources carry no missing
    index lists]
    genotypes) exceed device HBM — the single-chip path for the reference's
    "large" simulated panels (e.g. 100K+ individuals,
    utils/genotype_simulation_plink/Makefile:1-9).

    The device computes one [row_block x row_block] integer crossproduct
    tile at a time over the full SNP axis (upper-triangle pairs only, like
    the reference's tile loop snp_multiply_cuda.cu:194-340, whose tiles it
    streams over CUDA streams); tiles accumulate into a HOST float32 matrix
    and the VanRaden finish runs on the host in float64.

    ``source``: a GenoMatrix (packed matrix fits HBM, only the GRM
    doesn't), a dense uint8 genotype matrix, or a .bed path (ingested via
    the fused native codec; only packed row blocks ever reach the device).
    Returns the [indiv, indiv] (scaled) GRM as host numpy float32.
    """
    import numpy as np

    from ..geno import GenoMatrix
    from .common import on_cpu

    interpret = on_cpu()
    # -- resolve the source to (row-sliceable packed zq_n, indiv, snps, freq)
    if isinstance(source, GenoMatrix):
        zq, indiv, freq = source.zq_n, source.indiv, np.asarray(source.freq)
    else:
        if isinstance(source, str):
            from ..io import bed, codec as _codec
            from ..io import native as _nat

            payload, snps_, indiv = bed.read_bed_payload(source)
            ipad, kws = _codec.planar16_dims(indiv, snps_, row_mult=256)
            spad, kwi = _codec.planar16_dims(snps_, indiv, row_mult=256)
            nat = _nat.bed_ingest(payload, snps_, indiv, spad, kwi, ipad,
                                  kws, want_t=False, want_pfreq=False)
            if nat is not None:
                _, zq, freq, _ = nat  # host zq_n [ipad, kws]
            else:
                dense = _codec.plink_to_dense(
                    np.ascontiguousarray(payload.T), indiv)
                freq = _codec.allele_freq(dense)
                zq = _codec.pack_planar16(dense, row_mult=256)
        else:
            from ..io import codec as _codec

            dense = np.asarray(source, dtype=np.uint8)
            indiv = dense.shape[0]
            freq = _codec.allele_freq(dense)
            zq = _codec.pack_planar16(dense, row_mult=256)

    rows_pad = zq.shape[0]
    rb = max(512, (row_block // 512) * 512)
    nb = -(-rows_pad // rb)

    if out is None:
        out = np.zeros((indiv, indiv), dtype=np.float32)

    block = _row_block_fn(zq, rb)

    for i in range(nb):
        zi = block(i)
        r0, r1 = i * rb, min((i + 1) * rb, indiv)
        if r0 >= indiv:
            break
        for j in range(i, nb):
            c0, c1 = j * rb, min((j + 1) * rb, indiv)
            if c0 >= indiv:
                break
            zj = zi if j == i else block(j)
            tile = np.asarray(packed_crossprod_rect(
                zi, zj, interpret=interpret)).astype(np.float32)
            out[r0:r1, c0:c1] = tile[: r1 - r0, : c1 - c0]
            if j > i:
                out[c0:c1, r0:r1] = tile[: r1 - r0, : c1 - c0].T
    # VanRaden finish (Schlather decomposition, docs/grm.md:5-10), host f64
    n = indiv
    colsum = out.sum(axis=1, dtype=np.float64)
    total = colsum.sum()
    out -= (colsum[None, :] / n).astype(np.float32)
    out -= (colsum[:, None] / n).astype(np.float32)
    out += np.float32(total / (n * n))
    if scale:
        f = np.asarray(freq, dtype=np.float64)
        out /= np.float32(2.0 * np.sum(f * (1.0 - f)))
    return out


def ld_blocked(
    g: GenoMatrix,
    row_block: int = 8192,
    out: Optional["np.ndarray"] = None,
):
    """Out-of-core LD correlation (r) matrix: SNP x SNP tiles computed on
    device (rect int8 crossproducts of the transposed packing over the full
    individual axis), accumulated into a host float32 matrix — LD matrices
    outgrow HBM at ~60K SNPs.  Finish per crossproduct.jl:128-152."""
    import numpy as np

    from .common import on_cpu

    interpret = on_cpu()
    zq = g.zq_t
    snps, n = g.snps, g.indiv
    rows_pad = zq.shape[0]
    rb = max(512, (row_block // 512) * 512)
    nb = -(-rows_pad // rb)

    if out is None:
        out = np.zeros((snps, snps), dtype=np.float32)
    f = np.asarray(g.freq, dtype=np.float64)

    block = _row_block_fn(zq, rb)

    for i in range(nb):
        r0, r1 = i * rb, min((i + 1) * rb, snps)
        if r0 >= snps:
            break
        zi = block(i)
        for j in range(i, nb):
            c0, c1 = j * rb, min((j + 1) * rb, snps)
            if c0 >= snps:
                break
            zj = zi if j == i else block(j)
            tile = np.asarray(packed_crossprod_rect(
                zi, zj, interpret=interpret)).astype(np.float64)
            tile = tile[: r1 - r0, : c1 - c0]
            tile -= (4.0 * n) * np.outer(f[r0:r1], f[c0:c1])
            out[r0:r1, c0:c1] = tile
            if j > i:
                out[c0:c1, r0:r1] = tile.T
    diag = np.maximum(np.diag(out).copy(), 0.0)  # see ld(): degenerate SNPs
    sigma = np.where(diag > 0, np.sqrt(diag), 1.0)
    out /= sigma[None, :]
    out /= sigma[:, None]
    return out


def dominance_grm(
    g,
    scale: bool = True,
    dtype=jnp.float32,
    interpret: Optional[bool] = None,
    **tiles,
) -> jax.Array:
    """Genotypic dominance relationship matrix (Su et al. 2012, the GCTA
    ``--make-grm-d`` family):

        D = (H - hbar)(H - hbar)' / sum_s 2 p q (1 - 2 p q)

    with H the heterozygote indicator panel 1[z == 1] and p the additive
    allele frequencies.  Beyond-parity: the reference computes additive
    relationship matrices only (crossproduct.jl:83-110).  Because H is
    itself a valid {0, 1} genotype panel, the packed int8 MXU crossprod
    machinery applies UNCHANGED: the het panel's own frequency cache is
    exactly hbar/2, so the standard 2f-centering produces (H - hbar).
    Missing genotypes are packed as 0, i.e. treated as non-het (mean
    imputation on the dominance scale).

    Accepts a dense genotype matrix or a GenoMatrix (decoded host-side
    once to build the het panel).
    """
    import numpy as np

    from ..geno import from_dense
    from ..io import codec

    if isinstance(g, GenoMatrix):
        dense = codec.unpack_planar16(np.asarray(g.zq_n), g.indiv, g.snps)
        p = np.asarray(g.freq, np.float64)
    else:
        dense = np.asarray(g, np.uint8)
        p = codec.allele_freq(dense, axis=0)
    het = (dense == 1).astype(np.uint8)
    hm = from_dense(het)
    d = grm(hm, scale=False, dtype=dtype, interpret=interpret, **tiles)
    if scale:
        pq = 2.0 * p * (1.0 - p)
        denom = float(np.sum(pq * (1.0 - pq)))
        d = d / jnp.asarray(max(denom, 1e-30), dtype)
    return d


def grm_yang(
    g: GenoMatrix,
    block: int = 2048,
    dtype=jnp.float32,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """GCTA-default GRM (Yang et al. 2010): per-SNP standardization

        G_ij = (1/m) sum_s (z_is - 2 p_s)(z_js - 2 p_s) / (2 p_s q_s)

    — each SNP contributes unit variance, vs VanRaden's single global
    sum-of-variances normalization (:func:`grm`).  The per-SNP weights
    break the int8 crossprod trick, so the matrix is assembled in
    individual column blocks with two packed dgemm passes per block
    (t = Zc' E_J, scale rows by w_s, back through Zc) — ~an order of
    magnitude more device work than the VanRaden path; use it when the
    GCTA definition is required.  Near-monomorphic SNPs (2pq ~ 0) are
    weighted 0, GCTA's behavior for excluded SNPs.

    Missing genotypes: mean-imputed with a single global SNP count m —
    exact GCTA interop on fully-called panels; gcta --make-grm instead
    divides each PAIR by its own non-missing count, so panels with
    missing calls differ slightly (run the panel through ``qc --geno``
    first when byte-level agreement with gcta matters).
    """
    import numpy as np

    from .dgemm import dgemm

    n = g.indiv
    f = np.asarray(g.freq, np.float64)
    pq2 = 2.0 * f * (1.0 - f)
    use = pq2 > 1e-12
    m_used = int(use.sum())
    w = np.divide(1.0, pq2 * max(m_used, 1),
                  out=np.zeros_like(pq2), where=use)
    wj = jnp.asarray(w, dtype)[:, None]

    cols = []
    for j0 in range(0, n, block):
        j1 = min(j0 + block, n)
        # block of the identity, built per iteration (a full n x n eye
        # would be 40 GB of host RAM at n = 100K)
        ej = np.eye(n, j1 - j0, -j0, dtype=np.float32)
        t = dgemm(g, jnp.asarray(ej), trans="t", center=True,
                  interpret=interpret)
        cols.append(dgemm(g, t.astype(dtype) * wj, trans="n", center=True,
                          interpret=interpret).astype(dtype))
    out = jnp.concatenate(cols, axis=1)  # one assembly, no per-block copy
    return 0.5 * (out + out.T)  # two f32 passes: symmetrize exactly
