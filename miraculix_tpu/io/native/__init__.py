"""ctypes loader for the native host codec (with lazy on-demand build).

The library builds itself with g++ on first use (no pip deps); every entry
point has a numpy fallback in miraculix_tpu.io.codec, so the package works
even without a toolchain.  Set MIRACULIX_TPU_NO_NATIVE=1 to force the
numpy path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "codec.cpp")
_SO = os.path.join(_DIR, "libmxcodec.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    # compile to a process-unique temp path and os.replace (atomic) into
    # place: two PROCESSES racing the lazy build (e.g. the mp_check
    # workers) otherwise interleave g++ writes to the same .so and the
    # loser dlopens a truncated ELF, silently pinning the numpy fallback
    tmp = f"{_SO}.tmp.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", _SRC, "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native codec; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("MIRACULIX_TPU_NO_NATIVE"):
            return None
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64, u8p, u32p, f64p = (
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_double),
        )
        lib.mx_plink_to_dense.argtypes = [u8p, i64, i64, i64, u8p]
        lib.mx_dense_to_plink.argtypes = [u8p, i64, i64, u8p]
        lib.mx_pack_planar16.argtypes = [u8p, i64, i64, i64, i64, i64, i64, u32p]
        lib.mx_allele_freq.argtypes = [u8p, i64, i64, f64p]
        lib.mx_count_missing.argtypes = [u8p, i64, i64]
        lib.mx_count_missing.restype = i64
        lib.mx_transpose_u8.argtypes = [u8p, i64, i64, u8p]
        if hasattr(lib, "mx_bed_ingest"):
            lib.mx_bed_ingest.argtypes = [u8p, i64, i64, i64, i64, i64, i64,
                                          u32p, u32p, f64p, f64p]
        if hasattr(lib, "mx_bed_colstats"):
            i64p = ctypes.POINTER(ctypes.c_int64)
            lib.mx_bed_colstats.argtypes = [u8p, i64, i64, i64p, i64p]
        if hasattr(lib, "mx_inbreeding"):
            i64p = ctypes.POINTER(ctypes.c_int64)
            lib.mx_inbreeding.argtypes = [i64p, i64p, i64, f64p]
        if hasattr(lib, "mx_ld_prune"):
            f32p = ctypes.POINTER(ctypes.c_float)
            lib.mx_ld_prune.argtypes = [f32p, f64p, ctypes.c_double,
                                        i64, i64, u8p]
        if hasattr(lib, "mx_ld_prune_mask"):
            lib.mx_ld_prune_mask.argtypes = [u8p, f64p, i64, i64, u8p]
        lib.mx_codec_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


# ---------------------------------------------------------------------------
# numpy-signature wrappers (return None if native unavailable)
# ---------------------------------------------------------------------------

def plink_to_dense(plink: np.ndarray, n_within: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    plink = np.ascontiguousarray(plink, dtype=np.uint8)
    nbytes, nmajor = plink.shape
    out = np.empty((n_within, nmajor), dtype=np.uint8)
    lib.mx_plink_to_dense(_ptr(plink, ctypes.c_uint8), nbytes, nmajor,
                          n_within, _ptr(out, ctypes.c_uint8))
    return out


def dense_to_plink(geno: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    geno = np.ascontiguousarray(geno, dtype=np.uint8)
    n_within, nmajor = geno.shape
    out = np.empty(((n_within + 3) // 4, nmajor), dtype=np.uint8)
    lib.mx_dense_to_plink(_ptr(geno, ctypes.c_uint8), n_within, nmajor,
                          _ptr(out, ctypes.c_uint8))
    return out


def pack_planar16(geno: np.ndarray, rp: int, kw: int) -> Optional[np.ndarray]:
    """Strided pack: accepts C-contiguous arrays AND transposed views (no
    host copy for the zq_t orientation)."""
    lib = get_lib()
    if lib is None:
        return None
    if geno.dtype != np.uint8:
        return None
    rows, cols = geno.shape
    s0, s1 = geno.strides
    if s0 % geno.itemsize or s1 % geno.itemsize:
        return None
    base = geno
    # ctypes needs the underlying buffer pointer; strides handle the view.
    out = np.empty((rp, kw), dtype=np.uint32)
    lib.mx_pack_planar16(
        base.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rows, cols, s0 // geno.itemsize, s1 // geno.itemsize,
        rp, kw, _ptr(out, ctypes.c_uint32))
    return out


def allele_freq(geno: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    geno = np.ascontiguousarray(geno, dtype=np.uint8)
    rows, cols = geno.shape
    out = np.empty(cols, dtype=np.float64)
    lib.mx_allele_freq(_ptr(geno, ctypes.c_uint8), rows, cols,
                       _ptr(out, ctypes.c_double))
    return out


def count_missing(geno: np.ndarray) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    geno = np.ascontiguousarray(geno, dtype=np.uint8)
    rows, cols = geno.shape
    return int(lib.mx_count_missing(_ptr(geno, ctypes.c_uint8), rows, cols))


def transpose_u8(geno: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    geno = np.ascontiguousarray(geno, dtype=np.uint8)
    rows, cols = geno.shape
    out = np.empty((cols, rows), dtype=np.uint8)
    lib.mx_transpose_u8(_ptr(geno, ctypes.c_uint8), rows, cols,
                        _ptr(out, ctypes.c_uint8))
    return out


def bed_colstats(payload: np.ndarray, snps: int, indiv: int):
    """Per-individual (sum, called) over a raw SNP-major .bed payload —
    the exact ingredients for combining pseudo-frequencies across SNP
    chunks.  Returns (sum[indiv] int64, called[indiv] int64) or None."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "mx_bed_colstats"):
        return None
    payload = np.ascontiguousarray(payload, dtype=np.uint8)
    out_sum = np.empty(indiv, dtype=np.int64)
    out_called = np.empty(indiv, dtype=np.int64)
    lib.mx_bed_colstats(_ptr(payload, ctypes.c_uint8), snps, indiv,
                        _ptr(out_sum, ctypes.c_int64),
                        _ptr(out_called, ctypes.c_int64))
    return out_sum, out_called


def ld_prune(band2: np.ndarray, maf: np.ndarray,
             r2_threshold: float) -> Optional[np.ndarray]:
    """Greedy banded LD prune (see codec.cpp mx_ld_prune); returns the
    keep mask [snps] bool, or None if native is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "mx_ld_prune"):
        return None
    band2 = np.ascontiguousarray(band2, dtype=np.float32)
    maf = np.ascontiguousarray(maf, dtype=np.float64)
    snps, window = band2.shape
    keep = np.empty(snps, dtype=np.uint8)
    lib.mx_ld_prune(_ptr(band2, ctypes.c_float), _ptr(maf, ctypes.c_double),
                    float(r2_threshold), snps, window,
                    _ptr(keep, ctypes.c_uint8))
    return keep.astype(bool)


def ld_prune_mask(mask: np.ndarray, maf: np.ndarray) -> Optional[np.ndarray]:
    """Greedy banded LD prune over a PRE-THRESHOLDED uint8 offender mask
    (codec.cpp mx_ld_prune_mask — the device-thresholded fast path);
    returns the keep mask [snps] bool, or None if native is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "mx_ld_prune_mask"):
        return None
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    maf = np.ascontiguousarray(maf, dtype=np.float64)
    snps, window = mask.shape
    keep = np.empty(snps, dtype=np.uint8)
    lib.mx_ld_prune_mask(_ptr(mask, ctypes.c_uint8),
                         _ptr(maf, ctypes.c_double), snps, window,
                         _ptr(keep, ctypes.c_uint8))
    return keep.astype(bool)


def bed_ingest(payload: np.ndarray, snps: int, indiv: int,
               spad: int, kwi: int, ipad: int, kws: int,
               want_t: bool = True, want_n: bool = True,
               want_pfreq: bool = True):
    """Fused .bed -> planar16 packings + freq/pseudo-freq, never
    materializing the dense matrix.  ``payload``: uint8 [snps, nbytes]
    (the raw SNP-major .bed stream after the magic bytes).  Each of the
    three big outputs can be skipped (None placeholder in the result) —
    the out-of-core GRM needs only zq_n + freq and must not allocate the
    transposed packing.  Returns (zq_t, zq_n, freq, pseudo_freq) or None
    if native is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "mx_bed_ingest"):
        return None
    payload = np.ascontiguousarray(payload, dtype=np.uint8)
    zqt = np.empty((spad, kwi), dtype=np.uint32) if want_t else None
    zqn = np.empty((ipad, kws), dtype=np.uint32) if want_n else None
    freq = np.empty(snps, dtype=np.float64)
    pfreq = np.empty(indiv, dtype=np.float64) if want_pfreq else None
    lib.mx_bed_ingest(_ptr(payload, ctypes.c_uint8), snps, indiv,
                      spad, kwi, ipad, kws,
                      _ptr(zqt, ctypes.c_uint32) if want_t else None,
                      _ptr(zqn, ctypes.c_uint32) if want_n else None,
                      _ptr(freq, ctypes.c_double),
                      _ptr(pfreq, ctypes.c_double) if want_pfreq else None)
    return zqt, zqn, freq, pfreq
