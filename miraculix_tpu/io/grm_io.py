"""GCTA-format GRM file I/O — the interchange format of the pipelines the
reference benchmarks against (GCTA 1.94 / PLINK --make-grm-bin,
utils/benchmark/benchmark_suite.jl:230-273): downstream REML/association
tools consume these files directly.

A GCTA GRM fileset is three files sharing a prefix:

- ``<p>.grm.bin``    float32 little-endian, the LOWER triangle including
                     the diagonal, row by row: (0,0), (1,0), (1,1), ...
- ``<p>.grm.N.bin``  float32, same layout: the number of SNPs used per
                     pair (a constant when no genotypes are missing).
- ``<p>.grm.id``     text, one ``FID\\tIID`` line per individual.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def _tril_flat(n: int) -> Tuple[np.ndarray, np.ndarray]:
    rows, cols = np.tril_indices(n)
    return rows, cols


def write_gcta_grm(
    prefix: str,
    grm: np.ndarray,
    n_snps,
    ids: Optional[Sequence] = None,
) -> None:
    """Write ``<prefix>.grm.bin/.grm.N.bin/.grm.id``.

    ``grm``: [n, n] relationship matrix (e.g. ``mx.grm(gm, scale=True)``).
    ``n_snps``: scalar, or [n, n] per-pair SNP counts (missing-aware).
    ``ids``: per-individual labels — strings ``"FID IID"``/``"IID"`` or
    (fid, iid) pairs; defaults to ``I1..In`` with FID = IID.
    """
    g = np.asarray(grm, np.float64)
    n = g.shape[0]
    if g.shape != (n, n):
        raise ValueError(f"grm must be square, got {g.shape}")
    rows, cols = _tril_flat(n)
    g[rows, cols].astype("<f4").tofile(prefix + ".grm.bin")
    cnt = np.asarray(n_snps, np.float64)
    if cnt.ndim == 0:
        flat = np.full(len(rows), float(cnt), "<f4")
    else:
        flat = cnt[rows, cols].astype("<f4")
    flat.tofile(prefix + ".grm.N.bin")
    with open(prefix + ".grm.id", "w") as fh:
        for i in range(n):
            if ids is None:
                fh.write(f"I{i + 1}\tI{i + 1}\n")
            else:
                e = ids[i]
                if isinstance(e, (tuple, list)):
                    fh.write(f"{e[0]}\t{e[1]}\n")
                else:
                    parts = str(e).split()
                    fid, iid = (parts[0], parts[1]) if len(parts) > 1 \
                        else (parts[0], parts[0])
                    fh.write(f"{fid}\t{iid}\n")


def read_gcta_grm(prefix: str):
    """Read a GCTA GRM fileset -> ``(grm [n, n] float64 symmetric,
    n_snps [n, n] float64, ids list of (fid, iid))``."""
    with open(prefix + ".grm.id") as fh:
        ids = [tuple(ln.split()[:2]) for ln in fh if ln.strip()]
    n = len(ids)
    npairs = n * (n + 1) // 2
    tri = np.fromfile(prefix + ".grm.bin", dtype="<f4")
    if len(tri) != npairs:
        raise ValueError(f"{prefix}.grm.bin has {len(tri)} entries, "
                         f"expected {npairs} for {n} ids")
    cnt = np.fromfile(prefix + ".grm.N.bin", dtype="<f4")
    rows, cols = _tril_flat(n)
    g = np.zeros((n, n))
    g[rows, cols] = tri
    g[cols, rows] = tri
    c = np.zeros((n, n))
    if len(cnt) == npairs:
        c[rows, cols] = cnt
        c[cols, rows] = cnt
    elif len(cnt) == 1:  # some tools write a single constant
        c[:] = float(cnt[0])
    else:
        raise ValueError(f"{prefix}.grm.N.bin has {len(cnt)} entries")
    return g, c, ids
