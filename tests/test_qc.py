"""Panel QC: streamed byte-LUT stats and the standard filters, against
dense numpy oracles."""
import numpy as np

from miraculix_tpu import qc
from miraculix_tpu.io import bed


def _write(tmp_path, g):
    p = str(tmp_path / "q.bed")
    bed.write_bed(p, g)
    return p


def test_snp_stats_oracle(tmp_path):
    g = bed.simulate_genotypes(103, 517, seed=3, missing_rate=0.08)
    p = _write(tmp_path, g)
    counts, imiss = qc.snp_stats(p, chunk_snps=128)
    for v in range(3):
        np.testing.assert_array_equal(counts[:, v], (g == v).sum(axis=0))
    np.testing.assert_array_equal(counts[:, 3], (g == 3).sum(axis=0))
    np.testing.assert_array_equal(imiss, (g == 3).sum(axis=1))


def test_hwe_detects_het_excess():
    """A SNP with every call heterozygous must fail HWE hard; a
    HWE-simulated panel's p-values must look uniform-ish."""
    g = bed.simulate_genotypes(400, 200, seed=5)
    counts = np.stack([(g == v).sum(axis=0) for v in range(4)], axis=1)
    bad = np.array([[0, 400, 0, 0]])
    p_bad = qc.hwe_chi2_p(bad)[0]
    assert p_bad < 1e-50
    pv = qc.hwe_chi2_p(counts)
    assert (pv < 0.05).mean() < 0.12  # ~5% false positives expected


def test_qc_filter_matches_numpy(tmp_path):
    rng = np.random.default_rng(9)
    g = bed.simulate_genotypes(120, 400, seed=7,
                               maf_range=(0.005, 0.5)).astype(np.uint8)
    # inject missing: 3 bad individuals + 5 bad SNPs
    g[:3, ::2] = 3
    g[:, :5] = np.where(rng.random((120, 5)) < 0.4, 3, g[:, :5])
    p = _write(tmp_path, g)
    out = str(tmp_path / "f.bed")
    keep_s, keep_i = qc.qc_filter(p, out, maf=0.05, geno=0.2, mind=0.3,
                                  chunk_snps=64)

    # numpy oracle, PLINK order: mind first, then per-SNP on kept indiv
    ki = (g == 3).mean(axis=1) <= 0.3
    gk = g[ki]
    miss = (gk == 3).mean(axis=0)
    called = np.where(gk == 3, 0, gk).astype(float)
    nc = (gk != 3).sum(axis=0)
    p_alt = called.sum(axis=0) / np.maximum(2 * nc, 1)
    maf = np.minimum(p_alt, 1 - p_alt)
    ks = (nc > 0) & (miss <= 0.2) & (maf >= 0.05)
    np.testing.assert_array_equal(keep_i, ki)
    np.testing.assert_array_equal(keep_s, ks)

    back, _ = bed.read_bed_genotypes(out)
    np.testing.assert_array_equal(back, g[np.ix_(ki, ks)])
    # sibling files subset consistently
    assert sum(1 for _ in open(out[:-4] + ".bim")) == ks.sum()
    assert sum(1 for _ in open(out[:-4] + ".fam")) == ki.sum()


def test_cli_qc(tmp_path):
    from miraculix_tpu import cli

    g = bed.simulate_genotypes(40, 100, seed=11, maf_range=(0.01, 0.5))
    p = _write(tmp_path, g)
    out = str(tmp_path / "c.bed")
    assert cli.main(["qc", p, "-o", out, "--maf", "0.05"]) == 0
    n, s = bed.read_bed_genotypes(out)[0].shape
    assert n == 40 and 0 < s <= 100


def test_rel_cutoff():
    """Related pairs are broken by dropping the most-connected member;
    the surviving set has no pair above the cutoff and is maximal-ish
    (a clique of 3 loses exactly 2 members)."""
    n = 12
    g = np.eye(n) * 1.0
    # clique: 0-1-2 all related; pair: 5-6; hub: 9 related to 10 and 11
    for i, j in [(0, 1), (0, 2), (1, 2), (5, 6), (9, 10), (9, 11)]:
        g[i, j] = g[j, i] = 0.3
    keep = qc.rel_cutoff(g, cutoff=0.125)
    kept = np.flatnonzero(keep)
    sub = g[np.ix_(kept, kept)]
    np.fill_diagonal(sub, 0)
    assert np.abs(sub).max() <= 0.125
    assert keep.sum() == n - 4  # 2 from the clique, 1 of (5,6), hub 9
    assert not keep[9] and keep[10] and keep[11]


def test_blank_fam_line_does_not_mis_dimension(tmp_path):
    """A stray blank line in .fam/.bim (hand-edited files) must not shift
    the byte geometry: _count_lines counts records, not lines."""
    g = bed.simulate_genotypes(9, 30, seed=2)
    p = _write(tmp_path, g)
    with open(p[:-4] + ".fam", "a") as fh:
        fh.write("\n")   # trailing blank line
    with open(p[:-4] + ".bim", "a") as fh:
        fh.write("\n\n")
    counts, imiss = qc.snp_stats(p)
    assert counts.shape == (30, 4) and len(imiss) == 9
    gm_geno, _ = bed.read_bed_genotypes(p)
    np.testing.assert_array_equal(gm_geno, g)


def test_qc_hwe_filter_drops_het_excess(tmp_path):
    g = bed.simulate_genotypes(200, 60, seed=21)
    g[:, 7] = 1  # every call heterozygous: extreme HWE violation
    p = _write(tmp_path, g)
    out = str(tmp_path / "h.bed")
    keep_s, _ = qc.qc_filter(p, out, hwe=1e-6)
    assert not keep_s[7]
    assert keep_s.sum() >= 55  # HWE-simulated SNPs mostly survive


def test_cli_qc_rel_cutoff_and_ld_prune(tmp_path, capsys):
    """CLI: qc --rel-cutoff writes OUT.rel.id; ld --prune-r2 writes
    .prune.in/.prune.out partitioning the SNP ids."""
    import numpy as np

    from miraculix_tpu import cli
    from miraculix_tpu.io import bed as bedio

    rng = np.random.default_rng(4)
    base = bedio.simulate_genotypes(60, 400, seed=6)
    geno = np.concatenate([base, base[:10]], axis=0)  # 10 duplicated rows
    p = str(tmp_path / "q.bed")
    bedio.write_bed(p, geno)

    out = str(tmp_path / "clean.bed")
    assert cli.main(["qc", p, "-o", out, "--rel-cutoff", "0.5"]) == 0
    msg = capsys.readouterr().out
    assert ".rel.id" in msg
    kept = [ln.split() for ln in open(out[:-4] + ".rel.id")]
    # the 10 duplicate pairs violate the cutoff: at most one of each pair
    assert 55 <= len(kept) <= 65

    assert cli.main(["ld", p, "--prune-r2", "0.3", "--window", "64",
                     "-o", str(tmp_path / "pr")]) == 0
    capsys.readouterr()
    kept_ids = open(str(tmp_path / "pr") + ".prune.in").read().split()
    drop_ids = open(str(tmp_path / "pr") + ".prune.out").read().split()
    assert len(kept_ids) + len(drop_ids) == 400
    assert set(kept_ids).isdisjoint(drop_ids) and len(kept_ids) > 0


def test_cli_ld_rejects_conflicting_modes(tmp_path, capsys):
    """--score / --prune-r2 / --squared are distinct ld modes: conflicting
    combinations must SystemExit instead of silently picking one."""
    import numpy as np
    import pytest

    from miraculix_tpu import cli
    from miraculix_tpu.io import bed as bedio

    geno = bedio.simulate_genotypes(30, 64, seed=11)
    p = str(tmp_path / "c.bed")
    bedio.write_bed(p, geno)
    with pytest.raises(SystemExit):
        cli.main(["ld", p, "--score", "--prune-r2", "0.3"])
    with pytest.raises(SystemExit):
        cli.main(["ld", p, "--score", "--squared"])
    with pytest.raises(SystemExit):
        cli.main(["ld", p, "--prune-r2", "0.3", "--squared"])
