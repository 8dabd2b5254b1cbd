"""GCTA GRM fileset I/O: byte-level layout check against a hand-packed
fixture, round-trip, and the CLI grm --gcta-out path."""
import numpy as np

from miraculix_tpu.io import bed
from miraculix_tpu.io.grm_io import read_gcta_grm, write_gcta_grm


def test_gcta_layout_bytes(tmp_path):
    """The .grm.bin byte stream must be the float32-LE lower triangle in
    (0,0), (1,0), (1,1), (2,0)... order — hand-packed here from the
    format definition (GCTA docs; PLINK --make-grm-bin writes the same)."""
    g = np.array([[1.0, 0.25, 0.5],
                  [0.25, 1.1, -0.125],
                  [0.5, -0.125, 0.9]])
    p = str(tmp_path / "t")
    write_gcta_grm(p, g, 777, ids=["F1 A", "F2 B", "F3 C"])
    raw = np.fromfile(p + ".grm.bin", dtype="<f4")
    np.testing.assert_array_equal(
        raw, np.array([1.0, 0.25, 1.1, 0.5, -0.125, 0.9], "<f4"))
    rawn = np.fromfile(p + ".grm.N.bin", dtype="<f4")
    np.testing.assert_array_equal(rawn, np.full(6, 777.0, "<f4"))
    assert open(p + ".grm.id").read() == "F1\tA\nF2\tB\nF3\tC\n"


def test_round_trip_with_pair_counts(tmp_path):
    rng = np.random.default_rng(0)
    m = rng.standard_normal((17, 40))
    g = m @ m.T / 40
    cnt = np.full((17, 17), 40.0)
    cnt[0, 1] = cnt[1, 0] = 38.0  # missing-aware per-pair count
    p = str(tmp_path / "rt")
    write_gcta_grm(p, g, cnt)
    g2, c2, ids = read_gcta_grm(p)
    np.testing.assert_allclose(g2, g, atol=1e-6)  # f32 storage
    assert c2[1, 0] == 38.0 and c2[2, 2] == 40.0
    assert ids[0] == ("I1", "I1") and len(ids) == 17
    assert np.array_equal(g2, g2.T)


def test_cli_grm_gcta_out(tmp_path):
    from miraculix_tpu import cli

    geno = bed.simulate_genotypes(24, 500, seed=3)
    bedp = str(tmp_path / "p.bed")
    bed.write_bed(bedp, geno)
    prefix = str(tmp_path / "g")
    rc = cli.main(["grm", bedp, "-o", str(tmp_path / "grm.npy"),
                   "--gcta-out", prefix])
    assert rc == 0
    g_npy = np.load(str(tmp_path / "grm.npy"))
    g2, c2, ids = read_gcta_grm(prefix)
    np.testing.assert_allclose(g2, g_npy, atol=1e-5 * np.abs(g_npy).max())
    assert c2[0, 0] == 500.0 and len(ids) == 24


def test_cli_grm_gcta_out_pair_denominator_counts(tmp_path):
    """--pair-denom + --gcta-out must write each pair's CO-CALLED SNP
    count into .grm.N.bin (the format's documented per-pair contract),
    not the constant .bim total (review finding)."""
    from miraculix_tpu import cli
    from miraculix_tpu.io.bed import read_bed_genotypes

    geno = bed.simulate_genotypes(20, 400, seed=8, missing_rate=0.06)
    bedp = str(tmp_path / "m.bed")
    bed.write_bed(bedp, geno)
    prefix = str(tmp_path / "gm")
    rc = cli.main(["grm", bedp, "-o", str(tmp_path / "grm.npy"),
                   "--pair-denom", "--gcta-out", prefix])
    assert rc == 0
    _, counts, ids = read_gcta_grm(prefix)
    dense, _ = read_bed_genotypes(bedp)
    called = (dense != 3).astype(np.int64)
    want = called @ called.T
    np.testing.assert_array_equal(counts, want)
    assert (counts < 400).any()          # missing panel: not the constant
