"""VCF ingestion: GT parsing semantics, bgzf/gzip, skip rules, and the
vcf_to_bed -> from_bed round trip."""
import gzip

import numpy as np

import miraculix_tpu as mx
from miraculix_tpu.io import bed
from miraculix_tpu.io.vcf import read_vcf, vcf_to_bed

HDR = ("##fileformat=VCFv4.2\n"
       "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
       "S1\tS2\tS3\n")


def test_gt_semantics(tmp_path):
    body = (
        "1\t100\trs1\tA\tG\t.\tPASS\t.\tGT\t0/0\t0/1\t1/1\n"
        "1\t200\trs2\tC\tT\t.\tPASS\t.\tGT:DP\t1|0:9\t./.:3\t0|0:7\n"
        "1\t300\trs3\tG\tA,C\t.\tPASS\t.\tGT\t0/0\t0/0\t0/0\n"  # multiallelic
        "1\t400\trs4\tT\tC\t.\tPASS\t.\tDP:GT\t5:1/1\t2:./1\t1:0/1\n"
    )
    p = tmp_path / "t.vcf"
    p.write_text(HDR + body)
    geno, samples, variants = read_vcf(str(p))
    assert samples == ["S1", "S2", "S3"]
    assert [v[2] for v in variants] == ["rs1", "rs2", "rs4"]  # rs3 skipped
    # variant-major rows: rs1 [0,1,2]; rs2 GT-after-DP [1,3,0]; rs4
    # (FORMAT DP:GT, partial call ./1 -> missing) [2,3,1]
    np.testing.assert_array_equal(
        geno, np.array([[0, 1, 2], [1, 3, 0], [2, 3, 1]], np.uint8).T)


def test_gzip_and_round_trip(tmp_path):
    rng = np.random.default_rng(3)
    g = bed.simulate_genotypes(7, 25, seed=9, missing_rate=0.1)
    lines = [HDR.replace("S1\tS2\tS3",
                         "\t".join(f"I{i}" for i in range(7)))]
    code = {0: "0/0", 1: "0/1", 2: "1/1", 3: "./."}
    for s in range(25):
        fields = "\t".join(code[int(v)] for v in g[:, s])
        lines.append(f"2\t{s+1}\tv{s}\tA\tG\t.\t.\t.\tGT\t{fields}\n")
    p = tmp_path / "t.vcf.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("".join(lines))

    bedp = str(tmp_path / "c.bed")
    n, s = vcf_to_bed(str(p), bedp)
    assert (n, s) == (7, 25)
    back, _ = bed.read_bed_genotypes(bedp)
    np.testing.assert_array_equal(back, g)
    gm = mx.from_bed(bedp)
    assert gm.indiv == 7 and gm.snps == 25
    # .bim allele order: dense value = ALT dosage = hom-A2, so A1 must be
    # REF and A2 ALT — swapped columns allele-flip external consumers
    a1, a2 = open(bedp[:-4] + ".bim").readline().split()[4:6]
    assert (a1, a2) == ("A", "G")


def test_cli_ingest_vcf(tmp_path):
    from miraculix_tpu import cli

    g = bed.simulate_genotypes(5, 12, seed=1)
    code = {0: "0/0", 1: "0/1", 2: "1/1", 3: "./."}
    hdr = ("##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
           "FILTER\tINFO\tFORMAT\t"
           + "\t".join(f"I{i}" for i in range(5)) + "\n")
    lines = [hdr]
    for s in range(12):
        fields = "\t".join(code[int(v)] for v in g[:, s])
        lines.append(f"1\t{s+1}\t.\tA\tG\t.\t.\t.\tGT\t{fields}\n")
    p = tmp_path / "x.vcf"
    p.write_text("".join(lines))
    out = str(tmp_path / "p.npz")
    assert cli.main(["ingest", str(p), "-o", out]) == 0
    from miraculix_tpu.geno import load

    gm = load(out)
    assert gm.indiv == 5 and gm.snps == 12
