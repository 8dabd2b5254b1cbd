"""The whole workflow on one simulated dataset: QC -> GRM (+ GCTA
fileset) -> REML h2 -> GBLUP -> marker backsolve -> prediction of new
animals -> LOCO mixed-model GWAS -> PCA -> LD scores.

Run from the repo root:  python examples/full_pipeline.py
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import miraculix_tpu as mx
from miraculix_tpu import gblup, qc
from miraculix_tpu.io import bed
from miraculix_tpu.io.grm_io import write_gcta_grm

work = tempfile.mkdtemp(prefix="mx_pipeline_")
# env knobs so the test suite can smoke-run this at tiny shapes
N = int(os.environ.get("MX_EX_N", 500))
N_NEW = int(os.environ.get("MX_EX_NEW", 120))
SNPS = int(os.environ.get("MX_EX_SNPS", 20_000))

# --- a deliberately messy panel: missing calls + rare variants ---------
g_all = bed.simulate_genotypes(N + N_NEW, SNPS, seed=1, missing_rate=0.02,
                               maf_range=(0.005, 0.5))
raw = os.path.join(work, "raw.bed")
bed.write_bed(raw, g_all[:N])

# --- 1. QC --------------------------------------------------------------
clean = os.path.join(work, "clean.bed")
keep_s, keep_i = qc.qc_filter(raw, clean, maf=0.01, geno=0.1, mind=0.1)
print(f"QC: kept {keep_s.sum()}/{SNPS} SNPs, {keep_i.sum()}/{N} indiv")

# --- 2. GRM + GCTA interchange ------------------------------------------
gm = mx.from_bed(clean)
grm_mat = np.asarray(mx.grm(gm, scale=True))
write_gcta_grm(os.path.join(work, "panel"), grm_mat, gm.snps)
unrelated = qc.rel_cutoff(grm_mat, cutoff=0.35)
print(f"GRM {grm_mat.shape[0]}^2 written (GCTA fileset); "
      f"{unrelated.sum()} pass --rel-cutoff 0.35")

# --- 3. phenotypes + REML h2 --------------------------------------------
geno_clean, _ = bed.read_bed_genotypes(clean)
y, bv = gblup.simulate_phenotypes(geno_clean, h2=0.6, n_qtl=500, seed=2)
h2_hat, det = gblup.estimate_h2_reml(gm, y, n_probes=16, seed=3)
print(f"AI-REML: h2 = {h2_hat:.3f} (SE {det['se_h2']:.3f}, "
      f"true 0.6, {det['iterations']} AI steps)")

# --- 4. GBLUP + accuracy -------------------------------------------------
res = gblup.gblup(gm, y, h2=h2_hat, n_pcs=5, tol=1e-6)
print(f"GBLUP: cor(EBV, true BV) = "
      f"{np.corrcoef(res.g_hat, bv)[0, 1]:.3f}")

# --- 5. backsolve + indirect prediction of NEW animals -------------------
alpha = gblup.snp_effects(gm, res)
g_new = g_all[N:][:, keep_s]
g_new = np.where(g_new == 3, 0, g_new)
gm_new = mx.from_dense(g_new)
pred = gblup.predict(gm_new, alpha, np.asarray(gm.freq))
# true BVs of the new animals under the same QTL model are unknown here
# (simulate_phenotypes draws its own QTLs); report the sanity stats
print(f"indirect predictions for {N_NEW} new animals: "
      f"sd {pred.std():.3f} (training EBV sd {res.g_hat.std():.3f})")

# --- 6. LOCO mixed-model GWAS -------------------------------------------
chrom = np.repeat(np.arange(1, 11), int(np.ceil(gm.snps / 10)))[: gm.snps]
scan = mx.gwas_mixed_loco(gm, y, chrom, h2=h2_hat, n_gamma_snps=24,
                          tol=1e-6)
top = np.argsort(scan.p)[:5]
print(f"LOCO GWAS: lambda-ish gamma {scan.gamma:.3f}, top hits {list(top)}")

# --- 7. population structure: top PCs (gcta --pca role) ------------------
w_pc, pcs = gblup.randomized_grm_pca(gm, k=5, seed=0)
print(f"PCA: top-5 GRM eigenvalues {np.round(w_pc / float(gm.sigma2), 3)}")

# --- 8. LD scores (gcta --ld-score role) ---------------------------------
lds = mx.ld_score(gm, window=256)
print(f"LD scores: mean {lds.mean():.2f}, max {lds.max():.2f} "
      f"(window 256, adjusted r^2)")
print(f"pipeline artifacts in {work}")
