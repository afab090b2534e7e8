"""--score: polygenic scoring.

Behavior reference: ScoreReport / CalcScoreThread
(2.0/plink2_matrix_calc.cc:6892, :6467) and the .sscore writer (:8500-8620):
- flag grammar: --score <file> [varid-col] [allele-col] [score-col]
  ['header' | 'header-read'] ['no-mean-imputation'] (1-based columns,
  defaults 1 2 3);
- per-sample: ALLELE_CT = denom_base - missing alleles; with
  mean-imputation (default) missing genotypes contribute
  weight * 2 * named_allele_freq and SCORE_AVG divides by the full
  denom_base, with 'no-mean-imputation' by ALLELE_CT;
- default columns: #[FID\t]IID, phenotype values, ALLELE_CT,
  NAMED_ALLELE_DOSAGE_SUM, SCORE1_AVG.

Sex-chromosome allele accounting (:8389) not yet implemented (autosomal
diploid assumed); multiallelic variants unsupported.
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..ops.counts import sample_plane_weighted
from ..utils.fmt import g6
from ..utils.logging import RunLogger
from .basic_reports import alt_allele_freqs


def _parse_score_args(args: tuple):
    path = args[0]
    nums = []
    header = False
    header_read = False
    no_meanimpute = False
    for a in args[1:]:
        if a == "header":
            header = True
        elif a == "header-read":
            header = header_read = True
        elif a == "no-mean-imputation":
            no_meanimpute = True
        elif a in ("center", "variance-standardize", "dominant", "recessive",
                   "list-variants"):
            raise NotImplementedError(f"--score modifier '{a}' not supported yet")
        elif a.isdigit():
            nums.append(int(a))
        else:
            raise ValueError(f"--score: unrecognized modifier '{a}'")
    while len(nums) < 3:
        nums.append([1, 2, 3][len(nums)])
    return path, nums[0], nums[1], nums[2], header, header_read, no_meanimpute


def score_report(ds: Dataset, cfg, log: RunLogger) -> None:
    path, vcol, acol, scol, header, header_read, no_meanimpute = _parse_score_args(
        cfg.score
    )
    score_name = "SCORE1"
    rows = []
    with open(path) as f:
        lines = [l.split() for l in f.read().splitlines() if l.strip()]
    if header_read and lines:
        score_name = lines[0][scol - 1]
    if header:
        lines = lines[1:]
    vid_to_idx = {str(v): i for i, v in enumerate(ds.vi.vid)}
    w = np.zeros(ds.raw_variant_ct)
    named_is_alt = np.zeros(ds.raw_variant_ct, bool)
    in_score = np.zeros(ds.raw_variant_ct, bool)
    missed = 0
    for t in lines:
        vid, allele, wt = t[vcol - 1], t[acol - 1], float(t[scol - 1])
        i = vid_to_idx.get(vid)
        if i is None or not ds.variant_mask[i]:
            missed += 1
            continue
        alt1 = str(ds.vi.alt[i]).split(",", 1)[0]
        if allele == alt1:
            named_is_alt[i] = True
        elif allele != str(ds.vi.ref[i]):
            missed += 1
            continue
        w[i] = wt
        in_score[i] = True

    freqs = np.nan_to_num(alt_allele_freqs(ds, founders_only=True))
    named_freq = np.where(named_is_alt, freqs, 1.0 - freqs)
    scored_ct = int(in_score.sum())
    denom_base = 2 * scored_ct

    n = ds.raw_sample_ct
    score_sum = np.zeros(n)
    dosage_sum = np.zeros(n)
    miss_ct2 = np.zeros(n)
    for v0, packed in ds.iter_packed_blocks():
        vct = packed.shape[0]
        sl = slice(v0, v0 + vct)
        sel = in_score[sl].astype(np.float64)
        wv = w[sl] * sel
        ia = named_is_alt[sl]
        z = np.zeros(vct)
        # score coefs per genotype class; missing -> mean-imputed term
        c_ref = np.where(ia, 0.0, 2.0) * wv
        c_het = wv
        c_alt = np.where(ia, 2.0, 0.0) * wv
        c_mis = (0.0 if no_meanimpute else 1.0) * wv * 2.0 * named_freq[sl]
        score_sum += sample_plane_weighted(
            packed, n, np.stack([c_ref, c_het, c_alt, c_mis], axis=1)
        )
        # named-allele dosage over nonmissing
        d_ref = np.where(ia, 0.0, 2.0) * sel
        d_alt = np.where(ia, 2.0, 0.0) * sel
        dosage_sum += sample_plane_weighted(
            packed, n, np.stack([d_ref, sel, d_alt, z], axis=1)
        )
        miss_ct2 += sample_plane_weighted(
            packed, n, np.stack([z, z, z, 2.0 * sel], axis=1)
        )

    nallele = denom_base - miss_ct2
    denom = nallele if no_meanimpute else np.full(n, float(denom_base))
    with np.errstate(divide="ignore", invalid="ignore"):
        avg = np.where(denom > 0, score_sum / denom, np.nan)

    inc = np.flatnonzero(ds.sample_mask)
    si = ds.si
    use_fid = si.has_fid and any(str(si.fid[i]) != "0" for i in inc)
    out = cfg.out + ".sscore"
    pheno_items = list(si.phenos.items())
    with open(out, "w") as f:
        hdr = "#FID\tIID" if use_fid else "#IID"
        for pname, _ in pheno_items:
            hdr += f"\t{pname}"
        f.write(hdr + f"\tALLELE_CT\tNAMED_ALLELE_DOSAGE_SUM\t{score_name}_AVG\n")
        for i in inc:
            idp = f"{si.fid[i]}\t{si.iid[i]}" if use_fid else str(si.iid[i])
            pvals = ""
            for _, pc in pheno_items:
                if not pc.nonmiss[i]:
                    pvals += "\tNA"
                elif pc.kind == "cc":
                    pvals += f"\t{int(pc.data[i]) + 1}"
                else:
                    pvals += f"\t{g6(pc.data[i])}"
            f.write(
                f"{idp}{pvals}\t{int(round(nallele[i]))}\t"
                f"{int(round(dosage_sum[i]))}\t{g6(avg[i])}\n"
            )
    if missed:
        log.log(f"Warning: --score: {missed} line(s) skipped (unmatched ID/allele).")
    log.log(f"--score: Results written to {out} .")
