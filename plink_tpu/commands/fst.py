"""--fst <categorical pheno> [method=hudson|wc]: population differentiation.

Behavior reference: FstReport / FstThread (2.0/plink2_misc.cc:11233, :11190;
the code cites scikit-allel's allel/stats/fst.py as the readable form):
- Hudson (default): per variant and pop pair,
    dxy   = 1 - sum_a ct1_a*ct2_a / (n1*n2)          (allele counts)
    within_k = (n_k*(n_k-1)/2 - same_k) / (n_k*(n_k-1))
    numer = dxy - within_1 - within_2,  denom = dxy
  skipped when n_diff == 0 or any term is nan; summary FST is the ratio of
  sums over autosomal variants.
- Weir-Cockerham (method=wc): the a/b/c variance components (:12010-12045).
Per-pop genotype counts come from one multi-mask device counting pass.

Output: <out>.fst.summary (#POP1 POP2 <METHOD>_FST); with
'report-variants', one <out>.<POP1>.<POP2>.fst.var per pair (#CHROM POS ID
OBS_CT <METHOD>_FST, computable rows only).

chrX (ref :11643-11710): a second Hudson-only pass over chrX writes
<out>.x.* files; male genotypes are haploid (one allele each, male hets
dropped as missing).  Weir-Cockerham skips the chrX pass like the
reference.
"""

from __future__ import annotations

import itertools

import numpy as np

from ..dataset import Dataset
from ..ops.counts import geno_counts_multimask
from ..utils.chrom import X_CODE
from ..utils.fmt import g6
from ..utils.logging import RunLogger


def run_fst(ds: Dataset, cfg, log: RunLogger) -> None:
    args = list(cfg.fst)
    if not args:
        raise ValueError("--fst requires a categorical phenotype name")
    pheno_name = args[0]
    method = "hudson"
    report_variants = False
    for a in args[1:]:
        if a.startswith("method="):
            method = a.split("=", 1)[1].lower()
            if method not in ("hudson", "wc"):
                raise ValueError(f"--fst: unknown method '{method}'")
        elif a == "report-variants":
            report_variants = True
        else:
            raise NotImplementedError(f"--fst modifier '{a}' not supported yet")

    pc = ds.si.phenos.get(pheno_name)
    if pc is None:
        raise ValueError(f"--fst: phenotype '{pheno_name}' not found")
    if pc.kind == "cat":
        # category code 0 is the missing placeholder ('NONE')
        cats = [c for c in pc.categories[1:] if c]
        pop_names = sorted(cats)
        member = {
            name: (pc.data == (pc.categories.index(name))) & pc.nonmiss
            for name in pop_names
        }
    elif pc.kind == "cc":
        pop_names = ["CONTROL", "CASE"]
        member = {
            "CONTROL": (pc.data == 0) & pc.nonmiss,
            "CASE": (pc.data == 1) & pc.nonmiss,
        }
    else:
        raise ValueError("--fst: phenotype must be categorical or case/control")

    masks = [member[p] & ds.sample_mask for p in pop_names]
    auto = ds.vi.chr_info.is_autosomal(ds.vi.chrom)
    isx = ds.vi.chrom == X_CODE
    male = ds.male_mask()
    P = len(pop_names)

    passes = [("", "Autosomal", auto)]
    if method == "hudson" and (ds.variant_mask & isx).any():
        passes.append((".x", "chrX", isx))

    x_needed = len(passes) > 1 and male.any()
    # per-pop genotype counts [P][M, 4]; for chrX, male/nonmale split
    count_masks = list(masks)
    if x_needed:
        count_masks = [m & ~male for m in masks] + [m & male for m in masks]
    parts = [[] for _ in count_masks]
    for _, packed in ds.iter_packed_blocks():
        out = geno_counts_multimask(packed, ds.raw_sample_ct, count_masks)
        for g in range(len(count_masks)):
            parts[g].append(out[g])
    raw_cts = [np.concatenate(p).astype(np.float64) for p in parts]

    for suffix, prefix, chr_sel in passes:
        vmask = ds.variant_mask & chr_sel
        if not vmask.any():
            continue
        sel = np.flatnonzero(vmask)
        is_x_pass = suffix == ".x"
        # per-pop (ref allele ct, alt allele ct, nonmissing sample ct)
        refs, alts, obss, cts = [], [], [], []
        for g in range(P):
            if x_needed:
                c_nm = raw_cts[g][sel]
                c_m = raw_cts[P + g][sel]
                c = c_nm + c_m
            else:
                c_nm = c = raw_cts[g][sel]
                c_m = np.zeros_like(c_nm)
            if is_x_pass:
                # males haploid; male hets are missing (ref :11062-11067)
                refs.append(2 * c_nm[:, 0] + c_nm[:, 1] + c_m[:, 0])
                alts.append(2 * c_nm[:, 2] + c_nm[:, 1] + c_m[:, 2])
                obss.append(
                    c_nm[:, 0] + c_nm[:, 1] + c_nm[:, 2]
                    + c_m[:, 0] + c_m[:, 2]
                )
            else:
                refs.append(2 * c[:, 0] + c[:, 1])
                alts.append(2 * c[:, 2] + c[:, 1])
                obss.append(c[:, 0] + c[:, 1] + c[:, 2])
            cts.append(c)
        rows = []
        for i1, i2 in itertools.combinations(range(P), 2):
            ref1, alt1, obs1 = refs[i1], alts[i1], obss[i1]
            ref2, alt2, obs2 = refs[i2], alts[i2], obss[i2]
            n1 = ref1 + alt1
            n2 = ref2 + alt2
            with np.errstate(divide="ignore", invalid="ignore"):
                if method == "hudson":
                    n_same = ref1 * ref2 + alt1 * alt2
                    n_pairs = n1 * n2
                    n_diff = n_pairs - n_same
                    within1 = _half_within(ref1, alt1, n1)
                    within2 = _half_within(ref2, alt2, n2)
                    denom = n_diff / n_pairs
                    numer = denom - within1 - within2
                    valid = (n_diff > 0) & np.isfinite(numer) & (denom != 0)
                else:
                    numer, denom, valid = _wc_components(cts[i1], cts[i2])
                fst = np.nansum(numer[valid]) / np.nansum(denom[valid])
            rows.append((pop_names[i1], pop_names[i2], fst))
            if report_variants:
                tag = "HUDSON_FST" if method == "hudson" else "WC_FST"
                vp = (
                    f"{cfg.out}{suffix}.{pop_names[i1]}.{pop_names[i2]}"
                    ".fst.var"
                )
                with np.errstate(divide="ignore", invalid="ignore"):
                    per_var = numer / denom
                obs = (obs1 + obs2).astype(np.int64)
                vi = ds.vi
                with open(vp, "w") as f:
                    f.write(f"#CHROM\tPOS\tID\tOBS_CT\t{tag}\n")
                    # the reference prints every considered variant, rendering
                    # incomputable rows as nan (they are only excluded from
                    # the summary sums)
                    for k in range(len(sel)):
                        v = sel[k]
                        val = g6(per_var[k]) if valid[k] else "nan"
                        f.write(
                            f"{vi.chr_info.name(vi.chrom[v])}\t{vi.pos[v]}\t"
                            f"{vi.vid[v]}\t{obs[k]}\t{val}\n"
                        )

        if report_variants:
            npair = len(rows)
            log.log(
                f"{prefix} --fst: {npair} .fst.var file"
                f"{'s' if npair != 1 else ''} written."
            )
        path = cfg.out + suffix + ".fst.summary"
        tag = "HUDSON_FST" if method == "hudson" else "WC_FST"
        with open(path, "w") as f:
            f.write(f"#POP1\tPOP2\t{tag}\n")
            for a, b, v in rows:
                f.write(f"{a}\t{b}\t{g6(v)}\n")
        log.log(f"{prefix} --fst: Summary written to {path} .")


def _half_within(ref, alt, n):
    ssq = ref * ref + alt * alt
    n_pairs_x2 = n * (n - 1.0)
    n_same = (ssq - n) / 2.0
    n_diff = n_pairs_x2 / 2.0 - n_same
    return n_diff / n_pairs_x2


def _wc_components(c1, c2):
    """Weir-Cockerham a / (a+b+c) per variant (biallelic, REF allele term,
    ref :12010-12045)."""
    n1 = c1[:, 0] + c1[:, 1] + c1[:, 2]
    n2 = c2[:, 0] + c2[:, 1] + c2[:, 2]
    n_total = n1 + n2
    ref1 = 2 * c1[:, 0] + c1[:, 1]
    ref2 = 2 * c2[:, 0] + c2[:, 1]
    with np.errstate(divide="ignore", invalid="ignore"):
        n_total_recip = 1.0 / n_total
        n_bar = n_total / 2.0
        n_bar_m1_recip = 1.0 / (n_bar - 1.0)
        n_bar_div_n_c = n_bar / (
            n_total - (n1 * n1 + n2 * n2) * n_total_recip
        )
        p1 = ref1 / (2 * n1)
        p2 = ref2 / (2 * n2)
        p_bar = (ref1 + ref2) * 0.5 * n_total_recip
        s1 = p1 - p_bar
        s2 = p2 - p_bar
        s_squared = (n1 * s1 * s1 + n2 * s2 * s2) * n_total_recip * 2.0
        h_bar = (c1[:, 1] + c2[:, 1]) * n_total_recip
        pq = p_bar * (1.0 - p_bar)
        a = n_bar_div_n_c * (
            s_squared - (pq - 0.5 * s_squared - 0.25 * h_bar) * n_bar_m1_recip
        )
        b = n_bar * n_bar_m1_recip * (
            pq - 0.5 * s_squared - (0.5 - 0.5 * n_total_recip) * h_bar
        )
        c = h_bar * 0.5
        total_ref = ref1 + ref2
        # monomorphic-for-REF across both pops contributes nothing
        mono = (total_ref == 0) | (total_ref == 2 * n_total)
        a = np.where(mono, 0.0, a)
        b = np.where(mono, 0.0, b)
        c = np.where(mono, 0.0, c)
        numer = a
        denom = a + b + c
        valid = (denom != 0) & np.isfinite(numer)
    return numer, denom, valid
