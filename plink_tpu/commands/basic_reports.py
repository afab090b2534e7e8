"""--freq / --missing / --hardy / --geno-counts report commands.

Behavior references: WriteAlleleFreqs / WriteMissingnessReports / HardyReport
/ WriteGenoCounts in 2.0/plink2_misc.cc, with counts produced by the device
counting kernels (ops/counts.py) instead of LoadAlleleAndGenoCountsThread
(2.0/plink2_data.cc:2304).

Sex-chromosome conventions (matching the reference):
- chrX: females contribute 2 alleles, males 1 (het male X = "hethap",
  treated as missing); chrY: only males, haploid; MT: haploid for all.
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..ops.counts import GenoCounter, sample_missing_counts
from ..stats.hwe import hwe_exact_pvals
from ..utils.chrom import MT_CODE, X_CODE, Y_CODE
from ..utils.fmt import g6
from ..utils.logging import RunLogger


def _group_counts(ds: Dataset, founders_only: bool) -> dict[str, np.ndarray]:
    """Counts [M,4] for 'all', 'male', 'female' subsets of included samples
    (single device pass over all three masks)."""
    from ..ops.counts import geno_counts_multimask, geno_counts_multimask_all

    base = ds.sample_mask & (ds.founder_mask if founders_only else True)
    masks = [base, base & ds.male_mask(), base & ds.female_mask()]
    if ds.raw_variant_ct * ds.raw_sample_ct <= 1 << 22:
        # tiny panel: one tunnel round trip costs more than the whole count
        from ..ops.counts import _np_counts_masked

        pk = ds.all_packed()
        if pk is not None:
            padm = [np.pad(m.astype(np.float32),
                           (0, pk.shape[1] * 4 - m.size)) for m in masks]
            cat = [_np_counts_masked(pk, m) for m in padm]
            return {"all": cat[0], "male": cat[1], "female": cat[2]}
    # one scan over the device-resident block tensor = one dispatch + one
    # fetch for the whole file (per-block round trips dominate on a
    # tunnel-attached TPU)
    db = ds.device_blocked_packed()
    if db is not None:
        cat = geno_counts_multimask_all(
            db, ds.raw_sample_ct, masks, ds.raw_variant_ct
        )
        return {"all": cat[0], "male": cat[1], "female": cat[2]}
    parts: list[list[np.ndarray]] = [[], [], []]
    for _, packed in ds.iter_packed_blocks():
        out = geno_counts_multimask(packed, ds.raw_sample_ct, masks)
        for g in range(3):
            parts[g].append(out[g])
    cat = [np.concatenate(p) if p else np.zeros((0, 4), np.int64) for p in parts]
    return {"all": cat[0], "male": cat[1], "female": cat[2]}


def allele_counts_and_obs(ds: Dataset, founders_only: bool = False):
    """Per-variant (alt_allele_ct, obs_allele_ct) honoring X/Y/MT ploidy.

    Rules verified against LoadAlleleAndGenoCountsThread
    (2.0/plink2_data.cc:2540-2660):
    - chrX: nonmales (incl. unknown sex) diploid; males haploid with EVERY
      nonmissing male counted and a het male contributing half an ALT;
    - chrY: nonfemales only, haploid, het = half an ALT;
    - chrMT: all samples haploid, het = half an ALT.
    Returns (alt_ct, obs_ct) float64 [M] (half-allele granularity).
    """
    cts = _group_counts(ds, founders_only)
    chrom = ds.vi.chrom
    is_x = chrom == X_CODE
    is_y = chrom == Y_CODE
    is_mt = chrom == MT_CODE
    a = cts["all"].astype(np.float64)
    m = cts["male"].astype(np.float64)
    f = cts["female"].astype(np.float64)
    nm = a - m  # nonmales (females + unknown sex)
    nf = a - f  # nonfemales (males + unknown sex)
    # Diploid default.
    alt = a[:, 1] + 2 * a[:, 2]
    obs = 2 * (a[:, 0] + a[:, 1] + a[:, 2])
    # chrX: nonmales diploid + males haploid with het = 0.5.
    x_alt = (nm[:, 1] + 2 * nm[:, 2]) + (m[:, 2] + 0.5 * m[:, 1])
    x_obs = 2 * (nm[:, 0] + nm[:, 1] + nm[:, 2]) + (m[:, 0] + m[:, 1] + m[:, 2])
    alt = np.where(is_x, x_alt, alt)
    obs = np.where(is_x, x_obs, obs)
    # chrY: nonfemales haploid, het = 0.5.
    alt = np.where(is_y, nf[:, 2] + 0.5 * nf[:, 1], alt)
    obs = np.where(is_y, nf[:, 0] + nf[:, 1] + nf[:, 2], obs)
    # MT: all samples haploid, het = 0.5.
    alt = np.where(is_mt, a[:, 2] + 0.5 * a[:, 1], alt)
    obs = np.where(is_mt, a[:, 0] + a[:, 1] + a[:, 2], obs)
    return alt, obs


def alt_allele_freqs(ds: Dataset, founders_only: bool = True) -> np.ndarray:
    """ALT allele frequencies used by filters (--maf etc.; founders default,
    matching the reference's MAF-filter convention)."""
    alt, obs = allele_counts_and_obs(ds, founders_only)
    if ds.has_dosage:
        for v, (a_, o_) in dosage_counts_and_obs(ds, founders_only).items():
            alt[v], obs[v] = a_, o_
    # --af-pseudocount: inferred freq = (j+x)/(j+k+2x) (ref
    # 2.0/plink2_help.cc:2295; affects filters, not the --freq report)
    pc = float(getattr(ds, "af_pseudocount", 0.0) or 0.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.where(obs > 0, (alt + pc) / (obs + 2 * pc), np.nan)
    fo = getattr(ds, "freq_override", None)
    if fo is not None:
        out = np.where(np.isfinite(fo), fo, out)
    return out


def dosage_counts_and_obs(ds: Dataset, founders_only: bool):
    """Dosage-aware (alt_dosage_sum, obs_allele_ct) for variants carrying a
    dosage track (LoadAlleleAndGenoCounts dosage branch: a sample counts as
    observed when it has a dosage entry or a nonmissing hardcall).
    Autosomal accounting only; returns overrides dict {v: (alt, obs)}."""
    smask = ds.sample_mask & (ds.founder_mask if founders_only else True)
    vr = ds.reader.header.vrtypes
    out = {}
    for v in np.flatnonzero(ds.variant_mask & ((vr & 0x60) != 0)):
        d = ds.dosage_row(int(v))[: ds.raw_sample_ct][smask]
        fin = np.isfinite(d)
        out[int(v)] = (float(d[fin].sum()), 2.0 * int(fin.sum()))
    return out


def _provref_strs(ds: Dataset):
    hdr = ds.reader.header
    if hdr.all_provisional:
        return "\tPROVISIONAL_REF?", lambda i: "\tY"
    if hdr.provisional_ref is not None:
        pr = hdr.provisional_ref
        # maybeprovref semantics: the column appears only when at least one
        # INCLUDED variant has a provisional REF (ref ProvrefCol,
        # 2.0/plink2_common.h:1549-1561)
        if bool(pr[ds.variant_mask].any()):
            return "\tPROVISIONAL_REF?", lambda i: "\tY" if pr[i] else "\tN"
        return "", lambda i: ""
    if ds.reader.header.mode == 0x01:
        return "\tPROVISIONAL_REF?", lambda i: "\tY"
    return "", lambda i: ""


def ma_alt_counts(ds: Dataset, v: int, alt_total: float,
                  smask: np.ndarray) -> np.ndarray:
    """Per-ALT allele counts for a multiallelic variant from the sparse aux
    patches (host-side corrections on top of the dense ALT1-collapsed base
    counting; diploid chromosomes).  alt_total = total ALT dosage over the
    included samples."""
    n_alt = int(ds.allele_cts()[v]) - 1
    cts = np.zeros(n_alt, np.float64)
    cts[0] = alt_total
    ids01, a01, ids10, lo10, hi10 = ds.ma_patch(v)
    if ids01.size:
        keep = smask[ids01]
        for a in a01[keep]:
            cts[0] -= 1.0
            cts[a - 1] += 1.0
    if ids10.size:
        keep = smask[ids10]
        for lo, hi in zip(lo10[keep], hi10[keep]):
            cts[0] -= 2.0
            cts[lo - 1] += 1.0
            cts[hi - 1] += 1.0
    return cts


def write_freq(ds: Dataset, out_prefix: str, log: RunLogger,
               founders_only: bool = True, zs: bool = False) -> str:
    """--freq -> <out>.afreq[.zst]."""
    alt, obs = allele_counts_and_obs(ds, founders_only)
    if ds.has_dosage:
        for v, (a_, o_) in dosage_counts_and_obs(ds, founders_only).items():
            alt[v], obs[v] = a_, o_
    path = out_prefix + ".afreq"
    ci = ds.vi.chr_info
    prov_hdr, prov_fn = _provref_strs(ds)
    from ..io.compress import open_out

    fh, path = open_out(path, zs)
    with fh:
        fh.write(f"#CHROM\tID\tREF\tALT{prov_hdr}\tALT_FREQS\tOBS_CT\n")
        ma = ds.multiallelic_mask()
        smask_f = ds.sample_mask & (
            ds.founder_mask if founders_only else True
        )
        for i in np.flatnonzero(ds.variant_mask):
            if ma[i]:
                cts = ma_alt_counts(ds, int(i), alt[i], smask_f)
                with np.errstate(invalid="ignore"):
                    frs = cts / obs[i] if obs[i] > 0 else np.full(
                        len(cts), np.nan)
                fr_str = ",".join(g6(x) for x in frs)
            else:
                fr = alt[i] / obs[i] if obs[i] > 0 else np.nan
                fr_str = g6(fr)
            fh.write(
                f"{ci.name(int(ds.vi.chrom[i]))}\t{ds.vi.vid[i]}\t{ds.vi.ref[i]}\t{ds.vi.alt[i]}"
                f"{prov_fn(i)}\t{fr_str}\t{int(obs[i])}\n"
            )
    log.log(f"--freq: Allele frequencies ({'founders' if founders_only else 'all samples'}) "
            f"written to {path} .")
    return path


def write_missing(
    ds: Dataset, out_prefix: str, log: RunLogger, sample: bool = True,
    variant: bool = True, zs: bool = False
) -> list[str]:
    """--missing -> <out>.vmiss / <out>.smiss."""
    out_paths = []
    ci = ds.vi.chr_info
    base = ds.sample_mask
    male = base & ds.male_mask()
    n_all = int(base.sum())
    n_male = int(male.sum())
    if variant:
        cts = ds.geno_counts(founders_only=False)
        # chrY OBS_CT counts males only; missing among males.
        gc_male = None
        if (ds.vi.chrom == Y_CODE).any():
            gc = GenoCounter(ds.raw_sample_ct, male.astype(np.float32))
            for _, packed in ds.iter_packed_blocks():
                gc.add_block(packed)
            gc_male = gc.result()
        path = out_prefix + ".vmiss"
        from ..io.compress import open_out

        fh, path = open_out(path, zs)
        with fh:
            fh.write("#CHROM\tID\tMISSING_CT\tOBS_CT\tF_MISS\n")
            for i in np.flatnonzero(ds.variant_mask):
                if gc_male is not None and ds.vi.chrom[i] == Y_CODE:
                    miss, obs = int(gc_male[i, 3]), n_male
                else:
                    miss, obs = int(cts[i, 3]), n_all
                fm = miss / obs if obs else np.nan
                fh.write(f"{ci.name(int(ds.vi.chrom[i]))}\t{ds.vi.vid[i]}\t{miss}\t{obs}\t{g6(fm)}\n")
        out_paths.append(path)
    if sample:
        vmask = ds.variant_mask.astype(np.float32)
        vmask_nony = vmask * (ds.vi.chrom != Y_CODE)
        # Stream per-sample missing counts (two masks: non-Y for everyone,
        # Y-only for males).
        miss_nony = np.zeros(ds.raw_sample_ct, dtype=np.int64)
        miss_y = np.zeros(ds.raw_sample_ct, dtype=np.int64)
        has_y = bool((ds.vi.chrom == Y_CODE).any())
        for vstart, packed in ds.iter_packed_blocks():
            sl = slice(vstart, vstart + packed.shape[0])
            miss_nony += sample_missing_counts(packed, ds.raw_sample_ct, vmask_nony[sl])
            if has_y:
                miss_y += sample_missing_counts(
                    packed, ds.raw_sample_ct, (vmask * (ds.vi.chrom == Y_CODE))[sl]
                )
        vct_nony = int(vmask_nony.sum())
        vct_all = int(vmask.sum())
        path = out_prefix + ".smiss"
        pheno_names = list(ds.si.phenos)
        from ..io.compress import open_out

        fh, path = open_out(path, zs)
        with fh:
            pheno_hdr = "".join(f"\t{n}" for n in pheno_names)
            fh.write(f"{ds.si.id_header()}{pheno_hdr}\tMISSING_CT\tOBS_CT\tF_MISS\n")
            for s in np.flatnonzero(ds.sample_mask):
                if ds.si.sex[s] == 1 and has_y:
                    miss, obs = int(miss_nony[s] + miss_y[s]), vct_all
                else:
                    miss, obs = int(miss_nony[s]), vct_nony
                fm = miss / obs if obs else np.nan
                # Per-phenotype missingness indicator: Y = missing, N = present.
                pcols = "".join(
                    "\tN" if ds.si.phenos[n].nonmiss[s] else "\tY" for n in pheno_names
                )
                fh.write(f"{ds.si.id_str(s)}{pcols}\t{miss}\t{obs}\t{g6(fm)}\n")
        out_paths.append(path)
    log.log(f"--missing: Sample/variant missing data report(s) written to "
            f"{' + '.join(out_paths)} .")
    return out_paths


def write_hardy(
    ds: Dataset, out_prefix: str, log: RunLogger, midp: bool = False,
    founders_only: bool = True, zs: bool = False
) -> str:
    """--hardy -> <out>.hardy (autosomal) and, when chrX variants are
    present, <out>.hardy.x with the Graffelman-Weir female+male exact test
    (ref: HardyReport chrX path + ComputeHweXLnPvals, 2.0/plink2_misc.cc)."""
    base = ds.sample_mask & (ds.founder_mask if founders_only else True)
    female = base & ds.female_mask()
    male = base & ds.male_mask()
    gc_all = GenoCounter(ds.raw_sample_ct, base.astype(np.float32))
    need_female = bool((ds.vi.chrom == X_CODE).any())
    gc_f = GenoCounter(ds.raw_sample_ct, female.astype(np.float32)) if need_female else None
    gc_m = GenoCounter(ds.raw_sample_ct, male.astype(np.float32)) if need_female else None
    for _, packed in ds.iter_packed_blocks():
        gc_all.add_block(packed)
        if gc_f:
            gc_f.add_block(packed)
            gc_m.add_block(packed)
    cts = gc_all.result()
    cts_f = gc_f.result() if gc_f else None
    cts_m = gc_m.result() if gc_m else None
    is_x = ds.vi.chrom == X_CODE
    use = np.where(is_x[:, None], cts_f if cts_f is not None else cts, cts)
    hom_ref, het, hom_alt = use[:, 0], use[:, 1], use[:, 2]
    pvals = hwe_exact_pvals(hom_ref, het, hom_alt, midp=midp)
    # extreme-regime escalation: tails that underflow f64 re-compute in
    # ln space with extended-precision factorials and print via the
    # lntoa_g mantissa-x-10^-exp form, distinguishing 1e-325 from
    # 1e-1000000 (ref HweLnP + plink2_highprec dd tail sums,
    # 2.0/include/plink2_highprec.h:36-60, 2.0/README.md:96-100)
    ext_lnp: dict[int, float] = {}
    ext_idx = np.flatnonzero(np.isfinite(pvals) & (pvals < 1e-290))
    if ext_idx.size:
        from ..stats.hwe import hwe_exact_lnpvals
        from ..utils.fmt import logp_to_str

        lnv = hwe_exact_lnpvals(
            hom_ref[ext_idx], het[ext_idx], hom_alt[ext_idx], midp=midp)
        ext_lnp = {int(i): float(v) for i, v in zip(ext_idx, lnv)}
    path = out_prefix + ".hardy"
    ci = ds.vi.chr_info
    from ..io.compress import open_out

    fh, path = open_out(path, zs)
    with fh:
        fh.write("#CHROM\tID\tA1\tAX\tHOM_A1_CT\tHET_A1_CT\tTWO_AX_CT\t"
                 "O(HET_A1)\tE(HET_A1)\t"
                 + ("MIDP" if midp else "P") + "\n")
        for i in np.flatnonzero(ds.variant_mask):
            if ds.vi.chrom[i] in (X_CODE, Y_CODE, MT_CODE):
                # Main report is autosomal; chrX uses the separate .hardy.x
                # female+male test (HardyReport, plink2_misc.cc:5696+; TODO).
                continue
            n = int(hom_ref[i] + het[i] + hom_alt[i])
            # Reproduce the reference's fp expression order for bit-identical
            # output (plink2_misc.cc:5648-5660): recip multiply, then
            # E = maj2 * (1 - maj2*0.5).
            recip = 1.0 / n if n else np.nan
            ohet = float(het[i]) * recip if n else np.nan
            if n and hom_ref[i] == n:
                ehet_str = "0"
            elif n:
                maj2 = float(hom_ref[i] * 2 + het[i]) * recip
                ehet_str = g6(maj2 * (1.0 - maj2 * 0.5))
            else:
                ehet_str = "NA"
            if int(i) in ext_lnp:
                from ..utils.fmt import logp_to_str

                p_str = logp_to_str(ext_lnp[int(i)])
            else:
                p_str = g6(pvals[i])
            fh.write(
                f"{ci.name(int(ds.vi.chrom[i]))}\t{ds.vi.vid[i]}\t{ds.vi.ref[i]}\t{ds.vi.alt[i]}"
                f"\t{int(hom_ref[i])}\t{int(het[i])}\t{int(hom_alt[i])}"
                f"\t{g6(ohet)}\t{ehet_str}\t{p_str}\n"
            )
    log.log(
        f"--hardy{' midp' if midp else ''}: Autosomal Hardy-Weinberg report "
        f"({'all samples' if not founders_only else 'founders only'}) written to {path} ."
    )
    x_idx = np.flatnonzero(ds.variant_mask & is_x)
    if x_idx.size and cts_f is not None:
        from ..stats.hwe_x import hwe_x_exact_pvals

        fa = cts_f[x_idx, 0]
        fh = cts_f[x_idx, 1]
        fb = cts_f[x_idx, 2]
        ma = cts_m[x_idx, 0]
        mb = cts_m[x_idx, 2]
        px = hwe_x_exact_pvals(fa, fh, fb, ma, mb, midp=midp)
        # extreme-regime escalation, as on the autosomal path
        ext_x: dict[int, float] = {}
        for k in np.flatnonzero(np.isfinite(px) & (px < 1e-290)):
            from ..stats.hwe_x import hwe_x_exact_lnpval

            ext_x[int(k)] = hwe_x_exact_lnpval(
                int(fa[k]), int(fh[k]), int(fb[k]), int(ma[k]), int(mb[k]),
                midp=midp)
        from ..utils.fmt import logp_to_str

        xpath = out_prefix + ".hardy.x"
        with open(xpath, "w") as fhx:
            fhx.write(
                "#CHROM\tID\tA1\tAX\tFEMALE_HOM_A1_CT\tFEMALE_HET_A1_CT\t"
                "FEMALE_TWO_AX_CT\tMALE_A1_CT\tMALE_AX_CT\tO(FEMALE_HET_A1)\t"
                "E(FEMALE_HET_A1)\tFEMALE_A1_FREQ\tMALE_A1_FREQ\t"
                + ("MIDP" if midp else "P") + "\n"
            )
            for k, i in enumerate(x_idx):
                n_f = int(fa[k] + fh[k] + fb[k])
                n_m = int(ma[k] + mb[k])
                recip = 1.0 / n_f if n_f else np.nan
                ohet = float(fh[k]) * recip if n_f else np.nan
                if n_f and fa[k] == n_f:
                    ehet_str = "0"
                elif n_f:
                    a1x2 = float(fa[k] * 2 + fh[k]) * recip
                    ehet_str = g6(a1x2 * (1.0 - a1x2 * 0.5))
                else:
                    ehet_str = "NA"
                ffreq = (
                    float(2 * fa[k] + fh[k]) / (2 * n_f) if n_f else np.nan
                )
                mfreq = float(ma[k]) / n_m if n_m else np.nan
                fhx.write(
                    f"{ci.name(int(ds.vi.chrom[i]))}\t{ds.vi.vid[i]}\t"
                    f"{ds.vi.ref[i]}\t{ds.vi.alt[i]}\t{int(fa[k])}\t{int(fh[k])}\t"
                    f"{int(fb[k])}\t{int(ma[k])}\t{int(mb[k])}\t{g6(ohet)}\t"
                    f"{ehet_str}\t{g6(ffreq)}\t{g6(mfreq)}\t"
                    + (logp_to_str(ext_x[k]) if k in ext_x else g6(px[k]))
                    + "\n"
                )
        log.log(
            f"--hardy{' midp' if midp else ''}: chrX Hardy-Weinberg report "
            f"({'all samples' if not founders_only else 'founders only'}) "
            f"written to {xpath} ."
        )
    return path


def write_geno_counts(ds: Dataset, out_prefix: str, log: RunLogger,
                      zs: bool = False) -> str:
    """--geno-counts -> <out>.gcount.

    Hethap handling verified against the reference (mixed-chromosome panel):
    chrX male hets and chrY/MT hets count as MISSING; chrY rows cover
    nonfemales only.
    """
    cts = _group_counts(ds, founders_only=False)
    a, m, f = cts["all"], cts["male"], cts["female"]
    nf = a - f
    ma = ds.multiallelic_mask()
    path = out_prefix + ".gcount"
    ci = ds.vi.chr_info
    prov_hdr, prov_fn = _provref_strs(ds)
    from ..io.compress import open_out

    fh, path = open_out(path, zs)
    with fh:
        fh.write(
            f"#CHROM\tID\tREF\tALT{prov_hdr}\tHOM_REF_CT\tHET_REF_ALT_CTS\tTWO_ALT_GENO_CTS"
            "\tHAP_REF_CT\tHAP_ALT_CTS\tMISSING_CT\n"
        )
        for i in np.flatnonzero(ds.variant_mask):
            chrom = int(ds.vi.chrom[i])
            hom_ref, het, hom_alt, miss = (int(x) for x in a[i])
            hap_ref = hap_alt = 0
            if chrom == MT_CODE:
                hap_ref, hap_alt = hom_ref, hom_alt
                miss += het
                hom_ref = hom_alt = het = 0
            elif chrom == Y_CODE:
                hap_ref, hap_alt = int(nf[i, 0]), int(nf[i, 2])
                miss = int(nf[i, 3]) + int(nf[i, 1])  # hets -> missing
                hom_ref = hom_alt = het = 0
            elif chrom == X_CODE:
                hap_ref, hap_alt = int(m[i, 0]), int(m[i, 2])
                hom_ref -= hap_ref
                hom_alt -= hap_alt
                het -= int(m[i, 1])  # male hets -> missing
                miss += int(m[i, 1])
            if ma[i]:
                # multiallelic expansion: per-ALT het counts, colex-ordered
                # ALTxALTy pair counts, per-ALT hap counts (WriteGenoCounts
                # multiallelic branch, 2.0/plink2_misc.cc)
                n_alt = int(ds.allele_cts()[i]) - 1
                smask_i = ds.sample_mask
                ids01, a01, ids10, lo10, hi10 = ds.ma_patch(int(i))
                het_cts = np.zeros(n_alt, np.int64)
                het_cts[0] = het
                pair_cts = np.zeros((n_alt + 1, n_alt + 1), np.int64)
                pair_cts[1, 1] = hom_alt
                if ids01.size:
                    for x in a01[smask_i[ids01]]:
                        het_cts[0] -= 1
                        het_cts[x - 1] += 1
                if ids10.size:
                    keep = smask_i[ids10]
                    for lo, hi in zip(lo10[keep], hi10[keep]):
                        pair_cts[1, 1] -= 1
                        pair_cts[lo, hi] += 1
                het_str = ",".join(str(x) for x in het_cts)
                # colex order: (1,1),(1,2),(2,2),(1,3),(2,3),(3,3)...
                pairs = []
                for hi_ in range(1, n_alt + 1):
                    for lo_ in range(1, hi_ + 1):
                        pairs.append(int(pair_cts[lo_, hi_]))
                two_str = ",".join(str(x) for x in pairs)
                hap_str = ",".join(
                    str(hap_alt if k == 0 else 0) for k in range(n_alt)
                )
                fh.write(
                    f"{ci.name(chrom)}\t{ds.vi.vid[i]}\t{ds.vi.ref[i]}\t"
                    f"{ds.vi.alt[i]}{prov_fn(i)}\t{hom_ref}\t{het_str}\t"
                    f"{two_str}\t{hap_ref}\t{hap_str}\t{miss}\n"
                )
                continue
            fh.write(
                f"{ci.name(chrom)}\t{ds.vi.vid[i]}\t{ds.vi.ref[i]}\t{ds.vi.alt[i]}{prov_fn(i)}"
                f"\t{hom_ref}\t{het}\t{hom_alt}\t{hap_ref}\t{hap_alt}\t{miss}\n"
            )
    log.log(f"--geno-counts: Genotype counts written to {path} .")
    return path
