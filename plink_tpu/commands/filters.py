"""Sample/variant filters (ref: 2.0/plink2_filter.cc).

Each filter narrows ds.sample_mask / ds.variant_mask; application order
follows the reference's fixed Plink2Core sequence (2.0/plink2.cc:1325-1770):
sample filters (keep/remove, mind) before variant filters
(extract/exclude/chr, geno, maf/mac, hwe).
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..ops.counts import sample_missing_counts
from ..stats.hwe import hwe_exact_thresh
from ..utils.logging import RunLogger
from .basic_reports import allele_counts_and_obs


def keep_remove_samples(ds: Dataset, path: str, keep: bool, log: RunLogger) -> None:
    """--keep / --remove: FID IID (or IID-only) files."""
    wanted_raw = []
    with open(path) as f:
        for ln in f:
            t = ln.split()
            if not t or t[0].startswith("#"):
                continue
            wanted_raw.append(t)
    # Match on FID+IID when two columns present, else IID alone.
    two_col = {f"{t[0]}\t{t[1]}" for t in wanted_raw if len(t) >= 2}
    one_col = {t[0] for t in wanted_raw if len(t) == 1}
    fid_iid = np.array([f"{f}\t{i}" for f, i in zip(ds.si.fid, ds.si.iid)], dtype=object)
    hit = np.isin(fid_iid, list(two_col)) | np.isin(ds.si.iid, list(one_col))
    before = ds.sample_ct
    ds.sample_mask &= hit if keep else ~hit
    ds.invalidate_counts()
    log.log(
        f"--{'keep' if keep else 'remove'}: {ds.sample_ct} sample"
        f"{'s' if ds.sample_ct != 1 else ''} remaining (was {before})."
    )


def _interval_hit(ds: Dataset, files, one_based: bool) -> np.ndarray:
    """Variant membership in any interval of the given bed0/bed1 files
    (bed1/range: pos in [start, end]; bed0: pos in [start+1, end],
    matching the reference's interval handling in plink2_set.cc)."""
    hit = np.zeros(ds.raw_variant_ct, bool)
    ci = ds.vi.chr_info
    for path in files:
        with open(path) as f:
            for ln in f:
                t = ln.split()
                if len(t) < 3 or t[0].lower() in ("chr", "#chrom"):
                    continue
                try:
                    start, end = int(t[1]), int(t[2])
                except ValueError:
                    continue
                code = ci.code(t[0])
                lo = start if one_based else start + 1
                hit |= (
                    (ds.vi.chrom == code)
                    & (ds.vi.pos >= lo)
                    & (ds.vi.pos <= end)
                )
    return hit


def _token_hit(ds: Dataset, files) -> np.ndarray:
    ids = set()
    for path in files:
        with open(path) as f:
            for ln in f:
                ids.update(ln.split())
    return np.isin(ds.vi.vid.astype(str), list(ids))


def extract_exclude_variants(ds: Dataset, args, extract: bool,
                             log: RunLogger) -> None:
    """--extract / --exclude: variant-ID token files, or interval files with
    a leading bed0/bed1/range modifier (plink2_filter.cc token path,
    plink2_set.cc interval path)."""
    if isinstance(args, str):
        args = (args,)
    mode = None
    if args and args[0] in ("bed0", "bed1", "range"):
        mode, args = args[0], args[1:]
    flag = "extract" if extract else "exclude"
    if mode is None:
        hit = _token_hit(ds, args)
        tag = f"--{flag}"
    else:
        hit = _interval_hit(ds, args, one_based=mode != "bed0")
        tag = f"--{flag} {mode}"
    ds.variant_mask &= hit if extract else ~hit
    log.log(f"{tag}: {ds.variant_ct} variants remaining.")


def bp_space_filter(ds: Dataset, min_bp: int, log: RunLogger) -> None:
    """--bp-space: greedy per-chromosome thinning keeping variants at
    least min_bp apart (ref plink2 --bp-space; equivalent to VCFtools
    --thin)."""
    keep = np.zeros(ds.raw_variant_ct, bool)
    chrom = ds.vi.chrom
    pos = ds.vi.pos
    last_chrom = None
    last_pos = None
    for v in np.flatnonzero(ds.variant_mask):
        c = int(chrom[v])
        if c != last_chrom or last_pos is None or \
                int(pos[v]) - last_pos >= min_bp:
            keep[v] = True
            last_chrom = c
            last_pos = int(pos[v])
    removed = int(ds.variant_ct - keep.sum())
    ds.variant_mask &= keep
    log.log(f"--bp-space: {removed} variants removed "
            f"({ds.variant_ct} remaining).")


def mach_r2_filter(ds: Dataset, min_r2: float, max_r2: float,
                   log: RunLogger) -> None:
    """--mach-r2-filter: MaCH imputation-quality metric bounds (defaults
    0.1 / 2.0).  mach_r2 = 2 * minimac3_r2 with the unphased hap
    embedding l = r = d/2 (MultiallelicDiploidMachR2,
    2.0/include/pgenlib_misc.cc:3413: obs = nm*sum_k ssq_x2_k -
    sum_k sums_k^2 over exp = nm^2*2^30 - sum_k sums_k^2, 16384-scale
    units).  NaN (monomorphic) kept; chrX and MT not evaluated."""
    from ..utils.chrom import MT_CODE, X_CODE

    smask = ds.sample_mask
    keep = np.ones(ds.raw_variant_ct, bool)
    chrom = ds.vi.chrom
    vr = getattr(ds.reader.header, "vrtypes", None)
    removed = 0
    for v in np.flatnonzero(ds.variant_mask):
        c = int(chrom[v])
        if c in (X_CODE, MT_CODE):
            continue
        if ds.has_dosage and vr is not None and (vr[v] & 0x60):
            d = ds.dosage_row(int(v))[: ds.raw_sample_ct][smask]
            fin = np.isfinite(d)
            d = np.round(d[fin] * 16384.0)
        else:
            from ..ops.pairwise import _unpack_np

            codes = _unpack_np(ds.reader.read_packed(int(v), 1))[0][
                : ds.raw_sample_ct][smask]
            fin = codes != 3
            d = codes[fin].astype(np.float64) * 16384.0
        nm = int(fin.sum())
        if nm == 0:
            continue
        e = 32768.0 - d
        ssq_x2 = float((d * d).sum() + (e * e).sum())
        s_alt, s_ref = float(d.sum()), float(e.sum())
        meansq = s_alt * s_alt + s_ref * s_ref
        obs = nm * ssq_x2 - meansq
        exp_ = nm * nm * float(1 << 30) - meansq
        if exp_ <= 0:
            continue  # monomorphic -> nan, not excluded
        r2 = 2.0 * obs / exp_
        if r2 != r2:
            continue
        if r2 < min_r2 or r2 > max_r2:
            keep[v] = False
            removed += 1
    ds.variant_mask &= keep
    log.log(f"--mach-r2-filter: {removed} variant"
            f"{'s' if removed != 1 else ''} removed "
            f"({ds.variant_ct} remaining).")


def minimac3_r2_filter(ds: Dataset, min_r2: float, max_r2: float,
                       log: RunLogger) -> None:
    """--minimac3-r2-filter: Minimac3 R2 recomputed from (phased) dosages
    (MultiallelicDiploidMinimac3R2, 2.0/include/pgenlib_misc.cc:3413:
    ssq_x2 terms (l+r)^2 + (l-r)^2 per allele; phased hets without an
    explicit dphase entry contribute the implicit +-min(d, 32768-d)
    delta).  chrX/MT skipped; NaN kept."""
    from ..utils.chrom import MT_CODE, X_CODE

    smask = ds.sample_mask
    keep = np.ones(ds.raw_variant_ct, bool)
    chrom = ds.vi.chrom
    removed = 0
    raw_idx = np.flatnonzero(smask)
    for v in np.flatnonzero(ds.variant_mask):
        c = int(chrom[v])
        if c in (X_CODE, MT_CODE):
            continue
        from ..ops.pairwise import _unpack_np

        codes = _unpack_np(ds.reader.read_packed(int(v), 1))[0][
            : ds.raw_sample_ct]
        d_all = codes.astype(np.float64) * 16384.0
        d_all[codes == 3] = np.nan
        delta_all = np.zeros(ds.raw_sample_ct)
        aux = ds.reader.read_dosage(int(v))
        if aux.dosage_ids is not None and aux.dosage_ids.size:
            vals = aux.dosage_vals.astype(np.float64)
            miss = vals == 65535
            d_all[aux.dosage_ids] = np.where(miss, np.nan, vals)
        if aux.phasepresent is not None and aux.phasepresent.any():
            het = codes == 1
            pp_full = np.zeros(ds.raw_sample_ct, bool)
            pp_full[np.flatnonzero(het)] = aux.phasepresent[
                : int(het.sum())]
            # implicit dphase: +-min(d, 32768-d); phaseinfo 1 = "1|0"
            pi_full = np.zeros(ds.raw_sample_ct, bool)
            if aux.phaseinfo is not None:
                ph_idx = np.flatnonzero(pp_full)
                pi_full[ph_idx] = aux.phaseinfo[: ph_idx.size]
            dd = np.where(np.isfinite(d_all), d_all, 0.0)
            imp = np.minimum(dd, 32768.0 - dd)
            delta_all = np.where(pp_full, np.where(pi_full, imp, -imp), 0.0)
        if aux.dphase_ids is not None and aux.dphase_ids.size:
            delta_all[aux.dphase_ids] = aux.dphase_delta.astype(np.float64)
        d = d_all[raw_idx]
        delta = delta_all[raw_idx]
        fin = np.isfinite(d)
        d = d[fin]
        delta = delta[fin]
        nm = d.size
        if nm == 0:
            continue
        e = 32768.0 - d
        ssq_x2 = float((d * d).sum() + (e * e).sum()
                       + 2.0 * (delta * delta).sum())
        s_alt, s_ref = float(d.sum()), float(e.sum())
        meansq = s_alt * s_alt + s_ref * s_ref
        obs = nm * ssq_x2 - meansq
        exp_ = nm * nm * float(1 << 30) - meansq
        if exp_ <= 0:
            continue
        r2 = obs / exp_
        if r2 != r2:
            continue
        if r2 < min_r2 or r2 > max_r2:
            keep[v] = False
            removed += 1
    ds.variant_mask &= keep
    log.log(f"--minimac3-r2-filter: {removed} variant"
            f"{'s' if removed != 1 else ''} removed "
            f"({ds.variant_ct} remaining).")


def info_expr_filter(ds: Dataset, expr_text: str, extract: bool,
                     log: RunLogger) -> None:
    """--extract-if-info / --exclude-if-info: boolean INFO-key expressions
    (ref CmpExpr filters in LoadPvar, 2.0/plink2_pvar.cc:742-900)."""
    from ..utils.infoexpr import InfoExpr

    expr = InfoExpr(expr_text)
    info = ds.vi.info
    keep = np.zeros(ds.raw_variant_ct, bool)
    for v in np.flatnonzero(ds.variant_mask):
        sat = expr.eval(info[v] if info is not None else None)
        keep[v] = sat if extract else not sat
    ds.variant_mask &= keep
    flag = "--extract-if-info" if extract else "--exclude-if-info"
    log.log(f"{flag}: {ds.variant_ct} variants remaining.")


def require_info_filter(ds: Dataset, keys, require: bool,
                        log: RunLogger) -> None:
    """--require-info / --require-no-info ("<key>=." counts as
    nonexistence; ref LoadPvar require_info handling)."""
    from ..utils.infoexpr import parse_info

    info = ds.vi.info
    keep = np.zeros(ds.raw_variant_ct, bool)
    for v in np.flatnonzero(ds.variant_mask):
        d = parse_info(info[v] if info is not None else None)
        ok = True
        for k in keys:
            exists = k in d and d[k] != "."
            if exists != require:
                ok = False
                break
        keep[v] = ok
    ds.variant_mask &= keep
    flag = "--require-info" if require else "--require-no-info"
    log.log(f"{flag}: {ds.variant_ct} variants remaining.")


def extract_intersect(ds: Dataset, args, log: RunLogger) -> None:
    """--extract-intersect: intersection of every file's variant set."""
    args = tuple(args)
    mode = None
    if args and args[0] in ("bed0", "bed1", "range"):
        mode, args = args[0], args[1:]
    for path in args:
        if mode is None:
            ds.variant_mask &= _token_hit(ds, (path,))
        else:
            ds.variant_mask &= _interval_hit(
                ds, (path,), one_based=mode != "bed0"
            )
    log.log(f"--extract-intersect: {ds.variant_ct} variants remaining.")


def snp_window_filter(ds: Dataset, cfg, log: RunLogger) -> None:
    """--snp/--snps/--exclude-snp(s) [+ --window]: variant-ID point/range
    selection; --window keeps variants within half the given kb distance of
    the --snp variant."""
    vid = ds.vi.vid.astype(str)

    def ids_of(spec):
        out = np.zeros(ds.raw_variant_ct, bool)
        for token in spec:
            for part in token.split(","):
                if not part:
                    continue
                if "-" in part and part not in vid:
                    a, b = part.split("-", 1)
                    ia = np.flatnonzero(vid == a)
                    ib = np.flatnonzero(vid == b)
                    if ia.size == 0 or ib.size == 0:
                        raise ValueError(
                            f"--snps: variant ID '{part}' range endpoint not found."
                        )
                    lo, hi = min(ia[0], ib[0]), max(ia[0], ib[0])
                    out[lo : hi + 1] = True
                else:
                    out |= vid == part
        return out

    if cfg.snp is not None:
        i = np.flatnonzero(vid == cfg.snp)
        if i.size == 0:
            raise ValueError(f"--snp: variant ID '{cfg.snp}' not found.")
        i = i[0]
        if cfg.window is not None:
            half = cfg.window * 500  # kb -> bp, half-window each side
            hit = (
                (ds.vi.chrom == ds.vi.chrom[i])
                & (np.abs(ds.vi.pos.astype(np.int64) - int(ds.vi.pos[i])) <= half)
            )
            ds.variant_mask &= hit
            log.log(f"--snp + --window: {ds.variant_ct} variants remaining.")
        else:
            ds.variant_mask &= vid == cfg.snp
            log.log(f"--snp: {ds.variant_ct} variants remaining.")
    if cfg.snps:
        ds.variant_mask &= ids_of(cfg.snps)
        log.log(f"--snps: {ds.variant_ct} variants remaining.")
    if cfg.exclude_snp is not None:
        ds.variant_mask &= vid != cfg.exclude_snp
        log.log(f"--exclude-snp: {ds.variant_ct} variants remaining.")
    if cfg.exclude_snps:
        ds.variant_mask &= ~ids_of(cfg.exclude_snps)
        log.log(f"--exclude-snps: {ds.variant_ct} variants remaining.")
    if cfg.from_id is not None or cfg.to_id is not None:
        ia = np.flatnonzero(vid == cfg.from_id) if cfg.from_id else None
        ib = np.flatnonzero(vid == cfg.to_id) if cfg.to_id else None
        if ia is not None and ia.size == 0:
            raise ValueError(f"--from: variant ID '{cfg.from_id}' not found.")
        if ib is not None and ib.size == 0:
            raise ValueError(f"--to: variant ID '{cfg.to_id}' not found.")
        lo = int(ia[0]) if ia is not None else 0
        hi = int(ib[0]) if ib is not None else ds.raw_variant_ct - 1
        if lo > hi:
            lo, hi = hi, lo
        mask = np.zeros(ds.raw_variant_ct, bool)
        mask[lo : hi + 1] = True
        mask &= ds.vi.chrom == ds.vi.chrom[lo]
        ds.variant_mask &= mask
        log.log(f"--from/--to: {ds.variant_ct} variants remaining.")


def filter_chr(ds: Dataset, chr_names: list[str], log: RunLogger, keep: bool = True) -> None:
    """--chr / --not-chr."""
    codes = set()
    for name in chr_names:
        if "-" in name and not name.lower().startswith("chr"):
            lo, hi = name.split("-")
            codes.update(range(int(lo), int(hi) + 1))
        else:
            codes.add(ds.vi.chr_info.code(name))
    hit = np.isin(ds.vi.chrom, list(codes))
    ds.variant_mask &= hit if keep else ~hit
    log.log(f"--{'chr' if keep else 'not-chr'}: {ds.variant_ct} variants remaining.")


def filter_autosomes(ds: Dataset, log: RunLogger,
                     include_par: bool = False) -> None:
    from ..utils.chrom import XY_CODE

    keep = ds.vi.chr_info.is_autosomal(ds.vi.chrom)
    if include_par:
        # --autosome-par additionally keeps the XY pseudo-autosomal code
        keep = keep | (ds.vi.chrom == XY_CODE)
    ds.variant_mask &= keep
    flag = "--autosome-par" if include_par else "--autosome"
    log.log(f"{flag}: {ds.variant_ct} variants remaining.")


def mind_filter(ds: Dataset, thresh: float, log: RunLogger) -> None:
    """--mind: remove samples with missing-call rate > thresh
    (ref: MindFilter, 2.0/plink2_filter.h:112)."""
    vmask = ds.variant_mask.astype(np.float32)
    miss = np.zeros(ds.raw_sample_ct, dtype=np.int64)
    for vstart, packed in ds.iter_packed_blocks():
        miss += sample_missing_counts(packed, ds.raw_sample_ct, vmask[vstart : vstart + packed.shape[0]])
    obs = int(ds.variant_mask.sum())
    before = ds.sample_ct
    if obs:
        keep = miss <= thresh * obs
        ds.sample_mask &= keep
        ds.invalidate_counts()
    removed = before - ds.sample_ct
    log.log(f"{removed} sample{'s' if removed != 1 else ''} removed due to "
            f"missing genotype data (--mind).")


def geno_filter(ds: Dataset, thresh: float, log: RunLogger) -> None:
    """--geno: remove variants with missing-call rate > thresh."""
    cts = ds.geno_counts(founders_only=False)
    n = cts.sum(axis=1)
    before = ds.variant_ct
    with np.errstate(invalid="ignore", divide="ignore"):
        ok = np.where(n > 0, cts[:, 3] / np.maximum(n, 1) <= thresh, True)
    ds.variant_mask &= ok
    removed = before - ds.variant_ct
    log.log(f"{removed} variant{'s' if removed != 1 else ''} removed due to "
            f"missing genotype data (--geno).")


def maf_filter(
    ds: Dataset,
    log: RunLogger,
    min_af: float | None = None,
    max_af: float | None = None,
    min_ac: float | None = None,
    max_ac: float | None = None,
    nonfounders: bool = False,
) -> None:
    """--maf/--max-maf/--mac/--max-mac (founders-based by default)."""
    alt, obs = allele_counts_and_obs(ds, founders_only=not nonfounders)
    # --af-pseudocount applies to inferred frequencies (not counts)
    pc = float(getattr(ds, "af_pseudocount", 0.0) or 0.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        af = np.where(obs > 0, (alt + pc) / (obs + 2 * pc), np.nan)
    maf = np.minimum(af, 1 - af)
    mac = np.minimum(alt, obs - alt)
    before = ds.variant_ct
    ok = np.ones(ds.raw_variant_ct, dtype=bool)
    if min_af is not None:
        ok &= ~(maf < min_af) & ~np.isnan(maf)
    if max_af is not None:
        ok &= ~(maf > max_af) & ~np.isnan(maf)
    if min_ac is not None:
        ok &= mac >= min_ac
    if max_ac is not None:
        ok &= mac <= max_ac
    ds.variant_mask &= ok
    removed = before - ds.variant_ct
    log.log(f"{removed} variant{'s' if removed != 1 else ''} removed due to "
            f"allele frequency threshold(s).")


def hwe_filter(ds: Dataset, thresh: float, midp: bool, log: RunLogger) -> None:
    """--hwe: remove variants failing the HWE exact test
    (ref: EnforceHweThresh, 2.0/plink2_filter.h:118; founders-based,
    chrX female-only)."""
    from ..ops.counts import GenoCounter
    from ..utils.chrom import MT_CODE, X_CODE, Y_CODE

    base = ds.sample_mask & ds.founder_mask
    gc = GenoCounter(ds.raw_sample_ct, base.astype(np.float32))
    is_x = ds.vi.chrom == X_CODE
    gc_f = GenoCounter(ds.raw_sample_ct, (base & ds.female_mask()).astype(np.float32)) if is_x.any() else None
    for _, packed in ds.iter_packed_blocks():
        gc.add_block(packed)
        if gc_f:
            gc_f.add_block(packed)
    cts = gc.result()
    if gc_f:
        cts = np.where(is_x[:, None], gc_f.result(), cts)
    fails = hwe_exact_thresh(cts[:, 0], cts[:, 1], cts[:, 2], thresh, midp=midp)
    # No HWE test on haploid chromosomes.
    fails &= ~np.isin(ds.vi.chrom, (Y_CODE, MT_CODE))
    before = ds.variant_ct
    ds.variant_mask &= ~fails
    removed = before - ds.variant_ct
    log.log(f"--hwe: {removed} variant{'s' if removed != 1 else ''} removed due to "
            f"Hardy-Weinberg exact test (founders only).")


def snps_only_filter(ds: Dataset, just_acgt: bool, log: RunLogger) -> None:
    """--snps-only [just-acgt]: keep variants whose alleles are all single
    characters (ref: plink2 variant filter chain)."""
    import numpy as np

    alt1 = ds.vi.alt1()
    ok = np.array(
        [len(str(r)) == 1 and all(len(a) == 1 for a in str(al).split(","))
         for r, al in zip(ds.vi.ref, ds.vi.alt)]
    )
    if just_acgt:
        acgt = set("ACGTacgt")
        ok &= np.array(
            [str(r) in acgt and all(a in acgt for a in str(al).split(","))
             for r, al in zip(ds.vi.ref, ds.vi.alt)]
        )
    before = ds.variant_ct
    ds.variant_mask &= ok
    ds.invalidate_counts()
    log.log(
        f"--snps-only: {before - ds.variant_ct} variants removed "
        f"({ds.variant_ct} remaining)."
    )


def set_all_var_ids(ds: Dataset, template: str, log: RunLogger) -> None:
    """--set-all-var-ids: rewrite every variant ID from a template with
    @ = chromosome, # = bp position, $r = REF, $a = ALT1 (ref: plink2
    variant-ID templating in plink2_pvar.cc)."""
    import numpy as np

    ci = ds.vi.chr_info
    alt1 = ds.vi.alt1()
    new_ids = np.empty(ds.raw_variant_ct, dtype=object)
    for i in range(ds.raw_variant_ct):
        s = template
        s = s.replace("@", ci.name(int(ds.vi.chrom[i])))
        s = s.replace("#", str(int(ds.vi.pos[i])))
        s = s.replace("$r", str(ds.vi.ref[i]))
        s = s.replace("$a", str(alt1[i]))
        new_ids[i] = s
    ds.vi.vid = new_ids
    log.log("--set-all-var-ids: Variant IDs rewritten.")


def rm_dup(ds: Dataset, mode: str, log: RunLogger) -> None:
    """--rm-dup [mode]: handle duplicate variant IDs (ref: plink2 --rm-dup;
    modes: error (default), exclude-all, exclude-mismatch ~ force-first,
    force-first, retain-mismatch, list)."""
    import numpy as np

    inc = np.flatnonzero(ds.variant_mask)
    seen: dict[str, int] = {}
    dup_first = set()
    dup_later = []
    for i in inc:
        vid = str(ds.vi.vid[i])
        if vid in seen:
            dup_first.add(seen[vid])
            dup_later.append(i)
        else:
            seen[vid] = int(i)
    if not dup_later:
        log.log("Note: Skipping --rm-dup since no duplicate IDs are present.")
        return
    if mode == "error":
        raise ValueError(
            f"--rm-dup: {len(dup_later)} duplicate ID(s) present "
            "(use a mode like 'force-first' or 'exclude-all')"
        )
    if mode in ("force-first", "exclude-mismatch", "retain-mismatch"):
        ds.variant_mask[np.array(dup_later)] = False
    elif mode == "exclude-all":
        ds.variant_mask[np.array(dup_later)] = False
        ds.variant_mask[np.array(sorted(dup_first))] = False
    ds.invalidate_counts()
    log.log(
        f"--rm-dup: {len(dup_later) + (len(dup_first) if mode == 'exclude-all' else 0)}"
        f" variant(s) removed."
    )


def thin_variants(ds: Dataset, p: float | None, count: int | None,
                  cfg, log: RunLogger) -> None:
    """--thin / --thin-count: random variant subsampling, bit-exact
    with 1.9's SFMT stream for a given --seed (random_thin_markers /
    random_thin_markers_ct, 1.9/plink_filter.c:1024-1095)."""
    import numpy as np

    from ..stats.perm19 import generate_cc_perm, master_sfmt

    sfmt = master_sfmt(cfg)
    inc = np.flatnonzero(ds.variant_mask)
    if count is not None:
        tag = "--thin-count"
        if count > inc.size:
            raise ValueError(
                "--thin-count parameter exceeds number of remaining "
                "variants.")
        if inc.size > 1:
            removed_mask = generate_cc_perm(
                inc.size, inc.size - count, sfmt)
            keep = inc[~removed_mask]
        elif count == 0 and inc.size:
            keep = inc[:0]
        else:
            keep = inc
        removed = inc.size - keep.size
    else:
        tag = "--thin"
        thresh = int(p * 4294967296.0 + 0.5)
        keep_flags = np.array(
            [sfmt.genrand_uint32() < thresh for _ in range(inc.size)])
        keep = inc[keep_flags]
        removed = inc.size - keep.size
        if removed == inc.size:
            raise ValueError(
                "All variants removed by --thin.  Try a higher "
                "probability.")
    mask = np.zeros(ds.raw_variant_ct, dtype=bool)
    mask[keep] = True
    ds.variant_mask &= mask
    ds.invalidate_counts()
    log.log(f"{tag}: {removed} variant"
            f"{'' if removed == 1 else 's'} removed "
            f"({keep.size} remaining).")


def thin_samples(ds: Dataset, p: float | None, count: int | None,
                 cfg, log: RunLogger) -> None:
    """--thin-indiv / --thin-indiv-count (random_thin_samples{,_ct},
    1.9/plink_filter.c:1097-1160)."""
    import numpy as np

    from ..stats.perm19 import generate_cc_perm, master_sfmt

    sfmt = master_sfmt(cfg)
    n = ds.raw_sample_ct
    inc = np.flatnonzero(ds.sample_mask[:n])
    if count is not None:
        tag = "--thin-indiv-count"
        if count > inc.size:
            raise ValueError(
                "--thin-indiv-count parameter exceeds number of "
                "remaining people.")
        removed_mask = generate_cc_perm(inc.size, inc.size - count,
                                        sfmt)
        keep = inc[~removed_mask]
        removed = inc.size - keep.size
    else:
        tag = "--thin-indiv"
        thresh = int(p * 4294967296.0 + 0.5)
        keep_flags = np.array(
            [sfmt.genrand_uint32() < thresh for _ in range(inc.size)])
        keep = inc[keep_flags]
        removed = inc.size - keep.size
        if removed == inc.size:
            raise ValueError(
                "All people removed by --thin-indiv. Try a higher "
                "probability.")
    mask = np.zeros_like(ds.sample_mask)
    mask[keep] = True
    ds.sample_mask &= mask
    ds.invalidate_counts()
    noun = "person" if removed == 1 else "people"
    log.log(f"{tag}: {removed} {noun} removed "
            f"({keep.size} remaining).")


def keep_founders_filter(ds: Dataset, founders: bool, log: RunLogger) -> None:
    """--keep-founders / --keep-nonfounders."""
    before = ds.sample_ct
    if founders:
        ds.sample_mask &= ds.founder_mask
    else:
        ds.sample_mask &= ~ds.founder_mask
    ds.invalidate_counts()
    flag = "--keep-founders" if founders else "--keep-nonfounders"
    log.log(f"{flag}: {ds.sample_ct} samples remaining ({before - ds.sample_ct} removed).")


def update_sex(ds: Dataset, path: str, log: RunLogger) -> None:
    """--update-sex: set sample sex from a file (#FID IID SEX / #IID SEX)."""
    import numpy as np

    from .glm import _match_rows, _read_table

    id_mode, ids, colnames, vals = _read_table(path)
    col = 0
    for k, cn in enumerate(colnames):
        if cn.upper() == "SEX":
            col = k
            break
    rows = _match_rows(ds, id_mode, ids)
    updated = 0
    for r, idx in enumerate(rows):
        if idx < 0:
            continue
        v = vals[r][col].upper()
        if v in ("1", "M", "MALE"):
            ds.si.sex[idx] = 1
        elif v in ("2", "F", "FEMALE"):
            ds.si.sex[idx] = 2
        else:
            ds.si.sex[idx] = 0
        updated += 1
    ds.invalidate_counts()
    log.log(f"--update-sex: {updated} sample(s) updated.")


_CMP_OPS = ("<=", ">=", "==", "!=", "<", ">")


def _keepif_columns(ds: Dataset, cfg):
    """Phenotype/covariate columns visible to --keep-if/--remove-if:
    psam (or --pheno) phenotypes first, then --covar columns (which the
    reference types as quantitative or categorical, never case/control;
    GetPhenoCovarCol, 2.0/plink2_filter.cc:1606)."""
    cols = dict(ds.si.phenos)
    if getattr(cfg, "pheno", None):
        from ..io.psam import _build_pheno
        from .glm import _match_rows, _read_table

        id_mode, ids, colnames, vals = _read_table(cfg.pheno)
        rows = _match_rows(ds, id_mode, ids)
        n = ds.raw_sample_ct
        for c_, name in enumerate(colnames):
            col_strs = ["NA"] * n
            for r_, idx in enumerate(rows):
                if idx >= 0:
                    col_strs[idx] = vals[r_][c_]
            cols[name] = _build_pheno(name, col_strs)
    if getattr(cfg, "covar", None):
        from ..io.psam import PhenoCol, _build_pheno
        from .glm import _match_rows, _read_table

        id_mode, ids, colnames, vals = _read_table(cfg.covar)
        rows = _match_rows(ds, id_mode, ids)
        n = ds.raw_sample_ct
        for c_, name in enumerate(colnames):
            if name in cols:
                continue
            col_strs = ["NA"] * n
            for r_, idx in enumerate(rows):
                if idx >= 0:
                    col_strs[idx] = vals[r_][c_]
            pc = _build_pheno(name, col_strs)
            if pc.kind == "cc":
                # covariates are never case/control typed: rebuild as qt with
                # the original 1/2 values
                qt = np.where(pc.nonmiss, pc.data + 1.0, np.nan)
                pc = PhenoCol(name, "qt", qt, pc.nonmiss)
            cols[name] = pc
    return cols


def _eval_keepif_term(term: str, cols, include: np.ndarray, flagname: str):
    """One <key> [<op> <value>] comparison -> updated include mask
    (semantics of KeepIfInternal, 2.0/plink2_filter.cc:1631: ==/ordered ops
    drop missing-phenotype samples, != keeps them)."""
    key, op, value = term
    if key not in cols:
        raise ValueError(
            f"--{flagname}: phenotype/covariate '{key}' not loaded."
        )
    pc = cols[key]
    nonmiss = np.asarray(pc.nonmiss, bool)
    if op is None:  # bare name: existence test
        return include & nonmiss
    is_neq = op == "!="
    out = include.copy()
    if not is_neq:
        out &= nonmiss
    active = include & nonmiss
    if pc.kind == "qt":
        try:
            val = float(value)
        except ValueError:
            raise ValueError(
                f"--{flagname}: quantitative phenotype/covariate '{key}' must "
                f"be compared to a number, not '{value}'."
            )
        data = np.asarray(pc.data, float)
        with np.errstate(invalid="ignore"):
            hit = {
                "<": data < val, "<=": data <= val, "==": data == val,
                "!=": data == val,  # neq: clear matching
                ">": data > val, ">=": data >= val,
            }[op]
        if is_neq:
            out[active & hit] = False
        else:
            out[active & ~hit] = False
    elif pc.kind == "cc":
        sval = str(value).upper()
        val_12 = 0
        if sval in ("CASE", "2"):
            val_12 = 2
        elif sval in ("CTRL", "CONTROL", "1"):
            val_12 = 1
        if op not in ("==", "!=") or not val_12:
            raise ValueError(
                f"--{flagname}: binary phenotype/covariate must be compared "
                f"with ==/!= to case/2 or control/ctrl/1."
            )
        if is_neq:
            val_12 = 3 - val_12
        cases = nonmiss & (np.asarray(pc.data, float) == 1.0)
        if val_12 == 2:
            out = include & cases
        else:
            out = include & ~cases
    else:  # categorical
        if op not in ("==", "!="):
            raise ValueError(
                f"--{flagname}: categorical phenotype/covariate '{key}' must "
                f"be compared to a category name with ==/!=."
            )
        from ..utils.logging import get_logger

        cats = list(pc.categories)
        if value not in cats[1:]:
            get_logger().log(
                f"Warning: --{flagname} categorical phenotype/covariate "
                f"'{key}' does not have a category named '{value}'."
            )
            if not is_neq:
                out[:] = False
            return out
        cat_idx = cats.index(value)
        hit = np.asarray(pc.data) == cat_idx
        if is_neq:
            out[active & hit] = False
        else:
            out[active & ~hit] = False
    return out


def _parse_keepif_expr(expr: str, flagname: str):
    """Parse '<key> <op> <value>' terms joined by && / || (no parens;
    AND binds tighter, as in CmpExprParse)."""
    import re

    def parse_term(t: str):
        t = t.strip()
        m = re.search(r"(<=|>=|==|!=|<|>)", t)
        if not m:
            if not t or " " in t:
                raise ValueError(f"Invalid --{flagname} expression.")
            return (t, None, None)
        key = t[: m.start()].strip()
        value = t[m.end():].strip()
        if not key or not value:
            raise ValueError(f"Invalid --{flagname} expression.")
        return (key, m.group(1), value)

    or_groups = []
    for part in expr.split("||"):
        or_groups.append([parse_term(t) for t in part.split("&&")])
    return or_groups


def keep_remove_if(ds: Dataset, cfg, expr_args, keep: bool,
                   log: RunLogger) -> None:
    """--keep-if / --remove-if (ref: KeepRemoveIf,
    2.0/plink2_filter.cc: remove-if wraps the expression in NOT, so samples
    the keep-expression would drop -- including missing-phenotype samples
    under ==/ordered comparisons -- are the ones retained)."""
    flagname = "keep-if" if keep else "remove-if"
    expr = " ".join(expr_args)
    groups = _parse_keepif_expr(expr, flagname)
    cols = _keepif_columns(ds, cfg)
    include = ds.sample_mask.copy()
    result = np.zeros_like(include)
    for terms in groups:  # OR over groups
        g = include.copy()
        for term in terms:  # AND within a group
            g = _eval_keepif_term(term, cols, g, flagname)
        result |= g
    before = ds.sample_ct
    if keep:
        ds.sample_mask &= result
    else:
        ds.sample_mask &= ~result
    ds.invalidate_counts()
    removed = before - ds.sample_ct
    log.log(
        f"--{flagname}: {removed} sample{'s' if removed != 1 else ''} removed."
    )


def keep_remove_cats(ds: Dataset, cfg, log: RunLogger) -> None:
    """--keep-cats/--keep-cat-names/--keep-cat-pheno and the --remove-*
    analogues (KeepRemoveCats, plink2_filter.cc): select samples by
    categorical-phenotype membership.  Without --*-cat-pheno, the single
    categorical phenotype/covariate is used."""
    for remove in (False, True):
        pfx = "remove" if remove else "keep"
        cats_file = getattr(cfg, f"{pfx}_cats", None)
        cat_names = getattr(cfg, f"{pfx}_cat_names", None)
        pheno_name = getattr(cfg, f"{pfx}_cat_pheno", None)
        if not cats_file and not cat_names:
            continue
        cols = _keepif_columns(ds, cfg)
        if pheno_name is not None:
            pc = cols.get(pheno_name)
            if pc is None or pc.kind != "cat":
                raise ValueError(
                    f"--{pfx}-cat-pheno: categorical phenotype/covariate "
                    f"'{pheno_name}' not loaded."
                )
        else:
            cat_cols = [p for p in cols.values() if p.kind == "cat"]
            if len(cat_cols) != 1:
                raise ValueError(
                    f"--{pfx}-cats requires exactly one categorical "
                    f"phenotype/covariate, or --{pfx}-cat-pheno."
                )
            pc = cat_cols[0]
        want = set()
        if cat_names:
            want.update(cat_names)
        if cats_file:
            with open(cats_file) as f:
                want.update(f.read().split())
        cats = list(pc.categories)
        sel_idx = {cats.index(c) for c in want if c in cats}
        absent = len(want) - len(sel_idx)
        if absent:
            log.log(
                f"Warning: {absent} --{pfx}-cat-names categor"
                f"{'ies' if absent != 1 else 'y'} not present."
            )
        member = np.isin(np.asarray(pc.data), list(sel_idx)) & pc.nonmiss
        before = ds.sample_ct
        if remove:
            ds.sample_mask &= ~member
        else:
            ds.sample_mask &= member
        ds.invalidate_counts()
        rem = before - ds.sample_ct
        nsel = len(sel_idx)
        log.log(
            f"--{pfx}-cats/--{pfx}-cat-names: {nsel} categor"
            f"{'ies' if nsel != 1 else 'y'} selected, {rem} sample"
            f"{'s' if rem != 1 else ''} removed."
        )


class _PermutedReader:
    """Row-permuted view of a pgen reader (for --sort-vars)."""

    def __init__(self, inner, order: np.ndarray):
        self._inner = inner
        self._order = order
        self.header = inner.header
        self.variant_ct = inner.variant_ct
        self.sample_ct = inner.sample_ct

    def read_packed(self, vstart: int, vct: int) -> np.ndarray:
        rows = [self._inner.read_packed(int(self._order[vstart + k]), 1)[0]
                for k in range(vct)]
        return np.stack(rows)

    def read_dosage(self, vidx: int):
        return self._inner.read_dosage(int(self._order[vidx]))

    def __getattr__(self, name):
        return getattr(self._inner, name)


def sort_vars(ds: Dataset, log: RunLogger) -> None:
    """--sort-vars: stable (chromosome, position) variant reordering
    (MakePlink2Vsort, 2.0/plink2_data.cc)."""
    order = np.lexsort(
        (np.arange(ds.raw_variant_ct), ds.vi.pos, ds.vi.chrom)
    )
    vi = ds.vi
    vi.chrom = vi.chrom[order]
    vi.pos = vi.pos[order]
    vi.vid = vi.vid[order]
    vi.ref = vi.ref[order]
    vi.alt = vi.alt[order]
    for attr in ("cm", "qual", "filt", "info"):
        a = getattr(vi, attr)
        if a is not None:
            setattr(vi, attr, a[order])
    hdr = ds.reader.header
    if hdr.provisional_ref is not None:
        hdr.provisional_ref = hdr.provisional_ref[order]
    if hdr.vrtypes is not None:
        # keep per-variant vrtype view consistent for dosage/phase checks
        hdr = ds.reader.header
    ds.variant_mask = ds.variant_mask[order]
    ds.reader = _PermutedReader(ds.reader, order)
    ds.invalidate_genotypes()
    log.log("--sort-vars: variants reordered.")


def ref_alt_allele(ds: Dataset, args: tuple, set_ref: bool,
                   log: RunLogger) -> None:
    """--ref-allele / --alt-allele [force] <file> [allele-col] [id-col]
    [skip]: set REF (or ALT) per variant from a file, rotating genotypes
    when the assignment flips the existing orientation (plink2_data.cc
    allele-permute path; message format '--ref-allele: N sets of allele
    codes permuted.')."""
    from .fasta import FlipOverlayReader

    args = list(args)
    force = False
    if args and args[0] == "force":
        force = True
        args.pop(0)
    path = args[0]
    acol = int(args[1]) if len(args) > 1 else 2
    idcol = int(args[2]) if len(args) > 2 else 1
    skip = int(args[3]) if len(args) > 3 else 0
    with open(path) as f:
        rows = [l.split() for l in f if l.strip()][skip:]
    vid_to_idx: dict = {}
    for i in np.flatnonzero(ds.variant_mask):
        vid_to_idx.setdefault(str(ds.vi.vid[i]), i)
    hdr = ds.reader.header
    if hdr.provisional_ref is not None:
        prov = hdr.provisional_ref.copy()
    else:
        prov = np.full(ds.raw_variant_ct, bool(hdr.all_provisional))
    flip = np.zeros(ds.raw_variant_ct, bool)
    changed = miss = 0
    flagname = "--ref-allele" if set_ref else "--alt-allele"
    for t in rows:
        i = vid_to_idx.get(t[idcol - 1])
        if i is None:
            miss += 1
            continue
        allele = t[acol - 1]
        ref, alt1 = str(ds.vi.ref[i]), str(ds.vi.alt[i]).split(",", 1)[0]
        want_ref = allele if set_ref else (
            ref if allele == alt1 else (alt1 if allele == ref else None)
        )
        if want_ref == ref:
            prov[i] = False
            continue
        if want_ref == alt1:
            if not prov[i] and not force:
                raise ValueError(
                    f"{flagname} wants to change reference allele assignment "
                    f"at {ds.vi.vid[i]}, but it's marked as 'known'. Add the "
                    "'force' modifier to force this change through."
                )
            ds.vi.ref[i], ds.vi.alt[i] = alt1, ref
            flip[i] = True
            prov[i] = False
            changed += 1
        else:
            raise ValueError(
                f"{flagname}: allele '{allele}' not found for variant "
                f"'{t[idcol - 1]}'."
            )
    log.log(
        f"{flagname}: {changed} set{'s' if changed != 1 else ''} of allele "
        "codes permuted."
    )
    hdr.provisional_ref = prov
    hdr.all_provisional = bool(prov.all())
    if flip.any():
        ds.reader = FlipOverlayReader(ds.reader, flip)
        ds.invalidate_genotypes()


def set_missing_var_ids(ds: Dataset, template: str, log: RunLogger) -> None:
    """--set-missing-var-ids: apply the @/#/$r/$a template only to variants
    whose ID is '.'."""
    missing = np.array([str(v) == "." for v in ds.vi.vid])
    idx = np.flatnonzero(ds.variant_mask & missing)
    for i in idx:
        vid = (template.replace("@", ds.vi.chr_info.name(ds.vi.chrom[i]))
               .replace("#", str(ds.vi.pos[i])))
        ref, alt1 = str(ds.vi.ref[i]), str(ds.vi.alt[i]).split(",", 1)[0]
        a, b = sorted([ref, alt1])
        vid = vid.replace("$r", ref).replace("$a", alt1)
        vid = vid.replace("$1", a).replace("$2", b)
        ds.vi.vid[i] = vid
    log.log(
        f"--set-missing-var-ids: {len(idx)} ID{'s' if len(idx) != 1 else ''} "
        "assigned."
    )


def genotyping_rate(ds: Dataset, log: RunLogger) -> None:
    """--genotyping-rate: overall hardcall nonmissing fraction log line."""
    cts = ds.geno_counts()
    sel = ds.variant_mask
    nonmiss = int(cts[sel, :3].sum())
    total = int(sel.sum()) * ds.sample_ct
    rate = nonmiss / total if total else 0.0
    from ..utils.fmt import g6

    log.log(f"Total (hardcall) genotyping rate is {g6(rate)}.")


def pgen_info(ds: Dataset, path: str, log: RunLogger) -> None:
    """--pgen-info summary block (matching the reference's wording)."""
    hdr = ds.reader.header
    log.log(f"--pgen-info on {path}:")
    log.log(f"  Variants: {ds.raw_variant_ct}")
    log.log(f"  Samples: {ds.raw_sample_ct}")
    if hdr.all_provisional:
        log.log("  REF alleles are all provisional")
    elif hdr.provisional_ref is not None and hdr.provisional_ref.any():
        log.log("  REF alleles are usually known, but sometimes provisional")
    else:
        log.log("  REF alleles are all known")
    log.log("  Maximum allele count for a single variant: 2")
    if hdr.mode == 0x10 and (hdr.vrtypes & 0x10).any():
        log.log("  Some hardcalls are explicitly phased")
    else:
        log.log("  No hardcalls are explicitly phased")
    if hdr.mode == 0x10 and (hdr.vrtypes & 0x60).any():
        log.log("  Some dosages present")
    else:
        log.log("  No dosages present")


def validate_pgen(ds: Dataset, path: str, log: RunLogger) -> None:
    """--validate: full decode pass over every record."""
    for _ in ds.iter_packed_blocks():
        pass
    if ds.has_dosage or ds.has_phase:
        for v in range(ds.raw_variant_ct):
            ds.reader.read_dosage(v)
    log.log(f"Validating {path}... done.")


def maj_ref(ds: Dataset, log: RunLogger) -> None:
    """--maj-ref: set REF to the major allele for provisional-REF variants
    (plink2_common.cc allele rotation; no-op warning when every REF is
    trusted)."""
    from .basic_reports import alt_allele_freqs
    from .fasta import FlipOverlayReader

    hdr = ds.reader.header
    if hdr.provisional_ref is not None:
        prov = hdr.provisional_ref.copy()
    else:
        prov = np.full(ds.raw_variant_ct, bool(hdr.all_provisional))
    if not prov.any():
        log.log(
            "Warning: --maj-ref has no effect, since no provisional "
            "reference alleles are present."
        )
        return
    freqs = np.nan_to_num(alt_allele_freqs(ds, founders_only=True))
    flip = prov & ds.variant_mask & (freqs > 0.5)
    for i in np.flatnonzero(flip):
        alt1 = str(ds.vi.alt[i]).split(",", 1)[0]
        ds.vi.ref[i], ds.vi.alt[i] = alt1, str(ds.vi.ref[i])
    ct = int(flip.sum())
    log.log(f"--maj-ref: {ct} allele pair{'s' if ct != 1 else ''} swapped.")
    if flip.any():
        ds.reader = FlipOverlayReader(ds.reader, flip)
        ds.invalidate_genotypes()


def recover_var_ids(ds: Dataset, args: tuple, log: RunLogger) -> None:
    """--recover-var-ids <pvar-like file>: restore IDs by (CHROM, POS,
    allele-pair) match.  Message format matches the reference
    ("N lines scanned.")."""
    path = args[0]
    key_to_id: dict = {}
    nlines = 0
    with open(path) as f:
        for ln in f:
            nlines += 1
            if ln.startswith("#"):
                continue
            t = ln.rstrip("\n").split("\t")
            if len(t) < 5:
                t = ln.split()
            if len(t) < 5:
                continue
            key = (t[0], t[1], frozenset((t[3], t[4])))
            key_to_id[key] = t[2]
    ci = ds.vi.chr_info
    n = 0
    for i in np.flatnonzero(ds.variant_mask):
        key = (
            ci.name(ds.vi.chrom[i]), str(ds.vi.pos[i]),
            frozenset((str(ds.vi.ref[i]), str(ds.vi.alt[i]))),
        )
        if key in key_to_id:
            ds.vi.vid[i] = key_to_id[key]
            n += 1
    log.log(f"--recover-var-ids: {nlines} line{'s' if nlines != 1 else ''} scanned.")


def indiv_sort_order(ds: Dataset, args: tuple, log: RunLogger) -> np.ndarray:
    """--indiv-sort [natural|ascii|none|file <f>]: returns the raw-index
    order of included samples."""
    mode = args[0] if args else "natural"
    inc = np.flatnonzero(ds.sample_mask)
    ids = [str(ds.si.iid[i]) for i in inc]
    if mode == "none":
        order = np.arange(len(inc))
    elif mode == "ascii":
        order = np.argsort(np.array(ids, dtype=object), kind="stable")
    elif mode == "file":
        with open(args[1]) as f:
            want = [l.split()[-1] for l in f if l.strip() and not l.startswith("#")]
        pos = {x: k for k, x in enumerate(ids)}
        order = np.array([pos[w] for w in want if w in pos])
    else:  # natural
        import re

        def natkey(s):
            return [int(p) if p.isdigit() else p
                    for p in re.split(r"(\d+)", s)]

        order = np.array(sorted(range(len(ids)), key=lambda k: natkey(ids[k])))
    log.log(f"--indiv-sort: {len(order)} samples reordered.")
    return inc[order]


def allele_ct_filter(ds: Dataset, min_a: int | None, max_a: int | None,
                     log: RunLogger) -> None:
    """--min-alleles / --max-alleles (ref: plink2_filter.cc allele-count
    branch): keep variants whose allele count is inside [min, max]."""
    ac = ds.allele_cts()
    before = ds.variant_ct
    keep = np.ones(ds.raw_variant_ct, bool)
    if min_a is not None:
        keep &= ac >= min_a
    if max_a is not None:
        keep &= ac <= max_a
    ds.variant_mask &= keep
    removed = before - ds.variant_ct
    lim = []
    if min_a is not None:
        lim.append(f"--min-alleles {min_a}")
    if max_a is not None:
        lim.append(f"--max-alleles {max_a}")
    log.log(
        f"{' + '.join(lim)}: {removed} variant{'s' if removed != 1 else ''} "
        "removed."
    )
    ds.invalidate_counts()


def var_qual_filter(ds: Dataset, min_qual: float, log: RunLogger) -> None:
    """--var-min-qual: drop variants whose QUAL is missing or below the
    threshold (ref: plink2_filter.cc qual filter)."""
    before = ds.variant_ct
    qual = ds.vi.qual
    keep = np.zeros(ds.raw_variant_ct, bool)
    if qual is not None:
        for i in range(ds.raw_variant_ct):
            q = qual[i]
            try:
                keep[i] = q is not None and float(q) >= min_qual
            except (TypeError, ValueError):
                keep[i] = False
    ds.variant_mask &= keep
    removed = before - ds.variant_ct
    log.log(
        f"--var-min-qual: {removed} variant{'s' if removed != 1 else ''} "
        "removed."
    )
    ds.invalidate_counts()


def var_filter_filter(ds: Dataset, keep_vals: list, log: RunLogger) -> None:
    """--var-filter [values...]: keep variants whose FILTER is PASS (or '.')
    or one of the listed values (ref: plink2_filter.cc FILTER handling)."""
    before = ds.variant_ct
    filt = ds.vi.filt
    ok = {"PASS", "."} | set(keep_vals)
    keep = np.ones(ds.raw_variant_ct, bool)
    if filt is not None:
        for i in range(ds.raw_variant_ct):
            f = filt[i]
            if f is None:
                continue
            keep[i] = all(tok in ok for tok in str(f).split(";"))
    ds.variant_mask &= keep
    removed = before - ds.variant_ct
    log.log(
        f"--var-filter: {removed} variant{'s' if removed != 1 else ''} "
        "removed."
    )
    ds.invalidate_counts()


def require_pheno_filter(ds: Dataset, cfg, log: RunLogger) -> None:
    """--require-pheno / --require-covar / --prune: drop samples with
    missing values for the named (or all) phenotypes / covariates
    (ref: plink2_filter.cc RequirePheno)."""
    before = ds.sample_ct
    keep = np.ones(ds.raw_sample_ct, bool)

    def _require(names):
        nonlocal keep
        sel = names if names else list(ds.si.phenos)
        for nm in sel:
            pc = ds.si.phenos.get(nm)
            if pc is None:
                raise ValueError(f"--require-pheno: phenotype '{nm}' not found.")
            keep &= pc.nonmiss

    if cfg.prune or cfg.require_pheno is not None:
        _require(cfg.require_pheno or [])
    if cfg.require_covar is not None:
        # covariates loaded via --covar are handled at GLM time; psam-borne
        # covariate columns live in the pheno dict here
        _require(cfg.require_covar or [])
    ds.sample_mask &= keep
    removed = before - ds.sample_ct
    flag = "--prune" if cfg.prune else "--require-pheno"
    log.log(
        f"{flag}: {removed} sample{'s' if removed != 1 else ''} removed."
    )
    ds.invalidate_counts()
