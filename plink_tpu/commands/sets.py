"""1.9 set subsystem: --set / --make-set definitions, --write-set /
--set-table reports, the same-set LD map, and the --assoc set-test
permutation engine.

Behavior references (re-architected, not transliterated):
  define_sets / load_range_list     1.9/plink_set.c:274-560,1003-1710
  write_set (.set / .set.table)     1.9/plink_set.c:1713-1900
  construct_ld_map / ld_map_thread  1.9/plink_ld.c:11732-12260
  set_test_score / compute_set_scores / write_set_test_results
                                    1.9/plink_ld.c:12265-12660
  model_assoc_set_test              1.9/plink_assoc.c:5603-5950

The reference stores sets as range-lists / offset bitfields to bound
memory at biobank scale; here each set is a sorted int64 index array over
the filtered marker list, and the LD map is a dict of index arrays.  The
per-permutation chi-square battery is evaluated with vectorized numpy
weight dot-products over the [P, n] permutation label matrix instead of
the reference's per-variant popcount loop (identical arithmetic:
chi22_eval on the same 2x2 margins)."""

from __future__ import annotations

import math
import re

import numpy as np

from ..utils.logging import RunLogger

_NAT_SPLIT = re.compile(r"(\d+)")


def _natural_key(s: str):
    """strcmp_natural ordering (1.9/plink_common.c): digit runs compare
    numerically, other runs case-insensitively."""
    parts = _NAT_SPLIT.split(s)
    key = []
    for i, p in enumerate(parts):
        if i & 1:
            key.append((1, int(p), ""))
        elif p:
            key.append((0, 0, p.upper()))
    key.append((2, 0, s))
    return key


class SetInfo:
    """Defined sets over the *current filtered marker list* (0..M-1)."""

    def __init__(self, names, setdefs, set_r2=0.5, set_p=0.05, set_max=5,
                 set_test_lambda=0.0, r2_write=False):
        self.names = names            # list[str]
        self.setdefs = setdefs        # list[np.ndarray int64, sorted]
        self.ct = len(names)
        self.set_r2 = set_r2
        self.set_p = set_p
        self.set_max = set_max
        self.set_test_lambda = set_test_lambda
        self.r2_write = r2_write


def _read_subset_ids(cfg):
    ids = set()
    if cfg.subset_file:
        with open(cfg.subset_file) as f:
            for line in f:
                ids.update(line.split())
    ids.update(cfg.set_names_list)
    return ids


def _parse_make_set(ds, cfg, log):
    """--make-set range file -> (names, per-set (lo, hi) half-open
    filtered-index ranges); names natural-sorted + deduped
    (load_range_list, 1.9/plink_set.c:274)."""
    ci = ds.vi.chr_info
    border = cfg.make_set_border
    collapse_group = cfg.make_set_collapse_group
    subset = _read_subset_ids(cfg) if (
        cfg.subset_file or cfg.set_names_list) else None
    inc = np.flatnonzero(ds.variant_mask)
    chrom_f = ds.vi.chrom[inc]
    pos_f = ds.vi.pos[inc].astype(np.int64)
    chrom_slices = {}
    for c in np.unique(chrom_f):
        w = np.flatnonzero(chrom_f == c)
        chrom_slices[int(c)] = (int(w[0]), int(w[-1]) + 1)
    rows = []
    with open(cfg.make_set) as f:
        for ln, line in enumerate(f, 1):
            t = line.split()
            if not t:
                continue
            need = 5 if collapse_group else 4
            if len(t) < need:
                raise ValueError(
                    f"Line {ln} of --make-set file has fewer tokens than "
                    "expected.")
            name = t[4] if collapse_group else t[3]
            if subset is not None and t[3] not in subset:
                continue
            try:
                code = ci.code(t[0])
            except Exception:
                raise ValueError(
                    f"Invalid chromosome code on line {ln} of --make-set "
                    "file.")
            start, end = int(t[1]), int(t[2])
            if end < start:
                raise ValueError(
                    "Range end position smaller than range start on line "
                    f"{ln} of --make-set file.")
            rows.append((name, int(code), max(0, start - border),
                         end + border))
    names = sorted({r[0] for r in rows}, key=_natural_key)
    if not names:
        log.log("Warning: No valid ranges in --make-set file.")
        return [], []
    name_idx = {n: i for i, n in enumerate(names)}
    members = [set() for _ in names]
    for name, code, lo, hi in rows:
        cs = chrom_slices.get(code)
        if cs is None:
            continue
        s0, s1 = cs
        a = s0 + int(np.searchsorted(pos_f[s0:s1], lo, "left"))
        b = s0 + int(np.searchsorted(pos_f[s0:s1], hi, "right"))
        if b > a:
            members[name_idx[name]].update(range(a, b))
    return names, members


def _parse_set_file(ds, cfg, log):
    """--set file (NAME / variant IDs / END blocks) -> (names, member
    sets of filtered indices).  Unknown variant IDs are ignored."""
    subset = _read_subset_ids(cfg) if (
        cfg.subset_file or cfg.set_names_list) else None
    inc = np.flatnonzero(ds.variant_mask)
    id_to_idx = {str(v): i for i, v in enumerate(ds.vi.vid[inc])}
    names, members = [], []
    cur = None
    cur_name = None
    in_set = 0
    with open(cfg.set_file) as f:
        for line in f:
            for tok in line.split():
                if tok == "END":
                    if not in_set:
                        raise ValueError("Extra 'END' token in --set file.")
                    if in_set == 1:
                        names.append(cur_name)
                        members.append(cur)
                    in_set = 0
                elif not in_set:
                    if subset is not None and tok not in subset:
                        in_set = 2
                        continue
                    cur_name = tok
                    cur = set()
                    in_set = 1
                elif in_set == 1:
                    i = id_to_idx.get(tok)
                    if i is not None:
                        cur.add(i)
    if in_set:
        raise ValueError("Last token in --set file isn't 'END'.")
    return names, members


def define_sets(ds, cfg, log: RunLogger) -> SetInfo | None:
    """Load --set/--make-set and apply --gene/--gene-all prefiltering
    (which narrows ds.variant_mask before setdefs are finalized).
    Reference: define_sets (1.9/plink_set.c:1003)."""
    is_make = cfg.make_set is not None
    complement = cfg.complement_sets or (
        cfg.make_set_complement_all is not None)
    merged = cfg.set_collapse_all or cfg.make_set_complement_all
    gene_filter = cfg.gene_all or bool(cfg.gene_list)

    M0 = int(ds.variant_mask.sum())
    if is_make:
        names, members = _parse_make_set(ds, cfg, log)
    else:
        names, members = _parse_set_file(ds, cfg, log)
    if not names:
        return None

    # --gene / --gene-all variant prefilter (plink_set.c:1197-1345)
    if gene_filter:
        genekeep = set(cfg.gene_list) if cfg.gene_list else None
        if complement:
            # keep variants outside at least one kept set
            inter = np.ones(M0, bool)
            for n, mem in zip(names, members):
                if genekeep is not None and n not in genekeep:
                    continue
                row = np.zeros(M0, bool)
                row[list(mem)] = True
                inter &= row
            keep = ~inter
        else:
            keep = np.zeros(M0, bool)
            for n, mem in zip(names, members):
                if genekeep is not None and n not in genekeep:
                    continue
                keep[list(mem)] = True
        if not keep.any():
            raise ValueError("All variants excluded by --gene/--gene-all.")
        inc0 = np.flatnonzero(ds.variant_mask)
        newmask = np.zeros_like(ds.variant_mask)
        newmask[inc0[keep]] = True
        ds.variant_mask = newmask
        ds.invalidate_counts()
        old_to_new = np.full(M0, -1, np.int64)
        old_to_new[keep] = np.arange(int(keep.sum()))
        members = [
            {int(old_to_new[i]) for i in mem if keep[i]}
            for mem in members
        ]
        M0 = int(keep.sum())

    if merged:
        u = set()
        for mem in members:
            u |= mem
        names = [merged]
        members = [u]
    if complement:
        full = set(range(M0))
        members = [full - mem for mem in members]

    setdefs = [np.array(sorted(mem), np.int64) for mem in members]
    log.log(f"--{'make-' if is_make else ''}set: {len(names)} set"
            f"{'' if len(names) == 1 else 's'} defined.")
    return SetInfo(names, setdefs, cfg.set_r2, cfg.set_p, cfg.set_max,
                   cfg.set_test_lambda, cfg.set_r2_write)


def run_write_set(ds, sinfo: SetInfo, cfg, log: RunLogger) -> None:
    """--write-set (.set) and --set-table outputs
    (write_set, 1.9/plink_set.c:1713)."""
    inc = np.flatnonzero(ds.variant_mask)
    vids = ds.vi.vid[inc]
    ci = ds.vi.chr_info
    if cfg.set_table:
        path = cfg.out + ".set.table"
        with open(path, "w") as f:
            f.write("SNP\tCHR\tBP")
            for n in sinfo.names:
                f.write("\t" + n)
            f.write("\n")
            in_set = np.zeros((sinfo.ct, inc.size), bool)
            for si, sd in enumerate(sinfo.setdefs):
                in_set[si, sd] = True
            chroms = ds.vi.chrom[inc]
            poss = ds.vi.pos[inc]
            for m in range(inc.size):
                f.write(f"{vids[m]}\t{ci.name(int(chroms[m]))}\t{poss[m]}")
                f.write("\t" + "\t".join(
                    "1" if in_set[si, m] else "0"
                    for si in range(sinfo.ct)) + "\n")
        log.log(f"--set-table: {path} written.")
    if cfg.write_set:
        path = cfg.out + ".set"
        with open(path, "w") as f:
            for n, sd in zip(sinfo.names, sinfo.setdefs):
                f.write(n + "\n")
                for m in sd:
                    f.write(str(vids[m]) + "\n")
                f.write("END\n\n")
        log.log(f"--write-set: {path} written.")


# ---------------------------------------------------------------------------
# same-set LD map + set test
# ---------------------------------------------------------------------------

_SMALL_EPSILON = 0.00000000000005684341886080801486968994140625  # 2^-44


def construct_ld_map(ds, sinfo: SetInfo, set_incl, pheno_nm_raw, cfg,
                     log: RunLogger, inc=None):
    """Same-set marker pairs with r^2 > set_r2*(1-eps): genotype-vector
    correlation over founders with nonmissing phenotype
    (construct_ld_map / ld_map_thread, 1.9/plink_ld.c:11841,11732).
    Returns dict marker_idx -> sorted np.ndarray of linked marker idxs.
    set_r2 > 1 disables the check (plink.c --set-r2 handling).

    Optionally writes the map to <out>.ldset ('--set-r2 write')."""
    from ..ops.pairwise import _unpack_np

    ld_map: dict[int, set] = {}
    if sinfo.set_r2 > 1.0:
        M = int(ds.variant_mask.sum()) if inc is None else int(inc.size)
        return {m: np.zeros(0, np.int64) for m in range(M)}
    r2_thresh = sinfo.set_r2 * (1 - _SMALL_EPSILON)
    nraw = ds.raw_sample_ct
    founder = ds.founder_mask[:nraw] & ds.sample_mask[:nraw] & pheno_nm_raw
    if not founder.any():
        raise ValueError(
            "Cannot construct LD map, since there are no founders with "
            "nonmissing phenotypes.  (--make-founders may come in handy "
            "here.)")
    fidx = np.flatnonzero(founder)
    if inc is None:
        inc = np.flatnonzero(ds.variant_mask)
    need = sorted({int(m) for si, sd in enumerate(sinfo.setdefs)
                   if set_incl[si] for m in sd})
    codes = _unpack_np(ds.all_packed())[:, :nraw]
    centered = {}
    nonmiss = {}
    for m in need:
        g = codes[int(inc[m])][fidx].astype(np.int64)
        miss = g == 3
        centered[m] = np.where(miss, 0, g - 1)
        nonmiss[m] = ~miss
        ld_map[m] = set()
    done = set()
    for si, sd in enumerate(sinfo.setdefs):
        if not set_incl[si]:
            continue
        sl = [int(x) for x in sd]
        for ii in range(len(sl)):
            m1 = sl[ii]
            a_full, nm1 = centered[m1], nonmiss[m1]
            for jj in range(ii + 1, len(sl)):
                m2 = sl[jj]
                if (m1, m2) in done:
                    continue
                done.add((m1, m2))
                sh = nm1 & nonmiss[m2]
                n = int(sh.sum())
                if not n:
                    continue
                a = a_full[sh]
                b = centered[m2][sh]
                nd = float(n)
                dxx = float(a.sum())
                dyy = float(b.sum())
                cov12 = float((a * b).sum()) * nd - dxx * dyy
                den = (float((a * a).sum()) * nd - dxx * dxx) * \
                    (float((b * b).sum()) * nd - dyy * dyy)
                if cov12 * cov12 > r2_thresh * den:
                    ld_map[m1].add(m2)
                    ld_map[m2].add(m1)
    out = {m: np.array(sorted(s), np.int64) for m, s in ld_map.items()}
    if sinfo.r2_write:
        path = cfg.out + ".ldset"
        vids = ds.vi.vid[inc]
        with open(path, "w") as f:
            for si, sd in enumerate(sinfo.setdefs):
                if not set_incl[si]:
                    continue
                for m in sd:
                    lm = out.get(int(m))
                    if lm is None or not lm.size:
                        continue
                    f.write(f"{sinfo.names[si]} {vids[int(m)]} "
                            + " ".join(str(vids[int(x)]) for x in lm)
                            + "\n")
        log.log(f"--set-r2 write: LD map written to {path} .")
    return out


def _in_sorted(arr: np.ndarray, v: int) -> bool:
    k = int(np.searchsorted(arr, v))
    return k < arr.size and int(arr[k]) == v


def set_test_score(chisq, threshold, set_max, ld_map, setdef):
    """Greedy independent-representative mean chi-square
    (set_test_score, 1.9/plink_ld.c:12265).  Returns
    (score, raw_sig_ct, final_sig_ct, proxies)."""
    sig = [int(m) for m in setdef if chisq[m] >= threshold]
    if not sig:
        return 0.0, 0, 0, []
    order = sorted(range(len(sig)), key=lambda k: (chisq[sig[k]], sig[k]))
    proxies: list[int] = []
    chi_sum = 0.0
    for k in reversed(order):
        m = sig[k]
        conflict = False
        for p in proxies:
            lm = ld_map.get(p)
            if lm is not None and lm.size and _in_sorted(lm, m):
                conflict = True
                break
        if conflict:
            continue
        proxies.append(m)
        chi_sum += chisq[m]
        if len(proxies) == set_max:
            break
    return chi_sum / len(proxies), len(sig), len(proxies), proxies


def _fw(s: str, width: int) -> str:
    return s.rjust(width)


def write_set_test_results(path, sinfo, ld_map, set_incl, chisq_threshold,
                           orig_chisq, perm_2success, perm_attempts,
                           perm_count, vids, log, pfilter=1.0,
                           output_min_p=0.0):
    """SET NSNP NSIG ISIG EMP1 [NP] SNPS report
    (write_set_test_results, 1.9/plink_ld.c:12550)."""
    from .assoc19 import _g4

    with open(path, "w") as f:
        f.write("         SET   NSNP   NSIG   ISIG         EMP1 "
                + ("          NP " if perm_count else "") + "SNPS\n")
        sidx = 0
        for su in range(sinfo.ct):
            line = _fw(sinfo.names[su], 12) + " "
            line += _fw(str(len(sinfo.setdefs[su])), 6) + " "
            if set_incl[su]:
                score, raw_sig, final_sig, proxies = set_test_score(
                    orig_chisq, chisq_threshold, sinfo.set_max, ld_map,
                    sinfo.setdefs[su])
                line += _fw(str(raw_sig), 6) + " "
                line += _fw(str(final_sig), 6) + " "
                pval = (perm_2success[sidx] + 2) / \
                    (2.0 * (perm_attempts[sidx] + 1))
                if pval <= pfilter:
                    if not perm_count:
                        line += _g4(max(pval, output_min_p), 12) + " "
                    else:
                        line += _g4(perm_2success[sidx] * 0.5, 12) + "   "
                        line += _fw(str(int(perm_attempts[sidx])), 10) + " "
                    line += "|".join(str(vids[p]) for p in proxies)
                    f.write(line + "\n")
                sidx += 1
            else:
                if not perm_count:
                    line += "     0      0            1 NA"
                else:
                    line += "     0      0            0            0 NA"
                f.write(line + "\n")
    log.log(f"Set test results written to {path} .")


def run_assoc_set_test(ds, cfg, log, sinfo: SetInfo, orig_chisq_mid, inc,
                       a1_is_alt, set_cts, miss_cts, case, ctrl, out_base,
                       perm_adapt, mperm_val, perm_count):
    """--assoc perm/mperm set-test engine
    (model_assoc_set_test + assoc_set_thread + compute_set_scores,
    1.9/plink_assoc.c:5603,2737; 1.9/plink_ld.c:12508).

    orig_chisq_mid: chi-square per filtered marker (-9 = NA); inc:
    filtered marker uidx array; case/ctrl: raw-sample bool masks;
    set_cts/miss_cts: the observed A1/missing margins from
    assoc_allele_counts (same orientation as the permuted counts)."""
    from ..stats.assoc_perm19 import EPSILON, chi22_eval
    from ..stats.cdflib19 import inverse_chiprob1
    from ..stats.perm19 import (generate_cc_cluster_perm, generate_cc_perm,
                                master_sfmt, reindex_clusters_19,
                                sfmt_thread_array)
    from ..ops.pairwise import _unpack_np
    from ..utils.chrom import MT_CODE, X_CODE, Y_CODE
    from .cluster import _ltqnorm

    vi = ds.vi
    nraw = ds.raw_sample_ct
    orig_chisq = np.asarray(orig_chisq_mid, np.float64).copy()
    if sinfo.set_test_lambda > 1.0:
        orig_chisq *= 1.0 / sinfo.set_test_lambda
    chisq_threshold = inverse_chiprob1(sinfo.set_p)
    path = out_base + (".set.perm" if perm_adapt else ".set.mperm")

    set_incl = np.zeros(sinfo.ct, bool)
    for si, sd in enumerate(sinfo.setdefs):
        if sd.size and (orig_chisq[sd] >= chisq_threshold).any():
            set_incl[si] = True
    set_ct = int(set_incl.sum())
    if not set_ct:
        log.log(
            "Warning: No significant variants in any set.  Skipping "
            "permutation-based set test.")
        write_set_test_results(
            path, sinfo, {}, set_incl, chisq_threshold, orig_chisq,
            [], [], perm_count, vi.vid[inc], log)
        return
    log.log(
        f"--assoc/--model set test: Testing {set_ct} set"
        f"{'' if set_ct == 1 else 's'} with at least one significant "
        "variant.")

    nm_mask = (case | ctrl)[:nraw]
    ld_map = construct_ld_map(ds, sinfo, set_incl, nm_mask, cfg, log,
                              inc=inc)

    live_sets = [sinfo.setdefs[si] for si in range(sinfo.ct)
                 if set_incl[si]]
    orig_scores = np.array([
        set_test_score(orig_chisq, chisq_threshold, sinfo.set_max,
                       ld_map, sd)[0]
        for sd in live_sets
    ])
    union = sorted({int(m) for sd in live_sets for m in sd})
    u_index = {m: k for k, m in enumerate(union)}

    nm_idx = np.flatnonzero(nm_mask)
    case_nm = case[:nraw][nm_idx]
    case_ct = int(case_nm.sum())
    n_nm = nm_idx.size
    male = ds.male_mask()[:nraw][nm_idx]

    if perm_adapt:
        ap_min, ap_max, ap_alpha, ap_beta, ap_init, ap_slope = cfg.aperm
        perms_total = ap_max
        adaptive_ci_zt = _ltqnorm(1 - ap_beta / (2.0 * set_ct))
        first_adapt_check = int(ap_init) if ap_min < ap_init else ap_min
    else:
        perms_total = mperm_val
        first_adapt_check = perms_total + 1
        ap_init = ap_slope = ap_alpha = adaptive_ci_zt = 0.0

    perm_batch = cfg.perm_batch_size or 512
    thread_ct = min(cfg.threads or 1, perms_total)
    master = master_sfmt(cfg)
    clusters = None
    if cfg.within or cfg.family:
        from .cmh import load_clusters_19

        _names, assign = load_clusters_19(ds, cfg)
        members, case_cts, preimage, _s2c = reindex_clusters_19(
            assign[nm_idx], case_nm)
        if not members:
            raise ValueError("No size 2+ clusters for permutation test.")
        clusters = (members, case_cts, preimage)
    sfmts = sfmt_thread_array(master, thread_ct)

    codes = _unpack_np(ds.all_packed())[:, :nraw]
    pheno_nm_ct = n_nm

    # per-marker permutation-invariant weights (same recipe as
    # _assoc_perm_engine, commands/assoc19.py — byte-parity tested there)
    minv = {}
    for m in union:
        k_mid = int(m)
        v = int(inc[k_mid])
        chrom = int(vi.chrom[v])
        is_x = chrom == X_CODE
        is_y = chrom == Y_CODE
        is_hap = is_y or chrom == MT_CODE
        raw = codes[v][nm_idx]
        g = raw if a1_is_alt[v] \
            else np.where(raw == 3, 3, 2 - raw).astype(raw.dtype)
        g = g.astype(np.int64)
        if not (is_x or is_hap):
            min_ploidy = 2
            setw = np.choose(np.minimum(g, 3),
                             [2, 1, 0, 0]).astype(np.int64)
            missw = (g == 3).astype(np.int64)
            row1x = 2 * case_ct
            tot_obs = 2 * (pheno_nm_ct - int(miss_cts[k_mid]))
        elif is_x:
            min_ploidy = 1
            setw = np.where(male, (g == 0).astype(np.int64),
                            np.choose(np.minimum(g, 3), [2, 1, 0, 0]))
            missw = np.where(
                male, 1 + ((g == 1) | (g == 3)).astype(np.int64),
                2 * (g == 3).astype(np.int64))
            row1x = 2 * case_ct
            tot_obs = 2 * pheno_nm_ct - int(miss_cts[k_mid])
        else:
            min_ploidy = 1
            if is_y:
                setw = np.where(male, (g == 0).astype(np.int64), 0)
                missw = np.where(
                    male, ((g == 1) | (g == 3)).astype(np.int64), 1)
            else:
                setw = (g == 0).astype(np.int64)
                missw = ((g == 1) | (g == 3)).astype(np.int64)
            row1x = case_ct
            tot_obs = pheno_nm_ct - int(miss_cts[k_mid])
        minv[m] = (setw, missw, row1x, tot_obs, min_ploidy,
                   int(set_cts[k_mid]), orig_chisq[k_mid] == -9)

    perm_2success = np.zeros(set_ct, np.int64)
    perm_attempts = np.full(set_ct, perms_total, np.int64)
    set_unstopped = np.ones(set_ct, bool)
    perms_done = 0
    union_live = np.ones(len(union), bool)

    while perms_done < perms_total:
        if perms_done:
            while first_adapt_check <= perms_done:
                first_adapt_check += int(
                    ap_init + first_adapt_check * ap_slope)
        pv = min(perm_batch, perms_total - perms_done)
        gen_tc = min(thread_ct, pv)
        perms = np.zeros((pv, n_nm), bool)
        for tidx in range(gen_tc):
            p0 = (tidx * pv) // gen_tc
            p1 = ((tidx + 1) * pv) // gen_tc
            for p in range(p0, p1):
                if clusters is None:
                    perms[p] = generate_cc_perm(n_nm, case_ct, sfmts[tidx])
                else:
                    members, case_cts, preimage = clusters
                    perms[p] = generate_cc_cluster_perm(
                        n_nm, preimage, members, case_cts, sfmts[tidx])
        permsi = perms.astype(np.int64)

        # chi-square battery over the union (assoc_set_thread arithmetic:
        # chi22_eval(case_set, row1x - case_missing * min_ploidy,
        # col1_sum, tot_obs); NA markers stay -9)
        chisq_mat = np.full((pv, len(union)), -9.0)
        for k, m in enumerate(union):
            if not union_live[k]:
                continue
            setw, missw, row1x, tot_obs, min_ploidy, col1, na = minv[m]
            if na:
                continue
            case_set = permsi @ setw
            case_miss = permsi @ missw
            chisq_mat[:, k] = [
                chi22_eval(int(cs), row1x - int(cm) * min_ploidy, col1,
                           tot_obs)
                for cs, cm in zip(case_set, case_miss)
            ]
        perms_done += pv

        # compute_set_scores (1.9/plink_ld.c:12508)
        pidx_offset = perms_done - pv
        union_arr = np.array(union, np.int64)
        M_mid = int(inc.size)
        for sidx, sd in enumerate(live_sets):
            if not set_unstopped[sidx]:
                continue
            next_adapt_check = first_adapt_check
            uii = int(perm_2success[sidx])
            stat_high = orig_scores[sidx] + EPSILON
            stat_low = orig_scores[sidx] - EPSILON
            pidx = 0
            while pidx < pv:
                # scatter this permutation's chisq row back to mid-marker
                # index space (the key space of ld_map / setdefs)
                chis = np.full(M_mid, -9.0)
                chis[union_arr] = chisq_mat[pidx]
                cur = set_test_score(chis, chisq_threshold,
                                     sinfo.set_max, ld_map, sd)[0]
                if cur > stat_high:
                    uii += 2
                elif cur > stat_low:
                    uii += 1
                pidx += 1
                if pidx == next_adapt_check - pidx_offset:
                    if uii:
                        pval = (uii + 2) / (2.0 * (next_adapt_check + 1))
                        dxx = adaptive_ci_zt * math.sqrt(
                            pval * (1 - pval) / next_adapt_check)
                        if (pval - dxx > ap_alpha) or \
                                (pval + dxx < ap_alpha):
                            set_unstopped[sidx] = False
                            perm_attempts[sidx] = next_adapt_check
                            break
                    next_adapt_check += int(
                        ap_init + next_adapt_check * ap_slope)
            perm_2success[sidx] = uii
        if perms_done < perms_total and perm_adapt:
            if not set_unstopped.any():
                break
            live = np.zeros(len(union), bool)
            for sidx, sd in enumerate(live_sets):
                if set_unstopped[sidx]:
                    for m in sd:
                        live[u_index[int(m)]] = True
            union_live = live
    log.log(f"{perms_done} permutation"
            f"{'' if perms_done == 1 else 's'} complete.")

    write_set_test_results(
        path, sinfo, ld_map, set_incl, chisq_threshold, orig_chisq,
        perm_2success, perm_attempts, perm_count, vi.vid[inc], log,
        pfilter=getattr(cfg, "pfilter", None) or 1.0,
        output_min_p=getattr(cfg, "output_min_p", 0.0) or 0.0)
