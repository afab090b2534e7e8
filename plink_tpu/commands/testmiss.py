"""--test-missing: case/control missingness Fisher test, PLINK 1.9
parity.

Behavior reference: testmiss (1.9/plink_assoc.c:9971-10260) and
fisher22 (1.9/plink_stats.c:771).

Per variant: missing-call counts among nonmissing-phenotype cases and
controls (chrY restricted to males; het-haploid calls on X/Y treated
as missing per haploid_fix), two-sided Fisher exact p (optional midp),
written to <out>.missing.  Sites with zero or all-missing calls are
skipped.  Adaptive (perm) and max(T) (mperm=) permutation modes are
implemented (see the module-level notes on the upstream maxt bug).
"""

from __future__ import annotations

import numpy as np

from ..cli import FlagError
from ..dataset import Dataset
from ..stats.binom19 import fisher22
from ..utils.chrom import MT_CODE, X_CODE, Y_CODE
from ..utils.logging import RunLogger
from .homozyg import _fw_width
from .assoc19 import _fw, _g4


def run_test_missing(ds: Dataset, cfg, log: RunLogger) -> None:
    mods = set(cfg.test_missing)
    midp = "midp" in mods
    perm_adapt = "perm" in mods
    perm_count = "perm-count" in mods
    mperm_val = None
    for m in mods - {"midp", "perm", "perm-count"}:
        if m.startswith("mperm="):
            mperm_val = int(m.split("=", 1)[1])
            continue
        raise FlagError(f"Invalid --test-missing modifier '{m}'.")
    do_perm = perm_adapt or mperm_val is not None
    si, vi = ds.si, ds.vi
    pc = next(iter(si.phenos.values()), None)
    if pc is None or pc.kind != "cc":
        raise FlagError(
            "--test-missing requires a case/control phenotype.")
    pheno_nm = pc.nonmiss & ds.sample_mask
    case = pheno_nm & (pc.data == 1)
    case_ct = int(case.sum())
    ctrl_ct = int(pheno_nm.sum()) - case_ct
    if not case_ct or not ctrl_ct:
        log.log(
            "Warning: Skipping --test-missing since at least one case "
            "and one control is required.")
        return
    male = ds.male_mask()
    male_nm = pheno_nm & male
    case_y = int((case & male).sum())
    ctrl_y = int(male_nm.sum()) - case_y
    skip_y = not (case_y and ctrl_y)
    if skip_y and (vi.chrom == Y_CODE).any():
        log.log(
            "Warning: --test-missing is skipping Y chromosome since at "
            "least one male case and one male control are necessary.")

    from ..ops.pairwise import _unpack_np

    codes = _unpack_np(ds.all_packed())[:, : ds.raw_sample_ct]
    maxsnp = _fw_width(
        len(str(vi.vid[i])) for i in np.flatnonzero(ds.variant_mask))
    ci = vi.chr_info
    out = cfg.out + ".missing"
    fh = open(out, "w")
    fh.write(" CHR " + "SNP".rjust(maxsnp)
             + "     F_MISS_A     F_MISS_U            P \n")
    case_recip = 1.0 / case_ct
    ctrl_recip = 1.0 / ctrl_ct
    case_y_recip = 1.0 / case_y if case_y else 0.0
    ctrl_y_recip = 1.0 / ctrl_y if ctrl_y else 0.0
    n = ds.raw_sample_ct
    perm_rows = []   # (v, chrom, is_y, pval, miss_nm_bits, mct)
    nm_idx = np.flatnonzero(pheno_nm[:n])
    for v in np.flatnonzero(ds.variant_mask):
        chrom = int(vi.chrom[v])
        is_x = chrom == X_CODE
        is_y = chrom == Y_CODE
        if is_y and skip_y:
            continue
        row = codes[v]
        if is_x:
            # haploid_fix: male het -> missing
            miss = (row == 3) | ((row == 1) & male[:n])
        elif is_y:
            # hh_reset_y: nonmales forced missing; male hets missing
            miss = (row == 3) | (row == 1) | ~male[:n]
        else:
            miss = row == 3
        if is_y:
            cur_nm = male_nm
            cur_case, cur_ctrl = case_y, ctrl_y
            cr, ur = case_y_recip, ctrl_y_recip
            cur_case_mask = case & male
        else:
            cur_nm = pheno_nm
            cur_case, cur_ctrl = case_ct, ctrl_ct
            cr, ur = case_recip, ctrl_recip
            cur_case_mask = case
        mct = int((miss & cur_nm[:n]).sum())
        if not mct or mct == int(cur_nm.sum()):
            continue
        uii = int((miss & cur_case_mask[:n]).sum())
        ujj = mct - uii
        pval = fisher22(uii, ujj, cur_case - uii, cur_ctrl - ujj, midp)
        line = (_fw(ci.name19(chrom), 4) + " "
                + _fw(str(vi.vid[v]), maxsnp) + " "
                + _g4(uii * cr, 12) + " " + _g4(ujj * ur, 12) + " "
                + _g4(max(pval, 0.0), 12))
        fh.write(line + "\n")
        if do_perm:
            mb = (miss & male[:n]) if is_y else miss
            perm_rows.append((v, chrom, is_y, pval,
                              mb[nm_idx].copy(), mct))
    fh.close()
    log.log(f"Writing --test-missing report to {out} ... done.")
    if do_perm:
        _testmiss_perm(ds, cfg, log, perm_rows, pheno_nm, case,
                       male, midp, perm_count, maxsnp, out,
                       mperm_val)


def _testmiss_perm(ds, cfg, log, perm_rows, pheno_nm, case, male,
                   midp, perm_count, maxsnp, out_base, mperm_val=None):
    """--test-missing perm: adaptive missingness permutation
    (testmiss_adapt_thread, 1.9/plink_assoc.c:9690).  The non-Y path
    classifies case-missing counts against a per-marker
    fisher22_precomp_pval_bounds table; Y markers evaluate fisher22
    directly with per-permutation male case counts.

    Known upstream divergence (mperm): plink 1.9's testmiss_maxt_thread
    produces corrupted permutations -- exactly half of every run's
    permuted p-values collapse to one extreme value (verified at
    mperm=120 and 256 on this build; its own adaptive mode agrees with
    OUR mperm estimates instead), so .missing.mperm is validated
    structurally + statistically rather than byte-diffed."""
    from ..stats.assoc_perm19 import (EPSILON, adaptive_scan,
                                      fisher22_precomp_pval_bounds,
                                      fisher22_tail_pval)
    from ..stats.perm19 import (cc_perm_matrix, master_sfmt,
                                reindex_clusters_19)
    from .cluster import _ltqnorm

    vi = ds.vi
    ci = vi.chr_info
    n = ds.raw_sample_ct
    nm_idx = np.flatnonzero(pheno_nm[:n])
    n_nm = nm_idx.size
    case_nm = case[:n][nm_idx]
    case_ct = int(case_nm.sum())
    male_nm_bits = male[:n][nm_idx]
    M = len(perm_rows)
    perm_adapt = mperm_val is None
    ap_min, ap_max, ap_alpha, ap_beta, ap_init, ap_slope = cfg.aperm
    perms_total = ap_max if perm_adapt else mperm_val
    ci_zt = _ltqnorm(1 - ap_beta / (2.0 * M))
    first_adapt_check = int(ap_init) if ap_min < ap_init else ap_min
    thread_ct = min(cfg.threads or 1, perms_total)
    master = master_sfmt(cfg)
    clusters = None
    if cfg.within or cfg.family:
        from .cmh import load_clusters_19

        _names, assign = load_clusters_19(ds, cfg)
        members, case_cts, preimage, _ = reindex_clusters_19(
            assign[nm_idx], case_nm)
        if not members:
            raise FlagError(
                "Error: Degenerate --test-missing invocation (no "
                "size 2+ clusters).")
        clusters = (members, case_cts, preimage)
    perms = cc_perm_matrix(case_nm, perms_total, thread_ct, master,
                           clusters)
    permsi = perms.astype(np.int64)
    male_case_cts = permsi @ male_nm_bits.astype(np.int64)

    success2 = np.zeros(M, np.int64)
    attempt = np.full(M, perms_total, np.int64)
    extremes = None
    maxt_pending = None
    block_boundary: set = set()
    if not perm_adapt:
        # max(T): running per-permutation extreme p-values, with the
        # per-marker tail-precomp threshold refreshed at the reference's
        # block boundaries (testmiss_maxt_thread,
        # 1.9/plink_assoc.c:9827-9950; extreme init p=1 at :6180)
        extremes = np.ones(perms_total)
        maxt_pending = np.ones(M)
        bstarts = [0]
        nxt = 64
        while nxt < M:
            bstarts.append(nxt)
            nxt += 960
        block_boundary = set(bstarts)
    for k, (v, chrom, is_y, pval, mb, mct) in enumerate(perm_rows):
        if extremes is not None and k in block_boundary and k:
            maxt_pending[k:] = float(extremes.max())
        mbi = mb.astype(np.int64)
        miss_case = permsi @ mbi
        outcomes = np.zeros(perms_total, np.int64)
        if not is_y:
            b, _c = fisher22_precomp_pval_bounds(
                pval, midp, case_ct, mct, n_nm)
            if not perm_adapt:
                b2, tp = fisher22_precomp_pval_bounds(
                    maxt_pending[k], midp, case_ct, mct, n_nm)
                t_start, t_width = b2[2], b2[3] - b2[2]
                nm_sum = n_nm - mct
            for p in range(perms_total):
                mc = int(miss_case[p])
                if mc < b[0]:
                    outcomes[p] = 2 if mc < b[2] else 1
                elif mc >= b[1]:
                    outcomes[p] = 2 if mc >= b[3] else 1
                if not perm_adapt and not (0 <= mc - t_start < t_width):
                    if tp is not None:
                        sval = fisher22_tail_pval(
                            t_start, mct - t_start, case_ct - t_start,
                            nm_sum + t_start - case_ct, t_width - 1,
                            tp[0], tp[1], midp, mc)
                        if extremes[p] > sval:
                            extremes[p] = sval
        else:
            stat_high = pval * (1.0 + EPSILON)
            stat_low = pval * (1.0 - EPSILON)
            nm_sum = int(male_nm_bits.sum()) - mct
            for p in range(perms_total):
                mc = int(miss_case[p])
                cc = int(male_case_cts[p])
                dxx = fisher22(mc, cc - mc, mct - mc,
                               nm_sum + mc - cc, midp)
                if dxx < stat_low:
                    outcomes[p] = 2
                elif dxx <= stat_high:
                    outcomes[p] = 1
                if not perm_adapt and extremes[p] > dxx:
                    extremes[p] = dxx
        if perm_adapt:
            s2i, stopped, nac = adaptive_scan(
                outcomes, 0, first_adapt_check, 0, ap_init, ap_slope,
                ap_alpha, ci_zt, perms_total)
            success2[k] = s2i
            if stopped:
                attempt[k] = nac
        else:
            success2[k] = int(outcomes.sum())

    outp = out_base + (".perm" if perm_adapt else ".mperm")
    fh = open(outp, "w")
    if perm_adapt:
        fh.write(" CHR " + "SNP".rjust(maxsnp)
                 + "         EMP1           NP \n")
        perms_done = 0
        for k in range(M):
            if attempt[k] > perms_done:
                perms_done = int(attempt[k])
                if perms_done == perms_total:
                    break
        log.log(f"{perms_done} (adaptive) permutation"
                f"{'' if perms_done == 1 else 's'} complete.")
    else:
        fh.write(" CHR " + "SNP".rjust(maxsnp)
                 + "         EMP1         EMP2 \n")
        sorted_ext = np.sort(extremes)
        log.log(f"{perms_total} max(T) permutation"
                f"{'' if perms_total == 1 else 's'} complete.")
    dyy = 1.0 / (perms_total + 1)
    for k, (v, chrom, is_y, pval, mb, mct) in enumerate(perm_rows):
        line = (ci.name19(chrom).rjust(4) + " "
                + _fw(str(vi.vid[v]), maxsnp) + " ")
        pv = (int(success2[k]) + 2) / (2 * (int(attempt[k]) + 1))
        if not perm_count:
            line += _g4(pv, 12) + " "
        else:
            line += _g4(int(success2[k]) * 0.5, 12) + " "
        if perm_adapt:
            line += "  " + str(int(attempt[k])).rjust(10)
        else:
            dzz = int(np.searchsorted(
                sorted_ext, pval * (1.0 + EPSILON), side="right")) + 1
            if not perm_count:
                line += _g4(dzz * dyy, 12)
            else:
                line += _g4(float(dzz - 1), 12)
        fh.write(line + " \n")
    fh.close()
    log.log(f"Permutation test report written to {outp} .")
