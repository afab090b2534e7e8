"""QT --assoc (.qassoc / .qassoc.means), PLINK 1.9 parity.

Behavior reference: qassoc (1.9/plink_assoc.c:8089-8900): simple linear
regression of phenotype on minor-allele count with the reference's
precompute-and-adjust float op order, Wald t p-value via calc_tprob
(plink_stats.c), optional 'lin' statistic and 'qt-means' report.
Haploid fixes (X male het / Y nonmale / MT het -> missing) use the
proper collapsed filters (alloc_collapsed_haploid_filters path).
"""

from __future__ import annotations

import math

import numpy as np

from ..dataset import Dataset
from ..stats.distributions import t_logsf
from ..utils.chrom import MT_CODE, X_CODE, Y_CODE
from ..utils.logging import RunLogger
from .homozyg import _fw_width
from .assoc19 import _fw, _g4


def calc_tprob(tstat, df):
    """calc_tprob (1.9/plink_stats.c): 2 * upper tail, -9 on error."""
    if not math.isfinite(tstat) or df <= 0:
        return -9.0
    try:
        p = 2 * math.exp(t_logsf(abs(tstat), df))
    except (ValueError, OverflowError):
        return -9.0
    if not math.isfinite(p):
        return -9.0
    return p


def _seqsum(vals):
    """strict left-to-right f64 sum."""
    if len(vals) == 0:
        return 0.0
    return float(np.cumsum(np.asarray(vals, np.float64))[-1])


def run_qassoc(ds: Dataset, cfg, log: RunLogger) -> None:
    mods = set(cfg.assoc_mods)
    qt_means = "qt-means" in mods
    do_lin = "lin" in mods
    perm_adapt = "perm" in mods
    mperm_val = None
    for m in mods:
        if m.startswith("mperm="):
            mperm_val = int(m.split("=", 1)[1])
    perm_count = "perm-count" in mods
    do_perms = perm_adapt or mperm_val is not None
    si, vi = ds.si, ds.vi
    pc = next(iter(si.phenos.values()), None)
    nraw = ds.raw_sample_ct
    nm = (pc.nonmiss & ds.sample_mask)[:nraw]
    nm_idx = np.flatnonzero(nm)
    pheno_nm_ct = nm_idx.size
    if pheno_nm_ct < 2:
        log.log("Warning: Skipping QT --assoc since less than two "
                "phenotypes are present.")
        return
    male = ds.male_mask()[:nraw]
    male_nm = male[nm_idx]
    pheno = pc.data[:nraw][nm_idx].astype(np.float64)
    pheno_sum = 0.0
    pheno_ssq = 0.0
    for d in pheno:
        pheno_sum += d
        pheno_ssq += d * d

    from ..ops.pairwise import _unpack_np
    from .basic_reports import alt_allele_freqs

    codes = _unpack_np(ds.all_packed())[:, :nraw]
    af = alt_allele_freqs(ds, founders_only=True)
    a1_is_alt = ~(af > 0.5)
    inc = np.flatnonzero(ds.variant_mask)
    maxsnp = _fw_width(len(str(vi.vid[i])) for i in inc)
    alt1 = vi.alt1()
    ci = vi.chr_info
    out = cfg.out + ".qassoc"
    fh = open(out, "w")
    hdr = (" CHR " + "SNP".rjust(maxsnp)
           + "         BP    NMISS       BETA         SE         R2"
           "        T            P ")
    if do_lin:
        hdr += "         LIN        LIN_P "
    fh.write(hdr + "\n")
    fhm = None
    if qt_means:
        fhm = open(cfg.out + ".qassoc.means", "w")
        fhm.write(" CHR " + "SNP".rjust(maxsnp)
                  + "  VALUE      G11      G12      G22\n")
    if any(int(c) in (X_CODE, Y_CODE, MT_CODE)
           for c in np.unique(vi.chrom[inc])):
        log.log("Warning: QT --assoc doesn't handle X/Y/MT/haploid "
                "variants normally (try\n--linear).")

    M = inc.size
    orig_tstat = np.zeros(M)
    orig_linsq_arr = np.zeros(M) if do_lin else None
    het_cts = np.zeros(M, np.int64)
    homrar_cts = np.zeros(M, np.int64)
    miss_cts = np.zeros(M, np.int64)

    for k, v in enumerate(inc):
        chrom = int(vi.chrom[v])
        raw = codes[v][nm_idx]
        g = raw if a1_is_alt[v] \
            else np.where(raw == 3, 3, 2 - raw).astype(raw.dtype)
        g = g.copy()  # minor count 0..2, 3=missing
        if chrom == X_CODE:
            g[(g == 1) & male_nm] = 3
        elif chrom == Y_CODE:
            g[(g == 1) | ~male_nm] = 3
        elif chrom == MT_CODE:
            g[g == 1] = 3
        het = int((g == 1).sum())
        homrar = int((g == 2).sum())
        missing = int((g == 3).sum())
        nanal = pheno_nm_ct - missing
        homcom = nanal - het - homrar
        geno_sum = 2 * homrar + het
        geno_ssq = 4 * homrar + het
        qt_sum = pheno_sum
        qt_ssq = pheno_ssq
        hetm = g == 1
        rarm = g == 2
        qt_g_prod = _seqsum(
            np.where(hetm, pheno, 2 * pheno)[hetm | rarm])
        qt_het_sum = qt_het_ssq = 0.0
        qt_homrar_sum = qt_homrar_ssq = 0.0
        if qt_means or do_lin:
            ph = pheno[hetm]
            qt_het_sum = _seqsum(ph)
            qt_het_ssq = _seqsum(ph * ph)
            ph = pheno[rarm]
            qt_homrar_sum = _seqsum(ph)
            qt_homrar_ssq = _seqsum(ph * ph)
        for d in pheno[g == 3]:
            qt_sum -= d
            qt_ssq -= d * d
        nanal_recip = 1.0 / nanal if nanal else 0.0
        qt_mean = qt_sum * nanal_recip
        geno_mean = float(geno_sum) * nanal_recip
        with np.errstate(divide="ignore", invalid="ignore"):
            dxx = np.float64(1.0) / np.float64(nanal - 1)
            qt_var = float((np.float64(qt_ssq)
                            - np.float64(qt_sum * qt_mean)) * dxx)
            geno_var = float((np.float64(float(geno_ssq))
                              - np.float64(geno_sum * geno_mean))
                             * dxx)
            qt_g_prod_centered = qt_g_prod - qt_sum * geno_mean
            qt_g_covar = float(np.float64(qt_g_prod_centered) * dxx)
            dxx = float(np.float64(1.0) / np.float64(geno_var))
            beta = qt_g_covar * dxx
            vbeta_sqrt = float(np.sqrt(
                np.float64(qt_var * dxx - beta * beta)
                / np.float64(nanal - 2)))
            tstat = float(np.float64(beta) / np.float64(vbeta_sqrt))
        orig_tstat[k] = tstat
        het_cts[k] = het
        homrar_cts[k] = homrar
        miss_cts[k] = missing
        line = (ci.name19(chrom).rjust(4) + " "
                + _fw(str(vi.vid[v]), maxsnp) + " "
                + str(int(vi.pos[v])).rjust(10) + " "
                + str(nanal).rjust(8) + " ")
        linsq = None
        if do_lin:
            with np.errstate(divide="ignore", invalid="ignore"):
                den = (geno_mean * geno_mean
                       * (qt_ssq - 2 * qt_sum + qt_mean * qt_sum)
                       + (1 - 2 * geno_mean)
                       * (qt_het_ssq - 2 * qt_het_sum * qt_mean
                          + qt_mean * qt_mean * het)
                       + (4 - 4 * geno_mean)
                       * (qt_homrar_ssq - 2 * qt_homrar_sum * qt_mean
                          + qt_mean * qt_mean * homrar))
                linsq = float(np.float64(
                    qt_g_prod_centered * qt_g_prod_centered)
                    / np.float64(den))
            orig_linsq_arr[k] = linsq
        if nanal > 1:
            tp = calc_tprob(tstat, nanal - 2)
            with np.errstate(divide="ignore", invalid="ignore"):
                rsq = float(np.float64(qt_g_covar * qt_g_covar)
                            / np.float64(qt_var * geno_var))
            if math.isfinite(beta):
                line += (_g4(beta, 10) + " " + _g4(vbeta_sqrt, 10)
                         + " " + _g4(rsq, 10) + " ")
            else:
                line += "        NA         NA         NA "
            if tp >= 0:
                line += _g4(tstat, 8) + " " + _g4(max(tp, 0.0), 12)
            else:
                line += "      NA           NA"
            if do_lin and nanal > 2:
                if math.isfinite(linsq):
                    dxx = math.sqrt(linsq)
                    line += " " + _g4(dxx, 12) + " "
                    dxx = calc_tprob(dxx, nanal - 2)
                    line += _g4(max(dxx, 0.0), 12)
                else:
                    line += "           NA           NA"
            line += " \n"
        else:
            line += ("        NA         NA         NA       NA"
                     "           NA ")
            if do_lin:
                line += "          NA           NA "
            line += "\n"
        fh.write(line)
        if qt_means:
            _write_qt_means(
                fhm, ci.name19(chrom).rjust(4), maxsnp,
                str(vi.vid[v]),
                str(alt1[v]) if a1_is_alt[v] else str(vi.ref[v]),
                str(vi.ref[v]) if a1_is_alt[v] else str(alt1[v]),
                homrar, het, homcom, nanal_recip,
                qt_sum, qt_het_sum, qt_het_ssq,
                qt_homrar_sum, qt_homrar_ssq, qt_ssq)
    fh.close()
    if fhm:
        fhm.close()
        log.log(f"QT --assoc report written to {out} + "
                f"{cfg.out}.qassoc.means .")
    else:
        log.log(f"Writing QT --assoc report to {out} ... done.")
    if do_perms:
        _qassoc_perm_engine(
            ds, cfg, log, inc, a1_is_alt, codes, nm_idx, male_nm,
            pheno, pheno_sum, pheno_ssq, orig_tstat, orig_linsq_arr,
            het_cts, homrar_cts, miss_cts, do_lin, perm_adapt,
            mperm_val, perm_count, maxsnp, out)


def _qassoc_perm_engine(ds, cfg, log, inc, a1_is_alt, codes, nm_idx,
                        male_nm, pheno, pheno_sum, pheno_ssq,
                        orig_tstat, orig_linsq, het_cts, homrar_cts,
                        miss_cts, do_lin, perm_adapt, mperm_val,
                        perm_count, maxsnp, out_base):
    """QT --assoc perm / mperm=N EMP1(+EMP2) empirical p-values.

    Behavior reference: qassoc_adapt_thread / qassoc_maxt_thread +
    *_lin variants (1.9/plink_assoc.c:2856-3600) and the qassoc()
    perm driver (:8370-9090).  Permuted phenotype vectors come from
    the same SFMT-driven generate_qt_perms_smajor_thread stream
    (stats/perm19.qt_perm_matrix) in perm_batch_size batches with
    persistent per-thread RNG streams.  Per-perm genotype-indexed
    sums replicate calc_qgit's ascending-sample accumulation order,
    so all floating-point comparisons against the reference's
    +/-EPSILON tie bands agree.  The reference's LD-difference
    shortcut (calc_qrem) is a performance device whose low-order-bit
    deviations fall inside those bands, so it is not replicated."""
    from ..stats.assoc_perm19 import EPSILON, adaptive_scan
    from ..stats.perm19 import master_sfmt, qt_perm_matrix, \
        reindex_clusters_19
    from ..stats.sfmt import sfmt_thread_array
    from ..utils.chrom import MT_CODE, X_CODE, Y_CODE

    vi = ds.vi
    ci = vi.chr_info
    pheno_nm_ct = nm_idx.size
    M = inc.size
    if perm_adapt:
        ap_min, ap_max, ap_alpha, ap_beta, ap_init, ap_slope = \
            cfg.aperm
        perms_total = ap_max
        from .cluster import _ltqnorm

        ci_zt = _ltqnorm(1 - ap_beta / (2.0 * M))
        first_adapt_check = int(ap_init) if ap_min < ap_init \
            else ap_min
    else:
        perms_total = mperm_val
        first_adapt_check = perms_total + 1
        ap_init = ap_slope = ap_alpha = ci_zt = 0.0

    perm_batch = cfg.perm_batch_size or 512
    if perm_batch > perms_total:
        perm_batch = perms_total
    max_thread_ct = cfg.threads or 1
    uii = min(perm_batch, perms_total) // 8
    if max_thread_ct > uii:
        uii = max(uii, 1)
        max_thread_ct = uii
    master = master_sfmt(cfg)
    sfmts = sfmt_thread_array(master, max_thread_ct)
    clusters = None
    if cfg.within or cfg.family:
        from .cmh import load_clusters_19

        _names, assign = load_clusters_19(ds, cfg)
        members, _cc, _pre, s2c = reindex_clusters_19(
            assign[nm_idx], np.zeros(pheno_nm_ct, bool))
        if not members:
            raise ValueError(
                "No size 2+ clusters for permutation test.")
        clusters = (members, s2c)

    # per-marker genotype masks (minor-allele coding + haploid fix,
    # identical to the .qassoc pass)
    marker_masks = []
    for k in range(M):
        v = int(inc[k])
        chrom = int(vi.chrom[v])
        raw = codes[v][nm_idx]
        g = raw if a1_is_alt[v] \
            else np.where(raw == 3, 3, 2 - raw).astype(raw.dtype)
        g = g.copy()
        if chrom == X_CODE:
            g[(g == 1) & male_nm] = 3
        elif chrom == Y_CODE:
            g[(g == 1) | ~male_nm] = 3
        elif chrom == MT_CODE:
            g[g == 1] = 3
        marker_masks.append((g == 1, g == 2, g == 3))

    success2 = np.zeros(M, np.int64)
    attempt = np.full(M, perms_total, np.int64)
    stopped = np.zeros(M, bool)
    extremes = np.zeros(perms_total) if not perm_adapt else None
    done = 0
    while done < perms_total:
        if perm_adapt and done:
            while first_adapt_check <= done:
                first_adapt_check += int(
                    ap_init + first_adapt_check * ap_slope)
        pv_ct = min(perm_batch, perms_total - done)
        gen_threads = max_thread_ct \
            if pv_ct >= 8 * max_thread_ct \
            else max(pv_ct // 8, 1)
        vecs = qt_perm_matrix(pheno, pv_ct, gen_threads,
                              clusters=clusters, sfmts=sfmts)
        for k in range(M):
            if stopped[k]:
                continue
            hetm, rarm, missm = marker_masks[k]
            het_ct = int(het_cts[k])
            homrar_ct = int(homrar_cts[k])
            missing_ct = int(miss_cts[k])
            nanal = pheno_nm_ct - missing_ct
            homcom_ct = nanal - het_ct - homrar_ct
            invalid = (nanal < 3 or homcom_ct == nanal
                       or het_ct == nanal)
            if perm_adapt and not do_lin:
                invalid = invalid or homrar_ct == nanal
            if invalid:
                if perm_adapt:
                    stopped[k] = True
                    attempt[k] = 0
                else:
                    success2[k] += pv_ct
                continue
            # calc_qgit / calc_qgit_lin: strict ascending-sample
            # accumulation (plink_assoc.c:715)
            if not do_lin:
                g_prod = np.zeros(pv_ct)
                for s in np.flatnonzero(hetm | rarm):
                    if rarm[s]:
                        g_prod += vecs[s] + vecs[s]
                    else:
                        g_prod += vecs[s]
                g_sum = np.zeros(pv_ct)
                g_ssq = np.zeros(pv_ct)
                for s in np.flatnonzero(missm):
                    g_sum += vecs[s]
                    g_ssq += vecs[s] * vecs[s]
                qt_sum = pheno_sum - g_sum
                qt_ssq = pheno_ssq - g_ssq
                nanal_recip = 1.0 / nanal
                nanal_m1_recip = 1.0 / (nanal - 1)
                geno_sum = 2 * homrar_ct + het_ct
                geno_ssq = 4 * homrar_ct + het_ct
                geno_mean = float(geno_sum) * nanal_recip
                geno_var = (float(geno_ssq)
                            - geno_sum * geno_mean) * nanal_m1_recip
                qt_mean = qt_sum * nanal_recip
                qt_var = (qt_ssq - qt_sum * qt_mean) * nanal_m1_recip
                qt_g_covar = (g_prod - qt_sum * geno_mean) \
                    * nanal_m1_recip
                dxx = 1.0 / geno_var
                beta = qt_g_covar * dxx
                betasq = beta * beta
                with np.errstate(divide="ignore", invalid="ignore"):
                    if perm_adapt:
                        svals = betasq / (qt_var * dxx - betasq)
                        o = orig_tstat[k]
                        orig = o * o / (nanal - 2)
                    else:
                        svals = betasq * float(nanal - 2) \
                            / (qt_var * dxx - betasq)
                        o = orig_tstat[k]
                        orig = o * o
            else:
                h_sum = np.zeros(pv_ct)
                h_ssq = np.zeros(pv_ct)
                r_sum = np.zeros(pv_ct)
                r_ssq = np.zeros(pv_ct)
                m_sum = np.zeros(pv_ct)
                m_ssq = np.zeros(pv_ct)
                for s in np.flatnonzero(hetm | rarm | missm):
                    v2 = vecs[s]
                    if hetm[s]:
                        h_sum += v2
                        h_ssq += v2 * v2
                    elif rarm[s]:
                        r_sum += v2
                        r_ssq += v2 * v2
                    else:
                        m_sum += v2
                        m_ssq += v2 * v2
                qt_sum = pheno_sum - m_sum
                qt_ssq = pheno_ssq - m_ssq
                nanal_recip = 1.0 / nanal
                geno_sum = 2 * homrar_ct + het_ct
                geno_mean = float(geno_sum) * nanal_recip
                geno_mean_sq = geno_mean * geno_mean
                coeff2 = 1 - 2 * geno_mean
                coeff3 = 4 - 4 * geno_mean
                qt_g_prod = h_sum + 2 * r_sum
                qt_mean = qt_sum * nanal_recip
                centered = qt_g_prod - qt_sum * geno_mean
                with np.errstate(divide="ignore", invalid="ignore"):
                    svals = centered * centered / (
                        geno_mean_sq * (qt_ssq + (qt_mean - 2)
                                        * qt_sum)
                        + coeff2 * (h_ssq + qt_mean
                                    * (qt_mean * float(het_ct)
                                       - 2 * h_sum))
                        + coeff3 * (r_ssq + qt_mean
                                    * (qt_mean * float(homrar_ct)
                                       - 2 * r_sum)))
                orig = orig_linsq[k]
            stat_high = orig + EPSILON
            stat_low = orig - EPSILON
            with np.errstate(invalid="ignore"):
                outcomes = np.where(
                    svals > stat_high, 2,
                    (svals > stat_low).astype(np.int64))
            if perm_adapt:
                s2i, stop_now, nac = adaptive_scan(
                    outcomes, int(success2[k]), first_adapt_check,
                    done, ap_init, ap_slope, ap_alpha, ci_zt, pv_ct)
                success2[k] += s2i
                if stop_now:
                    stopped[k] = True
                    attempt[k] = nac
            else:
                success2[k] += int(outcomes.sum())
                extremes[done:done + pv_ct] = np.fmax(
                    extremes[done:done + pv_ct], svals)
        done += pv_ct
        if perm_adapt and bool(stopped.all()):
            break

    perms_done = perms_total
    if perm_adapt:
        perms_done = 0
        for k in range(M):
            if attempt[k] > perms_done:
                perms_done = int(attempt[k])
                if perms_done == perms_total:
                    break
    log.log(f"{perms_done} "
            f"{'max(T)' if not perm_adapt else '(adaptive)'} "
            f"permutation{'' if perms_done == 1 else 's'} complete.")
    outp = out_base + (".perm" if perm_adapt else ".mperm")
    fh = open(outp, "w")
    if perm_adapt:
        fh.write(" CHR " + "SNP".rjust(maxsnp)
                 + "         EMP1           NP \n")
    else:
        fh.write(" CHR " + "SNP".rjust(maxsnp)
                 + "         EMP1         EMP2 \n")
        sorted_ext = np.sort(extremes)
    dyy = 1.0 / (perms_total + 1)
    dxx_half = 0.5 * dyy
    pfilter = cfg.pfilter
    for k in range(M):
        v = int(inc[k])
        if perm_adapt:
            pval = (int(success2[k]) + 2) / (2 * (int(attempt[k]) + 1))
        else:
            pval = (int(success2[k]) + 2) * dxx_half
        if pfilter is not None and not pval <= pfilter:
            continue
        line = (ci.name19(int(vi.chrom[v])).rjust(4) + " "
                + _fw(str(vi.vid[v]), maxsnp) + " ")
        if perm_adapt and not attempt[k]:
            line += "          NA           NA"
        elif perm_adapt:
            if not perm_count:
                line += _g4(pval, 12) + " "
            else:
                line += _g4(int(success2[k]) * 0.5, 12) + " "
            line += "  " + str(int(attempt[k])).rjust(10)
        else:
            if not perm_count:
                line += _g4(pval, 12) + " "
            else:
                line += _g4(int(success2[k]) * 0.5, 12) + " "
            if do_lin:
                dzz = orig_linsq[k]
            else:
                dzz = orig_tstat[k] * orig_tstat[k]
            # doublearr_greater_than returns 0 for NaN keys (every
            # comparison fails, plink_common.c:5613)
            gt = 0 if math.isnan(dzz) else int(np.searchsorted(
                sorted_ext, dzz - EPSILON, side="right"))
            dzz = perms_total - gt + 1
            if not perm_count:
                line += _g4(dzz * dyy, 12)
            else:
                line += _g4(float(dzz - 1), 12)
        fh.write(line + " \n")
    fh.close()
    log.log(f"Permutation test report written to {outp} .")


def _write_qt_means(fhm, chrom4, maxsnp, snp, a1, a2, homrar, het,
                    homcom, nanal_recip, qt_sum, qt_het_sum,
                    qt_het_ssq, qt_homrar_sum, qt_homrar_ssq, qt_ssq):
    pre = chrom4 + " " + _fw(snp, maxsnp) + " "
    uii, ujj = len(a1), len(a2)
    line = pre + "  GENO "
    if uii < 4:
        line += " " * (7 - 2 * uii)
    line += f"{a1}/{a1} "
    if uii + ujj < 7:
        line += " " * (7 - uii - ujj)
    line += f"{a1}/{a2} "
    if ujj < 4:
        line += " " * (7 - 2 * ujj)
    line += f"{a2}/{a2}\n"
    fhm.write(line)
    fhm.write(pre + "COUNTS " + str(homrar).rjust(8) + " "
              + str(het).rjust(8) + " " + str(homcom).rjust(8) + "\n")
    fhm.write(pre + "  FREQ " + _g4(nanal_recip * homrar, 8) + " "
              + _g4(nanal_recip * het, 8) + " "
              + _g4(nanal_recip * homcom, 8) + "\n")
    qt_homcom_sum = qt_sum - qt_homrar_sum - qt_het_sum
    x11 = x12 = x22 = 0.0
    line = pre + "  MEAN "
    if homrar:
        x11 = qt_homrar_sum / homrar
        line += _g4(x11, 8)
    else:
        line += "      NA"
    line += " "
    if het:
        x12 = qt_het_sum / het
        line += _g4(x12, 8)
    else:
        line += "      NA"
    line += " "
    if homcom:
        x22 = qt_homcom_sum / homcom
        line += _g4(x22, 8)
    else:
        line += "      NA"
    fhm.write(line + "\n")
    line = pre + "    SD "
    if homrar > 1:
        line += _g4(math.sqrt(
            (qt_homrar_ssq - qt_homrar_sum * x11) / (homrar - 1)), 8)
    elif homrar == 1:
        line += "       0"
    else:
        line += "      NA"
    line += " "
    if het > 1:
        line += _g4(math.sqrt(
            (qt_het_ssq - qt_het_sum * x12) / (het - 1)), 8)
    elif het == 1:
        line += "       0"
    else:
        line += "      NA"
    line += " "
    if homcom > 1:
        line += _g4(math.sqrt(
            (qt_ssq - qt_het_ssq - qt_homrar_ssq
             - qt_homcom_sum * x22) / (homcom - 1)), 8)
    elif homcom == 1:
        line += "       0"
    else:
        line += "      NA"
    fhm.write(line + "\n")
