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
    for m in mods:
        if m.startswith(("perm", "mperm")) or m in ("perm-count",):
            raise ValueError(
                "QT --assoc permutation tests are currently under "
                "development.")
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

    for v in inc:
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
