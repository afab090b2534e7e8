"""--gxe: QT association beta heterogeneity across a 2-group
covariate, PLINK 1.9 parity.

Behavior reference: gxe_assoc (1.9/plink_assoc.c:9116-9600) and the
--covar gxe column semantics (1.9/plink_data.c:1528-1546: nonnumeric,
-9 and 0 are missing; value 2 selects group 2; any other value group
1; samples with a missing gxe covariate lose their phenotype).

Per variant: simple per-group OLS slope of phenotype on minor-allele
count with the reference's precompute-and-adjust float op order, then
Z = (b1-b2)/sqrt(v1+v2) and a 1-df chi-square p.
"""

from __future__ import annotations

import math

import numpy as np

from ..cli import FlagError
from ..dataset import Dataset
from ..stats.distributions import chisq_logsf
from ..utils.chrom import MT_CODE, X_CODE, Y_CODE
from ..utils.logging import RunLogger
from .homozyg import _fw_width
from .assoc19 import _fw, _g4


def _load_gxe_covar(path, mcovar, si, missing_pheno):
    """Returns dict (fid,iid) -> value-or-None for the selected
    covariate column."""
    out = {}
    with open(path) as f:
        first = True
        for line in f:
            toks = line.split()
            if not toks:
                continue
            if first:
                first = False
                t0 = toks[0].lstrip("#")
                if t0 in ("FID", "IID"):
                    continue
            if len(toks) < 2 + mcovar:
                raise FlagError(
                    "--covar file line has fewer tokens than expected.")
            try:
                v = float(toks[1 + mcovar])
            except ValueError:
                v = None
            if v is not None and (v == missing_pheno or v == 0.0):
                v = None
            out[(toks[0], toks[1])] = v
    return out


def run_gxe(ds: Dataset, cfg, log: RunLogger) -> None:
    if not cfg.covar:
        raise FlagError("--gxe must be used with --covar.")
    mcovar = cfg.gxe if cfg.gxe else 1
    si, vi = ds.si, ds.vi
    pc = next(iter(si.phenos.values()), None)
    if pc is None or pc.kind != "qt":
        raise FlagError(
            "--gxe requires a quantitative phenotype.")
    covar_path = cfg.covar[0] if isinstance(cfg.covar, (list, tuple)) \
        else cfg.covar
    cv = _load_gxe_covar(covar_path, mcovar, si, -9.0)
    n = ds.raw_sample_ct
    gval = np.full(n, np.nan)
    for i in range(n):
        v = cv.get((str(si.fid[i]), str(si.iid[i])))
        if v is not None:
            gval[i] = v
    base = pc.nonmiss & ds.sample_mask
    covar_nm = np.isfinite(gval) & base
    grp2 = covar_nm & (gval == 2.0)
    grp1 = covar_nm & ~ (gval == 2.0)
    male = ds.male_mask()[:n]
    pheno = pc.data.astype(np.float64)

    from ..ops.pairwise import _unpack_np
    from .basic_reports import alt_allele_freqs

    codes = _unpack_np(ds.all_packed())[:, :n]
    af = alt_allele_freqs(ds, founders_only=True)
    a1_is_alt = ~(af > 0.5)
    inc = np.flatnonzero(ds.variant_mask)
    maxsnp = _fw_width(len(str(vi.vid[i])) for i in inc)
    ci = vi.chr_info
    out = cfg.out + ".qassoc.gxe"
    fh = open(out, "w")
    fh.write(" CHR " + "SNP".rjust(maxsnp)
             + "   NMISS1      BETA1        SE1   NMISS2      BETA2"
             "        SE2    Z_GXE        P_GXE \n")
    na_line = ("      NA         NA         NA       NA         NA"
               "         NA       NA           NA")

    def group_stats(mask):
        """(n_group, base qt sum/ssq in sample order, index array)."""
        idx = np.flatnonzero(mask[:n])
        ph = pheno[idx]
        s = ssq = 0.0
        for d in ph:
            s += d
            ssq += d * d
        return idx, ph, s, ssq

    idx1, ph1, sum1, ssq1 = group_stats(grp1)
    idx2, ph2, sum2, ssq2 = group_stats(grp2)
    g1m = male[idx1]
    g2m = male[idx2]
    s1m = ssq1m = 0.0
    for d in ph1[g1m]:
        s1m += d
        ssq1m += d * d
    s2m = ssq2m = 0.0
    for d in ph2[g2m]:
        s2m += d
        ssq2m += d * d
    skip_y = (int(g1m.sum()) < 3) or (int(g2m.sum()) < 3)

    for v in inc:
        chrom = int(vi.chrom[v])
        is_x = chrom == X_CODE
        is_y = chrom == Y_CODE
        is_mt = chrom == MT_CODE
        if is_y and skip_y:
            continue
        raw = codes[v]
        g = raw if a1_is_alt[v] \
            else np.where(raw == 3, 3, 2 - raw).astype(raw.dtype)
        # minor count 0..2, 3 = missing
        g = g.copy()
        if is_x:
            g[(g == 1) & male] = 3
        elif is_y:
            g[(g == 1) | ~male] = 3
        elif is_mt:
            g[g == 1] = 3
        if is_y:
            a1, p1s, s1, q1 = idx1[g1m], ph1[g1m], s1m, ssq1m
            a2, p2s, s2, q2 = idx2[g2m], ph2[g2m], s2m, ssq2m
        else:
            a1, p1s, s1, q1 = idx1, ph1, sum1, ssq1
            a2, p2s, s2, q2 = idx2, ph2, sum2, ssq2
        line = (_fw(ci.name19(chrom), 4) + " "
                + _fw(str(vi.vid[v]), maxsnp) + " ")
        ok, row = _gxe_row(g, a1, p1s, s1, q1, a2, p2s, s2, q2)
        fh.write(line + row + "\n")
    fh.close()
    log.log(f"Writing --gxe report to {out} ... done.")


def _gxe_row(g, idx1, ph1, sum1, ssq1, idx2, ph2, sum2, ssq2):
    na_line = ("      NA         NA         NA       NA         NA"
               "         NA       NA           NA")
    res = []
    for idx, ph, qs, qq in ((idx1, ph1, sum1, ssq1),
                            (idx2, ph2, sum2, ssq2)):
        gv = g[idx]
        het = int((gv == 1).sum())
        homrar = int((gv == 2).sum())
        miss = int((gv == 3).sum())
        nanal = idx.size - miss
        geno_sum = 2 * homrar + het
        geno_ssq = 4 * homrar + het
        res.append((nanal, geno_sum, geno_ssq, gv, ph, qs, qq))
    if res[0][0] <= 2 or res[1][0] <= 2:
        return False, na_line
    vals = []
    for nanal, geno_sum, geno_ssq, gv, ph, qs, qq in res:
        nanal_recip = 1.0 / nanal
        nm1_recip = 1.0 / (nanal - 1)
        geno_mean = geno_sum * nanal_recip
        g_var = (geno_ssq - geno_sum * geno_mean) * nm1_recip
        if g_var == 0:
            return False, na_line
        qt_sum = qs
        qt_ssq = qq
        qt_g_prod = 0.0
        for k in range(gv.size):
            c = gv[k]
            if c == 1:
                qt_g_prod += ph[k]
            elif c == 2:
                qt_g_prod += 2 * ph[k]
            elif c == 3:
                d = ph[k]
                qt_sum -= d
                qt_ssq -= d * d
        qt_var = (qt_ssq - (qt_sum * qt_sum * nanal_recip)) * nm1_recip
        qt_g_covar = (qt_g_prod - (qt_sum * geno_mean)) * nm1_recip
        beta = qt_g_covar / g_var
        vbeta = (qt_var / g_var
                 - (qt_g_covar * qt_g_covar) / (g_var * g_var)) \
            / (nanal - 2)
        vals.append((nanal, beta, vbeta))
    (n1, b1, v1), (n2, b2, v2) = vals
    if v1 + v2 <= 0:
        return False, na_line
    z = (b1 - b2) / math.sqrt(v1 + v2)
    try:
        p = math.exp(chisq_logsf(z * z, 1))
    except (ValueError, OverflowError):
        p = -9.0
    row = (str(n1).rjust(8) + " " + _g4(b1, 10) + " "
           + _g4(math.sqrt(v1), 10) + " " + str(n2).rjust(8) + " "
           + _g4(b2, 10) + " " + _g4(math.sqrt(v2), 10) + " "
           + _g4(z, 8) + " " + _g4(max(p, 0.0), 12))
    return True, row
