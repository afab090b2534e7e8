"""--lasso <h2> [minlambda] ['report-zeroes']: LASSO whole-genome regression.

Behavior reference: 1.9/plink_lasso.c (lasso(), lasso_bigmem(),
load_and_normalize()).  Coordinate-descent LASSO over the standardized
[covariates | polymorphic markers] design against the standardized
phenotype, on a 100-point log-spaced lambda path from lambda_max =
max_j |x_j . y| down to the user's (or warm-start-estimated) min lambda;
the final lambda's coefficients are reported.

Faithful pieces:
- column/phenotype standardization: (v - mean) * sqrt((n-1)/(ssq -
  sum*mean)) / sqrt(n), missing genotypes mapped to 0 (mean imputation),
  cc phenotypes as 0/1 (plink_lasso.c:1095-1135, load_and_normalize);
- polymorphism screen ((!homrar && (!het || !homset)) || (!het &&
  !homset), plink_lasso.c:404);
- haploid handling via the 1.9 haploid_fix semantics (het calls on
  haploid chromosomes -> missing, chrY females -> missing);
- per-lambda solve: warm-started xhat, full active set per lambda,
  permanent within-lambda removal on zeroing, error = lambda*sum|xhat| +
  rss with relative-delta 1e-4 stop (native lasso_cd_lambda mirrors the
  f64 operation order; a numpy fallback reproduces the same algorithm);
- covariates are unpenalized unless --lasso-select-covars lists them
  (unselected_covar_ct, plink_lasso.c:320).

Deviation: the warm-start min-lambda estimator (no explicit minlambda
argument) uses the same algorithm -- median over 1000 random N(0,1)
projections of max_j |x_j . r| times sige/sqrt(n) -- but a numpy
Philox stream instead of the reference's sfmt Box-Muller draws, so its
lambda_min (and therefore the path) matches statistically, not bitwise.
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..utils.chrom import MT_CODE, X_CODE, Y_CODE
from ..utils.fmt import dtoa_g
from ..utils.logging import RunLogger

NLAMBDA = 100
DEFAULT_WARM_START_ITERS = 1000


def _cd_lambda_numpy(X, lam, unpen_ct, y, xhat, residuals):
    """Pure-numpy mirror of native lasso_cd_lambda."""
    C, n = X.shape
    residuals[:] = y
    nzj = np.flatnonzero(xhat)
    if nzj.size:
        residuals -= xhat[nzj] @ X[nzj]
    active = np.ones(C, bool)
    it = 0
    err_last = err_cur = 0.0
    while True:
        for j in np.flatnonzero(active):
            xj = X[j]
            xjold = xhat[j]
            v = xjold + float(xj @ residuals)
            if j >= unpen_ct:
                v = max(v - lam, 0.0) if v > 0.0 else min(v + lam, 0.0)
            xhat[j] = v
            if v == 0.0:
                active[j] = False
            d = v - xjold
            if d != 0.0:
                residuals -= xj * d
        err_last = err_cur
        err_cur = lam * float(np.abs(xhat[active]).sum()) \
            + float(residuals @ residuals)
        it += 1
        if it > 1:
            lo, hi = min(err_last, err_cur), max(err_last, err_cur)
            if (1.0 - lo / hi) < 0.0001 or err_cur != err_cur:
                return it


def _load_covars(ds, cfg):
    """--covar matrix for --lasso (numeric columns; returns
    (names, data [raw_n, k], nm mask [raw_n]))."""
    from .glm import _match_rows, _read_table

    if not cfg.covar:
        return [], np.zeros((ds.raw_sample_ct, 0)), \
            np.ones(ds.raw_sample_ct, bool)
    id_mode, ids, colnames, vals = _read_table(cfg.covar)
    rows = _match_rows(ds, id_mode, ids)
    n_raw = ds.raw_sample_ct
    data = np.full((n_raw, len(colnames)), np.nan)
    for r_, idx in enumerate(rows):
        if idx >= 0:
            for c_, v in enumerate(vals[r_]):
                try:
                    data[idx, c_] = float(v)
                except ValueError:
                    pass
    nm = np.isfinite(data).all(axis=1)
    return list(colnames), data, nm


def run_lasso(ds: Dataset, cfg, log: RunLogger) -> None:
    args = cfg.lasso
    h2 = float(args[0])
    if not 0.0 < h2 <= 1.0:
        raise ValueError("--lasso heritability estimate must be in (0, 1].")
    minlambda = None
    report_zeroes = False
    for a in args[1:]:
        if a == "report-zeroes":
            report_zeroes = True
        else:
            minlambda = float(a)
    select_covars = getattr(cfg, "lasso_select_covars", None)

    # phenotype: first loaded phenotype (qt preferred semantics: 1.9 uses
    # the active pheno; cc encodes 0/1)
    pheno = None
    for name, pc in ds.si.phenos.items():
        if pc.kind in ("qt", "cc"):
            pheno = pc
            break
    if pheno is None:
        raise ValueError("--lasso requires a loaded phenotype.")
    cov_names, cov_data, cov_nm = _load_covars(ds, cfg)
    k = len(cov_names)

    smask = ds.sample_mask & pheno.nonmiss & cov_nm
    inc = np.flatnonzero(smask)
    n = inc.size
    if n < 2:
        log.log("Warning: Skipping --lasso since less than two phenotypes "
                "are present.")
        return
    sqrt_n_recip = np.sqrt(1.0 / n)

    yv = pheno.data[inc].astype(np.float64)
    if pheno.kind == "cc":
        yv = (yv == 1).astype(np.float64)
    s, ssq = float(yv.sum()), float(yv @ yv)
    if ssq * n == s * s:
        log.log("Warning: Skipping --lasso since phenotype is constant.")
        return
    mean = s / n
    y = (yv - mean) * (sqrt_n_recip
                       * np.sqrt((n - 1.0) / (ssq - s * mean)))

    # ---- standardized design columns ----
    cols: list[np.ndarray] = []
    # covariates: unpenalized first, then selected (penalized) covariates
    sel_mask = np.zeros(k, bool)
    if select_covars is not None:
        if not k:
            raise ValueError(
                "No covariates loaded for --lasso-select-covars.")
        if select_covars:  # explicit name list
            for nm_ in select_covars:
                if nm_ not in cov_names:
                    raise ValueError(
                        f"--lasso-select-covars covariate '{nm_}' not "
                        "found.")
                sel_mask[cov_names.index(nm_)] = True
        else:
            sel_mask[:] = True
    covar_order = (
        [i for i in range(k) if not sel_mask[i]]
        + [i for i in range(k) if sel_mask[i]]
    )
    unpen_ct = int((~sel_mask).sum())

    def std_col(v):
        s_, q_ = float(v.sum()), float(v @ v)
        if q_ * n == s_ * s_:
            return None
        m_ = s_ / n
        return (v - m_) * (sqrt_n_recip * np.sqrt((n - 1.0) / (q_ - s_ * m_)))

    for ci_ in covar_order:
        c = std_col(cov_data[inc, ci_].astype(np.float64))
        if c is None:
            raise ValueError("--lasso covariate is constant.")
        cols.append(c)

    # markers: decode A1 (minor) dosages with 1.9 haploid_fix semantics
    from ..ops.pairwise import _unpack_np
    from .basic_reports import alt_allele_freqs

    freqs = alt_allele_freqs(ds, founders_only=True)
    a1_is_alt = ~(freqs > 0.5)
    vidx = np.flatnonzero(ds.variant_mask)
    chrom = ds.vi.chrom
    sex = ds.si.sex[inc]
    male = sex == 1
    female = sex == 2
    hap_all = ds.is_haploid_all()

    poly = np.zeros(ds.raw_variant_ct, bool)
    marker_cols: list[np.ndarray] = []
    B = max(1, (1 << 24) // max(n, 1))
    for b0 in range(0, vidx.size, B):
        vs = vidx[b0:b0 + B]
        raw = _unpack_np(ds.reader.read_packed(int(vs[0]),
                                               int(vs[-1] - vs[0] + 1)))
        raw = raw[vs - vs[0]][:, :ds.raw_sample_ct][:, inc]
        for r_i, v in enumerate(vs):
            g = raw[r_i].astype(np.int64)  # 0..2 ALT count, 3 missing
            if not a1_is_alt[v]:
                g = np.where(g == 3, 3, 2 - g)
            ch = int(chrom[v])
            if hap_all[v] or ch == MT_CODE:
                if ch == X_CODE:
                    g = np.where(male & (g == 1), 3, g)
                elif ch == Y_CODE:
                    g = np.where(female, 3, g)
                    g = np.where(male & (g == 1), 3, g)
                else:
                    g = np.where(g == 1, 3, g)
            nm_ = g != 3
            u = int(nm_.sum())
            hom_a1 = int((g == 2).sum())
            het = int((g == 1).sum())
            hom_oth = u - hom_a1 - het
            if ((hom_a1 == 0 and (het == 0 or hom_oth == 0))
                    or (het == 0 and hom_oth == 0)):
                continue  # not polymorphic
            gsum = 2.0 * hom_a1 + het
            gmean = gsum / u
            denom = 4.0 * hom_a1 + het - gsum * gmean
            sc = sqrt_n_recip * np.sqrt((u - 1.0) / denom)
            col = np.where(nm_, (g - gmean) * sc, 0.0)
            poly[v] = True
            marker_cols.append(col)
    if not marker_cols:
        log.log("Warning: Skipping --lasso since no polymorphic markers "
                "are present.")
        return
    X = np.ascontiguousarray(np.array(cols + marker_cols, np.float64))
    C = X.shape[0]

    # ---- lambda path ----
    xy = X @ y
    lambda_max = float(np.abs(xy).max())
    if minlambda is None:
        # warm-start estimate (see module docstring re RNG deviation)
        rng = np.random.default_rng(cfg.seed or 0)
        sige = np.sqrt(1.0 - h2 + 1.0 / n)
        zz = sige * sqrt_n_recip
        R = rng.standard_normal((DEFAULT_WARM_START_ITERS, n))
        m = np.abs(R @ X.T).max(axis=1)
        minlambda = float(np.median(m)) * zz
        log.log(f"--lasso: using min lambda = {dtoa_g(minlambda)}.")
    if minlambda >= lambda_max:
        raise ValueError("--lasso: min lambda >= max lambda.")
    loghi, loglo = np.log(lambda_max), np.log(minlambda)
    logdelta = (loghi - loglo) / (NLAMBDA - 1.0)

    xhat = xy.copy()
    residuals = np.empty(n, np.float64)
    from ..native import get_lib

    lib = get_lib()
    iter_tot = 0
    import ctypes

    for li in range(NLAMBDA):
        lam = float(np.exp(loghi - logdelta * li))
        if lib is not None:
            iter_tot += int(lib.lasso_cd_lambda(
                X.ctypes.data_as(ctypes.c_void_p), C, n, lam, unpen_ct,
                y.ctypes.data_as(ctypes.c_void_p),
                xhat.ctypes.data_as(ctypes.c_void_p),
                residuals.ctypes.data_as(ctypes.c_void_p),
            ))
        else:
            iter_tot += _cd_lambda_numpy(X, lam, unpen_ct, y, xhat,
                                         residuals)

    # ---- report ----
    vi = ds.vi
    ci = vi.chr_info
    alt1 = vi.alt1()
    path = cfg.out + ".lasso"
    with open(path, "w") as f:
        f.write("CHR\tSNP\tA1\tEFFECT\n")
        if select_covars is not None:
            # with an explicit name list only the selected covariates are
            # reported; bare --lasso-select-covars reports all of them
            # (ref plink_lasso.c:1196-1218)
            start = unpen_ct if len(select_covars) else 0
            for oi in range(start, k):
                ci_ = covar_order[oi]
                eff = xhat[oi]
                if not report_zeroes and eff == 0:
                    continue
                f.write(f"COV\t{cov_names[ci_]}\tNA\t{dtoa_g(eff)}\n")
        mi = 0
        for v in vidx:
            a1 = alt1[v] if a1_is_alt[v] else vi.ref[v]
            if poly[v]:
                eff = xhat[k + mi]
                mi += 1
                if not report_zeroes and eff == 0:
                    continue
                f.write(f"{ci.name19(int(chrom[v]))}\t{vi.vid[v]}\t{a1}\t"
                        f"{dtoa_g(eff)}\n")
            elif report_zeroes:
                f.write(f"{ci.name19(int(chrom[v]))}\t{vi.vid[v]}\t{a1}\t"
                        "NA\n")
    log.log(f"--lasso report written to {path} . Total iterations: "
            f"{iter_tot}.")
