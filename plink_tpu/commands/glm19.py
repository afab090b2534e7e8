"""PLINK 1.9 --linear / --logistic: .assoc.linear / .assoc.logistic reports.

Behavior reference: glm_linear_assoc / glm_logistic_assoc
(1.9/plink_glm.c:4363,5897) with the shared machinery in glm_common_init
(:3555), glm_fill_design (:1820), glm_linear (:482), glm_logistic (:1690),
glm_check_vif (:409) and linear_hypothesis_chisq (1.9/plink_stats.c:2164).

Byte-identical output contract:
- header " CHR %{maxsnp}s         BP   A1       TEST    NMISS       BETA "
  (+ SE/L*/U* with --ci) + "        STAT            P " (:4945,:6430);
- per-parameter rows (INTERCEPT skipped unless 'intercept'), fixed widths
  via dtoa_g_wxp4 (TEST fw10, NMISS w8, BETA/OR w10, STAT/P w12);
- linear: coefficients from LAPACK dgels, SE^2 = diag(inv(X'X)) * sigma,
  STAT = t, P = calc_tprob(t, n - p); logistic: the float IRLS
  (stats/glm19f.py, a bit-exact port) with SE from the Cholesky-solved
  covariance, STAT = z, P = chiprob(z^2, 1);
- genotypic/hethom add the DOMDEV/HET row and the GENO_2DF joint Wald test;
- chrX male coding follows --xchr-model (default 1: male dosage halved),
  haploid chromosomes use 0/0/1 A1-hom coding with het->missing
  (haploid_fix, 1.9/plink_common.h:2658).

Adaptive (.perm, EMP1) and max(T) (.mperm, EMP1/EMP2) permutation tests
ride the bit-exact SFMT generators in stats/perm19.py.
"""

from __future__ import annotations

import math

import numpy as np

from ..dataset import Dataset
from ..utils.logging import RunLogger
from .assoc19 import _fw, _g4
from .basic_reports import alt_allele_freqs
from .homozyg import _fw_width
from .qassoc import calc_tprob


def _scan_conditions19(ds, cfg, log):
    """--condition / --condition-list (1.9): the named variants' A1-allele
    counts become leading covariates, and samples whose condition genotype
    is missing (incl. het-haploid / het-male-X after the haploid fix) are
    excluded from the analysis.

    ref: glm_scan_conditions (1.9/plink_glm.c:92) for the sample-mask side
    and the geno_map conversion (:4584-4596) for covariate values:
    additive map [2,-,1,0] per A1 count; 'dominant' caps at 1; 'recessive'
    keeps only hom-A1; male X scores 2 only under --xchr-model 2; other
    haploid calls score 1 per A1 hom.
    Returns (names, data [n_raw, k], nonmiss [n_raw])."""
    from ..ops.pairwise import _unpack_np
    from .basic_reports import alt_allele_freqs

    if cfg.condition:
        want = [cfg.condition[0]]
        mods = set(cfg.condition[1:])
        flagname = "--condition"
    else:
        with open(cfg.condition_list[0]) as f:
            want = f.read().split()
        mods = set(cfg.condition_list[1:])
        flagname = "--condition-list"
    dominant = "dominant" in mods
    recessive = "recessive" in mods
    xchr_model = cfg.xchr_model if cfg.xchr_model is not None else 2

    freqs = alt_allele_freqs(ds, founders_only=True)
    with np.errstate(invalid="ignore"):
        a1_is_alt = ~(freqs > 0.5)
    vid_to_idx = {str(ds.vi.vid[i]): i
                  for i in np.flatnonzero(ds.variant_mask)}
    n = ds.raw_sample_ct
    male = ds.si.sex == 1
    is_x = ds.is_chrx()
    hap = ds.is_haploid_all()
    names: list[str] = []
    cols: list[np.ndarray] = []
    nonmiss = np.ones(n, bool)
    skip = 0
    seen: set[str] = set()
    for vname in want:
        if vname in seen:
            continue
        seen.add(vname)
        i = vid_to_idx.get(vname)
        if i is None:
            skip += 1
            log.log(f"Warning: {flagname} variant ID '{vname}' not found.")
            continue
        codes = _unpack_np(ds.reader.read_packed(i, 1))[0][:n].astype(
            np.int64)
        c = codes if a1_is_alt[i] else 2 - codes
        miss = codes == 3
        if bool(hap[i]):
            if bool(is_x[i]):
                miss |= male & (codes == 1)  # het male X -> missing
            else:
                miss |= codes == 1  # het haploid -> missing
        c = np.where(miss, 0, np.clip(c, 0, 2)).astype(np.float64)
        if recessive:
            val = (c == 2.0).astype(np.float64)
        elif dominant:
            val = np.minimum(c, 1.0)
        else:
            val = c.copy()
        if bool(hap[i]):
            if bool(is_x[i]):
                if not (xchr_model == 2 and not dominant and not recessive):
                    val = np.where(male, (c == 2.0).astype(np.float64), val)
            else:
                val = (c == 2.0).astype(np.float64)
        names.append(vname)
        cols.append(val)
        nonmiss &= ~miss
    if not cols:
        return [], np.zeros((n, 0)), nonmiss
    return names, np.stack(cols, axis=1), nonmiss


def _flag_error(msg):
    from ..cli import FlagError

    return FlagError(msg)

F = np.float32


def _exp(x: float) -> float:
    """C exp(): overflows to inf instead of raising."""
    try:
        return math.exp(x)
    except OverflowError:
        return math.inf


def _p_chisq(x, df=1.0):
    from ..stats.distributions import chisq_logsf

    if not np.isfinite(x) or x < 0:
        return -9.0
    return float(np.exp(chisq_logsf(float(x), float(df))))


def _invert_matrix(m: np.ndarray) -> np.ndarray | None:
    """LAPACK dgetrf+dgetri, mirroring the reference's invert_matrix."""
    from scipy.linalg.lapack import dgetrf, dgetri

    lu, piv, info = dgetrf(m)
    if info != 0:
        return None
    inv, info = dgetri(lu, piv)
    if info != 0:
        return None
    return inv


def _glm_check_vif(vif_thresh: float, X: np.ndarray) -> bool:
    """glm_check_vif (1.9/plink_glm.c:409): True = FAIL.  X is the
    cov-major design [p, n] (row 0 = intercept)."""
    p, n = X.shape
    if p < 2:
        return False
    nm1 = p - 1
    means = X[1:].sum(axis=1) / n
    # covariance-ish matrix with the reference's exact op order
    g = np.empty((nm1, nm1))
    for i in range(nm1):
        for j in range(i, nm1):
            dxx = float(X[1 + i] @ X[1 + j])
            dxx -= means[i] * n * means[j]
            g[i, j] = dxx / (n - 1)
    d = np.diagonal(g).copy()
    if (d == 0).any() or not np.isfinite(d).all():
        return True
    isd = 1.0 / np.sqrt(d)
    for i in range(1, nm1):
        for j in range(i):
            dxx = g[j, i] * isd[i] * isd[j]
            if dxx > 0.999:
                return True
            g[i, j] = dxx
            g[j, i] = dxx
    for i in range(nm1):
        g[i, i] = 1.0
    inv = _invert_matrix(g)
    if inv is None:
        return True
    return bool((np.diagonal(inv) > vif_thresh).any())


def _linear_hypothesis_chisq(H: np.ndarray, coef: np.ndarray,
                             S: np.ndarray) -> float | None:
    """linear_hypothesis_chisq (1.9/plink_stats.c:2164): Wald chi-square
    for H beta = 0 given scaled covariance S."""
    hb = H @ coef
    inner = H @ S @ H.T
    inv = _invert_matrix(inner)
    if inv is None:
        return None
    return float(hb @ inv @ hb)


def _glm_linear_fit(X: np.ndarray, y: np.ndarray, constraints=None,
                    y_rss=None):
    """glm_linear single-permutation core (1.9/plink_glm.c:482).

    X cov-major [p, n] f64 (intercept first), y [n] f64.  Returns
    (coef [p], se2 [p], joint_chisq|None) or None on failure; se2[0] is the
    intercept's (reported only with 'intercept'/--ci)."""
    from scipy.linalg.lapack import dgels

    p, n = X.shape
    s0 = _invert_matrix(X @ X.T)
    if s0 is None:
        return None
    diag = np.diagonal(s0)
    sq = np.sqrt(diag)
    # validParameters() part 1: pairwise near-collinearity (signed compare)
    for i in range(1, p):
        dxx = 0.99999 * sq[i]
        for j in range(i):
            if s0[i, j] > dxx * sq[j]:
                return None
    min_sigma = diag[1:].min() if p > 1 else diag[0]
    if min_sigma <= 0:
        return None
    min_sigma = 1e-20 / min_sigma
    _, cf, info = dgels(X.T, y.reshape(-1, 1))
    if info != 0:
        return None
    coef = cf[:p, 0].copy()
    resid = (y if y_rss is None else y_rss) - X.T @ coef
    rss = float(resid @ resid)
    sigma = rss / (n - p)
    if sigma < min_sigma:
        return None
    se2 = diag * sigma
    joint = None
    if constraints is not None:
        joint = _linear_hypothesis_chisq(constraints, coef, s0 * sigma)
        if joint is None:
            joint = -9.0
    # the 'intercept' display SE reads a REUSED buffer slot: without a joint
    # test it holds unscaled S0[1][1] (glm_linear copies diag entries 1..p-1
    # into param_2d_buf2 starting at [0]; the writer at :5254 takes
    # sqrt(param_2d_buf2[0]) with no sigma); with a joint test the buffer
    # holds the full sigma-scaled S, so [0] = S0[0][0]*sigma
    icept_disp_var = (diag[1] if constraints is None and p > 1
                      else se2[0])
    return coef, se2, joint, icept_disp_var


def _logistic_fit(X32: np.ndarray, y32: np.ndarray, constraints=None):
    """glm_logistic single-permutation core; X32 [p, n4] f32 cov-major."""
    from ..stats.glm19f import glm_logistic_full

    res = glm_logistic_full(X32, y32)
    if res is None:
        return None
    coef, S = res
    se2 = np.diagonal(S).astype(np.float64)
    joint = None
    if constraints is not None:
        j = _linear_hypothesis_chisq(
            constraints, coef.astype(np.float64), S.astype(np.float64))
        joint = F(j) if j is not None else -9.0
    return coef.astype(np.float64), se2, joint, float(se2[0])


def _hh_fix_cnt(cnt: np.ndarray, is_x: bool, is_y: bool, haploid: bool,
                male: np.ndarray) -> np.ndarray:
    """haploid_fix on A1-count codes (3 = missing).  X: male hets ->
    missing; Y: nonmale -> missing; other haploid/MT: hets -> missing."""
    if is_x:
        cnt = np.where(male & (cnt == 1), 3, cnt)
    elif is_y:
        cnt = np.where(~male, 3, cnt)
    elif haploid:
        cnt = np.where(cnt == 1, 3, cnt)
    return cnt


def _build_design(cnt_nm, male_nm, covars_nm, sex_col, model, gen_or_hh,
                  male_x_01, is_nonx_haploid, include_sex, dtype):
    """glm_fill_design (1.9/plink_glm.c:1820): cov-major design over
    nonmissing samples.  cnt_nm = A1 counts (0/1/2)."""
    nm = cnt_nm.size
    cols = [np.ones(nm, dtype)]
    # main-effect coding priority mirrors glm_fill_design exactly:
    # DOMINANT -> 0/1/1 (even on haploid chromosomes); additive/genotypic
    # on a diploid-capable chromosome -> 0/1/2 (male X >> 1 under
    # --xchr-model 1); everything else (hethom/recessive/non-X haploid)
    # -> 0/0/1 A1-hom indicator
    if model == "dominant":
        g = (cnt_nm >= 1).astype(dtype)
    elif model not in ("hethom", "recessive") and not is_nonx_haploid:
        if male_x_01:
            g = np.where(male_nm, cnt_nm >> 1, cnt_nm).astype(dtype)
        else:
            g = cnt_nm.astype(dtype)
    else:
        g = (cnt_nm == 2).astype(dtype)
    cols.append(g)
    if gen_or_hh and not is_nonx_haploid:
        cols.append((cnt_nm == 1).astype(dtype))  # DOMDEV / HET
    for k in range(covars_nm.shape[1]):
        cols.append(covars_nm[:, k].astype(dtype))
    if include_sex:
        cols.append(sex_col.astype(dtype))
    return np.ascontiguousarray(np.stack(cols))


def _build_design_interaction(cnt_nm, male_nm, covars_nm, sex_col, model,
                              use_domdev, male_x_01, is_nonx_haploid,
                              include_sex):
    """glm_fill_design with 'interaction' columns (1.9/plink_glm.c:1977-
    2238).  Order: intercept, main, [DOMDEV], fixed covars, per-covar
    (MAINxCOV, [DOMDEVxCOV]) interleaved, [SEX, MAINxSEX, [DOMDEVxSEX]].

    Coding quirks replicated exactly: the MAINxCOV genotype factor skips
    the is_nonx_haploid demotion of the main-effect column (additive even
    on non-X haploid chromosomes, :2006), and MAINxSEX checks only the
    HETHOM bit -- dominant/recessive models get ADDITIVE coding there
    (:2117)."""
    dt = np.float64
    nm = cnt_nm.size
    cols = [np.ones(nm, dt)]
    # main-effect column: same priority as _build_design
    if model == "dominant":
        g_main = (cnt_nm >= 1).astype(dt)
    elif model not in ("hethom", "recessive") and not is_nonx_haploid:
        if male_x_01:
            g_main = np.where(male_nm, cnt_nm >> 1, cnt_nm).astype(dt)
        else:
            g_main = cnt_nm.astype(dt)
    else:
        g_main = (cnt_nm == 2).astype(dt)
    cols.append(g_main)
    domdev = (cnt_nm == 1).astype(dt)
    if use_domdev:
        cols.append(domdev)
    # interaction genotype factor (no is_nonx_haploid check)
    if model == "dominant":
        g_int = (cnt_nm >= 1).astype(dt)
    elif model not in ("hethom", "recessive"):
        if male_x_01:
            g_int = np.where(male_nm, cnt_nm >> 1, cnt_nm).astype(dt)
        else:
            g_int = cnt_nm.astype(dt)
    else:
        g_int = (cnt_nm == 2).astype(dt)
    for k in range(covars_nm.shape[1]):
        cols.append(covars_nm[:, k].astype(dt))
    for k in range(covars_nm.shape[1]):
        cv = covars_nm[:, k].astype(dt)
        cols.append(g_int * cv)
        if use_domdev:
            cols.append(domdev * cv)
    if include_sex:
        sx = sex_col.astype(dt)
        cols.append(sx)
        # MAINxSEX: only the HETHOM bit is checked upstream
        if model == "hethom":
            g_sx = (cnt_nm == 2).astype(dt)
        elif male_x_01:
            g_sx = np.where(male_nm, cnt_nm >> 1, cnt_nm).astype(dt)
        else:
            g_sx = cnt_nm.astype(dt)
        cols.append(g_sx * sx)
        if use_domdev:
            cols.append(domdev * sx)
    return np.ascontiguousarray(np.stack(cols))


def _standardize(X: np.ndarray) -> np.ndarray:
    """standard-beta design standardization (glm_fill_design tail)."""
    p, n = X.shape
    for i in range(1, p):
        col = X[i]
        s = float(col.sum())
        ssq = float(col @ col)
        mean = s / n
        sd = math.sqrt((ssq - s * mean) / (n - 1))
        if sd == 0:
            X[i] = 0.0
        else:
            X[i] = (col - mean) * (1.0 / sd)
    return X


def run_glm19(ds: Dataset, cfg, log: RunLogger, linear: bool) -> None:
    raw_mods = cfg.linear19 if linear else cfg.logistic19
    mods = set()
    mperm_val = None
    for m in raw_mods:
        if m.startswith("mperm="):
            mperm_val = int(m.split("=", 1)[1])
        else:
            mods.add(m)
    flagname = "--linear" if linear else "--logistic"
    if "no-snp" in mods:
        return _run_glm19_nosnp(ds, cfg, log, linear, mods - {"no-snp"},
                                mperm_val)
    if "set-test" in mods:
        raise _flag_error(
            f"{flagname} 'set-test' modifier is not implemented yet.")
    interaction = "interaction" in mods
    genotypic = "genotypic" in mods
    hethom = "hethom" in mods
    dominant = "dominant" in mods
    recessive = "recessive" in mods
    gen_or_hh = genotypic or hethom
    model = ("genotypic" if genotypic else "hethom" if hethom
             else "dominant" if dominant else "recessive" if recessive
             else "add")
    hide_covar = "hide-covar" in mods
    report_odds = (not linear) and ("beta" not in mods)
    standard_beta = linear and ("standard-beta" in mods)
    show_intercept = "intercept" in mods
    sex_everywhere = "sex" in mods
    no_x_sex = "no-x-sex" in mods
    do_perm = "perm" in mods
    perm_count = "perm-count" in mods
    mperm = mperm_val
    do_perms = do_perm or mperm is not None
    if interaction and do_perms:
        # without --tests there is no valid permutation target
        # (glm_common_init, 1.9/plink_glm.c:3997)
        raise _flag_error(
            "--linear/--logistic 'interaction' modifier cannot be used "
            "with\npermutation except with --tests.")
    # plink 1.9's default --xchr-model is 1 (male dosage 0..1); the Config
    # default of 2 belongs to the 2.0 --glm personality.  Genotype-model
    # modifiers force model 0 (1.9/plink.c:8070-8091) -- nonautosomal
    # variants are excluded -- unless an explicit --xchr-model overrides.
    if getattr(cfg, "xchr_model_set", False):
        xchr_model = cfg.xchr_model
    elif genotypic or hethom or dominant or recessive:
        xchr_model = 0
    else:
        xchr_model = 1

    # phenotype
    pheno_name = None
    pc = None
    for nm_, col in ds.si.phenos.items():
        pc = col
        pheno_name = nm_
        break
    if pc is None:
        raise _flag_error(f"{flagname} requires a loaded phenotype.")
    if linear and pc.kind != "qt":
        raise _flag_error("--linear without --all-pheno requires a scalar phenotype.")
    if (not linear) and pc.kind != "cc":
        raise _flag_error("--logistic without --all-pheno requires a case/control phenotype.")

    from .glm import _load_covars

    covar_names, covar_data, covar_nm = _load_covars(ds, cfg, log)

    n_cond = 0
    if cfg.condition or cfg.condition_list:
        cond_names, cond_data, cond_nm = _scan_conditions19(ds, cfg, log)
        # condition covariates PRECEDE --covar columns (plink_glm.c:4597:
        # fixed-covariate slots 0..condition_ct-1 hold the conditions)
        n_cond = len(cond_names)
        covar_names = cond_names + list(covar_names)
        covar_data = np.concatenate([cond_data, covar_data], axis=1)
        covar_nm = covar_nm & cond_nm

    pheno_nm = np.asarray(pc.nonmiss, bool)
    load_mask = ds.sample_mask & pheno_nm & covar_nm

    sex = ds.si.sex
    x_present = bool((ds.vi.chrom[ds.variant_mask]
                      == ds.vi.chr_info.x_code()).any()) \
        if hasattr(ds.vi.chr_info, "x_code") else True
    ci_x = _chrom_codes(ds)
    x_present = bool((ds.vi.chrom[ds.variant_mask] == ci_x["x"]).any())
    variation_in_sex = False
    if not (no_x_sex or (not sex_everywhere and not x_present)):
        sexed = load_mask & (sex != 0)
        msk = sex[sexed] == 1
        if msk.size and msk.any() and (~msk).any():
            variation_in_sex = True
        if variation_in_sex and sex_everywhere:
            load_mask = load_mask & (sex != 0)
        elif not variation_in_sex and sex_everywhere:
            log.log(f"Warning: Ignoring {flagname} 'sex' modifier since sex "
                    "is invariant.")
            sex_everywhere = False
    np_sex = 1 if (variation_in_sex and not sex_everywhere) else 0

    inc = np.flatnonzero(load_mask)
    n_valid = inc.size
    male = sex[inc] == 1
    sex_col_full = male.astype(np.float64)

    if linear:
        yfull = np.asarray(pc.data, np.float64)[inc]
        psum = pssq = 0.0
        for v_ in yfull:  # sequential adds, matching the reference
            psum += v_
            pssq += v_ * v_
        if pssq * n_valid == psum * psum:
            raise _flag_error("--linear phenotype is constant.")
        if standard_beta:
            # standardize ONCE globally; per-variant missing subsets then
            # re-standardize the standardized values with base sums
            # (0, n-1) exactly (1.9/plink_glm.c:4680-4689,5163-5186)
            mean = psum / n_valid
            mult = math.sqrt((n_valid - 1) / (pssq - psum * mean))
            yfull = (yfull - mean) * mult
            psum, pssq = 0.0, float(n_valid - 1)
    else:
        # cc phenotypes store 0=control, 1=case
        yfull = np.asarray(pc.data, np.float64)[inc]
        case_ct = int(yfull.sum())
        if case_ct == 0 or case_ct == n_valid:
            raise _flag_error(
                "--logistic requires both cases and controls.")
    covars = covar_data[inc]
    ncov = covars.shape[1]

    # A1 = minor allele (founder frequencies, set at load in the reference)
    freqs = alt_allele_freqs(ds, founders_only=True)
    with np.errstate(invalid="ignore"):
        a1_is_alt = ~(freqs > 0.5)

    vmask = ds.variant_mask.copy()
    vidx_orig = np.flatnonzero(vmask)  # pre---xchr-model-0 set (perm report)
    if xchr_model == 0:
        nonauto = ~ds.vi.chr_info.is_autosomal(ds.vi.chrom)
        excl = int((vmask & nonauto).sum())
        if excl:
            log.log(
                f"Excluding {excl} nonautosomal variant"
                f"{'s' if excl != 1 else ''} from {flagname} analysis "
                "(--xchr-model 0).")
        vmask &= ~nonauto
    vidx = np.flatnonzero(vmask)
    if vidx.size == 0:
        raise _flag_error(f"No variants remaining for {flagname} analysis.")
    vi = ds.vi
    maxsnp = _fw_width(len(str(vi.vid[i])) for i in vidx)

    # parameter names
    main_name = ("REC" if recessive else "DOM" if dominant
                 else "HOM" if hethom else "ADD")
    domdev_name = "HET" if hethom else "DOMDEV"
    constraint_max = 2 if gen_or_hh else 0
    joint_name_prefix = "GENO_"

    out_path = cfg.out + (".assoc.linear" if linear else ".assoc.logistic")
    ci_size = cfg.ci
    display_ci = ci_size is not None
    if display_ci:
        from .cluster import _ltqnorm

        ci_zt = _ltqnorm(1 - (1 - ci_size) / 2)
    hdr = (" CHR " + _fw("SNP", maxsnp) + "         BP   A1       TEST"
           + "    NMISS       " + ("  OR" if report_odds else "BETA") + " ")
    if display_ci:
        pct = int(ci_size * (100 + 1e-8))
        if pct >= 10:
            hdr += f"      SE      L{pct}      U{pct} "
        else:
            hdr += f"      SE       L{pct}       U{pct} "
    hdr += "        STAT            P \n"

    pfilter = cfg.pfilter if cfg.pfilter is not None else 2.0
    output_min_p = getattr(cfg, "output_min_p", 0.0) or 0.0
    vif_thresh = getattr(cfg, "vif", None) or 50.0

    # per-variant main pass
    codes_cache = _CodesReader(ds, inc)
    rows_out = []
    orig_stats = np.full(vidx.size, -9.0)  # |t| / z^2 / joint chisq
    orig_pvals = np.full(vidx.size, -9.0)
    tcnt = np.zeros(vidx.size, np.int64)
    nm_cts = np.zeros(vidx.size, np.int64)
    regression_skip = np.zeros(vidx.size, bool)
    chrom_of = vi.chrom[vidx]
    ci = ds.vi.chr_info

    perm_design: list = []  # per-variant (X, extra) kept when do_perms

    for mi, v in enumerate(vidx):
        chrom = int(chrom_of[mi])
        is_x = chrom == ci_x["x"]
        is_y = chrom == ci_x["y"]
        is_mt = chrom == ci_x["mt"]
        haploid = bool(ci.is_haploid(chrom, 1)) or is_mt
        min_ploidy_1 = haploid
        is_nonx_haploid = min_ploidy_1 and not is_x
        male_x_01 = is_x and xchr_model != 2
        include_sex = sex_everywhere or (is_x and np_sex)

        cnt = codes_cache.a1_counts(int(v), bool(a1_is_alt[v]))
        if min_ploidy_1:
            cnt = _hh_fix_cnt(cnt, is_x, is_y, haploid, male)
        nmiss_mask = cnt == 3
        nm_sel = ~nmiss_mask
        cur_n = int(nm_sel.sum())
        missing_ct = n_valid - cur_n
        nm_cts[mi] = cur_n

        use_domdev = gen_or_hh and not is_nonx_haploid
        n_int = (ncov * (2 if use_domdev else 1)) if interaction else 0
        n_sx = (1 + (1 + (1 if use_domdev else 0) if interaction else 0)) \
            if include_sex else 0
        p_ct = 2 + (1 if use_domdev else 0) + ncov + n_int + n_sx
        cur_constraint = constraint_max if (use_domdev and constraint_max) else 0

        test_names = ["INTERCEPT", main_name]
        if use_domdev:
            test_names.append(domdev_name)
        test_names += list(covar_names)
        if interaction:
            # ADDxCSNP<k> for conditions, ADDx<name> for file covariates;
            # DOMDEVx/HETx interleaved per covariate (plink_glm.c:4651-4689)
            for k, cn in enumerate(covar_names):
                tgt = f"CSNP{k + 1}" if k < n_cond else cn
                test_names.append(f"{main_name}x{tgt}")
                if use_domdev:
                    test_names.append(f"{domdev_name}x{tgt}")
        if include_sex:
            test_names.append("SEX")
            if interaction:
                test_names.append(f"{main_name}xSEX")
                if use_domdev:
                    test_names.append(f"{domdev_name}xSEX")

        prefix = (
            _fw(ci.name19(chrom), 4) + " " + _fw(str(vi.vid[v]), maxsnp)
            + " " + _fw(int(vi.pos[v]), 10) + " "
            + _fw(str(vi.alt[v]) if a1_is_alt[v] else str(vi.ref[v]), 4) + " "
        )

        fail = missing_ct >= n_valid - 1 or cur_n <= p_ct
        X = None
        if not fail:
            cnt_nm = cnt[nm_sel]
            male_nm = male[nm_sel]
            if not interaction:
                X = _build_design(
                    cnt_nm, male_nm, covars[nm_sel], sex_col_full[nm_sel],
                    model, use_domdev, male_x_01, is_nonx_haploid,
                    include_sex, np.float64,
                )
            else:
                X = _build_design_interaction(
                    cnt_nm, male_nm, covars[nm_sel], sex_col_full[nm_sel],
                    model, use_domdev, male_x_01, is_nonx_haploid,
                    include_sex,
                )
            if standard_beta:
                X = _standardize(X)
            H = None
            if cur_constraint:
                H = np.zeros((cur_constraint, p_ct))
                H[0, 1] = 1.0
                H[1, 2] = 1.0
            if linear:
                if _glm_check_vif(vif_thresh, X):
                    fail = True
                else:
                    y = yfull[nm_sel]
                    y_rss = None
                    if standard_beta and missing_ct:
                        s_, q_ = psum, pssq
                        for v_ in yfull[nmiss_mask]:
                            s_ -= v_
                            q_ -= v_ * v_
                        dzz = s_ / cur_n
                        dyy = math.sqrt((cur_n - 1) / (q_ - s_ * dzz))
                        y = (y - dzz) * dyy
                        # the in-regression RSS restandardization walks only
                        # ceil(cur_n/32) words of the missing mask
                        # (1.9/plink_glm.c:578-592 loop bound quirk), so
                        # missing samples past that boundary are not
                        # subtracted there -- reproduce for byte parity
                        bound = min(((cur_n + 31) // 32) * 32, n_valid)
                        s2, q2 = psum, pssq
                        for i_ in np.flatnonzero(nmiss_mask):
                            if i_ < bound:
                                v_ = yfull[i_]
                                s2 -= v_
                                q2 -= v_ * v_
                        dzz2 = s2 / cur_n
                        dyy2 = math.sqrt((cur_n - 1) / (q2 - s2 * dzz2))
                        y_rss = (yfull[nm_sel] - dzz2) * dyy2
                    res = _glm_linear_fit(X, y, H, y_rss=y_rss)
                    fail = res is None
            else:
                n4 = (cur_n + 3) & ~3
                X32 = np.zeros((p_ct, n4), F)
                X32[:, :cur_n] = X.astype(F)
                y32 = np.zeros(n4, F)
                y32[:cur_n] = yfull[nm_sel].astype(F)
                res = _logistic_fit(X32, y32, H)
                fail = res is None

        if not fail:
            coef, se2, joint, icept_var = res
            param_end = p_ct if not hide_covar else (3 if use_domdev else 2)
            for pi in range(1, p_ct):
                beta = float(coef[pi])
                se = math.sqrt(float(se2[pi])) if linear else math.sqrt(
                    float(se2[pi]))
                zval = beta / se
                if linear:
                    pval = calc_tprob(zval, cur_n - p_ct)
                else:
                    pval = _p_chisq(zval * zval, 1.0)
                if pi == 1 and not cur_constraint:
                    orig_stats[mi] = abs(zval) if linear else zval * zval
                    orig_pvals[mi] = pval
                    if linear:
                        tcnt[mi] = cur_n - p_ct
                if pi < param_end and (
                        pfilter == 2.0 or (0.0 <= pval <= pfilter)):
                    row = (prefix + _fw(test_names[pi], 10) + " "
                           + _fw(cur_n, 8) + " ")
                    disp = _exp(beta) if report_odds else beta
                    row += _g4(disp, 10) + " "
                    if display_ci:
                        dyy = ci_zt * se
                        row += _g4(se, 8) + " "
                        if report_odds:
                            row += _g4(_exp(beta - dyy), 8) + " "
                            row += _g4(_exp(beta + dyy), 8) + " "
                        else:
                            row += _g4(beta - dyy, 8) + " "
                            row += _g4(beta + dyy, 8) + " "
                    row += _g4(zval, 12) + " "
                    row += _g4(max(pval, output_min_p), 12) + "\n"
                    rows_out.append(row)
            if show_intercept:
                beta0 = float(coef[0])
                row = prefix + " INTERCEPT " + _fw(cur_n, 8) + " "
                disp = _exp(beta0) if report_odds else beta0
                row += _g4(disp, 10) + " "
                if display_ci:
                    se0 = math.sqrt(float(icept_var))
                    dyy = ci_zt * se0
                    row += _g4(se0, 8) + " "
                    if report_odds:
                        row += _g4(_exp(beta0 - dyy), 8) + " "
                        row += _g4(_exp(beta0 + dyy), 8) + " "
                    else:
                        row += _g4(beta0 - dyy, 8) + " "
                        row += _g4(beta0 + dyy, 8) + " "
                row += "          NA           NA\n"
                rows_out.append(row)
            if cur_constraint:
                # a joint-test failure stores -9 and still prints (STAT -9,
                # P max(-9, output_min_p)) -- see the writer at :5265-5285
                jstat = float(joint) if joint is not None else -9.0
                orig_stats[mi] = jstat
                pval = _p_chisq(jstat, cur_constraint)
                orig_pvals[mi] = pval
                if pfilter == 2.0 or (0.0 <= pval <= pfilter):
                    row = (prefix
                           + _fw(f"{joint_name_prefix}{cur_constraint}DF", 10)
                           + " " + _fw(cur_n, 8) + "         NA ")
                    if display_ci:
                        row += "      NA       NA       NA "
                    row += _g4(jstat, 12) + " "
                    row += _g4(max(pval, output_min_p), 12) + "\n"
                    rows_out.append(row)
        else:
            regression_skip[mi] = True
            if pfilter == 2.0:
                param_end = p_ct if not hide_covar else (3 if use_domdev else 2)
                cur_ctx = p_ct + (1 if cur_constraint else 0)
                for pi in range(1, cur_ctx):
                    if not (pi < param_end or pi == p_ct):
                        continue
                    tname = (test_names[pi] if pi != p_ct
                             else f"{joint_name_prefix}{cur_constraint}DF")
                    row = (prefix + _fw(tname, 10) + " " + _fw(cur_n, 8)
                           + "         NA ")
                    if display_ci:
                        row += "      NA       NA       NA "
                    row += "          NA           NA\n"
                    rows_out.append(row)

        if do_perms and not fail:
            perm_design.append((mi, X, cnt))
        elif do_perms:
            perm_design.append((mi, None, cnt))

    with open(out_path, "w") as f:
        f.write(hdr)
        f.writelines(rows_out)
    log.log(
        f"Writing {'linear' if linear else 'logistic'} model association "
        f"results to {out_path} ... done."
    )

    if do_perms:
        _run_perms(
            ds, cfg, log, linear, out_path, vidx, nm_cts, orig_stats,
            orig_pvals, tcnt, regression_skip, perm_design, yfull, maxsnp,
            mperm, perm_count, standard_beta, bool(constraint_max),
            vidx_orig,
        )


def _chrom_codes(ds):
    ci = ds.vi.chr_info
    return {
        "x": ci.code("X"),
        "y": ci.code("Y"),
        "mt": ci.code("MT"),
    }


class _CodesReader:
    """Per-variant A1-count codes over the valid-sample subset."""

    def __init__(self, ds, inc):
        self.ds = ds
        self.inc = inc
        self._block = None
        self._block_v0 = -1
        self._bs = 4096

    def a1_counts(self, v: int, a1_is_alt: bool) -> np.ndarray:
        if self._block is None or not (
                self._block_v0 <= v < self._block_v0 + self._bs):
            v0 = (v // self._bs) * self._bs
            vct = min(self._bs, self.ds.raw_variant_ct - v0)
            pk = self.ds.reader.read_packed(v0, vct)
            from ..ops.pairwise import _unpack_np

            self._block = _unpack_np(pk)[:, self.inc]
            self._block_v0 = v0
        codes = self._block[v - self._block_v0]
        if a1_is_alt:
            return codes
        out = codes.copy()
        out[codes == 0] = 2
        out[codes == 2] = 0
        return out


def _run_perms(ds, cfg, log, linear, out_path, vidx, nm_cts, orig_stats,
               orig_pvals, tcnt, regression_skip, perm_design, yfull,
               maxsnp, mperm, perm_count, standard_beta, has_joint,
               vidx_orig=None):
    """Adaptive (.perm) / max(T) (.mperm) permutation engine.

    Behavior reference: glm_linear_adapt/maxt_thread and
    glm_logistic_adapt/maxt_thread (1.9/plink_glm.c:2736,3087,2933,3261)
    plus the pass/batch driver in glm_*_assoc (first-batch halving,
    thread-capped SFMT stream assignment) and the EMP writer (:5505-5580).
    Linear permutes the (pre-standardized) phenotype perm-major
    (qt_perm_pmajor); logistic permutes case bits (cc_perm_matrix); both
    continue persistent per-thread SFMT streams across batches."""
    from scipy.linalg.lapack import dgels

    from ..stats.assoc_perm19 import EPSILON
    from ..stats.glm19f import glm_logistic_full
    from ..stats.perm19 import cc_perm_matrix, master_sfmt, qt_perm_pmajor
    from ..stats.sfmt import sfmt_thread_array
    from .cluster import _ltqnorm

    vi = ds.vi
    ci = vi.chr_info
    M = vidx.size
    perm_adapt = mperm is None
    if perm_adapt:
        ap_min, ap_max, ap_alpha, ap_beta, ap_init, ap_slope = cfg.aperm
        perms_total = ap_max
        ci_zt = _ltqnorm(1 - ap_beta / (2.0 * M))
        first_adapt_check = int(ap_init) if ap_min < ap_init else ap_min
    else:
        perms_total = mperm
        first_adapt_check = perms_total + 1
        ap_init = ap_slope = ap_alpha = ci_zt = 0.0

    batch = cfg.perm_batch_size or 512
    if batch > perms_total:
        batch = perms_total
    max_thread_ct = cfg.threads or 1
    if linear:
        # glm_linear_assoc:4788: cap = clamp(batch/16, 1, 16)
        uii = max(1, min(batch // 16, 16))
    else:
        # glm_logistic_assoc:6303: cap = min(batch, 16)
        uii = min(batch, 16)
    if max_thread_ct > uii:
        max_thread_ct = uii
    master = master_sfmt(cfg)
    sfmts = sfmt_thread_array(master, max_thread_ct)
    pfilter = cfg.pfilter if cfg.pfilter is not None else 2.0

    success2 = np.zeros(M, np.int64)
    attempt = np.zeros(M, np.int64)
    stopped = regression_skip.copy()
    extremes = np.zeros(perms_total) if not perm_adapt else None
    fails_maxt = np.zeros(M, np.int64)

    design = {mi: (X, cnt) for mi, X, cnt in perm_design}
    psum_b, pssq_b = (0.0, float(yfull.size - 1)) if standard_beta \
        else (0.0, 0.0)
    n_valid = yfull.size

    done = 0
    pass_idx = 0
    fac = first_adapt_check
    while done < perms_total:
        if perm_adapt and pass_idx:
            while fac <= done:
                fac += int(ap_init + fac * ap_slope)
        vec_ct = batch
        if perm_adapt and done < batch:
            ulii = batch
            uljj = max(64, 2 * max(int(ap_init), ap_min))
            while ulii >= (uljj << pass_idx):
                ulii >>= 1
            vec_ct = ulii - done
        vec_ct = min(vec_ct, perms_total - done)
        if linear:
            gthreads = max_thread_ct if vec_ct >= 16 * max_thread_ct \
                else max(vec_ct // 16, 1)
            perm_p = qt_perm_pmajor(yfull, vec_ct, gthreads, sfmts)
        else:
            gthreads = min(max_thread_ct, vec_ct)
            perm_p = cc_perm_matrix(
                yfull.astype(bool), vec_ct, gthreads, master, sfmts=sfmts)

        for mi in range(M):
            if stopped[mi]:
                continue
            X, cnt = design[mi]
            nmiss_mask = cnt == 3
            nm_sel = ~nmiss_mask
            cur_n = int(nm_sel.sum())
            missing_ct = n_valid - cur_n
            p = X.shape[0]
            if linear:
                dxx_arr, fail_arr = _linear_perm_stats(
                    X, perm_p, nm_sel, nmiss_mask, cur_n, missing_ct,
                    standard_beta, psum_b, pssq_b, has_joint, dgels)
            else:
                dxx_arr, fail_arr = _logistic_perm_stats(
                    X, perm_p, nm_sel, cur_n, has_joint, glm_logistic_full)
            # success / adaptive-stop walk (exact reference semantics)
            stat_high = orig_stats[mi] + EPSILON
            stat_low = orig_stats[mi] - EPSILON
            s2start = int(success2[mi])
            attempts = int(attempt[mi])
            s2incr = 0
            cur_fail = 0
            next_check = fac
            jumped = False
            for pidx in range(vec_ct):
                if not fail_arr[pidx]:
                    dxx = dxx_arr[pidx]
                    if dxx > stat_high:
                        s2incr += 2
                    elif dxx > stat_low:
                        s2incr += 1
                    elif has_joint and dxx == -9:
                        cur_fail += 1
                    if extremes is not None:
                        if extremes[done + pidx] < dxx:
                            extremes[done + pidx] = dxx
                else:
                    cur_fail += 1
                if pidx + 1 == next_check - done:
                    if s2start + s2incr:
                        cur_attempts = attempts + pidx + 1 - cur_fail
                        pv = (s2start + s2incr + 2) / (2.0 * (cur_attempts + 1))
                        d_ = ci_zt * math.sqrt(pv * (1 - pv) / cur_attempts)
                        if (pv - d_ > ap_alpha) or (pv + d_ < ap_alpha):
                            stopped[mi] = True
                            attempt[mi] = cur_attempts
                            jumped = True
                            break
                    next_check += int(ap_init + next_check * ap_slope)
            success2[mi] = s2start + s2incr
            if not jumped:
                attempt[mi] = attempts + vec_ct - cur_fail
            if extremes is not None:
                fails_maxt[mi] += cur_fail
        done += vec_ct
        pass_idx += 1
        if perm_adapt and stopped.all():
            break

    perms_done = done
    if perm_adapt:
        perms_done = int(attempt.max(initial=0))
        if perms_done > perms_total:
            perms_done = perms_total
    log.log(
        f"{perms_done} {'(adaptive)' if perm_adapt else 'max(T)'} "
        f"permutation{'s' if perms_done != 1 else ''} complete."
    )

    if not perm_adapt:
        attempt = perms_total - fails_maxt
        extremes_sorted = np.sort(extremes)
    out2 = out_path + (".perm" if perm_adapt else ".mperm")
    with open(out2, "w") as f:
        if perm_adapt:
            f.write(" CHR " + _fw("SNP", maxsnp) + "         EMP1           NP \n")
        else:
            f.write(" CHR " + _fw("SNP", maxsnp) + "         EMP1         EMP2 \n")
        analyzed = {int(v): mi for mi, v in enumerate(vidx)}
        if vidx_orig is None:
            vidx_orig = vidx
        for v in (int(x) for x in vidx_orig):
            mi = analyzed.get(v)
            if mi is None:
                # --xchr-model 0 exclusions still get perm-report rows in
                # the reference (zero counters); we print the stable
                # pattern (adaptive: EMP1=1 NP=0; max(T): 1 1) without
                # replicating its out-of-bounds array reads
                row = (_fw(ci.name19(int(vi.chrom[v])), 4) + " "
                       + _fw(str(vi.vid[v]), maxsnp) + " ")
                if 1.0 > pfilter:
                    continue
                if perm_adapt:
                    row += _g4(1.0, 12) + "   " + _fw(0, 10) + " \n"
                else:
                    row += _g4(1.0, 12) + " " + _g4(1.0, 12) + " \n"
                f.write(row)
                continue
            pv = (success2[mi] + 2) / (2.0 * (attempt[mi] + 1))
            if pv > pfilter:
                continue
            row = (_fw(ci.name19(int(vi.chrom[v])), 4) + " "
                   + _fw(str(vi.vid[v]), maxsnp) + " ")
            if orig_stats[mi] == -9:
                row += "          NA           NA \n"
            else:
                if not perm_count:
                    row += _g4(pv, 12) + " "
                else:
                    row += _g4(success2[mi] * 0.5, 12) + " "
                if perm_adapt:
                    row += "  " + _fw(int(attempt[mi]), 10) + " \n"
                else:
                    ngt = int((extremes_sorted
                               > orig_stats[mi] - EPSILON).sum())
                    dzz = ngt + 1
                    if not perm_count:
                        row += _g4(dzz / (perms_total + 1.0), 12) + " \n"
                    else:
                        row += _g4(float(dzz - 1), 12) + " \n"
            f.write(row)
    log.log(f"Permutation test report written to {out2} .")


def _linear_perm_stats(X, perm_p, nm_sel, nmiss_mask, cur_n, missing_ct,
                       standard_beta, psum_b, pssq_b, has_joint, dgels):
    """Per-permutation |t| (or joint chisq) for one marker, vectorized over
    permutations with the reference's sequential accumulation orders
    (np.cumsum is an ordered f64 scan)."""
    p = X.shape[0]
    vec_ct = perm_p.shape[0]
    fail = np.zeros(vec_ct, bool)
    s0 = _invert_matrix(X @ X.T)
    if s0 is None:
        return np.full(vec_ct, -9.0), np.ones(vec_ct, bool)
    diag = np.diagonal(s0)
    min_sigma = diag[1:].min() if p > 1 else diag[0]
    if min_sigma <= 0:
        return np.full(vec_ct, -9.0), np.ones(vec_ct, bool)
    min_sigma = 1e-20 / min_sigma
    B = np.ascontiguousarray(perm_p[:, nm_sel].T)  # [cur_n, vec]
    if standard_beta and missing_ct:
        s = np.cumsum(B, axis=0)[-1]
        q = np.cumsum(B * B, axis=0)[-1]
        dzz = s / cur_n
        dyy = np.sqrt((cur_n - 1) / (q - s * dzz))
        B = (B - dzz) * dyy
    _, cf, info = dgels(X.T.copy(), B)
    if info != 0:
        return np.full(vec_ct, -9.0), np.ones(vec_ct, bool)
    coef = cf[:p]  # [p, vec]
    pred = np.zeros((cur_n, vec_ct))
    Xs = X.T  # sample-major
    for j in range(p):
        pred = pred + Xs[:, j : j + 1] * coef[j : j + 1]
    if standard_beta and missing_ct:
        # truncated-word restandardization quirk (see run_glm19)
        bound = min(((cur_n + 31) // 32) * 32, perm_p.shape[1])
        mm = np.flatnonzero(nmiss_mask)
        s2 = np.full(vec_ct, psum_b)
        q2 = np.full(vec_ct, pssq_b)
        for i_ in mm:
            if i_ < bound:
                v_ = perm_p[:, i_]
                s2 = s2 - v_
                q2 = q2 - v_ * v_
        dzz2 = s2 / cur_n
        dyy2 = np.sqrt((cur_n - 1) / (q2 - s2 * dzz2))
        yr = (perm_p[:, nm_sel].T - dzz2) * dyy2
    else:
        yr = perm_p[:, nm_sel].T
    resid = pred - yr
    rss = np.cumsum(resid * resid, axis=0)[-1]
    sigma = rss / (cur_n - p)
    fail = sigma < min_sigma
    with np.errstate(invalid="ignore", divide="ignore"):
        if not has_joint:
            se = np.sqrt(diag[1] * sigma)
            dxx = np.abs(coef[1] / se)
        else:
            dxx = np.empty(vec_ct)
            H = np.zeros((2, p))
            H[0, 1] = 1.0
            H[1, 2] = 1.0
            for pidx in range(vec_ct):
                if fail[pidx]:
                    dxx[pidx] = -9.0
                    continue
                j = _linear_hypothesis_chisq(
                    H, coef[:, pidx], s0 * sigma[pidx])
                dxx[pidx] = j if j is not None else -9.0
    dxx = np.where(fail, -9.0, dxx)
    return dxx, fail


def _logistic_perm_stats(X, perm_p, nm_sel, cur_n, has_joint,
                         glm_logistic_full):
    """Per-permutation z^2 (or joint chisq) for one marker: the float IRLS
    runs per permutation, matching glm_logistic's batch loop."""
    vec_ct = perm_p.shape[0]
    p = X.shape[0]
    n4 = (cur_n + 3) & ~3
    X32 = np.zeros((p, n4), F)
    X32[:, :cur_n] = X.astype(F)
    dxx = np.full(vec_ct, -9.0)
    fail = np.zeros(vec_ct, bool)
    H = None
    if has_joint:
        H = np.zeros((2, p))
        H[0, 1] = 1.0
        H[1, 2] = 1.0
    y32 = np.zeros(n4, F)
    for pidx in range(vec_ct):
        y32[:cur_n] = perm_p[pidx, nm_sel].astype(F)
        res = glm_logistic_full(X32, y32)
        if res is None:
            fail[pidx] = True
            continue
        coef, S = res
        if not has_joint:
            d_ = float(coef[1])
            d_ = d_ * d_
            dxx[pidx] = d_ / float(S[1, 1])
        else:
            j = _linear_hypothesis_chisq(
                H, coef.astype(np.float64), S.astype(np.float64))
            dxx[pidx] = F(j) if j is not None else -9.0
    return dxx, fail


_NOSNP_CONFLICTS = {"perm", "genedrop", "genotypic", "hethom", "dominant",
                    "recessive", "no-x-sex", "interaction", "set-test"}


def _run_glm19_nosnp(ds: Dataset, cfg, log: RunLogger, linear: bool,
                     mods: set, mperm_val) -> None:
    """--linear/--logistic 'no-snp': one-off covariate-only regression.

    ref: glm_linear_nosnp (1.9/plink_glm.c:7055) / glm_logistic_nosnp
    (:7923).  Parameter sequence: intercept, --condition(-list) variants,
    --covar columns, sex ('sex' modifier, only when sex varies).  Unlike
    the per-variant path, glm_scan_conditions excludes samples with
    missing condition genotypes here too (:7182).  The logistic
    branch has no VIF check (:8296 "no more VIF check") and its INTERCEPT
    row ends after the CI columns with no STAT/P/newline (:8448-8466) --
    replicated verbatim.  Fixed-count mperm= is not implemented here.
    """
    flagname = "--linear" if linear else "--logistic"
    if mods & _NOSNP_CONFLICTS:
        raise _flag_error(
            f"{flagname} 'no-snp' modifier conflicts with another modifier.")
    if mperm_val is not None:
        raise _flag_error(
            f"{flagname} no-snp mperm= is not implemented yet.")
    hide_covar = "hide-covar" in mods
    if hide_covar:
        # no --tests support, so hide-covar always yields zero output rows
        raise _flag_error(f"{flagname} hide-covar no-snp produces no output.")
    report_odds = (not linear) and ("beta" not in mods)
    standard_beta = linear and ("standard-beta" in mods)
    show_intercept = "intercept" in mods
    sex_mod = "sex" in mods

    pheno_name = None
    pc = None
    for nm_, col in ds.si.phenos.items():
        pc = col
        pheno_name = nm_
        break
    if pc is None:
        raise _flag_error(f"{flagname} requires a loaded phenotype.")
    if linear and pc.kind != "qt":
        raise _flag_error(
            "--linear without --all-pheno requires a scalar phenotype.")
    if (not linear) and pc.kind != "cc":
        raise _flag_error(
            "--logistic without --all-pheno requires a case/control "
            "phenotype.")

    from .glm import _load_covars

    covar_names, covar_data, covar_nm = _load_covars(ds, cfg, log)
    cond_names: list = []
    cond_data = None
    pheno_nm = np.asarray(pc.nonmiss, bool)
    load_mask = ds.sample_mask & pheno_nm & covar_nm
    pheno_nm_ct = int((ds.sample_mask & pheno_nm).sum())
    if cfg.condition or cfg.condition_list:
        # glm_scan_conditions also runs on this path (:7182): samples with
        # missing condition genotypes are excluded BEFORE the sex check
        cond_names, cond_data, cond_nm = _scan_conditions19(ds, cfg, log)
        load_mask = load_mask & cond_nm

    sex = ds.si.sex
    include_sex = False
    if sex_mod:
        known = sex[load_mask & (sex != 0)] == 1
        if known.size and known.any() and (~known).any():
            include_sex = True
            load_mask = load_mask & (sex != 0)
        else:
            log.log(f"Warning: Ignoring {flagname} 'sex' modifier since sex "
                    "is invariant.")

    inc = np.flatnonzero(load_mask)
    n = inc.size
    names = ["(intercept)"] + list(cond_names) + list(covar_names)
    if include_sex:
        names.append("SEX")
    p_ct = len(names)
    if p_ct == 1:
        log.log(f"Warning: Skipping {flagname} since the intercept is the "
                "only variable.")
        return
    if n <= p_ct:
        log.log(f"Warning: Skipping {flagname} since # variables >= "
                "# samples.")
        if pheno_nm_ct > p_ct:
            log.log("(Check your covariates--all samples with at least one "
                    "missing covariate are\nexcluded from this analysis.)")
        return

    cols = [np.ones(n, np.float64)]
    if cond_data is not None:
        for k in range(cond_data.shape[1]):
            cols.append(cond_data[inc, k].astype(np.float64))
    for k in range(covar_data.shape[1]):
        cols.append(covar_data[inc, k].astype(np.float64))
    if include_sex:
        cols.append((sex[inc] == 1).astype(np.float64))
    X = np.ascontiguousarray(np.stack(cols))

    yfull = np.asarray(pc.data, np.float64)[inc]
    if linear:
        psum = pssq = 0.0
        for v_ in yfull:  # sequential adds, matching the reference
            psum += v_
            pssq += v_ * v_
        if pssq * n == psum * psum:
            log.log("Warning: Skipping --linear since phenotype is "
                    "constant.")
            return
        if standard_beta:
            mean = psum / n
            mult = math.sqrt((n - 1) / (pssq - psum * mean))
            yfull = (yfull - mean) * mult
            # sequential (single-pass) sum/ssq accumulation, matching the
            # reference exactly -- a BLAS dot's pairwise order flips the
            # last ulp of the standardized columns, which the degenerate
            # ~0 intercept coefficient then amplifies into display range
            for i_ in range(1, p_ct):
                col = X[i_]
                dxx = dyy = 0.0
                for v_ in col:
                    dzz = float(v_)
                    dxx += dzz
                    dyy += dzz * dzz
                dzz = dxx / n
                dyy = math.sqrt((dyy - dxx * dzz) / (n - 1))
                if dyy == 0:
                    X[i_] = 0.0
                else:
                    X[i_] = (col - dzz) * (1.0 / dyy)
        vif_thresh = getattr(cfg, "vif", None) or 50.0
        if _glm_check_vif(vif_thresh, X):
            log.log("Warning: Skipping --linear no-snp since VIF check "
                    "failed.")
            return
        res = _glm_linear_fit(X, yfull)
        if res is None:
            log.log("Warning: Skipping --linear no-snp due to "
                    "multicollinearity.")
            return
    else:
        case_ct = int(yfull.sum())
        if case_ct == 0 or case_ct == n:
            log.log("Warning: Skipping --logistic since phenotype is "
                    "constant.")
            return
        n4 = (n + 3) & ~3
        X32 = np.zeros((p_ct, n4), F)
        X32[:, :n] = X.astype(F)
        y32 = np.zeros(n4, F)
        y32[:n] = yfull.astype(F)
        res = _logistic_fit(X32, y32)
        if res is None:
            log.log("Warning: Skipping --logistic no-snp due to "
                    "multicollinearity.")
            return
    coef, se2, _joint, icept_var = res

    out_path = cfg.out + (".assoc.linear" if linear else ".assoc.logistic")
    ci_size = cfg.ci
    display_ci = ci_size is not None
    if display_ci:
        from .cluster import _ltqnorm

        ci_zt = _ltqnorm(1 - (1 - ci_size) / 2)
    hdr = ("      TEST    NMISS       "
           + ("  OR" if report_odds else "BETA") + " ")
    if display_ci:
        pct = int(ci_size * (100 + 1e-8))
        if pct >= 10:
            hdr += f"      SE      L{pct}      U{pct} "
        else:
            hdr += f"      SE       L{pct}       U{pct} "
    hdr += "        STAT            P \n"
    pfilter = cfg.pfilter if cfg.pfilter is not None else 2.0
    output_min_p = getattr(cfg, "output_min_p", 0.0) or 0.0

    rows = []
    for pi in range(1, p_ct):
        beta = float(coef[pi])
        se = math.sqrt(float(se2[pi]))
        zval = beta / se
        if linear:
            pval = calc_tprob(zval, n - p_ct)
        else:
            pval = _p_chisq(zval * zval, 1.0)
        if pfilter == 2.0 or (0.0 <= pval <= pfilter):
            row = _fw(names[pi], 10) + " " + _fw(n, 8) + " "
            disp = _exp(beta) if report_odds else beta
            row += _g4(disp, 10) + " "
            if display_ci:
                dyy = ci_zt * se
                row += _g4(se, 8) + " "
                if report_odds:
                    row += _g4(_exp(beta - dyy), 8) + " "
                    row += _g4(_exp(beta + dyy), 8) + " "
                else:
                    row += _g4(beta - dyy, 8) + " "
                    row += _g4(beta + dyy, 8) + " "
            row += _g4(zval, 12) + " "
            row += _g4(max(pval, output_min_p), 12) + "\n"
            rows.append(row)
    if show_intercept:
        beta0 = float(coef[0])
        row = " INTERCEPT " + _fw(n, 8) + " "
        disp = _exp(beta0) if report_odds else beta0
        row += _g4(disp, 10) + " "
        if display_ci:
            se0 = math.sqrt(float(icept_var if linear else se2[0]))
            dyy = ci_zt * se0
            row += _g4(se0, 8) + " "
            if report_odds:
                row += _g4(_exp(beta0 - dyy), 8) + " "
                row += _g4(_exp(beta0 + dyy), 8) + " "
            else:
                row += _g4(beta0 - dyy, 8) + " "
                row += _g4(beta0 + dyy, 8) + " "
        if linear:
            row += "          NA           NA\n"
        # logistic: no STAT/P and no newline (upstream quirk, :8464)
        rows.append(row)
    with open(out_path, "w") as f:
        f.write(hdr)
        f.writelines(rows)
    log.log(
        f"Writing {'linear' if linear else 'logistic'} model association "
        f"results to {out_path} ... done."
    )
