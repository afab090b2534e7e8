"""--glm: linear / logistic / Firth association regressions.

Behavior reference: GlmMain (2.0/plink2_glm.cc:2395), GlmLinear
(2.0/plink2_glm_linear.cc:1630), GlmLogistic (2.0/plink2_glm_logistic.cc)
with the glm.fit()-imitating IRLS of LogisticRegressionD (:3590).

Conventions verified against a locally built plink2:
- A1 = minor allele by default (major omitted: plink2_glm.cc:2622
  "omitted_alleles = (glm_flags & kfGlmOmitRef)? nullptr : maj_alleles");
  'omit-ref' makes A1 = ALT.
- Output: <out>.<pheno>.glm.linear with columns #CHROM POS ID REF ALT
  PROVISIONAL_REF? A1 OMITTED A1_FREQ TEST OBS_CT BETA SE T_STAT P ERRCODE;
  logistic adds FIRTH? and uses OR / LOG(OR)_SE / Z_STAT.
- TEST rows: ADD + one row per covariate (hide-covar suppresses the rest).
- hybrid Firth fallback triggers: separation (A1 case dosage 0 or total,
  plink2_glm_logistic.cc:2224-2236) or logistic convergence failure.
- ERRCODE strings from plink2_glm_shared.cc:33.
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..ops.pairwise import PackedDevice
from ..stats.distributions import t_logp_2sided, zstat_logp_2sided
from ..utils.fmt import g6, logp_to_str
from ..utils.logging import RunLogger
from .basic_reports import alt_allele_freqs, _provref_strs


def _read_table(path: str):
    """Read a pheno/covar file: header (#FID IID ... | #IID ... | FID IID ...),
    returns (id_mode, ids, colnames, str values [n, k])."""
    with open(path) as f:
        lines = [l.rstrip("\n") for l in f if l.strip()]
    hdr = lines[0]
    toks = hdr.lstrip("#").split()
    if toks[0] == "FID":
        id_cols, id_mode = 2, "fid_iid"
    elif toks[0] == "IID":
        id_cols, id_mode = 1, "iid"
    else:
        raise ValueError(f"{path}: header must start with #FID/#IID")
    colnames = toks[id_cols:]
    ids, vals = [], []
    for l in lines[1:]:
        t = l.split()
        ids.append("\t".join(t[:id_cols]))
        vals.append(t[id_cols : id_cols + len(colnames)])
    return id_mode, np.array(ids, dtype=object), colnames, vals


def _match_rows(ds: Dataset, id_mode: str, ids: np.ndarray) -> np.ndarray:
    """Map file rows -> raw sample indices (-1 = unmatched)."""
    si = ds.si
    if id_mode == "fid_iid":
        keys = {f"{si.fid[i]}\t{si.iid[i]}": i for i in range(si.sample_ct)}
    else:
        keys = {str(si.iid[i]): i for i in range(si.sample_ct)}
    return np.array([keys.get(str(x), -1) for x in ids], dtype=np.int64)


def _load_covars(ds: Dataset, cfg, log: RunLogger):
    """Returns (names, data [n_raw, k] float64, nonmiss [n_raw] bool)."""
    if not cfg.covar:
        return [], np.zeros((ds.raw_sample_ct, 0)), np.ones(ds.raw_sample_ct, bool)
    id_mode, ids, colnames, vals = _read_table(cfg.covar)
    rows = _match_rows(ds, id_mode, ids)
    if cfg.covar_name:
        sel = [colnames.index(n) for n in cfg.covar_name]
        names = list(cfg.covar_name)
    else:
        sel = list(range(len(colnames)))
        names = colnames
    n = ds.raw_sample_ct
    data = np.full((n, len(sel)), np.nan)
    # vectorized parse: one [rows, cols] object pass instead of per-cell loops
    arr = np.array([[row[s] for s in sel] for row in vals], dtype=object)
    ok = rows >= 0
    with np.errstate(invalid="ignore"):
        numeric = np.where(
            np.isin(arr, ("NA", "nan", "-9")), "nan", arr
        ).astype(np.float64)
    data[rows[ok]] = numeric[ok]
    nonmiss = ~np.isnan(data).any(axis=1)
    log.log(
        f"{len(names)} covariate{'s' if len(names) != 1 else ''} loaded from "
        f"{cfg.covar}."
    )
    return names, np.nan_to_num(data), nonmiss


def _load_phenos(ds: Dataset, cfg, log: RunLogger):
    """Returns list of (name, kind 'qt'|'cc', values f64 [n_raw], nonmiss)."""
    out = []
    if cfg.pheno:
        from ..io.psam import _build_pheno

        id_mode, ids, colnames, vals = _read_table(cfg.pheno)
        rows = _match_rows(ds, id_mode, ids)
        n = ds.raw_sample_ct
        for c, name in enumerate(colnames):
            col_strs = ["NA"] * n
            for r, idx in enumerate(rows):
                if idx >= 0:
                    col_strs[idx] = vals[r][c]
            pc = _build_pheno(name, col_strs)
            out.append((name, pc.kind, pc.data, pc.nonmiss))
    else:
        for name, pc in ds.si.phenos.items():
            out.append((name, pc.kind, pc.data, pc.nonmiss))
    if cfg.pheno_name:
        keep = set(cfg.pheno_name)
        out = [p for p in out if p[0] in keep]
    return out


def run_glm(ds: Dataset, cfg, log: RunLogger) -> None:
    mods = set(cfg.glm_modifiers)
    hide_covar = "hide-covar" in mods
    omit_ref = "omit-ref" in mods
    add_sex = "sex" in mods
    always_firth = "firth" in mods
    no_firth = "no-firth" in mods

    cov_names, cov_data, cov_nonmiss = _load_covars(ds, cfg, log)
    if add_sex:
        sex = ds.si.sex.astype(np.float64)
        cov_names = cov_names + ["SEX"]
        cov_data = np.concatenate([cov_data, sex[:, None]], axis=1)
        cov_nonmiss &= ds.si.sex != 0
    if not cov_names and "allow-no-covars" not in mods:
        raise ValueError(
            "--glm: no covariates loaded; use 'allow-no-covars' to allow this"
        )
    if cfg.covar_variance_standardize and cov_data.shape[1]:
        m = cov_data[cov_nonmiss].mean(axis=0)
        sd = cov_data[cov_nonmiss].std(axis=0, ddof=1)
        sd[sd == 0] = 1.0
        cov_data = (cov_data - m) / sd

    phenos = _load_phenos(ds, cfg, log)
    if not phenos:
        raise ValueError("--glm: no phenotypes loaded")

    # A1 selection (minor allele unless omit-ref)
    freqs = alt_allele_freqs(ds, founders_only=not cfg.nonfounders)
    a1_is_alt = np.ones(ds.raw_variant_ct, bool) if omit_ref else ~(freqs > 0.5)

    for name, kind, ydata, ynonmiss in phenos:
        if kind == "cat":
            log.log(f"--glm: skipping categorical phenotype '{name}'.")
            continue
        smask = ds.sample_mask & ynonmiss & cov_nonmiss
        nm_ct = int(smask.sum())
        # drop covariates that are constant over this pheno's sample set
        # (ref: GlmDetermineCovars; log wording matches plink2)
        p_names, p_data = list(cov_names), cov_data
        if p_data.shape[1]:
            keep = []
            for j, cn in enumerate(p_names):
                if np.ptp(p_data[smask, j]) == 0:
                    log.log(
                        f"Warning: Excluding constant covariate '{cn}' from --glm."
                    )
                else:
                    keep.append(j)
            p_names = [p_names[j] for j in keep]
            p_data = p_data[:, keep]
        if kind == "cc":
            case_ct = int(ydata[smask].sum())
            log.log(
                f"--glm {'Firth' if always_firth else 'logistic'} regression on "
                f"phenotype '{name}': {case_ct} cases, {nm_ct - case_ct} controls."
            )
            _glm_logistic(
                ds, cfg, log, name, ydata, smask, p_names, p_data,
                a1_is_alt, hide_covar, always_firth, no_firth,
            )
        else:
            log.log(f"--glm linear regression on phenotype '{name}': {nm_ct} samples.")
            _glm_linear(
                ds, cfg, log, name, ydata, smask, p_names, p_data,
                a1_is_alt, hide_covar,
            )


def _row_meta(ds: Dataset, a1_is_alt):
    vi = ds.vi
    _, prov_fn = _provref_strs(ds)
    provref = [prov_fn(i).lstrip("\t") or "N" for i in range(vi.variant_ct)]
    chrom = [vi.chr_info.name(c) for c in vi.chrom]
    alt1 = vi.alt1()
    a1 = np.where(a1_is_alt, alt1, vi.ref)
    omitted = np.where(a1_is_alt, vi.ref, alt1)
    return chrom, provref, a1, omitted


ERR_OK = "."


def _auto_vb(npad: int) -> int:
    """Variant-block size bounded so [vb, n] f32 temporaries stay ~0.5 GB
    (several are live at once inside the IRLS loop)."""
    target_elems = 1 << 27
    vb = max(64, min(2048, target_elems // max(npad, 1)))
    return (vb // 8) * 8


def _geno_predictors(mods: set, cov_names: list[str]):
    """Genotype predictor descriptors for the requested model.

    Each predictor is (test_name, weights_when_A1_is_ALT,
    weights_when_A1_is_REF) with weights over the (H, A, V) planes; the
    A1=REF flip follows g' = 2*valid - g algebra (ADD' = -H - 2A + 2V, etc).
    Returns (preds, joint_name) where joint_name is e.g. GENO_2DF.
    """
    if "dominant" in mods:
        return [("DOM", (1, 1, 0), (0, -1, 1))], None
    if "recessive" in mods:
        return [("REC", (0, 1, 0), (-1, -1, 1))], None
    if "hetonly" in mods:
        return [("HET", (1, 0, 0), (1, 0, 0))], None
    if "genotypic" in mods:
        return (
            [("ADD", (1, 2, 0), (-1, -2, 2)), ("DOMDEV", (1, 0, 0), (1, 0, 0))],
            "GENO_2DF",
        )
    if "hethom" in mods:
        # HOM = hom-A1 indicator, HET = het indicator
        return (
            [("HOM", (0, 1, 0), (-1, -1, 1)), ("HET", (1, 0, 0), (1, 0, 0))],
            "GENO_2DF",
        )
    return [("ADD", (1, 2, 0), (-1, -2, 2))], None


def _glm_linear(
    ds, cfg, log, pheno_name, ydata, smask, cov_names, cov_data, a1_is_alt,
    hide_covar,
):
    import jax.numpy as jnp

    from ..ops.glm import linear_block_sums
    from ..stats.distributions import f_logsf

    mods = set(cfg.glm_modifiers)
    interaction = "interaction" in mods
    geno_preds, joint_name = _geno_predictors(mods, cov_names)

    inc = np.flatnonzero(smask)
    n = inc.size
    y = ydata[inc].astype(np.float64)
    k = len(cov_names)
    dc = k + 1
    vb = _auto_vb(-(-n // 4) * 4)
    c = np.concatenate([np.ones((n, 1)), cov_data[inc]], axis=1)

    # predictor list: const, geno preds, covars, interactions
    # each predictor = (plane weights (wH, wA, wV) per flip-state, cov idx)
    P = len(geno_preds)
    pred_specs = []  # (name, w_alt, w_ref, covj)
    pred_specs.append(("CONST", (0, 0, 1), (0, 0, 1), 0))
    for name, w_alt, w_ref in geno_preds:
        pred_specs.append((name, w_alt, w_ref, 0))
    for j, cn in enumerate(cov_names):
        pred_specs.append((cn, (0, 0, 1), (0, 0, 1), j + 1))
    if interaction:
        for gname, w_alt, w_ref in geno_preds:
            for j, cn in enumerate(cov_names):
                pred_specs.append((f"{gname}x{cn}", w_alt, w_ref, j + 1))
    d = len(pred_specs)
    geno_idx = list(range(1, 1 + P))

    tests = [s[0] for s in pred_specs[1:]]
    if hide_covar:
        tests = [t for t in tests if t not in cov_names]
    if joint_name:
        tests = tests + [joint_name]

    # shared f64 blocks (role of RegressionNmPrecomp)
    ctc_full = c.T @ c
    cty_full = c.T @ y
    yy_full = float(y @ y)

    pd = PackedDevice(ds, ds.variant_mask, vb=vb, tile=1 << 30, sample_mask=smask)
    npad = pd.npad
    cp = np.zeros((npad, dc))
    cp[:n] = c
    yp = np.zeros(npad)
    yp[:n] = y
    c32 = jnp.asarray(cp.astype(np.float32))
    ccfl = jnp.asarray(
        (cp[:, :, None] * cp[:, None, :]).reshape(npad, dc * dc).astype(np.float32)
    )
    y32 = jnp.asarray(yp.astype(np.float32))
    cy32 = jnp.asarray((cp * yp[:, None]).astype(np.float32))
    y232 = jnp.asarray((yp * yp).astype(np.float32))

    vmask = ds.variant_mask
    M = ds.raw_variant_ct
    chrom, provref, a1, omitted = _row_meta(ds, a1_is_alt)
    vi = ds.vi

    path = f"{cfg.out}.{pheno_name}.glm.linear"
    f = open(path, "w")
    stat_col = "T_OR_F_STAT" if joint_name else "T_STAT"
    f.write(
        "#CHROM\tPOS\tID\tREF\tALT\tPROVISIONAL_REF?\tA1\tOMITTED\tA1_FREQ\t"
        f"TEST\tOBS_CT\tBETA\tSE\t{stat_col}\tP\tERRCODE\n"
    )
    add_results: list[tuple[int, float]] = []

    for bi in range(pd.nblocks):
        v0 = bi * pd.vb
        sums = {
            kk: np.asarray(vv, dtype=np.float64)
            for kk, vv in linear_block_sums(
                pd.packed[bi], c32, ccfl, y32, cy32, y232
            ).items()
        }
        vct = min(pd.vb, M - v0)
        ia = np.array([i for i in range(vct) if vmask[v0 + i]])
        if ia.size == 0:
            continue
        b = len(ia)
        hcc = sums["hcc"][ia].reshape(b, dc, dc)
        acc = sums["acc"][ia].reshape(b, dc, dc)
        mcc = sums["mcc"][ia].reshape(b, dc, dc)
        vcc = ctc_full[None] - mcc  # valid-plane c_j c_k sums
        hcy = sums["hcy"][ia]
        acy = sums["acy"][ia]
        vcy = cty_full[None] - sums["mcy"][ia]
        yy_v = yy_full - sums["myy"][ia]
        nm = vcc[:, 0, 0]
        flip = ~a1_is_alt[v0 + ia]

        def cross(w1, w2, j1, j2):
            h1, a1_, v1 = w1
            h2, a2_, v2 = w2
            coef_h = h1 * h2 + h1 * v2 + v1 * h2
            coef_a = a1_ * a2_ + a1_ * v2 + v1 * a2_
            coef_v = v1 * v2
            return (
                coef_h * hcc[:, j1, j2]
                + coef_a * acc[:, j1, j2]
                + coef_v * vcc[:, j1, j2]
            )

        def xy(w, j):
            h, a_, v = w
            return h * hcy[:, j] + a_ * acy[:, j] + v * vcy[:, j]

        xtx = np.zeros((b, d, d))
        xty = np.zeros((b, d))
        for p in range(d):
            _, wa1, wr1, j1 = pred_specs[p]
            for q in range(p, d):
                _, wa2, wr2, j2 = pred_specs[q]
                val = np.where(
                    flip, cross(wr1, wr2, j1, j2), cross(wa1, wa2, j1, j2)
                )
                xtx[:, p, q] = val
                xtx[:, q, p] = val
            xty[:, p] = np.where(flip, xy(wr1, j1), xy(wa1, j1))

        # A1 dosage sums for A1_FREQ / const-allele detection
        g1 = np.where(
            flip, cross((-1, -2, 2), (0, 0, 1), 0, 0),
            cross((1, 2, 0), (0, 0, 1), 0, 0),
        )
        gg1 = np.where(
            flip, cross((-1, -2, 2), (-1, -2, 2), 0, 0),
            cross((1, 2, 0), (1, 2, 0), 0, 0),
        )

        _emit_linear_rows(
            f, ds, v0, ia, nm, g1, gg1, xtx, xty, yy_v, d, tests, hide_covar,
            chrom, provref, a1, omitted, vi, cov_names, add_results,
            pred_specs, geno_idx, joint_name,
        )
    f.close()
    log.log(f"Results written to {path} .")
    if getattr(cfg, "adjust", False):
        from .adjust import write_adjusted

        write_adjusted(ds, cfg, log, pheno_name, "glm.linear", add_results, a1)


def _emit_linear_rows(
    f, ds, v0, ia, nm, g1, gg1, xtx, xty, yy_v, d, tests, hide_covar,
    chrom, provref, a1, omitted, vi, cov_names, add_results=None,
    pred_specs=None, geno_idx=None, joint_name=None,
):
    from ..stats.distributions import f_logsf

    b = len(ia)
    beta = np.full((b, d), np.nan)
    se = np.full((b, d), np.nan)
    tstat = np.full((b, d), np.nan)
    logp = np.full((b, d), np.nan)
    fstat = np.full(b, np.nan)
    logp_joint = np.full(b, np.nan)
    err = [ERR_OK] * b
    dof = nm - d
    gvar = gg1 - np.where(nm > 0, g1 * g1 / np.maximum(nm, 1), 0.0)
    q_joint = len(geno_idx) if geno_idx else 1
    for i in range(b):
        if nm[i] <= d:
            err[i] = "SAMPLE_CT<=PREDICTOR_CT"
            continue
        if gvar[i] <= 1e-12:
            # biallelic const genotype: the reference's check order flags the
            # omitted (major) allele first (plink2_glm_logistic.cc:1966-1969)
            err[i] = "CONST_OMITTED_ALLELE"
            continue
        # collinearity pre-checks (ref: CheckMaxCorrAndVifNm,
        # plink2_glm_shared.cc:96-143; defaults max_corr=0.999, vif=50)
        s = xtx[i]
        covm = s[1:, 1:] - np.outer(s[1:, 0], s[0, 1:]) / nm[i]
        var = np.diag(covm).copy()
        pos = var > 1e-12
        if pos.sum() >= 2:
            sub = covm[np.ix_(pos, pos)]
            dsub = np.sqrt(np.diag(sub))
            corr = sub / np.outer(dsub, dsub)
            od = corr[~np.eye(len(dsub), dtype=bool)]
            if np.any(np.abs(od) > 0.999):
                err[i] = "CORR_TOO_HIGH"
                continue
        if not pos.all():
            err[i] = "VIF_INFINITE"
            continue
        if len(var) >= 2:
            try:
                icorr = np.linalg.inv(corr)
                if np.any(np.diag(icorr) > 50.0):
                    err[i] = "VIF_TOO_HIGH"
                    continue
            except np.linalg.LinAlgError:
                err[i] = "VIF_INFINITE"
                continue
        try:
            inv = np.linalg.inv(xtx[i])
        except np.linalg.LinAlgError:
            err[i] = "RANK_DEFICIENT"
            continue
        bvec = inv @ xty[i]
        rss = yy_v[i] - bvec @ xty[i]
        sigma2 = rss / dof[i]
        diag = np.diag(inv)
        if sigma2 < 0 or (diag <= 0).any():
            err[i] = "INVALID_RESULT"
            continue
        beta[i] = bvec
        se[i] = np.sqrt(sigma2 * diag)
        tstat[i] = bvec / se[i]
        if joint_name:
            # reduced model: drop the genotype predictors
            keep = [p for p in range(d) if p not in geno_idx]
            try:
                inv0 = np.linalg.inv(xtx[i][np.ix_(keep, keep)])
                b0 = inv0 @ xty[i][keep]
                rss0 = yy_v[i] - b0 @ xty[i][keep]
                fstat[i] = ((rss0 - rss) / q_joint) / sigma2
            except np.linalg.LinAlgError:
                pass
    ok = np.array([e == ERR_OK for e in err])
    if ok.any():
        lt = np.asarray(t_logp_2sided(tstat[ok], dof[ok, None]))
        logp[ok] = lt
        if joint_name:
            okj = ok & np.isfinite(fstat)
            if okj.any():
                logp_joint[okj] = np.asarray(
                    f_logsf(fstat[okj], float(q_joint), dof[okj])
                )

    with np.errstate(invalid="ignore"):
        a1f = np.where(nm > 0, g1 / (2 * np.maximum(nm, 1)), np.nan)
    if add_results is not None:
        add_pred = None
        for p, spec in enumerate(pred_specs):
            if spec[0] in ("ADD", "DOM", "REC", "HETONLY", "HOM"):
                add_pred = p
                break
        if add_pred is not None:
            for i in range(b):
                if err[i] == ERR_OK and np.isfinite(logp[i, add_pred]):
                    add_results.append(
                        (int(v0 + ia[i]), float(logp[i, add_pred]))
                    )
    test_pred = {spec[0]: p for p, spec in enumerate(pred_specs)}
    lines = []
    for i in range(b):
        vidx = v0 + ia[i]
        meta = (
            f"{chrom[vidx]}\t{vi.pos[vidx]}\t{vi.vid[vidx]}\t{vi.ref[vidx]}\t"
            f"{vi.alt[vidx]}\t{provref[vidx]}\t{a1[vidx]}\t{omitted[vidx]}\t"
            f"{g6(a1f[i])}"
        )
        for tname in tests:
            if err[i] != ERR_OK:
                lines.append(
                    f"{meta}\t{tname}\t{int(nm[i])}\tNA\tNA\tNA\tNA\t{err[i]}\n"
                )
            elif tname == joint_name:
                lines.append(
                    f"{meta}\t{tname}\t{int(nm[i])}\tNA\tNA\t{g6(fstat[i])}\t"
                    f"{logp_to_str(logp_joint[i])}\t.\n"
                )
            else:
                pi = test_pred[tname]
                lines.append(
                    f"{meta}\t{tname}\t{int(nm[i])}\t{g6(beta[i, pi])}\t"
                    f"{g6(se[i, pi])}\t{g6(tstat[i, pi])}\t"
                    f"{logp_to_str(logp[i, pi])}\t.\n"
                )
    f.writelines(lines)


def _glm_logistic(
    ds, cfg, log, pheno_name, ydata, smask, cov_names, cov_data, a1_is_alt,
    hide_covar, always_firth, no_firth,
):
    import jax.numpy as jnp

    from ..ops.glm import firth_irls_block, logistic_irls_block

    inc = np.flatnonzero(smask)
    n = inc.size
    y = ydata[inc].astype(np.float64)  # 0 = control, 1 = case
    k = len(cov_names)
    dc = k + 1
    d = dc + 1
    c = np.concatenate([np.ones((n, 1)), cov_data[inc]], axis=1)
    vb = _auto_vb(-(-n // 4) * 4)

    pd = PackedDevice(ds, ds.variant_mask, vb=vb, tile=1 << 30, sample_mask=smask)
    npad = pd.npad
    mask = np.zeros(npad, np.float32)
    mask[:n] = 1.0
    # pad covariates/pheno to the packed sample pad
    cpad = np.zeros((npad, dc), np.float32)
    cpad[:n] = c
    ypad = np.zeros(npad, np.float32)
    ypad[:n] = y
    c32 = jnp.asarray(cpad)
    y32 = jnp.asarray(ypad)
    mask_dev = jnp.asarray(mask)

    vmask = ds.variant_mask
    M = ds.raw_variant_ct
    chrom, provref, a1, omitted = _row_meta(ds, a1_is_alt)
    vi = ds.vi
    suffix = "glm.firth" if always_firth else (
        "glm.logistic" if no_firth else "glm.logistic.hybrid"
    )
    path = f"{cfg.out}.{pheno_name}.{suffix}"
    f = open(path, "w")
    firth_col = not always_firth and not no_firth
    f.write(
        "#CHROM\tPOS\tID\tREF\tALT\tPROVISIONAL_REF?\tA1\tOMITTED\tA1_FREQ\t"
        + ("FIRTH?\t" if firth_col else "")
        + "TEST\tOBS_CT\tOR\tLOG(OR)_SE\tZ_STAT\tP\tERRCODE\n"
    )
    tests = ["ADD"] + ([] if hide_covar else list(cov_names))
    add_results: list[tuple[int, float]] = []
    test_pred = {"ADD": dc}  # kernel order: const, covars..., geno
    for j, cn in enumerate(cov_names):
        test_pred[cn] = 1 + j

    for bi in range(pd.nblocks):
        v0 = bi * pd.vb
        vct = min(pd.vb, M - v0)
        ia = np.array([i for i in range(vct) if vmask[v0 + i]])
        if ia.size == 0:
            continue
        flip_np = a1_is_alt[v0 : v0 + pd.vb].astype(np.float32)
        flip = jnp.asarray(np.pad(flip_np, (0, pd.vb - len(flip_np))))
        pk = pd.packed[bi]
        g_case, g_tot, g_ssq = _a1_case_total(pk, flip, y32, mask_dev)
        if always_firth:
            fb, fse, _, fconv, ffail, funf, fobs = (
                np.asarray(x) for x in firth_irls_block(pk, flip, c32, y32, mask_dev, dc)
            )
            beta, se, conv, fail, unf, obs = fb, fse, fconv, ffail, funf, fobs
            used_firth = np.ones(pd.vb, bool)
            with np.errstate(divide="ignore", invalid="ignore"):
                const = (g_ssq - g_tot * g_tot / np.maximum(fobs, 1)) <= 1e-12
        else:
            lb, lse, _, lconv, lfail, lunf, lobs = (
                np.asarray(x)
                for x in logistic_irls_block(pk, flip, c32, y32, mask_dev, dc)
            )
            with np.errstate(divide="ignore", invalid="ignore"):
                const = (g_ssq - g_tot * g_tot / np.maximum(lobs, 1)) <= 1e-12
            # separation pre-check: case dosage of A1 == 0 or == total dosage
            # (ref: plink2_glm_logistic.cc:2224-2236)
            sep = ((g_case <= 0.0) | (g_case >= g_tot)) & ~const
            beta, se = lb.copy(), lse.copy()
            conv, fail, unf, obs = lconv.copy(), lfail.copy(), lunf.copy(), lobs
            used_firth = np.zeros(pd.vb, bool)
            if no_firth:
                fail = lfail | sep  # SEPARATION errcode path
            else:
                need_firth = (sep | lfail) & ~const
                if need_firth.any():
                    fb, fse, _, fconv, ffail, funf, fobs = (
                        np.asarray(x)
                        for x in firth_irls_block(pk, flip, c32, y32, mask_dev, dc)
                    )
                    m = need_firth
                    beta[m], se[m] = fb[m], fse[m]
                    conv[m], fail[m], unf[m] = fconv[m], ffail[m], funf[m]
                    used_firth = need_firth

        with np.errstate(divide="ignore", invalid="ignore"):
            a1f = np.where(obs > 0, g_tot / (2 * np.maximum(obs, 1)), np.nan)
        _emit_logistic_rows(
            f, v0, ia, beta, se, conv, fail, unf, obs, a1f, const, used_firth,
            firth_col, tests, test_pred, chrom, provref, a1, omitted, vi, d,
            no_firth, add_results,
        )
    f.close()
    log.log(f"Results written to {path} .")
    if getattr(cfg, "adjust", False):
        from .adjust import write_adjusted

        write_adjusted(ds, cfg, log, pheno_name, suffix, add_results, a1)


def _a1_case_total(pk, flip, y32, mask_dev):
    """A1 dosage sums (cases, total, sum-of-squares) per variant for the
    separation and const-allele pre-checks."""
    import jax.numpy as jnp

    from ..ops.glm import _geno_block

    g_raw, valid = _geno_block(pk)
    valid = valid * mask_dev[None, :]
    g = jnp.where(flip[:, None] > 0, g_raw, 2.0 - g_raw) * valid
    return (
        np.asarray(g @ y32),
        np.asarray(g.sum(axis=1)),
        np.asarray((g * g).sum(axis=1)),
    )


def _emit_logistic_rows(
    f, v0, ia, beta, se, conv, fail, unf, obs, a1f, const, used_firth,
    firth_col, tests, test_pred, chrom, provref, a1, omitted, vi, d, no_firth,
    add_results=None,
):
    with np.errstate(divide="ignore", invalid="ignore"):
        zstat = np.where(se > 0, beta / se, np.nan)
    logp = np.asarray(zstat_logp_2sided(np.nan_to_num(zstat)))
    lines = []
    for i in ia:
        vidx = v0 + i
        nm_i = int(obs[i])
        meta = (
            f"{chrom[vidx]}\t{vi.pos[vidx]}\t{vi.vid[vidx]}\t{vi.ref[vidx]}\t"
            f"{vi.alt[vidx]}\t{provref[vidx]}\t{a1[vidx]}\t{omitted[vidx]}\t"
            f"{g6(a1f[i])}"
        )
        firth_str = ("Y" if used_firth[i] else "N") if firth_col else None
        errcode = ERR_OK
        bad = False
        if const[i]:
            errcode, bad = "CONST_OMITTED_ALLELE", True
            firth_str = "N" if firth_col else None
        elif nm_i <= d:
            errcode, bad = "SAMPLE_CT<=PREDICTOR_CT", True
        elif fail[i]:
            bad = True
            if no_firth:
                errcode = "SEPARATION"
            elif used_firth[i]:
                errcode = "FIRTH_CONVERGE_FAIL"
            else:
                errcode = "LOGISTIC_CONVERGE_FAIL"
        ok_err = "UNFINISHED" if unf[i] else ERR_OK
        for tname in tests:
            pi = test_pred[tname]
            fcol = f"{firth_str}\t" if firth_col else ""
            if bad or not np.isfinite(beta[i, pi]) or not np.isfinite(se[i, pi]):
                ec = errcode if bad else "INVALID_RESULT"
                lines.append(
                    f"{meta}\t{fcol}{tname}\t{nm_i}\tNA\tNA\tNA\tNA\t{ec}\n"
                )
            else:
                lines.append(
                    f"{meta}\t{fcol}{tname}\t{nm_i}\t"
                    f"{g6(np.exp(beta[i, pi]))}\t{g6(se[i, pi])}\t"
                    f"{g6(zstat[i, pi])}\t{logp_to_str(logp[i, pi])}\t{ok_err}\n"
                )
    f.writelines(lines)
