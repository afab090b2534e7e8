"""--epistasis: regression-based pairwise interaction scan, PLINK 1.9
parity.

Behavior reference: epistasis_linear_regression / epi_linear_thread /
matrix_invert_4x4symm (1.9/plink_ld.c:4083-4600, 8420-9010) and
epistasis_logistic_regression / epi_logistic_thread with the float32
IRLS stack logistic_regression / cholesky_decomposition /
solve_linear_system / fmath_exp_ps (1.9/plink_glm.c:699-1700,
1.9/plink_ld.c:4599-4870).

Parity notes:
- QT path: closed-form 4-parameter OLS (1, A, B, AB) in float64 with
  the reference's exact op order, including the per-pair sequential
  missing-value adjustments of the precomputed sums (np.cumsum gives
  the same left-to-right accumulation order).
- CC path: the reference's single-precision IRLS is replicated in
  numpy float32, including the SSE 4-lane summation pattern of the
  gradient/Hessian reductions and the herumi-fmath 1024-entry exp
  table (regenerated, verified against the reference constants).
"""

from __future__ import annotations

import math

import numpy as np

from ..cli import FlagError
from ..dataset import Dataset
from ..utils.chrom import MT_CODE, X_CODE, Y_CODE
from ..utils.fmt import dtoa_g, ftoa_g
from ..utils.logging import RunLogger
from .assoc19 import _g4
from .cluster import _ltqnorm
from .epistasis import (SMALL_EPSILON, _fw_width, _normdist,
                        _screen_markers, write_epi_summary)

EPSILON = 0.000000000931322574615478515625

F32 = np.float32

# herumi-fmath exp table: mantissa bits of float32(2^(j/1024))
_EXP_TABLE = np.array(
    [np.float32(2.0 ** (j / 1024.0)).view(np.uint32) & 0x7FFFFF
     for j in range(1024)], np.uint32)
_FM_AA = np.uint32(0x44B8AA3B).view(F32) if hasattr(np.uint32(0), "view") \
    else None
_FM_AA = np.array([0x44B8AA3B], np.uint32).view(F32)[0]   # 2^10/ln2
_FM_BB = np.array([0x3A317218], np.uint32).view(F32)[0]   # ln2/2^10
_FM_MAXX = np.array([0x42B00000], np.uint32).view(F32)[0]  # 88
_FM_MINX = np.array([0xC2B00000], np.uint32).view(F32)[0]  # -88


def fmath_exp(x):
    """fmath_exp_ps (1.9/plink_glm.c:960) vectorized in float32."""
    x = np.minimum(np.maximum(x.astype(F32), _FM_MINX), _FM_MAXX)
    r = np.rint(x * _FM_AA).astype(np.int32)   # round-half-even
    t = (x - r.astype(F32) * _FM_BB) + F32(1.0)
    v = (r & 1023).astype(np.int64)
    u = ((r + np.int32(0x1FC00)) >> 10).astype(np.uint32) << np.uint32(23)
    m = (_EXP_TABLE[v] | u).view(F32)
    return t * m


def _lane_sum(terms):
    """SSE reduction: 4-lane sequential accumulation over blocks, then
    ((l0+l1)+l2)+l3, all in float32.  terms: f32 [n] padded len%4==0."""
    lanes = terms.reshape(-1, 4)
    if lanes.shape[0] == 1:
        ls = lanes[0]
    else:
        ls = np.cumsum(lanes, axis=0, dtype=F32)[-1]
    return ((ls[0] + ls[1]) + ls[2]) + ls[3]


def logistic_regression_f32(X, y):
    """1.9 logistic_regression (plink_glm.c:1591) for param_ct=4 in
    float32.  X: f32 [4, n4] (zero-padded), y: f32 [n4].  Returns
    (fail, coef f32[4], ll f32[4,4] cholesky factor)."""
    n4 = X.shape[1]
    coef = np.zeros(4, F32)
    ll = np.zeros((4, 4), F32)
    min_delta_coef = F32(1e9)
    iteration = 0
    while True:
        iteration += 1
        # P = X^T coef  (elementwise f32, SSE pairwise order)
        p = (X[0] * coef[0] + X[1] * coef[1]) \
            + (X[2] * coef[2] + X[3] * coef[3])
        # logistic
        p = F32(1.0) / (fmath_exp(-p) + F32(1.0))
        v = p * (F32(1.0) - p)
        p = p - y
        # hessian (lower triangle + diag), SSE lane-summed
        hh = np.zeros((4, 4), F32)
        m0v = X[0] * v
        m1v = X[1] * v
        m2v = X[2] * v
        m3v = X[3] * v
        hh[0, 0] = _lane_sum(X[0] * m0v)
        hh[1, 0] = _lane_sum(X[0] * m1v)
        hh[1, 1] = _lane_sum(X[1] * m1v)
        hh[2, 2] = _lane_sum(X[2] * m2v)
        hh[2, 1] = _lane_sum(X[1] * m2v)
        hh[2, 0] = _lane_sum(X[0] * m2v)
        hh[3, 0] = _lane_sum(X[0] * m3v)
        hh[3, 1] = _lane_sum(X[1] * m3v)
        hh[3, 2] = _lane_sum(X[2] * m3v)
        hh[3, 3] = _lane_sum((X[3] * X[3]) * v)
        grad = np.array([_lane_sum(X[j] * p) for j in range(4)], F32)
        ll = _cholesky4_f32(hh)
        dcoef = _solve_ll_f32(ll, grad)
        delta = F32(0.0)
        for j in range(4):
            delta = delta + np.abs(dcoef[j])
            coef[j] = coef[j] - dcoef[j]
        if delta < min_delta_coef:
            min_delta_coef = delta
        if delta != delta:
            return True, coef, ll
        if iteration > 4:
            if ((delta > F32(20.0) and delta > F32(2.0) * min_delta_coef)
                    or (iteration >= 8
                        and np.abs(F32(1.0) - delta) < F32(1e-3))):
                return True, coef, ll
            if iteration >= 15:
                for j in range(4):
                    if np.abs(coef[j]) > F32(8e3):
                        return True, coef, ll
                return False, coef, ll
        if delta < F32(1e-4):
            for j in range(4):
                if np.abs(coef[j]) > F32(6e4):
                    return True, coef, ll
            return False, coef, ll


def _cholesky4_f32(aa):
    """cholesky_decomposition (1.9/plink_glm.c:1555), 4x4 float32 with
    double sqrt/reciprocal promotion as in the C source."""
    ll = np.zeros((4, 4), F32)
    for r in range(4):
        fxx = aa[r, r]
        for c in range(r):
            fyy = ll[r, c]
            fxx = fxx - fyy * fyy
        fyy = F32(math.sqrt(float(fxx))) if fxx >= 0.0 else F32(1e-6)
        ll[r, r] = fyy
        # C x/0.0 -> inf; numpy division preserves that
        fyy = F32(np.float64(1.0) / np.float64(fyy))
        for r2 in range(r + 1, 4):
            fxx = aa[r2, r]
            for c in range(r):
                fxx = fxx - ll[r, c] * ll[r2, c]
            ll[r2, r] = fxx * fyy
    return ll


def _solve_ll_f32(ll, yy):
    """solve_linear_system (1.9/plink_glm.c:1504): forward + back
    substitution with L / L^T, float32."""
    xx = np.zeros(4, F32)
    for r in range(4):
        fxx = yy[r]
        for c in range(r):
            fxx = fxx - ll[r, c] * xx[c]
        xx[r] = fxx / ll[r, r]
    for c in range(3, -1, -1):
        fxx = xx[c]
        for r in range(3, c, -1):
            fxx = fxx - ll[r, c] * xx[r]
        xx[c] = fxx / ll[c, c]
    return xx


def _invert_4x4symm(d):
    """matrix_invert_4x4symm (1.9/plink_ld.c:4083); d: flat [16] f64
    list, modified in place.  Returns True on singular."""
    buf = [0.0] * 16
    dww = d[5] * d[11] - d[6] * d[7]
    dxx = d[6] * d[11] - d[7] * d[10]
    dyy = d[6] * d[15] - d[7] * d[11]
    dzz = d[10] * d[15] - d[11] * d[11]
    buf[0] = d[5] * dzz - d[6] * dyy + d[7] * dxx
    buf[1] = d[2] * dyy - d[1] * dzz - d[3] * dxx
    buf[2] = d[1] * dyy + d[2] * (d[7] * d[7] - d[5] * d[15]) \
        + d[3] * dww
    duu = d[5] * d[10] - d[6] * d[6]
    buf[3] = d[2] * dww - d[1] * dxx - d[3] * duu
    det = d[0] * buf[0] + d[1] * buf[1] + d[2] * buf[2] + d[3] * buf[3]
    if abs(det) < EPSILON:
        return True
    buf[5] = d[0] * dzz + d[2] * (d[3] * d[11] - d[2] * d[15]) \
        + d[3] * (d[2] * d[11] - d[3] * d[10])
    dzz = d[1] * d[15] - d[3] * d[7]
    buf[6] = d[2] * dzz - d[0] * dyy \
        + d[3] * (d[3] * d[6] - d[1] * d[11])
    dyy = d[1] * d[11] - d[2] * d[7]
    dvv = d[1] * d[10] - d[2] * d[6]
    buf[7] = d[0] * dxx - d[2] * dyy + d[3] * dvv
    buf[10] = d[0] * (d[5] * d[15] - d[7] * d[7]) - d[1] * dzz \
        + d[3] * (d[1] * d[7] - d[3] * d[5])
    dxx = d[1] * d[6] - d[2] * d[5]
    buf[11] = d[1] * dyy - d[0] * dww - d[3] * dxx
    buf[15] = d[0] * duu - d[1] * dvv + d[2] * dxx
    det = 1.0 / det
    d[0] = buf[0] * det
    d[1] = buf[1] * det
    d[2] = buf[2] * det
    d[3] = buf[3] * det
    d[4] = d[1]
    d[5] = buf[5] * det
    d[6] = buf[6] * det
    d[7] = buf[7] * det
    d[8] = d[2]
    d[9] = d[6]
    d[10] = buf[10] * det
    d[11] = buf[11] * det
    d[12] = d[3]
    d[13] = d[7]
    d[14] = d[11]
    d[15] = buf[15] * det
    return False


def _seqsum(vals) -> float:
    """Left-to-right sequential float64 sum (C accumulation order)."""
    if len(vals) == 0:
        return 0.0
    return float(np.cumsum(np.asarray(vals, np.float64))[-1])


class _RegParams:
    no_ueki = False
    boost = False
    case_only = False
    joint = False
    cellmin = 0

    set_by_set = False
    set_by_all = False

    def __init__(self, cfg):
        for m in cfg.epistasis or ():
            if m == "set-by-set":
                self.set_by_set = True
            elif m == "set-by-all":
                self.set_by_all = True
            else:
                raise FlagError(f"Invalid --epistasis modifier '{m}'.")
        self.epi1 = cfg.epi1
        self.epi2 = cfg.epi2 if cfg.epi2 is not None else 0.01


def run_epistasis(ds: Dataset, cfg, log: RunLogger) -> None:
    hp = _RegParams(cfg)
    vi, si = ds.vi, ds.si
    pc = next(iter(si.phenos.values()), None)
    if pc is None:
        raise FlagError("--epistasis requires a phenotype.")
    is_cc = pc.kind == "cc"
    pheno_nm = pc.nonmiss & ds.sample_mask
    from ..ops.pairwise import _unpack_np

    # set-by-set / set-by-all (shared semantics with --fast-epistasis;
    # epistasis_report 1.9/plink_ld.c:9478-9533)
    set1_raw = set2_raw = None
    triangular = True
    if hp.set_by_set or hp.set_by_all:
        from .sets import define_sets

        sinfo = define_sets(ds, cfg, log)
        nset = 0 if sinfo is None else sinfo.ct
        if not nset:
            raise FlagError(
                "--epistasis set-by-"
                f"{'set' if hp.set_by_set else 'all'} requires a variant "
                "set to be loaded.")
        if hp.set_by_all and nset > 1:
            raise FlagError(
                "--{fast-}epistasis set-by-all requires exactly one set.  "
                "(--set-names or\n--set-collapse-all may be handy here.")
        if hp.set_by_set and nset > 2:
            raise FlagError(
                "--{fast-}epistasis set-by-set requires exactly one or two "
                "sets.\n(--set-names or --set-collapse-all may be handy "
                "here.)")
        fidx_ = np.flatnonzero(ds.variant_mask)
        set1_raw = np.zeros(ds.raw_variant_ct, bool)
        set1_raw[fidx_[sinfo.setdefs[0]]] = True
        if hp.set_by_set and nset == 2:
            set2_raw = np.zeros(ds.raw_variant_ct, bool)
            set2_raw[fidx_[sinfo.setdefs[1]]] = True
            triangular = False
        elif hp.set_by_all:
            triangular = False

    pk = ds.all_packed()
    codes = _unpack_np(pk)[:, : ds.raw_sample_ct]
    # screen: haploid chroms + monomorphic over pheno_nm samples
    zeros = np.zeros_like(pheno_nm)
    base_mask = ds.variant_mask.copy()
    if triangular and set1_raw is not None:
        base_mask &= set1_raw
    keep = _screen_markers(ds, codes, base_mask, pheno_nm, zeros, hp)
    vidx = np.flatnonzero(keep)
    m_ct = vidx.size
    if triangular and m_ct < 2:
        raise FlagError(
            "--epistasis requires 2+ non-monomorphic autosomal diploid "
            "loci.")
    n_skipped = int(base_mask.sum()) - m_ct
    if n_skipped:
        log.log(f"--epistasis: Skipping {n_skipped} "
                f"monomorphic/non-autosomal site"
                f"{'' if n_skipped == 1 else 's'}.")
    if triangular:
        row_sel = None
        col_mask_u = np.ones(m_ct, bool)
    else:
        row_sel = np.flatnonzero(set1_raw[vidx])
        col_mask_u = (set2_raw[vidx] if set2_raw is not None
                      else np.ones(m_ct, bool))
        if row_sel.size == 0 or int(col_mask_u.sum()) == 0:
            raise FlagError(
                "Each --epistasis set must contain at least one "
                "non-monomorphic autosomal\ndiploid site.")
    m2_ct = int(col_mask_u.sum())
    chrom = vi.chrom[vidx]

    from .basic_reports import alt_allele_freqs

    a1_is_alt = ~(alt_allele_freqs(ds, founders_only=True) > 0.5)[vidx]
    sub = codes[vidx][:, pheno_nm]
    # A = minor-allele count, 3 = missing
    g = np.where(a1_is_alt[:, None], sub,
                 np.where(sub == 3, 3, 2 - sub.astype(np.int8)))
    g = g.astype(np.int8)
    n = g.shape[1]

    dxx = hp.epi1 * 0.5 if hp.epi1 else 0.00005
    z = _ltqnorm(dxx)
    alpha1 = z * z
    z = _ltqnorm(hp.epi2 / 2)
    alpha2 = z * z

    maxsnp = _fw_width(
        len(str(vi.vid[i])) for i in np.flatnonzero(ds.variant_mask))
    ci = vi.chr_info
    out_path = cfg.out + (".epi.cc" if is_cc else ".epi.qt")
    fh = open(out_path, "w")
    fh.write("CHR1 " + "SNP1".rjust(maxsnp) + " CHR2 "
             + "SNP2".rjust(maxsnp)
             + ("       OR_INT" if is_cc else "     BETA_INT")
             + "         STAT            P \n")

    n_sig = np.zeros(m_ct, np.int64)
    fails = np.zeros(m_ct, np.int64)
    gap_cts = np.zeros(m_ct, np.int64)
    best_chisq = np.zeros(m_ct)
    best_id = np.zeros(m_ct, np.int64)

    if is_cc:
        yfull = (pc.data[pheno_nm] == 1).astype(F32)
        results = _scan_logistic(g, yfull, alpha1, alpha2, n_sig, fails,
                                 best_chisq, best_id, row_sel, col_mask_u,
                                 gap_cts)
    else:
        pheno = pc.data[pheno_nm].astype(np.float64)
        vif_thresh = cfg.vif if getattr(cfg, "vif", None) else 50.0
        if _seqsum(pheno * pheno) * n == _seqsum(pheno) ** 2:
            raise FlagError("Phenotype is constant.")
        results = _scan_linear(g, pheno, alpha1, alpha2, vif_thresh,
                               n_sig, fails, best_chisq, best_id, row_sel,
                               col_mask_u, gap_cts)

    min_p = 0.0
    for i, j, chisq, beta in results:
        eff = math.exp(beta) if (is_cc and beta == beta) else beta
        # the CC path stores the stat as float32 and prints it with
        # float-precision ftoa_g (1.9/plink_ld.c:9200 'ftoa_g(fxx...')
        stat_s = ftoa_g(chisq) if is_cc else dtoa_g(chisq)
        line = (ci.name19(int(chrom[i])).rjust(4) + " "
                + str(vi.vid[int(vidx[i])]).rjust(maxsnp) + " "
                + ci.name19(int(chrom[j])).rjust(4) + " "
                + str(vi.vid[int(vidx[j])]).rjust(maxsnp) + " "
                + dtoa_g(eff).rjust(12) + " "
                + stat_s.rjust(12) + " ")
        p = _normdist(-math.sqrt(chisq)) * 2 if chisq == chisq \
            else math.nan
        line += _g4(max(p, min_p), 12) + " "
        fh.write(line + "\n")
    fh.close()
    mode = "Case/control" if is_cc else "QT"
    log.log(f"{mode} --epistasis to {out_path} ... done.")
    write_epi_summary(out_path, vi, ci, chrom, vidx, maxsnp, n_sig,
                      fails, gap_cts, best_chisq, best_id, m_ct, log,
                      row_sel=row_sel, m2_ct=m2_ct)


def _pair_iter(m_ct, row_sel, col_mask, gap_cts):
    """(i, j, triangular) pair stream: triangular j > i when row_sel is
    None, otherwise set1-row x column-universe with self skipped (and
    counted in gap_cts, 1.9/plink_ld.c:8666-8676)."""
    if row_sel is None:
        for i in range(m_ct):
            yield i, range(i + 1, m_ct), True
        return
    col_idx = np.flatnonzero(col_mask)
    for i in row_sel:
        i = int(i)
        if col_mask[i]:
            gap_cts[i] += 1
        yield i, [int(j) for j in col_idx if j != i], False


def _scan_linear(g, pheno, alpha1, alpha2, vif_thresh, n_sig, fails,
                 best_chisq, best_id, row_sel=None, col_mask=None,
                 gap_cts=None):
    """epi_linear_thread (1.9/plink_ld.c:4143-4600): exact-f64 OLS with
    the reference's precompute-and-adjust op order."""
    m_ct, n = g.shape
    pheno_sum = _seqsum(pheno)
    pheno_ssq = _seqsum(pheno * pheno)
    nonmiss = g != 3
    # per-marker bases (accumulated in sample order)
    pg_base = np.empty(m_ct)
    sum_a_base = np.empty(m_ct, np.int64)
    sum_aa_base = np.empty(m_ct, np.int64)
    for i in range(m_ct):
        gi = g[i]
        sel = (gi == 1) | (gi == 2)
        terms = np.where(gi[sel] == 1, pheno[sel], 2 * pheno[sel])
        pg_base[i] = _seqsum(terms)
        n1 = int((gi == 1).sum())
        n2 = int((gi == 2).sum())
        sum_a_base[i] = n1 + 2 * n2
        sum_aa_base[i] = n1 + 4 * n2
    results = []
    dconst = (1.0, 2.0, 2.0, 4.0)
    for i, jr, tri in _pair_iter(m_ct, row_sel, col_mask, gap_cts):
        gi = g[i].astype(np.int64)
        for j in jr:
            gj = g[j].astype(np.int64)
            ok, out = _pair_linear(
                gi, gj, pheno, pheno_sum, pheno_ssq, pg_base[i],
                pg_base[j], sum_a_base[i], sum_aa_base[i],
                sum_a_base[j], sum_aa_base[j], n, vif_thresh, dconst)
            if not ok:
                fails[i] += 1
                if tri:
                    fails[j] += 1
                if alpha1 == 0.0:
                    results.append((i, j, math.nan, math.nan))
                continue
            zsq, beta = out
            if zsq >= alpha1:
                results.append((i, j, zsq, beta))
            if zsq >= alpha2:
                n_sig[i] += 1
                if tri:
                    n_sig[j] += 1
            if zsq > best_chisq[i]:
                best_chisq[i] = zsq
                best_id[i] = j
            if tri and zsq > best_chisq[j]:
                best_chisq[j] = zsq
                best_id[j] = i
    return results


def _pair_linear(gi, gj, pheno, pheno_sum, pheno_ssq, pg_i, pg_j,
                 sum_a, sum_aa, sum_b, sum_bb, n, vif_thresh, dconst):
    v1, v2 = gi, gj
    miss = (v1 == 3) | (v2 == 3)
    both_nz = (~miss) & (v1 != 0) & (v2 != 0)
    cur_pheno_sum = pheno_sum
    cur_pheno_ssq = pheno_ssq
    cur_sum_a_pheno = pg_i
    cur_sum_b_pheno = pg_j
    cur_sum_a = sum_a
    cur_sum_aa = sum_aa
    cur_sum_b = sum_b
    cur_sum_bb = sum_bb
    cur_sample_ct = n
    # missing adjustments, sequential in sample order per accumulator
    midx = np.flatnonzero(miss)
    if midx.size:
        mv1 = v1[midx]
        mv2 = v2[midx]
        mp = pheno[midx]
        # b-pheno: samples with v1==3 and v2 in {1,2}
        bsel = (mv1 == 3) & ((mv2 == 1) | (mv2 == 2))
        bterms = np.where(mv2[bsel] == 1, mp[bsel], 2 * mp[bsel])
        # sequential subtraction (x-a)-b != x-(a+b) in f64; scalar loop
        for t in bterms:
            cur_sum_b_pheno -= t
        cur_sum_b -= int(np.where(mv2[bsel] == 1, 1, 2).sum())
        cur_sum_bb -= int(np.where(mv2[bsel] == 1, 1, 4).sum())
        # a-pheno: v2==3 and v1 in {1,2}; v1==2 subtracts dxx twice
        asel = (mv2 == 3) & ((mv1 == 1) | (mv1 == 2))
        for k in np.flatnonzero(asel):
            cur_sum_a_pheno -= mp[k]
            if mv1[k] == 2:
                cur_sum_a_pheno -= mp[k]
        cur_sum_a -= int(mv1[asel].sum())
        cur_sum_aa -= int((mv1[asel] * mv1[asel]).sum())
        for t in mp:
            cur_pheno_sum -= t
            cur_pheno_ssq -= t * t
        cur_sample_ct -= midx.size
    # cross terms over both-nonzero samples, sequential
    bidx = np.flatnonzero(both_nz)
    minor_cts = [0, 0, 0, 0]
    cur_sum_ab_pheno = 0.0
    if bidx.size:
        cat = (v1[bidx] * 2 + v2[bidx] - 3).astype(np.int64)
        terms = np.array(dconst)[cat] * pheno[bidx]
        cur_sum_ab_pheno = _seqsum(terms)
        bc = np.bincount(cat, minlength=4)
        minor_cts = [int(x) for x in bc]
    if cur_sample_ct <= 4:
        return False, None
    sample_ctd = float(cur_sample_ct)
    sample_ct_recip = 1.0 / sample_ctd
    sample_ct_m1_recip = 1.0 / float(cur_sample_ct - 1)
    cur_sum_ab = minor_cts[0] + 2 * (minor_cts[1] + minor_cts[2]) \
        + 4 * minor_cts[3]
    cur_sum_aab = minor_cts[0] + 2 * minor_cts[1] + 4 * minor_cts[2] \
        + 8 * minor_cts[3]
    cur_sum_abb = minor_cts[0] + 4 * minor_cts[1] + 2 * minor_cts[2] \
        + 8 * minor_cts[3]
    cur_sum_aabb = minor_cts[0] + 4 * (minor_cts[1] + minor_cts[2]) \
        + 16 * minor_cts[3]
    cur_sum_ad = float(cur_sum_a)
    cur_sum_bd = float(cur_sum_b)
    cur_sum_abd = float(cur_sum_ab)
    dxx = cur_sum_bd * sample_ct_recip
    dyy = cur_sum_abd * sample_ct_recip
    dww = float(cur_sum_aa) - cur_sum_ad * cur_sum_ad * sample_ct_recip
    dvv = float(cur_sum_bb) - cur_sum_bd * dxx
    duu = float(cur_sum_aabb) - cur_sum_abd * dyy
    if dww <= 0 or dvv <= 0 or duu <= 0:
        return False, None
    dww = 1.0 / math.sqrt(dww * sample_ct_m1_recip)
    dvv = 1.0 / math.sqrt(dvv * sample_ct_m1_recip)
    duu = 1.0 / math.sqrt(duu * sample_ct_m1_recip)
    dxx = (cur_sum_abd - cur_sum_ad * dxx) * sample_ct_m1_recip
    dzz = (float(cur_sum_abb) - cur_sum_bd * dyy) * sample_ct_m1_recip
    dyy = (float(cur_sum_aab) - cur_sum_ad * dyy) * sample_ct_m1_recip
    dxx *= dww * dvv
    dyy *= dww * duu
    dzz *= dvv * duu
    if dxx > 0.999 or dyy > 0.999 or dzz > 0.999:
        return False, None
    dww = dxx * dxx
    dvv = dyy * dyy
    duu = dzz * dzz
    determinant = 1 + 2 * dxx * dyy * dzz - dww - dvv - duu
    if abs(determinant) < EPSILON:
        return False, None
    dxx = 1 - vif_thresh * determinant
    if ((determinant > 0 and (dxx > dww or dxx > dvv or dxx > duu))
            or (determinant < 0
                and (dxx < dww or dxx < dvv or dxx < duu))):
        return False, None
    d = [0.0] * 16
    d[0] = sample_ctd
    d[1] = cur_sum_ad
    d[2] = cur_sum_bd
    d[3] = cur_sum_abd
    d[5] = float(cur_sum_aa)
    d[6] = cur_sum_abd
    d[7] = float(cur_sum_aab)
    d[10] = float(cur_sum_bb)
    d[11] = float(cur_sum_abb)
    d[15] = float(cur_sum_aabb)
    if _invert_4x4symm(d):
        return False, None
    diag_sqrt = [math.sqrt(d[k * 5]) for k in range(4)]
    for pi in range(1, 4):
        lim = 0.99999 * diag_sqrt[pi]
        for pj in range(pi):
            if d[pi * 4 + pj] > lim * diag_sqrt[pj]:
                return False, None
    min_sigma = max(d[5], d[10])
    if d[15] > min_sigma:
        min_sigma = d[15]
    min_sigma = 1e-20 / min_sigma
    coef = [0.0] * 4
    for pi in range(4):
        coef[pi] = (cur_pheno_sum * d[pi * 4]
                    + cur_sum_a_pheno * d[pi * 4 + 1]
                    + cur_sum_b_pheno * d[pi * 4 + 2]
                    + cur_sum_ab_pheno * d[pi * 4 + 3])
    sigma = (coef[0] * coef[0] * sample_ctd
             + coef[1] * coef[1] * float(cur_sum_aa)
             + coef[2] * coef[2] * float(cur_sum_bb)
             + coef[3] * coef[3] * float(cur_sum_aabb)
             + cur_pheno_ssq
             + 2 * (coef[0] * (coef[1] * cur_sum_ad
                               + coef[2] * cur_sum_bd
                               + coef[3] * cur_sum_abd
                               - cur_pheno_sum)
                    + coef[1] * (coef[2] * cur_sum_abd
                                 + coef[3] * float(cur_sum_aab)
                                 - cur_sum_a_pheno)
                    + coef[2] * (coef[3] * float(cur_sum_abb)
                                 - cur_sum_b_pheno)
                    - coef[3] * cur_sum_ab_pheno))
    sigma /= float(cur_sample_ct - 4)
    if sigma < min_sigma:
        return False, None
    dxx = coef[3]
    zsq = (dxx * dxx) / (d[15] * sigma)
    return True, (zsq, dxx)


def _scan_logistic(g, y, alpha1, alpha2, n_sig, fails, best_chisq,
                   best_id, row_sel=None, col_mask=None, gap_cts=None):
    """epi_logistic_thread (1.9/plink_ld.c:4599): float32 IRLS per
    pair."""
    m_ct, n = g.shape
    results = []
    np.seterr(over="ignore", divide="ignore", invalid="ignore",
              under="ignore")
    for i, jr, tri in _pair_iter(m_ct, row_sel, col_mask, gap_cts):
        gi = g[i].astype(np.int64)
        for j in jr:
            gj = g[j].astype(np.int64)
            ok, out = _pair_logistic(gi, gj, y)
            if not ok:
                fails[i] += 1
                if tri:
                    fails[j] += 1
                if alpha1 == 0.0:
                    results.append((i, j, math.nan, math.nan))
                continue
            zsq, beta = out
            if zsq >= alpha1:
                results.append((i, j, zsq, beta))
            if zsq >= alpha2:
                n_sig[i] += 1
                if tri:
                    n_sig[j] += 1
            if zsq > best_chisq[i]:
                best_chisq[i] = zsq
                best_id[i] = j
            if tri and zsq > best_chisq[j]:
                best_chisq[j] = zsq
                best_id[j] = i
    return results


def _pair_logistic(gi, gj, y):
    keepm = (gi != 3) & (gj != 3)
    ct = int(keepm.sum())
    if ct <= 4:
        return False, None
    # full-rank pre-check via geno_pair_present
    present = np.zeros(12, bool)
    pres_idx = gi[keepm] + gj[keepm] * 4
    present[np.unique(pres_idx)] = True
    if not present[5]:
        if (((not present[0]) and (not present[1]) and (not present[4]))
                or ((not present[1]) and (not present[2])
                    and (not present[6]))
                or ((not present[4]) and (not present[8])
                    and (not present[9]))
                or ((not present[6]) and (not present[9])
                    and (not present[10]))):
            return False, None
    cta4 = (ct + 3) & ~3
    X = np.zeros((4, cta4), F32)
    a = gi[keepm].astype(F32)
    b = gj[keepm].astype(F32)
    X[0, :ct] = F32(1.0)
    X[1, :ct] = a
    X[2, :ct] = b
    X[3, :ct] = a * b
    yy = np.zeros(cta4, F32)
    yy[:ct] = y[keepm]
    fail, coef, ll = logistic_regression_f32(X, yy)
    if fail:
        return False, None
    # compute S = H^{-1} via LL^T solves
    S = np.zeros((4, 4), F32)
    for pi in range(4):
        e = np.zeros(4, F32)
        e[pi] = F32(1.0)
        S[pi] = _solve_ll_f32(ll, e)
    d2 = np.zeros(4, F32)
    for pi in range(1, 4):
        fxx = S[pi, pi]
        if fxx < F32(1e-20) or not np.isfinite(fxx):
            return False, None
        d2[pi] = F32(math.sqrt(float(fxx)))
    d2[0] = F32(math.sqrt(float(S[0, 0])))
    for pi in range(1, 4):
        fxx = F32(0.99999) * d2[pi]
        for pj in range(pi):
            if S[pi, pj] > fxx * d2[pj]:
                return False, None
    # the reference keeps zsq in float32 (stored in the float result
    # buffer) and promotes only at print time
    zsq = (coef[3] * coef[3]) / S[3, 3]
    return True, (float(zsq), float(coef[3]))
