"""Bit-exact port of plink 1.9's single-precision logistic regression
(logistic_regression + glm_logistic_dosage, 1.9/plink_glm.c:1591,8814).

The reference runs Newton/IRLS entirely in float32 with SSE kernels; the
--dosage association is byte-identical only if every rounding step is
reproduced.  The numpy translation keeps the exact float32 operation
order:
  * fmath_exp_ps: herumi-fmath table-based exp (1024-entry mantissa
    table regenerated from 2^(i/1024), not copied; round-half-even via
    np.rint matches _mm_cvtps_epi32 under the default MXCSR mode);
  * the SSE dot products accumulate in 4 stride-4 lanes and finish with
    a left-to-right horizontal add (emulated with a float32 cumsum over
    4-wide chunks — numpy's cumsum is sequential, unlike add.reduce's
    pairwise tree);
  * cholesky/solve use double sqrt/reciprocal narrowed back to float,
    exactly like the C code's implicit promotions.

Scalar loops are over parameters only (2-3 for --dosage), so this stays
vectorized over samples.
"""

from __future__ import annotations

import math

import numpy as np

F = np.float32

# fmath exp lookup table: mantissa bits of float32(2^(i/1024))
_EXP_TABLE = (
    np.array([np.float32(2.0 ** (i / 1024.0)) for i in range(1024)])
    .view(np.uint32) & np.uint32(0x7FFFFF)
)

def fmath_exp(x: np.ndarray) -> np.ndarray:
    """fmath_exp_ps (1.9/plink_glm.c:960) for a float32 array."""
    x = np.asarray(x, F)
    max_f = np.array([0x42B00000], np.uint32).view(F)[0]   # 88.0
    min_f = np.array([0xC2B00000], np.uint32).view(F)[0]   # -88.0
    aa = np.array([0x44B8AA3B], np.uint32).view(F)[0]      # 2^10/ln2
    bb = np.array([0x3A317218], np.uint32).view(F)[0]      # ln2/2^10
    x = np.minimum(np.maximum(x, min_f), max_f)
    # _mm_cvtps_epi32 = round to nearest even
    rr = np.rint((x * aa).astype(F)).astype(np.int32)
    tt = (x - (rr.astype(F) * bb).astype(F)).astype(F)
    tt = (tt + F(1.0)).astype(F)
    v = (rr & 1023).astype(np.int64)
    u = (((rr + (127 << 10)) >> 10) << 23).astype(np.uint32)
    m = (_EXP_TABLE[v] | u).view(F)
    return (tt * m).astype(F)


def _lane_dot(prod: np.ndarray) -> np.float32:
    """SSE 4-lane stride-4 accumulation + left-to-right horizontal add
    over a float32 product array whose length is a multiple of 4."""
    lanes = prod.reshape(-1, 4)
    if lanes.shape[0] == 1:
        s = lanes[0]
    else:
        s = np.cumsum(lanes, axis=0, dtype=F)[-1]
    return F(F(F(s[0] + s[1]) + s[2]) + s[3])


def _lane_dot_many(prods) -> list:
    return [_lane_dot(p) for p in prods]


def logistic_regression_f(X: np.ndarray, y: np.ndarray):
    """logistic_regression (1.9/plink_glm.c:1591).

    X: [param_ct, n4] float32 covariate-major design, columns padded with
    zeros to a multiple of 4 (row 0 = intercept of ones over the real
    samples).  y: [n4] float32 phenotype (0/1, zero-padded).
    Returns (coef [param_ct] f32, ll lower-tri [p,p] f32) or None on
    convergence failure."""
    p, n4 = X.shape
    coef = np.zeros(p, F)
    ll = np.zeros((p, p), F)
    min_delta_coef = F(1e9)
    iteration = 0
    while True:
        iteration += 1
        # P[i] = sum_j coef[j] * X[j][i]   (mult_tmatrix_nxd_vect_d)
        pp = _mult_tmatrix(X, coef, p)
        # logistic_sse
        pp = (F(1.0) / (fmath_exp((-pp).astype(F)) + F(1.0))).astype(F)
        # compute_v_and_p_minus_y
        vv = (pp * (F(1.0) - pp).astype(F)).astype(F)
        pp = (pp - y).astype(F)
        hh = _compute_hessian(X, vv, p)
        # grad = X @ pp  (mult_matrix_dxn_vect_n)
        grad = np.array([_lane_dot((X[j] * pp).astype(F))
                         for j in range(p)], F)
        _cholesky(hh, ll, p)
        dcoef = _solve(ll, grad, p)
        delta_coef = F(0.0)
        for j in range(p):
            delta_coef = F(delta_coef + F(abs(dcoef[j])))
            coef[j] = F(coef[j] - dcoef[j])
        if delta_coef < min_delta_coef:
            min_delta_coef = delta_coef
        if np.isnan(delta_coef):
            return None
        if iteration > 4:
            if ((delta_coef > F(20.0) and
                 delta_coef > F(2.0) * min_delta_coef)
                    or (iteration >= 8
                        and abs(F(1.0) - delta_coef) < F(1e-3))):
                return None
            if iteration >= 15:
                for j in range(p):
                    if abs(coef[j]) > F(8e3):
                        return None
                return coef, ll
        if delta_coef < F(1e-4):
            for j in range(p):
                if abs(coef[j]) > F(6e4):
                    return None
            return coef, ll




def _mult_tmatrix(X: np.ndarray, coef: np.ndarray, p: int) -> np.ndarray:
    """mult_tmatrix_nxd_vect_d (1.9/plink_glm.c:1040): eta = X^T coef with
    the SSE 4-row blocked f32 add order."""
    if p < 4:
        # zeroed dest + the switch(row_ct % 4) tail
        dest = np.zeros(X.shape[1], F)
        r = 0
        if p % 4 == 3:
            r1 = (X[0] * coef[0]).astype(F)
            r2 = (X[1] * coef[1]).astype(F)
            r3 = (X[2] * coef[2]).astype(F)
            return ((r1 + r2).astype(F) + (r3 + dest).astype(F)).astype(F)
        if p % 4 == 2:
            r1 = (X[0] * coef[0]).astype(F)
            r2 = (X[1] * coef[1]).astype(F)
            return ((r1 + r2).astype(F) + dest).astype(F)
        return ((X[0] * coef[0]).astype(F) + dest).astype(F)
    # first full 4-block (no dest add), then += blocks while r < p-3
    r1 = (X[0] * coef[0]).astype(F)
    r2 = (X[1] * coef[1]).astype(F)
    r3 = (X[2] * coef[2]).astype(F)
    r4 = (X[3] * coef[3]).astype(F)
    dest = ((r1 + r2).astype(F) + (r3 + r4).astype(F)).astype(F)
    r = 4
    while r < p - 3:
        r1 = (X[r] * coef[r]).astype(F)
        r2 = (X[r + 1] * coef[r + 1]).astype(F)
        r3 = (X[r + 2] * coef[r + 2]).astype(F)
        r4 = (X[r + 3] * coef[r + 3]).astype(F)
        dest = (((r1 + r2).astype(F) + (r3 + r4).astype(F)).astype(F)
                + dest).astype(F)
        r += 4
    tail = p % 4
    if tail == 3:
        r1 = (X[r] * coef[r]).astype(F)
        r2 = (X[r + 1] * coef[r + 1]).astype(F)
        r3 = (X[r + 2] * coef[r + 2]).astype(F)
        dest = ((r1 + r2).astype(F) + (r3 + dest).astype(F)).astype(F)
    elif tail == 2:
        r1 = (X[r] * coef[r]).astype(F)
        r2 = (X[r + 1] * coef[r + 1]).astype(F)
        dest = ((r1 + r2).astype(F) + dest).astype(F)
    elif tail == 1:
        dest = ((X[r] * coef[r]).astype(F) + dest).astype(F)
    return dest


def _compute_hessian(X: np.ndarray, vv: np.ndarray, p: int) -> np.ndarray:
    """compute_hessian (1.9/plink_glm.c:1473): lower triangle of
    X V X^T via the SSE triple-product helpers' exact f32 lane order."""
    hh = np.zeros((p, p), F)

    def two_diag(a, b, out):
        av = (a * vv).astype(F)
        bv = (b * vv).astype(F)
        out[0] = _lane_dot((a * av).astype(F))
        out[1] = _lane_dot((a * bv).astype(F))
        out[2] = _lane_dot((b * bv).astype(F))

    def two_plus_one(bb, a1, a2, out):
        bv = (bb * vv).astype(F)
        out[0] = _lane_dot((bb * bv).astype(F))
        out[1] = _lane_dot((a1 * bv).astype(F))
        out[2] = _lane_dot((a2 * bv).astype(F))

    def three(bb, a1, a2, a3, out):
        bv = (bb * vv).astype(F)
        out[0] = _lane_dot((a1 * bv).astype(F))
        out[1] = _lane_dot((a2 * bv).astype(F))
        out[2] = _lane_dot((a3 * bv).astype(F))

    buf = np.zeros(3, F)
    if p > 3:
        r = 0
        while r < p - 3:
            two_diag(X[r], X[r + 1], buf)
            hh[r, r], hh[r + 1, r], hh[r + 1, r + 1] = buf
            two_plus_one(X[r + 2], X[r + 1], X[r], buf)
            hh[r + 2, r + 2], hh[r + 2, r + 1], hh[r + 2, r] = buf
            for r2 in range(r + 3, p):
                three(X[r2], X[r], X[r + 1], X[r + 2], buf)
                hh[r2, r], hh[r2, r + 1], hh[r2, r + 2] = buf
            r += 3
    m = p % 3
    if m == 0:
        two_plus_one(X[p - 3], X[p - 2], X[p - 1], buf)
        hh[p - 3, p - 3], hh[p - 2, p - 3], hh[p - 1, p - 3] = buf
    if m in (0, 2):
        two_diag(X[p - 2], X[p - 1], buf)
        hh[p - 2, p - 2], hh[p - 1, p - 2], hh[p - 1, p - 1] = buf
    else:  # m == 1
        # triple_product: (a*b) then *c
        hh[p - 1, p - 1] = _lane_dot(
            ((X[p - 1] * X[p - 1]).astype(F) * vv).astype(F))
    return hh

def _cholesky(aa: np.ndarray, ll: np.ndarray, d: int) -> None:
    """cholesky_decomposition (1.9/plink_glm.c): float accumulations,
    double sqrt/reciprocal narrowed back to float."""
    for r in range(d):
        fxx = aa[r, r]
        for c in range(r):
            fyy = ll[r, c]
            fxx = F(fxx - F(fyy * fyy))
        if fxx >= 0.0:
            fyy = F(math.sqrt(float(fxx)))
        else:
            fyy = F(1e-6)
        ll[r, r] = fyy
        # C: double 1.0 / float -> inf on a zero diagonal (the NaN then
        # propagates and the regression reports failure); Python float
        # division would raise instead
        fyy = F(np.inf) if fyy == 0.0 else F(1.0 / float(fyy))
        for r2 in range(r + 1, d):
            fxx = aa[r2, r]
            for c in range(r):
                fxx = F(fxx - F(ll[r, c] * ll[r2, c]))
            ll[r2, r] = F(fxx * fyy)


def _solve(ll: np.ndarray, yy: np.ndarray, d: int) -> np.ndarray:
    """solve_linear_system (1.9/plink_glm.c:1504): forward substitution,
    then transposed back substitution walking rows high-to-low, with
    plain float divisions (not reciprocal multiplies)."""
    xx = np.zeros(d, F)
    for r in range(d):
        fxx = yy[r]
        for c in range(r):
            fxx = F(fxx - F(ll[r, c] * xx[c]))
        xx[r] = F(fxx / ll[r, r])
    for c in range(d - 1, -1, -1):
        fxx = xx[c]
        for r in range(d - 1, c, -1):
            fxx = F(fxx - F(ll[r, c] * xx[r]))
        xx[c] = F(fxx / ll[c, c])
    return xx


def glm_logistic_dosage(dosages: np.ndarray, y01: np.ndarray,
                        covars: np.ndarray | None = None):
    """glm_logistic_dosage (1.9/plink_glm.c:8814): returns
    (beta, se, pval) in doubles, or None when invalid (non-convergence,
    all-case/all-control, or validParameters() failure).

    dosages/y01/covars are over the valid samples only."""
    n = dosages.size
    case_ct = int(y01.sum())
    p = 2 + (0 if covars is None else covars.shape[1])
    if n <= p or case_ct == 0 or case_ct == n:
        return None
    n4 = (n + 3) & ~3
    X = np.zeros((p, n4), F)
    X[0, :n] = F(1.0)
    X[1, :n] = dosages.astype(F)
    if covars is not None:
        for k in range(covars.shape[1]):
            X[2 + k, :n] = covars[:, k].astype(F)
    y = np.zeros(n4, F)
    y[:n] = y01.astype(F)
    res = logistic_regression_f(X, y)
    if res is None:
        return None
    coef, ll = res
    # compute S = (X' V X)^-1 column by column via the cholesky factor
    S = np.zeros((p, p), F)
    for j in range(p):
        e = np.zeros(p, F)
        e[j] = F(1.0)
        S[j] = _solve(ll, e, p)
    # validParameters()
    for j in range(1, p):
        fxx = S[j, j]
        if fxx < F(1e-20) or not np.isfinite(fxx):
            return None
    diag_sqrt = np.zeros(p, F)
    diag_sqrt[0] = F(math.sqrt(float(S[0, 0])))
    for j in range(1, p):
        diag_sqrt[j] = F(math.sqrt(float(S[j, j])))
    for j in range(1, p):
        fxx = F(F(0.99999) * diag_sqrt[j])
        for k in range(j):
            if S[j, k] > F(fxx * diag_sqrt[k]):
                return None
    beta = float(coef[1])
    se = math.sqrt(float(S[1, 1]))
    from .distributions import chisq_logsf

    z = beta / se
    pval = float(np.exp(chisq_logsf(z * z, 1.0)))
    return beta, se, pval


def glm_logistic_full(X: np.ndarray, y: np.ndarray):
    """glm_logistic single-permutation core (1.9/plink_glm.c:1690): float
    IRLS + covariance extraction for EVERY parameter.

    X: float32 cov-major [p, n4] design (n4 = n rounded up to 4, padding
    zeroed); y: float32 [n4] 0/1 phenotype (padding zeroed).
    Returns (coef f32 [p], S f32 [p, p]) or None on regression failure /
    validParameters() rejection, matching the reference op-for-op."""
    p = X.shape[0]
    res = logistic_regression_f(X, y)
    if res is None:
        return None
    coef, ll = res
    S = np.zeros((p, p), F)
    for j in range(p):
        e = np.zeros(p, F)
        e[j] = F(1.0)
        S[j] = _solve(ll, e, p)
    # validParameters() (plink_glm.c:1761-1779)
    diag_sqrt = np.zeros(p, F)
    for j in range(1, p):
        fxx = S[j, j]
        if fxx < F(1e-20) or not np.isfinite(fxx):
            return None
        diag_sqrt[j] = np.sqrt(fxx)
    diag_sqrt[0] = np.sqrt(S[0, 0])
    for j in range(1, p):
        fxx = F(F(0.99999) * diag_sqrt[j])
        for k in range(j):
            if S[j, k] > F(fxx * diag_sqrt[k]):
                return None
    return coef, S


def glm_linear_dosage(dosages: np.ndarray, pheno: np.ndarray,
                      covars: np.ndarray | None = None,
                      standard_beta: bool = False,
                      vif_thresh: float = 50.0):
    """glm_linear_dosage (1.9/plink_glm.c:8703): double-precision OLS.

    The reference solves via LAPACK dgels; the closed-form normal-equation
    solve here agrees to ~1e-12, far below the output's 4-decimal
    rendering.  Returns (beta, se, pval) or None."""
    n = dosages.size
    p = 2 + (0 if covars is None else covars.shape[1])
    if n <= p:
        return None
    y = pheno.astype(np.float64)
    if standard_beta:
        m = y.mean()
        sd = y.std(ddof=1)
        if sd == 0:
            return None
        y = (y - m) / sd
    X = np.empty((n, p))
    X[:, 0] = 1.0
    X[:, 1] = dosages
    if covars is not None:
        X[:, 2:] = covars
    xtx = X.T @ X
    try:
        xtx_inv = np.linalg.inv(xtx)
    except np.linalg.LinAlgError:
        return None
    beta_v = xtx_inv @ (X.T @ y)
    resid = y - X @ beta_v
    df = n - p
    if df <= 0:
        return None
    sigma2 = float(resid @ resid) / df
    var_b = sigma2 * xtx_inv[1, 1]
    if var_b <= 0 or not np.isfinite(var_b):
        return None
    beta = float(beta_v[1])
    se = math.sqrt(var_b)
    from ..commands.qassoc import calc_tprob

    pval = calc_tprob(beta / se, df)
    return beta, se, pval
