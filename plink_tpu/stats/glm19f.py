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
        # P[i] = sum_j coef[j] * X[j][i]   (mult_tmatrix_nxd_vect_d,
        # row_ct < 4 path: sequential f32 adds in j order)
        pp = (X[0] * coef[0]).astype(F)
        for j in range(1, p):
            pp = (pp + (X[j] * coef[j]).astype(F)).astype(F)
        # logistic_sse
        pp = (F(1.0) / (fmath_exp((-pp).astype(F)) + F(1.0))).astype(F)
        # compute_v_and_p_minus_y
        vv = (pp * (F(1.0) - pp).astype(F)).astype(F)
        pp = (pp - y).astype(F)
        # compute_hessian (row_ct = p in {2,3}; the triple-product helpers
        # all multiply as a * (b * v) with b = the "bv" operand)
        hh = np.zeros((p, p), F)
        if p == 2:
            av = (X[0] * vv).astype(F)
            bv = (X[1] * vv).astype(F)
            hh[0, 0] = _lane_dot((X[0] * av).astype(F))
            hh[1, 0] = _lane_dot((X[0] * bv).astype(F))
            hh[1, 1] = _lane_dot((X[1] * bv).astype(F))
        elif p == 3:
            # case 0: two_plus_one(b=X0, a1=X1, a2=X2)
            bv = (X[0] * vv).astype(F)
            hh[0, 0] = _lane_dot((X[0] * bv).astype(F))
            hh[1, 0] = _lane_dot((X[1] * bv).astype(F))
            hh[2, 0] = _lane_dot((X[2] * bv).astype(F))
            # fall-through case 2: two_diag(a=X1, b=X2)
            av = (X[1] * vv).astype(F)
            bv = (X[2] * vv).astype(F)
            hh[1, 1] = _lane_dot((X[1] * av).astype(F))
            hh[2, 1] = _lane_dot((X[1] * bv).astype(F))
            hh[2, 2] = _lane_dot((X[2] * bv).astype(F))
        else:
            raise NotImplementedError(
                "float logistic currently ported for param_ct <= 3")
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
        fyy = F(1.0 / float(fyy))
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
