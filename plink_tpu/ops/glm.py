"""GLM device kernels: batched per-variant sufficient statistics and IRLS.

TPU-first re-design of the reference's per-variant regression workers
(GlmLinearThread, 2.0/plink2_glm_linear.cc:272; GlmLogisticThreadD,
2.0/plink2_glm_logistic.cc:3709):

- Linear: instead of building a per-variant design matrix and solving on
  the spot, one MXU pass per variant block produces every sufficient
  statistic the per-variant OLS needs (g'g, g'y, g'C, and the
  missing-sample corrections to the shared C'C / C'y / y'y blocks — the
  role RegressionNmPrecomp plays in the reference).  The tiny (d x d)
  solves then run vectorized in float64 on the host.
- Logistic/Firth: IRLS vmapped over the variant block, all iterations on
  device; the per-iteration X^T W X contraction is an [vb, n] x [n, dc^2]
  matmul.  Mirrors the reference's glm.fit()-imitating algorithm
  (LogisticRegressionD :3590): init via one weighted least squares on
  z = 4.863891244002886*(y-0.5), then Newton steps, converging when
  |loglik - loglik_old| < 1e-8 * (0.05 + |loglik|), max 25 iterations.

Genotype coding is A1-flip-agnostic: kernels accumulate ALT-dosage sums;
the host flips to minor-allele coding algebraically (g' = 2*valid - g).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .planes import unpack_codes


def _geno_block(pk: jax.Array) -> tuple[jax.Array, jax.Array]:
    """packed [vb, NB] -> (ALT dosage with missing->0, valid mask), f32."""
    codes = unpack_codes(pk, 0)
    b0 = (codes & 1).astype(jnp.float32)
    b1 = ((codes >> 1) & 1).astype(jnp.float32)
    miss = b0 * b1
    g = b0 + 2.0 * b1 - 3.0 * miss
    return g, 1.0 - miss


def _linear_sums_body(packed, c, ccfl, y, cy, y2):
    """Per-variant PLANE-weighted sufficient statistics for OLS.

    Every genotype predictor the reference's GLM supports (ADD, DOMDEV, DOM,
    REC, hetonly, their A1-flips, and genotype-by-covariate interactions) is
    a linear combination of the het (H), hom-alt (A), and valid (V) planes;
    since plane products collapse (H*A=0, H*V=H, ...), the plane-weighted
    c_j*c_k and c_j*y sums below assemble ANY such model's X^T X / X^T y on
    the host.

    Returns dict with hcc/acc/mcc [vb, dc*dc], hcy/acy/mcy [vb, dc],
    myy [vb]  (m = missing plane; V sums = subset totals - m sums).
    """
    codes = unpack_codes(packed, 0)
    b0 = (codes & 1).astype(jnp.float32)
    b1 = ((codes >> 1) & 1).astype(jnp.float32)
    miss = b0 * b1
    het = b0 - miss
    homalt = b1 - miss
    hi = lax.Precision.HIGHEST
    dot = lambda a, b: lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), precision=hi,
        preferred_element_type=jnp.float32,
    )
    return {
        "hcc": dot(het, ccfl),
        "acc": dot(homalt, ccfl),
        "mcc": dot(miss, ccfl),
        "hcy": dot(het, cy),
        "acy": dot(homalt, cy),
        "mcy": dot(miss, cy),
        "myy": dot(miss, y2[:, None])[:, 0],
    }


@jax.jit
def linear_block_sums(
    packed: jax.Array,  # [vb, NB] uint8 (samples = per-pheno subset, compacted)
    c: jax.Array,  # [n, dc] f32 covariates incl. leading intercept column
    ccfl: jax.Array,  # [n, dc*dc] f32 flattened outer products c_i c_j
    y: jax.Array,  # [n] f32
    cy: jax.Array,  # [n, dc] f32 = c * y[:, None]
    y2: jax.Array,  # [n] f32 = y*y
):
    return _linear_sums_body(packed, c, ccfl, y, cy, y2)


@jax.jit
def linear_sums_scan(
    blocks: jax.Array,  # [nb, vb, NB] uint8
    c: jax.Array,
    ccfl: jax.Array,
    y: jax.Array,
    cy: jax.Array,
    y2: jax.Array,
):
    """Whole-dataset linear sufficient statistics in ONE device call.

    lax.scan over variant blocks -> dict of [nb, vb, ...] stacked sums.
    One dispatch + one fetch instead of per-block round trips; on a
    tunnel-attached TPU the per-call latency dominates the actual compute,
    so this is the difference between O(nb) and O(1) round trips.
    """

    def body(carry, pk):
        return carry, _linear_sums_body(pk, c, ccfl, y, cy, y2)

    _, outs = lax.scan(body, 0, blocks)
    return outs


# ---------------------------------------------------------------------------
# logistic / Firth IRLS
# ---------------------------------------------------------------------------

_GLM_MAXIT = 25  # ref: plink2_glm_logistic.cc "maxit = 25"
_FIRTH_MAXIT = 25


def _chol_small(h: jax.Array) -> list:
    """Unrolled batched Cholesky for small d (the GLM design is ~10-40
    columns).  XLA's batched linalg.cholesky lowers to a LAPACK-style
    blocked loop that costs ~5 ms per call on TPU for [1600, 13, 13] --
    longer than the whole rest of an IRLS iteration.  Unrolling over d
    turns it into ~d^3/6 fused [vb]-wide VPU ops (<0.5 ms).

    Returns L as a list-of-lists of [vb] lanes (lower triangle).
    Non-PSD rows produce NaNs (sqrt of negative), matching the NaN-based
    failure detection of the callers."""
    d = h.shape[-1]
    hT = jnp.moveaxis(h, 0, -1)  # [d, d, vb]: batch-last so every slice
    # below is a contiguous [vb] lane (2x faster than slicing [vb, d, d])
    L = [[None] * d for _ in range(d)]
    for j in range(d):
        v = hT[j, j]
        for k in range(j):
            v = v - L[j][k] * L[j][k]
        ljj = jnp.sqrt(v)
        L[j][j] = ljj
        inv = 1.0 / ljj
        for i in range(j + 1, d):
            s = hT[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    return L


def _chol_solve_small(L: list, grad: jax.Array) -> jax.Array:
    """Forward+back substitution against _chol_small's L; grad [vb, d]."""
    d = len(L)
    gT = grad.T  # [d, vb] contiguous lanes
    y = [None] * d
    for i in range(d):
        s = gT[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * d
    for i in reversed(range(d)):
        s = y[i]
        for k in range(i + 1, d):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=1)


def _chol_inv_small(L: list) -> jax.Array:
    """(L L^T)^-1 via unrolled triangular inverse; returns [vb, d, d]."""
    d = len(L)
    # M = L^-1 (lower triangular), column by column
    M = [[None] * d for _ in range(d)]
    for j in range(d):
        for i in range(j, d):
            if i == j:
                M[i][j] = 1.0 / L[i][i]
            else:
                s = None
                for k in range(j, i):
                    t = L[i][k] * M[k][j]
                    s = t if s is None else s + t
                M[i][j] = -s / L[i][i]
    # inv = M^T M; exploit triangularity (M[i][j] = 0 for i < j)
    rows = []
    for i in range(d):
        row = []
        for j in range(d):
            lo = max(i, j)
            s = None
            for k in range(lo, d):
                t = M[k][i] * M[k][j]
                s = t if s is None else s + t
            row.append(s)
        rows.append(jnp.stack(row, axis=1))
    return jnp.stack(rows, axis=1)


def _use_unrolled_chol(d: int) -> bool:
    """Unrolled solves only on the TPU backend.  On CPU the unrolled
    arithmetic is compile-variant (XLA forms FMAs differently between the
    shard_map and plain compilations, changing f32 rounding), which would
    break the 1-device-vs-N-device byte-equality contract the mesh tests
    enforce; the LAPACK custom-call it replaces is opaque and stable
    there.  On TPU it is a >5 ms/call -> <2 ms/call win at [1600, 13, 13]
    (the 500k-sample GLM bench)."""
    return d <= 48 and _tpu_backend()


def _tpu_backend() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _solve_psd(h: jax.Array, grad: jax.Array) -> jax.Array:
    """Batched solve of h [vb, d, d] @ x = grad [vb, d] via Cholesky."""
    d = h.shape[-1]
    if _use_unrolled_chol(d):
        return _chol_solve_small(_chol_small(h), grad)
    chol = jax.vmap(jnp.linalg.cholesky)(h)
    return jax.vmap(jax.scipy.linalg.cho_solve, in_axes=((0, None), 0))(
        (chol, True), grad
    )


def _inv_psd(h: jax.Array) -> jax.Array:
    """Batched SPD inverse [vb, d, d] (see _chol_small)."""
    d = h.shape[-1]
    if _use_unrolled_chol(d):
        return _chol_inv_small(_chol_small(h))
    eye = jnp.eye(d, dtype=h.dtype)
    return jax.vmap(lambda m: jax.scipy.linalg.cho_solve(
        (jnp.linalg.cholesky(m), True), eye))(h)


def _moments_from_cols(gcols, valid, c, dc):
    """Per-variant X^T X over valid samples for the design [c | G_1..G_P]
    from already-decoded predictor columns -> [vb, d, d]."""
    vb, n = valid.shape
    P = len(gcols)
    d = dc + P
    hi = lax.Precision.HIGH
    ccfl = (c[:, :, None] * c[:, None, :]).reshape(n, dc * dc)
    # stored-bf16 plane columns (see _plane_cols) convert to f32 in the
    # dot-operand read; the convert fuses, so no f32 copy materializes
    a = lax.dot_general(valid.astype(jnp.float32), ccfl,
                        (((1,), (0,)), ((), ())), precision=hi,
                        preferred_element_type=jnp.float32).reshape(vb, dc, dc)
    h = jnp.zeros((vb, d, d), jnp.float32)
    h = h.at[:, :dc, :dc].set(a)
    for p in range(P):
        gp = gcols[p].astype(jnp.float32)
        cg = lax.dot_general(gp, c, (((1,), (0,)), ((), ())), precision=hi,
                             preferred_element_type=jnp.float32)
        h = h.at[:, :dc, dc + p].set(cg)
        h = h.at[:, dc + p, :dc].set(cg)
        for q in range(p, P):
            gg = jnp.sum(gp * gcols[q].astype(jnp.float32), axis=1)
            h = h.at[:, dc + p, dc + q].set(gg)
            h = h.at[:, dc + q, dc + p].set(gg)
    return h


def _moments_body(
    packed: jax.Array,
    gw: jax.Array,  # [vb, P, 3] plane weights
    c: jax.Array,   # [n, dc]
    mask: jax.Array,
    dc: int,
    np_: int = 1,
    covj: tuple = (),
    sscale=None,
):
    """Per-variant X^T X over valid samples for the design
    [c | G_1..G_P] -> [vb, d, d].  Feeds the collinearity pre-checks
    (ref: CheckMaxCorrAndVifNm, 2.0/plink2_glm_shared.cc:96) that the
    reference runs before every logistic/Firth regression."""
    gcols, valid = _plane_cols(packed, gw, c, mask, np_, covj, sscale)
    return _moments_from_cols(gcols, valid, c, dc)


def _plane_cols(packed, gw, c, mask, np_, covj, sscale=None):
    """Decode packed hardcalls into per-variant genotype predictor columns
    G_p = wH*H + wA*A + wV*V (plane linear combinations, flip-resolved per
    variant on the host) and the per-variant validity mask.  `sscale` is an
    optional per-sample dosage multiplier (e.g. 0.5 for males under
    --xchr-model 1, ref GetGenoDosages male halving).

    The IRLS loops re-read these [vb, n] columns every iteration, and at
    biobank n that HBM traffic -- not the MXU -- is the wall.  Plane
    weights are small integers (and the mask is 0/1), so when no covariate
    or dosage multiplier enters, the columns are stored bfloat16: exactly
    representable values at half the read bytes.  Consumers promote to f32
    elementwise, so results are bit-identical to f32 storage."""
    codes = unpack_codes(packed, 0)
    b0f = (codes & 1).astype(jnp.float32)
    b1f = ((codes >> 1) & 1).astype(jnp.float32)
    missp = b0f * b1f
    valid = (1.0 - missp) * mask[None, :]
    hpl = (b0f - missp) * valid
    apl = (b1f - missp) * valid
    gcols = [
        (gw[:, p, 0:1] * hpl + gw[:, p, 1:2] * apl + gw[:, p, 2:3] * valid)
        * (c[None, :, covj[p]] if covj and covj[p] else 1.0)
        for p in range(np_)
    ]
    if sscale is not None:
        gcols = [g * sscale[None, :] for g in gcols]
    elif _tpu_backend():  # TPU backends only (same rationale)
        # exact-in-bf16 iff the column is a small-integer plane combination
        # (no covariate interaction mixed in); genotype plane weights are
        # half-integers well inside bf16's exact range, so this halves the
        # per-IRLS-iteration HBM read traffic without changing any value
        gcols = [
            g.astype(jnp.bfloat16) if (not covj or not covj[p]) else g
            for p, g in enumerate(gcols)
        ]
        valid = valid.astype(jnp.bfloat16)
    return gcols, valid


def _design_ops(gcols, valid, c, dc, offset=None):
    """Shared X^T-contraction helpers for the design [c | G_1..G_P], where
    the G_p are any dense [vb, n] columns (plane combinations for hardcalls,
    fractional dosages for the dense path).  Every contraction is an MXU
    matmul over the sample axis.  `offset` is an optional fixed per-sample
    linear-predictor contribution (the cc-residualize null-model eta,
    ref LogisticRegressionResidualizedD sample_offsets,
    2.0/plink2_glm_logistic.cc:2939-2984)."""
    vb, n = valid.shape
    P = len(gcols)
    d = dc + P
    # bf16x3 ("HIGH") keeps ~f32-equivalent product accuracy at half the
    # MXU passes of HIGHEST; the flagged-variant f64 host refinement pass
    # still backstops any variant near a reporting threshold
    hi = lax.Precision.HIGH
    ccfl = (c[:, :, None] * c[:, None, :]).reshape(n, dc * dc)

    def xtv(w):  # X^T w for every variant: [vb, n] -> [vb, d]
        w = w.astype(jnp.float32)
        cw = lax.dot_general(w, c, (((1,), (0,)), ((), ())), precision=hi,
                             preferred_element_type=jnp.float32)
        parts = [cw] + [jnp.sum(w * g, axis=1)[:, None] for g in gcols]
        return jnp.concatenate(parts, axis=1)

    def hessian(w):  # [vb, n] weights -> [vb, d, d]
        w = w.astype(jnp.float32)  # no-op for f32; fused convert for the
        # stored-bf16 validity mask (init h0 = hessian(valid))
        a = lax.dot_general(w, ccfl, (((1,), (0,)), ((), ())), precision=hi,
                            preferred_element_type=jnp.float32).reshape(vb, dc, dc)
        h = jnp.zeros((vb, d, d), jnp.float32)
        h = h.at[:, :dc, :dc].set(a)
        for p in range(P):
            wg_p = w * gcols[p]
            cg = lax.dot_general(wg_p, c, (((1,), (0,)), ((), ())), precision=hi,
                                 preferred_element_type=jnp.float32)
            h = h.at[:, :dc, dc + p].set(cg)
            h = h.at[:, dc + p, :dc].set(cg)
            for q in range(p, P):
                gg = jnp.sum(wg_p * gcols[q], axis=1)
                h = h.at[:, dc + p, dc + q].set(gg)
                h = h.at[:, dc + q, dc + p].set(gg)
        return h

    def eta_of(beta):  # [vb, d] -> [vb, n]
        e = lax.dot_general(beta[:, :dc], c, (((1,), (1,)), ((), ())),
                            precision=hi, preferred_element_type=jnp.float32)
        for p in range(P):
            e = e + beta[:, dc + p : dc + p + 1] * gcols[p]
        if offset is not None:
            e = e + offset[None, :]
        return e * valid

    return vb, n, d, ccfl, xtv, hessian, eta_of


def _logistic_core(gcols, valid, c, y, dc, offset=None, init=None):
    """Batched logistic IRLS, one variant per row, arbitrary genotype model.

    Design per variant: [c (dc cols) | G_1..G_P] -> d = dc + P; samples with
    missing genotype are dropped per-variant by zeroing their weights.
    `offset` = fixed linear-predictor term (cc-residualize).  `init` =
    optional precomputed (X^T X over valid, X^T z) pair (derived from the
    moments matrix in the fused scan, saving a full gram pass).

    Returns (beta [vb, d], se [vb, d], loglik [vb], converged, failed,
    unfinished, obs_ct, hinv).
    """
    vb, n, d, ccfl, xtv, hessian, eta_of = _design_ops(gcols, valid, c, dc,
                                                       offset)
    yv = y[None, :] * valid  # [vb, n] (f32: y is f32, promotes)
    obs = jnp.sum(valid.astype(jnp.float32), axis=1)

    def loglik_of(p, eta):
        # two-stage reduction: f32 sums of 128-element chunks, f64 across
        # chunks -- resolves the 1e-8-relative convergence test below
        # (plain f32 summation noise exceeds it) at a fraction of the cost
        # of a full [vb, n] f64 accumulation on the TPU's emulated f64
        ll = yv * (-jax.nn.softplus(-eta)) + (valid - yv) * (-jax.nn.softplus(eta))
        npad_ = ll.shape[1]
        if npad_ % 128 == 0:
            inner = ll.reshape(ll.shape[0], -1, 128).sum(axis=2)
            return inner.astype(jnp.float64).sum(axis=1).astype(jnp.float32)
        return jnp.sum(ll.astype(jnp.float64), axis=1).astype(jnp.float32)

    # init: OLS of z = 4.863891244002886*(y - 0.5) (ref :3640-3652)
    if init is None:
        z = 4.863891244002886 * (yv - 0.5 * valid)
        h0 = hessian(valid)
        rhs0 = xtv(z)
    else:
        h0, rhs0 = init
    beta0 = _solve_psd(h0, rhs0)
    eta0 = eta_of(beta0)
    p0 = jax.nn.sigmoid(eta0) * valid
    ll_old0 = loglik_of(p0, eta0)
    failed0 = jnp.isnan(ll_old0)

    def body(state):
        beta, p, eta, ll_old, it, done, conv, failed, h_last = state
        w = p * (1.0 - p) * valid
        h = hessian(w)
        grad = xtv(p - yv)
        dbeta = _solve_psd(h, grad)
        beta_new = beta - dbeta
        eta_new = eta_of(beta_new)
        p_new = jax.nn.sigmoid(eta_new) * valid
        ll = loglik_of(p_new, eta_new)
        new_failed = jnp.isnan(ll) | jnp.isnan(dbeta).any(axis=1)
        # primary criterion matches the reference; the step-size fallback
        # covers the f32 noise floor where the deviance test can stall
        new_conv = (jnp.abs(ll - ll_old) < 1e-8 * (0.05 + jnp.abs(ll))) | (
            jnp.max(jnp.abs(dbeta), axis=1)
            < 1e-6 * jnp.maximum(1.0, jnp.max(jnp.abs(beta_new), axis=1))
        )
        upd = ~done
        beta = jnp.where(upd[:, None], beta_new, beta)
        p = jnp.where(upd[:, None], p_new, p)
        eta = jnp.where(upd[:, None], eta_new, eta)
        ll_out = jnp.where(upd, ll, ll_old)
        conv = conv | (upd & new_conv & ~new_failed)
        failed = failed | (upd & new_failed)
        done = done | new_conv | new_failed
        # reference SE comes from the Cholesky factor of the LAST solve
        # (hessian at the pre-update iterate, plink2_glm_logistic.cc:4813)
        h_last = jnp.where(upd[:, None, None], h, h_last)
        return beta, p, eta, ll_out, it + 1, done, conv, failed, h_last

    def cond(state):
        _b, _p, _e, _l, it, done, _c, _f, _h = state
        return (it < _GLM_MAXIT) & ~jnp.all(done)

    eye = jnp.eye(d, dtype=jnp.float32)
    state = (
        beta0, p0, eta0, ll_old0,
        jnp.array(1), failed0, jnp.zeros(vb, bool), failed0,
        jnp.broadcast_to(eye, (vb, d, d)),
    )
    beta, _p_f, _eta_f, ll, it, done, conv, failed, h_last = lax.while_loop(
        cond, body, state
    )
    hinv = _inv_psd(h_last)
    se = jnp.sqrt(jnp.maximum(jax.vmap(jnp.diag)(hinv), 0.0))
    unfinished = ~conv & ~failed
    return beta, se, ll, conv, failed, unfinished, obs, hinv


def _logistic_body(
    packed: jax.Array,  # [vb, NB] uint8
    gw: jax.Array,  # [vb, P, 3] f32 plane weights (H, A, V) per geno predictor
    c: jax.Array,  # [n, dc] f32 covariates incl. intercept
    y: jax.Array,  # [n] f32 in {0, 1}
    mask: jax.Array,  # [n] f32: 1 = sample in this pheno's set
    dc: int,
    np_: int = 1,  # geno predictor count P
    covj: tuple = (),  # per-predictor covariate column to multiply in
    # (0 = intercept column = no-op); expresses GxC interaction predictors
    sscale=None,
):
    """Plane front-end for _logistic_core: ADD/DOMDEV/DOM/REC/hetonly/
    genotypic all run through the same kernel."""
    gcols, valid = _plane_cols(packed, gw, c, mask, np_, covj, sscale)
    return _logistic_core(gcols, valid, c, y, dc)


def _firth_core(gcols, valid, c, y, dc, offset=None):
    """Batched Firth penalized-likelihood regression, a faithful port of the
    reference's logistf-derived algorithm (FirthRegressionD,
    2.0/plink2_glm_logistic.cc:3049-3185), generalized to arbitrary
    genotype predictor columns:
      hdiag_s = v_s * x_s^T (X^T V X)^-1 x_s           (hat diagonal)
      ustar   = X^T [(y - p) + hdiag*(0.5 - p)]        (penalized score)
      step    = (X^T (1+hdiag) V X)^-1 ustar           ("second weights")
      step components capped at maxstep=5, convergence when
      delta_max <= 1e-5 AND max|ustar| < 1e-5 AND dloglik < 1e-5 (iter >= 1),
      max 25 iterations; SE from the second-weight covariance inv."""
    vb, n, d, ccfl, xtv, hessian, eta_of = _design_ops(gcols, valid, c, dc,
                                                       offset)
    P = len(gcols)
    hi = lax.Precision.HIGHEST
    yv = y[None, :] * valid
    obs = jnp.sum(valid.astype(jnp.float32), axis=1)

    def hat_diag(w, hinv):
        # h_s = w_s * x_s^T Hinv x_s without materializing [vb, n, d]
        hc = hinv[:, :dc, :dc].reshape(vb, dc * dc)
        q1 = lax.dot_general(hc, ccfl, (((1,), (1,)), ((), ())), precision=hi,
                             preferred_element_type=jnp.float32)  # [vb, n]
        acc = q1
        for p in range(P):
            hcg = hinv[:, :dc, dc + p]
            q2 = lax.dot_general(hcg, c, (((1,), (1,)), ((), ())), precision=hi,
                                 preferred_element_type=jnp.float32)
            acc = acc + 2.0 * gcols[p] * q2
            for q in range(P):
                acc = acc + gcols[p] * gcols[q] * hinv[:, dc + p : dc + p + 1, dc + q]
        return w * acc

    eye = jnp.eye(d, dtype=jnp.float32)
    inv = _inv_psd

    def step_parts(beta):
        eta = eta_of(beta)
        p = jax.nn.sigmoid(eta) * valid
        v = p * (1.0 - p) * valid
        h0 = hessian(v)
        if _use_unrolled_chol(d):
            # one unrolled factorization serves inverse AND log-determinant
            # (logdet = 2 sum log diag L; XLA's slogdet is another ~5 ms
            # LAPACK-style op per call at this batch size)
            L0 = _chol_small(h0)
            h0inv = _chol_inv_small(L0)
            logdet = 2.0 * sum(jnp.log(L0[j][j]) for j in range(d))
        else:
            h0inv = _inv_psd(h0)
            _, logdet = jnp.linalg.slogdet(h0)
        hd = hat_diag(v, h0inv)
        ustar = xtv((yv - p + hd * (0.5 - p)) * valid)
        ll = yv * (-jax.nn.softplus(-eta)) + (valid - yv) * (-jax.nn.softplus(eta))
        # two-stage f32/f64 reduction (see _logistic_core.loglik_of)
        if ll.shape[1] % 128 == 0:
            lls = ll.reshape(ll.shape[0], -1, 128).sum(axis=2) \
                .astype(jnp.float64).sum(axis=1).astype(jnp.float32)
        else:
            lls = jnp.sum(ll.astype(jnp.float64), axis=1).astype(jnp.float32)
        pll = lls + 0.5 * logdet
        return pll, ustar, hd, v

    def body(state):
        beta, pll_old, delta_max, it, done, conv, failed, h2inv_last = state
        pll, ustar, hd, v = step_parts(beta)
        new_failed = jnp.isnan(pll)
        ustar_max = jnp.max(jnp.abs(ustar), axis=1)
        new_conv = (
            (it > 0)
            & (delta_max <= 1e-5)
            & (ustar_max < 1e-5)
            & ((pll - pll_old) < 1e-5)
        )
        h2 = hessian((1.0 + hd) * v)
        h2inv = inv(h2)
        dbeta = jnp.einsum("vij,vj->vi", h2inv, ustar)
        new_failed = new_failed | jnp.isnan(dbeta).any(axis=1)
        dmax = jnp.max(jnp.abs(dbeta), axis=1)
        scale = jnp.minimum(1.0, 5.0 / jnp.maximum(dmax, 1e-30))  # maxstep=5
        dbeta = dbeta * scale[:, None]
        dmax = jnp.minimum(dmax, 5.0)

        upd = ~done & ~new_conv & ~new_failed
        beta = jnp.where(upd[:, None], beta + dbeta, beta)
        pll_out = jnp.where(~done, pll, pll_old)
        delta_max = jnp.where(upd, dmax, delta_max)
        conv = conv | (~done & new_conv)
        failed = failed | (~done & new_failed)
        done = done | new_conv | new_failed
        # reported covariance = inverted second-weight hessian of the last
        # executed step (the reference's hh output is not recomputed at the
        # final beta, plink2_glm_logistic.cc:3162-3186)
        h2inv_last = jnp.where(upd[:, None, None], h2inv, h2inv_last)
        return beta, pll_out, delta_max, it + 1, done, conv, failed, h2inv_last

    def cond(state):
        _b, _p, _d, it, done, _c, _f, _h = state
        return (it <= _FIRTH_MAXIT) & ~jnp.all(done)

    beta0 = jnp.zeros((vb, d), jnp.float32)
    state = (
        beta0, jnp.zeros(vb, jnp.float32), jnp.zeros(vb, jnp.float32),
        jnp.array(0), jnp.zeros(vb, bool), jnp.zeros(vb, bool),
        jnp.zeros(vb, bool),
        jnp.broadcast_to(jnp.eye(d, dtype=jnp.float32), (vb, d, d)),
    )
    beta, pll, _, it, done, conv, failed, h2inv_last = lax.while_loop(
        cond, body, state
    )
    se = jnp.sqrt(jnp.maximum(jax.vmap(jnp.diag)(h2inv_last), 0.0))
    unfinished = ~conv & ~failed
    return beta, se, pll, conv, failed, unfinished, obs, h2inv_last


def _firth_body(
    packed: jax.Array,
    gw: jax.Array,  # [vb, P, 3] plane weights
    c: jax.Array,
    y: jax.Array,
    mask: jax.Array,
    dc: int,
    np_: int = 1,
    covj: tuple = (),
    sscale=None,
):
    """Plane front-end for _firth_core."""
    gcols, valid = _plane_cols(packed, gw, c, mask, np_, covj, sscale)
    return _firth_core(gcols, valid, c, y, dc)


def _resid_body(packed, gw, offs, y, mask, np_, firth, sscale=None):
    """Residualized case/control pass (cc-residualize / firth-residualize,
    the Mbatchou et al. 2021 shortcut; ref LogisticRegressionResidualizedD /
    FirthRegressionResidualizedD, 2.0/plink2_glm_logistic.cc:2939,3191):
    the genotype predictor columns are mean-centered over the per-variant
    nonmissing set and regressed WITHOUT intercept or covariates, with the
    prefitted null-model linear predictor entering as a fixed offset."""
    n = y.shape[0]
    c0 = jnp.zeros((n, 0), jnp.float32)
    gcols, valid = _plane_cols(packed, gw, c0, mask, np_, (), sscale)
    # mean-centering leaves bf16 exactness, so force f32 here (and f32
    # accumulation for the sums -- bf16 reductions are inexact)
    obs = jnp.maximum(jnp.sum(valid.astype(jnp.float32), axis=1), 1.0)
    gcols = [
        (g.astype(jnp.float32)
         - (jnp.sum(g.astype(jnp.float32), axis=1) / obs)[:, None])
        * valid.astype(jnp.float32)
        for g in gcols
    ]
    core = _firth_core if firth else _logistic_core
    return core(gcols, valid, c0, y, 0, offset=offs)


# ---------------------------------------------------------------------------
# dense-G kernels (dosage GLM): the genotype predictor is a fractional
# [vb, n] dosage matrix instead of a plane combination; everything else
# (IRLS cores, moments, validParameters) is shared with the hardcall path.
# Ref dosage design-matrix path: 2.0/plink2_glm.cc:2395.
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("dc", "firth"))
def dense_cc_block(g, fin, c, y, mask, dc, firth=False):
    """One fused device pass for a dosage case/control block.

    g [vb, n] f32 A1 dosages (missing -> 0), fin [vb, n] f32 finite mask.
    Returns (xtx, g_case, g_tot, g_ssq, beta, se, conv, fail, unf, obs,
    invalid, hinv)."""
    valid = fin * mask[None, :]
    gv = g * valid
    gcols = [gv]
    _, _, d, _, _, hessian, _ = _design_ops(gcols, valid, c, dc)
    xtx = hessian(valid)
    yv = y[None, :] * valid
    g_case = jnp.sum(gv * yv, axis=1)
    g_tot = jnp.sum(gv, axis=1)
    g_ssq = jnp.sum(gv * gv, axis=1)
    core = _firth_core if firth else _logistic_core
    beta, se, _ll, conv, fail, unf, obs, hinv = core(gcols, valid, c, y, dc)
    invalid = _valid_params_flags(hinv, d)
    return xtx, g_case, g_tot, g_ssq, beta, se, conv, fail, unf, obs, invalid


@partial(jax.jit, static_argnames=("dc",))
def dense_firth_block(g, fin, c, y, mask, dc):
    """Firth fallback over a dense dosage block (hybrid second pass)."""
    valid = fin * mask[None, :]
    gcols = [g * valid]
    d = dc + 1
    beta, se, _ll, conv, fail, unf, obs, hinv = _firth_core(
        gcols, valid, c, y, dc)
    invalid = _valid_params_flags(hinv, d)
    return beta, se, conv, fail, unf, obs, invalid


@partial(jax.jit, static_argnames=("dc",))
def dense_qt_block(g, fin, c, y, mask, dc):
    """Per-variant OLS sufficient statistics for a dosage block:
    X^T X [vb, d, d], X^T y [vb, d], y'y, dosage sums, obs counts.
    The tiny d x d solves run in float64 on the host (same split as the
    hardcall linear path)."""
    valid = fin * mask[None, :]
    gv = g * valid
    gcols = [gv]
    _, _, d, _, xtv, hessian, _ = _design_ops(gcols, valid, c, dc)
    xtx = hessian(valid)
    yv = y[None, :] * valid
    xty = xtv(yv)
    yy = jnp.sum(yv * yv, axis=1)
    g_tot = jnp.sum(gv, axis=1)
    g_ssq = jnp.sum(gv * gv, axis=1)
    obs = jnp.sum(valid, axis=1)
    return xtx, xty, yy, g_tot, g_ssq, obs


@partial(jax.jit, static_argnames=("dc", "np_", "covj"))
def design_moments_block(packed, gw, c, mask, dc, np_=1, covj=(), sscale=None):
    return _moments_body(packed, gw, c, mask, dc, np_, covj, sscale)


@partial(jax.jit, static_argnames=("dc", "np_", "covj"))
def logistic_irls_block(packed, gw, c, y, mask, dc, np_=1, covj=(),
                        sscale=None):
    return _logistic_body(packed, gw, c, y, mask, dc, np_, covj, sscale)


@partial(jax.jit, static_argnames=("dc", "np_", "covj"))
def firth_irls_block(packed, gw, c, y, mask, dc, np_=1, covj=(), sscale=None):
    return _firth_body(packed, gw, c, y, mask, dc, np_, covj, sscale)


def _valid_params_flags(hinv: jax.Array, d: int) -> jax.Array:
    """validParameters() check on device (ref: plink2_glm_logistic.cc:
    4871-4893): non-intercept covariance diagonal < 1e-20 or non-finite, or
    any estimate pair correlated > 0.99999, invalidates the row."""
    dg = jnp.diagonal(hinv, axis1=1, axis2=2)  # [vb, d]
    bad = ((dg[:, 1:] < 1e-20) | ~jnp.isfinite(dg[:, 1:])).any(axis=1)
    sd = jnp.sqrt(dg)
    tril = jnp.tril(jnp.ones((d, d), bool), -1)
    corr_bad = (hinv > 0.99999 * sd[:, :, None] * sd[:, None, :]) & tril[None]
    return bad | corr_bad.any(axis=(1, 2))


def _collin_screen_device(momy, dc, np_):
    """Device-side version of the host collinearity eigen-screen
    (commands/glm.py _collinearity_errs_batch; ref CheckMaxCorrAndVifNm,
    2.0/plink2_glm_shared.cc:96): flags variants whose covariate+genotype
    correlation structure is CLEARLY fine, so the host never has to fetch
    the [vb, d+2, d+2] moments tensor for them (the fetch, not the check,
    is what costs seconds over a tunnel-attached TPU).

    Thresholds are tightened vs the host's (0.985 max-corr vs 0.99, etc.)
    so f32-vs-f64 boundary noise can only send MORE rows to the exact host
    path, never fewer.  Rows with nm <= d need no check at all (the host
    skips them too) and report ok.  Returns ok [vb] bool."""
    P = np_
    d = dc + P
    kidx = jnp.asarray(tuple(range(dc)) + tuple(dc + 1 + p for p in range(P)),
                       jnp.int32)
    s = momy[:, kidx][:, :, kidx]  # [vb, d, d]
    nm = s[:, 0, 0]
    sums = s[:, 0, 1:]
    k = d - 1
    if k < 2:
        return jnp.ones(momy.shape[0], bool)
    nm_safe = jnp.maximum(nm, 2.0)
    covm = (s[:, 1:, 1:] - sums[:, :, None] * sums[:, None, :]
            / nm_safe[:, None, None]) / (nm_safe - 1.0)[:, None, None]
    var = jnp.diagonal(covm, axis1=1, axis2=2)
    istd = jnp.where(var > 0, lax.rsqrt(jnp.maximum(var, 1e-30)), jnp.nan)
    corr = covm * istd[:, :, None] * istd[:, None, :]
    eye = jnp.eye(k, dtype=bool)
    od = jnp.abs(jnp.where(eye[None], 0.0, corr))
    max_od = jnp.max(od, axis=(1, 2))
    cm = jnp.where(eye[None], 1.0, corr)
    finite = jnp.isfinite(cm).all(axis=(1, 2))
    # Gershgorin lower bound on the smallest eigenvalue of the correlation
    # matrix: wmin >= 1 - max_i sum_{j != i} |corr_ij|.  diag(C^-1) <=
    # 1/wmin, so wmin_lb >= 1/39 guarantees every inverse-corr diagonal
    # <= 39 < the host's 40 cutoff -- no eigensolve needed on device
    wmin_lb = 1.0 - jnp.max(jnp.sum(od, axis=2), axis=1)
    ok = finite & (max_od < 0.985) & (wmin_lb >= 1.0 / 39.0)
    return ok | (nm <= d)


def _glm_scan_body(
    blocks: jax.Array,   # [nb, vb, NB] uint8
    gws: jax.Array,      # [nb, vb, P, 3] model-predictor plane weights
    gwms: jax.Array,     # [nb, vb, P+1, 3] moments weights (model preds + ADD)
    c: jax.Array,        # [n, dc]
    cy: jax.Array,       # [n, dc+1] = [c | y]
    y: jax.Array,        # [n]
    mask: jax.Array,     # [n]
    dc: int,
    np_: int = 1,
    covj: tuple = (),
    firth: bool = False,
    sscale=None,
):
    """Whole-dataset hybrid-GLM pass in ONE device call.

    Per block: the collinearity/separation moments matrix (with y appended
    as an extra covariate column and ADD as an extra predictor) AND the full
    logistic (or Firth) IRLS.  lax.scan over blocks keeps peak memory at one
    block's temporaries while returning stacked per-variant results, so the
    host pays a single dispatch + fetch for the entire scan instead of
    2 round trips per block (the tunnel round trip costs more than the
    compute).  The validParameters() covariance check also runs on device so
    the [vb, d, d] covariance tensor never has to cross the wire in the
    common (no-joint-test) case.
    """
    d = dc + np_

    def body(carry, xs):
        pk, gw, gwm = xs
        # single decode serves both the moments matrix and the IRLS: the
        # moments design is [c | y | model preds | ADD], whose covariate
        # block, y column, and model-pred rows also ARE the IRLS init
        # normal equations (h0 = X'X over valid; X'z = 4.8639*(X'y -
        # 0.5*X'1)), so the init gram pass disappears entirely
        gcols_m, valid = _plane_cols(pk, gwm, cy, mask, np_ + 1,
                                     covj + (0,), sscale)
        momy = _moments_from_cols(gcols_m, valid, cy, dc + 1)
        gcols = gcols_m[:np_]
        if firth:
            beta, se, ll, conv, fail, unf, obs, hinv = _firth_core(
                gcols, valid, c, y, dc)
        else:
            idx = jnp.asarray(
                tuple(range(dc)) + tuple(dc + 1 + p for p in range(np_)),
                jnp.int32)
            h0 = momy[:, idx][:, :, idx]
            xty = momy[:, idx, dc]
            xt1 = momy[:, idx, 0]
            rhs0 = 4.863891244002886 * (xty - 0.5 * xt1)
            beta, se, ll, conv, fail, unf, obs, hinv = _logistic_core(
                gcols, valid, c, y, dc, init=(h0, rhs0))
        invalid = _valid_params_flags(hinv, d)
        # host-side per-variant scalars packed into one tiny fetch: the
        # ADD-column sums + sample counts + the device collinearity screen
        # (the full momy tensor stays device-resident; the host pulls a
        # block only for screen-flagged rows)
        addc = dc + 1 + np_
        mstats = jnp.stack(
            [momy[:, 0, addc], momy[:, addc, addc], momy[:, dc, addc],
             momy[:, 0, 0], momy[:, 0, dc]], axis=1)
        screen_ok = _collin_screen_device(momy, dc, np_)
        return carry, (momy, mstats, screen_ok, beta, se, conv, fail, unf,
                       obs, invalid, hinv)

    _, outs = lax.scan(body, 0, (blocks, gws, gwms))
    return outs


@partial(jax.jit, static_argnames=("dc", "np_", "covj", "firth"))
def glm_logistic_scan(blocks, gws, gwms, c, cy, y, mask, dc, np_=1, covj=(),
                      firth=False, sscale=None):
    return _glm_scan_body(blocks, gws, gwms, c, cy, y, mask, dc, np_, covj,
                          firth, sscale)


def _glm_resid_scan_body(blocks, gws, gwms, cy, offs, y, mask, dc, np_,
                         firth, sscale=None):
    """Residualized-GLM whole-dataset pass: the moments matrix keeps the
    full [1 | covars | y | preds + ADD] design (the host separation /
    A1-freq statistics are unchanged), while the IRLS itself runs on the
    mean-centered genotype predictors with the null-model offset."""
    def body(carry, xs):
        pk, gw, gwm = xs
        covj = tuple(0 for _ in range(np_))
        momy = _moments_body(pk, gwm, cy, mask, dc + 1, np_ + 1, covj + (0,),
                             sscale)
        beta, se, ll, conv, fail, unf, obs, hinv = _resid_body(
            pk, gw, offs, y, mask, np_, firth, sscale)
        dg = jnp.diagonal(hinv, axis1=1, axis2=2)
        invalid = ((dg < 1e-20) | ~jnp.isfinite(dg)).any(axis=1)
        addc = dc + 1 + np_
        mstats = jnp.stack(
            [momy[:, 0, addc], momy[:, addc, addc], momy[:, dc, addc],
             momy[:, 0, 0], momy[:, 0, dc]], axis=1)
        screen_ok = _collin_screen_device(momy, dc, np_)
        return carry, (momy, mstats, screen_ok, beta, se, conv, fail, unf,
                       obs, invalid, hinv)

    _, outs = lax.scan(body, 0, (blocks, gws, gwms))
    return outs


@partial(jax.jit, static_argnames=("dc", "np_", "firth"))
def glm_resid_scan(blocks, gws, gwms, cy, offs, y, mask, dc, np_=1,
                   firth=False, sscale=None):
    return _glm_resid_scan_body(blocks, gws, gwms, cy, offs, y, mask, dc,
                                np_, firth, sscale)


@partial(jax.jit, static_argnames=("np_", "firth"))
def resid_irls_block(packed, gw, offs, y, mask, np_=1, firth=False,
                     sscale=None):
    return _resid_body(packed, gw, offs, y, mask, np_, firth, sscale)


@jax.jit
def xm1_stats_scan(blocks, w, mask):
    """--xchr-model 1 per-variant allele-observation statistics.

    `w` is [n, 2] with columns (s, s*y) where s is the per-sample dosage
    multiplier (0.5 for males) and y the case indicator.  Returns, per
    variant: sum_valid(s), sum_valid(s*y), het count, hom-A1 count.  The
    first two give allele_obs_ct = 2*sum(s) = 2*nm - nm_male and
    case_allele_obs_ct (ref allele_obs_ct -= nm_male_ct under
    is_xchr_model_1, 2.0/plink2_glm_logistic.cc:4438-4440); the counts
    drive the reference's raw-genocount const-allele rule
    (plink2_glm_logistic.cc:1578-1582)."""
    hi = lax.Precision.HIGHEST

    def body(carry, pk):
        codes = unpack_codes(pk, 0)
        b0f = (codes & 1).astype(jnp.float32)
        b1f = ((codes >> 1) & 1).astype(jnp.float32)
        missp = b0f * b1f
        valid = (1.0 - missp) * mask[None, :]
        hpl = (b0f - missp) * valid
        apl = (b1f - missp) * valid
        sv = lax.dot_general(valid, w, (((1,), (0,)), ((), ())),
                             precision=hi,
                             preferred_element_type=jnp.float32)
        return carry, (sv[:, 0], sv[:, 1], jnp.sum(hpl, axis=1),
                       jnp.sum(apl, axis=1))

    _, outs = lax.scan(body, 0, blocks)
    return outs


from functools import lru_cache


@lru_cache(maxsize=None)
def _glm_scan_sharded(mesh, dc, np_, covj, firth, have_sscale):
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import AXIS

    def local(blocks, gws, gwms, c, cy, y, mask, *rest):
        ss = rest[0] if have_sscale else None
        return _glm_scan_body(blocks, gws, gwms, c, cy, y, mask, dc, np_,
                              covj, firth, ss)

    nin = 7 + (1 if have_sscale else 0)
    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=tuple([P(AXIS)] * 3 + [P()] * (nin - 3)),
        out_specs=tuple([P(AXIS)] * 11), check_rep=False,
    ))


def glm_logistic_scan_any(blocks, gws, gwms, c, cy, y, mask, dc, np_=1,
                          covj=(), firth=False, sscale=None):
    """glm_logistic_scan routing block-sharded inputs through shard_map:
    each device runs the scan over its variant-block shard (pure data
    parallelism over the unbounded axis -- P1 of SURVEY.md section 2.6)."""
    from ..parallel.mesh import sharded_mesh_of

    mesh = sharded_mesh_of(blocks)
    if mesh is None:
        return glm_logistic_scan(blocks, gws, gwms, c, cy, y, mask, dc, np_,
                                 covj, firth, sscale)
    extra = () if sscale is None else (sscale,)
    return _glm_scan_sharded(mesh, dc, np_, covj, firth, sscale is not None)(
        blocks, gws, gwms, c, cy, y, mask, *extra
    )


@lru_cache(maxsize=None)
def _glm_resid_scan_sharded(mesh, dc, np_, firth, have_sscale):
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import AXIS

    def local(blocks, gws, gwms, cy, offs, y, mask, *rest):
        ss = rest[0] if have_sscale else None
        return _glm_resid_scan_body(blocks, gws, gwms, cy, offs, y, mask,
                                    dc, np_, firth, ss)

    nin = 7 + (1 if have_sscale else 0)
    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=tuple([P(AXIS)] * 3 + [P()] * (nin - 3)),
        out_specs=tuple([P(AXIS)] * 11), check_rep=False,
    ))


def glm_resid_scan_any(blocks, gws, gwms, cy, offs, y, mask, dc, np_=1,
                       firth=False, sscale=None):
    from ..parallel.mesh import sharded_mesh_of

    mesh = sharded_mesh_of(blocks)
    if mesh is None:
        return glm_resid_scan(blocks, gws, gwms, cy, offs, y, mask, dc, np_,
                              firth, sscale)
    extra = () if sscale is None else (sscale,)
    return _glm_resid_scan_sharded(mesh, dc, np_, firth, sscale is not None)(
        blocks, gws, gwms, cy, offs, y, mask, *extra
    )


@lru_cache(maxsize=None)
def _linear_scan_sharded(mesh):
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import AXIS

    def local(blocks, c, ccfl, y, cy, y2):
        def body(carry, pk):
            return carry, _linear_sums_body(pk, c, ccfl, y, cy, y2)

        _, outs = lax.scan(body, 0, blocks)
        return outs

    keys = ("hcc", "acc", "mcc", "hcy", "acy", "mcy", "myy")
    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS), P(), P(), P(), P(), P()),
        out_specs={k: P(AXIS) for k in keys}, check_rep=False,
    ))


def linear_sums_scan_any(blocks, c, ccfl, y, cy, y2):
    from ..parallel.mesh import sharded_mesh_of

    mesh = sharded_mesh_of(blocks)
    if mesh is None:
        return linear_sums_scan(blocks, c, ccfl, y, cy, y2)
    return _linear_scan_sharded(mesh)(blocks, c, ccfl, y, cy, y2)


def _linear_perm_body(pk, gw, c, Y, mask, dc, covj, sscale=None):
    """Per-block permutation t-statistics for a single-genotype-predictor
    linear model.

    The genotype design is FIXED across permutations, so X^T X (and its
    inverse) is computed once per variant while X^T y_p / y_p^T y_p are
    plane-Gram matmuls against the permuted phenotype matrix Y [n, B] --
    the permutation axis rides the MXU as an extra batch dimension
    (TPU-first replacement for the reference's per-perm worker loop,
    GlmLinearSubbatchThread, 2.0/plink2_glm_linear.cc:2542).

    Returns t [vb, B] f32 (primary-predictor t-stat; NaN on singular fits).
    """
    codes = unpack_codes(pk, 0)
    b0f = (codes & 1).astype(jnp.float32)
    b1f = ((codes >> 1) & 1).astype(jnp.float32)
    missp = b0f * b1f
    valid = (1.0 - missp) * mask[None, :]
    hpl = (b0f - missp) * valid
    apl = (b1f - missp) * valid
    vb, n = valid.shape
    d = dc + 1
    hi = lax.Precision.HIGHEST
    g = gw[:, 0, 0:1] * hpl + gw[:, 0, 1:2] * apl + gw[:, 0, 2:3] * valid
    if covj and covj[0]:
        g = g * c[None, :, covj[0]]
    if sscale is not None:
        g = g * sscale[None, :]

    # X^T X per variant (same math as the moments kernel, P = 1)
    ccfl = (c[:, :, None] * c[:, None, :]).reshape(n, dc * dc)
    a = lax.dot_general(valid, ccfl, (((1,), (0,)), ((), ())), precision=hi,
                        preferred_element_type=jnp.float32).reshape(vb, dc, dc)
    h = jnp.zeros((vb, d, d), jnp.float32)
    h = h.at[:, :dc, :dc].set(a)
    cg = lax.dot_general(g, c, (((1,), (0,)), ((), ())), precision=hi,
                         preferred_element_type=jnp.float32)
    h = h.at[:, :dc, dc].set(cg)
    h = h.at[:, dc, :dc].set(cg)
    h = h.at[:, dc, dc].set(jnp.sum(g * g, axis=1))

    inv = _inv_psd(h)

    dotB = lambda wv, m: lax.dot_general(
        wv, m, (((1,), (0,)), ((), ())), precision=hi,
        preferred_element_type=jnp.float32)
    parts = [dotB(valid, c[:, j:j + 1] * Y) for j in range(dc)]
    parts.append(dotB(g, Y))
    xty = jnp.stack(parts, axis=1)  # [vb, d, B]
    yy = dotB(valid, Y * Y)  # [vb, B]

    beta = jnp.einsum("vij,vjb->vib", inv, xty)
    rss = yy - jnp.einsum("vjb,vjb->vb", beta, xty)
    nm = h[:, 0, 0]
    dof = jnp.maximum(nm - d, 1.0)
    sigma2 = rss / dof[:, None]
    se2 = sigma2 * inv[:, d - 1, d - 1][:, None]
    return beta[:, d - 1] / jnp.sqrt(jnp.maximum(se2, 0.0))


@partial(jax.jit, static_argnames=("dc", "covj"))
def linear_perm_scan(blocks, gws, c, Y, mask, dc, covj=(), sscale=None):
    """Whole-dataset permutation t-stats: [nb, vb, B] f32 in one call."""

    def body(carry, xs):
        pk, gw = xs
        return carry, _linear_perm_body(pk, gw, c, Y, mask, dc, covj, sscale)

    _, outs = lax.scan(body, 0, (blocks, gws))
    return outs


@partial(jax.jit, static_argnames=("dc", "covj"))
def firth_perm_scan(blocks, gws, c, Y, mask, dc, covj=(), sscale=None):
    """Case/control permutation statistics: Firth |z| per (variant, perm).

    The reference requires the 'firth' modifier for cc permutation and runs
    FirthRegression per permuted phenotype (GlmLogisticPerm,
    2.0/plink2_glm_logistic.cc:6342-6704); here the perm axis is an outer
    lax.scan over the already variant-batched Firth IRLS kernel.  permstat
    follows :6690-6697: -1 on fit failure, 0 when beta==0, +inf when se==0,
    else |beta/se|.  Returns [B, nb, vb] f32.
    """
    d = dc + 1

    def per_perm(carry, yb):
        def per_block(c2, xs):
            pk, gw = xs
            beta, se, _ll, conv, failed, unf, _obs, _hinv = _firth_body(
                pk, gw, c, yb, mask, dc, 1, covj, sscale
            )
            bg = beta[:, d - 1]
            sg = se[:, d - 1]
            stat = jnp.abs(bg / sg)
            stat = jnp.where(bg == 0.0, 0.0, stat)
            stat = jnp.where((sg == 0.0) & (bg != 0.0), jnp.inf, stat)
            stat = jnp.where(failed | jnp.isnan(stat), -1.0, stat)
            return c2, stat

        _, stats = lax.scan(per_block, 0, (blocks, gws))
        return carry, stats

    _, outs = lax.scan(per_perm, 0, Y.T)
    return outs


def _linear_perm_multi_body(pk, gw, c, Y, mask, dc, covj, q, sscale=None):
    """Per-block permutation statistics for MULTI-predictor linear models
    (genotypic/hethom joint tests, interaction designs).

    Same permutation-as-batch-axis design as _linear_perm_body: the design
    matrix [c | G_1..G_P] is fixed across permutations, so the full and
    reduced (genotype-main-effects dropped) normal matrices invert once per
    variant, while X^T y_p streams as plane-Gram matmuls against the
    permuted phenotype matrix Y [n, B].

    When q > 0 the statistic is the joint F over the first q genotype
    columns via the RSS difference (the reference's constraint-model
    permstat is the monotone -ln p of this F, FstatToLnP; ref
    2.0/plink2_glm_logistic.cc:5595-5601 pattern applied by
    GlmLinearPerm).  When q == 0 (interaction without a joint test) it is
    the t-stat of the first genotype column, the reference's primary
    reported test.  Returns stat [vb, B] f32 (NaN on singular fits).
    """
    np_ = gw.shape[1]
    gcols, valid = _plane_cols(pk, gw, c, mask, np_, covj, sscale)
    vb, n = valid.shape
    d = dc + np_
    hi = lax.Precision.HIGHEST

    # X^T X per variant (full design)
    ccfl = (c[:, :, None] * c[:, None, :]).reshape(n, dc * dc)
    a = lax.dot_general(valid, ccfl, (((1,), (0,)), ((), ())), precision=hi,
                        preferred_element_type=jnp.float32).reshape(vb, dc, dc)
    h = jnp.zeros((vb, d, d), jnp.float32)
    h = h.at[:, :dc, :dc].set(a)
    for p in range(np_):
        gp = gcols[p]
        cg = lax.dot_general(gp, c, (((1,), (0,)), ((), ())), precision=hi,
                             preferred_element_type=jnp.float32)
        h = h.at[:, :dc, dc + p].set(cg)
        h = h.at[:, dc + p, :dc].set(cg)
        for r in range(p, np_):
            gg = jnp.sum(gp * gcols[r], axis=1)
            h = h.at[:, dc + p, dc + r].set(gg)
            h = h.at[:, dc + r, dc + p].set(gg)

    inv = _inv_psd(h)

    dotB = lambda wv, m: lax.dot_general(
        wv, m, (((1,), (0,)), ((), ())), precision=hi,
        preferred_element_type=jnp.float32)
    parts = [dotB(valid, c[:, j:j + 1] * Y) for j in range(dc)]
    parts += [dotB(g, Y) for g in gcols]
    xty = jnp.stack(parts, axis=1)  # [vb, d, B]
    yy = dotB(valid, Y * Y)  # [vb, B]

    beta = jnp.einsum("vij,vjb->vib", inv, xty)
    rss = yy - jnp.einsum("vjb,vjb->vb", beta, xty)
    nm = h[:, 0, 0]
    dof = jnp.maximum(nm - d, 1.0)
    sigma2 = rss / dof[:, None]
    if q == 0:
        se2 = sigma2 * inv[:, dc, dc][:, None]
        return beta[:, dc] / jnp.sqrt(jnp.maximum(se2, 0.0))
    # reduced design: drop the q genotype main-effect columns
    keep = tuple(range(dc)) + tuple(range(dc + q, d))
    kidx = jnp.asarray(keep, jnp.int32)
    h0 = h[:, kidx][:, :, kidx]
    inv0 = _inv_psd(h0)
    xty0 = xty[:, kidx]
    b0 = jnp.einsum("vij,vjb->vib", inv0, xty0)
    rss0 = yy - jnp.einsum("vjb,vjb->vb", b0, xty0)
    return ((rss0 - rss) / float(q)) / jnp.maximum(sigma2, 1e-30)


@partial(jax.jit, static_argnames=("dc", "covj", "q"))
def linear_perm_multi_scan(blocks, gws, c, Y, mask, dc, covj, q, sscale=None):
    """Whole-dataset multi-predictor permutation stats: [nb, vb, B] f32."""

    def body(carry, xs):
        pk, gw = xs
        return carry, _linear_perm_multi_body(pk, gw, c, Y, mask, dc, covj,
                                              q, sscale)

    _, outs = lax.scan(body, 0, (blocks, gws))
    return outs


@partial(jax.jit, static_argnames=("dc", "covj", "q"))
def firth_perm_multi_scan(blocks, gws, c, Y, mask, dc, covj, q, sscale=None):
    """Case/control permutation statistics for MULTI-predictor Firth models.

    q > 0: joint Wald chisq/q over the first q genotype columns from the
    final Firth Hessian inverse (the reference's constraint-model permstat
    is -ln p of FstatToLnP(chisq/ct, ct, nobs), monotone in chisq for fixed
    per-variant dof; ref LinearHypothesisChisq + plink2_glm_logistic.cc:
    5595-5601).  q == 0: |z| of the first genotype column (primary test
    under interaction designs).  -1 marks fit failures, matching
    GlmLogisticPerm :6690-6697.  Returns [B, nb, vb] f32.
    """
    def per_perm(carry, yb):
        def per_block(c2, xs):
            pk, gw = xs
            np_ = gw.shape[1]
            beta, se, _ll, conv, failed, unf, _obs, hinv = _firth_body(
                pk, gw, c, yb, mask, dc, np_, covj, sscale
            )
            if q == 0:
                bg = beta[:, dc]
                sg = se[:, dc]
                stat = jnp.abs(bg / sg)
                stat = jnp.where(bg == 0.0, 0.0, stat)
                stat = jnp.where((sg == 0.0) & (bg != 0.0), jnp.inf, stat)
            else:
                bg = beta[:, dc:dc + q]
                sub = hinv[:, dc:dc + q, dc:dc + q]
                x = jnp.linalg.solve(sub, bg[..., None])[..., 0]
                stat = jnp.sum(bg * x, axis=-1) / float(q)
                stat = jnp.where(stat < 0.0, -1.0, stat)
            stat = jnp.where(failed | jnp.isnan(stat), -1.0, stat)
            return c2, stat

        _, stats = lax.scan(per_block, 0, (blocks, gws))
        return carry, stats

    _, outs = lax.scan(per_perm, 0, Y.T)
    return outs
