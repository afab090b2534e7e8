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


@jax.jit
def linear_block_sums(
    packed: jax.Array,  # [vb, NB] uint8 (samples = per-pheno subset, compacted)
    c: jax.Array,  # [n, dc] f32 covariates incl. leading intercept column
    ccfl: jax.Array,  # [n, dc*dc] f32 flattened outer products c_i c_j
    y: jax.Array,  # [n] f32
    cy: jax.Array,  # [n, dc] f32 = c * y[:, None]
    y2: jax.Array,  # [n] f32 = y*y
):
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


# ---------------------------------------------------------------------------
# logistic / Firth IRLS
# ---------------------------------------------------------------------------

_GLM_MAXIT = 25  # ref: plink2_glm_logistic.cc "maxit = 25"
_FIRTH_MAXIT = 25


def _solve_psd(h: jax.Array, grad: jax.Array) -> jax.Array:
    """Batched solve of h [vb, d, d] @ x = grad [vb, d] via Cholesky."""
    chol = jax.vmap(jnp.linalg.cholesky)(h)
    return jax.vmap(jax.scipy.linalg.cho_solve, in_axes=((0, None), 0))(
        (chol, True), grad
    )


@partial(jax.jit, static_argnames=("dc",))
def logistic_irls_block(
    packed: jax.Array,  # [vb, NB] uint8
    flip: jax.Array,  # [vb] f32: 1 -> A1 = ALT, 0 -> A1 = REF (g' = 2v - g)
    c: jax.Array,  # [n, dc] f32 covariates incl. intercept
    y: jax.Array,  # [n] f32 in {0, 1}
    mask: jax.Array,  # [n] f32: 1 = sample in this pheno's set
    dc: int,
):
    """Batched logistic IRLS, one variant per row.

    Design per variant: [c (dc cols) | g] -> d = dc + 1 predictors,
    predictor order (const, covars..., geno) is internal; callers reorder.
    Samples with missing genotype are dropped per-variant by zeroing their
    design row AND their y (sums then simply skip them).

    Returns (beta [vb, d], se [vb, d], loglik [vb], converged [vb] bool,
    failed [vb] bool, obs_ct [vb]).
    """
    g_raw, valid = _geno_block(packed)
    valid = valid * mask[None, :]
    g = jnp.where(flip[:, None] > 0, g_raw, 2.0 - g_raw) * valid
    vb, n = g.shape
    d = dc + 1
    hi = lax.Precision.HIGHEST

    yv = y[None, :] * valid  # [vb, n]
    obs = jnp.sum(valid, axis=1)

    def xtv(w):  # X^T w for every variant: [vb, n] -> [vb, d]
        cw = lax.dot_general(w, c, (((1,), (0,)), ((), ())), precision=hi,
                             preferred_element_type=jnp.float32)
        gw = jnp.sum(w * g, axis=1)
        return jnp.concatenate([cw, gw[:, None]], axis=1)

    ccfl = (c[:, :, None] * c[:, None, :]).reshape(n, dc * dc)

    def hessian(w):  # [vb, n] weights -> [vb, d, d]
        a = lax.dot_general(w, ccfl, (((1,), (0,)), ((), ())), precision=hi,
                            preferred_element_type=jnp.float32).reshape(vb, dc, dc)
        wg = w * g
        cg = lax.dot_general(wg, c, (((1,), (0,)), ((), ())), precision=hi,
                             preferred_element_type=jnp.float32)  # [vb, dc]
        gg = jnp.sum(wg * g, axis=1)  # [vb]
        h = jnp.zeros((vb, d, d), jnp.float32)
        h = h.at[:, :dc, :dc].set(a)
        h = h.at[:, :dc, dc].set(cg)
        h = h.at[:, dc, :dc].set(cg)
        h = h.at[:, dc, dc].set(gg)
        return h

    def eta_of(beta):  # [vb, d] -> [vb, n]
        e = lax.dot_general(beta[:, :dc], c, (((1,), (1,)), ((), ())),
                            precision=hi, preferred_element_type=jnp.float32)
        return (e + beta[:, dc:] * g) * valid

    def loglik_of(p, eta):
        # sum over valid samples of y*log(p) + (1-y)*log(1-p);
        # log(p) = -softplus(-eta), log(1-p) = -softplus(eta).
        # f64 accumulation so the 1e-8-relative convergence test below can
        # actually resolve (f32 summation noise exceeds the threshold).
        ll = yv * (-jax.nn.softplus(-eta)) + (valid - yv) * (-jax.nn.softplus(eta))
        return jnp.sum(ll.astype(jnp.float64), axis=1).astype(jnp.float32)

    # init: OLS of z = 4.863891244002886*(y - 0.5) (ref :3640-3652)
    z = 4.863891244002886 * (yv - 0.5 * valid)
    h0 = hessian(valid)
    rhs0 = xtv(z)
    beta = _solve_psd(h0, rhs0)
    eta = eta_of(beta)
    p = jax.nn.sigmoid(eta) * valid
    ll_old = loglik_of(p, eta)
    failed0 = jnp.isnan(ll_old)

    def body(state):
        beta, p, eta, ll_old, it, done, conv, failed = state
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
        return beta, p, eta, ll_out, it + 1, done, conv, failed

    def cond(state):
        *_, it, done, conv, failed = state
        return (it < _GLM_MAXIT) & ~jnp.all(done)

    state = (
        beta, p, eta, ll_old,
        jnp.array(1), failed0, jnp.zeros(vb, bool), failed0,
    )
    beta, p, eta, ll, it, done, conv, failed = lax.while_loop(cond, body, state)

    # final observed-information SE
    w = p * (1.0 - p) * valid
    h = hessian(w)
    eye = jnp.eye(d, dtype=jnp.float32)
    hinv = jax.vmap(lambda m: jax.scipy.linalg.cho_solve(
        (jnp.linalg.cholesky(m), True), eye))(h)
    se = jnp.sqrt(jnp.maximum(jax.vmap(jnp.diag)(hinv), 0.0))
    unfinished = ~conv & ~failed
    return beta, se, ll, conv, failed, unfinished, obs


@partial(jax.jit, static_argnames=("dc",))
def firth_irls_block(
    packed: jax.Array,
    flip: jax.Array,
    c: jax.Array,
    y: jax.Array,
    mask: jax.Array,
    dc: int,
):
    """Batched Firth penalized-likelihood regression, a faithful port of the
    reference's logistf-derived algorithm (FirthRegressionD,
    2.0/plink2_glm_logistic.cc:3049-3185):
      hdiag_s = v_s * x_s^T (X^T V X)^-1 x_s           (hat diagonal)
      ustar   = X^T [(y - p) + hdiag*(0.5 - p)]        (penalized score)
      step    = (X^T (1+hdiag) V X)^-1 ustar           ("second weights")
      step components capped at maxstep=5, convergence when
      delta_max <= 1e-5 AND max|ustar| < 1e-5 AND dloglik < 1e-5 (iter >= 1),
      max 25 iterations; SE from the second-weight covariance inv."""
    g_raw, valid = _geno_block(packed)
    valid = valid * mask[None, :]
    g = jnp.where(flip[:, None] > 0, g_raw, 2.0 - g_raw) * valid
    vb, n = g.shape
    d = dc + 1
    hi = lax.Precision.HIGHEST
    yv = y[None, :] * valid
    obs = jnp.sum(valid, axis=1)
    ccfl = (c[:, :, None] * c[:, None, :]).reshape(n, dc * dc)

    def xtv(w):
        cw = lax.dot_general(w, c, (((1,), (0,)), ((), ())), precision=hi,
                             preferred_element_type=jnp.float32)
        gw = jnp.sum(w * g, axis=1)
        return jnp.concatenate([cw, gw[:, None]], axis=1)

    def hessian(w):
        a = lax.dot_general(w, ccfl, (((1,), (0,)), ((), ())), precision=hi,
                            preferred_element_type=jnp.float32).reshape(vb, dc, dc)
        wg = w * g
        cg = lax.dot_general(wg, c, (((1,), (0,)), ((), ())), precision=hi,
                             preferred_element_type=jnp.float32)
        gg = jnp.sum(wg * g, axis=1)
        h = jnp.zeros((vb, d, d), jnp.float32)
        h = h.at[:, :dc, :dc].set(a)
        h = h.at[:, :dc, dc].set(cg)
        h = h.at[:, dc, :dc].set(cg)
        h = h.at[:, dc, dc].set(gg)
        return h

    def eta_of(beta):
        e = lax.dot_general(beta[:, :dc], c, (((1,), (1,)), ((), ())),
                            precision=hi, preferred_element_type=jnp.float32)
        return (e + beta[:, dc:] * g) * valid

    def hat_diag(w, hinv):
        # h_s = w_s * x_s^T Hinv x_s, computed per sample without
        # materializing [vb, n, d]: expand Hinv into its c/c, c/g, g/g blocks
        hc = hinv[:, :dc, :dc].reshape(vb, dc * dc)  # [vb, dc^2]
        hcg = hinv[:, :dc, dc]  # [vb, dc]
        hgg = hinv[:, dc, dc]  # [vb]
        # x^T Hinv x = c'Hc c + 2 g (Hcg . c) + g^2 Hgg
        q1 = lax.dot_general(hc, ccfl, (((1,), (1,)), ((), ())), precision=hi,
                             preferred_element_type=jnp.float32)  # [vb, n]
        q2 = lax.dot_general(hcg, c, (((1,), (1,)), ((), ())), precision=hi,
                             preferred_element_type=jnp.float32)  # [vb, n]
        return w * (q1 + 2.0 * g * q2 + g * g * hgg[:, None])

    eye = jnp.eye(d, dtype=jnp.float32)
    inv = jax.vmap(lambda m: jax.scipy.linalg.cho_solve(
        (jnp.linalg.cholesky(m), True), eye))

    def step_parts(beta):
        """One evaluation at beta: (loglik_pen, ustar, hdiag, v, p)."""
        eta = eta_of(beta)
        p = jax.nn.sigmoid(eta) * valid
        v = p * (1.0 - p) * valid
        h0 = hessian(v)
        h0inv = inv(h0)
        hd = hat_diag(v, h0inv)
        ustar = xtv((yv - p + hd * (0.5 - p)) * valid)
        ll = yv * (-jax.nn.softplus(-eta)) + (valid - yv) * (-jax.nn.softplus(eta))
        _, logdet = jnp.linalg.slogdet(h0)
        pll = jnp.sum(ll, axis=1) + 0.5 * logdet
        return pll, ustar, hd, v

    def body(state):
        beta, pll_old, delta_max, it, done, conv, failed = state
        pll, ustar, hd, v = step_parts(beta)
        new_failed = jnp.isnan(pll)
        # convergence check at loop top, after the first step (ref :3143-3155)
        ustar_max = jnp.max(jnp.abs(ustar), axis=1)
        new_conv = (
            (it > 0)
            & (delta_max <= 1e-5)
            & (ustar_max < 1e-5)
            & ((pll - pll_old) < 1e-5)
        )
        # Newton step with logistf "second weights" (1 + hdiag) * v
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
        return beta, pll_out, delta_max, it + 1, done, conv, failed

    def cond(state):
        *_, it, done, conv, failed = state
        return (it <= _FIRTH_MAXIT) & ~jnp.all(done)

    beta0 = jnp.zeros((vb, d), jnp.float32)
    state = (
        beta0, jnp.zeros(vb, jnp.float32), jnp.zeros(vb, jnp.float32),
        jnp.array(0), jnp.zeros(vb, bool), jnp.zeros(vb, bool),
        jnp.zeros(vb, bool),
    )
    beta, pll, _, it, done, conv, failed = lax.while_loop(cond, body, state)

    # SE from the second-weight covariance at the final beta (ref: returned
    # hh is inv(X^T (1+hdiag) V X))
    _, _, hd, v = step_parts(beta)
    h2inv = inv(hessian((1.0 + hd) * v))
    se = jnp.sqrt(jnp.maximum(jax.vmap(jnp.diag)(h2inv), 0.0))
    unfinished = ~conv & ~failed
    return beta, se, pll, conv, failed, unfinished, obs
