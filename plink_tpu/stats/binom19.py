"""Exact two-sided binomial(p=0.5) test, PLINK 1.9 parity.

Behavior reference: binom_2sided (1.9/plink_stats.c:2213): relative
likelihoods are walked outward from the observed count in exact float64
op order, classifying mass into tail vs center against an
EXACT_TEST_BIAS-scaled threshold, with the mid-p tie adjustment.
"""

from __future__ import annotations

EXACT_TEST_BIAS = float(
    "0.000000000000000000000001033975765691284593589260865087453566957265"
    "1386260986328125")
SMALL_EPSILON = 0.00000000000005684341886080801486968994140625


def binom_2sided(succ: int, obs: int, midp: bool) -> float:
    cur_succ_t2 = float(succ)
    cur_fail_t2 = float(obs - succ)
    tailp = (1 - SMALL_EPSILON) * EXACT_TEST_BIAS
    centerp = 0.0
    lastp2 = tailp
    lastp1 = tailp
    tie_ct = 1
    if not obs:
        return 0.5 if midp else 1.0
    if obs < succ * 2:
        while cur_succ_t2 > 0.5:
            cur_fail_t2 += 1
            lastp2 *= cur_succ_t2 / cur_fail_t2
            cur_succ_t2 -= 1
            if lastp2 < EXACT_TEST_BIAS:
                if lastp2 > (1 - 2 * SMALL_EPSILON) * EXACT_TEST_BIAS:
                    tie_ct += 1
                tailp += lastp2
                break
            centerp += lastp2
            if centerp == float("inf"):
                return 0.0
        if centerp == 0 and not midp:
            return 1.0
        while cur_succ_t2 > 0.5:
            cur_fail_t2 += 1
            lastp2 *= cur_succ_t2 / cur_fail_t2
            cur_succ_t2 -= 1
            preaddp = tailp
            tailp += lastp2
            if tailp <= preaddp:
                break
        cur_succ_t1 = float(succ + 1)
        cur_fail_t1 = float(obs - succ)
        while cur_fail_t1 > 0.5:
            lastp1 *= cur_fail_t1 / cur_succ_t1
            preaddp = tailp
            tailp += lastp1
            if tailp <= preaddp:
                break
            cur_succ_t1 += 1
            cur_fail_t1 -= 1
    else:
        while cur_fail_t2 > 0.5:
            cur_succ_t2 += 1
            lastp2 *= cur_fail_t2 / cur_succ_t2
            cur_fail_t2 -= 1
            if lastp2 < EXACT_TEST_BIAS:
                if lastp2 > (1 - 2 * SMALL_EPSILON) * EXACT_TEST_BIAS:
                    tie_ct += 1
                tailp += lastp2
                break
            centerp += lastp2
            if centerp == float("inf"):
                return 0.0
        if centerp == 0 and not midp:
            return 1.0
        while cur_fail_t2 > 0.5:
            cur_succ_t2 += 1
            lastp2 *= cur_fail_t2 / cur_succ_t2
            cur_fail_t2 -= 1
            preaddp = tailp
            tailp += lastp2
            if tailp <= preaddp:
                break
        cur_succ_t1 = float(succ)
        cur_fail_t1 = float(obs - succ)
        while cur_succ_t1 > 0.5:
            cur_fail_t1 += 1
            lastp1 *= cur_succ_t1 / cur_fail_t1
            preaddp = tailp
            tailp += lastp1
            if tailp <= preaddp:
                break
            cur_succ_t1 -= 1
    if not midp:
        return tailp / (tailp + centerp)
    return (tailp - ((1 - SMALL_EPSILON) * EXACT_TEST_BIAS * 0.5)
            * tie_ct) / (tailp + centerp)


FISHER_EPSILON = 0.0000000000009094947017729282379150390625


def fisher22(m11: int, m12: int, m21: int, m22: int, midp: bool) -> float:
    """2x2 Fisher exact test, PLINK 1.9 parity (fisher22,
    1.9/plink_stats.c:771): relative-likelihood walk from the observed
    table with EXACT_TEST_BIAS tie handling and optional mid-p."""
    tprob = (1 - FISHER_EPSILON) * EXACT_TEST_BIAS
    cur_prob = tprob
    cprob = 0.0
    tie_ct = 1
    if m12 > m21:
        m12, m21 = m21, m12
    if m11 > m22:
        m11, m22 = m22, m11
    if m11 * m22 > m12 * m21:
        m11, m12 = m12, m11
        m21, m22 = m22, m21
    cur11, cur12, cur21, cur22 = float(m11), float(m12), float(m21), \
        float(m22)
    while cur12 > 0.5:
        cur11 += 1
        cur22 += 1
        cur_prob *= (cur12 * cur21) / (cur11 * cur22)
        cur12 -= 1
        cur21 -= 1
        if cur_prob == float("inf"):
            return 0.0
        if cur_prob < EXACT_TEST_BIAS:
            if cur_prob > (1 - 2 * FISHER_EPSILON) * EXACT_TEST_BIAS:
                tie_ct += 1
            tprob += cur_prob
            break
        cprob += cur_prob
    if cprob == 0 and not midp:
        return 1.0
    while cur12 > 0.5:
        cur11 += 1
        cur22 += 1
        cur_prob *= (cur12 * cur21) / (cur11 * cur22)
        cur12 -= 1
        cur21 -= 1
        preaddp = tprob
        tprob += cur_prob
        if tprob <= preaddp:
            break
    if m11:
        cur11, cur12, cur21, cur22 = float(m11), float(m12), \
            float(m21), float(m22)
        cur_prob = (1 - FISHER_EPSILON) * EXACT_TEST_BIAS
        while True:
            cur12 += 1
            cur21 += 1
            cur_prob *= (cur11 * cur22) / (cur12 * cur21)
            cur11 -= 1
            cur22 -= 1
            preaddp = tprob
            tprob += cur_prob
            if tprob <= preaddp:
                if not midp:
                    return preaddp / (cprob + preaddp)
                return (preaddp - ((1 - FISHER_EPSILON)
                                   * EXACT_TEST_BIAS * 0.5)
                        * tie_ct) / (cprob + preaddp)
            if not cur11 > 0.5:
                break
    if not midp:
        return tprob / (cprob + tprob)
    return (tprob - ((1 - FISHER_EPSILON) * EXACT_TEST_BIAS * 0.5)
            * tie_ct) / (cprob + tprob)
