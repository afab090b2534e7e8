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
