"""--blocks: Haploview-style Gabriel LD block detection, PLINK 1.9
parity.

Behavior reference: haploview_blocks / haploview_blocks_classify /
em_phase_hethet / cubic_real_roots (1.9/plink_ld.c:4897-5080,
6798-7710; 1.9/plink_common.c cubic_real_roots) and flag parsing
(1.9/plink.c --blocks*).

Clean-room notes: the reference's classifier takes aggressive early
exits through the 101-point D' likelihood surface; every exit is a
partial-sum bound on the same monotone totals, so evaluating the full
surface in the reference's summation order and applying the final
decision boundaries yields identical classes.  Likewise the narrowed
lowci bounds used for delta >= 2 only coarsen distinctions that the
downstream block rules never consult (verified case-by-case against
the delta<4 special rules).  The block-scan control flow (window
advance, futility pruning that caps the next marker's block size,
strong/rec running counts, candidate ordering by decreasing span then
decreasing start) is replicated exactly.
"""

from __future__ import annotations

import math

import numpy as np

from ..cli import FlagError
from ..dataset import Dataset
from ..utils.chrom import X_CODE, Y_CODE
from ..utils.fmt import dtoa_g
from ..utils.logging import RunLogger

EPSILON = 0.000000000931322574615478515625
SMALLISH_EPSILON = 0.00000000002910383045673370361328125
SMALL_EPSILON = 0.00000000000005684341886080801486968994140625


def cubic_real_roots(a, b, c):
    """All real roots of x^3+ax^2+bx+c, sorted, epsilon-deduped
    (1.9/plink_common.c cubic_real_roots)."""
    a2 = a * a
    qq = (a2 - 3 * b) * (1.0 / 9.0)
    rr = (2 * a2 * a - 9 * a * b + 27 * c) * (1.0 / 54.0)
    r2 = rr * rr
    q3 = qq * qq * qq
    adiv3 = a * (1.0 / 3.0)
    if r2 < q3:
        sq = math.sqrt(qq)
        dxx = math.acos(rr / (qq * sq)) * (1.0 / 3.0)
        sq *= -2
        sols = sorted([sq * math.cos(dxx) - adiv3,
                       sq * math.cos(dxx + (2.0 * math.pi / 3.0)) - adiv3,
                       sq * math.cos(dxx - (2.0 * math.pi / 3.0)) - adiv3])
        if sols[1] - sols[0] < EPSILON:
            sols = [sols[0], sols[2]]
            return sols[:1] if sols[1] - sols[0] < EPSILON else sols
        return sols[:2] if sols[2] - sols[1] < EPSILON else sols
    dxx = -((abs(rr) + math.sqrt(r2 - q3)) ** (1.0 / 3.0))
    if dxx == 0.0:
        return [-adiv3]
    if rr < 0.0:
        dxx = -dxx
    sq = qq / dxx
    s0 = dxx + sq - adiv3
    if abs(dxx - sq) >= (EPSILON * 8):
        return [s0]
    if dxx >= 0.0:
        return [-dxx - adiv3, s0]
    return [s0, -dxx - adiv3]


def _calc_lnlike(k11, k12, k21, k22, cc, f11, f12, f21, f22, hhs, incr):
    f11 = f11 + incr
    f22 = f22 + incr
    f12 = f12 + hhs - incr
    f21 = f21 + hhs - incr
    ln = cc * math.log(f11 * f22 + f12 * f21)
    if k11 != 0.0:
        ln += k11 * math.log(f11)
    if k12 != 0.0:
        ln += k12 * math.log(f12)
    if k21 != 0.0:
        ln += k21 * math.log(f21)
    if k22 != 0.0:
        ln += k22 * math.log(f22)
    return ln


def em_phase_hethet(known11, known12, known21, known22, center_ct,
                    want_onside=False):
    """1.9 em_phase_hethet: returns (fail, freq1x, freq2x, freqx1,
    freqx2, freq11, onside_sol_ct)."""
    center_ct_d = float(center_ct)
    twice_tot = known11 + known12 + known21 + known22 + 2 * center_ct_d
    onside_sol_ct = 1
    if twice_tot == 0.0:
        return True, 0, 0, 0, 0, 0, 1
    r = 1.0 / twice_tot
    f11 = known11 * r
    f12 = known12 * r
    f21 = known21 * r
    f22 = known22 * r
    prod_1122 = f11 * f22
    prod_1221 = f12 * f21
    hhs = center_ct_d * r
    freq1x = f11 + f12 + hhs
    freq2x = 1.0 - freq1x
    freqx1 = f11 + f21 + hhs
    freqx2 = 1.0 - freqx1
    if center_ct:
        if prod_1122 != 0.0 or prod_1221 != 0.0:
            sols = cubic_real_roots(
                0.5 * (f11 + f22 - f12 - f21 - 3 * hhs),
                0.5 * (prod_1122 + prod_1221
                       + hhs * (f12 + f21 - f11 - f22 + hhs)),
                -0.5 * hhs * prod_1122)
            end = len(sols)
            start = 0
            while end and sols[end - 1] > hhs + SMALLISH_EPSILON:
                end -= 1
            while start < end and sols[start] < -SMALLISH_EPSILON:
                start += 1
            if start == end:
                sols = [0.0, hhs]
                start, end = 0, 2
            else:
                sols = sols[start:end]
                start, end = 0, len(sols)
                if sols[0] < 0:
                    sols[0] = 0.0
                if sols[-1] > hhs:
                    sols[-1] = hhs
        else:
            nz_xx = f11 + f22
            nz_xy = f12 + f21
            if (nz_xx + SMALLISH_EPSILON < hhs + nz_xy
                    and nz_xy + SMALLISH_EPSILON < hhs + nz_xx):
                sols = [0.0, (hhs + nz_xy - nz_xx) * 0.5, hhs]
            else:
                sols = [0.0, hhs]
            start, end = 0, len(sols)
        best_sol = sols[0]
        if len(sols) > 1:
            best_lnlike = _calc_lnlike(known11, known12, known21,
                                       known22, center_ct_d, f11, f12,
                                       f21, f22, hhs, best_sol)
            for incr in sols[1:]:
                cur = _calc_lnlike(known11, known12, known21, known22,
                                   center_ct_d, f11, f12, f21, f22,
                                   hhs, incr)
                if cur > best_lnlike:
                    # the reference overwrites cur_lnlike, not
                    # best_lnlike, here — replicate the quirk
                    best_sol = incr
        if want_onside and len(sols) > 1:
            if freqx1 * freq1x >= f11:
                dxx = freq1x * freqx1 - f11
                if dxx > hhs:
                    dxx = hhs
            else:
                dxx = 0.0
            ub = hhs
            if (f11 + best_sol) - freqx1 * freq1x >= 0.0:
                lbound = dxx + SMALLISH_EPSILON \
                    if best_sol > dxx + SMALLISH_EPSILON else dxx
                if best_sol < ub - SMALLISH_EPSILON:
                    ub = ub - SMALLISH_EPSILON
            else:
                lbound = SMALLISH_EPSILON \
                    if best_sol > SMALLISH_EPSILON else 0.0
                if best_sol < dxx - SMALLISH_EPSILON:
                    ub = dxx - SMALLISH_EPSILON
                else:
                    ub = dxx
            s0 = 0
            k = 0
            for k in range(len(sols)):
                if sols[k] < lbound:
                    s0 += 1
                if sols[k] > ub:
                    break
            else:
                k = len(sols)
            if k >= s0 + 2:
                onside_sol_ct = k - s0
        f11 += best_sol
    elif prod_1122 == 0.0 and prod_1221 == 0.0:
        return True, 0, 0, 0, 0, 0, 1
    return False, freq1x, freq2x, freqx1, freqx2, f11, onside_sol_ct


def _lnlike_quantile(k11, k12, k21, k22, udh, fx1, f1x, f2x, f11e,
                     denom, q):
    t11 = q * denom + f11e
    t12 = f1x - t11
    t21 = fx1 - t11
    t22 = f2x - t21
    if q == 100:
        t11 = max(t11, 1e-10)
        t12 = max(t12, 1e-10)
        t21 = max(t21, 1e-10)
        t22 = max(t22, 1e-10)
    return (k11 * math.log(t11) + k12 * math.log(t12)
            + k21 * math.log(t21) + k22 * math.log(t22)
            + udh * math.log(t11 * t22 + t12 * t21))


def classify_pair(counts, recomb_highci, strong_highci, strong_lowci,
                  strong_lowci_outer, is_x) -> int:
    """CI class 0-6 (haploview_blocks_classify, full-surface variant:
    same summation order, final decision boundaries, full lowci
    bounds)."""
    k11 = float(2 * counts[0] + counts[1] + counts[3])
    k12 = float(2 * counts[2] + counts[1] + counts[5])
    k21 = float(2 * counts[6] + counts[3] + counts[7])
    k22 = float(2 * counts[8] + counts[5] + counts[7])
    if is_x:
        k11 -= float(counts[9])
        k12 -= float(counts[11])
        k21 -= float(counts[12])
        k22 -= float(counts[14])
    fail, f1x, f2x, fx1, fx2, f11, _ = em_phase_hethet(
        k11, k12, k21, k22, counts[4], want_onside=False)
    if fail:
        return 1
    f11e = fx1 * f1x
    dxx = f11 - f11e
    if dxx < 0.0:
        k11, k12 = k12, k11
        k21, k22 = k22, k21
        f11e = fx2 * f1x
        fx1, fx2 = fx2, fx1
        dxx = -dxx
    dyy = min(fx1 * f2x, fx2 * f1x)
    denom = 0.01 * dyy
    udh = float(counts[4])
    center = int((dxx / dyy) * 100 + 0.5)
    lnlike1 = _lnlike_quantile(k11, k12, k21, k22, udh, fx1, f1x, f2x,
                               f11e, denom, center)
    total = 0.0
    highstrong = 0.0
    for q in range(100, recomb_highci - 1, -1):
        total += math.exp(_lnlike_quantile(
            k11, k12, k21, k22, udh, fx1, f1x, f2x, f11e, denom, q)
            - lnlike1)
        if q == strong_highci:
            highstrong = total * 20
    if total < (1.0 / 19.0):
        return 0
    highindiff = total * 20
    right_sum = {}
    for q in range(recomb_highci - 1, -1, -1):
        total += math.exp(_lnlike_quantile(
            k11, k12, k21, k22, udh, fx1, f1x, f2x, f11e, denom, q)
            - lnlike1)
        if total >= highindiff:
            return 0
        if 52 <= q <= 82:
            right_sum[q] = total
    if total >= highstrong:
        return 1
    t95 = total * 0.95
    if t95 < right_sum[strong_lowci]:
        return 5 if t95 >= right_sum[82] else 6
    if t95 >= right_sum[strong_lowci_outer]:
        return 2 if t95 >= right_sum[52] else 3
    return 4


def set_allele_freqs_19(ds: Dataset, codes_all) -> np.ndarray:
    """1.9 set_allele_freqs (A2 frequency over founders): diploid
    standard; chrX = nonmale diploid + male haploid with het males
    EXCLUDED; chrY = male haploid, hets excluded; other haploid = all
    founders, hets excluded (1.9/plink_filter.c:2295-2445).  Empty
    denominator -> 0.5."""
    from ..utils.chrom import MT_CODE

    founders = ds.founder_mask & ds.sample_mask
    male = ds.male_mask() & founders
    g = codes_all[:, : ds.raw_sample_ct]
    chrom = ds.vi.chrom

    def counts(mask):
        sub = g[:, mask]
        return ((sub == 0).sum(1), (sub == 1).sum(1), (sub == 2).sum(1))

    # our code 0 = hom REF = bed hom A2; code 2 = hom A1
    n0, n1, n2 = counts(founders)
    nm0, nm1, nm2 = counts(founders & ~ds.male_mask())
    m0, m1, m2 = counts(male)
    a2 = (2 * n0 + n1).astype(np.float64)
    tot = (2 * (n0 + n1 + n2)).astype(np.float64)
    is_x = chrom == X_CODE
    is_y = chrom == Y_CODE
    is_hap = is_x | is_y | (chrom == MT_CODE)
    a2 = np.where(is_x, (2 * nm0 + nm1) + m0, a2)
    tot = np.where(is_x, 2 * (nm0 + nm1 + nm2) + (m0 + m2), tot)
    a2 = np.where(is_y, m0, a2)
    tot = np.where(is_y, m0 + m2, tot)
    oth = is_hap & ~is_x & ~is_y
    a2 = np.where(oth, n0, a2)
    tot = np.where(oth, n0 + n2, tot)
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(tot > 0, a2 / tot, 0.5)


def run_blocks(ds: Dataset, cfg, log: RunLogger) -> None:
    mods = set(cfg.blocks or ())
    no_pheno_req = "no-pheno-req" in mods
    no_small_max_span = "no-small-max-span" in mods
    max_window_bp = (int(cfg.blocks_max_kb * 1000 * (1 + SMALL_EPSILON))
                     if cfg.blocks_max_kb is not None else 200000)
    max_bp1, max_bp2 = (20000, 30000) if not no_small_max_span \
        else (0x7FFFFFFF, 0x7FFFFFFF)
    min_maf = cfg.blocks_min_maf if cfg.blocks_min_maf is not None \
        else 0.05
    if cfg.blocks_strong_lowci is not None:
        v = cfg.blocks_strong_lowci
        strong_lowci_outer = 2 + int((v - SMALL_EPSILON) * 100)
        strong_lowci = 2 + int((v + SMALL_EPSILON) * 100)
        if strong_lowci_outer < 52 or strong_lowci > 82:
            raise FlagError(
                "--blocks-strong-lowci parameter currently must be in "
                "(0.5, 0.81).")
    else:
        strong_lowci_outer, strong_lowci = 71, 72
    if cfg.blocks_strong_highci is not None:
        strong_highci = int(
            (cfg.blocks_strong_highci - SMALL_EPSILON) * 100)
        if strong_highci < 83:
            raise FlagError(
                "--blocks-strong-highci parameter currently must be "
                "larger than 0.83.")
    else:
        strong_highci = 97
    if cfg.blocks_recomb_highci is not None:
        recomb_highci = int(
            (cfg.blocks_recomb_highci + SMALL_EPSILON) * 100) - 1
    else:
        recomb_highci = 89
    if recomb_highci > strong_highci:
        raise FlagError(
            "--blocks-recomb-highci value cannot be larger than "
            "--blocks-strong-highci value.")
    inform_frac = (cfg.blocks_inform_frac
                   if cfg.blocks_inform_frac is not None else 0.95) \
        + SMALLISH_EPSILON
    inform_thresh_two = 1 + int(3 * inform_frac)
    inform_thresh_three = int(6 * inform_frac)

    si, vi = ds.si, ds.vi
    founder_pnm = ds.founder_mask & ds.sample_mask
    if not no_pheno_req:
        pc = next(iter(si.phenos.values()), None)
        if pc is not None:
            founder_pnm = founder_pnm & pc.nonmiss
        else:
            founder_pnm = founder_pnm & False
    if founder_pnm.sum() < 2:
        log.log(
            "Warning: Skipping --blocks, since there are less than two "
            "founders with nonmissing phenotypes.")
        return
    male = ds.male_mask()

    from ..ops.pairwise import _unpack_np

    codes_all = _unpack_np(ds.all_packed())[:, : ds.raw_sample_ct]
    freqs = set_allele_freqs_19(ds, codes_all)
    vmask = ds.variant_mask.copy()
    if min_maf > 0.0:
        lo = min_maf * (1 - SMALL_EPSILON)
        vmask &= ~((freqs < lo) | (freqs > 1.0 - lo))
    if vmask.sum() < 2:
        log.log("Warning: Skipping --blocks since there are too few "
                "variants with MAF >= 0.05.")
        return

    fidx = np.flatnonzero(founder_pnm)
    male_f = male[fidx]

    out_blocks = open(cfg.out + ".blocks", "w")
    out_det = open(cfg.out + ".blocks.det", "w")
    out_det.write(" CHR          BP1          BP2           KB  NSNPS"
                  " SNPS\n")
    ci = vi.chr_info
    block_ct = 0
    maxspan = 0

    # chromosome blocks in file order
    chrom_arr = vi.chrom
    boundaries = [0] + list(
        np.flatnonzero(np.diff(chrom_arr) != 0) + 1) + [len(chrom_arr)]
    for bi in range(len(boundaries) - 1):
        lo, hi = boundaries[bi], boundaries[bi + 1]
        chrom = int(chrom_arr[lo])
        vsel = np.flatnonzero(vmask[lo:hi]) + lo
        if vsel.size < 2:
            continue
        is_x = chrom == X_CODE
        is_y = chrom == Y_CODE
        is_haploid = chrom in (X_CODE, Y_CODE, 26)
        # bed-order classes (homA1, het, homA2).  haploview_blocks loads
        # with do_reverse=0 (1.9/plink_ld.c:7399), i.e. raw .bed codes:
        # bed hom-A1 = our ALT-dosage 2, so flip unconditionally.
        raw = codes_all[vsel][:, fidx].astype(np.int8)
        g = np.where(raw == 3, 3, 2 - raw).astype(np.int8)
        if is_haploid:
            g = g.copy()
            if is_x:
                g[(g == 1) & male_f[None, :]] = 3
            elif is_y:
                g[:, ~male_f] = 3
                g[g == 1] = 3
            else:
                g[g == 1] = 3
        pos = vi.pos[vsel].astype(np.int64)
        M = vsel.size

        cache: dict = {}

        def classify(i, j):
            key = (i, j)
            r = cache.get(key)
            if r is not None:
                return r
            gi = g[i]
            gj = g[j]
            ok = (gi != 3) & (gj != 3)
            # rows = marker j's class, cols = marker i's class, in the
            # reference's (index=new marker, window=old) orientation:
            # index marker is the NEWER one (j), window the older (i)
            cnt = np.zeros(15, np.int64)
            c = np.bincount((gj[ok] * 3 + gi[ok]).astype(np.int64),
                            minlength=9)
            cnt[:9] = c
            if is_x:
                okm = ok & male_f
                cm = np.bincount(
                    (gj[okm] * 3 + gi[okm]).astype(np.int64),
                    minlength=9)
                cnt[9] = cm[0]
                cnt[10] = 0
                cnt[11] = cm[2]
                cnt[12] = cm[6]
                cnt[13] = 0
                cnt[14] = cm[8]
            r = classify_pair(cnt, recomb_highci, strong_highci,
                              strong_lowci, strong_lowci_outer, is_x)
            cache[key] = r
            return r

        # forward block sizes via two-pointer.  NOTE: the reference's
        # scan advances while pos[fwd] <= thresh, so fwd lands one
        # marker PAST the window (unless it hits the chromosome end)
        # and the stored size includes that overshoot; the value only
        # feeds the futility threshold, but we replicate it exactly
        # because pruning decisions change the candidate list.
        fwd_sizes = np.empty(M, np.int64)
        jptr = 0
        for m in range(M):
            if jptr < m:
                jptr = m
            while jptr + 1 < M and pos[jptr] <= pos[m] + max_window_bp:
                jptr += 1
            fwd_sizes[m] = jptr + 1 - m

        S = np.zeros(M, np.int64)
        R = np.zeros(M, np.int64)
        recent = [0, 0, 0, 0, 0]
        candidates = []
        block_idx_first = 0
        cur_block_size = 0
        for m in range(M):
            pos_thresh = pos[m] - max_window_bp
            while pos_thresh > pos[block_idx_first]:
                block_idx_first += 1
            last_block_size = cur_block_size
            cur_block_size = m - block_idx_first
            recent[4] = recent[2]
            recent[2] = recent[0]
            recent[3] = recent[1]
            if cur_block_size > last_block_size:
                cur_block_size = last_block_size + 1
            if not cur_block_size:
                continue
            ulii = int(fwd_sizes[m - cur_block_size: m + 1].max())
            futility_rec = 1 + int(
                float(ulii * (ulii - 1) // 2) * (1.0 - inform_frac))
            cur_strong = 0
            cur_rec = 0
            for delta in range(1, cur_block_size + 1):
                partner = m - delta
                if delta >= 4:
                    prev_rec = R[partner]
                    if cur_rec + prev_rec >= futility_rec:
                        cur_block_size = delta - 1
                        break
                    prev_strong = S[partner]
                t = classify(partner, m)
                if t > 4:
                    cur_strong += 1
                elif not t:
                    cur_rec += 1
                if delta == 1:
                    recent[0] = t
                    if t == 6 and pos[m] - pos[partner] <= max_bp1:
                        candidates.append(
                            (int(pos[m] - pos[partner]),
                             int(vsel[partner]), int(vsel[m])))
                elif delta == 2:
                    recent[1] = t
                    if t >= 4 and pos[m] - pos[partner] <= max_bp2:
                        uii = 1
                        if recent[0] >= 3:
                            uii += 1
                        if recent[2] >= 3:
                            uii += 1
                        if uii >= inform_thresh_two:
                            candidates.append(
                                (int(pos[m] - pos[partner]),
                                 int(vsel[partner]), int(vsel[m])))
                elif delta == 3:
                    prev_strong = 1 if t > 4 else 0
                    prev_rec = 1 if not t else 0
                    uii = 0
                    for rt in recent:
                        if rt >= 3:
                            uii += 1
                            if rt > 4:
                                prev_strong += 1
                        elif not rt:
                            prev_rec += 1
                    S[partner] = prev_strong
                    R[partner] = prev_rec
                    if t >= 4 and uii >= inform_thresh_three:
                        candidates.append(
                            (int(pos[m] - pos[partner]),
                             int(vsel[partner]), int(vsel[m])))
                else:
                    prev_strong += cur_strong
                    prev_rec += cur_rec
                    S[partner] = prev_strong
                    R[partner] = prev_rec
                    tot = prev_strong + prev_rec
                    if t >= 4 and tot >= 6 \
                            and tot * inform_frac < float(prev_strong):
                        candidates.append(
                            (int(pos[m] - pos[partner]),
                             int(vsel[partner]), int(vsel[m])))
        if not candidates:
            continue
        candidates.sort(key=lambda x: (-x[0], -x[1], -x[2]))
        if candidates[0][0] > maxspan:
            maxspan = candidates[0][0]
        in_block = np.zeros(ds.raw_variant_ct, bool)
        final = []
        for span, u1, u2 in candidates:
            if in_block[u1] or in_block[u2]:
                continue
            final.append((u1, u2))
            in_block[u1: u2 + 1] = True
        final.sort(key=lambda x: (x[1], x[0]))
        cname = ci.name19(chrom).rjust(4) + "   "
        for u1, u2 in final:
            ids = [str(vi.vid[u]) for u in range(u1, u2 + 1) if vmask[u]]
            out_blocks.write("*" + "".join(" " + s for s in ids) + "\n")
            kb = (int(vi.pos[u2]) + 1 - int(vi.pos[u1])) * 0.001
            out_det.write(
                cname + str(int(vi.pos[u1])).rjust(10) + "   "
                + str(int(vi.pos[u2])).rjust(10) + " "
                + dtoa_g(kb).rjust(12) + " " + str(len(ids)).rjust(6)
                + " " + "|".join(ids) + "\n")
        block_ct += len(final)
    out_blocks.close()
    out_det.close()
    log.log(f"--blocks: {block_ct} haploblock"
            f"{'' if block_ct == 1 else 's'} written to "
            f"{cfg.out}.blocks .")
    log.log(f"Extra block details written to {cfg.out}.blocks.det .")
    if block_ct:
        log.log(f"Longest span: {dtoa_g((maxspan + 1) * 0.001)}kb.")
