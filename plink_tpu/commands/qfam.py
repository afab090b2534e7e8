"""--qfam family-based QT association (permutation test), PLINK 1.9
parity.

Behavior reference: qfam / qfam_thread / qfam_compute_bw / flip_precalc
/ qfam_regress / get_sibship_info / uint32_permute
(1.9/plink_family.c:2547-2745,4973-5960).

Genotypes are decomposed into between-family (B) and within-family (W)
components; --qfam/-parents permute the sign of W per family,
--qfam-between/-total permute family labels of B (with sign flips for
total).  Original stats go to <out>.qfam.<suffix>; empirical p-values
(adaptive or fixed mperm, batch-generated from the shared SFMT stream)
to <out>.qfam.<suffix>.perm.  Byte-identical to 1.9 under --seed.
"""

from __future__ import annotations

import math

import numpy as np

from ..cli import FlagError
from ..dataset import Dataset
from ..stats.perm19 import master_sfmt
from ..utils.chrom import MT_CODE, X_CODE, Y_CODE
from ..utils.logging import RunLogger
from .homozyg import _fw_width
from .assoc19 import _fw, _g4
from .family import _bed_codes, _erase_mendel, build_trios_19
from .qassoc import calc_tprob

EPSILON = 0.000000000931322574615478515625
SMALL_EPSILON = 0.00000000000005684341886080801486968994140625
MODEL_BLOCKSIZE = 256  # batching only; no output effect


def _uint32_permute(sfmt, mods_shifted, ct):
    """uint32_permute (1.9/plink_family.c:4973).  The caller passes
    &precomputed_mods[-1] (plink_family.c:5724), so the rejection bound
    for write_idx w is 2^32 % w (one entry early), and for w == 1 it is
    the 4 bytes BEFORE the mods array: after a batch whose flip fill
    exactly covered the 64-byte-aligned flip buffer, that is the last
    flip uint32 drawn (mods_shifted[0] tracks this carry)."""
    arr = np.zeros(ct, np.int64)
    for wi in range(1, ct):
        lbound = mods_shifted[wi - 1]
        while True:
            urand = sfmt.genrand_uint32()
            if urand >= lbound:
                break
        urand %= wi + 1
        arr[wi] = arr[urand]
        arr[urand] = wi
    return arr


def _draw_flip_bits(sfmt, fss_ctl):
    """fss_ctl 64-bit words built from 2*fss_ctl uint32 draws."""
    words = []
    for _ in range(fss_ctl):
        lo = sfmt.genrand_uint32()
        hi = sfmt.genrand_uint32()
        words.append(lo | (hi << 32))
    return words


def _bits_of(words, n):
    out = np.zeros(n, bool)
    for i in range(n):
        if (words[i >> 6] >> (i & 63)) & 1:
            out[i] = True
    return out


class _SibshipInfo:
    """get_sibship_info, qfam branch (1.9/plink_family.c:2547)."""

    def __init__(self, ds, trios, fams, test_type):
        si = ds.si
        nraw = ds.raw_sample_ct
        inc = np.flatnonzero(ds.sample_mask[:nraw])
        uidx_to_c = {int(u): k for k, u in enumerate(inc)}
        n = inc.size
        pc = next(iter(si.phenos.values()))
        pheno_nm = (pc.nonmiss & ds.sample_mask)[:nraw]
        founder = ds.founder_mask[:nraw]
        is_within2 = test_type == "parents"
        not_in_family = np.zeros(nraw, bool)
        not_in_family[inc] = True
        double_parent = np.zeros(nraw, bool)
        is_child = np.zeros(nraw, bool)
        tmp_w2f = np.zeros(nraw, bool)
        s2f = np.full(n, -1, np.int64)
        fss_contents = []
        fs_sizes = []
        for fam_idx, (dad, mom, kids) in enumerate(fams):
            for p in (dad, mom):
                fss_contents.append(uidx_to_c[p])
                if is_within2 and pheno_nm[dad] and pheno_nm[mom]:
                    tmp_w2f[p] = True
                if not_in_family[p]:
                    if s2f[uidx_to_c[p]] == -1:
                        s2f[uidx_to_c[p]] = fam_idx
                    not_in_family[p] = False
                else:
                    double_parent[p] = True
            for c in kids:
                fss_contents.append(uidx_to_c[c])
                s2f[uidx_to_c[c]] = fam_idx
                is_child[c] = True
            fs_sizes.append(2 + len(kids))
        family_ct = len(fams)
        not_in_family &= ~is_child
        double_parent &= ~is_child
        if is_within2:
            tmp_w2f &= ~double_parent
            tmp_w2f &= founder
            self.lm_within2_founder = tmp_w2f[inc]
        else:
            self.lm_within2_founder = None
        elig = pheno_nm & ~double_parent
        if test_type == "within":
            elig &= ~founder
        self.lm_eligible = elig[inc]
        # sibships among non-founder non-trio members
        cand = np.flatnonzero(not_in_family & ~founder)
        groups: dict[tuple, list] = {}
        for u in cand:
            u = int(u)
            key = (str(si.fid[u]), str(si.pat[u]), str(si.mat[u]))
            groups.setdefault(key, []).append(u)
        fs_idx = family_ct
        for key in sorted(groups,
                          key=lambda k: k[0] + "\t" + k[1] + "\t"
                          + k[2]):
            mem = groups[key]
            if len(mem) < 2:
                continue
            for u in mem:
                fss_contents.append(uidx_to_c[u])
                s2f[uidx_to_c[u]] = fs_idx
                not_in_family[u] = False
            fs_sizes.append(len(mem))
            fs_idx += 1
        self.fs_ct = fs_idx
        singles = np.flatnonzero(not_in_family)
        for k, u in enumerate(singles):
            fss_contents.append(uidx_to_c[int(u)])
            s2f[uidx_to_c[int(u)]] = fs_idx + k
        self.singleton_ct = singles.size
        self.fss_ct = self.fs_ct + self.singleton_ct
        self.family_ct = family_ct
        self.fss_contents = np.array(fss_contents, np.int64)
        self.fs_starts = np.concatenate(
            ([0], np.cumsum(fs_sizes))).astype(np.int64)
        lm_idx = np.flatnonzero(self.lm_eligible)
        self.lm_ct = lm_idx.size
        self.lm_idx = lm_idx                       # collapsed idx per lm
        self.sample_lm_to_fss_idx = s2f[lm_idx]
        self.inc = inc


def _compute_bw(g, info, pheno_d2, qt_sum_all, qt_ssq_all, w2f_c):
    """qfam_compute_bw: g = bed codes over collapsed samples
    (0=homA1,1=missing,2=het,3=homA2).  Returns (b, w, nm_fss, nm_lm,
    qt_sum, qt_ssq)."""
    fss_ct = info.fss_ct
    b = np.zeros(fss_ct)
    nm_fss = np.ones(fss_ct, bool)
    fssc = info.fss_contents
    starts = info.fs_starts
    gp = np.where(g == 0, 1, g).astype(np.int64)   # ulii + (ulii==0)
    for fam_idx in range(info.family_ct):
        s0 = int(starts[fam_idx])
        s1 = int(starts[fam_idx + 1])
        gf = int(g[fssc[s0]])
        gm = int(g[fssc[s0 + 1]])
        if gf != 1 and gm != 1:
            b[fam_idx] = 0.5 * (4 - (int(gp[fssc[s0]])
                                     + int(gp[fssc[s0 + 1]])))
        else:
            kids = fssc[s0 + 2:s1]
            gk = g[kids]
            nmk = gk != 1
            sib_ct = int(nmk.sum())
            if sib_ct:
                tot = int(gp[kids][nmk].sum())
                b[fam_idx] = float(2 * sib_ct - tot) / sib_ct
            else:
                nm_fss[fam_idx] = False
    for fs_idx in range(info.family_ct, info.fs_ct):
        s0 = int(starts[fs_idx])
        s1 = int(starts[fs_idx + 1])
        mem = fssc[s0:s1]
        gk = g[mem]
        nmk = gk != 1
        sib_ct = int(nmk.sum())
        if sib_ct:
            tot = int(gp[mem][nmk].sum())
            b[fs_idx] = float(2 * sib_ct - tot) / sib_ct
        else:
            nm_fss[fs_idx] = False
    base = int(starts[info.fs_ct])
    for k in range(info.singleton_ct):
        c = fssc[base + k]
        if g[c] != 1:
            b[info.fs_ct + k] = float(2 - int(gp[c]))
        else:
            nm_fss[info.fs_ct + k] = False
    w = np.zeros(info.lm_ct)
    nm_lm = np.ones(info.lm_ct, bool)
    qt_sum = qt_sum_all
    qt_ssq = qt_ssq_all
    for li in range(info.lm_ct):
        c = int(info.lm_idx[li])
        gl = int(g[c])
        ok = gl != 1
        if ok:
            fss_idx = int(info.sample_lm_to_fss_idx[li])
            if not nm_fss[fss_idx]:
                ok = False
            elif w2f_c is not None and w2f_c[c]:
                s0 = int(starts[fss_idx])
                p0 = int(info.fss_contents[s0])
                partner = int(info.fss_contents[s0 + 1]) \
                    if p0 == c else p0
                if int(g[partner]) == 1:
                    ok = False
        if ok:
            w[li] = float(2 - int(gp[c])) - b[fss_idx]
        else:
            d = pheno_d2[li]
            qt_sum -= d
            qt_ssq -= d * d
            nm_lm[li] = False
    return b, w, nm_fss, nm_lm, qt_sum, qt_ssq


def run_qfam(ds: Dataset, cfg, log: RunLogger) -> None:
    test_type, mods = cfg.qfam
    perm_adapt = "perm" in mods
    mperm_val = None
    for m in mods:
        if m.startswith("mperm="):
            mperm_val = int(m.split("=", 1)[1])
    if not perm_adapt and mperm_val is None:
        raise FlagError(
            "--qfam-" + test_type + " requires permutation.")
    perm_count = "perm-count" in mods
    emp_se = "emp-se" in mods
    only_within = test_type in ("within", "parents")
    suffix = {"within": "within", "parents": "parents",
              "total": "total", "between": "between"}[test_type]
    test_str = {"within": "WITH ", "parents": "WITH ",
                "total": " TOT ", "between": " BET "}[test_type]
    si, vi = ds.si, ds.vi
    pc = next(iter(si.phenos.values()), None)
    if pc is None or pc.kind != "qt":
        raise FlagError("--qfam requires a scalar phenotype.")

    inc_v = np.flatnonzero(ds.variant_mask)
    chrom_v = vi.chrom[inc_v]
    nonauto = np.isin(chrom_v, (X_CODE, Y_CODE, MT_CODE))
    n_excl = int(nonauto.sum())
    if n_excl:
        log.log(f"Excluding {n_excl} X/MT/haploid variant"
                f"{'' if n_excl == 1 else 's'} from QFAM test.")
        if n_excl == inc_v.size:
            raise FlagError("No variants remaining for QFAM analysis.")
        inc_v = inc_v[~nonauto]
    trios, fams = build_trios_19(ds)
    info = _SibshipInfo(ds, trios, fams, test_type)
    if info.fss_ct < 2:
        raise FlagError("QFAM test requires at least two families.")
    if info.lm_ct < 3:
        raise FlagError(
            f"Less than three eligible "
            f"{'nonfounder' if test_type == 'within' else 'sample'}s "
            f"for QFAM test.")

    from .basic_reports import alt_allele_freqs

    af = alt_allele_freqs(ds, founders_only=True)
    a1_is_alt = (~(af > 0.5))[inc_v]
    male = ds.male_mask()[: ds.raw_sample_ct]
    bed = _bed_codes(ds, inc_v, a1_is_alt)
    bed = _erase_mendel(bed, trios, male, None)
    bed_c = bed[:, info.inc]        # collapsed samples
    M = inc_v.size

    pheno_raw = pc.data[: ds.raw_sample_ct]
    pheno_d2 = np.array(
        [float(pheno_raw[info.inc[c]])
         for c in np.flatnonzero(info.lm_eligible)])
    qt_sum_all = 0.0
    qt_ssq_all = 0.0
    for d in pheno_d2:
        qt_sum_all += d
        qt_ssq_all += d * d

    fss_ct = info.fss_ct
    fss_ctl = (fss_ct + 63) // 64
    lm_ct = info.lm_ct
    # shifted bounds (see _uint32_permute); slot 0 is the carried
    # "mods[-1]" value, initially 0 (untouched bigstack memory)
    mods_arr = [0] + [(1 << 32) % k for k in range(2, fss_ct)]
    s2f = info.sample_lm_to_fss_idx
    w2f_c = None
    if info.lm_within2_founder is not None:
        w2f_c = info.lm_within2_founder

    # aperm state
    if perm_adapt:
        ap_min, ap_max = cfg.aperm[0], cfg.aperm[1]
        ap_alpha, ap_beta = cfg.aperm[2], cfg.aperm[3]
        ap_init, ap_slope = cfg.aperm[4], cfg.aperm[5]
        perms_total = ap_max
        from .cluster import _ltqnorm

        adaptive_ci_zt = _ltqnorm(1 - ap_beta / (2.0 * M))
        first_adapt_check = int(ap_init) if ap_min < ap_init \
            else ap_min
    else:
        perms_total = mperm_val
        first_adapt_check = perms_total + 1
        ap_init = ap_slope = ap_alpha = 0.0
        adaptive_ci_zt = 0.0
    perm_batch = min(cfg.perm_batch_size or 512, perms_total)

    # per-marker precompute + original stats
    out = cfg.out + ".qfam." + suffix
    maxsnp = _fw_width(len(str(vi.vid[i])) for i in inc_v)
    ci = vi.chr_info
    log.log(f"--qfam-{suffix}: Permuting {fss_ct} "
            f"families/singletons, and including {lm_ct} people in "
            f"linear regression.")
    fh = open(out, "w")
    fh.write(" CHR " + "SNP".rjust(maxsnp)
             + "         BP   A1       TEST     NIND       BETA"
             "         STAT        RAW_P\n")
    precomp = []
    orig_stat = np.full(M, -9.0)
    orig_beta = np.zeros(M)
    adapt_stop = np.zeros(M, bool)
    attempt_ct = np.full(M, perms_total, np.int64)
    alt1 = vi.alt1()
    regress_fail_ct = 0
    for mi in range(M):
        v = int(inc_v[mi])
        g = bed_c[mi]
        b, w, nm_fss, nm_lm, qt_sum, qt_ssq = _compute_bw(
            g, info, pheno_d2, qt_sum_all, qt_ssq_all, w2f_c)
        nind = int(nm_lm.sum())
        nind_recip = 1.0 / nind if nind else 0.0
        if only_within:
            gs, gq, qp, nm_lm = _flip_precalc(w, pheno_d2, nm_lm)
        else:
            gs = gq = qp = 0.0
        precomp.append((b, w, nm_fss, nm_lm, qt_sum, qt_ssq, nind,
                        nind_recip, gs, gq, qp))
        a1s = str(alt1[v]) if a1_is_alt[mi] else str(vi.ref[v])
        line = (ci.name19(int(vi.chrom[v])).rjust(4) + " "
                + _fw(str(vi.vid[v]), maxsnp) + " "
                + str(int(vi.pos[v])).rjust(10) + " "
                + _fw(a1s, 4) + "       " + test_str
                + str(nind).rjust(8) + " ")
        res = _regress(test_type, nind, lm_ct, s2f, nm_lm, pheno_d2,
                       b, w, None, None, nind_recip, qt_sum, qt_ssq,
                       gs, gq, qp)
        if res is not None:
            beta, tstat = res
            line += (_g4(beta, 10) + " " + _g4(tstat, 12) + " "
                     + _g4(calc_tprob(tstat, nind - 2), 12) + "\n")
            orig_beta[mi] = beta
            orig_stat[mi] = abs(tstat)
        else:
            line += "        NA           NA           NA\n"
            adapt_stop[mi] = True
            regress_fail_ct += 1
        fh.write(line)
    fh.close()
    log.log(f"Writing report to {out} ... done.")
    if regress_fail_ct:
        log.log(f"{regress_fail_ct} regression failure"
                f"{'' if regress_fail_ct == 1 else 's'} (excluding "
                f"th{'is' if regress_fail_ct == 1 else 'ese'} from "
                "permutation test.)")

    success_2ct = np.zeros(M, np.int64)
    beta_sum = np.zeros(M)
    beta_ssq = np.zeros(M)
    beta_fail = np.zeros(M, np.int64)
    sfmt = master_sfmt(cfg)
    perms_done = 0
    fac = first_adapt_check
    while True:
        cur_perm_ct = perm_batch
        if perm_adapt and perms_done:
            while fac <= perms_done:
                fac += int(ap_init + fac * ap_slope)
        if cur_perm_ct > perms_total - perms_done:
            cur_perm_ct = perms_total - perms_done
        # ---- batch permutation generation (shared stream) ----
        if only_within:
            flips = np.zeros((cur_perm_ct, lm_ct), bool)
            for p in range(cur_perm_ct):
                words = _draw_flip_bits(sfmt, fss_ctl)
                fbits = _bits_of(words, fss_ct)
                flips[p] = fbits[s2f]
            permutes = None
        else:
            permutes = np.zeros((cur_perm_ct, fss_ct), np.int64)
            for p in range(cur_perm_ct):
                permutes[p] = _uint32_permute(sfmt, mods_arr, fss_ct)
            flips = np.zeros((cur_perm_ct, fss_ct), bool)
            words = None
            for p in range(cur_perm_ct):
                words = _draw_flip_bits(sfmt, fss_ctl)
                flips[p] = _bits_of(words, fss_ct)
            # reference quirk: uint32_permute reads the 4 bytes before
            # precomputed_mods[] as the write_idx==1 rejection bound;
            # when a batch's flip fill exactly covers the 64-byte-
            # aligned flip buffer, those bytes hold the batch's final
            # flip draw (1.9/plink_family.c:5724,5640-5650)
            if words is not None and cur_perm_ct == perm_batch \
                    and (perm_batch * fss_ctl * 8) % 64 == 0:
                mods_arr[0] = (words[-1] >> 32) & 0xFFFFFFFF
        # ---- per-marker permutation stats ----
        for mi in range(M):
            if adapt_stop[mi]:
                continue
            (b, w, nm_fss, nm_lm, qt_sum, qt_ssq, nind, nind_recip,
             gs, gq, qp) = precomp[mi]
            stat_high = orig_stat[mi] + EPSILON
            stat_low = orig_stat[mi] - EPSILON
            s2s = int(success_2ct[mi])
            s2i = 0
            nac = fac
            cur_bsum = 0.0
            cur_bssq = 0.0
            cur_bfail = 0
            cur_fss_ct = int(nm_fss.sum())
            betas, tstats, fails = _batch_stats(
                test_type, nind, lm_ct, s2f, nm_lm, pheno_d2, b, w,
                permutes, flips, nind_recip, qt_sum, qt_ssq, gs, gq,
                qp, nm_fss, cur_fss_ct, fss_ct)
            pidx = 0
            while pidx < cur_perm_ct:
                if fails[pidx]:
                    s2i += 2
                    cur_bfail += 1
                else:
                    bb = betas[pidx]
                    cur_bsum += bb
                    cur_bssq += bb * bb
                    ts = abs(tstats[pidx])
                    if ts > stat_high:
                        s2i += 2
                    elif ts > stat_low:
                        s2i += 1
                pidx += 1
                if pidx == nac - perms_done:
                    uii = s2s + s2i
                    if uii:
                        pval = (uii + 2) / (2 * (nac + 1))
                        dxx = adaptive_ci_zt * math.sqrt(
                            pval * (1 - pval) / nac)
                        if (pval - dxx > ap_alpha) \
                                or (pval + dxx < ap_alpha):
                            adapt_stop[mi] = True
                            attempt_ct[mi] = nac
                            break
                    nac += int(ap_init + nac * ap_slope)
            success_2ct[mi] += s2i
            if emp_se:
                beta_sum[mi] += cur_bsum
                beta_ssq[mi] += cur_bssq
                beta_fail[mi] += cur_bfail
        perms_done += cur_perm_ct
        if perms_done == perms_total:
            break

    outp = out + ".perm"
    fh = open(outp, "w")
    if emp_se:
        fh.write(" CHR " + "SNP".rjust(maxsnp)
                 + "         BETA     EMP_BETA       EMP_SE"
                 "         EMP1           NP \n")
    else:
        fh.write(" CHR " + "SNP".rjust(maxsnp)
                 + "         EMP1           NP \n")
    for mi in range(M):
        v = int(inc_v[mi])
        line = (ci.name19(int(vi.chrom[v])).rjust(4) + " "
                + _fw(str(vi.vid[v]), maxsnp) + " ")
        if orig_stat[mi] == -9:
            if emp_se:
                line += ("          NA           NA           NA "
                         "          NA           NA\n")
            else:
                line += "          NA           NA\n"
        else:
            uii = int(success_2ct[mi])
            ujj = int(attempt_ct[mi])
            if emp_se:
                line += _g4(orig_beta[mi], 12) + " "
                ukk = ujj - int(beta_fail[mi])
                if ukk <= 1:
                    line += "          NA "
                else:
                    dxx = beta_sum[mi] / ukk
                    line += _g4(dxx, 12) + " "
                    dxx2 = math.sqrt(
                        (beta_ssq[mi] - beta_sum[mi] * dxx)
                        / (ukk - 1))
                    line += _g4(dxx2, 12) + " "
            if not perm_count:
                dxx = (uii + 2) / (2 * (ujj + 1))
            else:
                dxx = uii * 0.5
            line += _g4(dxx, 12) + "   " + str(ujj).rjust(10) + "\n"
        fh.write(line)
    fh.close()
    log.log(f"Permutation test report written to {outp} .")


def _flip_precalc(w, pheno_d2, nm_lm):
    """flip_precalc: also drops |W| < SMALL_EPSILON samples."""
    nm = nm_lm.copy()
    geno_sum = 0.0
    geno_ssq = 0.0
    qt_g_prod = 0.0
    for i in np.flatnonzero(nm):
        cw = w[i]
        if abs(cw) < SMALL_EPSILON:
            nm[i] = False
        else:
            geno_sum += cw
            geno_ssq += cw * cw
            qt_g_prod += cw * pheno_d2[i]
    return geno_sum * 0.5, geno_ssq, qt_g_prod * 0.5, nm


def _regress(test_type, nind, lm_ct, s2f, nm_lm, pheno_d2, b, w,
             permute, flip, nind_recip, qt_sum, qt_ssq, geno_sum,
             geno_ssq, qt_g_prod):
    """qfam_regress, scalar (used for the original stats; permute/flip
    None = identity/no-flip)."""
    if nind < 3:
        return None
    if test_type in ("within", "parents"):
        if flip is not None:
            for i in np.flatnonzero(nm_lm & flip):
                dxx = -w[i]
                geno_sum += dxx
                qt_g_prod += dxx * pheno_d2[i]
        geno_sum *= 2
        qt_g_prod *= 2
    else:
        geno_sum = 0.0
        geno_ssq = 0.0
        qt_g_prod = 0.0
        for i in np.flatnonzero(nm_lm):
            fss_idx = int(s2f[i]) if permute is None \
                else int(permute[int(s2f[i])])
            cur = b[fss_idx]
            if test_type == "total":
                dxx = w[i]
                if flip is not None and flip[fss_idx]:
                    cur -= dxx
                else:
                    cur += dxx
            geno_sum += cur
            geno_ssq += cur * cur
            qt_g_prod += cur * pheno_d2[i]
    qt_mean = qt_sum * nind_recip
    geno_mean = geno_sum * nind_recip
    dxx = 1.0 / (nind - 1)
    qt_var = (qt_ssq - qt_sum * qt_mean) * dxx
    geno_var = (geno_ssq - geno_sum * geno_mean) * dxx
    if geno_var == 0.0:
        return None
    qt_g_covar = (qt_g_prod - qt_sum * geno_mean) * dxx
    dxx = 1.0 / geno_var
    beta = qt_g_covar * dxx
    dxx = qt_var * dxx - beta * beta
    with np.errstate(invalid="ignore", divide="ignore"):
        tstat = float(beta * np.sqrt(np.float64(nind - 2)
                                     / np.float64(dxx)))
    return beta, tstat


def _edit_permute(perm, nm_fss, fss_ct, cur_fss_ct):
    """Cycle-walk so nonmissing families map to nonmissing families
    (1.9/plink_family.c:5337-5356)."""
    buf = perm.copy()
    orig = -1
    for _ in range(cur_fss_ct):
        orig += 1
        while not nm_fss[orig]:
            orig += 1
        new = int(buf[orig])
        if nm_fss[new]:
            continue
        while True:
            nxt = int(buf[new])
            buf[new] = new
            if nm_fss[nxt]:
                break
            new = nxt
        buf[orig] = nxt
    return buf


def _batch_stats(test_type, nind, lm_ct, s2f, nm_lm, pheno_d2, b, w,
                 permutes, flips, nind_recip, qt_sum, qt_ssq,
                 geno_sum0, geno_ssq0, qt_g_prod0, nm_fss, cur_fss_ct,
                 fss_ct):
    """Vectorized qfam_regress over a permutation batch (exact float
    order: per-perm accumulation over samples is a sequential cumsum;
    inserting exact-zero terms for unselected samples does not change
    the partial sums)."""
    P = flips.shape[0]
    if nind < 3:
        return (np.zeros(P), np.zeros(P), np.ones(P, bool))
    nm = nm_lm
    if test_type in ("within", "parents"):
        sel = flips[:, :lm_ct] & nm[None, :]
        wneg = -w
        # seed the sequential accumulation with the precomputed base so
        # the rounding chain is (base + d1) + d2 + ... as in the
        # reference
        gdelta = np.empty((P, lm_ct + 1))
        gdelta[:, 0] = geno_sum0
        gdelta[:, 1:] = np.where(sel, wneg[None, :], 0.0)
        qdelta = np.empty((P, lm_ct + 1))
        qdelta[:, 0] = qt_g_prod0
        qdelta[:, 1:] = np.where(sel, (wneg * pheno_d2)[None, :], 0.0)
        gsum = np.cumsum(gdelta, axis=1)[:, -1] * 2
        qprod = np.cumsum(qdelta, axis=1)[:, -1] * 2
        gssq = np.full(P, geno_ssq0)
    else:
        lm_sel = np.flatnonzero(nm)
        base_f = s2f[lm_sel]
        if cur_fss_ct != fss_ct:
            pmap = np.stack([
                _edit_permute(permutes[p], nm_fss, fss_ct,
                              cur_fss_ct)
                for p in range(P)])
        else:
            pmap = permutes
        fmap = pmap[:, base_f]                  # [P, nsel]
        cur = b[fmap]
        if test_type == "total":
            fl = np.take_along_axis(flips, fmap, axis=1)
            cur = np.where(fl, cur - w[lm_sel][None, :],
                           cur + w[lm_sel][None, :])
        ph = pheno_d2[lm_sel]
        gsum = np.cumsum(cur, axis=1)[:, -1]
        gssq = np.cumsum(cur * cur, axis=1)[:, -1]
        qprod = np.cumsum(cur * ph[None, :], axis=1)[:, -1]
    qt_mean = qt_sum * nind_recip
    geno_mean = gsum * nind_recip
    dxx = 1.0 / (nind - 1)
    qt_var = (qt_ssq - qt_sum * qt_mean) * dxx
    geno_var = (gssq - gsum * geno_mean) * dxx
    fails = geno_var == 0.0
    with np.errstate(invalid="ignore", divide="ignore"):
        qt_g_covar = (qprod - qt_sum * geno_mean) * dxx
        dxx2 = 1.0 / geno_var
        beta = qt_g_covar * dxx2
        dd = qt_var * dxx2 - beta * beta
        tstat = beta * np.sqrt((nind - 2) / dd)
    return beta, tstat, fails
