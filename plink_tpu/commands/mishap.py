"""--test-mishap: flanking-haplotype missingness test, PLINK 1.9
parity.

Behavior reference: test_mishap / test_mishap_write_line
(1.9/plink_ld.c:11270-11720).

For each variant with >= 5 missing calls: 3x3 joint tables of the
flanking variants' genotypes, split by whether the central call is
missing; double-het mass distributed by the two-locus EM; per-haplotype
2x2 chi-square of missingness vs haplotype (haps below --maf dropped);
plus the HETERO row.  Output <out>.missing.hap.
"""

from __future__ import annotations

import math

import numpy as np

from ..dataset import Dataset
from ..stats.distributions import chisq_logsf
from ..utils.chrom import MT_CODE, X_CODE, Y_CODE
from ..utils.fmt import dtoa_g
from ..utils.logging import RunLogger
from .homozyg import _fw_width
from .assoc19 import _fw, _g3
from .blocks import SMALL_EPSILON, em_phase_hethet


def _chiprob(chisq):
    try:
        return math.exp(chisq_logsf(chisq, 1))
    except (ValueError, OverflowError):
        return -9.0


def _write_line(fh, snp_fw, prev_a, next_a, total_cts, curhap_cts,
                tot_recip, flankstr):
    casen_1 = total_cts[0] - curhap_cts[0]
    ctrln_1 = total_cts[1] - curhap_cts[1]
    hap = (prev_a or "") + (next_a or "")
    line = snp_fw
    if len(hap) <= 10:
        line += " " * (10 - len(hap)) + hap
    else:
        line += hap
    line += " "
    line += (_g3(curhap_cts[0] / total_cts[0], 8)
             if total_cts[0] > 0.0 else "      NA")
    line += " "
    line += (_g3(curhap_cts[1] / total_cts[1], 8)
             if total_cts[1] > 0.0 else "      NA")
    line += " "
    line += (dtoa_g(curhap_cts[0]) + "/"
             + dtoa_g(curhap_cts[1])).rjust(20) + " "
    line += (dtoa_g(casen_1) + "/" + dtoa_g(ctrln_1)).rjust(20) + " "
    if curhap_cts[0] > 0.0 and curhap_cts[1] > 0.0 \
            and casen_1 > 0.0 and ctrln_1 > 0.0:
        row_mult = (curhap_cts[0] + curhap_cts[1]) * tot_recip
        cur_expected = row_mult * total_cts[0]
        dxx = curhap_cts[0] - cur_expected
        chisq = dxx * dxx / cur_expected
        cur_expected = row_mult * total_cts[1]
        dxx = curhap_cts[1] - cur_expected
        chisq += dxx * dxx / cur_expected
        row_mult = (total_cts[0] + total_cts[1]) * tot_recip - row_mult
        cur_expected = row_mult * total_cts[0]
        dxx = casen_1 - cur_expected
        chisq += dxx * dxx / cur_expected
        cur_expected = row_mult * total_cts[1]
        dxx = ctrln_1 - cur_expected
        chisq += dxx * dxx / cur_expected
        line += _g3(chisq, 8) + " " + _g3(max(_chiprob(chisq), 0.0), 8)
    else:
        line += "      NA       NA"
    fh.write(line + flankstr)


def run_test_mishap(ds: Dataset, cfg, log: RunLogger) -> None:
    vi = ds.vi
    min_maf = (cfg.maf if getattr(cfg, "maf", None) else 0.0) \
        * (1 - SMALL_EPSILON)

    from ..ops.pairwise import _unpack_np
    from .basic_reports import alt_allele_freqs

    codes = _unpack_np(ds.all_packed())[:, : ds.raw_sample_ct]
    smask = ds.sample_mask[: ds.raw_sample_ct]
    af = alt_allele_freqs(ds, founders_only=True)
    a1_is_alt = ~(af > 0.5)
    alt1 = vi.alt1()
    inc = np.flatnonzero(ds.variant_mask)
    maxsnp = _fw_width(len(str(vi.vid[i])) for i in inc)
    out = cfg.out + ".missing.hap"
    fh = open(out, "w")
    fh.write("SNP".rjust(maxsnp)
             + "  HAPLOTYPE      F_0      F_1                 M_H1"
             "                 M_H2    CHISQ        P FLANKING\n")
    inspected = 0
    skipped = 0

    def bedrow(v):
        raw = codes[v][smask]
        g = raw if a1_is_alt[v] else np.where(raw == 3, 3, 2 - raw)
        # bed classes: 0 homA1(minor), 1 het, 2 homA2, 3 missing
        return np.array([2, 1, 0, 3], np.int8)[
            g.astype(np.int64)]

    def a1a2(v):
        if a1_is_alt[v]:
            return str(alt1[v]), str(vi.ref[v])
        return str(vi.ref[v]), str(alt1[v])

    chrom_arr = vi.chrom
    boundaries = [0] + list(
        np.flatnonzero(np.diff(chrom_arr) != 0) + 1) + [len(chrom_arr)]
    total_markers = 0
    for bi in range(len(boundaries) - 1):
        lo, hi = boundaries[bi], boundaries[bi + 1]
        chrom = int(chrom_arr[lo])
        vsel = np.flatnonzero(ds.variant_mask[lo:hi]) + lo
        if chrom in (X_CODE, Y_CODE, MT_CODE):
            continue
        total_markers += vsel.size
        if vsel.size < 2:
            continue
        M = vsel.size
        for m in range(M):
            v = int(vsel[m])
            cur = bedrow(v)
            miss_ct = int((cur == 3).sum())
            if miss_ct < 5:
                continue
            has_prev = m > 0
            has_next = m < M - 1
            prev = bedrow(int(vsel[m - 1])) if has_prev \
                else np.zeros_like(cur)
            nxt = bedrow(int(vsel[m + 1])) if has_next \
                else np.zeros_like(cur)
            c = np.zeros(27, np.int64)
            for grp, sel in ((0, cur == 3), (1, cur != 3)):
                for r in range(3):
                    rowsel = sel & (prev == r)
                    for cc_ in range(3):
                        c[grp * 9 + r * 3 + cc_] = int(
                            (rowsel & (nxt == cc_)).sum())
            snp_fw = _fw(str(vi.vid[v]), maxsnp) + " "
            if has_prev:
                pa1, pa2 = a1a2(int(vsel[m - 1]))
            if has_next:
                na1, na2 = a1a2(int(vsel[m + 1]))
            hct = [0.0] * 10
            if has_next and has_prev:
                hct[0] = float(2 * c[0:9].sum())
                hct[1] = float(2 * c[9:18].sum())
                tot = hct[0] + hct[1]
                if tot == 0.0:
                    continue
                orig_cmiss, orig_cnm = hct[0], hct[1]
                flankstr = (f" {vi.vid[int(vsel[m - 1])]}"
                            f"|{vi.vid[int(vsel[m + 1])]}\n")
                hct[2] = float(2 * c[0] + c[1] + c[3])
                hct[3] = float(2 * c[9] + c[10] + c[12])
                hct[4] = float(2 * c[2] + c[1] + c[5])
                hct[5] = float(2 * c[11] + c[10] + c[14])
                hct[6] = float(2 * c[6] + c[3] + c[7])
                hct[7] = float(2 * c[15] + c[12] + c[16])
                hct[8] = float(2 * c[8] + c[5] + c[7])
                hct[9] = float(2 * c[17] + c[14] + c[16])
                if c[4] + c[13]:
                    comb = c[0:9] + c[9:18]
                    k11 = float(2 * comb[0] + comb[1] + comb[3])
                    k12 = float(2 * comb[2] + comb[1] + comb[5])
                    k21 = float(2 * comb[6] + comb[3] + comb[7])
                    k22 = float(2 * comb[8] + comb[5] + comb[7])
                    _, _, _, _, _, f11, _ = em_phase_hethet(
                        k11, k12, k21, k22, int(comb[4]))
                    dxx = (f11 * tot - (hct[2] + hct[3])) \
                        / float(c[4] + c[13])
                    dyy = float(c[4]) * dxx
                    dzz = float(c[13]) * dxx
                    hct[2] += dyy
                    hct[3] += dzz
                    hct[8] += dyy
                    hct[9] += dzz
                    dxx = 1.0 - dxx
                    dyy = float(c[4]) * dxx
                    dzz = float(c[13]) * dxx
                    hct[4] += dyy
                    hct[5] += dzz
                    hct[6] += dyy
                    hct[7] += dzz
                dxx = min_maf * tot
                for k in (2, 4, 6, 8):
                    if hct[k] + hct[k + 1] < dxx:
                        hct[0] -= hct[k]
                        hct[1] -= hct[k + 1]
                        tot -= hct[k] + hct[k + 1]
                tot_recip = 1.0 / tot
                pairs = [(2, pa1 + na1), (6, pa2 + na1),
                         (4, pa1 + na2), (8, pa2 + na2)]
                for k, hap in pairs:
                    if hct[k] + hct[k + 1] >= dxx:
                        _write_line(fh, snp_fw, hap, None, hct,
                                    hct[k:k + 2], tot_recip, flankstr)
            elif has_next:
                hct[0] = float(2 * (c[0] + c[1] + c[2]))
                hct[1] = float(2 * (c[9] + c[10] + c[11]))
                tot = hct[0] + hct[1]
                if tot == 0.0:
                    continue
                orig_cmiss, orig_cnm = hct[0], hct[1]
                flankstr = f" {vi.vid[int(vsel[m + 1])]}\n"
                dxx = min_maf * tot
                hct[2] = float(c[0] * 2 + c[1])
                hct[3] = float(c[9] * 2 + c[10])
                hct[4] = float(c[2] * 2 + c[1])
                hct[5] = float(c[11] * 2 + c[10])
                if hct[4] + hct[5] < dxx:
                    hct[0], hct[1] = hct[2], hct[3]
                    tot = hct[2] + hct[3]
                elif hct[2] + hct[3] < dxx:
                    hct[0], hct[1] = hct[4], hct[5]
                    tot = hct[4] + hct[5]
                tot_recip = 1.0 / tot
                if hct[2] + hct[3] >= dxx:
                    _write_line(fh, snp_fw, None, na1, hct, hct[2:4],
                                tot_recip, flankstr)
                if hct[4] + hct[5] >= dxx:
                    _write_line(fh, snp_fw, None, na2, hct, hct[4:6],
                                tot_recip, flankstr)
            else:
                hct[0] = float(2 * (c[0] + c[3] + c[6]))
                hct[1] = float(2 * (c[9] + c[12] + c[15]))
                tot = hct[0] + hct[1]
                if tot == 0.0:
                    continue
                orig_cmiss, orig_cnm = hct[0], hct[1]
                flankstr = f" {vi.vid[int(vsel[m - 1])]}\n"
                dxx = min_maf * tot
                hct[2] = float(c[0] * 2 + c[3])
                hct[3] = float(c[9] * 2 + c[12])
                hct[4] = float(c[6] * 2 + c[3])
                hct[5] = float(c[15] * 2 + c[12])
                if hct[4] + hct[5] < dxx:
                    hct[0], hct[1] = hct[2], hct[3]
                    tot = hct[2] + hct[3]
                elif hct[2] + hct[3] < dxx:
                    hct[0], hct[1] = hct[4], hct[5]
                    tot = hct[4] + hct[5]
                tot_recip = 1.0 / tot
                if hct[2] + hct[3] >= dxx:
                    _write_line(fh, snp_fw, pa1, None, hct, hct[2:4],
                                tot_recip, flankstr)
                if hct[4] + hct[5] >= dxx:
                    _write_line(fh, snp_fw, pa2, None, hct, hct[4:6],
                                tot_recip, flankstr)
            het_tot = [orig_cmiss * 0.5, orig_cnm * 0.5]
            het_cts = [float(c[1] + c[3] + c[4] + c[5] + c[7]),
                       float(c[10] + c[12] + c[13] + c[14] + c[16])]
            _write_line(fh, snp_fw, "HETERO", None, het_tot, het_cts,
                        1.0 / (het_tot[0] + het_tot[1]), flankstr)
            inspected += 1
    fh.close()
    log.log(f"--test-mishap: {inspected} loc"
            f"{'us' if inspected == 1 else 'i'} checked, report "
            f"written to {out} .")
