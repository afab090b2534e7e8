"""--flip-scan: case/control LD-sign scan for strand errors, PLINK 1.9
parity.

Behavior reference: flipscan (1.9/plink_ld.c:1469-1960).

Per marker: Pearson r against every neighbor within window_size-1 loci
and window-kb bp, computed separately in control and case founders
(plink's u = majorcount-1 coding with X male homA1->1); neighbors
whose |r| reaches the threshold in either group are classified
positive (same sign across groups) or negative; negative partners are
listed in NEGSNPS.  'verbose' adds the per-pair .flipscan.verbose
report.
"""

from __future__ import annotations

import math

import numpy as np

from ..cli import FlagError
from ..dataset import Dataset
from ..utils.chrom import X_CODE, Y_CODE
from ..utils.logging import RunLogger
from .homozyg import _fw_width
from .assoc19 import _fw, _g3
from .blocks import SMALL_EPSILON, set_allele_freqs_19


def _pearson_u(u1, u2, shared):
    """plink ld_dot_prod r: double-op-order Pearson on u = value-1
    over shared-nonmissing samples."""
    n = int(shared.sum())
    if not n:
        return 0.0
    a = u1[shared].astype(np.int64)
    b = u2[shared].astype(np.int64)
    su = int(a.sum())
    sv = int(b.sum())
    suv = int((a * b).sum())
    su2 = int((a * a).sum())
    sv2 = int((b * b).sum())
    nd = float(n)
    dxx = float(su)
    dyy = float(sv)
    cov12 = suv * nd - dxx * dyy
    den = ((-su2) * nd + dxx * dxx) * ((-sv2) * nd + dyy * dyy)
    with np.errstate(invalid="ignore", divide="ignore"):
        return float(cov12 / np.sqrt(den))


def run_flipscan(ds: Dataset, cfg, log: RunLogger) -> None:
    verbose = "verbose" in (cfg.flip_scan or ())
    for m in set(cfg.flip_scan or ()) - {"verbose"}:
        raise FlagError(f"Invalid --flip-scan modifier '{m}'.")
    window_size = cfg.flip_scan_window if cfg.flip_scan_window \
        is not None else 10
    window_bp = (int(cfg.flip_scan_window_kb * 1000
                     * (1 + SMALL_EPSILON))
                 if cfg.flip_scan_window_kb is not None else 1000000)
    thresh = cfg.flip_scan_threshold \
        if cfg.flip_scan_threshold is not None else 0.5
    min_corr = thresh * (1 - SMALL_EPSILON)

    si, vi = ds.si, ds.vi
    pc = next(iter(si.phenos.values()), None)
    if pc is None or pc.kind != "cc":
        raise FlagError("--flip-scan requires a case/control phenotype.")
    fp = ds.founder_mask & ds.sample_mask & pc.nonmiss
    grp = [fp & (pc.data != 1), fp & (pc.data == 1)]  # [ctrl, case]
    if not grp[0].any() or not grp[1].any():
        raise FlagError(
            "--flip-scan requires at least one case and one control, "
            "and only considers founders.")

    from ..ops.pairwise import _unpack_np

    codes = _unpack_np(ds.all_packed())[:, : ds.raw_sample_ct]
    freqs19 = set_allele_freqs_19(ds, codes)
    male = ds.male_mask()[: ds.raw_sample_ct]

    from .basic_reports import alt_allele_freqs

    af = alt_allele_freqs(ds, founders_only=True)
    a1_is_alt = ~(af > 0.5)
    alt1 = vi.alt1()
    inc = np.flatnonzero(ds.variant_mask)
    maxsnp = _fw_width(len(str(vi.vid[i])) for i in inc)
    ci = vi.chr_info
    out = cfg.out + ".flipscan"
    fh = open(out, "w")
    fh.write("   CHR " + "SNP".rjust(maxsnp)
             + "           BP   A1   A2        F    POS    R_POS    NEG"
             "    R_NEG NEGSNPS\n")
    fhv = None
    if verbose:
        fhv = open(out + ".verbose", "w")
        fhv.write("CHR_INDX " + "SNP_INDX".rjust(maxsnp)
                  + "      BP_INDX A1_INDX " + "SNP_PAIR".rjust(maxsnp)
                  + "      BP_PAIR A1_PAIR      R_A      R_U\n")

    problem_ct = 0
    chrom_arr = vi.chrom
    boundaries = [0] + list(
        np.flatnonzero(np.diff(chrom_arr) != 0) + 1) + [len(chrom_arr)]
    for bi in range(len(boundaries) - 1):
        lo, hi = boundaries[bi], boundaries[bi + 1]
        vsel = np.flatnonzero(ds.variant_mask[lo:hi]) + lo
        if vsel.size < 2:
            continue
        chrom = int(chrom_arr[lo])
        is_x = chrom == X_CODE
        is_y = chrom == Y_CODE
        pos = vi.pos[vsel].astype(np.int64)
        M = vsel.size
        # plink LD value: A2(major-slot) count 0..2, missing excluded.
        # NOTE: flipscan builds its haploid-fix masks by passing
        # founder_phenos[0] with is_include=0 to
        # alloc_raw_haploid_filters (1.9/plink_ld.c:1573) -- the same
        # exclude-as-include quirk as tdt() -- so male X/Y het calls
        # are NOT zapped for the analysis samples; the only X special
        # case left is ld_process_load2's male homA1 -> 1 bump.
        vals = []
        nonmiss = []
        for k, v in enumerate(vsel):
            raw = codes[v]
            g = raw if a1_is_alt[v] else np.where(raw == 3, 3, 2 - raw)
            # g = A1(minor) count; value = 2 - g = A2 count
            miss = g == 3
            val = np.where(miss, 1, 2 - g).astype(np.int64)
            if is_x:
                val = np.where((val == 0) & male & ~miss, 1, val)
            vals.append(val - 1)
            nonmiss.append(~miss)
        gv = [[vals[k][grp[g][: ds.raw_sample_ct]] for k in range(M)]
              for g in range(2)]
        gm = [[nonmiss[k][grp[g][: ds.raw_sample_ct]] for k in range(M)]
              for g in range(2)]
        r = {}
        for m in range(M):
            j = m - 1
            while j >= 0 and m - j <= window_size - 1 \
                    and pos[m] - pos[j] <= window_bp:
                r[(j, m)] = (
                    _pearson_u(gv[0][j], gv[0][m],
                               gm[0][j] & gm[0][m]),
                    _pearson_u(gv[1][j], gv[1][m],
                               gm[1][j] & gm[1][m]))
                j -= 1
        for m in range(M):
            partners = []
            for j in range(M):
                if j == m:
                    continue
                key = (j, m) if j < m else (m, j)
                if key in r:
                    partners.append(j)
            pos_ct = neg_ct = 0
            pos_tot = neg_tot = 0.0
            negsnps = []
            vrows = []
            for j in sorted(partners):
                key = (j, m) if j < m else (m, j)
                ctrl_r, case_r = r[key]
                if abs(ctrl_r) >= min_corr or abs(case_r) >= min_corr:
                    dxx = abs(ctrl_r) + abs(case_r)
                    if case_r * ctrl_r >= 0.0:
                        pos_ct += 1
                        pos_tot += dxx
                    else:
                        negsnps.append(j)
                        neg_ct += 1
                        neg_tot += dxx
                    vrows.append((j, case_r, ctrl_r))
            v = int(vsel[m])
            a1 = str(alt1[v]) if a1_is_alt[v] else str(vi.ref[v])
            a2 = str(vi.ref[v]) if a1_is_alt[v] else str(alt1[v])
            line = (_fw(ci.name19(chrom), 6) + " "
                    + _fw(str(vi.vid[v]), maxsnp) + "   "
                    + str(int(vi.pos[v])).rjust(10) + " "
                    + _fw(a1, 4) + " " + _fw(a2, 4) + " "
                    + _g3(1.0 - freqs19[v], 8) + " "
                    + str(pos_ct).rjust(6) + " ")
            line += ("      NA" if not pos_ct
                     else _g3(pos_tot / (pos_ct * 2), 8))
            line += " " + str(neg_ct).rjust(6) + " "
            line += ("      NA" if not neg_ct
                     else _g3(neg_tot / (neg_ct * 2), 8))
            line += " "
            if neg_ct:
                line += "|".join(
                    str(vi.vid[int(vsel[j])]) for j in negsnps)
                problem_ct += 1
                if fhv is not None:
                    for j, case_r, ctrl_r in vrows:
                        vj = int(vsel[j])
                        a1j = str(alt1[vj]) if a1_is_alt[vj] \
                            else str(vi.ref[vj])
                        fhv.write(
                            _fw(ci.name19(chrom), 6) + " "
                            + _fw(str(vi.vid[v]), maxsnp) + "   "
                            + str(int(vi.pos[v])).rjust(10) + " "
                            + _fw(a1, 4) + " "
                            + _fw(str(vi.vid[vj]), maxsnp) + "   "
                            + str(int(vi.pos[vj])).rjust(10) + " "
                            + _fw(a1j, 4) + " " + _g3(case_r, 8) + " "
                            + _g3(ctrl_r, 8) + "\n")
            fh.write(line + "\n")
    fh.close()
    if fhv is not None:
        fhv.close()
    log.log(f"--flip-scan{' verbose' if verbose else ''}: "
            f"{problem_ct} variants with at least one negative "
            f"correlation.")
