"""--twolocus: joint genotype count tables for two markers, PLINK 1.9
parity.

Behavior reference: twolocus / twolocus_write_table
(1.9/plink_ld.c:7705-8180).

Writes <out>.twolocus with 4x4 genotype-count and proportion tables
(rows marker1, cols marker2; missing shown as 0/0, marginals as */*)
for all samples, cases, and controls; A1 = minor allele per the usual
marker_reverse convention; X/Y het-haploid calls zeroed via
haploid_fix.
"""

from __future__ import annotations

import numpy as np

from ..cli import FlagError
from ..dataset import Dataset
from ..utils.chrom import MT_CODE, X_CODE, Y_CODE
from ..utils.fmt import dtoa_f_w9p6_clipped, dtoa_f_w9p6_spaced
from ..utils.logging import RunLogger
from .homozyg import _fw_width
from .assoc19 import _fw


def _w10(v: int) -> str:
    return str(int(v)).rjust(10)


def _table_counts(ds: Dataset, vidx, a1_is_alt, smask):
    """bed-coded genotype vectors (0=homA1,1=missing,2=het,3=homA2)
    with A1=minor flip and haploid fix, restricted to smask order."""
    from ..ops.pairwise import _unpack_np

    male = ds.male_mask()[: ds.raw_sample_ct]
    out = []
    codes = _unpack_np(ds.all_packed())[:, : ds.raw_sample_ct]
    for k, v in enumerate(vidx):
        raw = codes[v].copy()
        # minor count g: flip when A1 != ALT
        if not a1_is_alt[k]:
            raw = np.where(raw == 3, 3, 2 - raw)
        chrom = int(ds.vi.chrom[v])
        if chrom == X_CODE:
            raw = np.where((raw == 1) & male, 3, raw)
        elif chrom == Y_CODE:
            raw = np.where(~male | (raw == 1), 3, raw)
        elif chrom == MT_CODE:
            pass
        # minor-count -> bed: 2->0(homA1), 1->2(het), 0->3(homA2), 3->1
        bed = np.array([3, 2, 0, 1], np.int8)[raw]
        out.append(bed[smask])
    return out


def _write_table(fh, counts, maxsnp, mkr1, mkr2, a00, a01, a10, a11):
    c = counts
    marg_a = [sum(c[r * 4 + k] for k in range(4)) for r in range(4)]
    marg_b = [sum(c[k * 4 + col] for k in range(4)) for col in range(4)]
    total = sum(marg_a)
    tot_recip = 1.0 / total if total else float("inf")
    l00, l01, l10, l11 = len(a00), len(a01), len(a10), len(a11)

    fh.write(" " * (maxsnp + 14) + mkr2 + "\n")
    line = " " * (maxsnp + 7)
    if l10 < 4:
        line += " " * (9 - 2 * l10)
    line += f"{a10}/{a10} "
    if l10 + l11 < 7:
        line += " " * (9 - l10 - l11)
    line += f"{a10}/{a11} "
    if l11 < 4:
        line += " " * (9 - 2 * l11)
    line += f"{a11}/{a11}        0/0        */*\n"
    fh.write(line)

    def crow(label_pad, label, r):
        return (label_pad + label + " " + _w10(c[r * 4 + 0]) + " "
                + _w10(c[r * 4 + 2]) + " " + _w10(c[r * 4 + 3]) + " "
                + _w10(c[r * 4 + 1]) + " " + _w10(marg_a[r]) + "\n")

    pad0 = _fw(mkr1, maxsnp) + " " + ("  " if l00 == 1 else "")
    fh.write(crow(pad0, f"{a00}/{a00}", 0))
    pad2 = " " * (maxsnp + 1) + (
        " " * (4 - l00 - l01) if l00 + l01 < 4 else "")
    fh.write(crow(pad2, f"{a00}/{a01}", 2))
    pad3 = " " * (maxsnp + 1) + ("  " if l01 == 1 else "")
    fh.write(crow(pad3, f"{a01}/{a01}", 3))
    fh.write(" " * (maxsnp + 3) + "0/0 " + _w10(c[4]) + " "
             + _w10(c[6]) + " " + _w10(c[7]) + " " + _w10(c[5]) + " "
             + _w10(marg_a[1]) + "\n")
    fh.write(" " * (maxsnp + 3) + "*/* " + _w10(marg_b[0]) + " "
             + _w10(marg_b[2]) + " " + _w10(marg_b[3]) + " "
             + _w10(marg_b[1]) + " " + _w10(total) + "\n")
    fh.write("\n")

    fh.write(" " * (maxsnp + 14) + mkr2 + "\n")
    line = " " * (maxsnp + 9) + f"{a10}/{a10}"
    if l10 < 4:
        line += " " * (9 - 2 * l10)
    line += f" {a10}/{a11}"
    if l10 + l11 < 7:
        line += " " * (9 - l10 - l11)
    line += f" {a11}/{a11}"
    if l11 < 4:
        line += " " * (9 - 2 * l11)
    line += " 0/0        */*\n"
    fh.write(line)

    def sp(v):
        return dtoa_f_w9p6_spaced(v * tot_recip)

    def prow(label_pad, label, r):
        return (label_pad + label + "  " + sp(c[r * 4 + 0]) + "  "
                + sp(c[r * 4 + 2]) + "  " + sp(c[r * 4 + 3]) + "  "
                + sp(c[r * 4 + 1]) + "  "
                + dtoa_f_w9p6_clipped(marg_a[r] * tot_recip) + "\n")

    fh.write(prow(pad0, f"{a00}/{a00}", 0))
    fh.write(prow(pad2, f"{a00}/{a01}", 2))
    fh.write(prow(pad3, f"{a01}/{a01}", 3))
    fh.write(" " * (maxsnp + 3) + "0/0  " + sp(c[4]) + "  " + sp(c[6])
             + "  " + sp(c[7]) + "  " + sp(c[5]) + "  "
             + dtoa_f_w9p6_clipped(marg_a[1] * tot_recip) + "\n")
    fh.write(" " * (maxsnp + 3) + "*/*  " + sp(marg_b[0]) + "  "
             + sp(marg_b[2]) + "  " + sp(marg_b[3]) + "  "
             + sp(marg_b[1]) + "   1\n\n")


def run_twolocus(ds: Dataset, cfg, log: RunLogger) -> None:
    mkr1, mkr2 = cfg.twolocus
    vi, si = ds.vi, ds.si
    inc = np.flatnonzero(ds.variant_mask)
    ids = {str(vi.vid[v]): int(v) for v in inc[::-1]}
    if mkr1 not in ids or mkr2 not in ids:
        raise FlagError("--twolocus variant name not found.")
    vidx = [ids[mkr1], ids[mkr2]]

    from .basic_reports import alt_allele_freqs

    freqs = alt_allele_freqs(ds, founders_only=True)
    a1_is_alt = [not (freqs[v] > 0.5) for v in vidx]
    alt1 = vi.alt1()

    def alleles(k):
        v = vidx[k]
        if a1_is_alt[k]:
            return str(alt1[v]), str(vi.ref[v])
        return str(vi.ref[v]), str(alt1[v])

    a00, a01 = alleles(0)
    a10, a11 = alleles(1)
    smask = ds.sample_mask[: ds.raw_sample_ct]
    g = _table_counts(ds, vidx, a1_is_alt, smask)
    counts_all = np.bincount(
        (g[0].astype(np.int64) * 4 + g[1]), minlength=16)
    pc = next(iter(si.phenos.values()), None)
    counts_case = counts_ctrl = None
    if pc is not None and pc.kind == "cc":
        nm = (pc.nonmiss & ds.sample_mask)[: ds.raw_sample_ct][smask]
        case = (pc.data == 1)[: ds.raw_sample_ct][smask][nm]
        sub = g[0].astype(np.int64) * 4 + g[1]
        sub = sub[nm]
        counts_case = np.bincount(sub[case], minlength=16)
        counts_ctrl = np.bincount(sub[~case], minlength=16)

    maxsnp = _fw_width(len(str(vi.vid[i])) for i in inc)
    out = cfg.out + ".twolocus"
    with open(out, "w") as fh:
        fh.write("\nAll individuals\n===============\n")
        _write_table(fh, list(counts_all), maxsnp, mkr1, mkr2, a00, a01,
                     a10, a11)
        if counts_case is not None:
            # gates mirror pheno_nm_ct != pheno_ctrl_ct / pheno_ctrl_ct
            nm_all = pc.nonmiss & ds.sample_mask
            case_ct = int((nm_all & (pc.data == 1)).sum())
            ctrl_ct = int(nm_all.sum()) - case_ct
            if case_ct:
                fh.write("\nCases\n=====\n")
                _write_table(fh, list(counts_case), maxsnp, mkr1, mkr2,
                             a00, a01, a10, a11)
            if ctrl_ct:
                fh.write("\nControls\n========\n")
                _write_table(fh, list(counts_ctrl), maxsnp, mkr1, mkr2,
                             a00, a01, a10, a11)
        fh.write("\n")
    log.log(f"--twolocus: Report written to {out} .")
