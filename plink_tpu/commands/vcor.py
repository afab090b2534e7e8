"""--r2-unphased / --r-unphased / --r2-phased / --r-phased: pairwise LD
correlation tables.

Behavior reference: Vcor (2.0/plink2_ld.cc:12054).
- unphased r = Pearson correlation of ALT-dosage vectors over both-
  nonmissing founder... (all included) samples;
- phased r = composite haplotype correlation with the double-het phase
  resolved by EM over haplotype frequencies (the plink 1.9 --r2 algorithm);
- table mode: one row per pair within --ld-window-kb (default 1000) whose
  r^2 >= --ld-window-r2 (default 0.2); columns
  #CHROM_A POS_A ID_A CHROM_B POS_B ID_B <METRIC>.

Matrix modes ('square' etc.) and inter-chromosome output not yet
implemented.
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..ops.ld import LdBand, LdJointBand
from ..utils.fmt import g6
from ..utils.logging import RunLogger


def _em_phased_r(jc: dict, iters: int = 100, tol: float = 1e-12) -> np.ndarray:
    """Vectorized haplotype-frequency EM -> r (signed, ALT-ALT haplotype)."""
    n = jc["nm"].astype(np.float64)
    c = {k: jc[k].astype(np.float64) for k in jc}
    # known haplotype counts; u = double-het count with unknown phase
    nAB = 2 * c["22"] + c["21"] + c["12"]
    nAb = 2 * c["20"] + c["21"] + c["10"]
    naB = 2 * c["02"] + c["12"] + c["01"]
    nab = 2 * c["00"] + c["10"] + c["01"]
    u = c["11"]
    tot = 2.0 * n
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.full_like(n, 0.5)
        for _ in range(iters):
            pAB = (nAB + u * q) / tot
            pab = (nab + u * q) / tot
            pAb = (nAb + u * (1 - q)) / tot
            paB = (naB + u * (1 - q)) / tot
            num = pAB * pab
            den = num + pAb * paB
            q_new = np.where(den > 0, num / den, 0.5)
            if np.all(np.abs(q_new - q) < tol):
                q = q_new
                break
            q = q_new
        pAB = (nAB + u * q) / tot
        pA = (nAB + nAb + u) / tot
        pB = (nAB + naB + u) / tot
        d = pAB - pA * pB
        denom = np.sqrt(pA * (1 - pA) * pB * (1 - pB))
        return np.where(denom > 0, d / denom, np.nan)


def _unphased_r(band: LdBand, firsts: np.ndarray, d: np.ndarray) -> np.ndarray:
    dd = band.bands
    dot = dd["dot"][firsts, d].astype(np.float64)
    nm = dd["nm"][firsts, d].astype(np.float64)
    s_i = dd["sum_i"][firsts, d].astype(np.float64)
    q_i = dd["ssq_i"][firsts, d].astype(np.float64)
    s_j = dd["sum_j"][firsts, d].astype(np.float64)
    q_j = dd["ssq_j"][firsts, d].astype(np.float64)
    cov = dot * nm - s_i * s_j
    v1 = q_i * nm - s_i * s_i
    v2 = q_j * nm - s_j * s_j
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where((v1 > 0) & (v2 > 0), cov / np.sqrt(v1 * v2), np.nan)


def run_vcor(ds: Dataset, cfg, log: RunLogger) -> None:
    phased, squared = cfg.vcor
    window_bp = int(cfg.ld_window_kb * 1000) if cfg.ld_window_kb else 1_000_000
    r2_thresh = cfg.ld_window_r2 if cfg.ld_window_r2 is not None else 0.2
    metric = ("PHASED" if phased else "UNPHASED") + ("_R2" if squared else "_R")

    inc_s = np.flatnonzero(ds.sample_mask)
    npad = -(-len(inc_s) // 4) * 4
    smask = np.zeros(npad, np.int8)
    smask[: len(inc_s)] = 1

    # signed-r reports are oriented to the MAJOR alleles and list them
    from .basic_reports import alt_allele_freqs

    freqs = np.nan_to_num(alt_allele_freqs(ds, founders_only=True))
    maj_is_alt = freqs > 0.5
    alt1 = ds.vi.alt1()
    maj_allele = np.where(maj_is_alt, alt1, ds.vi.ref)

    from ..ops.pairwise import _pack_np, _unpack_np

    path = cfg.out + ".vcor"
    rows_out = []
    ci = ds.vi.chr_info
    for chrom in np.unique(ds.vi.chrom[ds.variant_mask]):
        cidx = np.flatnonzero(ds.variant_mask & (ds.vi.chrom == chrom))
        if cidx.size < 2:
            continue
        bps = ds.vi.pos[cidx].astype(np.int64)
        # max pair distance within the bp window
        j = 0
        width = 1
        for i in range(len(bps)):
            while j < len(bps) and bps[j] <= bps[i] + window_bp:
                j += 1
            width = max(width, j - i)
        width -= 1
        if width < 1:
            continue
        lo, hi = int(cidx[0]), int(cidx[-1]) + 1
        packed = ds.reader.read_packed(lo, hi - lo)[cidx - lo]
        codes = _unpack_np(packed)[:, : ds.raw_sample_ct][:, inc_s]
        packed_s = _pack_np(codes, npad)
        band = LdBand(packed_s, smask, width)
        joint = (
            LdJointBand(packed_s, smask, width) if phased else None
        )
        n = len(cidx)
        for i in range(n):
            dmax = min(band.width, n - 1 - i)
            if dmax < 1:
                continue
            ds_arr = np.arange(1, dmax + 1)
            in_bp = bps[i + ds_arr] - bps[i] <= window_bp
            ds_arr = ds_arr[in_bp]
            if ds_arr.size == 0:
                continue
            firsts = np.full(ds_arr.size, i)
            if phased:
                jc = joint.joint_counts(firsts, ds_arr)
                r = _em_phased_r(jc)
            else:
                r = _unphased_r(band, firsts, ds_arr)
            r2 = r * r
            keep = np.flatnonzero(r2 >= r2_thresh)
            for k in keep:
                jj = i + int(ds_arr[k])
                vi_a, vi_b = cidx[i], cidx[jj]
                if squared:
                    rows_out.append(
                        f"{ci.name(int(chrom))}\t{ds.vi.pos[vi_a]}\t{ds.vi.vid[vi_a]}\t"
                        f"{ci.name(int(chrom))}\t{ds.vi.pos[vi_b]}\t{ds.vi.vid[vi_b]}\t"
                        f"{g6(r2[k])}\n"
                    )
                else:
                    # orient r to the major alleles (our planes are
                    # REF-oriented: +1 hom-ref); flip sign per variant whose
                    # major allele is ALT
                    sgn = (-1.0 if maj_is_alt[vi_a] else 1.0) * (
                        -1.0 if maj_is_alt[vi_b] else 1.0
                    )
                    rows_out.append(
                        f"{ci.name(int(chrom))}\t{ds.vi.pos[vi_a]}\t{ds.vi.vid[vi_a]}\t"
                        f"{maj_allele[vi_a]}\t"
                        f"{ci.name(int(chrom))}\t{ds.vi.pos[vi_b]}\t{ds.vi.vid[vi_b]}\t"
                        f"{maj_allele[vi_b]}\t{g6(sgn * r[k])}\n"
                    )
    with open(path, "w") as f:
        if squared:
            f.write(f"#CHROM_A\tPOS_A\tID_A\tCHROM_B\tPOS_B\tID_B\t{metric}\n")
        else:
            f.write(
                f"#CHROM_A\tPOS_A\tID_A\tMAJ_A\tCHROM_B\tPOS_B\tID_B\tMAJ_B\t"
                f"{metric}\n"
            )
        f.writelines(rows_out)
    flag = ("--r2-" if squared else "--r-") + ("phased" if phased else "unphased")
    log.log(f"{flag}: Results written to {path} .")
