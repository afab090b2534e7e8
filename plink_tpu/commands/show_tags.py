"""--show-tags: r^2-based tag-SNP listing, PLINK 1.9 parity.

Behavior reference: show_tags (1.9/plink_ld.c:6348-6820).

For each target variant, tags = other variants within --tag-kb whose
founder-genotype r^2 exceeds --tag-r2 (plink LD coding: A2-count with
the X male homA1->1 bump; the reference's haploid_fix call operates on
the already-consumed raw buffer, so no het-haploid zeroing applies).
'all' mode writes <out>.tags.list for every variant; file mode writes
the combined target+tag ID list to <out>.tags (optionally two-column
with --tag-mode2 input) plus the .list with --list-all.
"""

from __future__ import annotations

import numpy as np

from ..cli import FlagError
from ..dataset import Dataset
from ..utils.chrom import X_CODE
from ..utils.fmt import dtoa_g
from ..utils.logging import RunLogger
from .homozyg import _fw_width
from .assoc19 import _fw
from .blocks import SMALL_EPSILON


def run_show_tags(ds: Dataset, cfg, log: RunLogger) -> None:
    fname = cfg.show_tags if cfg.show_tags != "all" else None
    list_all = cfg.list_all or fname is None
    twocolumn = cfg.tag_mode2
    window_bp = (int(cfg.tag_kb * 1000 * (1 + SMALL_EPSILON))
                 if cfg.tag_kb is not None else 250000)
    r2_thresh = cfg.tag_r2 if cfg.tag_r2 is not None else 0.8
    tag_thresh = r2_thresh * (1 - SMALL_EPSILON)

    vi = ds.vi
    founders = ds.founder_mask & ds.sample_mask
    if int(founders.sum()) < 2:
        log.log("Warning: Skipping --show-tags since there are less "
                "than two founders.")
        return
    inc = np.flatnonzero(ds.variant_mask)
    targets = np.zeros(ds.raw_variant_ct, bool)
    if fname is None:
        targets[inc] = True
    else:
        ids = {}
        for v in inc:
            ids.setdefault(str(vi.vid[v]), int(v))
        unrecog = 0
        with open(fname) as f:
            for li, line in enumerate(f, 1):
                toks = line.split()
                if not toks:
                    continue
                if twocolumn:
                    if len(toks) < 2:
                        raise FlagError(
                            f"Line {li} of --show-tags file has fewer "
                            "tokens than expected.")
                    if toks[1] != "1":
                        continue
                v = ids.get(toks[0])
                if v is None:
                    unrecog += 1
                    continue
                if targets[v]:
                    raise FlagError(
                        f"Duplicate variant ID '{toks[0]}' in "
                        "--show-tags file.")
                targets[v] = True
        target_ct = int(targets.sum())
        log.log(f"--show-tags: {target_ct} target variant"
                f"{'' if target_ct == 1 else 's'} loaded.")

    from ..ops.pairwise import _unpack_np
    from .basic_reports import alt_allele_freqs

    codes = _unpack_np(ds.all_packed())[:, : ds.raw_sample_ct]
    af = alt_allele_freqs(ds, founders_only=True)
    a1_is_alt = ~(af > 0.5)
    male = ds.male_mask()[: ds.raw_sample_ct]
    fmask = founders[: ds.raw_sample_ct]
    maxsnp = _fw_width(len(str(vi.vid[i])) for i in inc)
    ci = vi.chr_info

    final_set = np.zeros(ds.raw_variant_ct, bool) if fname else None
    fh = None
    if list_all:
        fh = open(cfg.out + ".tags.list", "w")
        fh.write("SNP".rjust(maxsnp)
                 + "  CHR         BP NTAG       LEFT      RIGHT"
                 "   KBSPAN TAGS\n")

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
        pos = vi.pos[vsel].astype(np.int64)
        M = vsel.size
        vals = []
        nonmiss = []
        for v in vsel:
            raw = codes[v]
            g = raw if a1_is_alt[v] else np.where(raw == 3, 3, 2 - raw)
            miss = g == 3
            val = np.where(miss, 1, 2 - g).astype(np.int64)
            if is_x:
                val = np.where((val == 0) & male & ~miss, 1, val)
            vals.append((val - 1)[fmask])
            nonmiss.append((~miss)[fmask])
        tgt = targets[vsel]
        tagged: dict[int, list[int]] = {m: [] for m in range(M)}
        for m in range(M):
            j = m - 1
            while j >= 0 and pos[m] - pos[j] <= window_bp:
                if tgt[m] or tgt[j]:
                    sh = nonmiss[j] & nonmiss[m]
                    n = int(sh.sum())
                    if n:
                        a = vals[j][sh]
                        b = vals[m][sh]
                        su = int(a.sum())
                        sv = int(b.sum())
                        suv = int((a * b).sum())
                        su2 = int((a * a).sum())
                        sv2 = int((b * b).sum())
                        nd = float(n)
                        dxx = float(su)
                        dyy = float(sv)
                        cov12 = suv * nd - dxx * dyy
                        den = ((-su2) * nd + dxx * dxx) \
                            * ((-sv2) * nd + dyy * dyy)
                        if cov12 * cov12 > den * tag_thresh:
                            tagged[m].append(j)
                            tagged[j].append(m)
                j -= 1
        for m in range(M):
            if not tgt[m]:
                continue
            tags = sorted(tagged[m])
            v = int(vsel[m])
            if final_set is not None:
                final_set[v] = True
                for j in tags:
                    final_set[int(vsel[j])] = True
            if fh is not None:
                bps = [int(pos[m])] + [int(pos[j]) for j in tags]
                min_bp, max_bp = min(bps), max(bps)
                line = (_fw(str(vi.vid[v]), maxsnp) + " "
                        + ci.name19(chrom).rjust(4) + " "
                        + str(int(pos[m])).rjust(10) + " "
                        + str(len(tags)).rjust(4) + " "
                        + str(min_bp).rjust(10) + " "
                        + str(max_bp).rjust(10) + " "
                        + dtoa_g((max_bp - min_bp + 1) * 0.001).rjust(8)
                        + " ")
                line += ("|".join(str(vi.vid[int(vsel[j])])
                                  for j in tags) if tags else "NONE")
                fh.write(line + "\n")
    if fh is not None:
        fh.close()
        if final_set is None:
            log.log(f"--show-tags all: Report written to "
                    f"{cfg.out}.tags.list .")
    if final_set is not None:
        with open(cfg.out + ".tags", "w") as f:
            if not twocolumn:
                for v in np.flatnonzero(final_set):
                    f.write(str(vi.vid[v]) + "\n")
            else:
                for v in inc:
                    f.write(f"{vi.vid[v]}\t"
                            f"{1 if final_set[v] else 0}\n")
        added = int(final_set.sum()) - int(targets.sum())
        log.log(f"--show-tags: Simple tag ID list ({added} tag"
                f"{'' if added == 1 else 's'} added) written to "
                f"{cfg.out}.tags .")
