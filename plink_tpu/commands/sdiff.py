"""--sample-diff / --sdiff: genotype discordance between sample pairs.

Behavior reference: Sdiff machinery in 2.0/plink2_misc.cc (flag help:
--sample-diff).  Supported: 'ids=' all-vs-all and 'base=' one-vs-rest pair
specs, 'counts-only' and 'include-missing' modifiers.  Outputs:
- <out>.sdiff          : per-discordance rows (#CHROM POS ID REF ALT IID1
                         IID2 GT1 GT2), variant-major;
- <out>.sdiff.summary  : per-pair OBS_CT (both nonmissing) and DIFF_CT.
Dosage comparison and file= pair lists not yet implemented.
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..utils.logging import RunLogger

_GT = {0: "0/0", 1: "0/1", 2: "1/1", 3: "./."}


def run_sdiff(ds: Dataset, cfg, log: RunLogger) -> None:
    args = list(cfg.sdiff)
    counts_only = False
    include_missing = False
    mode = None
    id_list: list[str] = []
    for a in args:
        if a == "counts-only":
            counts_only = True
        elif a == "include-missing":
            include_missing = True
        elif a.startswith("ids="):
            mode = "ids"
            id_list.append(a[4:])
        elif a.startswith("base="):
            mode = "base"
            id_list.append(a[5:])
        elif mode is not None:
            id_list.append(a)
        else:
            raise NotImplementedError(f"--sample-diff modifier '{a}' unsupported")
    if mode is None or len(id_list) < 2:
        raise ValueError("--sample-diff requires ids=/base= and >=2 sample IDs")

    si = ds.si
    iid_to_idx = {str(si.iid[i]): i for i in range(si.sample_ct)}
    try:
        sidx = [iid_to_idx[x] for x in id_list]
    except KeyError as e:
        raise ValueError(f"--sample-diff: sample ID {e} not found")
    if mode == "ids":
        pairs = [
            (i, j) for k, i in enumerate(sidx) for j in sidx[k + 1 :]
        ]
    else:
        pairs = [(sidx[0], j) for j in sidx[1:]]

    obs = np.zeros(len(pairs), dtype=np.int64)
    diff = np.zeros(len(pairs), dtype=np.int64)
    rows: list[str] = []
    from ..ops.pairwise import _unpack_np

    ci = ds.vi.chr_info
    cols = np.array(sorted(set(i for p in pairs for i in p)))
    colpos = {int(c): k for k, c in enumerate(cols)}
    for v0, packed in ds.iter_packed_blocks():
        codes = _unpack_np(packed)[:, : ds.raw_sample_ct][:, cols]
        sel = ds.variant_mask[v0 : v0 + codes.shape[0]]
        for pi, (a, b) in enumerate(pairs):
            ga = codes[:, colpos[a]]
            gb = codes[:, colpos[b]]
            both = (ga != 3) & (gb != 3) & sel
            obs[pi] += int(both.sum())
            if include_missing:
                d = (ga != gb) & ((ga != 3) | (gb != 3)) & sel
            else:
                d = (ga != gb) & both
            diff[pi] += int(d.sum())
        if not counts_only:
            # variant-major rows, pair order within variant
            for r in range(codes.shape[0]):
                if not sel[r]:
                    continue
                v = v0 + r
                for pi, (a, b) in enumerate(pairs):
                    ga = int(codes[r, colpos[a]])
                    gb = int(codes[r, colpos[b]])
                    if ga == gb:
                        continue
                    if not include_missing and (ga == 3 or gb == 3):
                        continue
                    rows.append(
                        f"{ci.name(int(ds.vi.chrom[v]))}\t{ds.vi.pos[v]}\t"
                        f"{ds.vi.vid[v]}\t{ds.vi.ref[v]}\t{ds.vi.alt[v]}\t"
                        f"{si.iid[a]}\t{si.iid[b]}\t{_GT[ga]}\t{_GT[gb]}\n"
                    )

    if not counts_only:
        with open(cfg.out + ".sdiff", "w") as f:
            f.write("#CHROM\tPOS\tID\tREF\tALT\tIID1\tIID2\tGT1\tGT2\n")
            f.writelines(rows)
        log.log(f"--sample-diff: Discordances written to {cfg.out}.sdiff .")
    with open(cfg.out + ".sdiff.summary", "w") as f:
        f.write("#IID1\tIID2\tOBS_CT\tDIFF_CT\n")
        for pi, (a, b) in enumerate(pairs):
            f.write(f"{si.iid[a]}\t{si.iid[b]}\t{obs[pi]}\t{diff[pi]}\n")
    log.log(
        f"--sample-diff: Discordance count summary written to "
        f"{cfg.out}.sdiff.summary ."
    )
