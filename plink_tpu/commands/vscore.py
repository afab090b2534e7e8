"""--variant-score: per-variant weighted dosage sums.

Behavior reference: Vscore (2.0/plink2_matrix_calc.cc:9274) /
VscoreThread (:8768): input file is sample IDs (#FID/#IID header or
headerless) plus one column per score (names from header or VSCORE1..);
per variant, score_k = sum_s wt_sk * altdosage_vs with missing genotypes
force-mean-imputed to 2*altfreq; --vscore-col-nums selects columns.
Output <out>.vscore: #CHROM POS ID REF ALT <names...>.

chrX/chrY dosage special-casing (:9296) not yet implemented.
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..ops.counts import variant_plane_weighted
from ..utils.fmt import g6
from ..utils.logging import RunLogger
from .basic_reports import alt_allele_freqs
from .score import _parse_col_nums


def run_vscore(ds: Dataset, cfg, log: RunLogger) -> None:
    args = cfg.variant_score
    path = args[0]
    single_prec = "single-prec" in args[1:]
    if "bin" in args[1:] or "bin4" in args[1:]:
        raise NotImplementedError("--variant-score bin output not supported yet")

    with open(path) as f:
        lines = [l.rstrip("\n") for l in f if l.strip()]
    si = ds.si
    first = lines[0]
    if first.startswith("#"):
        toks = first.lstrip("#").split()
        if toks[0] == "FID":
            id_cols = 2
        elif toks[0] == "IID":
            id_cols = 1
        else:
            raise ValueError(
                "--variant-score file header must start with #FID/#IID."
            )
        names = toks[id_cols:]
        body = lines[1:]
    else:
        id_cols = 1
        names = None
        body = lines
    sel = (
        _parse_col_nums(cfg.vscore_col_nums) if getattr(cfg, "vscore_col_nums", None)
        else None
    )

    if id_cols == 2:
        keys = {f"{si.fid[i]}\t{si.iid[i]}": i for i in range(si.sample_ct)}
    else:
        keys = {str(si.iid[i]): i for i in range(si.sample_ct)}
    K = None
    W = None
    miss_ct = 0
    for ln in body:
        t = ln.split()
        key = "\t".join(t[:id_cols])
        wt = t[id_cols:]
        if sel:
            wt = [t[c - 1] for c in sel]
        if K is None:
            K = len(wt)
            if K == 0:
                raise ValueError("No score columns in --variant-score file.")
            W = np.zeros((ds.raw_sample_ct, K))
        i = keys.get(key)
        if i is None:
            miss_ct += 1
            continue
        W[i] = [float(x) for x in wt]
    if names is None:
        names = [f"VSCORE{k + 1}" for k in range(K)]
    elif sel:
        names = [names[c - 1 - id_cols] for c in sel]

    # restrict to included samples
    W = W * ds.sample_mask[:, None]
    wtot = W.sum(axis=0)
    freqs = np.nan_to_num(alt_allele_freqs(ds, founders_only=not cfg.nonfounders))

    out = cfg.out + ".vscore"
    f = open(out, "w")
    f.write("#CHROM\tPOS\tID\tREF\tALT\t" + "\t".join(names) + "\n")
    vi = ds.vi
    chrom_names = [vi.chr_info.name(c) for c in vi.chrom]
    vmask = ds.variant_mask
    for v0, packed in ds.iter_packed_blocks():
        vct = packed.shape[0]
        pw = variant_plane_weighted(
            packed, ds.raw_sample_ct, W, f64=not single_prec
        )
        fblk = freqs[v0 : v0 + vct]
        score = (
            pw[:, :, 0] + 2.0 * pw[:, :, 1]
            + (wtot[None, :] - pw[:, :, 2]) * (2.0 * fblk[:, None])
        )
        rows = []
        for j in range(vct):
            v = v0 + j
            if not vmask[v]:
                continue
            rows.append(
                f"{chrom_names[v]}\t{vi.pos[v]}\t{vi.vid[v]}\t{vi.ref[v]}\t"
                f"{vi.alt[v]}\t"
                + "\t".join(g6(score[j, k]) for k in range(len(names)))
                + "\n"
            )
        f.writelines(rows)
    f.close()
    if miss_ct:
        log.log(
            f"Warning: --variant-score: {miss_ct} line(s) skipped "
            "(unmatched sample ID)."
        )
    log.log(f"--variant-score: Results written to {out} .")
