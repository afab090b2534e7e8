"""--make-perm-pheno: write permuted phenotype columns.

Behavior reference: make_perm_pheno (1.9/plink_perm.c:709-880).
Case/control phenos use the Floyd-style rejection sampler
(generate_cc_perm1); quantitative phenos the column-parallel
Fisher-Yates (generate_qt_perms_smajor_thread); --within restricts
permutations to clusters of size >= 2.  Byte-identical to 1.9 for a
given --seed/--threads pair.
"""

from __future__ import annotations

import numpy as np

from ..cli import FlagError
from ..dataset import Dataset
from ..stats.perm19 import (cc_perm_matrix, master_sfmt,
                            qt_perm_matrix, reindex_clusters_19)
from ..utils.fmt import dtoa_g
from ..utils.logging import RunLogger


def run_make_perm_pheno(ds: Dataset, cfg, log: RunLogger) -> None:
    perm_ct = cfg.make_perm_pheno
    si = ds.si
    pc = next(iter(si.phenos.values()), None)
    if pc is None:
        raise FlagError(
            "--make-perm-pheno requires phenotype data.")
    n = ds.raw_sample_ct
    inc = np.flatnonzero(ds.sample_mask[:n])
    nm_mask = pc.nonmiss[:n] & ds.sample_mask[:n]
    nm_idx = np.flatnonzero(nm_mask)
    if nm_idx.size == 0:
        raise FlagError(
            "--make-perm-pheno requires phenotype data.")
    threads = min(cfg.threads or 1, perm_ct)
    master = master_sfmt(cfg)

    clusters_cc = clusters_qt = None
    if cfg.within or cfg.family:
        from .cmh import load_clusters_19

        _names, assign = load_clusters_19(ds, cfg)
        assign_nm = assign[nm_idx]
        is_cc = pc.kind == "cc"
        case_nm = (pc.data[nm_idx] == 1) if is_cc else None
        members, case_cts, preimage, s2c = reindex_clusters_19(
            assign_nm, case_nm)
        if not members:
            raise FlagError(
                "Degenerate --make-perm-pheno invocation (no size 2+ "
                "clusters).")
        if is_cc:
            clusters_cc = (members, case_cts, preimage)
        else:
            clusters_qt = (members, s2c)

    if pc.kind == "cc":
        case_nm = pc.data[nm_idx] == 1
        vecs = cc_perm_matrix(case_nm, perm_ct, threads, master,
                              clusters_cc)       # [perm_ct, n_nm]
    else:
        vals = pc.data[nm_idx].astype(np.float64)
        vecs = qt_perm_matrix(vals, perm_ct, threads, master,
                              clusters_qt)       # [n_nm, perm_ct]

    miss = cfg.missing_phenotype_str \
        if getattr(cfg, "missing_phenotype_str", None) else "-9"
    out = cfg.out + ".pphe"
    nmpos = {int(u): k for k, u in enumerate(nm_idx)}
    with open(out, "w") as fh:
        for u in inc:
            u = int(u)
            fh.write(f"{si.fid[u]}\t{si.iid[u]}")
            k = nmpos.get(u)
            if k is None:
                fh.write(("\t" + miss) * perm_ct)
            elif pc.kind == "cc":
                fh.write("".join(
                    "\t2" if vecs[p, k] else "\t1"
                    for p in range(perm_ct)))
            else:
                fh.write("".join(
                    "\t" + dtoa_g(vecs[k, p])
                    for p in range(perm_ct)))
            fh.write("\n")
    log.log(f"--make-perm-pheno: Permuted phenotypes written to "
            f"{out} .")
