"""--pheno-svd <k | variance=<frac>> ['force']: phenotype-matrix SVD.

Behavior reference: PhenoSvd (2.0/plink2_matrix_calc.cc:10120-10400).
The raw (uncentered) phenotype-by-sample matrix A [p, n] — qt values
as-is, case/control encoded 0/1 via kSmallDoubles — is factored
A = U S V^T over the samples with every phenotype present:

- <out>.svd.pheno:   per-sample rows of V (unit-norm right singular
  vectors), columns SVDPHENO1..k;
- <out>.svd.pheno_wts: one row per new phenotype with its singular value
  and the U column entries against each original phenotype name;
- the in-memory phenotype set is REPLACED by SVDPHENO1..k so downstream
  commands (e.g. --glm) run on the projections, matching the reference's
  early-driver call position (2.0/plink2.cc:1899).
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..io.psam import PhenoCol
from ..utils.fmt import g6
from ..utils.logging import RunLogger


def run_pheno_svd(ds: Dataset, cfg, log: RunLogger) -> None:
    args = cfg.pheno_svd
    k = 0
    min_var = None
    force = False
    for a in args:
        if a.startswith("variance="):
            min_var = float(a.split("=", 1)[1])
        elif a == "force":
            force = True
        elif a.isdigit():
            k = int(a)
    names = list(ds.si.phenos.keys())
    if len(names) < 2:
        raise ValueError(
            "--pheno-svd invoked "
            + ("with only 1 phenotype" if names else "without any phenotypes")
            + "."
        )
    cols = [ds.si.phenos[n] for n in names]
    for n, pc in zip(names, cols):
        if pc.kind == "cat":
            raise ValueError(
                f"--pheno-svd: phenotype '{n}' is categorical; it must be "
                "preprocessed with e.g. --split-cat-pheno."
            )
    keep = ds.sample_mask.copy()
    for pc in cols:
        keep &= pc.nonmiss
    inc = np.flatnonzero(keep)
    n = inc.size
    orig_n = int(np.count_nonzero(ds.sample_mask))
    if n * 2 < orig_n and not force:
        raise ValueError(
            f"--pheno-svd: Only {n}/{orig_n} sample"
            f"{'' if n == 1 else 's'} have no missing phenotype values. "
            "Consider imputing some missing phenotype values, and/or "
            "excluding phenotypes with many missing values."
        )
    # A [p, n]: qt raw, cc as 0/1 (ref kSmallDoubles[IsSet(pheno_cc)])
    rows = []
    for pc in cols:
        if pc.kind == "cc":
            rows.append(pc.data[inc].astype(np.float64))
        else:
            rows.append(pc.data[inc].astype(np.float64))
    A = np.stack(rows, axis=0)
    svd_dim = min(len(names), n)
    if k and svd_dim < k:
        raise ValueError(
            f"--pheno-svd {k} invoked with only "
            + (f"{len(names)} phenotypes." if svd_dim == len(names)
               else f"{n} samples.")
        )
    u, s, vt = np.linalg.svd(A, full_matrices=False)  # u [p,dim], vt [dim,n]
    if not k:
        if min_var is None or min_var >= 1.0:
            k = svd_dim
        else:
            target = min_var * float(np.dot(s, s))
            ssq = 0.0
            k = 0
            while True:
                ssq += float(s[k]) * float(s[k])
                k += 1
                if ssq >= target:
                    break
        log.log(
            f"--pheno-svd variance={min_var:g}: {k}/{svd_dim} phenotype"
            f"{'' if k == 1 else 's'} kept."
        )

    si = ds.si
    use_fid = si.has_fid and any(str(si.fid[i]) != "0" for i in inc)
    ppath = cfg.out + ".svd.pheno"
    with open(ppath, "w") as f:
        f.write(("#FID\tIID" if use_fid else "#IID")
                + "".join(f"\tSVDPHENO{j + 1}" for j in range(k)) + "\n")
        for r, i in enumerate(inc):
            idp = f"{si.fid[i]}\t{si.iid[i]}" if use_fid else str(si.iid[i])
            f.write(idp + "".join("\t" + g6(vt[j, r]) for j in range(k))
                    + "\n")
    wpath = cfg.out + ".svd.pheno_wts"
    with open(wpath, "w") as f:
        f.write("#NEW_PHENO_ID\tSINGULAR_VALUE\t" + "\t".join(names) + "\n")
        for j in range(k):
            f.write(f"SVDPHENO{j + 1}\t" + g6(s[j])
                    + "".join("\t" + g6(u[pi, j]) for pi in range(len(names)))
                    + "\n")
    log.log(f"--pheno-svd: Results written to {ppath} + {ppath}_wts .")

    # replace the loaded phenotype set with the projections (ref
    # PhenoSvd tail: pheno_cols rewritten to SVDPHENO1..k)
    raw_n = ds.raw_sample_ct
    new_phenos = {}
    for j in range(k):
        data = np.zeros(raw_n, np.float64)
        data[inc] = vt[j]
        new_phenos[f"SVDPHENO{j + 1}"] = PhenoCol(
            f"SVDPHENO{j + 1}", "qt", data, keep.copy()
        )
    ds.si.phenos.clear()
    ds.si.phenos.update(new_phenos)
