"""--pheno-svd <k | variance=...>: phenotype-matrix SVD.

Behavior reference: PhenoSvd (2.0/plink2_matrix_calc.h:210-220,
implementation in plink2_misc.cc).  The oracle build lacks LAPACK and
cannot run this command, so output layout follows the documented format:
<out>.pheno_svd.pheno holds the top singular-vector projections as new
quantitative phenotypes SV1..SVk over samples with every input phenotype
present, and <out>.pheno_svd.wts the per-phenotype weight matrix.
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..utils.fmt import g6
from ..utils.logging import RunLogger


def run_pheno_svd(ds: Dataset, cfg, log: RunLogger) -> None:
    args = cfg.pheno_svd
    k = None
    min_var = None
    for a in args:
        if a.startswith("variance="):
            min_var = float(a.split("=", 1)[1])
        elif a.isdigit():
            k = int(a)
    names = [n for n, pc in ds.si.phenos.items() if pc.kind == "qt"]
    if len(names) < 2:
        raise ValueError("--pheno-svd requires multiple quantitative phenotypes.")
    cols = [ds.si.phenos[n] for n in names]
    keep = ds.sample_mask.copy()
    for pc in cols:
        keep &= pc.nonmiss
    inc = np.flatnonzero(keep)
    y = np.stack([pc.data[inc] for pc in cols], axis=1)
    u, s, vt = np.linalg.svd(y, full_matrices=False)
    var_frac = (s ** 2) / (s ** 2).sum()
    if k is None:
        if min_var is not None:
            k = int(np.searchsorted(np.cumsum(var_frac), min_var) + 1)
        else:
            k = min(len(names), 8)
    k = min(k, len(s))
    si = ds.si
    use_fid = si.has_fid and any(str(si.fid[i]) != "0" for i in inc)
    ppath = cfg.out + ".pheno_svd.pheno"
    with open(ppath, "w") as f:
        f.write(("#FID\tIID" if use_fid else "#IID")
                + "".join(f"\tSV{j + 1}" for j in range(k)) + "\n")
        proj = u[:, :k] * s[:k]
        for r, i in enumerate(inc):
            idp = f"{si.fid[i]}\t{si.iid[i]}" if use_fid else str(si.iid[i])
            f.write(idp + "".join("\t" + g6(x) for x in proj[r]) + "\n")
    wpath = cfg.out + ".pheno_svd.wts"
    with open(wpath, "w") as f:
        f.write("#PHENO" + "".join(f"\tSV{j + 1}" for j in range(k)) + "\n")
        for pi, nm in enumerate(names):
            f.write(nm + "".join("\t" + g6(vt[j, pi]) for j in range(k)) + "\n")
    log.log(
        f"--pheno-svd: {k} component{'s' if k != 1 else ''} over "
        f"{len(names)} phenotypes written to {ppath} + {wpath} ."
    )
