"""--pgen-diff: hardcall differences between two filesets.

Behavior reference: PgenDiff (2.0/plink2_merge.h:157; flag help).
Variants compared when ID AND position match (error on non-unique match);
samples matched by ID.  Missing-vs-nonmissing is not a difference unless
'include-missing'.  Output <out>.pdiff with default columns
#ID IID GT1 GT2.  Dosage mode not yet implemented.
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset, load_dataset
from ..utils.logging import RunLogger

_GT = {0: "0/0", 1: "0/1", 2: "1/1", 3: "./."}


def run_pgen_diff(ds: Dataset, cfg, log: RunLogger) -> None:
    args = list(cfg.pgen_diff)
    include_missing = "include-missing" in args
    paths = [a for a in args if not a.startswith(("include-missing", "zs", "dosage", "cols="))]
    if len(paths) == 1:
        ds2 = load_dataset(paths[0])
    elif len(paths) == 3:
        import os
        import shutil
        import tempfile

        # explicit triple: stage under a common prefix for the loader
        tmpd = tempfile.mkdtemp(prefix="pdiff")
        pre = os.path.join(tmpd, "b")
        for src, ext in zip(paths, (".pgen", ".pvar", ".psam")):
            shutil.copy(src, pre + ext)
        ds2 = load_dataset(pre)
    else:
        raise ValueError("--pgen-diff requires a prefix or .pgen/.pvar/.psam paths")

    # sample intersection by IID (respecting the primary fileset's filters)
    iid2 = {str(ds2.si.iid[i]): i for i in range(ds2.si.sample_ct)}
    s1, s2, iids = [], [], []
    for i in np.flatnonzero(ds.sample_mask):
        j = iid2.get(str(ds.si.iid[i]))
        if j is not None:
            s1.append(i)
            s2.append(j)
            iids.append(str(ds.si.iid[i]))
    if not s1:
        raise ValueError("No matching samples in --pgen-diff fileset.")
    s1 = np.array(s1)
    s2 = np.array(s2)

    # variant matching by (ID, POS)
    key2 = {}
    for j in range(ds2.vi.variant_ct):
        k = (str(ds2.vi.vid[j]), int(ds2.vi.pos[j]))
        if k in key2:
            raise ValueError(f"--pgen-diff: duplicate variant match {k}")
        key2[k] = j
    v1, v2 = [], []
    for i in np.flatnonzero(ds.variant_mask):
        j = key2.get((str(ds.vi.vid[i]), int(ds.vi.pos[i])))
        if j is not None:
            v1.append(i)
            v2.append(j)
    from ..ops.pairwise import _unpack_np

    rows = []
    diff_ct = 0
    for i, j in zip(v1, v2):
        g1 = _unpack_np(ds.reader.read_packed(int(i), 1))[0][: ds.raw_sample_ct][s1]
        g2 = _unpack_np(ds2.reader.read_packed(int(j), 1))[0][: ds2.raw_sample_ct][s2]
        if include_missing:
            d = g1 != g2
        else:
            d = (g1 != g2) & (g1 != 3) & (g2 != 3)
        for k in np.flatnonzero(d):
            rows.append(
                f"{ds.vi.vid[i]}\t{iids[k]}\t{_GT[int(g1[k])]}\t{_GT[int(g2[k])]}\n"
            )
            diff_ct += 1
    path = cfg.out + ".pdiff"
    with open(path, "w") as f:
        f.write("#ID\tIID\tGT1\tGT2\n")
        f.writelines(rows)
    log.log(f"--pgen-diff: {diff_ct} difference(s) written to {path} .")
