"""--test-missing: case/control missingness Fisher test, PLINK 1.9
parity.

Behavior reference: testmiss (1.9/plink_assoc.c:9971-10260) and
fisher22 (1.9/plink_stats.c:771).

Per variant: missing-call counts among nonmissing-phenotype cases and
controls (chrY restricted to males; het-haploid calls on X/Y treated
as missing per haploid_fix), two-sided Fisher exact p (optional midp),
written to <out>.missing.  Sites with zero or all-missing calls are
skipped.  Permutation modes are not implemented yet.
"""

from __future__ import annotations

import numpy as np

from ..cli import FlagError
from ..dataset import Dataset
from ..stats.binom19 import fisher22
from ..utils.chrom import MT_CODE, X_CODE, Y_CODE
from ..utils.logging import RunLogger
from .homozyg import _fw_width
from .assoc19 import _fw, _g4


def run_test_missing(ds: Dataset, cfg, log: RunLogger) -> None:
    mods = set(cfg.test_missing)
    midp = "midp" in mods
    for m in mods - {"midp"}:
        if m in ("perm", "perm-count") or m.startswith("mperm"):
            raise FlagError(
                "--test-missing permutation is not implemented yet.")
        raise FlagError(f"Invalid --test-missing modifier '{m}'.")
    si, vi = ds.si, ds.vi
    pc = next(iter(si.phenos.values()), None)
    if pc is None or pc.kind != "cc":
        raise FlagError(
            "--test-missing requires a case/control phenotype.")
    pheno_nm = pc.nonmiss & ds.sample_mask
    case = pheno_nm & (pc.data == 1)
    case_ct = int(case.sum())
    ctrl_ct = int(pheno_nm.sum()) - case_ct
    if not case_ct or not ctrl_ct:
        log.log(
            "Warning: Skipping --test-missing since at least one case "
            "and one control is required.")
        return
    male = ds.male_mask()
    male_nm = pheno_nm & male
    case_y = int((case & male).sum())
    ctrl_y = int(male_nm.sum()) - case_y
    skip_y = not (case_y and ctrl_y)
    if skip_y and (vi.chrom == Y_CODE).any():
        log.log(
            "Warning: --test-missing is skipping Y chromosome since at "
            "least one male case and one male control are necessary.")

    from ..ops.pairwise import _unpack_np

    codes = _unpack_np(ds.all_packed())[:, : ds.raw_sample_ct]
    maxsnp = _fw_width(
        len(str(vi.vid[i])) for i in np.flatnonzero(ds.variant_mask))
    ci = vi.chr_info
    out = cfg.out + ".missing"
    fh = open(out, "w")
    fh.write(" CHR " + "SNP".rjust(maxsnp)
             + "     F_MISS_A     F_MISS_U            P \n")
    case_recip = 1.0 / case_ct
    ctrl_recip = 1.0 / ctrl_ct
    case_y_recip = 1.0 / case_y if case_y else 0.0
    ctrl_y_recip = 1.0 / ctrl_y if ctrl_y else 0.0
    n = ds.raw_sample_ct
    for v in np.flatnonzero(ds.variant_mask):
        chrom = int(vi.chrom[v])
        is_x = chrom == X_CODE
        is_y = chrom == Y_CODE
        if is_y and skip_y:
            continue
        row = codes[v]
        if is_x:
            # haploid_fix: male het -> missing
            miss = (row == 3) | ((row == 1) & male[:n])
        elif is_y:
            # hh_reset_y: nonmales forced missing; male hets missing
            miss = (row == 3) | (row == 1) | ~male[:n]
        else:
            miss = row == 3
        if is_y:
            cur_nm = male_nm
            cur_case, cur_ctrl = case_y, ctrl_y
            cr, ur = case_y_recip, ctrl_y_recip
            cur_case_mask = case & male
        else:
            cur_nm = pheno_nm
            cur_case, cur_ctrl = case_ct, ctrl_ct
            cr, ur = case_recip, ctrl_recip
            cur_case_mask = case
        mct = int((miss & cur_nm[:n]).sum())
        if not mct or mct == int(cur_nm.sum()):
            continue
        uii = int((miss & cur_case_mask[:n]).sum())
        ujj = mct - uii
        pval = fisher22(uii, ujj, cur_case - uii, cur_ctrl - ujj, midp)
        line = (_fw(ci.name19(chrom), 4) + " "
                + _fw(str(vi.vid[v]), maxsnp) + " "
                + _g4(uii * cr, 12) + " " + _g4(ujj * ur, 12) + " "
                + _g4(max(pval, 0.0), 12))
        fh.write(line + "\n")
    fh.close()
    log.log(f"Writing --test-missing report to {out} ... done.")
