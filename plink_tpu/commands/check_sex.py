"""--check-sex / --impute-sex.

Behavior reference: CheckOrImputeSex (2.0/plink2_misc.cc; flag help):
- chrX inbreeding coefficient per sample (the --het F statistic restricted
  to polymorphic chrX variants, with chrX's half-allele male freq
  accounting feeding E(HET));
- chrY valid-call rate (het calls invalid);
- SNPSEX called when every specified threshold for that sex is satisfied;
  with no thresholds, min-male-xf=1 / max-female-yrate=0 defaults apply
  (with a warning, matching the reference).
Output <out>.sexcheck: #[FID\t]IID PEDSEX SNPSEX STATUS F YRATE (default
column set).  --impute-sex additionally overwrites SEX for called samples.
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..ops.counts import sample_plane_weighted
from ..utils.chrom import X_CODE, Y_CODE
from ..utils.fmt import g6
from ..utils.logging import RunLogger
from .basic_reports import alt_allele_freqs


_SEXCHECK_COLS = ("maybefid", "fid", "maybesid", "sid", "pedsex", "status",
                  "xf", "ycount", "yrate", "yobs")
_SEXCHECK_DEFAULT = {"maybefid", "maybesid", "pedsex", "status", "xf",
                     "yrate"}


def _parse_thresholds(args: tuple) -> tuple[dict, set]:
    th = {}
    cols = set(_SEXCHECK_DEFAULT)
    for a in args:
        if a.startswith("cols="):
            spec = a.split("=", 1)[1]
            if spec[:1] in "+-":
                for tok in spec.replace("-", ",-").replace("+", ",+") \
                        .split(","):
                    if not tok:
                        continue
                    if tok[1:] not in _SEXCHECK_COLS:
                        raise ValueError(
                            f"--check-sex cols= unknown set '{tok[1:]}'")
                    (cols.discard if tok[0] == "-" else cols.add)(tok[1:])
            else:
                cols = set()
                for tok in spec.split(","):
                    if tok not in _SEXCHECK_COLS:
                        raise ValueError(
                            f"--check-sex cols= unknown set '{tok}'")
                    cols.add(tok)
            continue
        if "=" in a:
            k, v = a.split("=", 1)
            if k in ("max-female-xf", "min-male-xf", "max-female-ycount",
                     "min-male-ycount", "max-female-yrate", "min-male-yrate",
                     "max-female-fadj", "min-male-fadj"):
                th[k.replace("fadj", "xf")] = float(v)
            else:
                raise ValueError(f"--check-sex: unknown modifier '{a}'")
        else:
            raise ValueError(f"--check-sex: unknown modifier '{a}'")
    return th, cols


def run_check_sex(ds: Dataset, cfg, log: RunLogger, impute: bool) -> None:
    th, cols = _parse_thresholds(cfg.check_sex if not impute else cfg.impute_sex)
    if not th:
        log.log(
            "Warning: --check-sex run with default thresholds (min-male-xf=1, "
            "max-female-yrate=0); inspect the xf/yrate distributions and rerun "
            "with data-derived thresholds."
        )
        th = {"min-male-xf": 1.0, "max-female-yrate": 0.0}
    use_x_male = "min-male-xf" in th
    use_x_female = "max-female-xf" in th
    use_y = any(k in th for k in (
        "max-female-ycount", "min-male-ycount", "max-female-yrate",
        "min-male-yrate",
    ))

    n = ds.raw_sample_ct
    freqs = alt_allele_freqs(ds, founders_only=True)
    with np.errstate(invalid="ignore"):
        ehet = np.nan_to_num(2.0 * freqs * (1.0 - freqs))
    x_sel = ds.variant_mask & (ds.vi.chrom == X_CODE) & (ehet >= 2.0 ** -35)
    y_sel = ds.variant_mask & (ds.vi.chrom == Y_CODE)
    x_ct = int((ds.variant_mask & (ds.vi.chrom == X_CODE)).sum())
    y_ct = int(y_sel.sum())

    total_sel = float(x_sel.sum())
    total_ehet = float(ehet[x_sel].sum())
    miss_ct = np.zeros(n)
    ohet = np.zeros(n)
    miss_ehet = np.zeros(n)
    ycount = np.zeros(n)
    for v0, packed in ds.iter_packed_blocks():
        vct = packed.shape[0]
        z = np.zeros(vct)
        sx = x_sel[v0 : v0 + vct].astype(np.float64)
        sy = y_sel[v0 : v0 + vct].astype(np.float64)
        eh = ehet[v0 : v0 + vct] * sx
        miss_ct += sample_plane_weighted(packed, n, np.stack([z, z, z, sx], 1))
        ohet += sample_plane_weighted(packed, n, np.stack([z, sx, z, z], 1))
        miss_ehet += sample_plane_weighted(packed, n, np.stack([z, z, z, eh], 1))
        # valid chrY call = nonmissing, non-het
        ycount += sample_plane_weighted(packed, n, np.stack([sy, z, sy, z], 1))
    obs = total_sel - miss_ct
    esum = total_ehet - miss_ehet
    with np.errstate(divide="ignore", invalid="ignore"):
        o_hom = obs - ohet
        e_hom = obs - esum
        xf = np.where(obs - e_hom != 0, (o_hom - e_hom) / (obs - e_hom), np.nan)
        yrate = np.where(y_ct > 0, ycount / max(y_ct, 1), np.nan)

    snpsex = np.zeros(n, dtype=np.int8)  # 0 = NA
    for i in range(n):
        male_ok = True
        male_any = False
        if use_x_male:
            male_any = True
            male_ok &= np.isfinite(xf[i]) and xf[i] >= th["min-male-xf"]
        if "min-male-ycount" in th:
            male_any = True
            male_ok &= ycount[i] >= th["min-male-ycount"]
        if "min-male-yrate" in th:
            male_any = True
            male_ok &= np.isfinite(yrate[i]) and yrate[i] >= th["min-male-yrate"]
        female_ok = True
        female_any = False
        if use_x_female:
            female_any = True
            female_ok &= np.isfinite(xf[i]) and xf[i] <= th["max-female-xf"]
        if "max-female-ycount" in th:
            female_any = True
            female_ok &= ycount[i] <= th["max-female-ycount"]
        if "max-female-yrate" in th:
            female_any = True
            female_ok &= np.isfinite(yrate[i]) and yrate[i] <= th["max-female-yrate"]
        m = male_any and male_ok
        f = female_any and female_ok
        if m and not f:
            snpsex[i] = 1
        elif f and not m:
            snpsex[i] = 2

    si = ds.si
    inc = np.flatnonzero(ds.sample_mask)
    # column gating (ref 2.0/plink2_misc.cc:10664-10702): FID forced by
    # 'fid' or maybefid-with-informative-FIDs; x/y statistic columns only
    # when that chromosome was actually used
    use_fid = "fid" in cols or (
        "maybefid" in cols and si.has_fid
        and any(str(si.fid[i]) != "0" for i in inc))
    x_used = x_ct and (use_x_male or use_x_female)
    y_used = y_ct and use_y
    use_sid = "sid" in cols or ("maybesid" in cols and si.sid is not None)
    c_pedsex = "pedsex" in cols
    c_status = "status" in cols
    c_xf = bool(x_used) and "xf" in cols
    c_ycount = bool(y_used) and "ycount" in cols
    c_yrate = bool(y_used) and "yrate" in cols
    c_yobs = bool(y_used) and "yobs" in cols
    path = cfg.out + ".sexcheck"
    problems = 0
    with open(path, "w") as f:
        hdr = ("#FID\tIID" if use_fid else "#IID")
        if use_sid:
            hdr += "\tSID"
        if c_pedsex:
            hdr += "\tPEDSEX"
        hdr += "\tSNPSEX"
        if c_status:
            hdr += "\tSTATUS"
        if c_xf:
            hdr += "\tF"
        if c_ycount:
            hdr += "\tYCOUNT"
        if c_yrate:
            hdr += "\tYRATE"
        if c_yobs:
            hdr += "\tYOBS"
        f.write(hdr + "\n")
        for i in inc:
            ped = int(si.sex[i])
            snp = int(snpsex[i])
            ok = snp != 0 and ped == snp
            if not ok:
                problems += 1
            row = f"{si.fid[i]}\t{si.iid[i]}" if use_fid else str(si.iid[i])
            if use_sid:
                row += "\t" + (str(si.sid[i]) if si.sid is not None else "0")
            if c_pedsex:
                row += f"\t{ped if ped else 'NA'}"
            row += f"\t{snp if snp else 'NA'}"
            if c_status:
                row += "\tOK" if ok else "\tPROBLEM"
            if c_xf:
                row += f"\t{g6(xf[i])}"
            if c_ycount:
                row += f"\t{int(ycount[i])}"
            if c_yrate:
                row += f"\t{g6(yrate[i])}"
            if c_yobs:
                row += f"\t{y_ct}"
            f.write(row + "\n")
    flag = "--impute-sex" if impute else "--check-sex"
    log.log(
        f"{flag}: {x_ct} chrX variants and {y_ct} variants scanned, "
        f"{problems} problems detected.\nReport written to {path} ."
    )
    if impute:
        # imputation REPLACES sex wholesale: uncalled samples become missing
        # (verified against the reference's --impute-sex .psam output)
        ds.si.sex[:] = snpsex
        ds.invalidate_counts()
        log.log(f"--impute-sex: {int((snpsex != 0).sum())} sexes imputed.")
