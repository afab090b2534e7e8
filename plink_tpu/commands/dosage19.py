"""1.9 --dosage: dosage-file association / occurrence-count / rewrite.

Behavior reference: plink1_dosage (1.9/plink_dosage.c:486-2368), a
self-contained loader that never touches .bed data: a .fam (and optional
.map) define samples/variants, and one or more dosage files supply
imputed allele dosages.  Modes:
  * association (default): logistic (cc, bit-exact float IRLS — see
    stats/glm19f.py) or linear (qt) regression of phenotype on the
    0..1-scale A1 dosage, -> .assoc.dosage;
  * 'occur': per-variant occurrence counts across files -> .occur.dosage;
  * 'write': merge + reformat -> .out.dosage.
Modifiers: format=1/2/3, skip0/skip1/skip2=N, noheader, dose1, Zout,
sex, case-control-freqs, list/sepheader (multi-file batches).

INFO = empirical/theoretical variance ratio and the 0.0099/0.1..2.0
validity gates replicate plink_dosage.c:1929-1956 exactly.
"""

from __future__ import annotations

import gzip
import math

import numpy as np

from ..cli import FlagError
from ..utils.logging import RunLogger

DOSAGE_EPSILON = 1e-6


def _open_auto(path: str):
    with open(path, "rb") as probe:
        magic = probe.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, "rt")
    return open(path)


def _f74(x: float) -> str:
    from .meta import _f74 as f

    return f(x)


def _fw(s: str, w: int) -> str:
    return s.rjust(w)


class DosageConfig:
    def __init__(self, cfg):
        args = list(cfg.dosage)
        self.fname = args[0]
        mods = args[1:]
        self.format = 2
        self.skip0 = self.skip1 = self.skip2 = 0
        self.noheader = self.sepheader = self.list_mode = False
        self.dose1 = self.zout = self.occur = self.sex = False
        self.freq_cc = False
        self.write = False
        for m in mods:
            if m == "noheader":
                self.noheader = True
            elif m == "sepheader":
                self.sepheader = True
            elif m == "list":
                self.list_mode = True
            elif m == "dose1":
                self.dose1 = True
            elif m == "Zout":
                self.zout = True
            elif m == "occur":
                self.occur = True
            elif m == "sex":
                self.sex = True
            elif m in ("case-control-freqs", "frq-cc"):
                self.freq_cc = True
            elif m.startswith("format="):
                self.format = int(m.split("=")[1])
                if self.format not in (1, 2, 3):
                    raise FlagError("--dosage format= must be 1, 2, or 3.")
            elif m.startswith("skip0="):
                self.skip0 = int(m.split("=")[1])
            elif m.startswith("skip1="):
                self.skip1 = int(m.split("=")[1])
            elif m.startswith("skip2="):
                self.skip2 = int(m.split("=")[1])
            else:
                raise FlagError(f"Invalid --dosage modifier '{m}'.")
        if self.dose1 and self.format != 1:
            raise FlagError(
                "--dosage 'dose1' modifier requires format=1.")
        if self.sepheader and not self.list_mode:
            raise FlagError(
                "--dosage 'sepheader' modifier requires 'list'.")


def _parse_line_dosages(toks, a2_pos, read_map, fmt, dose1, n):
    """One dosage line's per-sample fields -> (dosage [n] float64,
    valid [n] bool) on the 0..1 A1-diplotype scale
    (plink_dosage.c:1864-1916).

    read_map entries are (sample_idx, skip): token steps from the
    previously consumed token, mirroring the reference's skip_vals
    (initially from the A2 column)."""
    dos = np.zeros(n)
    valid = np.ones(n, bool)
    pos = a2_pos
    for si, skip in read_map:
        pos += skip
        if fmt == 1:
            try:
                dxx = float(toks[pos])
            except ValueError:
                valid[si] = False
                continue
            if not dose1:
                dxx *= 0.5
            if dxx > 1.0 + DOSAGE_EPSILON or dxx < 0.0:
                valid[si] = False
                continue
            dos[si] = min(dxx, 1.0)
        else:
            try:
                dxx = float(toks[pos])
                dyy = float(toks[pos + 1])
            except ValueError:
                pos += 1
                valid[si] = False
                continue
            pos += 1
            dzz = dxx + dyy
            if dyy < 0.0 or dxx < 0.0 or dzz > 1.0 + DOSAGE_EPSILON:
                valid[si] = False
                continue
            if dzz > 1.0:
                dzz = 1.0 / dzz
                dxx *= dzz
                dyy *= dzz
            dos[si] = dxx + dyy * 0.5
    return dos, valid


def run_dosage(cfg, log: RunLogger) -> None:
    from ..io.ped import read_tfam
    from ..stats.glm19f import glm_linear_dosage, glm_logistic_dosage
    from ..utils.chrom import ChrInfo
    from .assoc19 import _g4

    dcfg = DosageConfig(cfg)
    if dcfg.list_mode:
        raise NotImplementedError(
            "--dosage 'list'/'sepheader' multi-file batches are not "
            "supported yet; run per-file and combine.")
    if not cfg.fam:
        raise FlagError("--dosage requires --fam.")
    si = read_tfam(cfg.fam)
    n = si.sample_ct
    # phenotype: fam column 6, overridden by --pheno (FID IID PHENO)
    pc = next(iter(si.phenos.values()), None)
    if cfg.pheno:
        from ..io.psam import PhenoCol

        vals = {}
        with open(cfg.pheno) as pf:
            for line in pf:
                t = line.split()
                if not t or t[0] in ("#FID", "FID", "#IID"):
                    continue
                vals[(t[0], t[1])] = t[2]
        raw = np.array(
            [vals.get((str(si.fid[i]), str(si.iid[i])), "-9")
             for i in range(n)], object)
        fv = np.array([float(x) if x not in ("NA", "na") else -9.0
                       for x in raw])
        nonmiss = fv != -9.0
        # 1.9 auto-detection: all nonmissing values in {0,1,2} -> cc
        if np.all(np.isin(fv[nonmiss], (0.0, 1.0, 2.0))):
            data = (fv == 2.0).astype(np.int8)
            nonmiss &= np.isin(fv, (1.0, 2.0))
            pc = PhenoCol("PHENO1", "cc", data, nonmiss)
        else:
            pc = PhenoCol("PHENO1", "qt", fv, nonmiss)
    if pc is None:
        raise FlagError("--dosage association requires phenotype data.")
    is_cc = pc.kind == "cc"
    pheno_nm = pc.nonmiss[:n].copy()
    if dcfg.sex:
        # sex covariate: 1 = male, 0 = female; missing-sex samples dropped
        pheno_nm &= si.sex[:n] != 0
        sex_cov = (si.sex[:n] == 1).astype(np.float64)

    load_map = cfg.map is not None
    ci = ChrInfo()
    map_info = {}
    if load_map:
        with open(cfg.map) as f:
            for line in f:
                t = line.split()
                if not t or len(t) < 4:
                    continue
                map_info[t[1]] = (ci.code(t[0]), int(t[3]))

    out_gz = ".gz" if dcfg.zout else ""
    if dcfg.occur:
        path = cfg.out + ".occur.dosage" + out_gz
    elif dcfg.write:
        path = cfg.out + ".out.dosage" + out_gz
    else:
        path = cfg.out + ".assoc.dosage" + out_gz

    fh = gzip.open(path, "wt") if dcfg.zout else open(path, "w")
    occur_counts: dict[str, int] = {}
    try:
        f = _open_auto(dcfg.fname)
        # header -> read_map: list of (sample_idx, skip) in column order
        fmt = dcfg.format
        per = 1 + (fmt == 3)
        read_map = []
        if dcfg.noheader:
            skip = 1 + dcfg.skip2
            for i in range(n):
                read_map.append((i, skip))
                skip = per
        else:
            hdr = f.readline().split()
            p0 = dcfg.skip0
            if hdr[p0] != "SNP":
                raise ValueError(
                    f"Column {p0 + 1} of {dcfg.fname}'s header isn't "
                    "'SNP'.")
            if hdr[p0 + dcfg.skip1 + 1] != "A1":
                raise ValueError(
                    f"Column {p0 + dcfg.skip1 + 2} of {dcfg.fname}'s "
                    "header isn't 'A1'.")
            if hdr[p0 + dcfg.skip1 + 2] != "A2":
                raise ValueError(
                    f"Column {p0 + dcfg.skip1 + 3} of {dcfg.fname}'s "
                    "header isn't 'A2'.")
            ids = {}
            for i in range(n):
                ids[(str(si.fid[i]), str(si.iid[i]))] = i
            col = p0 + dcfg.skip1 + 3 + dcfg.skip2
            toks = hdr[col:]
            if len(toks) % 2:
                raise ValueError(
                    f"Header of {dcfg.fname} has an odd number of tokens "
                    "in the FID/IID section.")
            seen = set()
            skip = 1 + dcfg.skip2
            for k in range(0, len(toks), 2):
                key = (toks[k], toks[k + 1])
                i = ids.get(key)
                if i is None:
                    skip += per
                    continue
                if i in seen:
                    raise ValueError(
                        f"'{toks[k]} {toks[k + 1]}' appears multiple "
                        "times.")
                seen.add(i)
                read_map.append((i, skip))
                skip = per
            missing_ids = n - len(seen)
            if missing_ids:
                log.log(
                    f"Warning: {missing_ids} sample ID"
                    f"{'' if missing_ids == 1 else 's'} present in .fam "
                    "file but missing from dosage file.")

        in_file = np.zeros(n, bool)
        for i, _s in read_map:
            in_file[i] = True

        if dcfg.occur:
            for line in f:
                t = line.split()
                if not t:
                    continue
                vid = t[dcfg.skip0]
                occur_counts[vid] = occur_counts.get(vid, 0) + 1
            for vid, ct in occur_counts.items():
                fh.write(f"{vid} {ct}\n")
            log.log(f"--dosage occurrence counts written to {path} .")
            return

        # association header
        if not dcfg.write:
            hdr_s = (" CHR         SNP          BP" if load_map
                     else "         SNP")
            hdr_s += ("  A1  A2   FRQ_A   FRQ_U    INFO    "
                      if dcfg.freq_cc else "  A1  A2     FRQ    INFO    ")
            hdr_s += ("  OR" if is_cc else "BETA") + "      SE       P"
            fh.write(hdr_s + "\n")
        else:
            fh.write("SNP A1 A2 " + "".join(
                f"{si.fid[i]} {si.iid[i]} " for i, _ in read_map) + "\n")

        idcol = dcfg.skip0
        a1col = idcol + dcfg.skip1 + 1
        a2_pos = a1col + 1
        y_full = pc.data[:n].astype(np.float64)
        case_full = (pc.data[:n] == 1) if is_cc else None
        for line in f:
            toks = line.split()
            if not toks:
                continue
            vid = toks[idcol]
            a1 = toks[a1col]
            a2 = toks[a1col + 1]
            if load_map and vid not in map_info:
                continue
            dos, valid = _parse_line_dosages(
                toks, a2_pos, read_map, fmt, dcfg.dose1, n)
            if dcfg.write:
                fh.write(f"{vid} {a1} {a2}")
                for i, _s in read_map:
                    fh.write(" %g" % (dos[i] * (2.0 if not dcfg.dose1
                                                else 1.0)))
                fh.write("\n")
                continue
            cur = in_file & valid & pheno_nm
            vct = int(cur.sum())
            d = dos[cur]
            sample_valid_ct_recip = 1.0 / vct if vct else 0.0
            dxx = float(d.sum())
            dyy = float((d * d).sum())
            dzz = dxx * sample_valid_ct_recip   # A1 frequency
            dyy -= dxx * dzz                    # ssq about the mean
            theo = dzz * (1.0 - dzz)
            emp = 2 * dyy * sample_valid_ct_recip
            rsq = (emp / theo) if theo > 0.0 else 0.0
            res = None
            if theo >= 0.0098999999999999 and 0.1 <= rsq <= 2.0:
                cov = None
                if dcfg.sex:
                    cov = sex_cov[cur].reshape(-1, 1)
                if is_cc:
                    res = glm_logistic_dosage(
                        d, case_full[cur].astype(np.float64), cov)
                else:
                    res = glm_linear_dosage(d, y_full[cur], cov)
            elif rsq > 2.0:
                rsq = 2.0
            row = ""
            if load_map:
                code, bp = map_info[vid]
                row += _fw(ci.name19(code), 4) + " "
                row += _fw(vid, 11) + "  " + _fw(str(bp), 10)
            else:
                row += " " + _fw(vid, 11)
            row += " " + _fw(a1, 3) + " " + _fw(a2, 3) + " "
            if dcfg.freq_cc and is_cc:
                cs = case_full[:n] & cur
                ct = ~case_full[:n] & cur & pc.nonmiss[:n]
                ncs = int(cs.sum())
                nct = vct - ncs
                row += (_f74(float(dos[cs].sum()) / ncs) if ncs
                        else "     NA") + " "
                row += (_f74(float(dos[ct].sum()) / nct) if nct
                        else "     NA")
            else:
                row += _f74(dzz)
                if dcfg.freq_cc:
                    row += " " + _f74(dzz)
            row += " " + _f74(rsq) + " "
            if res is not None:
                beta, se, pval = res
                row += _f74(math.exp(beta * 0.5) if is_cc
                            else beta * 0.5) + " "
                row += _f74(se * 0.5) + " "
                row += _g4(max(pval, 0.0), 7)
            else:
                row += "     NA      NA      NA"
            fh.write(row + "\n")
        if not dcfg.write:
            log.log(f"--dosage association results written to {path} .")
        else:
            log.log(f"--dosage data written to {path} .")
    finally:
        fh.close()
