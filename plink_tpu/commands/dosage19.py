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
        if getattr(cfg, "write_dosage", False):
            if self.occur:
                raise FlagError(
                    '--write-dosage cannot be used with "--dosage occur".')
            self.write = True


def _parse_line_dosages(toks, a2_pos, read_map, fmt, dose1, n,
                        raw2=None):
    """One dosage line's per-sample fields -> (dosage [n] float64,
    valid [n] bool) on the 0..1 A1-diplotype scale
    (plink_dosage.c:1864-1916).

    read_map entries are (sample_idx, skip): token steps from the
    previously consumed token, mirroring the reference's skip_vals
    (initially from the A2 column).  With raw2 = ([n], [n]) arrays, the
    rescaled p1/p2 pair is also stored (--write-dosage keeps the raw
    probabilities, :1908-1912)."""
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
            if raw2 is not None:
                raw2[0][si] = dxx
                raw2[1][si] = dyy
            dos[si] = dxx + dyy * 0.5
    return dos, valid


def run_dosage(cfg, log: RunLogger) -> None:
    from ..io.ped import read_tfam
    from ..stats.glm19f import glm_linear_dosage, glm_logistic_dosage
    from ..utils.chrom import ChrInfo
    from .assoc19 import _g4

    dcfg = DosageConfig(cfg)
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

    # --- file list / batches (plink_dosage.c:1190-1345) ------------------
    # each batch: list of (dosage_fname, sepheader_fname|None); files in a
    # batch hold the SAME variants in the same order for disjoint sample
    # sets; batches are ordered by ascending batch number
    if dcfg.list_mode:
        rows_ = []
        with open(dcfg.fname) as lf:
            for li, ln in enumerate(lf):
                t = ln.split()
                if not t:
                    continue
                ncol = len(t)
                want = 1 + (1 if dcfg.sepheader else 0)
                if ncol == want:
                    rows_.append((None, t[0], t[1] if dcfg.sepheader
                                  else None))
                elif ncol == want + 1:
                    try:
                        bno = int(t[0])
                    except ValueError:
                        raise ValueError(
                            f"Invalid batch number on line {li + 1} of "
                            "--dosage list file.")
                    rows_.append((bno, t[1], t[2] if dcfg.sepheader
                                  else None))
                else:
                    raise ValueError(
                        f"Line {li + 1} of --dosage list file has an "
                        "unexpected number of tokens.")
        if not rows_:
            raise ValueError("Empty --dosage list file.")
        if any(r[0] is not None for r in rows_):
            if any(r[0] is None for r in rows_):
                raise ValueError(
                    "Unexpected number of columns in --dosage list file.")
            batch_nos = sorted(set(r[0] for r in rows_))
            batches = [[(r[1], r[2]) for r in rows_ if r[0] == b]
                       for b in batch_nos]
        else:
            batches = [[(r[1], r[2]) for r in rows_]]
    else:
        batches = [[(dcfg.fname, None)]]

    fmt = dcfg.format
    per = 1 + (fmt == 3)
    ids = {}
    for i in range(n):
        ids[(str(si.fid[i]), str(si.iid[i]))] = i

    def _header_read_map(f, fname):
        """Parse a dosage-file header -> read_map [(sample_idx, skip)],
        with skips measured from the A2 column (plink_dosage.c:1671)."""
        hdr = f.readline().split()
        p0 = dcfg.skip0
        if hdr[p0] != "SNP":
            raise ValueError(
                f"Column {p0 + 1} of {fname}\'s header isn\'t \'SNP\'.")
        if hdr[p0 + dcfg.skip1 + 1] != "A1":
            raise ValueError(
                f"Column {p0 + dcfg.skip1 + 2} of {fname}\'s header "
                "isn\'t \'A1\'.")
        if hdr[p0 + dcfg.skip1 + 2] != "A2":
            raise ValueError(
                f"Column {p0 + dcfg.skip1 + 3} of {fname}\'s header "
                "isn\'t \'A2\'.")
        col = p0 + dcfg.skip1 + 3 + dcfg.skip2
        toks = hdr[col:]
        if len(toks) % 2:
            raise ValueError(
                f"Header of {fname} has an odd number of tokens in the "
                "FID/IID section.")
        rm = []
        skip = 1 + dcfg.skip2
        for k in range(0, len(toks), 2):
            i = ids.get((toks[k], toks[k + 1]))
            if i is None:
                skip += per
                continue
            rm.append((i, skip))
            skip = per
        return rm

    def _sepheader_read_map(path):
        """sepheader file: one FID IID pair per line (plink_dosage.c:1602)."""
        rm = []
        skip = 1 + dcfg.skip2
        with _open_auto(path) as hf:
            for ln in hf:
                t = ln.split()
                if not t:
                    continue
                if len(t) < 2:
                    raise ValueError(
                        f"Line of {path} has fewer tokens than expected.")
                i = ids.get((t[0], t[1]))
                if i is None:
                    skip += per
                    continue
                rm.append((i, skip))
                skip = per
        if not rm:
            raise ValueError(f"{path} is empty.")
        return rm

    def _noheader_read_map():
        rm = []
        skip = 1 + dcfg.skip2
        for i in range(n):
            rm.append((i, skip))
            skip = per
        return rm

    fh = gzip.open(path, "wt") if dcfg.zout else open(path, "w")
    occur_counts: dict[str, int] = {}
    occur_order: list[str] = []
    idcol = dcfg.skip0
    a1col = idcol + dcfg.skip1 + 1
    a2_pos = a1col + 1
    y_full = pc.data[:n].astype(np.float64)
    is_cc_local = is_cc
    case_full = (pc.data[:n] == 1) if is_cc else None

    # association/write header
    wrote_hdr = False

    def _write_hdr(read_map):
        nonlocal wrote_hdr
        if wrote_hdr:
            return
        wrote_hdr = True
        if dcfg.occur:
            return
        if not dcfg.write:
            hdr_s = (" CHR         SNP          BP" if load_map
                     else "         SNP")
            hdr_s += ("  A1  A2   FRQ_A   FRQ_U    INFO    "
                      if dcfg.freq_cc else "  A1  A2     FRQ    INFO    ")
            hdr_s += ("  OR" if is_cc_local else "BETA") + "      SE       P"
            fh.write(hdr_s + "\n")
        else:
            # --write-dosage header lists ALL .fam samples
            # (plink_dosage.c:1553-1566)
            fh.write("SNP A1 A2 " + "".join(
                f"{si.fid[i]} {si.iid[i]} " for i in range(n)) + "\n")

    def _emit_assoc(vid, a1, a2, dos, valid, in_batch, read_order):
        from .assoc19 import _g4

        cur = in_batch & valid & pheno_nm
        vct = int(cur.sum())
        d = dos[cur]
        sample_valid_ct_recip = 1.0 / vct if vct else 0.0
        # sequential accumulation in batch read order, matching the
        # reference's per-read_idx adds (plink_dosage.c:1929)
        dxx = dyy = 0.0
        for i_ in read_order:
            if cur[i_]:
                v_ = dos[i_]
                dxx += v_
                dyy += v_ * v_
        dzz = dxx * sample_valid_ct_recip   # A1 frequency
        dyy -= dxx * dzz                    # ssq about the mean
        theo = dzz * (1.0 - dzz)
        emp = 2 * dyy * sample_valid_ct_recip
        rsq = (emp / theo) if theo > 0.0 else 0.0
        res = None
        if theo >= 0.0098999999999999 and 0.1 <= rsq <= 2.0:
            from ..stats.glm19f import glm_linear_dosage, glm_logistic_dosage

            cov = None
            if dcfg.sex:
                cov = sex_cov[cur].reshape(-1, 1)
            if is_cc_local:
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
        if dcfg.freq_cc and is_cc_local:
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
            row += _f74(math.exp(beta * 0.5) if is_cc_local
                        else beta * 0.5) + " "
            row += _f74(se * 0.5) + " "
            row += _g4(max(pval, 0.0), 7)
        else:
            row += "     NA      NA      NA"
        fh.write(row + "\n")

    try:
        for batch in batches:
            # per-file read maps (samples must be disjoint within a batch)
            handles = []
            rmaps = []
            seen_batch = set()
            for fname_, sep_ in batch:
                f = _open_auto(fname_)
                if dcfg.noheader:
                    rm = _noheader_read_map()
                elif dcfg.sepheader:
                    rm = _sepheader_read_map(sep_)
                else:
                    rm = _header_read_map(f, fname_)
                for i, _sk in rm:
                    if i in seen_batch:
                        raise ValueError(
                            f"\'{si.fid[i]} {si.iid[i]}\' appears "
                            "multiple times.")
                    seen_batch.add(i)
                handles.append(f)
                rmaps.append(rm)
            in_batch = np.zeros(n, bool)
            read_order = []
            for rm in rmaps:
                for i, _sk in rm:
                    in_batch[i] = True
                    read_order.append(i)
            if len(batches) == 1 and not dcfg.noheader:
                miss_n = n - len(seen_batch)
                if miss_n:
                    log.log(
                        f"Warning: {miss_n} sample ID"
                        f"{'' if miss_n == 1 else 's'} present in .fam "
                        "file but missing from dosage file"
                        f"{'' if len(batch) == 1 else 's'}.")
            _write_hdr(rmaps[0] if rmaps else [])

            if dcfg.occur:
                for f in handles:
                    for line in f:
                        t = line.split()
                        if not t:
                            continue
                        vid = t[idcol]
                        if vid not in occur_counts:
                            occur_order.append(vid)
                            occur_counts[vid] = 0
                        occur_counts[vid] += 1
                    f.close()
                continue

            # line-locked iteration across the batch\'s files
            # (plink_dosage.c:1744-1830)
            while True:
                dos = np.zeros(n)
                valid = np.ones(n, bool)
                raw_p1 = np.zeros(n)
                raw_p2 = np.zeros(n)
                vid = a1 = a2 = None
                hit_eof = False
                for k, f in enumerate(handles):
                    toks = None
                    for line in f:
                        toks = line.split()
                        if toks:
                            break
                        toks = None
                    if toks is None:
                        if k:
                            raise ValueError(
                                "Misaligned dosage data files.")
                        hit_eof = True
                        break
                    cvid = toks[idcol]
                    ca1 = toks[a1col]
                    ca2 = toks[a1col + 1]
                    if k == 0:
                        vid, a1, a2 = cvid, ca1, ca2
                    else:
                        if cvid != vid:
                            raise ValueError(
                                "Variant ID mismatch between --dosage "
                                "list files.")
                        if ca1 != a1 or ca2 != a2:
                            raise ValueError(
                                "Allele code mismatch between --dosage "
                                "list files.")
                    dk, vk = _parse_line_dosages(
                        toks, a2_pos, rmaps[k], fmt, dcfg.dose1, n,
                        raw2=((raw_p1, raw_p2) if dcfg.write and fmt != 1
                              else None))
                    sel = np.zeros(n, bool)
                    for i, _sk in rmaps[k]:
                        sel[i] = True
                    dos[sel] = dk[sel]
                    valid[sel] = vk[sel]
                if hit_eof:
                    break
                if load_map and vid not in map_info:
                    continue
                if dcfg.write:
                    from ..utils.fmt import dtoa_g

                    cur = in_batch & valid
                    parts = [f"{vid} {a1} {a2} "]
                    for i in range(n):
                        if not cur[i]:
                            parts.append(
                                {1: "NA ", 2: "NA NA ",
                                 3: "NA NA NA "}[fmt])
                        elif fmt == 1:
                            parts.append(dtoa_g(2 * dos[i]) + " ")
                        else:
                            p1 = float(raw_p1[i])
                            p2 = float(raw_p2[i])
                            parts.append(dtoa_g(p1) + " "
                                         + dtoa_g(p2) + " ")
                            if fmt == 3:
                                p3 = 1.0 - p1 - p2
                                if abs(p3) < 1e-6:
                                    p3 = 0.0
                                parts.append(dtoa_g(p3) + " ")
                    fh.write("".join(parts).rstrip(" ") + " \n")
                    continue
                _emit_assoc(vid, a1, a2, dos, valid, in_batch,
                            read_order)
            for f in handles:
                f.close()

        if dcfg.occur:
            for vid in occur_order:
                fh.write(f"{vid} {occur_counts[vid]}\n")
            log.log(f"--dosage occurrence counts written to {path} .")
        elif not dcfg.write:
            log.log(f"--dosage association results written to {path} .")
        else:
            log.log(f"--dosage data written to {path} .")
    finally:
        fh.close()
