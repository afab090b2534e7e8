"""--sample-diff / --sdiff: genotype discordance between sample pairs.

Behavior reference: Sdiff machinery in 2.0/plink2_misc.cc (top-level
Sdiff :9016, SdiffCountsOnly :7990, SdiffMainBatch :8491, summary writer
:9335, header :8390; CLI parse 2.0/plink2.cc:11680-11825).

Supported: ids= / base= / file= pair specs, pairwise (per-pair output
files, fname-id-delim=), counts-only, include-missing, zs, dosage[=tol],
cols= and counts-cols= column sets.  Sex-aware chrX/chrY semantics: the
ibs counters cover autosomal-diploid variants plus chrX for non-male
pairs; chrY rows/counts skip non-male pairs; OBS_CT is derived from the
per-chromosome variant totals minus missing/halfmiss (:9412-9425).
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..utils.logging import RunLogger

_GT_DIP = {0: "0/0", 1: "0/1", 2: "1/1", 3: "./."}
_GT_HAP = {0: "0", 1: "0/1", 2: "1", 3: "."}
_DS_DIP = {0: "0", 1: "1", 2: "2", 3: "."}
_DS_HAP = {0: "0", 1: "0.5", 2: "1", 3: "."}

_COL_SET = ("chrom", "pos", "ref", "alt", "maybeprovref", "provref",
            "maybefid", "fid", "id", "maybesid", "sid", "geno")
_COL_DEFAULT_PW = {"chrom", "pos", "ref", "alt", "maybeprovref", "geno"}
_COL_DEFAULT = _COL_DEFAULT_PW | {"maybefid", "id", "maybesid"}
_CCOL_SET = ("maybefid", "fid", "maybesid", "sid", "nobs", "nobsibs",
             "ibs0", "ibs1", "ibs2", "halfmiss", "diff")
_CCOL_DEFAULT = {"maybefid", "maybesid", "nobs", "halfmiss", "diff"}

_KSMALL_EPS = 2.0 ** -44


def _parse_cols(desc: str, allowed, default: set) -> set:
    if desc.startswith("+") or desc.startswith("-"):
        out = set(default)
        for tok in desc.split(","):
            if tok.startswith("+"):
                out.add(tok[1:])
            elif tok.startswith("-"):
                out.discard(tok[1:])
            else:
                raise ValueError(f"Invalid column set descriptor '{desc}'.")
            if tok[1:] not in allowed:
                raise ValueError(f"Invalid column name '{tok[1:]}'.")
        return out
    out = set()
    for tok in desc.split(","):
        if tok not in allowed:
            raise ValueError(f"Invalid column name '{tok}'.")
        out.add(tok)
    return out


def _hap_frac(rem: int) -> str:
    """Fractional digits of rem/32768, rem in [1,32767] (PrintDdosageDecimal
    fallback semantics, shared with the haploid HDS printers)."""
    from .export import _print_hap_nonint

    return _print_hap_nonint(rem)[1:]


def _print_hap_dosage(v: int) -> str:
    """PrintHaploidDosage (2.0/plink2_common.h:1395): v/32768."""
    whole, rem = divmod(int(v), 32768)
    if not rem:
        return str(whole)
    return str(whole) + _hap_frac(rem)


def run_sdiff(ds: Dataset, cfg, log: RunLogger) -> None:
    from .basic_reports import _provref_strs
    from .export import _print_small_dosage

    args = list(cfg.sdiff)
    counts_only = False
    include_missing = False
    pairwise = False
    zs = False
    fname_id_delim = "_"
    dosage_tol = None  # None = hardcall comparison
    cols = None
    ccols = None
    mode = None
    fname = None
    id_list: list[str] = []
    for a in args:
        if mode is not None and not a.startswith(("ids=", "base=", "file=")):
            id_list.append(a)
            continue
        if a == "counts-only":
            counts_only = True
        elif a == "include-missing":
            include_missing = True
        elif a == "pairwise":
            pairwise = True
        elif a == "zs":
            zs = True
        elif a == "dosage":
            dosage_tol = 0
        elif a.startswith("dosage="):
            dxx = float(a[7:])
            if not (0.0 <= dxx <= 0.5 - _KSMALL_EPS):
                raise ValueError(f"Invalid --sample-diff argument '{a}'.")
            dosage_tol = int(dxx * ((1 + _KSMALL_EPS) * 32768))
        elif a.startswith("fname-id-delim="):
            fname_id_delim = a[len("fname-id-delim="):]
            if len(fname_id_delim) != 1:
                raise ValueError(
                    "--sample-diff fname-id-delim= value must be a single "
                    "character.")
        elif a.startswith("cols="):
            cols = _parse_cols(a[5:], _COL_SET,
                               _COL_DEFAULT_PW if pairwise else _COL_DEFAULT)
        elif a.startswith("counts-cols="):
            ccols = _parse_cols(a[12:], _CCOL_SET, _CCOL_DEFAULT)
        elif a.startswith("ids="):
            mode = "ids"
            id_list.append(a[4:])
        elif a.startswith("base="):
            mode = "base"
            id_list.append(a[5:])
        elif a.startswith("file="):
            mode = "file"
            fname = a[5:]
        else:
            raise ValueError(f"Invalid --sample-diff argument '{a}'.")
    if pairwise and counts_only:
        raise ValueError(
            "--sample-diff 'pairwise' and 'counts-only' modifiers cannot "
            "be used together.")
    if cols is None:
        cols = _COL_DEFAULT_PW if pairwise else _COL_DEFAULT
    if ccols is None:
        ccols = set(_CCOL_DEFAULT)
    if not include_missing:
        # HALFMISS_CT is suppressed without include-missing even when
        # explicitly requested (2.0/plink2.cc:11820)
        ccols.discard("halfmiss")

    si = ds.si
    inc_mask = ds.sample_mask
    iid_to_idx = {}
    fiid_to_idx = {}
    for i in np.flatnonzero(inc_mask):
        iid_to_idx.setdefault(str(si.iid[i]), int(i))
        fiid_to_idx.setdefault(f"{si.fid[i]}\t{si.iid[i]}", int(i))

    def _find(tok: str, where: str = "") -> int:
        j = iid_to_idx.get(tok)
        if j is None:
            j = fiid_to_idx.get(tok.replace(" ", "\t"))
        if j is None:
            raise ValueError(
                f"--sample-diff sample ID '{tok}'{where} not found.")
        return j

    pairs: list[tuple[int, int]] = []
    if mode == "file":
        if fname is None:
            raise ValueError("--sample-diff file= requires a filename.")
        with open(fname) as f:
            lines = [ln for ln in f.read().splitlines() if ln.split()]
        if not lines:
            raise ValueError("Empty --sample-diff file.")
        per_id = 1
        if lines[0].lstrip().startswith("#"):
            hdr = lines[0].lstrip("#").split()
            per_id = sum(1 for t in hdr[: len(hdr) // 2]
                         if t in ("FID", "IID", "SID"))
            per_id = max(per_id, 1)
            lines = lines[1:]
        else:
            per_id = len(lines[0].split()) // 2
        for k, ln in enumerate(lines):
            t = ln.split()
            if len(t) < 2 * per_id:
                raise ValueError(
                    f"Line {k + 1} of --sample-diff file has fewer tokens "
                    "than expected.")
            tok1 = "\t".join(t[:per_id][-2:]) if per_id > 1 else t[0]
            tok2 = "\t".join(t[per_id: 2 * per_id][-2:]) if per_id > 1 \
                else t[per_id]
            i1 = _find(tok1, f" (on line {k + 1} of file)")
            i2 = _find(tok2, f" (on line {k + 1} of file)")
            if i1 == i2:
                raise ValueError(
                    f"Duplicate sample ID on line {k + 1} of --sample-diff "
                    "file.")
            pairs.append((i1, i2))
    else:
        if mode is None or len(id_list) < 2:
            raise ValueError(
                "--sample-diff 'base='/'ids=' require 2 or more "
                "space-separated sample IDs.")
        sidx = [_find(x) for x in id_list]
        if len(set(sidx)) != len(sidx):
            raise ValueError("Duplicate ID in --sample-diff list.")
        if mode == "ids":
            # (idx1, idx2) ordered by the SECOND member (plink2_misc.cc:9141)
            for k2 in range(1, len(sidx)):
                for k1 in range(k2):
                    pairs.append((sidx[k1], sidx[k2]))
        else:
            pairs = [(sidx[0], j) for j in sidx[1:]]

    P = len(pairs)
    involved = sorted(set(i for p in pairs for i in p))
    col_fid = ("fid" in cols or "fid" in ccols
               or (("maybefid" in cols or "maybefid" in ccols)
                   and any(str(si.fid[i]) != "0" for i in involved)))
    sids = getattr(si, "sid", None)
    col_sid = ("sid" in cols or "sid" in ccols
               or (("maybesid" in cols or "maybesid" in ccols)
                   and sids is not None))
    # column requirements are evaluated separately for the two reports
    d_fid = ("fid" in cols or ("maybefid" in cols
             and any(str(si.fid[i]) != "0" for i in involved)))
    d_sid = ("sid" in cols or ("maybesid" in cols and sids is not None))
    c_fid = ("fid" in ccols or ("maybefid" in ccols
             and any(str(si.fid[i]) != "0" for i in involved)))
    c_sid = ("sid" in ccols or ("maybesid" in ccols and sids is not None))
    del col_fid, col_sid

    def _fmtid(i: int, use_fid: bool, use_sid: bool) -> str:
        s = f"{si.fid[i]}\t" if use_fid else ""
        s += str(si.iid[i])
        if use_sid:
            s += f"\t{sids[i] if sids is not None else 0}"
        return s

    # chromosome classification over the filtered variant set
    vi = ds.vi
    ci = vi.chr_info
    inc_v = np.flatnonzero(ds.variant_mask)
    chrom_of = vi.chrom[inc_v]
    is_x_all = ds.is_chrx()[inc_v]
    is_y_all = ds.is_chry()[inc_v]
    hap_all = ~np.array([not ci.is_haploid(int(c), 1) for c in chrom_of])
    x_ct = int(is_x_all.sum())
    y_ct = int(is_y_all.sum())
    nonsex_hap_ct = int((hap_all & ~is_x_all & ~is_y_all).sum())
    auto_dip_ct = len(inc_v) - x_ct - y_ct - nonsex_hap_ct

    pair_male = np.zeros(P, bool)
    if x_ct or y_ct:
        sex = si.sex
        for pi, (a, b) in enumerate(pairs):
            nm1, nm2 = sex[a] != 0, sex[b] != 0
            m1, m2 = sex[a] == 1, sex[b] == 1
            if nm1 != nm2:
                pair_male[pi] = m1 != m2
            elif not nm1:
                raise ValueError(
                    "--sample-diff requires at least one sample in each "
                    "pair to have known sex when chrX or chrY is present.")
            elif m1 != m2:
                raise ValueError(
                    "--sample-diff cannot perform male-female comparisons "
                    "when chrX or chrY is present.  (Consider "
                    '"--not-chr X,Y".)')
            else:
                pair_male[pi] = m1

    dosage_needed = dosage_tol is not None and ds.has_dosage
    dosage_reported = dosage_tol is not None
    ibs_needed = bool(ccols & {"nobsibs", "ibs0", "ibs1", "ibs2"})

    missing_ct = np.zeros(P, np.int64)
    ibsmiss_ct = np.zeros(P, np.int64)
    ibs0 = np.zeros(P, np.int64)
    ibs1 = np.zeros(P, np.int64)
    halfmiss_ct = np.zeros(P, np.int64)
    diff_ct = np.zeros(P, np.int64)

    # discordance-report writers
    _, prov_fn = _provref_strs(ds)
    col_provref = ("ref" in cols) and (
        "provref" in cols
        or ("maybeprovref" in cols
            and any(prov_fn(int(v)).lstrip("\t") == "Y" for v in inc_v)))

    def _hdr() -> str:
        s = "#"
        if "chrom" in cols:
            s += "CHROM\t"
        if "pos" in cols:
            s += "POS\t"
        s += "ID"
        if "ref" in cols:
            s += "\tREF"
        if "alt" in cols:
            s += "\tALT"
        if col_provref:
            s += "\tPROVISIONAL_REF?"
        if "id" in cols:
            if d_fid:
                s += "\tFID1"
            s += "\tIID1"
            if d_sid:
                s += "\tSID1"
            if d_fid:
                s += "\tFID2"
            s += "\tIID2"
            if d_sid:
                s += "\tSID2"
        if "geno" in cols:
            s += "\tDS1\tDS2" if dosage_reported else "\tGT1\tGT2"
        return s + "\n"

    writers = {}
    out_files = []
    if not counts_only:
        def _open(path: str):
            out_files.append(path)
            if zs:
                import zstandard

                fh = open(path, "wb")
                return zstandard.ZstdCompressor().stream_writer(fh)
            return open(path, "wb")

        if pairwise:
            for pi, (a, b) in enumerate(pairs):
                ida = _fmtid(a, d_fid, d_sid).replace("\t", fname_id_delim)
                idb = _fmtid(b, d_fid, d_sid).replace("\t", fname_id_delim)
                path = f"{cfg.out}.{ida}.{idb}.sdiff" + (".zst" if zs else "")
                w = _open(path)
                w.write(_hdr().encode())
                writers[pi] = w
            log_target = (f"{cfg.out}.[ID1].[ID2].sdiff"
                          + (".zst" if zs else "")
                          + f" ({P} file{'s' if P != 1 else ''})")
        else:
            suffix = ""
            if mode == "base":
                suffix = "." + _fmtid(pairs[0][0], d_fid, d_sid).replace(
                    "\t", fname_id_delim)
            path = f"{cfg.out}{suffix}.sdiff" + (".zst" if zs else "")
            w = _open(path)
            w.write(_hdr().encode())
            for pi in range(P):
                writers[pi] = w
            log_target = path

    from ..ops.pairwise import _unpack_np

    pa = np.array([p[0] for p in pairs])
    pb = np.array([p[1] for p in pairs])
    inv = np.array(involved)
    ma_mask = ds.multiallelic_mask()
    acs = ds.allele_cts() if ma_mask.any() else None

    def _pregeno(v: int) -> str:
        s = ""
        if "chrom" in cols:
            s += f"{ci.name(int(vi.chrom[v]))}\t"
        if "pos" in cols:
            s += f"{vi.pos[v]}\t"
        s += str(vi.vid[v])
        if "ref" in cols:
            s += f"\t{vi.ref[v]}"
        if "alt" in cols:
            s += f"\t{vi.alt[v]}"
        if col_provref:
            s += "\t" + (prov_fn(int(v)).lstrip("\t") or "N")
        return s

    for vk, v in enumerate(inc_v):
        is_x = bool(is_x_all[vk])
        is_y = bool(is_y_all[vk])
        is_auto_dip = not bool(hap_all[vk])
        is_ma = bool(ma_mask[v])
        codes = _unpack_np(ds.reader.read_packed(int(v), 1))[0][
            : ds.raw_sample_ct]
        act = (pair_male | True) if not is_y else pair_male  # active pairs
        dip_pair = np.full(P, is_auto_dip) | (is_x & ~pair_male)
        if is_ma and not dosage_needed:
            ac = ds.allele_codes(int(v))
            a1p = ac[pa]
            a2p = ac[pb]
            m1 = a1p[:, 0] < 0
            m2 = a2p[:, 0] < 0
            eq = (a1p[:, 0] == a2p[:, 0]) & (a1p[:, 1] == a2p[:, 1])
            both_miss = m1 & m2
            halfm = (~eq) & (m1 | m2)
            dif = (~eq) & ~m1 & ~m2
            share = ((a1p[:, 0] == a2p[:, 0]) | (a1p[:, 0] == a2p[:, 1])
                     | (a1p[:, 1] == a2p[:, 0]) | (a1p[:, 1] == a2p[:, 1]))
            missing_ct += both_miss & act
            ibsmiss_ct += (both_miss | halfm) & dip_pair & act
            halfmiss_ct += halfm & act
            diff_ct += dif & act
            if ibs_needed:
                ibs1 += dif & share & dip_pair & act
                ibs0 += dif & ~share & dip_pair & act
            if counts_only:
                continue
            emit = (dif | (halfm if include_missing else False)) & act
            for pi in np.flatnonzero(emit):
                row = _pregeno(int(v))
                if "id" in cols:
                    row += ("\t" + _fmtid(int(pa[pi]), d_fid, d_sid)
                            + "\t" + _fmtid(int(pb[pi]), d_fid, d_sid))
                if "geno" in cols:
                    for acp in (a1p[pi], a2p[pi]):
                        if acp[0] < 0:
                            row += "\t./." if dip_pair[pi] else "\t."
                        elif dip_pair[pi]:
                            row += f"\t{acp[0]}/{acp[1]}"
                        elif acp[0] != acp[1]:
                            row += f"\t{acp[0]}/{acp[1]}"
                        else:
                            row += f"\t{acp[0]}"
                writers[int(pi)].write((row + "\n").encode())
            continue
        ga = codes[pa]
        gb = codes[pb]
        # the reference reads a SUBSETTED genovec/dosage vector: a variant
        # with no dosage entries among the involved samples takes the
        # hardcall branch, whose AllGenoEqual shortcut skips all counting
        # (incl. both-missing) when every involved genotype is equal
        # (SdiffCountsOnly :8090 / SdiffMainBatch :8730)
        sub_dosage_ct = 0
        aux = None
        if dosage_needed:
            aux = ds.reader.read_dosage(int(v))
            if aux.dosage_ids is not None:
                sub_dosage_ct = int(np.isin(aux.dosage_ids, inv).sum())
        if dosage_needed and sub_dosage_ct:
            dmap = np.array([0, 16384, 32768, -1], np.int64)
            dbuf = dmap[codes]
            if aux.dosage_ids is not None:
                dbuf = dbuf.copy()
                dbuf[aux.dosage_ids] = np.where(
                    np.asarray(aux.dosage_vals, np.int64) == 65535, -1,
                    np.asarray(aux.dosage_vals, np.int64))
            d1 = dbuf[pa]
            d2 = dbuf[pb]
            m1 = d1 < 0
            m2 = d2 < 0
            eq = d1 == d2
            both_miss = eq & m1
            halfm = (~eq) & (m1 | m2)
            tol = np.where(dip_pair, dosage_tol // 2, dosage_tol)
            dif = (~m1) & (~m2) & (np.abs(d1 - d2) > tol)
            missing_ct += both_miss & act
            ibsmiss_ct += (both_miss | halfm) & dip_pair & act
            halfmiss_ct += halfm & act
            diff_ct += dif & act
            if ibs_needed:
                hne = (ga != gb) & ~m1 & ~m2
                hmiss = hne & ((ga == 3) | (gb == 3))
                ibsmiss_ct += hmiss & dip_pair & act
                idx1 = hne & (((ga | gb) & 1) == 1)
                ibs1 += idx1 & dip_pair & act
                ibs0 += hne & ~idx1 & dip_pair & act
            if counts_only:
                continue
            emit = (dif | (halfm if include_missing else False)) & act
            for pi in np.flatnonzero(emit):
                row = _pregeno(int(v))
                if "id" in cols:
                    row += ("\t" + _fmtid(int(pa[pi]), d_fid, d_sid)
                            + "\t" + _fmtid(int(pb[pi]), d_fid, d_sid))
                if "geno" in cols:
                    for dv in (int(d1[pi]), int(d2[pi])):
                        if dv < 0:
                            row += "\t."
                        elif dip_pair[pi]:
                            row += "\t" + _print_small_dosage(dv)
                        else:
                            row += "\t" + _print_hap_dosage(dv)
                writers[int(pi)].write((row + "\n").encode())
            continue
        # biallelic hardcalls (DS display uses the integer tables when the
        # dosage modifier is on but this variant has no subset dosage)
        sub = codes[inv]
        if (sub == sub[0]).all():
            continue  # AllGenoEqual shortcut
        eq = ga == gb
        both_miss = eq & (ga == 3)
        halfm = (~eq) & ((ga == 3) | (gb == 3))
        dif = (~eq) & (ga != 3) & (gb != 3)
        missing_ct += both_miss & act
        ibsmiss_ct += (both_miss | halfm) & dip_pair & act
        halfmiss_ct += halfm & act
        diff_ct += dif & act
        if ibs_needed or True:
            idx1 = dif & (((ga | gb) & 1) == 1)
            ibs1 += idx1 & dip_pair & act
            ibs0 += dif & ~idx1 & dip_pair & act
        if counts_only:
            continue
        emit = (dif | (halfm if include_missing else False)) & act
        for pi in np.flatnonzero(emit):
            row = _pregeno(int(v))
            if "id" in cols:
                row += ("\t" + _fmtid(int(pa[pi]), d_fid, d_sid)
                        + "\t" + _fmtid(int(pb[pi]), d_fid, d_sid))
            if "geno" in cols:
                lut = ((_DS_DIP if dip_pair[pi] else _DS_HAP)
                       if dosage_reported
                       else (_GT_DIP if dip_pair[pi] else _GT_HAP))
                row += f"\t{lut[int(ga[pi])]}\t{lut[int(gb[pi])]}"
            writers[int(pi)].write((row + "\n").encode())

    if not counts_only:
        for w in set(writers.values()):
            w.close()
        if pairwise:
            log.log("--sample-diff pairwise: Discordances written to "
                    f"{log_target}.")
        else:
            log.log(f"--sample-diff: Discordances written to {log_target} .")

    # count summary
    obs_base = auto_dip_ct + x_ct + nonsex_hap_ct
    with open(cfg.out + ".sdiff.summary", "w") as f:
        s = "#"
        if c_fid:
            s += "FID1\t"
        s += "IID1"
        if c_sid:
            s += "\tSID1"
        if c_fid:
            s += "\tFID2"
        s += "\tIID2"
        if c_sid:
            s += "\tSID2"
        for flag, name in (("nobs", "OBS_CT"), ("nobsibs", "IBS_OBS_CT"),
                           ("ibs0", "IBS0_CT"), ("ibs1", "IBS1_CT"),
                           ("ibs2", "IBS2_CT"), ("halfmiss", "HALFMISS_CT"),
                           ("diff", "DIFF_CT")):
            if flag in ccols:
                s += "\t" + name
        f.write(s + "\n")
        for pi, (a, b) in enumerate(pairs):
            s = _fmtid(a, c_fid, c_sid) + "\t" + _fmtid(b, c_fid, c_sid)
            if "nobs" in ccols:
                obs = obs_base + (y_ct if pair_male[pi] else 0)
                if not include_missing:
                    obs -= int(missing_ct[pi] + halfmiss_ct[pi])
                s += f"\t{obs}"
            if ibs_needed:
                ibs_obs = auto_dip_ct - int(ibsmiss_ct[pi])
                if x_ct and not pair_male[pi]:
                    ibs_obs += x_ct
                if "nobsibs" in ccols:
                    s += f"\t{ibs_obs}"
                if "ibs0" in ccols:
                    s += f"\t{int(ibs0[pi])}"
                if "ibs1" in ccols:
                    s += f"\t{int(ibs1[pi])}"
                if "ibs2" in ccols:
                    s += f"\t{ibs_obs - int(ibs0[pi]) - int(ibs1[pi])}"
            if "halfmiss" in ccols:
                s += f"\t{int(halfmiss_ct[pi])}"
            if "diff" in ccols:
                d = int(diff_ct[pi])
                if include_missing:
                    d += int(halfmiss_ct[pi])
                s += f"\t{d}"
            f.write(s + "\n")
    log.log(
        f"--sample-diff: Discordance count summary written to "
        f"{cfg.out}.sdiff.summary ."
    )
