"""Segmental CNV module (--cfile / --cnv-list).

Behavior reference: 1.9/plink_cnv.c.  Upstream PLINK 1.9's CNV module
implements .cnv.map generation (cnv_make_map, plink_cnv.c:479, with the
segment filters and interval intersect/exclude machinery) and map
validation/loading (validate_cnv_map :711, load_cnv_map :865); every
analysis beyond that point prints ".cnv.map file successfully loaded.
(Subsequent functions have not been implemented yet.)" (plink_cnv.c:1040)
and returns.  This module reproduces exactly that surface -- including
the message -- so a 1.9 CNV workflow behaves identically here.

.cnv columns: FID IID CHR BP1 BP2 TYPE [SCORE [SITES]] (optional FID
header line).  Map entries: one marker per distinct (chrom, pos) among
{BP1, BP2 (long mode), BP2+1} of the filtered segments, named
p<chrom_code>-<bp>.
"""

from __future__ import annotations

import os

import numpy as np

from ..utils.chrom import ChrInfo
from ..utils.logging import RunLogger

_DBL_MAX = float("inf")


class CnvConfig:
    def __init__(self, cfg):
        self.make_map = cfg.cnv_make_map is not None
        self.make_map_long = self.make_map and \
            ("short" not in cfg.cnv_make_map)
        self.min_seglen = 0
        self.max_seglen = 0xFFFFFFFF
        if cfg.cnv_kb is not None:
            self.min_seglen = int(cfg.cnv_kb * 1000 * (1 + 2.0 ** -44))
        if cfg.cnv_max_kb is not None:
            self.max_seglen = int(cfg.cnv_max_kb * 1000 * (1 + 2.0 ** -44))
        self.min_score = cfg.cnv_score if cfg.cnv_score is not None \
            else -_DBL_MAX
        self.max_score = cfg.cnv_max_score if cfg.cnv_max_score is not None \
            else _DBL_MAX
        self.min_sites = cfg.cnv_sites or 0
        self.max_sites = cfg.cnv_max_sites if cfg.cnv_max_sites is not None \
            else 0xFFFFFFFF
        self.del_only = cfg.cnv_del
        self.dup_only = cfg.cnv_dup
        self.intersect = cfg.cnv_intersect
        self.exclude = cfg.cnv_exclude
        self.subset = cfg.cnv_subset
        # overlap type: None | "overlap" | "region" | "union" | "disrupt"
        self.overlap_type = None
        self.overlap_val = 0.0
        if cfg.cnv_overlap is not None:
            self.overlap_type, self.overlap_val = "overlap", cfg.cnv_overlap
        elif cfg.cnv_region_overlap is not None:
            self.overlap_type = "region"
            self.overlap_val = cfg.cnv_region_overlap
        elif cfg.cnv_union_overlap is not None:
            self.overlap_type = "union"
            self.overlap_val = cfg.cnv_union_overlap
        elif cfg.cnv_disrupt:
            self.overlap_type = "disrupt"


def _load_intervals(path: str, subset_path, ci: ChrInfo, log: RunLogger):
    """Interval file: CHR START END [NAME]; returns {chrom_code:
    (starts, ends)} (ref cnv_intersect_load, plink_cnv.c:75)."""
    subset = None
    if subset_path:
        with open(subset_path) as f:
            subset = {t for t in f.read().split() if t}
        if not subset:
            raise ValueError("Empty --cnv-subset file.")
    by_chrom: dict[int, list] = {}
    with open(path) as f:
        for ln in f:
            t = ln.split()
            if not t:
                continue
            if len(t) < 3:
                raise ValueError(
                    f"Fewer tokens than expected in {path} line.")
            if subset is not None:
                if len(t) < 4 or t[3] not in subset:
                    continue
            code = ci.code(t[0])
            s, e = int(t[1]), int(t[2])
            if e < s:
                raise ValueError(f"Interval end < start in {path}.")
            by_chrom.setdefault(code, []).append((s, e))
    return {
        c: (np.asarray([x[0] for x in v], np.int64),
            np.asarray([x[1] for x in v], np.int64))
        for c, v in by_chrom.items()
    }


def _overlaps(seg_s: int, seg_e: int, ivs, otype, oval: float) -> bool:
    """is_cnv_overlap (plink_cnv.c:380-458) without the size-class split
    (numpy scans the whole per-chromosome list)."""
    if ivs is None:
        return False
    rs, re = ivs
    hit = (re >= seg_s) & (rs <= seg_e)
    if not hit.any():
        return False
    if otype is None:
        return True
    rs, re = rs[hit], re[hit]
    if otype == "disrupt":
        return bool((((rs < seg_s) & (re <= seg_e))
                     | ((rs >= seg_s) & (re > seg_e))).any())
    numer = 1 + np.minimum(re, seg_e) - np.maximum(rs, seg_s)
    if otype == "region":
        denom = 1 + re - rs
    elif otype == "union":
        denom = 1 + np.maximum(re, seg_e) - np.minimum(rs, seg_s)
    else:
        denom = np.full(numer.shape, 1 + seg_e - seg_s, np.float64)
    return bool((denom * oval <= numer).any())


def _read_cnv_segments(path: str, cc: CnvConfig, ci: ChrInfo,
                       intervals, apply_filters: bool):
    """Filtered (chrom_code, start, end) segment list in file order."""
    segs = []
    with open(path) as f:
        lines = f.read().splitlines()
    body = [ln for ln in lines if ln.split()]
    if not body:
        raise ValueError("Empty .cnv file.")
    if body and body[0].split()[0] == "FID":
        body = body[1:]
    req = 6
    if apply_filters and cc.max_sites != 0xFFFFFFFF or cc.min_sites:
        req = 8
    elif apply_filters and (cc.min_score != -_DBL_MAX
                            or cc.max_score != _DBL_MAX):
        req = 7
    for ln in body:
        t = ln.split()
        if not t:
            continue
        if len(t) < req:
            raise ValueError(
                "Line of .cnv file has fewer tokens than expected.")
        code = ci.code(t[2])
        s, e = int(t[3]), int(t[4])
        if e < s:
            raise ValueError(
                "Segment end coordinate smaller than segment start in "
                ".cnv file.")
        if apply_filters:
            if cc.min_seglen or cc.max_seglen != 0xFFFFFFFF:
                w = 1 + e - s
                if w < cc.min_seglen or w > cc.max_seglen:
                    continue
            if cc.del_only or cc.dup_only:
                copies = int(t[5])
                if cc.del_only and copies > 1:
                    continue
                if cc.dup_only and copies < 3:
                    continue
            if cc.min_score != -_DBL_MAX or cc.max_score != _DBL_MAX:
                sc = float(t[6])
                if sc < cc.min_score or sc > cc.max_score:
                    continue
            if cc.min_sites or cc.max_sites != 0xFFFFFFFF:
                st = int(t[7])
                if st < cc.min_sites or st > cc.max_sites:
                    continue
            if intervals is not None:
                ov = _overlaps(s, e, intervals.get(code), cc.overlap_type,
                               cc.overlap_val)
                if cc.exclude and ov:
                    continue
                if cc.intersect and not ov:
                    continue
        segs.append((code, s, e))
    return segs


def _write_map(path: str, segs, long_mode: bool, ci: ChrInfo,
               log: RunLogger, banner: str) -> None:
    poss = set()
    for code, s, e in segs:
        poss.add((code, s))
        if long_mode and s != e:
            poss.add((code, e))
        poss.add((code, e + 1))
    if not poss:
        raise ValueError("No variants after filtering.")
    with open(path, "w") as f:
        for code, bp in sorted(poss):
            f.write(f"{ci.name19(code)}\tp{code}-{bp}\t0\t{bp}\n")
    log.log(banner + "done.")


def run_cnv(cfg, log: RunLogger) -> None:
    cc = CnvConfig(cfg)
    ci = ChrInfo()
    if cfg.cfile:
        cnvname = cfg.cfile + ".cnv"
        mapname = cfg.cfile + ".cnv.map"
    else:
        cnvname = cfg.cnv_list
        mapname = cnvname + ".map" if cnvname.lower().endswith(".cnv") \
            else None
    intervals = None
    if cc.intersect or cc.exclude:
        intervals = _load_intervals(cc.intersect or cc.exclude, cc.subset,
                                    ci, log)

    if cc.make_map:
        out_map = cfg.out + ".cnv.map"
        segs = _read_cnv_segments(cnvname, cc, ci, intervals,
                                  apply_filters=True)
        _write_map(out_map, segs, cc.make_map_long, ci, log,
                   f"Generating {out_map} ... ")
        # upstream continues to the map-load stage with the ORIGINAL
        # dataset map path (plink_cnv.c:1019-1024), erroring when it
        # does not exist
        if mapname is None or not os.path.exists(mapname):
            raise FileNotFoundError(
                f"Failed to open {mapname if mapname else '.'}.")
    elif mapname is None or not os.path.exists(mapname):
        if mapname is None:
            raise ValueError(
                "No .cnv.map filename specified, and .cnv filename does "
                "not unambiguously specify how an autogenerated file "
                "should be named.  Use --cnv-make-map + --out.")
        # autogeneration is SHORT-format and unfiltered (plink_cnv.c:1005)
        segs = _read_cnv_segments(cnvname, cc, ci, None,
                                  apply_filters=False)
        _write_map(mapname, segs, False, ci, log,
                   f"Autogenerating missing {mapname} ... ")

    if os.path.exists(mapname or ""):
        # validate/load (validate_cnv_map / load_cnv_map); analyses past
        # this point are unimplemented UPSTREAM as well (plink_cnv.c:1040)
        with open(mapname) as f:
            n = sum(1 for ln in f if ln.split())
        if not n:
            raise ValueError("Empty .cnv.map file.")
        print(".cnv.map file successfully loaded.  (Subsequent functions "
              "have not been\nimplemented yet.)")
