"""--gene-report: group association-report lines by gene regions.

Behavior reference: gene_report (1.9/plink_set.c:3252-3750) +
load_range_list{_sortpos} (:274-560,2215-2345) +
interval_in_setdef/uint32arr_greater_than.  Standalone report
post-processor (no genotype data).  Writes <out>.range.report with
genes in natural-name order, each listing the input lines whose CHR/BP
fall inside the gene (+ optional --gene-list-border), prefixed by the
DIST from the gene start.
"""

from __future__ import annotations

import bisect
import functools

from ..cli import FlagError
from ..utils.chrom import MT_CODE, X_CODE, Y_CODE
from ..utils.fmt import dtoa_g
from ..utils.logging import RunLogger
from .assoc19 import _g4
from .meta import strcmp_natural

_SPECIAL = {"X": X_CODE, "Y": Y_CODE, "XY": 25, "MT": MT_CODE,
            "M": MT_CODE}


def _parse_chrom(tok):
    s = tok[3:] if tok.lower().startswith("chr") else tok
    u = s.upper()
    if u in _SPECIAL:
        return _SPECIAL[u]
    try:
        v = int(s)
    except ValueError:
        return None
    if 0 <= v <= MT_CODE:
        return v
    return None


_natkey = functools.cmp_to_key(
    lambda a, b: strcmp_natural(a.encode(), b.encode()))


def _load_gene_list(path, subset):
    """load_range_list(track_set_names=1) + sortpos merge.  Keys are
    the 4-char chrom prefix (last digit shifted nonnumeric,
    plink_set.c:394) + gene name; values merged [start, end+1)
    ranges."""
    entries = []
    with open(path) as f:
        for line in f:
            toks = line.split()
            if not toks:
                continue
            if len(toks) < 4:
                raise FlagError(
                    "Line of --gene-report gene list has fewer "
                    "tokens than expected.")
            code = _parse_chrom(toks[0])
            if code is None:
                continue
            if subset is not None and toks[3] not in subset:
                continue
            start = int(toks[1])
            end = int(toks[2])
            if end < start:
                raise FlagError(
                    "Range end position smaller than range start in "
                    "--gene-report gene list.")
            pfx = f"{code:04d}"
            pfx = pfx[:3] + chr(ord(pfx[3]) - 15)
            entries.append((pfx + toks[3], start, end + 1))
    names = sorted({k for k, _s, _e in entries}, key=_natkey)
    genes = {}
    for key in names:
        rr = sorted((s, e) for k, s, e in entries if k == key)
        merged = []
        for s, e in rr:
            if merged and s <= merged[-1][1]:
                if e > merged[-1][1]:
                    merged[-1][1] = e
            else:
                merged.append([s, e])
        genes[key] = merged
    return names, genes


def _interval_hits(flat, lo, hi):
    """interval_in_setdef (1.9/plink_set.c:122);
    uint32arr_greater_than is a bisect_left."""
    if not flat:
        return False
    uii = bisect.bisect_left(flat, lo + 1)
    if uii & 1:
        return True
    if uii == len(flat):
        return False
    return flat[uii] < hi


def _decode_chrom(key):
    return ((ord(key[0]) - 48) * 1000 + (ord(key[1]) - 48) * 100
            + (ord(key[2]) - 48) * 10 + (ord(key[3]) - 48 + 15))


def run_gene_report(cfg, log: RunLogger) -> None:
    from ..utils.chrom import ChrInfo

    fname, glist = cfg.gene_report
    border = cfg.gene_list_border or 0
    ci = ChrInfo()
    subset = None
    if cfg.gene_subset:
        subset = set()
        for line in open(cfg.gene_subset):
            subset.update(line.split())
    extract = None
    if cfg.extract:
        path = cfg.extract[0] if isinstance(
            cfg.extract, (list, tuple)) else cfg.extract
        extract = set()
        for line in open(path):
            extract.update(line.split())
    pfilter = cfg.pfilter
    do_pfilter = pfilter is not None
    snp_field = cfg.gene_report_snp_field or "SNP"

    names, genes = _load_gene_list(glist, subset)
    if not names:
        if subset is not None:
            raise FlagError(
                "No --gene-subset genes present in --gene-report "
                "file.")
        raise FlagError("Empty --gene-report file.")
    flats = {k: [x for se in genes[k] for x in se] for k in names}
    by_chrom: dict[int, list] = {}
    for k in names:
        by_chrom.setdefault(_decode_chrom(k), []).append(k)

    with open(fname) as f:
        lines = f.readlines()
    if not lines:
        raise FlagError("Empty --gene-report file.")
    header = lines[0].rstrip("\r\n")
    cols = {}
    for idx, tok in enumerate(header.split()):
        if tok == "CHR" and 0 not in cols:
            cols[0] = idx
        elif tok == "BP" and 1 not in cols:
            cols[1] = idx
        elif extract is not None and tok == snp_field \
                and 2 not in cols:
            cols[2] = idx
        elif do_pfilter and tok == "P" and 3 not in cols:
            cols[3] = idx
    need = 2 + (extract is not None) + (1 if do_pfilter else 0)
    if len(cols) != need:
        raise FlagError(
            "Missing column header(s) in --gene-report file.")
    chr_col, bp_col = cols[0], cols[1]

    saved = []
    matches = []
    # display order: natural sort on "NAME <last-2-prefix-chars>"
    # (plink_set.c:3418-3424)
    disp = sorted(names, key=lambda k: _natkey(k[4:] + " " + k[2:4]))
    name_index = {k: i for i, k in enumerate(disp)}
    names = disp
    for raw in lines[1:]:
        toks = raw.split()
        if not toks or max(chr_col, bp_col) >= len(toks):
            continue
        code = _parse_chrom(toks[chr_col])
        if code is None:
            continue
        try:
            bp = int(toks[bp_col])
        except ValueError:
            continue
        if bp < 0:
            continue
        if extract is not None:
            if cols[2] >= len(toks) or toks[cols[2]] not in extract:
                continue
        if do_pfilter:
            if cols[3] >= len(toks):
                continue
            try:
                pv = float(toks[cols[3]])
            except ValueError:
                continue
            if not pv <= pfilter:
                continue
        lo = bp - border if bp > border else 0
        hi = bp + border
        hit_any = False
        for k in by_chrom.get(code, ()):
            if _interval_hits(flats[k], lo, hi):
                matches.append((name_index[k], len(saved)))
                hit_any = True
        if hit_any:
            saved.append((raw if raw.endswith("\n") else raw + "\n",
                          bp))
    matches.sort()

    outp = cfg.out + ".range.report"
    fh = open(outp, "w")
    cur = -1
    cur_start = 0
    for ni, li in matches:
        if ni != cur:
            if cur != -1:
                fh.write("\n\n")
            cur = ni
            k = names[ni]
            fh.write(k[4:] + " -- chr"
                     + ci.name19(_decode_chrom(k)) + ":")
            glen = 0
            parts = []
            for s, e in genes[k]:
                parts.append(f"{s}..{e - 1}")
                glen += e - s
            fh.write(", ".join(parts))
            fh.write(" ( " + dtoa_g(glen * 0.001) + "kb ) ")
            if border:
                fh.write(" plus " + dtoa_g(border * 0.001)
                         + "kb border ")
            fh.write("\n\n        DIST " + header + "\n")
            cur_start = genes[k][0][0]
        txt, bp = saved[li]
        fh.write(_g4((bp - cur_start) * 0.001, 10) + "kb " + txt)
    if cur != -1:
        fh.write("\n\n")
    fh.close()
    log.log(f"--gene-report: gene-based report written to {outp} .")
