"""--annotate: attach range/attribute annotations to a PLINK report.

Behavior reference: annotate() (1.9/plink_set.c:2414-3252) +
in_setdef/in_setdef_dist (:100-160) + load_range_list_sortpos
(:2215-2345).  Standalone report post-processor (no genotype data).
Reads an association-style report, finds the CHR/BP/<snp-field>/P
columns from the header, and writes <out>.annot with each surviving
line followed by its annotations: gene-range names from ``ranges=``
(with optional signed kb distances inside a --border window) and/or
per-variant attribute tags from ``attrib=``.  ``block`` emits one 0/1
column per unique annotation instead; ``prune`` drops unannotated
rows; ``filter=`` restricts rows to a second range list.
"""

from __future__ import annotations

import bisect
import functools
import gzip

from ..cli import FlagError
from ..utils.fmt import dtoa_g
from ..utils.logging import RunLogger
from .assoc19 import _g4
from .gene_report import _decode_chrom, _parse_chrom
from .meta import strcmp_natural

_natkey = functools.cmp_to_key(
    lambda a, b: strcmp_natural(a.encode(), b.encode()))


def _opent(path):
    """Text open with transparent gzip/BGZF/zstd (gzopen_read_checked),
    via the decompress-ahead readers in io/compress.py."""
    from ..io.compress import open_text_auto

    return open_text_auto(path)


def _read_token_file(path, descrip):
    """scan_token_ct_len + read_tokens: whitespace-separated IDs."""
    toks = []
    with _opent(path) as f:
        for line in f:
            toks.extend(line.split())
    if not toks:
        raise FlagError(f"{path} is empty.")
    return set(toks)


def _load_ranges(path, border, subset, descrip):
    """load_range_list_sortpos (1.9/plink_set.c:2215): natural-sorted
    (chrom-prefix + name) range list with per-name interval merging.
    ``border`` is baked into each interval at load time (plink_set.c:516).
    Returns (names_with_prefix, flats, per_chrom index lists)."""
    entries = []
    with _opent(path) as f:
        for line in f:
            toks = line.split()
            if not toks:
                continue
            if len(toks) < 4:
                raise FlagError(
                    f"Line of {descrip} file has fewer tokens than "
                    "expected.")
            code = _parse_chrom(toks[0])
            if code is None:
                continue
            if subset is not None and toks[3] not in subset:
                continue
            try:
                start = int(toks[1])
                end = int(toks[2])
            except ValueError:
                raise FlagError(
                    f"Invalid range position in {descrip} file.")
            if end < start:
                raise FlagError(
                    f"Range end position smaller than range start in "
                    f"{descrip} file.")
            start = start - border if start > border else 0
            end += border
            pfx = f"{code:04d}"
            pfx = pfx[:3] + chr(ord(pfx[3]) - 15)
            entries.append((pfx + toks[3], start, end + 1))
    names = sorted({k for k, _s, _e in entries}, key=_natkey)
    flats = []
    for key in names:
        rr = sorted((s, e) for k, s, e in entries if k == key)
        merged = []
        for s, e in rr:
            if merged and s <= merged[-1][1]:
                if e > merged[-1][1]:
                    merged[-1][1] = e
            else:
                merged.append([s, e])
        flats.append([x for se in merged for x in se])
    by_chrom: dict[int, list[int]] = {}
    for i, k in enumerate(names):
        by_chrom.setdefault(_decode_chrom(k), []).append(i)
    return names, flats, by_chrom


def _in_setdef(flat, pos):
    """in_setdef (1.9/plink_set.c:100): bp membership in the merged
    half-open interval list."""
    return bool(bisect.bisect_left(flat, pos + 1) & 1)


def _in_setdef_dist(flat, pos, border):
    """in_setdef_dist (1.9/plink_set.c:118): membership within
    ``border`` of an interval + signed distance (negative = upstream
    of interval start; ties broken toward negative to match 1.07)."""
    uii = bisect.bisect_left(flat, pos + 1)
    if uii & 1:
        return True, 0
    if uii == 0:
        if pos + border >= flat[0]:
            return True, pos - flat[0]
        return False, 0
    if uii == len(flat):
        if flat[uii - 1] + border > pos:
            return True, pos + 1 - flat[uii - 1]
        return False, 0
    if flat[uii - 1] + border > pos:
        ii = pos + 1 - flat[uii - 1]
        if pos + ii > flat[uii]:
            ii = pos - flat[uii]
        return True, ii
    if pos + border >= flat[uii]:
        return True, pos - flat[uii]
    return False, 0


def _load_attrib(path, snplist, log):
    """Two-pass attribute load (plink_set.c:2556-2712): natural-sorted
    unique attribute IDs + per-variant membership sets."""
    attr_ids = set()
    var_rows = []
    with _opent(path) as f:
        for line in f:
            toks = line.split()
            if len(toks) < 2:
                continue
            if snplist is not None and toks[0] not in snplist:
                continue
            attr_ids.update(toks[1:])
            var_rows.append((toks[0], toks[1:]))
    if not attr_ids:
        raise FlagError(f"No attributes in {path}.")
    sorted_attrs = sorted(attr_ids, key=_natkey)
    aidx = {a: i for i, a in enumerate(sorted_attrs)}
    var_attrs: dict[str, set[int]] = {}
    for vid, attrs in var_rows:
        if vid not in var_attrs:
            var_attrs[vid] = {aidx[a] for a in attrs}
    n = len(var_rows)
    m = len(sorted_attrs)
    log.log(
        f"--annotate attrib: {n} variant ID{'' if n == 1 else 's'} and "
        f"{m} unique attribute{'' if m == 1 else 's'} loaded from "
        f"{path}.")
    return sorted_attrs, var_attrs


def run_annotate(cfg, log: RunLogger) -> None:
    fname, files, mods = cfg.annotate
    border = cfg.border or 0
    block01 = "block" in mods
    prune = "prune" in mods
    range_dist = "minimal" not in mods
    track_distance = "distance" in mods
    no_annot_str = "NA" if "NA" in mods else "."
    no_sign_str = "  NA" if "NA" in mods else "   ."

    need_var_id = "attrib" in files or "snps" in files
    need_pos = "ranges" in files or "filter" in files
    pfilter = cfg.pfilter
    do_pfilter = pfilter is not None
    snp_field = cfg.annotate_snp_field or "SNP"

    snplist = None
    if "snps" in files:
        snplist = _read_token_file(files["snps"], "--annotate snps")
    sorted_attrs: list[str] = []
    var_attrs: dict[str, set[int]] = {}
    if "attrib" in files:
        sorted_attrs, var_attrs = _load_attrib(
            files["attrib"], snplist, log)

    range_names: list[str] = []
    range_flats: list[list[int]] = []
    range_by_chrom: dict[int, list[int]] = {}
    if "ranges" in files:
        subset = None
        if "subset" in files:
            subset = _read_token_file(
                files["subset"], "--annotate subset")
        # border baked into the rangedefs only for block-without-
        # distance; otherwise applied at query time for exact nearest
        # distances (plink_set.c:2752)
        load_border = border if (block01 and not track_distance) else 0
        range_names, range_flats, range_by_chrom = _load_ranges(
            files["ranges"], load_border, subset, "--annotate ranges")
        rc = len(range_names)
        if rc != 1:
            log.log(
                f"--annotate ranges: {rc} annotations loaded from "
                f"{files['ranges']} (counting multi-chromosome "
                "annotations once per spanned chromosome).")
        else:
            log.log("--annotate ranges: 1 annotation loaded from "
                    f"{files['ranges']}.")
    filter_flats: list[list[int]] = []
    filter_by_chrom: dict[int, list[int]] = {}
    has_filter = "filter" in files
    if has_filter:
        _fn, filter_flats, filter_by_chrom = _load_ranges(
            files["filter"], border, None, "--annotate filter")

    # block mode: merged natural-sorted unique annotation list with
    # [range idx -> writebuf char pos] and [attr idx -> pos] lookups
    # (plink_set.c:2784-2850)
    range_lookup: list[int] = []
    attr_remap: list[int] = []
    uniq_names: list[str] = []
    if block01:
        if range_names:
            items = ([(nm[4:], 0, i) for i, nm in
                      enumerate(range_names)]
                     + [(nm, 1, i) for i, nm in
                        enumerate(sorted_attrs)])
            items.sort(key=lambda t: _natkey(t[0]))
            range_lookup = [0] * len(range_names)
            attr_remap = [0] * len(sorted_attrs)
            prev = None
            widx = -1
            for nm, kind, oi in items:
                if prev is None or nm != prev:
                    widx += 1
                    prev = nm
                    uniq_names.append(nm)
                if kind == 0:
                    range_lookup[oi] = 2 * widx + 1
                else:
                    attr_remap[oi] = 2 * widx + 1
        else:
            uniq_names = list(sorted_attrs)
            attr_remap = [2 * i + 1 for i in range(len(sorted_attrs))]
        n = len(uniq_names)
        log.log(f"--annotate block: {n} unique annotation"
                f"{'' if n == 1 else 's'} present.")

    with open(fname) as f:
        lines = f.readlines()
    if not lines:
        raise FlagError(f"Empty --annotate file {fname}.")
    header = lines[0].rstrip("\r\n")
    # header scan (plink_set.c:2895-2930): only tokens of length <= 3
    # are eligible (max_header_len quirk at :2519 leaves the cap at 3
    # even for longer custom snp fields)
    cols: dict[int, int] = {}
    for idx, tok in enumerate(header.split()):
        if len(tok) > 3:
            continue
        if need_pos and tok == "CHR":
            uii = 0
        elif need_pos and tok == "BP":
            uii = 1
        elif need_var_id and tok == snp_field:
            uii = 2
        elif do_pfilter and tok == "P":
            uii = 3
        else:
            continue
        if uii in cols:
            raise FlagError(
                f"Duplicate column header '{tok}' in {fname}.")
        cols[uii] = idx
    token_ct = 2 * need_pos + need_var_id + (1 if do_pfilter else 0)
    if len(cols) != token_ct:
        raise FlagError(
            "Missing column header"
            f"{'' if len(cols) + 1 == token_ct else 's'} in {fname}.")
    max_col = max(cols.values())

    outp = cfg.out + ".annot"
    fh = open(outp, "w")
    fh.write(header)
    if track_distance:
        fh.write("        DIST         SGN")
    if block01:
        for nm in uniq_names:
            fh.write(" " + nm)
    else:
        fh.write(" ANNOT")
    fh.write("\n")

    annot_row_ct = 0
    total_row_ct = 0
    for raw in lines[1:]:
        toks = raw.split()
        if not toks or max_col >= len(toks):
            continue
        chrom_idx = -1
        cur_bp = 0
        if need_pos:
            code = _parse_chrom(toks[cols[0]])
            if code is None:
                continue
            chrom_idx = code
            try:
                cur_bp = int(toks[cols[1]])
            except ValueError:
                continue
            if not 0 <= cur_bp <= 0x7ffffffe:
                continue
            if has_filter:
                hits = filter_by_chrom.get(chrom_idx, ())
                if not any(_in_setdef(filter_flats[i], cur_bp)
                           for i in hits):
                    continue
        if snplist is not None and toks[cols[2]] not in snplist:
            continue
        if do_pfilter:
            try:
                pv = float(toks[cols[3]])
            except ValueError:
                continue
            if not pv <= pfilter:
                continue

        abs_min_dist = None
        min_dist = 0
        if not block01:
            parts: list[str] = []
            for ri in range_by_chrom.get(chrom_idx, ()):
                if not border:
                    if _in_setdef(range_flats[ri], cur_bp):
                        nm = range_names[ri][4:]
                        parts.append(
                            nm + "(0)|" if range_dist else nm + "|")
                else:
                    hit, ii = _in_setdef_dist(
                        range_flats[ri], cur_bp, border)
                    if hit:
                        if abs_min_dist is None \
                                or abs(ii) < abs_min_dist:
                            abs_min_dist = abs(ii)
                            min_dist = ii
                        nm = range_names[ri][4:]
                        if not range_dist:
                            parts.append(nm + "|")
                        elif ii == 0:
                            parts.append(nm + "(0)|")
                        else:
                            sign = "+" if ii > 0 else ""
                            parts.append(
                                nm + "(" + sign
                                + _g4(ii * 0.001, 1) + "kb)|")
            if not border and parts:
                abs_min_dist = 0
            if 2 in cols:
                for ai in sorted(var_attrs.get(toks[cols[2]], ())):
                    parts.append(sorted_attrs[ai] + "|")
            if parts:
                annot_buf = "".join(parts)[:-1]
                annot_row_ct += 1
            else:
                if prune:
                    continue
                annot_buf = no_annot_str
        else:
            buf = bytearray(b" 0" * len(uniq_names))
            any_annot = False
            for ri in range_by_chrom.get(chrom_idx, ()):
                if not border or not track_distance:
                    if _in_setdef(range_flats[ri], cur_bp):
                        buf[range_lookup[ri]] = 0x31
                        any_annot = True
                else:
                    hit, ii = _in_setdef_dist(
                        range_flats[ri], cur_bp, border)
                    if hit:
                        if abs_min_dist is None \
                                or abs(ii) < abs_min_dist:
                            abs_min_dist = abs(ii)
                            min_dist = ii
                        buf[range_lookup[ri]] = 0x31
                        any_annot = True
            if not border and any_annot and range_names:
                abs_min_dist = 0
            if 2 in cols:
                for ai in var_attrs.get(toks[cols[2]], ()):
                    buf[attr_remap[ai]] = 0x31
                    any_annot = True
            if any_annot:
                annot_row_ct += 1
            elif prune:
                continue
            annot_buf = buf.decode()

        total_row_ct += 1
        fh.write(raw.rstrip("\r\n"))
        if track_distance:
            if abs_min_dist is not None:
                fh.write(dtoa_g(abs_min_dist * 0.001).rjust(12))
                if abs_min_dist == 0:
                    fh.write(no_sign_str)
                else:
                    fh.write("   +" if min_dist > 0 else "   -")
            else:
                fh.write(" " * 8 + no_sign_str + no_sign_str)
        fh.write(" " + annot_buf + "\n")
    fh.close()

    if not prune:
        log.log(
            f"--annotate: {annot_row_ct} out of {total_row_ct} row"
            f"{'' if total_row_ct == 1 else 's'} annotated; new "
            f"report written to {outp} .")
    else:
        log.log(
            f"--annotate: {total_row_ct} row"
            f"{'' if total_row_ct == 1 else 's'} annotated; new "
            f"report written to {outp} .")
