"""--update-name/-map/-alleles/-ids/-parents: metadata editors.

Behavior reference: plink2_misc.cc UpdateVarNames/UpdateVarBps/
UpdateVarAlleles/UpdateSampleIds/UpdateSampleParents; log message formats
("--update-name: N values updated.", "--update-ids: N samples updated,
M IDs not present.") verified against a locally built plink2.

Column conventions: --update-name <file> [new-id-col] [old-id-col]
(defaults 2, 1); --update-map <file> [bp-col] [id-col] (defaults 2, 1);
--update-alleles is 3-col (ID NEW1 NEW2) or 5-col (ID OLD1 OLD2 NEW1 NEW2)
with order-insensitive old-allele matching; --update-ids is 2-col
(OLD NEW, IID-only) or 4-col (OLD_FID OLD_IID NEW_FID NEW_IID);
--update-parents is 3-col (IID PAT MAT) or 4-col (FID IID PAT MAT).
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..utils.logging import RunLogger


def _read_lines(path):
    with open(path) as f:
        return [l.split() for l in f
                if l.strip() and not l.lstrip().startswith("#")]


def update_name(ds: Dataset, args: tuple, log: RunLogger) -> None:
    path = args[0]
    newc = int(args[1]) if len(args) > 1 else 2
    oldc = int(args[2]) if len(args) > 2 else 1
    skip = int(args[3]) if len(args) > 3 else 0
    rows = _read_lines(path)[skip:]
    vid_to_idx: dict = {}
    for i in np.flatnonzero(ds.variant_mask):
        vid_to_idx.setdefault(str(ds.vi.vid[i]), i)
    n = miss = 0
    for t in rows:
        i = vid_to_idx.get(t[oldc - 1])
        if i is None:
            miss += 1
            continue
        ds.vi.vid[i] = t[newc - 1]
        n += 1
    msg = f"--update-name: {n} value{'s' if n != 1 else ''} updated"
    if miss:
        msg += f", {miss} variant ID{'s' if miss != 1 else ''} not present"
    log.log(msg + ".")


def update_map(ds: Dataset, args: tuple, log: RunLogger) -> None:
    path = args[0]
    bpc = int(args[1]) if len(args) > 1 else 2
    idc = int(args[2]) if len(args) > 2 else 1
    skip = int(args[3]) if len(args) > 3 else 0
    rows = _read_lines(path)[skip:]
    vid_to_idx: dict = {}
    for i in np.flatnonzero(ds.variant_mask):
        vid_to_idx.setdefault(str(ds.vi.vid[i]), i)
    n = miss = 0
    for t in rows:
        i = vid_to_idx.get(t[idc - 1])
        if i is None:
            miss += 1
            continue
        ds.vi.pos[i] = int(t[bpc - 1])
        n += 1
    msg = f"--update-map: {n} value{'s' if n != 1 else ''} updated"
    if miss:
        msg += f", {miss} variant ID{'s' if miss != 1 else ''} not present"
    log.log(msg + ".")
    inc = np.flatnonzero(ds.variant_mask)
    pos = ds.vi.pos[inc]
    chrom = ds.vi.chrom[inc]
    unsorted = False
    for k in range(1, len(inc)):
        if chrom[k] == chrom[k - 1] and pos[k] < pos[k - 1]:
            unsorted = True
            break
    if unsorted:
        log.log("Warning: Base-pair positions are now unsorted!")


def update_alleles(ds: Dataset, path: str, log: RunLogger) -> None:
    rows = _read_lines(path)
    vid_to_idx: dict = {}
    for i in np.flatnonzero(ds.variant_mask):
        vid_to_idx.setdefault(str(ds.vi.vid[i]), i)
    n = miss = mismatch = 0
    for t in rows:
        i = vid_to_idx.get(t[0])
        if i is None:
            miss += 1
            continue
        ref, alt1 = str(ds.vi.ref[i]), str(ds.vi.alt[i]).split(",", 1)[0]
        if len(t) >= 5:
            o1, o2, n1, n2 = t[1], t[2], t[3], t[4]
            if (o1, o2) == (ref, alt1):
                ds.vi.ref[i], ds.vi.alt[i] = n1, n2
            elif (o2, o1) == (ref, alt1):
                ds.vi.ref[i], ds.vi.alt[i] = n2, n1
            else:
                mismatch += 1
                continue
        else:
            ds.vi.ref[i], ds.vi.alt[i] = t[1], t[2]
        n += 1
    msg = f"--update-alleles: {n} variant{'s' if n != 1 else ''} updated"
    if mismatch:
        msg += f", {mismatch} mismatch{'es' if mismatch != 1 else ''}"
    if miss:
        msg += f", {miss} variant ID{'s' if miss != 1 else ''} not present"
    log.log(msg + ".")


def update_ids(ds: Dataset, path: str, log: RunLogger) -> None:
    rows = _read_lines(path)
    si = ds.si
    n = miss = 0
    for t in rows:
        if len(t) >= 4:
            key_fid, key_iid, new_fid, new_iid = t[0], t[1], t[2], t[3]
            hit = False
            for i in range(si.sample_ct):
                if str(si.fid[i]) == key_fid and str(si.iid[i]) == key_iid:
                    si.fid[i], si.iid[i] = new_fid, new_iid
                    hit = True
            n += hit
            miss += not hit
        else:
            key_iid, new_iid = t[0], t[1]
            hit = False
            for i in range(si.sample_ct):
                if str(si.iid[i]) == key_iid:
                    si.iid[i] = new_iid
                    hit = True
            n += hit
            miss += not hit
    msg = f"--update-ids: {n} sample{'s' if n != 1 else ''} updated"
    if miss:
        msg += f", {miss} ID{'s' if miss != 1 else ''} not present"
    log.log(msg + ".")


def update_parents(ds: Dataset, path: str, log: RunLogger) -> None:
    rows = _read_lines(path)
    si = ds.si
    if si.pat is None:
        si.pat = np.array(["0"] * si.sample_ct, dtype=object)
    if si.mat is None:
        si.mat = np.array(["0"] * si.sample_ct, dtype=object)
    use_fid = rows and len(rows[0]) >= 4
    if use_fid:
        keys = {f"{si.fid[i]}\t{si.iid[i]}": i for i in range(si.sample_ct)}
    else:
        keys = {str(si.iid[i]): i for i in range(si.sample_ct)}
    n = miss = 0
    for t in rows:
        if use_fid:
            key, pat, mat = f"{t[0]}\t{t[1]}", t[2], t[3]
        else:
            key, pat, mat = t[0], t[1], t[2]
        i = keys.get(key)
        if i is None:
            miss += 1
            continue
        si.pat[i], si.mat[i] = pat, mat
        n += 1
    msg = f"--update-parents: {n} sample{'s' if n != 1 else ''} updated"
    if miss:
        msg += f", {miss} ID{'s' if miss != 1 else ''} not present"
    log.log(msg + ".")


_ACGT_FWD = {"1": "A", "2": "C", "3": "G", "4": "T"}
_ACGT_REV = {"A": "1", "C": "2", "G": "3", "T": "4"}


def allelexxxx_recode(ds: Dataset, direction: str, multichar: bool,
                      log: RunLogger) -> None:
    """--allele1234 / --alleleACGT allele-code translation (ref
    allelexxxx_recode, 1.9/plink.c:208-261).

    Single-character alleles are always translated; multi-character
    alleles only under the `multichar` modifier, character by character.
    The ACGT direction converts digits '1'-'4'; the 1234 direction
    converts uppercase A/C/G/T only (acgt_reverse_arr's identity entries
    leave B..S — and everything else, incl. lowercase — unchanged).
    Upstream prints nothing for this step."""
    conv = _ACGT_FWD if direction == "acgt" else _ACGT_REV

    def rc1(a: str) -> str:
        if len(a) == 1:
            return conv.get(a, a)
        if multichar:
            return "".join(conv.get(c, c) for c in a)
        return a

    vi = ds.vi
    vi.ref = np.array([rc1(a) for a in vi.ref], dtype=object)
    vi.alt = np.array([",".join(rc1(x) for x in a.split(","))
                       for a in vi.alt], dtype=object)
    flag = "--alleleACGT" if direction == "acgt" else "--allele1234"
    log.log(f"{flag}: allele codes translated.", console=False)
