"""--fa / --ref-from-fa [force] / --normalize [list]: reference-FASTA
operations.

Behavior reference: ProcessFa / RefFromFaContig / VNormalizeContig
(2.0/plink2_fasta.cc:478, :33, :174):
- ref-from-fa: per variant, the unique allele whose string prefix-matches
  the contig at POS becomes REF (genotypes rotated); multiple matches are
  skipped, zero matches downgrade trusted REFs to provisional (force) or
  error; changing a trusted REF requires 'force'.
- normalize: the vt (Tan/Abecasis/Kang 2015) algorithm exactly as coded in
  VNormalizeContig, including its virtual left-extension of alleles with
  reference bases during right-trimming.
Genotype rotation is applied through a packed-domain flip overlay on the
reader (REF<->ALT1 swap = 2-bit code 0<->2 per sample).
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..utils.logging import RunLogger

# byte LUT swapping 2-bit codes 0<->2 (1 and 3 unchanged) in packed bytes
_FLIP_LUT = np.empty(256, np.uint8)
for _b in range(256):
    _o = 0
    for _k in range(4):
        _c = (_b >> (2 * _k)) & 3
        _c = 2 if _c == 0 else (0 if _c == 2 else _c)
        _o |= _c << (2 * _k)
    _FLIP_LUT[_b] = _o


class FlipOverlayReader:
    """Wraps a pgen reader, swapping REF/ALT genotype codes for flagged
    variants (allele_permute application, 2.0/plink2_common.cc:4779)."""

    def __init__(self, inner, flip: np.ndarray):
        self._inner = inner
        self._flip = flip
        self.header = inner.header
        self.variant_ct = inner.variant_ct
        self.sample_ct = inner.sample_ct

    def read_packed(self, vstart: int, vct: int) -> np.ndarray:
        out = self._inner.read_packed(vstart, vct)
        sub = self._flip[vstart : vstart + vct]
        if sub.any():
            out = out.copy()
            out[sub] = _FLIP_LUT[out[sub]]
        return out

    def __getattr__(self, name):
        return getattr(self._inner, name)


def _read_fasta(path: str) -> dict[str, str]:
    seqs: dict[str, str] = {}
    name = None
    parts: list[str] = []
    with open(path) as f:
        for ln in f:
            ln = ln.strip()
            if not ln or ln.startswith(";"):
                continue
            if ln.startswith(">"):
                if name is not None:
                    seqs[name] = "N" + "".join(parts)  # 1-based indexing pad
                name = ln[1:].split()[0]
                parts = []
            else:
                parts.append(ln.upper())
    if name is not None:
        seqs[name] = "N" + "".join(parts)
    return seqs


def _normalize_one(pos: int, alleles: list[str], seq: str):
    """Exact port of the VNormalizeContig per-variant update (biallelic+).
    seq[p] = base at 1-based position p.  Returns (pos, alleles, changed)."""
    alens = [len(a) for a in alleles]
    if all(l == 1 for l in alens):
        return pos, alleles, False
    if any(a[0] in "<*" for a in alleles):
        return pos, alleles, False
    min_alen = min(alens)
    left_match = alleles[0][0]
    if any(a[0] != left_match for a in alleles):
        left_match = None
    right_match = alleles[0][-1]
    if any(a[-1] != right_match for a in alleles):
        right_match = None
    if (left_match is None or min_alen == 1) and right_match is None:
        return pos, alleles, False

    orig_pos = pos

    def prev_ref(i: int) -> str:
        # prev_ref[i] = seqbuf[orig_bp - 1 + i]; the reference binds this
        # pointer BEFORE the position is shifted
        j = orig_pos - 1 + i
        return seq[j] if 0 <= j < len(seq) else "N"

    rtrim_stop = pos + min_alen - 1
    ltrim = 0
    lshift = 0
    if right_match is None or rtrim_stop == 0:
        # left-trim only
        lt = 1
        while lt != min_alen - 1:
            c = alleles[0][lt]
            if any(a[lt] != c for a in alleles[1:]):
                break
            lt += 1
        new_alleles = [a[lt:] for a in alleles]
        return pos + lt, new_alleles, True

    rtrim = 0
    while True:
        rtrim += 1
        chars = []
        for a, al in zip(alleles, alens):
            if rtrim >= al:
                chars.append(prev_ref(al - rtrim))
            else:
                chars.append(a[al - 1 - rtrim])
        if any(c != chars[0] for c in chars[1:]):
            break
        if rtrim == rtrim_stop:
            break
    if rtrim >= min_alen:
        lshift = rtrim + 1 - min_alen
        pos -= lshift
        shifted_ref = seq[pos : pos + lshift] if pos + lshift <= len(seq) else (
            seq[pos:] + "N" * (pos + lshift - len(seq))
        )
    else:
        rem = min_alen - rtrim
        if left_match is not None and rem > 1:
            ltrim = 1
            while ltrim != rem - 1:
                c = alleles[0][ltrim]
                if any(a[ltrim] != c for a in alleles[1:]):
                    break
                ltrim += 1
        pos += ltrim
        shifted_ref = ""
    new_alleles = []
    for a, al in zip(alleles, alens):
        if al <= rtrim:
            new_alleles.append(prev_ref(al - rtrim))
        else:
            new_slen = al + lshift - rtrim - ltrim
            core = a[ltrim:]
            if lshift:
                take = min(lshift, new_slen)
                na = shifted_ref[:take] + core[: new_slen - take]
            else:
                na = core[:new_slen]
            new_alleles.append(na)
    return pos, new_alleles, True


def process_fa(ds: Dataset, cfg, log: RunLogger) -> None:
    fa_path = cfg.fa[0]
    seqs = _read_fasta(fa_path)
    ref_from = cfg.ref_from_fa is not None
    force = ref_from and "force" in cfg.ref_from_fa
    do_norm = cfg.normalize

    vi = ds.vi
    hdr = ds.reader.header
    if hdr.provisional_ref is not None:
        prov = hdr.provisional_ref.copy()
    else:
        prov = np.full(ds.raw_variant_ct, bool(hdr.all_provisional))
    flip = np.zeros(ds.raw_variant_ct, bool)
    changed = validated = downgraded = 0
    nchanged = 0
    unsorted = False

    name_of = {}
    for cname in seqs:
        try:
            name_of[vi.chr_info.code(cname)] = cname
        except Exception:
            pass
    alt_split = [str(a).split(",") for a in vi.alt]
    for v in np.flatnonzero(ds.variant_mask):
        code = int(vi.chrom[v])
        cname = name_of.get(code)
        if cname is None:
            continue
        seq = seqs[cname]
        pos = int(vi.pos[v])
        alleles = [str(vi.ref[v])] + alt_split[v]
        if ref_from:
            fa_at = seq[pos : pos + max(len(a) for a in alleles)]
            matches = [
                ai for ai, a in enumerate(alleles)
                if pos + len(a) <= len(seq)
                and seq[pos : pos + len(a)].upper() == a.upper()
            ]
            if len(matches) == 1:
                ai = matches[0]
                if ai:
                    if not prov[v] and not force:
                        raise ValueError(
                            "--ref-from-fa wants to change reference allele "
                            f"assignment at {vi.chr_info.name(code)}:{pos}, "
                            "but it's marked as 'known'. Add the 'force' "
                            "modifier to force this change through."
                        )
                    # biallelic swap only (multiallelic rotation unsupported)
                    if len(alleles) == 2:
                        vi.ref[v], vi.alt[v] = alleles[1], alleles[0]
                        flip[v] = True
                        alleles = [alleles[1], alleles[0]]
                    changed += 1
                else:
                    validated += 1
                prov[v] = False
            elif not matches and not prov[v]:
                if not force:
                    raise ValueError(
                        f"Reference allele at {vi.chr_info.name(code)}:{pos} "
                        "is marked as 'known', but is inconsistent with .fa "
                        "file. Add the 'force' modifier to downgrade it to "
                        "provisional."
                    )
                prov[v] = True
                downgraded += 1
        if do_norm:
            new_pos, new_alleles, ch = _normalize_one(pos, alleles, seq)
            if ch:
                nchanged += 1
                vi.pos[v] = new_pos
                vi.ref[v] = new_alleles[0]
                vi.alt[v] = ",".join(new_alleles[1:])

    if ref_from:
        log.log(
            f"--ref-from-fa{' force' if force else ''}: {changed} "
            f"variant{'s' if changed != 1 else ''} changed, "
            f"{validated} validated."
        )
        hdr.provisional_ref = prov
        hdr.all_provisional = bool(prov.all())
        if flip.any():
            ds.reader = FlipOverlayReader(ds.reader, flip)
            ds.invalidate_genotypes()
    if do_norm:
        log.log(
            f"--normalize: {nchanged} variant{'s' if nchanged != 1 else ''} "
            "changed."
        )
        inc = np.flatnonzero(ds.variant_mask)
        pos = vi.pos[inc]
        ch = vi.chrom[inc]
        for k in range(1, len(inc)):
            if ch[k] == ch[k - 1] and pos[k] < pos[k - 1]:
                unsorted = True
                break
        if unsorted:
            log.log("Warning: Base-pair positions are now unsorted!")
