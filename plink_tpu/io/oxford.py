"""Oxford .gen/.sample import and export.

Behavior reference: OxGenToPgen / OxSampleToPsam (2.0/plink2_import.cc) and
ExportOxGen / Export .sample (2.0/plink2_export.cc): .gen rows are
"CHR ID POS ALT REF P(homALT) P(het) P(homREF) ..." (plink2 writes the
ALT allele first and REF last; missing genotype = 0 0 0); .sample has the
two-line Oxford header ("ID_1 ID_2 missing sex <phenos>" then type codes
"0 0 0 D [P|B|D...]"), sex 1/2 with 'NA' for unknown, qt phenos type P,
case/control type B coded 0/1.
"""

from __future__ import annotations

import numpy as np

from ..utils.chrom import ChrInfo
from .psam import PhenoCol, SampleInfo, _build_pheno
from .pvar import VariantInfo


def read_sample(path: str) -> SampleInfo:
    with open(path) as f:
        lines = [l.split() for l in f if l.strip()]
    hdr = lines[0]
    types = lines[1]
    body = lines[2:]
    n = len(body)
    fid = np.array([t[0] for t in body], dtype=object)
    iid = np.array([t[1] for t in body], dtype=object)
    sex = np.zeros(n, np.int8)
    phenos: dict[str, PhenoCol] = {}
    col_of = {c: j for j, c in enumerate(hdr)}
    if "sex" in col_of:
        j = col_of["sex"]
        for i, t in enumerate(body):
            v = t[j]
            sex[i] = int(v) if v in ("1", "2") else 0
    for j in range(2, len(hdr)):
        name = hdr[j]
        if name in ("missing", "sex"):
            continue
        tcode = types[j] if j < len(types) else "P"
        vals = [t[j] if j < len(t) else "NA" for t in body]
        if tcode == "B":
            # 0/1 -> plink 1/2 control/case coding for _build_pheno
            vals = [
                "2" if v == "1" else ("1" if v == "0" else "NA") for v in vals
            ]
        phenos[name] = _build_pheno(name, vals)
    has_fid = any(f != "0" for f in fid)
    return SampleInfo(fid=fid, iid=iid, sid=None, pat=None, mat=None,
                      sex=sex, phenos=phenos, has_fid=has_fid)


def read_gen(path: str, sample_path: str, ref_mode: str = "ref-last",
             hard_call_threshold: float = 0.1):
    """Returns (vi, si, codes [V, N] uint8)."""
    si = read_sample(sample_path)
    n = si.sample_ct
    ci = ChrInfo()
    chroms, poss, vids, refs, alts = [], [], [], [], []
    rows = []
    with open(path) as f:
        for ln in f:
            t = ln.split()
            if not t:
                continue
            if len(t) != 5 + 3 * n:
                raise ValueError(
                    f"--gen: expected {5 + 3 * n} tokens per line, got {len(t)}"
                )
            a1, a2 = t[3], t[4]
            if ref_mode == "ref-first":
                ref, alt, alt_first = a1, a2, False
            else:  # ref-last and ref-unknown both use the last allele as REF
                ref, alt, alt_first = a2, a1, True
            chroms.append(ci.code(t[0]))
            vids.append(t[1])
            poss.append(int(t[2]))
            refs.append(ref)
            alts.append(alt)
            p = np.array(t[5:], dtype=np.float64).reshape(n, 3)
            psum = p.sum(axis=1)
            # dosage of the FIRST allele listed
            d1 = 2.0 * p[:, 0] + p[:, 1]
            alt_d = d1 if alt_first else 2.0 * psum - d1
            with np.errstate(invalid="ignore", divide="ignore"):
                alt_d = np.where(psum > 0, alt_d / np.maximum(psum, 1e-30), np.nan)
            rnd = np.round(alt_d)
            ok = (
                (psum > 0.5)
                & np.isfinite(alt_d)
                & (np.abs(alt_d - rnd) <= hard_call_threshold)
            )
            codes = np.where(ok, rnd, 3.0).astype(np.uint8)
            rows.append(codes)
    vi = VariantInfo(
        chrom=np.array(chroms, dtype=np.int16),
        pos=np.array(poss, dtype=np.int32),
        vid=np.array(vids, dtype=object),
        ref=np.array(refs, dtype=object),
        alt=np.array(alts, dtype=object),
        chr_info=ci,
    )
    return vi, si, np.stack(rows) if rows else np.zeros((0, n), np.uint8)
