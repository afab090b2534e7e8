""".ped/.map (PLINK 1 text) importer.

Behavior per the reference's legacy importer (2.0/plink2_import_legacy.cc
PedmapToPgen) / PLINK 1.9 convention: each variant's A2 (=REF here) is the
more frequent allele, A1 (=ALT) the less frequent; '0' is the missing
allele code.
"""

from __future__ import annotations

import numpy as np

from .psam import SampleInfo, _build_pheno, _open_text
from .pvar import VariantInfo
from ..utils.chrom import ChrInfo


def read_map(path: str, chr_info: ChrInfo | None = None) -> VariantInfo:
    ci = chr_info or ChrInfo()
    chrom, vid, cm, pos = [], [], [], []
    with _open_text(path) as f:
        for ln in f:
            t = ln.split()
            if not t:
                continue
            chrom.append(ci.code(t[0]))
            vid.append(t[1])
            if len(t) >= 4:
                cm.append(float(t[2]))
                pos.append(int(t[3]))
            else:
                cm.append(0.0)
                pos.append(int(t[2]))
    n = len(vid)
    return VariantInfo(
        chrom=np.array(chrom, dtype=np.int16),
        pos=np.array(pos, dtype=np.int32),
        vid=np.array(vid, dtype=object),
        ref=np.array(["N"] * n, dtype=object),
        alt=np.array(["N"] * n, dtype=object),
        cm=np.array(cm),
        chr_info=ci,
    )


def read_ped(
    ped_path: str, vi: VariantInfo, missing_pheno: float = -9
) -> tuple[SampleInfo, np.ndarray]:
    """Parse .ped; returns (SampleInfo, genotype codes uint8 [V, N]).

    Mutates vi.ref/vi.alt with the inferred major/minor alleles.
    """
    M = vi.variant_ct
    fids, iids, pats, mats, sexes, phenos = [], [], [], [], [], []
    allele_rows: list[np.ndarray] = []
    with _open_text(ped_path) as f:
        for ln in f:
            t = ln.split()
            if not t:
                continue
            if len(t) != 6 + 2 * M:
                raise ValueError(
                    f".ped line has {len(t)} fields; expected {6 + 2 * M} for {M} variants"
                )
            fids.append(t[0])
            iids.append(t[1])
            pats.append(t[2])
            mats.append(t[3])
            sexes.append(t[4])
            phenos.append(t[5])
            allele_rows.append(np.array(t[6:], dtype=object))
    N = len(iids)
    sex = np.zeros(N, dtype=np.int8)
    for i, v in enumerate(sexes):
        if v in ("1", "M", "m"):
            sex[i] = 1
        elif v in ("2", "F", "f"):
            sex[i] = 2
    si = SampleInfo(
        fid=np.array(fids, dtype=object),
        iid=np.array(iids, dtype=object),
        sid=None,
        pat=np.array(pats, dtype=object),
        mat=np.array(mats, dtype=object),
        sex=sex,
        phenos={"PHENO1": _build_pheno("PHENO1", phenos, missing_pheno)},
    )
    alleles = np.stack(allele_rows)  # [N, 2M] object
    a1 = alleles[:, 0::2]
    a2 = alleles[:, 1::2]
    codes = np.empty((M, N), dtype=np.uint8)
    for v in range(M):
        x, y = a1[:, v], a2[:, v]
        missing = (x == "0") | (y == "0")
        # Tally allele counts among non-missing calls.
        counts: dict[str, int] = {}
        for arr in (x[~missing], y[~missing]):
            for al in arr:
                counts[al] = counts.get(al, 0) + 1
        if len(counts) > 2:
            raise ValueError(f"variant {vi.vid[v]} has >2 alleles in .ped")
        if not counts:
            ref_al, alt_al = "N", "N"
        elif len(counts) == 1:
            ref_al, alt_al = next(iter(counts)), "."
        else:
            (al_a, ct_a), (al_b, ct_b) = counts.items()
            # Major allele -> REF (A2); tie broken by first appearance.
            if ct_b > ct_a:
                ref_al, alt_al = al_b, al_a
            else:
                ref_al, alt_al = al_a, al_b
        vi.ref[v] = ref_al
        vi.alt[v] = alt_al
        alt_ct = (x == alt_al).astype(np.uint8) + (y == alt_al).astype(np.uint8)
        codes[v] = np.where(missing, 3, alt_ct).astype(np.uint8)
    return si, codes


def read_tfam(path: str, missing_pheno: float = -9) -> SampleInfo:
    """Parse .tfam (plink1 .fam layout: FID IID PAT MAT SEX PHENO)."""
    fids, iids, pats, mats, sexes, phenos = [], [], [], [], [], []
    with _open_text(path) as f:
        for ln in f:
            t = ln.split()
            if not t:
                continue
            fids.append(t[0])
            iids.append(t[1])
            pats.append(t[2])
            mats.append(t[3])
            sexes.append(t[4])
            phenos.append(t[5] if len(t) > 5 else "-9")
    N = len(iids)
    sex = np.zeros(N, dtype=np.int8)
    for i, v in enumerate(sexes):
        if v in ("1", "M", "m"):
            sex[i] = 1
        elif v in ("2", "F", "f"):
            sex[i] = 2
    return SampleInfo(
        fid=np.array(fids, dtype=object),
        iid=np.array(iids, dtype=object),
        sid=None,
        pat=np.array(pats, dtype=object),
        mat=np.array(mats, dtype=object),
        sex=sex,
        phenos={"PHENO1": _build_pheno("PHENO1", phenos, missing_pheno)},
    )


def read_tped(path: str, sample_ct: int, chr_info: ChrInfo | None = None):
    """Parse .tped (TpedToPgen, 2.0/plink2_import_legacy.cc): variant-major
    "CHR ID CM POS a1 a2 a1 a2 ..." rows; major allele -> REF like .ped."""
    ci = chr_info or ChrInfo()
    chroms, poss, vids, cms = [], [], [], []
    refs, alts = [], []
    rows = []
    with _open_text(path) as f:
        for ln in f:
            t = ln.split()
            if not t:
                continue
            if len(t) != 4 + 2 * sample_ct:
                raise ValueError(
                    f".tped line has {len(t)} fields; expected "
                    f"{4 + 2 * sample_ct} for {sample_ct} samples"
                )
            chroms.append(ci.code(t[0]))
            vids.append(t[1])
            cms.append(float(t[2]))
            poss.append(int(t[3]))
            x = np.array(t[4::2], dtype=object)
            y = np.array(t[5::2], dtype=object)
            missing = (x == "0") | (y == "0")
            counts: dict[str, int] = {}
            for arr in (x[~missing], y[~missing]):
                for al in arr:
                    counts[al] = counts.get(al, 0) + 1
            if len(counts) > 2:
                raise ValueError(f"variant {t[1]} has >2 alleles in .tped")
            if not counts:
                ref_al, alt_al = "N", "N"
            elif len(counts) == 1:
                ref_al, alt_al = next(iter(counts)), "."
            else:
                (al_a, ct_a), (al_b, ct_b) = counts.items()
                if ct_b > ct_a:
                    ref_al, alt_al = al_b, al_a
                else:
                    ref_al, alt_al = al_a, al_b
            refs.append(ref_al)
            alts.append(alt_al)
            alt_ct = (x == alt_al).astype(np.uint8) + (y == alt_al).astype(np.uint8)
            rows.append(np.where(missing, 3, alt_ct).astype(np.uint8))
    M = len(vids)
    vi = VariantInfo(
        chrom=np.array(chroms, dtype=np.int16),
        pos=np.array(poss, dtype=np.int32),
        vid=np.array(vids, dtype=object),
        ref=np.array(refs, dtype=object),
        alt=np.array(alts, dtype=object),
        cm=np.array(cms) if any(c != 0 for c in cms) else None,
        chr_info=ci,
    )
    return vi, np.stack(rows) if rows else np.zeros((0, sample_ct), np.uint8)
