"""Eigensoft packedancestrymap io."""


def read_eig(prefix: str):
    """Eigensoft packedancestrymap import (EigGenoToPgenThread,
    2.0/plink2_import.cc:17220): .snp (ID CHR CM POS REF ALT), .ind
    (ID sex pheno), binary .geno with GENO/TGENO header and 2-bit
    REF-allele counts packed sample0-in-top-bits.  Returns
    (vi, si, codes [V, N] ALT-dosage uint8)."""
    import numpy as np

    from ..utils.chrom import ChrInfo
    from .psam import PhenoCol, SampleInfo, _build_pheno
    from .pvar import VariantInfo

    ci = ChrInfo()
    chroms, poss, vids, refs, alts, cms = [], [], [], [], [], []
    with open(prefix + ".snp") as f:
        for ln in f:
            t = ln.split()
            if not t:
                continue
            vids.append(t[0])
            chroms.append(ci.code(t[1]))
            cms.append(float(t[2]))
            poss.append(int(t[3]))
            refs.append(t[4])
            alts.append(t[5] if len(t) > 5 else ".")
    iids, sexes, phenos_raw = [], [], []
    with open(prefix + ".ind") as f:
        for ln in f:
            t = ln.split()
            if not t:
                continue
            iids.append(t[0])
            sexes.append(t[1] if len(t) > 1 else "U")
            phenos_raw.append(t[2] if len(t) > 2 else "???")
    N = len(iids)
    V = len(vids)
    sex = np.zeros(N, np.int8)
    for i, s in enumerate(sexes):
        sex[i] = 1 if s == "M" else (2 if s == "F" else 0)
    pstrs = []
    for p in phenos_raw:
        if p == "Case":
            pstrs.append("2")
        elif p == "Control":
            pstrs.append("1")
        elif p in ("???", "Ignore"):
            pstrs.append("NA")
        else:
            pstrs.append(p)
    si = SampleInfo(
        fid=np.array(["0"] * N, dtype=object),
        iid=np.array(iids, dtype=object),
        sid=None, pat=None, mat=None, sex=sex,
        phenos={"PHENO1": _build_pheno("PHENO1", pstrs)},
        has_fid=False,
    )
    vi = VariantInfo(
        chrom=np.array(chroms, dtype=np.int16),
        pos=np.array(poss, dtype=np.int32),
        vid=np.array(vids, dtype=object),
        ref=np.array(refs, dtype=object),
        alt=np.array(alts, dtype=object),
        cm=np.array(cms) if any(c != 0 for c in cms) else None,
        chr_info=ci,
    )
    data = open(prefix + ".geno", "rb").read()
    tag = data[:5]
    transposed = tag == b"TGENO"
    if transposed:
        rec = max(48, -(-V // 4) * 1)
    else:
        rec = max(48, -(-N // 4) * 1)
    hdr = data[:rec].rstrip(b"\0").decode().split()
    n_hdr, v_hdr = int(hdr[1]), int(hdr[2])
    if (n_hdr, v_hdr) != (N, V):
        raise ValueError(".geno header counts disagree with .ind/.snp files.")
    body = np.frombuffer(data[rec:], np.uint8)
    nrec = V if not transposed else N
    body = body[: nrec * rec].reshape(nrec, rec)
    C = N if not transposed else V
    cpad = -(-C // 4)
    b = body[:, :cpad]
    vals = np.empty((nrec, cpad * 4), np.uint8)
    vals[:, 0::4] = (b >> 6) & 3
    vals[:, 1::4] = (b >> 4) & 3
    vals[:, 2::4] = (b >> 2) & 3
    vals[:, 3::4] = b & 3
    refcount = vals[:, :C]
    codes = np.array([2, 1, 0, 3], np.uint8)[refcount]  # refcount -> altcount
    if transposed:
        codes = codes.T.copy()
    return vi, si, codes
