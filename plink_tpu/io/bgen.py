"""BGEN 1.1/1.2/1.3 import and export.

Behavior reference: Bgen11/Bgen13 scan+convert threads
(2.0/plink2_import.cc:11051-12074) and ExportBgen11/ExportBgen13
(2.0/plink2_export.cc:1153, :1943).  Conventions verified against a
locally built plink2:
- export writes layout-2 blocks with an empty variant-id field and the
  dataset ID in the rsid field, alleles ordered (ALT, REF), 16-bit
  unphased diploid probabilities (hardcalls -> exact 0/65535), missing
  genotype = ploidy byte 0x82 with zero probabilities;
- bgen-1.2 compresses genotype blocks with zlib, bgen-1.3 with zstd;
- sample identifiers are embedded (flag bit 31) and a companion Oxford
  .sample file is written.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..utils.chrom import ChrInfo
from .psam import SampleInfo
from .pvar import VariantInfo


def _zstd():
    import zstandard

    return zstandard


def read_bgen(path: str, sample_path: str | None, ref_mode: str,
              hard_call_threshold: float = 0.1):
    """Returns (vi, si, codes [V, N] uint8)."""
    data = open(path, "rb").read()
    off = struct.unpack("<I", data[0:4])[0]
    lh, M, N = struct.unpack("<III", data[4:16])
    if data[16:20] != b"bgen":
        raise ValueError(f"--bgen: {path} is not a BGEN file.")
    flags = struct.unpack("<I", data[lh:4 + lh])[0]
    comp = flags & 3
    layout = (flags >> 2) & 0xF
    has_ids = flags >> 31
    ids = None
    if has_ids:
        p = 4 + lh
        _, nn = struct.unpack("<II", data[p:p + 8])
        p += 8
        ids = []
        for _ in range(nn):
            l = struct.unpack("<H", data[p:p + 2])[0]
            p += 2
            ids.append(data[p:p + l].decode())
            p += l
    if sample_path:
        from .oxford import read_sample

        si = read_sample(sample_path)
    elif ids is not None:
        from .psam import PhenoCol

        si = SampleInfo(
            fid=np.array(["0"] * N, dtype=object),
            iid=np.array(ids, dtype=object),
            sid=None, pat=None, mat=None,
            sex=np.zeros(N, np.int8), phenos={}, has_fid=False,
        )
    else:
        raise ValueError("--bgen: no embedded sample IDs; --sample required.")
    if si.sample_ct != N:
        raise ValueError("--bgen/--sample sample-count mismatch.")

    ci = ChrInfo()
    chroms, poss, vids, refs, alts = [], [], [], [], []
    rows = np.zeros((M, N), np.uint8)
    p = off + 4
    for v in range(M):
        if layout == 1:
            nrow = struct.unpack("<I", data[p:p + 4])[0]
            p += 4
        l1 = struct.unpack("<H", data[p:p + 2])[0]
        p += 2 + l1
        l2 = struct.unpack("<H", data[p:p + 2])[0]
        rsid = data[p + 2:p + 2 + l2].decode()
        p += 2 + l2
        l3 = struct.unpack("<H", data[p:p + 2])[0]
        chrom = data[p + 2:p + 2 + l3].decode()
        p += 2 + l3
        pos = struct.unpack("<I", data[p:p + 4])[0]
        p += 4
        if layout == 1:
            K = 2
        else:
            K = struct.unpack("<H", data[p:p + 2])[0]
            p += 2
        alleles = []
        for _ in range(K):
            la = struct.unpack("<I", data[p:p + 4])[0]
            alleles.append(data[p + 4:p + 4 + la].decode())
            p += 4 + la
        if K != 2:
            raise NotImplementedError("--bgen: multiallelic variants")
        a1, a2 = alleles
        if ref_mode == "ref-first":
            ref, alt, alt_first = a1, a2, False
        else:
            ref, alt, alt_first = a2, a1, True
        chroms.append(ci.code(chrom))
        poss.append(pos)
        vids.append(rsid)
        refs.append(ref)
        alts.append(alt)

        if layout == 1:
            C = struct.unpack("<I", data[p:p + 4])[0] if comp else 6 * N
            if comp:
                p += 4
                raw = zlib.decompress(data[p:p + C])
            else:
                raw = data[p:p + C]
            p += C
            pr = np.frombuffer(raw, "<u2").reshape(N, 3).astype(np.float64)
            pr /= 32768.0
            psum = pr.sum(axis=1)
            d1 = 2.0 * pr[:, 0] + pr[:, 1]
        else:
            C = struct.unpack("<I", data[p:p + 4])[0]
            p += 4
            if comp:
                D = struct.unpack("<I", data[p:p + 4])[0]
                blob = data[p + 4:p + C]
                raw = (zlib.decompress(blob) if comp == 1
                       else _zstd().ZstdDecompressor().decompress(
                           blob, max_output_size=D))
            else:
                raw = data[p:p + C]
            p += C
            n2, k2 = struct.unpack("<IH", raw[0:6])
            ploidy = np.frombuffer(raw[8:8 + n2], np.uint8)
            phased = raw[8 + n2]
            B = raw[9 + n2]
            if phased:
                raise NotImplementedError("--bgen: phased probability data")
            if B == 16:
                pr = np.frombuffer(raw[10 + n2:10 + n2 + 4 * n2], "<u2")
                pr = pr.reshape(n2, 2).astype(np.float64) / 65535.0
            elif B == 8:
                pr = np.frombuffer(raw[10 + n2:10 + n2 + 2 * n2], np.uint8)
                pr = pr.reshape(n2, 2).astype(np.float64) / 255.0
            else:
                raise NotImplementedError(f"--bgen: {B}-bit probabilities")
            miss = (ploidy & 0x80) != 0
            psum = np.where(miss, 0.0, 1.0)
            d1 = 2.0 * pr[:, 0] + pr[:, 1]
        d_first = d1
        with np.errstate(invalid="ignore", divide="ignore"):
            d = np.where(psum > 0.5, d_first / np.maximum(psum, 1e-30), np.nan)
        alt_d = d if alt_first else 2.0 - d
        rnd = np.round(alt_d)
        ok = (
            np.isfinite(alt_d)
            & (np.abs(alt_d - rnd) <= hard_call_threshold)
        )
        rows[v] = np.where(ok, rnd, 3.0).astype(np.uint8)

    vi = VariantInfo(
        chrom=np.array(chroms, dtype=np.int16),
        pos=np.array(poss, dtype=np.int32),
        vid=np.array(vids, dtype=object),
        ref=np.array(refs, dtype=object),
        alt=np.array(alts, dtype=object),
        chr_info=ci,
    )
    return vi, si, rows


def write_bgen(ds, path: str, version: str, bits: int = 16) -> None:
    """Export hardcalls as layout-2 BGEN (zlib for 1.2, zstd for 1.3)."""
    from ..ops.pairwise import _unpack_np

    comp_code = 1 if version == "1.2" else 2
    inc_s = np.flatnonzero(ds.sample_mask)
    inc_v = np.flatnonzero(ds.variant_mask)
    si = ds.si
    vi = ds.vi
    alt1 = vi.alt1()
    N = len(inc_s)
    M = len(inc_v)
    ids = [str(si.iid[i]).encode() for i in inc_s]
    sample_block = struct.pack("<I", N) + b"".join(
        struct.pack("<H", len(x)) + x for x in ids
    )
    lsi = 4 + len(sample_block)  # block length field + N field + id bytes
    header = struct.pack("<III", 20, M, N) + b"bgen" + struct.pack(
        "<I", (1 << 31) | (2 << 2) | comp_code
    )
    scale = (1 << bits) - 1
    maxval = scale.to_bytes(bits // 8, "little")
    zero = bytes(bits // 8)
    cctx = None
    if comp_code == 2:
        cctx = _zstd().ZstdCompressor()
    with open(path, "wb") as f:
        f.write(struct.pack("<I", 20 + lsi))
        f.write(header)
        f.write(struct.pack("<II", lsi, N))
        f.write(sample_block[4:])
        for v in inc_v:
            codes = _unpack_np(ds.reader.read_packed(int(v), 1))[0][
                : ds.raw_sample_ct
            ][inc_s]
            vid = str(vi.vid[v]).encode()
            chrom = vi.chr_info.name(vi.chrom[v]).encode()
            aa = str(alt1[v]).encode()
            ra = str(vi.ref[v]).encode()
            f.write(struct.pack("<H", 0))  # empty variant id
            f.write(struct.pack("<H", len(vid)) + vid)
            f.write(struct.pack("<H", len(chrom)) + chrom)
            f.write(struct.pack("<I", int(vi.pos[v])))
            f.write(struct.pack("<H", 2))
            f.write(struct.pack("<I", len(aa)) + aa)
            f.write(struct.pack("<I", len(ra)) + ra)
            ploidy = np.full(N, 2, np.uint8)
            ploidy[codes == 3] = 0x82
            body = bytearray()
            body += struct.pack("<IH", N, 2)
            body += bytes([2, 2])
            body += ploidy.tobytes()
            body += bytes([0, bits])
            # probs: P(hom-first=hom-ALT), P(het); hom-REF/missing -> zeros
            prob = bytearray()
            for c in codes:
                if c == 2:
                    prob += maxval + zero
                elif c == 1:
                    prob += zero + maxval
                else:
                    prob += zero + zero
            body += prob
            blob = (zlib.compress(bytes(body)) if comp_code == 1
                    else cctx.compress(bytes(body)))
            f.write(struct.pack("<II", len(blob) + 4, len(body)))
            f.write(blob)
