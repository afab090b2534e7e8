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


def _unpack_bits(buf: bytes, nvals: int, B: int) -> np.ndarray:
    """Unpack nvals consecutive B-bit little-endian values from a
    bit-packed stream (BGEN layout-2 probability encoding)."""
    if B == 8:
        return np.frombuffer(buf, np.uint8, count=nvals).astype(np.int64)
    if B == 16:
        return np.frombuffer(buf, "<u2", count=nvals).astype(np.int64)
    if B == 32:
        return np.frombuffer(buf, "<u4", count=nvals).astype(np.int64)
    bits = np.unpackbits(np.frombuffer(buf, np.uint8), bitorder="little")
    bits = bits[: nvals * B].reshape(nvals, B).astype(np.int64)
    return bits @ (1 << np.arange(B, dtype=np.int64))


def read_bgen(path: str, sample_path: str | None, ref_mode: str,
              hard_call_thresh: int | None = None,
              dosage_erase_thresh: int = 0,
              import_dosage_certainty: float = 0.0):
    """Returns (vi, si, codes [V, N] uint8, aux_rows, skipped_ma_ct).

    aux_rows is a per-variant list of None (pure hardcalls) or VCF-importer-
    style 6-tuples (dosage_ids, dosage_vals, dphase_ids, dphase_deltas,
    phasepresent, phaseinfo) on the 16384-per-copy scale.

    Semantics mirror Bgen13DosageOrPhaseScanThread / Bgen13GenoToPgenThread
    (2.0/plink2_import.cc:11578,12074): B-bit numerators convert to
    16384-scale dosages by exact integer rounding
    (numer*16384 + 2^(B-1)) // (2^B - 1) (the kBgenMagicNums table,
    :11426-11472); hardcall/erase thresholds then apply exactly as on the
    VCF dosage path.  Multiallelic variants are SKIPPED with a warning,
    matching the reference (:14135); bits > 28 and ploidy > 2 raise,
    matching kMaxBgenImportBits (:11433) and :13626.
    """
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

    if hard_call_thresh is None:
        hard_call_thresh = 16384 // 10
    hc_halfdist = 8192 - hard_call_thresh
    erase_halfdist = 8192 - dosage_erase_thresh
    dphase_erase_halfdist = erase_halfdist + 8192

    ci = ChrInfo()
    chroms, poss, vids, refs, alts = [], [], [], [], []
    row_list: list = []
    aux_rows: list = []
    skipped_ma = 0
    p = off + 4
    for _v in range(M):
        if layout == 1:
            _nrow = struct.unpack("<I", data[p:p + 4])[0]
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
        # genotype block (grab now so a skip can advance past it)
        if layout == 1:
            C = struct.unpack("<I", data[p:p + 4])[0] if comp else 6 * N
            if comp:
                p += 4
                raw = zlib.decompress(data[p:p + C])
            else:
                raw = data[p:p + C]
            p += C
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
        if K != 2:
            # ref: "multiallelic variant%s skipped (not yet supported)"
            # (2.0/plink2_import.cc:14135)
            skipped_ma += 1
            continue
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

        # All conversion happens in FIRST-allele dosage space (the
        # reference assumes ref-last, then flips for ref-first at the end;
        # tie-rounding directions depend on this).
        geno = np.full(N, 3, np.uint8)
        phased_var = False
        delta = None
        if layout == 1:
            pr = np.frombuffer(raw, "<u2").reshape(N, 3).astype(np.float64)
            pr /= 32768.0
            psum = pr.sum(axis=1)
            d1 = 2.0 * pr[:, 0] + pr[:, 1]
            with np.errstate(invalid="ignore", divide="ignore"):
                d = np.where(psum > 0.5, d1 / np.maximum(psum, 1e-30),
                             np.nan)
            first_dose = np.where(np.isfinite(d), d, 0.0)
            dosage_int = np.round(first_dose * 16384).astype(np.int64)
            present = psum > 0.5
        else:
            n2, _k2 = struct.unpack("<IH", raw[0:6])
            pmax = raw[7]
            ploidy = np.frombuffer(raw[8:8 + n2], np.uint8)
            phased_var = bool(raw[8 + n2])
            B = raw[9 + n2]
            if B > 28:
                # kMaxBgenImportBits (2.0/plink2_import.cc:11433)
                raise ValueError(
                    "--bgen: probability precision > 28 bits is not "
                    "supported.")
            if pmax > 2:
                raise ValueError("--bgen: ploidy > 2 is not supported.")
            mask = (1 << B) - 1
            half = 1 << (B - 1)
            cmin = (1 + int(import_dosage_certainty * mask)
                    if import_dosage_certainty != 0.0 else 0)
            missing = (ploidy & 0x80) != 0
            pl = (ploidy & 0x3F).astype(np.int64)
            body = raw[10 + n2:]
            magic = lambda numer: (numer * 16384 + half) // mask
            dosage_int = np.zeros(n2, np.int64)
            delta = np.zeros(n2, np.int64)
            eq = np.ones(n2, bool)
            # biallelic: stored values per sample = ploidy (both the
            # unphased genotype-prob and the per-haplotype encodings);
            # missing samples still occupy space, values zeroed
            if (pl == 2).all():
                vals = _unpack_bits(body, 2 * n2, B).reshape(n2, 2)
                va, vb_ = vals[:, 0], vals[:, 1]
                hap = np.zeros(n2, bool)
            else:
                offs = np.concatenate([[0], np.cumsum(pl)])
                flat = _unpack_bits(body, int(offs[-1]), B)
                dip = pl == 2
                hap = pl == 1
                va = np.zeros(n2, np.int64)
                vb_ = np.zeros(n2, np.int64)
                i2 = offs[:-1][dip]
                va[dip] = flat[i2]
                vb_[dip] = flat[i2 + 1]
                va[hap] = flat[offs[:-1][hap]]
                missing = missing | (pl == 0)
            dipm = ~hap
            if phased_var:
                # Bgen13ConvertBiallelicPhased (:12014): dosage from the
                # rounded numerator SUM; dphase delta from
                # magic(a1 + mask - a2) - 16384 when numerators differ
                dosage_int[dipm] = magic(va[dipm] + vb_[dipm])
                eq = va == vb_
                ne = dipm & ~eq
                delta[ne] = magic(va[ne] + mask - vb_[ne]) - 16384
                if cmin:
                    dist1 = np.abs(va + vb_ - mask)
                    fm = dipm & (dist1 < cmin) & (mask - dist1 < cmin)
                    missing = missing | fm
            else:
                dosage_int[dipm] = magic(2 * va[dipm] + vb_[dipm])
                if cmin:
                    fm = dipm & (va < cmin) & (vb_ < cmin) \
                        & (mask - cmin < va + vb_)
                    missing = missing | fm
            if hap.any():
                dosage_int[hap] = magic(2 * va[hap])
                if cmin:
                    fm = hap & (va < cmin) & (mask - cmin < va)
                    missing = missing | fm
            present = ~missing

        dosage_int = np.asarray(dosage_int, np.int64)
        halfdist = np.abs((dosage_int & 16383) - 8192)
        pp_d = np.zeros(N, bool)
        pi_d = np.zeros(N, bool)
        if phased_var:
            # exact Bgen13ConvertBiallelicPhased branch structure
            side1 = dosage_int + delta
            side2 = dosage_int - delta
            hdp1 = np.abs(side1 - 16384)
            hdp2 = np.abs(side2 - 16384)
            absd = np.abs(delta)
            neq = present & ~eq
            # numerators equal: plain dosage, no phase
            caseA = present & eq
            g_code = np.where(halfdist < hc_halfdist, 3,
                              (dosage_int + 8192) >> 14)
            storeA = caseA & (halfdist < erase_halfdist)
            # both haplotype dosages near-integer: hardcall + het phase,
            # dosage erased
            caseB = neq & (hdp1 >= dphase_erase_halfdist) \
                & (hdp2 >= dphase_erase_halfdist)
            geno1 = (side1 + 16384) // 32768
            gB = geno1 + (side2 + 16384) // 32768
            caseC = neq & ~caseB
            hetC = caseC & (g_code == 1)
            ppC = hetC & (absd > 8192)
            implicit = ppC & ((absd == dosage_int)
                              | (absd + dosage_int == 32768))
            # unphased-het special case: delta rounded to 0, dosage erased
            dropC = hetC & (absd <= 8192) & (delta == 0) \
                & (halfdist >= erase_halfdist)
            storeC = caseC & ~dropC
            delta_out = np.where(implicit, 0, delta)
            keep_dp = storeC & (delta_out != 0)

            geno[caseA | caseC] = g_code[caseA | caseC].astype(np.uint8)
            geno[caseB] = gB[caseB].astype(np.uint8)
            pp_d = ppC | (caseB & (gB == 1))
            pi_d = (ppC & (delta > 0)) | (caseB & (gB == 1) & (geno1 == 1))
            store = storeA | storeC
            dids = np.flatnonzero(store).astype(np.uint32)
            dvals_i = dosage_int[store]
            dpids = np.flatnonzero(keep_dp).astype(np.uint32)
            dpdeltas_i = delta_out[keep_dp]
        else:
            g_code = np.where(halfdist < hc_halfdist, 3,
                              (dosage_int + 8192) >> 14)
            geno[present] = g_code[present].astype(np.uint8)
            store = present & (halfdist < erase_halfdist)
            dids = np.flatnonzero(store).astype(np.uint32)
            dvals_i = dosage_int[store]
            dpids = np.zeros(0, np.uint32)
            dpdeltas_i = np.zeros(0, np.int64)

        if not alt_first:
            # ref-first: flip from first-allele to ALT dosage space.  The
            # reference inverts genovec/dosage/dphase but NOT phaseinfo
            # (Bgen13GenoToPgenThread, 2.0/plink2_import.cc:12544-12554)
            flip = geno < 3
            geno[flip] = 2 - geno[flip]
            dvals_i = 32768 - dvals_i
            dpdeltas_i = -dpdeltas_i
        dvals = dvals_i.astype("<u2")
        dpdeltas = dpdeltas_i.astype("<i2")
        row_list.append(geno)
        aux_rows.append(
            (dids, dvals, dpids, dpdeltas, pp_d, pi_d)
            if (dids.size or pp_d.any()) else None
        )

    rows = (np.stack(row_list) if row_list
            else np.zeros((0, N), np.uint8))
    vi = VariantInfo(
        chrom=np.array(chroms, dtype=np.int16),
        pos=np.array(poss, dtype=np.int32),
        vid=np.array(vids, dtype=object),
        ref=np.array(refs, dtype=object),
        alt=np.array(alts, dtype=object),
        chr_info=ci,
    )
    return vi, si, rows, aux_rows, skipped_ma


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


def write_bgen11(ds, path: str) -> None:
    """Export as layout-1 BGEN 1.1 (ExportBgen11, 2.0/plink2_export.cc:1334):
    24-byte header (offset 20, flags 5 = zlib + layout 1, no sample block),
    per-variant [N u32][empty SNPID u16][rsid][chrom][pos u32][ALT][REF]
    then zlib-compressed uint16 triplets P(AA) P(AB) P(BB) scaled 32768
    with A = ALT (ref-last); missing = three zeros.  Dosages interpolate
    along AA->AB->BB exactly as the reference (:1276-1289)."""
    import zlib as _zlib

    from ..ops.pairwise import _unpack_np

    inc_s = np.flatnonzero(ds.sample_mask)
    inc_v = np.flatnonzero(ds.variant_mask)
    si = ds.si
    vi = ds.vi
    alt1 = vi.alt1()
    N = len(inc_s)
    M = len(inc_v)
    acs = None
    if getattr(ds.reader.header, "mode", 0x02) not in (0x01,):
        acs = vi.allele_ct() if hasattr(vi, "allele_ct") else None
    # hardcall triplet table, indexed by our code (0=homREF,1=het,2=homALT)
    trip = {
        0: struct.pack("<3H", 0, 0, 32768),
        1: struct.pack("<3H", 0, 32768, 0),
        2: struct.pack("<3H", 32768, 0, 0),
        3: struct.pack("<3H", 0, 0, 0),
    }
    has_dosage = ds.has_dosage
    with open(path, "wb") as f:
        f.write(struct.pack("<II", 20, 20))
        f.write(struct.pack("<II", M, N))
        f.write(b"bgen" + struct.pack("<I", 5))
        for v in inc_v:
            if acs is not None and int(acs[v]) != 2:
                raise ValueError(
                    f"{path} cannot contain multiallelic variants.")
            codes = _unpack_np(ds.reader.read_packed(int(v), 1))[0][
                : ds.raw_sample_ct
            ][inc_s]
            body = bytearray()
            dof = {}
            if has_dosage:
                aux = ds.reader.read_dosage(int(v))
                if aux.dosage_ids is not None:
                    pos_of = {int(s): k for k, s in enumerate(inc_s)}
                    for sid, val in zip(aux.dosage_ids, aux.dosage_vals):
                        k = pos_of.get(int(sid))
                        if k is not None:
                            dof[k] = int(val)
            for k, c in enumerate(codes):
                dv = dof.get(k)
                if dv is None:
                    body += trip[int(c)]
                else:
                    d2 = 2 * (32768 - dv)
                    if d2 <= 32768:
                        body += struct.pack("<3H", 32768 - d2, d2, 0)
                    else:
                        d2 -= 32768
                        body += struct.pack("<3H", 0, 32768 - d2, d2)
            blob = _zlib.compress(bytes(body), 6)
            vid = str(vi.vid[v]).encode()
            chrom = vi.chr_info.name(vi.chrom[v]).encode()
            aa = str(alt1[v]).encode()
            ra = str(vi.ref[v]).encode()
            f.write(struct.pack("<IH", N, 0))
            f.write(struct.pack("<H", len(vid)) + vid)
            f.write(struct.pack("<H", len(chrom)) + chrom)
            f.write(struct.pack("<I", int(vi.pos[v])))
            f.write(struct.pack("<I", len(aa)) + aa)
            f.write(struct.pack("<I", len(ra)) + ra)
            f.write(struct.pack("<I", len(blob)))
            f.write(blob)
