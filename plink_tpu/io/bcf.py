"""BCF 2.2 import and export.

Behavior reference: BcfGenoToPgenThread (2.0/plink2_import.cc:7217) and
the BCF branch of Exportf (2.0/plink2_export.cc).  Records are parsed or
written in the BCF2 typed-value encoding inside BGZF blocks; export
mirrors plink2's header (VCFv4.3 + IDX annotations), missing QUAL bits
0x7F800001, and (allele+1)<<1 GT bytes.  Compression byte layout differs
from the reference's libdeflate output, so parity is validated by
cross-import rather than byte-diff.
"""

from __future__ import annotations

import re
import struct
import zlib

import numpy as np

from ..utils.chrom import ChrInfo
from .psam import SampleInfo, _build_pheno
from .pvar import VariantInfo

_BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def _bgzf_write(f, payload: bytes) -> None:
    for off in range(0, len(payload), 0xFF00):
        chunk = payload[off : off + 0xFF00]
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        cdata = co.compress(chunk) + co.flush()
        bsize = len(cdata) + 25  # total block size - 1
        f.write(b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff\x06\x00BC\x02\x00")
        f.write(struct.pack("<H", bsize))
        f.write(cdata)
        f.write(struct.pack("<II", zlib.crc32(chunk), len(chunk)))
    f.write(_BGZF_EOF)


def _typed_str(s: bytes) -> bytes:
    n = len(s)
    if n >= 15:
        return bytes([0xF7]) + _typed_int(n) + s
    return bytes([(n << 4) | 7]) + s


def _typed_int(v: int) -> bytes:
    if -120 <= v <= 127:
        return bytes([0x11, v & 0xFF])
    if -32000 <= v <= 32767:
        return b"\x12" + struct.pack("<h", v)
    return b"\x13" + struct.pack("<i", v)


def read_bcf(path: str, hard_call_threshold: float = 0.1,
             with_phase: bool = False):
    """Returns (vi, si, codes [V, N] uint8[, phase_rows, ma_rows]).

    GT values are (allele_idx + 1) << 1 | phased; 0 = missing allele and
    int8 -127 (0x81) = END_OF_VECTOR padding for lower-ploidy samples
    (BCF2.2 spec; BcfGenoToPgenThread 2.0/plink2_import.cc:7217).  With
    with_phase, per-variant (phasepresent, phaseinfo-swapped) arrays and
    multiallelic patch tuples (pgen aux-track-1 convention) are returned
    alongside the hardcalls."""
    from .compress import BgzfReader, _is_bgzf

    if _is_bgzf(path):
        with BgzfReader(path) as rd:
            data = rd.readall()
    else:
        import gzip

        data = gzip.open(path, "rb").read()
    if data[:5] != b"BCF\x02\x02":
        raise ValueError(f"--bcf: {path} is not a BCF2.2 file.")
    l_text = struct.unpack("<I", data[5:9])[0]
    text = data[9 : 9 + l_text].split(b"\x00", 1)[0].decode()
    contigs = []
    fmt_gt_idx = None
    idx_ctr = {"contig": 0, "fmt": 0}
    samples = []
    header_lines = []
    for ln in text.splitlines():
        if ln.startswith("##contig=<"):
            # carry contig lines to the .pvar header with the BCF IDX
            # annotation stripped, like the reference's converter
            header_lines.append(re.sub(r",IDX=\d+", "", ln))
            body = ln[10:].rstrip(">")
            fields = dict(
                kv.split("=", 1) for kv in body.split(",") if "=" in kv
            )
            contigs.append(fields["ID"])
        elif ln.startswith("##FORMAT=<"):
            body = ln[10:].rstrip(">")
            fields = dict(
                kv.split("=", 1) for kv in body.split(",") if "=" in kv
            )
            if fields.get("ID") == "GT" and "IDX" in fields:
                fmt_gt_idx = int(fields["IDX"])
        elif ln.startswith("#CHROM"):
            samples = ln.split("\t")[9:]
    N = len(samples)
    ci = ChrInfo()
    p = 9 + l_text
    chroms, poss, vids, refs, alts = [], [], [], [], []
    rows = []
    phase_rows = []
    ma_rows = {}

    def read_typed(buf, q):
        t = buf[q]
        q += 1
        ntype = t & 0xF
        n = t >> 4
        if n == 15:
            n, q = read_typed_int(buf, q)
        if ntype == 7:
            return buf[q : q + n].decode(), q + n
        size = {0: 0, 1: 1, 2: 2, 3: 4, 5: 4}[ntype]
        vals = []
        for _ in range(n):
            if ntype == 1:
                vals.append(struct.unpack("<b", buf[q : q + 1])[0])
            elif ntype == 2:
                vals.append(struct.unpack("<h", buf[q : q + 2])[0])
            elif ntype == 3:
                vals.append(struct.unpack("<i", buf[q : q + 4])[0])
            elif ntype == 5:
                vals.append(struct.unpack("<f", buf[q : q + 4])[0])
            q += size
        return vals, q

    def read_typed_int(buf, q):
        t = buf[q]
        q += 1
        ntype = t & 0xF
        if ntype == 1:
            return struct.unpack("<b", buf[q : q + 1])[0], q + 1
        if ntype == 2:
            return struct.unpack("<h", buf[q : q + 2])[0], q + 2
        return struct.unpack("<i", buf[q : q + 4])[0], q + 4

    while p < len(data):
        if p + 8 > len(data):
            break
        l_shared, l_indiv = struct.unpack("<II", data[p : p + 8])
        if l_shared == 0 and l_indiv == 0:
            break
        shared = data[p + 8 : p + 8 + l_shared]
        indiv = data[p + 8 + l_shared : p + 8 + l_shared + l_indiv]
        p += 8 + l_shared + l_indiv
        rid, pos0, _rlen = struct.unpack("<iii", shared[0:12])
        n_ai, n_fs = struct.unpack("<II", shared[16:24])
        n_allele = n_ai >> 16
        n_info = n_ai & 0xFFFF
        n_fmt = n_fs >> 24
        q = 24
        vid, q = read_typed(shared, q)
        alleles = []
        for _ in range(n_allele):
            a, q = read_typed(shared, q)
            alleles.append(a)
        chroms.append(ci.code(contigs[rid]))
        poss.append(pos0 + 1)
        vids.append(vid if vid else ".")
        refs.append(alleles[0] if alleles else "N")
        alts.append(",".join(alleles[1:]) if len(alleles) > 1 else ".")

        # individual data: find GT
        codes = np.full(N, 3, np.uint8)
        patches = None
        pp = pi = None
        q = 0
        for _ in range(n_fmt):
            key, q = read_typed_int(indiv, q)
            t = indiv[q]
            q += 1
            ntype = t & 0xF
            per = t >> 4
            if per == 15:
                per, q = read_typed_int(indiv, q)
            size = {1: 1, 2: 2, 3: 4, 5: 4, 7: 1}[ntype]
            block = indiv[q : q + per * size * N]
            q += per * size * N
            if fmt_gt_idx is not None and key == fmt_gt_idx and ntype == 1:
                g = np.frombuffer(block, np.int8).reshape(N, per)
                eov = g == -127  # END_OF_VECTOR: lower-ploidy padding
                a = (g.astype(np.int32) >> 1) - 1  # allele idx, -1 missing
                phased_bit = (g & 1).astype(bool)
                if per == 1:
                    a0 = a[:, 0]
                    a1 = a0.copy()
                    ph = np.zeros(N, bool)
                else:
                    a0 = a[:, 0]
                    hap = eov[:, 1]
                    a1 = np.where(hap, a0, a[:, 1])
                    ph = phased_bit[:, 1] & ~hap
                miss = (a0 < 0) | (a1 < 0)
                lo = np.minimum(a0, a1)
                hi = np.maximum(a0, a1)
                base = np.where(hi == 0, 0,
                                np.where(lo == 0, 1, 2)).astype(np.uint8)
                codes = np.where(miss, 3, base).astype(np.uint8)
                if n_allele > 2:
                    sel01 = (~miss) & (codes == 1) & (hi >= 2)
                    sel10 = (~miss) & (codes == 2) & ((lo != 1) | (hi != 1))
                    i01 = np.flatnonzero(sel01)
                    i10 = np.flatnonzero(sel10)
                    if i01.size or i10.size:
                        patches = (
                            i01.astype(np.int64),
                            hi[i01].astype(np.int64),
                            i10.astype(np.int64),
                            lo[i10].astype(np.int64),
                            hi[i10].astype(np.int64),
                        )
                if with_phase:
                    het = (~miss) & (a0 != a1)
                    pp = ph & het
                    pi = pp & (a0 > a1)
        if patches is not None:
            ma_rows[len(rows)] = patches
        rows.append(codes)
        if with_phase:
            phase_rows.append((pp, pi) if pp is not None else None)

    si = SampleInfo(
        fid=np.array(["0"] * N, dtype=object),
        iid=np.array(samples, dtype=object),
        sid=None, pat=None, mat=None,
        sex=np.zeros(N, np.int8), phenos={}, has_fid=False,
    )
    vi = VariantInfo(
        chrom=np.array(chroms, dtype=np.int16),
        pos=np.array(poss, dtype=np.int32),
        vid=np.array(vids, dtype=object),
        ref=np.array(refs, dtype=object),
        alt=np.array(alts, dtype=object),
        chr_info=ci,
        header_lines=header_lines,
    )
    codes_all = np.stack(rows) if rows else np.zeros((0, N), np.uint8)
    if with_phase:
        return vi, si, codes_all, phase_rows, ma_rows
    return vi, si, codes_all


def write_bcf(ds, path: str) -> None:
    import datetime

    from ..ops.pairwise import _unpack_np

    inc_s = np.flatnonzero(ds.sample_mask)
    inc_v = np.flatnonzero(ds.variant_mask)
    vi = ds.vi
    si = ds.si
    alt1 = vi.alt1()
    contig_names = []
    contig_idx = {}
    for v in inc_v:
        nm = vi.chr_info.name(vi.chrom[v])
        if nm not in contig_idx:
            contig_idx[nm] = len(contig_names)
            contig_names.append(nm)
    today = datetime.date.today().strftime("%Y%m%d")
    hdr = ["##fileformat=VCFv4.3", f"##fileDate={today}",
           "##source=PLINKv2.0",
           '##FILTER=<ID=PASS,Description="All filters passed",IDX=0>']
    for k, nm in enumerate(contig_names):
        hdr.append(f"##contig=<ID={nm},IDX={k}>")
    hdr.append('##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype"'
               ",IDX=1>")
    hdr.append("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
               + "\t".join(str(si.iid[i]) for i in inc_s))
    text = ("\n".join(hdr) + "\n").encode() + b"\x00"
    out = bytearray()
    out += b"BCF\x02\x02"
    out += struct.pack("<I", len(text))
    out += text
    N = len(inc_s)
    gt_lut = np.array([[2, 2], [2, 4], [4, 4], [0, 0]], np.uint8)
    for v in inc_v:
        codes = _unpack_np(ds.reader.read_packed(int(v), 1))[0][
            : ds.raw_sample_ct
        ][inc_s]
        vid = str(vi.vid[v]).encode()
        alleles = [str(vi.ref[v]).encode()] + [
            a.encode() for a in str(vi.alt[v]).split(",") if a != "."
        ]
        shared = bytearray()
        shared += struct.pack("<iii", contig_idx[vi.chr_info.name(vi.chrom[v])],
                              int(vi.pos[v]) - 1, len(alleles[0]))
        shared += bytes.fromhex("0100807f")  # missing QUAL
        shared += struct.pack("<II", (len(alleles) << 16) | 0,
                              (1 << 24) | N)
        shared += _typed_str(vid)
        for a in alleles:
            shared += _typed_str(a)
        shared += b"\x00"  # missing FILTER
        indiv = bytearray()
        indiv += b"\x11\x01"  # FORMAT key = IDX 1 (GT)
        indiv += b"\x21"  # vector of 2 int8 per sample
        indiv += gt_lut[codes].tobytes()
        out += struct.pack("<II", len(shared), len(indiv))
        out += shared
        out += indiv
    with open(path, "wb") as f:
        _bgzf_write(f, bytes(out))
