"""--export: dataset exporters.

Behavior reference: Exportf (2.0/plink2_export.cc:11731).  Currently
implements the VCF hard-call path (ExportVcf :4700-area): one GT-only
FORMAT column, codes mapped 0/0, 0/1, 1/1, ./. , header with
fileformat/fileDate/source/contig/FORMAT lines matching plink2's layout.
Sample columns are rendered with a numpy byte-LUT (vectorized over the
whole variant row) instead of a per-genotype inner loop.

Other reference formats (BCF, BGEN, Oxford, ped/tped, A/AD transpose, ...)
are not implemented yet.
"""

from __future__ import annotations

import time

import numpy as np

from ..dataset import Dataset
from ..ops.pairwise import _unpack_np
from ..utils.logging import RunLogger

_GT_LUT = np.frombuffer(b"\t0/0\t0/1\t1/1\t./.", dtype=np.uint8).reshape(4, 4)


def run_export(ds: Dataset, cfg, log: RunLogger) -> None:
    fmts = [f.lower() for f in cfg.export_fmts]
    for fmt in fmts:
        if fmt in ("vcf", "vcf-4.3"):
            _export_vcf(ds, cfg, log)
        else:
            raise NotImplementedError(f"--export {fmt} not supported yet")


def _export_vcf(ds: Dataset, cfg, log: RunLogger) -> None:
    vi = ds.vi
    si = ds.si
    inc_s = np.flatnonzero(ds.sample_mask)
    inc_v = np.flatnonzero(ds.variant_mask)
    path = cfg.out + ".vcf"
    ci = vi.chr_info
    chroms_present = []
    seen = set()
    for c in vi.chrom[inc_v]:
        if c not in seen:
            seen.add(c)
            chroms_present.append(c)
    use_fid = si.has_fid and any(str(si.fid[i]) != "0" for i in inc_s)
    with open(path, "wb") as f:
        hdr = "##fileformat=VCFv4.3\n"
        hdr += f"##fileDate={time.strftime('%Y%m%d')}\n"
        hdr += "##source=PLINKv2.0\n"
        for c in chroms_present:
            hdr += f"##contig=<ID={ci.name(int(c))}>\n"
        hdr += '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        cols = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
        ids = [
            (f"{si.fid[i]}_{si.iid[i]}" if use_fid else str(si.iid[i]))
            for i in inc_s
        ]
        hdr += cols + "".join("\t" + s for s in ids) + "\n"
        f.write(hdr.encode())
        qual = vi.qual
        filt = vi.filt
        info = vi.info
        for v0, packed in ds.iter_packed_blocks():
            vct = packed.shape[0]
            sel = [i for i in range(vct) if ds.variant_mask[v0 + i]]
            if not sel:
                continue
            codes = _unpack_np(packed[sel])[:, : ds.raw_sample_ct][:, inc_s]
            gt_bytes = _GT_LUT[codes].reshape(codes.shape[0], -1)
            for r, i_local in enumerate(sel):
                i = v0 + i_local
                q = "." if qual is None or qual[i] is None else str(qual[i])
                fl = "." if filt is None or filt[i] is None else str(filt[i])
                inf = "." if info is None or info[i] is None else str(info[i])
                meta = (
                    f"{ci.name(int(vi.chrom[i]))}\t{vi.pos[i]}\t{vi.vid[i]}\t"
                    f"{vi.ref[i]}\t{vi.alt[i]}\t{q}\t{fl}\t{inf}\tGT"
                )
                f.write(meta.encode())
                f.write(gt_bytes[r].tobytes())
                f.write(b"\n")
    log.log(
        f"--export vcf: {len(inc_v)} variants, {len(inc_s)} samples written to "
        f"{path} ."
    )
