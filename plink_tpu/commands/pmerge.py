"""--pmerge / --pmerge-list: concatenating fileset merge.

Behavior reference: Pmerge (2.0/plink2_merge.cc:7019).  The reference only
implements the concatenation job (disjoint, position-ordered variant
ranges; "Non-concatenating --pmerge[-list] is under development",
plink2_merge.cc:7003) and that is what is implemented here: filesets are
ordered by first variant (chrom, pos), sample sets are unioned by
(FID, IID) with missing genotypes filled for samples absent from a
fileset, and the merged trio is written to <out>.pgen/.pvar/.psam.
"""

from __future__ import annotations

import numpy as np

from ..utils.logging import RunLogger


def _load_part(prefix_or_files):
    from ..io.pgen_read import PgenReader
    from ..io.psam import read_psam
    from ..io.pvar import read_pvar

    if isinstance(prefix_or_files, tuple):
        pgen, pvar, psam = prefix_or_files
    else:
        pgen = prefix_or_files + ".pgen"
        pvar = prefix_or_files + ".pvar"
        psam = prefix_or_files + ".psam"
    si = read_psam(psam)
    vi = read_pvar(pvar)
    reader = PgenReader(pgen, sample_ct=si.sample_ct)
    return si, vi, reader


def run_pmerge(cfg, log: RunLogger) -> str:
    """Merge, write <out> trio, return the merged prefix."""
    from ..io.pgen_write import PgenWriter
    from ..io.psam import PhenoCol, SampleInfo, write_psam
    from ..io.pvar import VariantInfo, write_pvar
    from ..ops.pairwise import _unpack_np

    parts_spec = []
    if cfg.pfile:
        parts_spec.append(cfg.pfile)
    elif cfg.bfile:
        parts_spec.append(cfg.bfile)
    if cfg.pmerge:
        if len(cfg.pmerge) == 3:
            parts_spec.append(tuple(cfg.pmerge))
        else:
            parts_spec.append(cfg.pmerge[0])
    if cfg.pmerge_list:
        with open(cfg.pmerge_list[0]) as f:
            for ln in f:
                t = ln.split()
                if not t:
                    continue
                parts_spec.append(tuple(t) if len(t) == 3 else t[0])
    parts = [_load_part(p) for p in parts_spec]
    log.log(f"--pmerge: {len(parts)} .pvar files scanned.")

    # order by first variant (chrom, pos); verify disjoint sorted ranges
    def keyrange(vi):
        if vi.variant_ct == 0:
            return (0, 0), (0, 0)
        return (
            (int(vi.chrom[0]), int(vi.pos[0])),
            (int(vi.chrom[-1]), int(vi.pos[-1])),
        )

    order = sorted(range(len(parts)), key=lambda k: keyrange(parts[k][1])[0])
    for a, b in zip(order, order[1:]):
        if keyrange(parts[a][1])[1] > keyrange(parts[b][1])[0]:
            raise ValueError(
                "Non-concatenating --pmerge[-list] is under development."
            )
    log.log("Concatenation job detected.")

    # union samples by id key, first-seen order
    keys: dict[str, int] = {}
    fid, iid, sex = [], [], []
    pat, mat = [], []
    has_parents = any(p[0].pat is not None for p in parts)
    pheno_names: list[str] = []
    for si, _, _ in parts:
        for j in range(si.sample_ct):
            k = f"{si.fid[j]}\t{si.iid[j]}"
            if k not in keys:
                keys[k] = len(fid)
                fid.append(si.fid[j])
                iid.append(si.iid[j])
                sex.append(si.sex[j])
                pat.append(str(si.pat[j]) if si.pat is not None else "0")
                mat.append(str(si.mat[j]) if si.mat is not None else "0")
        for pn in si.phenos:
            if pn not in pheno_names:
                pheno_names.append(pn)
    n = len(fid)
    maps = []
    for si, _, _ in parts:
        maps.append(np.array(
            [keys[f"{si.fid[j]}\t{si.iid[j]}"] for j in range(si.sample_ct)],
            dtype=np.int64,
        ))

    phenos: dict[str, PhenoCol] = {}
    for pn in pheno_names:
        kind = None
        data = np.full(n, np.nan)
        cats = None
        for (si, _, _), mp in zip(parts, maps):
            pc = si.phenos.get(pn)
            if pc is None:
                continue
            if kind is None:
                kind = pc.kind
                if kind == "cat":
                    cats = list(pc.cats)
                    data = np.zeros(n, np.int32)
            for j in range(si.sample_ct):
                if not pc.nonmiss[j]:
                    continue
                tgt = mp[j]
                if kind == "cat":
                    name = pc.cats[int(pc.data[j])]
                    if name not in cats:
                        cats.append(name)
                    if data[tgt] == 0:
                        data[tgt] = cats.index(name)
                else:
                    if np.isnan(data[tgt]):
                        data[tgt] = pc.data[j]
        if kind == "cat":
            phenos[pn] = PhenoCol(pn, "cat", data, data != 0, cats)
        else:
            nonmiss = ~np.isnan(data)
            phenos[pn] = PhenoCol(pn, kind or "qt", data, nonmiss)
    si0 = parts[0][0]
    msi = SampleInfo(
        fid=np.array(fid, dtype=object), iid=np.array(iid, dtype=object),
        sid=None,
        pat=np.array(pat, dtype=object) if has_parents else None,
        mat=np.array(mat, dtype=object) if has_parents else None,
        sex=np.array(sex, dtype=np.int8), phenos=phenos,
        has_fid=si0.has_fid,
    )

    # merged variant metadata
    chrom, pos, vid, ref, alt = [], [], [], [], []
    total_v = sum(p[1].variant_ct for p in parts)
    out = cfg.out
    # REF stays trusted only if every source fileset's REF is trusted
    trusted = all(not p[2].header.all_provisional for p in parts)
    with PgenWriter(out + ".pgen", n, total_v, trusted_ref=trusted) as w:
        for k in order:
            si, vi, reader = parts[k]
            mp = maps[k]
            chrom.append(vi.chrom)
            pos.append(vi.pos)
            vid.append(vi.vid)
            ref.append(vi.ref)
            alt.append(vi.alt)
            for v in range(vi.variant_ct):
                codes = _unpack_np(reader.read_packed(v, 1))[0][: si.sample_ct]
                merged = np.full(n, 3, np.uint8)
                merged[mp] = codes
                w.append_codes(merged[None, :])
    mvi = VariantInfo(
        chrom=np.concatenate(chrom).astype(np.int16),
        pos=np.concatenate(pos).astype(np.int32),
        vid=np.concatenate(vid),
        ref=np.concatenate(ref),
        alt=np.concatenate(alt),
        chr_info=parts[0][1].chr_info,
    )
    write_pvar(out + ".pvar", mvi)
    write_psam(out + ".psam", msi)
    log.log(f"Results written to {out}.pgen + {out}.pvar .")
    return out
