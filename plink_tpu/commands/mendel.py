"""--mendel: Mendelian inheritance error scan over trios.

Behavior reference: MendelErrorScan / GetTriosAndFamilies
(2.0/plink2_family.cc:594-1117, header :121-123):
- trios = samples whose PAT and MAT both resolve to same-FID samples;
- per (trio, variant): error code + per-member attribution from the
  48-entry genotype-combination table (kBiallelicMendelErrorTableAutosomalOrX
  :594); missing child genotype skips the trio; a single missing parent is
  treated as genotype 3 with the corresponding 'parent unknown' codes.
- outputs: .mendel (per-error rows, variant-major), .imendel (per-sample
  attribution counts), .fmendel (per parent-pair), .lmendel (per-variant).

chrX/chrY/MT special casing not yet implemented (autosomal rules applied
everywhere; matches the reference for autosomal data).
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..utils.logging import RunLogger

# index = dad_geno + mom_geno*4 + child_geno*16 (genotypes in pgen codes,
# child 0..2); value = code<<24 | mom<<16 | dad<<8 | child attribution
# (ref table :594-606)
_ERR_TABLE = np.zeros(48, dtype=np.uint32)
_ERR_TABLE[[2, 6, 14]] = 0x6000101
_ERR_TABLE[[8, 9, 11]] = 0x7010001
_ERR_TABLE[10] = 0x8000001
_ERR_TABLE[16] = 0x2010101
_ERR_TABLE[26] = 0x1010101
_ERR_TABLE[32] = 0x5000001
_ERR_TABLE[[33, 34, 35]] = 0x4010001
_ERR_TABLE[[36, 40, 44]] = 0x3000101


def _build_trios(ds: Dataset):
    si = ds.si
    if si.pat is None or si.mat is None:
        return []
    key = {(str(si.fid[i]), str(si.iid[i])): i for i in range(si.sample_ct)}
    trios = []
    for i in range(si.sample_ct):
        if not ds.sample_mask[i]:
            continue
        pat, mat = str(si.pat[i]), str(si.mat[i])
        if pat == "0" or mat == "0":
            continue
        fid = str(si.fid[i])
        di = key.get((fid, pat))
        mi = key.get((fid, mat))
        if di is None or mi is None:
            continue
        if not (ds.sample_mask[di] and ds.sample_mask[mi]):
            continue
        trios.append((i, di, mi))
    return trios


def run_mendel(ds: Dataset, cfg, log: RunLogger) -> None:
    trios = _build_trios(ds)
    si = ds.si
    if not trios:
        log.log("--mendel: no complete trios found; skipping.")
        return
    child = np.array([t[0] for t in trios])
    dad = np.array([t[1] for t in trios])
    mom = np.array([t[2] for t in trios])
    T = len(trios)
    n = ds.raw_sample_ct

    imendel = np.zeros(n, dtype=np.int64)
    lmendel = np.zeros(ds.raw_variant_ct, dtype=np.int64)
    fmendel = np.zeros(T, dtype=np.int64)
    error_rows: list[str] = []

    from ..ops.pairwise import _unpack_np

    vmask = ds.variant_mask
    ci = ds.vi.chr_info
    total_errors = 0
    for v0, packed in ds.iter_packed_blocks():
        vct = packed.shape[0]
        codes = _unpack_np(packed)[:, :n]
        cg = codes[:, child].astype(np.int32)
        dg = codes[:, dad].astype(np.int32)
        mg = codes[:, mom].astype(np.int32)
        sel = vmask[v0 : v0 + vct]
        valid_child = (cg != 3) & sel[:, None]
        both_parents_missing = (dg == 3) & (mg == 3)
        active = valid_child & ~both_parents_missing
        idx = np.where(active, dg + 4 * mg + 16 * cg, 0)
        res = np.where(active, _ERR_TABLE[idx], 0)
        errs = res != 0
        if not errs.any():
            continue
        vv, tt = np.nonzero(errs)
        total_errors += len(vv)
        r = res[vv, tt]
        np.add.at(imendel, child[tt], (r & 0xFF).astype(np.int64))
        np.add.at(imendel, dad[tt], ((r >> 8) & 0xFF).astype(np.int64))
        np.add.at(imendel, mom[tt], ((r >> 16) & 0xFF).astype(np.int64))
        np.add.at(lmendel, v0 + vv, 1)
        np.add.at(fmendel, tt, 1)
        # per-error rows (variant-major, trio order)
        order = np.lexsort((tt, vv))
        for k in order:
            v, t = v0 + int(vv[k]), int(tt[k])
            code = int(r[k] >> 24)
            dgk, mgk, cgk = int(dg[vv[k], t]), int(mg[vv[k], t]), int(cg[vv[k], t])
            if code in (3, 6):
                mom_s = "x*/*"
            else:
                mom_s = "x" + _geno_str(mgk)
            if code in (4, 7):
                dad_s = "*/*"
            else:
                dad_s = _geno_str(dgk)
            error_rows.append(
                f"{si.fid[child[t]]}\t{si.iid[child[t]]}\t"
                f"{ci.name(int(ds.vi.chrom[v]))}\t{ds.vi.vid[v]}\t{code}\t"
                f"{dad_s}{mom_s}->{_geno_str(cgk)}\n"
            )

    with open(cfg.out + ".mendel", "w") as f:
        f.write("#FID\tKID\tCHROM\tID\tCODE\tERROR\n")
        f.writelines(error_rows)
    with open(cfg.out + ".imendel", "w") as f:
        f.write("#FID\tIID\tN\n")
        # family-grouped order: each parent pair followed by its children
        # (matches the reference's writer)
        emitted = set()
        fam_members: dict[tuple, list[int]] = {}
        fam_order: list[tuple] = []
        for t in range(T):
            k = (str(si.fid[child[t]]), int(dad[t]), int(mom[t]))
            if k not in fam_members:
                fam_members[k] = [int(dad[t]), int(mom[t])]
                fam_order.append(k)
            fam_members[k].append(int(child[t]))
        for k in fam_order:
            for i in fam_members[k]:
                if i in emitted:
                    continue
                emitted.add(i)
                f.write(f"{si.fid[i]}\t{si.iid[i]}\t{imendel[i]}\n")
    with open(cfg.out + ".fmendel", "w") as f:
        f.write("#FID\tPAT\tMAT\tCHLD\tN\n")
        fam: dict[tuple, list] = {}
        for t in range(T):
            k = (str(si.fid[child[t]]), str(si.iid[dad[t]]), str(si.iid[mom[t]]))
            fam.setdefault(k, [0, 0])
            fam[k][0] += 1
            fam[k][1] += int(fmendel[t])
        for (fid, pat, mat), (chld, nerr) in fam.items():
            f.write(f"{fid}\t{pat}\t{mat}\t{chld}\t{nerr}\n")
    with open(cfg.out + ".lmendel", "w") as f:
        f.write("#CHROM\tID\tN\n")
        for v in np.flatnonzero(vmask):
            f.write(
                f"{ci.name(int(ds.vi.chrom[v]))}\t{ds.vi.vid[v]}\t{lmendel[v]}\n"
            )
    log.log(f"--me/--mendel: {total_errors} Mendel errors detected.")
    log.log(
        f"--mendel: Reports written to {cfg.out}.mendel + {cfg.out}.imendel + "
        f"{cfg.out}.fmendel + {cfg.out}.lmendel ."
    )


def _geno_str(g: int) -> str:
    return {0: "0/0", 1: "0/1", 2: "1/1", 3: "*/*"}[g]
