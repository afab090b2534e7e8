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

chrX/chrY/MT rules (ref :935-1049): on chrX male hets are set missing and
the father is ignored for male children (codes 7/4 rendered as 9/10); on
chrY females and hets are set missing and the ChrY table applies (codes
11/12); on chrM the father is always ignored and the ChrM table applies
(codes 9/10).
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..utils.chrom import MT_CODE, X_CODE, Y_CODE
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

# chrY (ref :608-620): only haploid dad->son transmission checked; mom is
# always missing (females zapped), so only idx 14 / 44 fire.
_ERR_TABLE_Y = np.zeros(48, dtype=np.uint32)
_ERR_TABLE_Y[14] = 0xB000101
_ERR_TABLE_Y[44] = 0xC000101

# chrM (ref :622-634): mother-child only; error iff both hom and opposite.
_ERR_TABLE_MT = np.zeros(48, dtype=np.uint32)
_ERR_TABLE_MT[[8, 9, 10, 11]] = 0x9010001
_ERR_TABLE_MT[[32, 33, 34, 35]] = 0xA010001

# stacked for per-variant table select: class 0 = autosomal/X, 1 = Y, 2 = MT
_TABLES = np.stack([_ERR_TABLE, _ERR_TABLE_Y, _ERR_TABLE_MT])


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
    male = ds.male_mask()
    female = ds.female_mask()
    child_male = male[child]
    total_errors = 0
    for v0, packed in ds.iter_packed_blocks():
        vct = packed.shape[0]
        codes = _unpack_np(packed)[:, :n]
        chrom = ds.vi.chrom[v0 : v0 + vct]
        isx = chrom == X_CODE
        isy = chrom == Y_CODE
        ismt = chrom == MT_CODE
        if isx.any() or isy.any():
            codes = codes.copy()
            if isx.any():
                xs = codes[isx]
                xs[(xs == 1) & male[None, :n]] = 3
                codes[isx] = xs
            if isy.any():
                ys = codes[isy]
                ys[:, female[:n]] = 3
                ys[ys == 1] = 3
                codes[isy] = ys
        cg = codes[:, child].astype(np.int32)
        dg = codes[:, dad].astype(np.int32)
        mg = codes[:, mom].astype(np.int32)
        sel = vmask[v0 : v0 + vct]
        # father ignored on chrM always, and on chrX for male children
        ign_dad = ismt[:, None] | (isx[:, None] & child_male[None, :])
        dad_known = (dg != 3) & ~ign_dad
        dg_eff = np.where(dad_known, dg, 3)
        valid_child = (cg != 3) & sel[:, None]
        active = valid_child & ~(~dad_known & (mg == 3))
        tclass = np.where(isy, 1, np.where(ismt, 2, 0))
        idx = np.where(active, dg_eff + 4 * mg + 16 * cg, 0)
        res = np.where(active, _TABLES[tclass[:, None], idx], 0)
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
            ign = bool(ign_dad[vv[k], t])
            if ign:  # ref :988-994 — rendered-code rename for ignored father
                code = {7: 9, 4: 10}.get(code, code)
            dgk, mgk, cgk = (
                int(dg_eff[vv[k], t]),
                int(mg[vv[k], t]),
                int(cg[vv[k], t]),
            )
            err_s = _render(
                code, dgk, mgk, cgk, bool(isx[vv[k]]), bool(isy[vv[k]]),
                bool(ismt[vv[k]]),
            )
            error_rows.append(
                f"{si.fid[child[t]]}\t{si.iid[child[t]]}\t"
                f"{ci.name(int(ds.vi.chrom[v]))}\t{ds.vi.vid[v]}\t{code}\t"
                f"{err_s}\n"
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


def _hap_str(g: int) -> str:
    return {0: "0", 1: "0/1", 2: "1", 3: "*"}[g]


def _render(code, dg, mg, cg, is_x, is_y, is_mt) -> str:
    """ERROR column rendering (ref :1736-1777 via the edescrip codes set at
    :1001-1046): '*' = missing allele; haploid genotypes drop the '/x' half;
    chrY rows omit the mother entirely."""
    if is_y:  # codes 11/12
        return f"{_hap_str(dg)}->{_hap_str(cg)}"
    if code in (9, 10):  # chrX male child, or any chrM
        mom_s = _hap_str(mg) if (is_mt and mg != 1) else _geno_str(mg)
        return f"*x{mom_s}->{_hap_str(cg)}"
    if code in (4, 7):
        dad_s = "*/*"
    elif is_x:  # dad rendered haploid on chrX (ref :1007-1010)
        dad_s = _hap_str(dg)
    else:
        dad_s = _geno_str(dg)
    mom_s = "*/*" if code in (3, 6) else _geno_str(mg)
    return f"{dad_s}x{mom_s}->{_geno_str(cg)}"
