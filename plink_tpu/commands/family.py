"""--tdt: transmission disequilibrium test, PLINK 1.9 parity.

Behavior reference: tdt / tdt_poo / get_trios_and_families /
erase_mendel_errors (1.9/plink_family.c:100-560, 1739-2560) and flag
parsing (1.9/plink.c:12016-12100).

TPU-first re-design note: the reference walks trios per variant with
2-bit extracts and lookup tables.  We vectorize the same lookup tables
over a [variants, trios] numpy grid in one shot per block (the per-trio
tables are 64-entry integer LUTs, so the whole scan is a couple of
fancy-indexing gathers + scatter-adds); the TPU is reserved for the
heavy pairwise/regression commands, since this scan is O(M*T) tiny
integers and runs at memory bandwidth on host.

Semantics replicated exactly:
- trios = non-founder samples whose PAT and MAT both resolve within the
  same FID; the *male* parent is the father regardless of column order;
  parents with unspecified sex are an error (ref :215-270).
- per variant: A1=minor orientation (marker_reverse), male X het
  zeroing (hh_reset), Mendel-error erasure over ALL trios using the
  1.9 64-entry table (ref :52-96, :462-560), then transmission counts
  over nuclear families with >=1 case child plus parenTDT counts over
  discordant parent pairs (ref :2028-2075 tdt_table/parentdt_table).
- chisq = (obs - 2*trans)^2 / obs, 1 df; 'exact'/'exact-midp' use the
  binomial(p=0.5) exact test; 'poo' runs the parent-of-origin scan
  into .tdt.poo (ref :1739-1993).
"""

from __future__ import annotations

import math

import numpy as np

from ..cli import FlagError
from ..dataset import Dataset
from ..stats.binom19 import binom_2sided
from ..stats.distributions import chisq_logsf
from ..utils.chrom import MT_CODE, X_CODE, Y_CODE
from ..utils.logging import RunLogger
from .homozyg import _fw_width
from .assoc19 import _fw, _g4
from .cluster import _ltqnorm

# 1.9 mendel_error_table (plink_family.c:52): index = child_bed |
# dad_bed<<2 | mom_bed<<4; entry = code<<24 | mom<<16 | dad<<8 | child
# erasure flags.
_ME_TABLE = np.zeros(64, np.uint32)
_ME_TABLE[2] = 0x1010101
_ME_TABLE[3] = 0x8000001
_ME_TABLE[[7, 11, 15]] = 0x7010001
_ME_TABLE[[12, 28, 44]] = 0x3000101
_ME_TABLE[[19, 35, 51]] = 0x6000101
_ME_TABLE[[48, 52, 56]] = 0x4010001
_ME_TABLE[60] = 0x5000001
_ME_TABLE[62] = 0x2010101

# chrX male child (plink_family.c:72): index = child_bed | mom_bed<<2.
_ME_TABLE_MX = np.zeros(16, np.uint32)
_ME_TABLE_MX[3] = 0x9010001
_ME_TABLE_MX[12] = 0xA010001

# tdt_table (plink_family.c:2028): index = 4*(dad_bed ^ mom_bed) +
# child_bed; low16 = observation increment, high16 = A1 transmissions.
_TDT_TABLE = np.array(
    [0x20002, 0, 0x10002, 2,
     0x10001, 0, 0x10001, 1,
     0x10001, 0, 1, 1], np.uint32)

# parentdt_table (plink_family.c:2040): index = case_bed | ctrl_bed<<2;
# bit0 single-obs, bit8 double-obs, bit16/24 case-A2-excess variants.
_PARENTDT = np.array(
    [0, 0, 1, 0x100,
     0, 0, 0, 0,
     0x10001, 0, 0, 1,
     0x1000100, 0, 0x10001, 0], np.uint32)

# poo_table (plink_family.c:1763): index = 4*(dad_bed | mom_bed<<2) +
# child_bed; bytes: pat obs / mat obs / pat A1 trans / mat A1 trans
# (each doubled).
_POO_TABLE = np.array(
    [0, 0, 0, 0,
     0, 0, 0, 0,
     0x20002, 0, 2, 0,
     0, 0, 0, 0,
     0, 0, 0, 0,
     0, 0, 0, 0,
     0, 0, 0, 0,
     0, 0, 0, 0,
     0x2000200, 0, 0x200, 0x200,
     0, 0, 0, 0,
     0x2020202, 0, 0x1010202, 0x202,
     0x2000200, 0, 0x2000200, 0x200,
     0, 0, 0, 0,
     0, 0, 0, 0,
     0, 0, 0x20002, 2], np.uint32)

# either-parent-missing mask (0x22f2) and 1+het-no-missing mask (0x4d04)
_PMISS = np.array([(0x22F2 >> k) & 1 for k in range(16)], bool)
_HETOK = np.array([(0x4D04 >> k) & 1 for k in range(16)], bool)

# our A1-count codes -> 1.9 bed codes: A1count 0 -> homA2(3), 1 -> het
# (2), 2 -> homA1(0), missing 3 -> 1
_BED_OF = np.array([3, 2, 0, 1], np.int8)


class TdtParams:
    def __init__(self, mods):
        self.exact = False
        self.midp = False
        self.poo = False
        for m in mods:
            if m == "exact":
                self.exact = True
            elif m == "exact-midp":
                self.exact = True
                self.midp = True
            elif m == "poo":
                self.poo = True
            elif m in ("perm", "perm-count") or m.startswith("mperm="):
                raise FlagError(
                    "--tdt permutation tests are currently under "
                    "development.")
            elif m in ("parentdt1", "parentdt2", "pat", "mat",
                       "set-test"):
                raise FlagError(
                    f"--tdt '{m}' requires permutation, which is "
                    "currently under development.")
            else:
                raise FlagError(f"Invalid --tdt modifier '{m}'.")
        if self.poo and self.exact:
            raise FlagError(
                "--tdt parent-of-origin analysis does not currently "
                "support exact tests.")


def build_trios_19(ds: Dataset):
    """get_trios_and_families (1.9/plink_family.c:96): non-founder
    children with both parents resolving in-FID; father = male parent;
    unspecified/duplicated parent sex is an error.  Returns
    (trios [T,3] child/dad/mom, families list in first-encounter order:
    (dad, mom, [children]))."""
    si = ds.si
    if si.pat is None or si.mat is None:
        return np.zeros((0, 3), np.int64), []
    key = {}
    for i in range(si.sample_ct):
        if ds.sample_mask[i]:
            key[(str(si.fid[i]), str(si.iid[i]))] = i
    sex = si.sex
    trios = []
    fam_idx: dict[tuple, int] = {}
    fams: list[list] = []
    for i in range(si.sample_ct):
        if not ds.sample_mask[i] or ds.founder_mask[i]:
            continue
        fid = str(si.fid[i])
        p1 = key.get((fid, str(si.pat[i])))
        p2 = key.get((fid, str(si.mat[i])))
        if p1 is None or p2 is None:
            continue
        if p1 == i or p2 == i:
            raise FlagError(f"'{fid} {si.iid[i]}' is their own parent.")
        for p in (p1, p2):
            if sex[p] == 0:
                raise FlagError(
                    f"Parent '{fid} {si.iid[p]}' has unspecified sex.")
        if sex[p1] == sex[p2]:
            raise FlagError(
                f"'{fid} {si.iid[i]}' has two "
                + ("daddies." if sex[p1] == 1 else "mommies."))
        dad, mom = (p1, p2) if sex[p1] == 1 else (p2, p1)
        k = (dad, mom)
        if k not in fam_idx:
            fam_idx[k] = len(fams)
            fams.append([dad, mom, []])
        fams[fam_idx[k]][2].append(i)
        trios.append((i, dad, mom))
    # trio_list is sorted by (family_idx, child uidx); children were
    # appended in uidx order already, so just sort each family's list.
    for f in fams:
        f[2].sort()
    trios.sort(key=lambda t: (fam_idx[(t[1], t[2])], t[0]))
    return np.array(trios, np.int64).reshape(-1, 3), fams


def _bed_codes(ds: Dataset, vidx, a1_is_alt):
    """Per-variant bed-code matrix [M, S] in 1.9 convention (A1=minor
    after marker_reverse)."""
    from ..ops.pairwise import _unpack_np

    codes = _unpack_np(ds.all_packed())[vidx][:, : ds.raw_sample_ct]
    g = np.where(a1_is_alt[:, None], codes,
                 np.where(codes == 3, 3, 2 - codes.astype(np.int8)))
    return _BED_OF[g.astype(np.int64)]


def _erase_mendel(bed, trios, male, is_x):
    """erase_mendel_errors (1.9/plink_family.c:462), vectorized: reads
    pre-erasure genotypes for every trio, then sets flagged members to
    missing (bed code 1)."""
    if trios.shape[0] == 0:
        return bed
    child, dad, mom = trios[:, 0], trios[:, 1], trios[:, 2]
    cg = bed[:, child].astype(np.int64)
    dg = bed[:, dad].astype(np.int64)
    mg = bed[:, mom].astype(np.int64)
    e_auto = _ME_TABLE[cg | (dg << 2) | (mg << 4)]
    if is_x is not None and is_x.any():
        mx = male[child]
        e_x = _ME_TABLE_MX[cg | (mg << 2)]
        e = np.where(is_x[:, None] & mx[None, :], e_x, e_auto)
    else:
        e = e_auto
    hit = e != 0
    if not hit.any():
        return bed
    bed = bed.copy()
    vv, tt = np.nonzero(hit)
    ev = e[vv, tt]
    bed[vv, child[tt]] = 1
    dsel = (ev & 0x100) != 0
    bed[vv[dsel], dad[tt[dsel]]] = 1
    msel = (ev & 0x10000) != 0
    bed[vv[msel], mom[tt[msel]]] = 1
    return bed


def run_tdt(ds: Dataset, cfg, log: RunLogger) -> None:
    hp = TdtParams(cfg.tdt or ())
    si, vi = ds.si, ds.vi
    pc = next(iter(si.phenos.values()), None)
    if pc is None or pc.kind != "cc":
        raise FlagError("--tdt requires a case/control phenotype.")
    pheno_nm = pc.nonmiss & ds.sample_mask
    pheno_c = pheno_nm & (pc.data == 1)

    trios, fams = build_trios_19(ds)
    if trios.shape[0] == 0:
        log.log("Warning: Skipping --tdt since there are no trios.")
        return
    male = ds.male_mask()

    # nuclear-family lookup: families with >=1 case child, plus (unless
    # poo) discordant parent pairs; case parent first for discordant.
    fam_p1, fam_p2, fam_disc, fam_children = [], [], [], []
    discord_exists = False
    for dad, mom, kids in fams:
        disc = (not hp.poo) and bool(
            pheno_nm[dad] and pheno_nm[mom]
            and (bool(pheno_c[dad]) ^ bool(pheno_c[mom])))
        case_kids = [k for k in kids if pheno_c[k]]
        if not disc and not case_kids:
            continue
        if disc:
            discord_exists = True
            p1, p2 = (dad, mom) if pheno_c[dad] else (mom, dad)
        else:
            p1, p2 = dad, mom
        fam_p1.append(p1)
        fam_p2.append(p2)
        fam_disc.append(disc)
        fam_children.append(case_kids)
    if not fam_p1:
        log.log(
            "Warning: Skipping --tdt" + (" poo" if hp.poo else "")
            + " since there are no trios with an affected child"
            + ("." if hp.poo
               else ", and no discordant parent pairs."))
        return
    fam_p1 = np.array(fam_p1)
    fam_p2 = np.array(fam_p2)
    fam_disc = np.array(fam_disc, bool)
    child_fam = np.concatenate(
        [np.full(len(k), f) for f, k in enumerate(fam_children)])
    child_ids = np.concatenate(
        [np.array(k, np.int64) for k in fam_children]
    ) if any(fam_children) else np.zeros(0, np.int64)
    # NOTE: for non-poo, fam_p1/p2 are (case, ctrl) for discordant pairs
    # but (dad, mom) otherwise; the regular TDT tables only use the XOR,
    # which is order-invariant, so one orientation array serves both.
    # poo needs true (dad, mom); poo excludes discordant handling.

    # variant set: autosomal + chrX, in file order
    ci = vi.chr_info
    haploid_not_x = np.isin(vi.chrom, (Y_CODE, MT_CODE))
    vmask = ds.variant_mask & ~haploid_not_x
    vidx = np.flatnonzero(vmask)
    if vidx.size == 0:
        log.log(
            "Warning: Skipping --tdt since there is no autosomal or "
            "Xchr data.")
        return

    from .basic_reports import alt_allele_freqs

    a1_is_alt = ~(alt_allele_freqs(ds, founders_only=True) > 0.5)[vidx]
    bed = _bed_codes(ds, vidx, a1_is_alt)
    is_x = vi.chrom[vidx] == X_CODE
    # NOTE: tdt() requests hh_reset for chrX, but builds its male mask by
    # passing sample_exclude with is_include=1 to
    # alloc_raw_haploid_filters (1.9/plink_family.c:2206; every other
    # caller passes 0 or an include array), so the mask only covers
    # *excluded* males and the reset never touches trio members.  We
    # replicate the observable behavior: no het-male-X zeroing in --tdt.
    bed = _erase_mendel(bed, trios, male, is_x)

    # family-parent genotype grids [M, F]
    fg = bed[:, fam_p1].astype(np.int64)
    mg = bed[:, fam_p2].astype(np.int64)
    ukk = fg | (mg << 2)
    hetok = _HETOK[ukk]
    # child grid [M, C]
    if child_ids.size:
        cg = bed[:, child_ids].astype(np.int64)
        # gather happens before the hetok mask, so clamp indices from
        # combos the reference never looks up (xor==3 -> past the table)
        cidx = _TDT_TABLE[np.minimum(
            4 * (fg[:, child_fam] ^ mg[:, child_fam]) + cg, 11)
        ] * hetok[:, child_fam]
        tdt_obs = (cidx & 0xFFFF).sum(axis=1).astype(np.int64)
        tdt_trans = (cidx >> 16).sum(axis=1).astype(np.int64)
    else:
        tdt_obs = np.zeros(vidx.size, np.int64)
        tdt_trans = np.zeros(vidx.size, np.int64)

    if discord_exists:
        du = ukk[:, fam_disc]
        ok = ~_PMISS[du]
        pent = _PARENTDT[du] * ok
        obs1 = (pent & 0xFF).sum(axis=1).astype(np.int64)
        obs2 = ((pent >> 8) & 0xFF).sum(axis=1).astype(np.int64)
        ex1 = ((pent >> 16) & 0xFF).sum(axis=1).astype(np.int64)
        ex2 = (pent >> 24).sum(axis=1).astype(np.int64)

    maxsnp = _fw_width(
        len(str(vi.vid[i])) for i in np.flatnonzero(ds.variant_mask))
    alt1 = vi.alt1()
    ci_size = cfg.ci if cfg.ci is not None else 0.0
    display_ci = ci_size > 0
    ci_zt = _ltqnorm(1 - (1 - ci_size) / 2) if display_ci else 0.0

    if hp.poo:
        _run_tdt_poo(ds, cfg, log, vidx, a1_is_alt, bed, fam_p1, fam_p2,
                     fam_children, child_fam, child_ids, hetok, ukk,
                     maxsnp, alt1)
        return

    out = cfg.out + ".tdt"
    fh = open(out, "w")
    hdr = " CHR " + "SNP".rjust(maxsnp) + "           BP  A1  A2" \
        "      T      U           OR "
    if display_ci:
        pct = int(ci_size * (100 + 2 ** -44))
        if pct >= 10:
            hdr += f"         L{pct}          U{pct} "
        else:
            hdr += f"          L{pct}           U{pct} "
    if not hp.exact:
        hdr += "       CHISQ "
    hdr += "           P "
    if discord_exists:
        hdr += ("     A:U_PAR    CHISQ_PAR        P_PAR    CHISQ_COM"
                "        P_COM ")
    fh.write(hdr + "\n")

    vref = vi.ref
    for k in range(vidx.size):
        v = vidx[k]
        obs = int(tdt_obs[k])
        trans = int(tdt_trans[k])
        if hp.exact:
            pval = binom_2sided(trans, obs, hp.midp)
            chisq = None
        elif not obs:
            pval = -9.0
            chisq = None
        else:
            dxx = float(obs - 2 * trans)
            chisq = dxx * dxx / obs
            pval = math.exp(chisq_logsf(chisq, 1))
        flip = not a1_is_alt[k]
        a1 = str(vref[v]) if flip else str(alt1[v])
        a2 = str(alt1[v]) if flip else str(vref[v])
        line = (_fw(ci.name19(int(vi.chrom[v])), 4) + " "
                + _fw(str(vi.vid[v]), maxsnp) + "   "
                + str(int(vi.pos[v])).rjust(10) + " "
                + _fw(a1, 3) + " " + _fw(a2, 3) + " "
                + str(trans).rjust(6) + " ")
        unt = obs - trans
        line += str(unt).rjust(6) + " "
        if unt:
            u_recip = 1.0 / unt
            orat = trans * u_recip
            line += _g4(orat, 12) + " "
            if display_ci:
                lo = math.log(orat) if trans else -math.inf
                d = ci_zt * math.sqrt(
                    (1.0 / trans if trans else math.inf) + u_recip)
                line += _g4(math.exp(lo - d), 12) + " " \
                    + _g4(math.exp(lo + d), 12) + " "
        else:
            line += "          NA "
            if display_ci:
                line += "          NA           NA "
        if hp.exact:
            line += _g4(max(pval, 0.0), 12) + " "
        elif pval >= 0:
            line += _g4(chisq, 12) + " " + _g4(max(pval, 0.0), 12) + " "
        else:
            line += "          NA           NA "
        if discord_exists:
            uii = int(ex1[k] + 2 * ex2[k])
            ujj = int(obs1[k] + 2 * obs2[k])
            line += f"{uii}:{ujj - uii}".rjust(12) + " "
            if not ujj:
                line += "          NA           NA"
            else:
                dxx = float(ujj - 2 * uii)
                chi = dxx * dxx / (ujj + 2 * int(obs2[k]))
                p = math.exp(chisq_logsf(chi, 1))
                line += _g4(chi, 12) + " " + _g4(max(p, 0.0), 12)
            line += " "
            uii += trans
            ujj += obs
            if not ujj:
                line += "          NA           NA"
            else:
                dxx = float(ujj - 2 * uii)
                chi = dxx * dxx / (ujj + 2 * int(obs2[k]))
                p = math.exp(chisq_logsf(chi, 1))
                line += _g4(chi, 12) + " " + _g4(max(p, 0.0), 12)
        line += " \n"
        fh.write(line)
    fh.close()
    log.log(f"--tdt: Report written to {out} .")


def _normdist(zz: float) -> float:
    """1.9 normdist (plink_common.c:10412): Abramowitz-Stegun 26.2.17."""
    sqrt2pi = 2.50662827463
    t0 = 1 / (1 + 0.2316419 * abs(zz))
    z1 = math.exp(-0.5 * zz * zz) / sqrt2pi
    p0 = z1 * t0 * (0.31938153 + t0 * (-0.356563782 + t0 * (
        1.781477937 + t0 * (-1.821255978 + 1.330274429 * t0))))
    return 1 - p0 if zz >= 0 else p0


def _run_tdt_poo(ds, cfg, log, vidx, a1_is_alt, bed, fam_dad, fam_mom,
                 fam_children, child_fam, child_ids, hetok, ukk, maxsnp,
                 alt1):
    """tdt_poo (1.9/plink_family.c:1739): parent-of-origin scan."""
    vi = ds.vi
    ci = vi.chr_info
    M = vidx.size
    if child_ids.size:
        cg = bed[:, child_ids].astype(np.int64)
        pent = _POO_TABLE[np.minimum(4 * ukk[:, child_fam] + cg, 59)] \
            * hetok[:, child_fam]
        obs_pat2 = (pent & 0xFF).sum(axis=1).astype(np.int64)
        obs_mat2 = ((pent >> 8) & 0xFF).sum(axis=1).astype(np.int64)
        tr_pat2 = ((pent >> 16) & 0xFF).sum(axis=1).astype(np.int64)
        tr_mat2 = (pent >> 24).sum(axis=1).astype(np.int64)
    else:
        obs_pat2 = obs_mat2 = tr_pat2 = tr_mat2 = np.zeros(M, np.int64)
    out = cfg.out + ".tdt.poo"
    fh = open(out, "w")
    fh.write(
        " CHR " + "SNP".rjust(maxsnp) + "  A1:A2      T:U_PAT"
        "    CHISQ_PAT        P_PAT      T:U_MAT    CHISQ_MAT"
        "        P_MAT        Z_POO        P_POO \n")
    vref = vi.ref
    for k in range(M):
        v = vidx[k]
        flip = not a1_is_alt[k]
        a1 = str(vref[v]) if flip else str(alt1[v])
        a2 = str(alt1[v]) if flip else str(vref[v])
        line = (_fw(ci.name19(int(vi.chrom[v])), 4) + " "
                + _fw(str(vi.vid[v]), maxsnp) + " "
                + _fw(f"{a1}:{a2}", 6) + " ")
        pat_t = 0.5 * float(tr_pat2[k])
        pat_u = 0.5 * float(obs_pat2[k] - tr_pat2[k])
        line += _fw(_g4(pat_t, 1) + ":" + _g4(pat_u, 1), 12) + " "
        if obs_pat2[k]:
            dxx = pat_t - pat_u
            chi = dxx * dxx / (pat_t + pat_u)
            line += _g4(chi, 12) + " " \
                + _g4(math.exp(chisq_logsf(chi, 1)), 12)
        else:
            line += "          NA           NA"
        line += " "
        mat_t = 0.5 * float(tr_mat2[k])
        mat_u = 0.5 * float(obs_mat2[k] - tr_mat2[k])
        line += _fw(_g4(mat_t, 1) + ":" + _g4(mat_u, 1), 12) + " "
        if obs_mat2[k]:
            dxx = mat_t - mat_u
            chi = dxx * dxx / (mat_t + mat_u)
            line += _g4(chi, 12) + " " \
                + _g4(math.exp(chisq_logsf(chi, 1)), 12)
        else:
            line += "          NA           NA"
        line += " "
        if (tr_pat2[k] and tr_mat2[k] and obs_pat2[k] > tr_pat2[k]
                and obs_mat2[k] > tr_mat2[k]):
            # the reference multiplies by stored reciprocals, not
            # divisions — replicate the float op order exactly
            pat_u_recip = 1.0 / pat_u
            mat_t_recip = 1.0 / mat_t
            z = (math.log(pat_t * pat_u_recip * mat_t_recip * mat_u)
                 / math.sqrt(1.0 / pat_t + pat_u_recip + mat_t_recip
                             + 1.0 / mat_u))
            line += _g4(z, 12) + " "
            p = _normdist(-abs(z)) * 2
            line += _g4(max(p, 0.0), 12)
        else:
            line += "          NA           NA"
        line += " \n"
        fh.write(line)
    fh.close()
    log.log(f"--tdt poo: Report written to {out} .")
