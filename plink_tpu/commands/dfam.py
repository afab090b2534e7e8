"""--dfam: family-based disequilibrium test (sib-TDT + unrelateds),
PLINK 1.9 parity.

Behavior reference: dfam / dfam_sibship_calc / get_sibship_info (dfam
branch) (1.9/plink_family.c:2547-2745,3749-3811,3811-4970).  Families
with informative parents use TDT counts; parent-uninformative mixed
families and mixed sibships use the sib-TDT variance formula; remaining
samples form unrelated clusters (one global cluster, or --within
clusters) scored CMH-style.  Missing phenotypes count as controls.
X/MT/haploid variants are excluded.  The reference errors out on
--dfam perm/mperm ("currently under development"); we do the same.
"""

from __future__ import annotations

import math

import numpy as np

from ..cli import FlagError
from ..dataset import Dataset
from ..stats.distributions import chisq_logsf
from ..utils.chrom import MT_CODE, X_CODE, Y_CODE
from ..utils.logging import RunLogger
from .homozyg import _fw_width
from .assoc19 import _fw, _g4
from .family import _bed_codes, _erase_mendel, build_trios_19

# parental A1 count from (paternal_geno * 4 + maternal_geno); both-hom
# cases and missing parents encode 0 (1.9/plink_family.c:2917)
_ALLELE_CT = np.array(
    [0, 0, 3, 0, 0, 0, 0, 0, 3, 0, 2, 1, 0, 0, 1, 0], np.uint8)


def _sibship_calc(cur_case_ct, case_hom, case_het, cur_ctrl_ct,
                  ctrl_hom, ctrl_het, acc):
    """dfam_sibship_calc (1.9/plink_family.c:3749).  acc =
    [total_count, numer, denom, total_expected]."""
    if not cur_ctrl_ct:
        return
    hom_a1 = case_hom + ctrl_hom
    het = case_het + ctrl_het
    total = cur_case_ct + cur_ctrl_ct
    case_a1 = 2 * case_hom + case_het
    acc[0] += case_a1
    if (hom_a1 == 0 and het == 0) or het == total or hom_a1 == total:
        acc[3] += float(case_a1)
        return
    total_recip = 1.0 / total
    case_prop = cur_case_ct * total_recip
    exp_hom = case_prop * hom_a1
    exp_het = case_prop * het
    ccd = case_prop * cur_ctrl_ct / (total * (total - 1.0))
    var_hom = ccd * hom_a1 * (total - float(hom_a1))
    var_het = ccd * het * (total - float(het))
    neg_cov = ccd * hom_a1 * het
    exp_a1 = 2 * exp_hom + exp_het
    var_a1 = 4 * (var_hom + neg_cov) + var_het
    acc[1] += float(case_a1) - exp_a1
    acc[2] += var_a1
    acc[3] += exp_a1


def _build_structures(ds, cfg, fams, log):
    """dfam iteration-order construction (plink_family.c:4020-4180).
    Returns (allcase, mixedfam, sibships, clusters) where families are
    (dad_c, mom_c, kid_cs) and groups are collapsed-index arrays."""
    si = ds.si
    nraw = ds.raw_sample_ct
    inc = np.flatnonzero(ds.sample_mask[:nraw])
    pc = next(iter(si.phenos.values()), None)
    case = np.zeros(nraw, bool)
    if pc is not None:
        case[: pc.data.shape[0]] = (pc.data == 1) & pc.nonmiss[:nraw]
        case &= ds.sample_mask[:nraw]
    founder = ds.founder_mask[:nraw]
    is_child = np.zeros(nraw, bool)
    seen_parent = np.zeros(nraw, bool)
    for dad, mom, kids in fams:
        for p in (dad, mom):
            seen_parent[p] = True
        for c in kids:
            is_child[c] = True
    allcase = []
    mixedfam = []
    for dad, mom, kids in fams:
        ccount = sum(1 for c in kids if case[c])
        if ccount == len(kids):
            allcase.append((dad, mom, list(kids)))
        elif ccount:
            mixedfam.append((dad, mom, list(kids)))
    # sibships: included, not a trio-child, non-founder, grouped by
    # (FID, PAT, MAT), size >= 2; mixed only
    cand = [int(u) for u in inc
            if not is_child[u] and not founder[u]]
    groups: dict[tuple, list] = {}
    for u in cand:
        key = (str(si.fid[u]), str(si.pat[u]), str(si.mat[u]))
        groups.setdefault(key, []).append(u)
    sibships = []
    size_one_sib = np.zeros(nraw, bool)
    in_sibship = np.zeros(nraw, bool)
    for key in sorted(groups, key=lambda k: "\t".join(k)):
        mem = groups[key]
        if len(mem) < 2:
            size_one_sib[mem[0]] = True
            continue
        for u in mem:
            in_sibship[u] = True
        cc = sum(1 for u in mem if case[u])
        if cc and cc != len(mem):
            sibships.append(mem)
    # unrelated clusters
    clusters = []
    no_unrelateds = "no-unrelateds" in (cfg.dfam or ())
    if not no_unrelateds:
        if cfg.within:
            from .cmh import load_clusters_19

            _names, assign = load_clusters_19(ds, cfg)
        else:
            assign = np.full(nraw, -1, np.int64)
            assign[inc] = 0
        eligible = np.zeros(nraw, bool)
        eligible[inc] = True
        eligible &= ~is_child & ~seen_parent & ~in_sibship \
            & ~size_one_sib
        kmax = int(assign.max()) + 1 if assign.size else 0
        for k in range(kmax):
            mem = [int(u) for u in inc
                   if assign[u] == k and eligible[u]]
            cc = sum(1 for u in mem if case[u])
            if cc and cc != len(mem):
                clusters.append(mem)
    return allcase, mixedfam, sibships, clusters, case


def run_dfam(ds: Dataset, cfg, log: RunLogger) -> None:
    mods = set(cfg.dfam or ())
    for m in mods:
        if m == "perm" or m.startswith("mperm"):
            raise FlagError(
                "--dfam permutation tests are currently under "
                "development.")
        if m not in ("no-unrelateds", "perm-count"):
            raise FlagError(f"Invalid --dfam parameter '{m}'.")
    vi = ds.vi
    inc_v = np.flatnonzero(ds.variant_mask)
    chrom_v = vi.chrom[inc_v]
    nonauto = np.isin(chrom_v, (X_CODE, Y_CODE, MT_CODE))
    n_excl = int(nonauto.sum())
    if n_excl:
        log.log(f"Excluding {n_excl} X/MT/haploid variant"
                f"{'' if n_excl == 1 else 's'} from DFAM test.")
        if n_excl == inc_v.size:
            raise FlagError("No variants remaining for DFAM analysis.")
        inc_v = inc_v[~nonauto]
    trios, fams = build_trios_19(ds)
    allcase, mixedfam, sibships, clusters, case = _build_structures(
        ds, cfg, fams, log)
    if not case.any():
        raise FlagError("DFAM test requires at least one case.")

    from .basic_reports import alt_allele_freqs

    af = alt_allele_freqs(ds, founders_only=True)
    a1_is_alt = (~(af > 0.5))[inc_v]
    male = ds.male_mask()[: ds.raw_sample_ct]
    bed = _bed_codes(ds, inc_v, a1_is_alt)
    bed = _erase_mendel(bed, trios, male, None)

    maxsnp = _fw_width(len(str(vi.vid[i])) for i in inc_v)
    ci = vi.chr_info
    alt1 = vi.alt1()
    out = cfg.out + ".dfam"
    fh = open(out, "w")
    fh.write(" CHR " + "SNP".rjust(maxsnp)
             + "   A1   A2      OBS      EXP        CHISQ"
             "            P \n")

    def a1ct(g):
        # A1 allele count from bed code (0 homA1, 2 het, 3 homA2)
        return (4 - g) // 2

    for mi in range(inc_v.size):
        v = int(inc_v[mi])
        g = bed[mi]
        twice_numer = 0
        quad_denom = 0
        total_count = 0
        twice_total_expected = 0
        acc = [0, 0.0, 0.0, 0.0]   # total_count2, numer, denom, texp
        for dad, mom, kids in allcase:
            pg = int(g[dad])
            mg = int(g[mom])
            pa1 = int(_ALLELE_CT[pg * 4 + mg])
            if not pa1:
                continue
            cct = 0
            ca1 = 0
            for k in kids:
                cg = int(g[k])
                if cg == 1:
                    continue
                cct += 1
                ca1 += (4 - cg) // 2
            if cct:
                twice_numer += 2 * ca1 - cct * pa1
                quad_denom += (2 - (pa1 & 1)) * cct
                total_count += ca1
                twice_total_expected += cct * pa1
        for dad, mom, kids in mixedfam:
            pg = int(g[dad])
            mg = int(g[mom])
            pa1 = int(_ALLELE_CT[pg * 4 + mg])
            cct = uct = chom = chet = uhom = uhet = 0
            for k in kids:
                cg = int(g[k])
                if cg == 1:
                    continue
                if case[k]:
                    cct += 1
                    if cg != 3:
                        if cg == 2:
                            chet += 1
                        else:
                            chom += 1
                else:
                    uct += 1
                    if cg != 3:
                        if cg == 2:
                            uhet += 1
                        else:
                            uhom += 1
            if not cct:
                continue
            if not pa1:
                _sibship_calc(cct, chom, chet, uct, uhom, uhet, acc)
            else:
                ca1 = 2 * chom + chet
                twice_numer += 2 * ca1 - cct * pa1
                quad_denom += (2 - (pa1 & 1)) * (cct + uct)
                total_count += ca1
                twice_total_expected += cct * pa1
        numer = acc[1] + 0.5 * twice_numer
        denom = acc[2] + 0.25 * quad_denom
        total_expected = acc[3] + 0.5 * twice_total_expected
        acc = [acc[0], numer, denom, total_expected]
        for mem in sibships:
            cct = uct = chom = chet = uhom = uhet = 0
            for k in mem:
                cg = int(g[k])
                if cg == 1:
                    continue
                if case[k]:
                    cct += 1
                    if cg != 3:
                        if cg == 2:
                            chet += 1
                        else:
                            chom += 1
                else:
                    uct += 1
                    if cg != 3:
                        if cg == 2:
                            uhet += 1
                        else:
                            uhom += 1
            if not cct:
                continue
            _sibship_calc(cct, chom, chet, uct, uhom, uhet, acc)
        for mem in clusters:
            cct = uct = chom = chet = uhom = uhet = 0
            for k in mem:
                cg = int(g[k])
                if cg == 1:
                    continue
                if case[k]:
                    cct += 1
                    if cg != 3:
                        if cg == 2:
                            chet += 1
                        else:
                            chom += 1
                else:
                    uct += 1
                    if cg != 3:
                        if cg == 2:
                            uhet += 1
                        else:
                            uhom += 1
            ca1 = 2 * chom + chet
            hom_a1 = chom + uhom
            het = chet + uhet
            uii = cct + uct
            if uii <= 1 or (hom_a1 == 0 and het == 0) \
                    or hom_a1 == uii or het == uii:
                continue
            acc[0] += ca1
            if not cct or not uct:
                acc[3] += float(ca1)
                continue
            dxx = float(uii)
            case_prop = cct / dxx
            ujj = 2 * hom_a1 + het
            exp_a1 = case_prop * ujj
            var_a1 = exp_a1 * float(2 * uii - ujj) * uct \
                / (dxx * (2 * dxx - 1))
            acc[1] += ca1 - exp_a1
            acc[2] += var_a1
            acc[3] += exp_a1
        total_count += acc[0]
        numer, denom, total_expected = acc[1], acc[2], acc[3]
        with np.errstate(invalid="ignore", divide="ignore"):
            chisq = float(np.float64(numer * numer)
                          / np.float64(denom))
        try:
            pval = math.exp(chisq_logsf(chisq, 1)) \
                if math.isfinite(chisq) and chisq >= 0 else -9.0
        except (ValueError, OverflowError):
            pval = -9.0
        a1s = str(alt1[v]) if a1_is_alt[mi] else str(vi.ref[v])
        a2s = str(vi.ref[v]) if a1_is_alt[mi] else str(alt1[v])
        line = (ci.name19(int(vi.chrom[v])).rjust(4) + " "
                + _fw(str(vi.vid[v]), maxsnp) + " "
                + _fw(a1s, 4) + " " + _fw(a2s, 4) + " "
                + str(total_count).rjust(8) + " "
                + _g4(total_expected, 8) + " ")
        if denom != 0.0:
            line += _g4(chisq, 12) + " " + _g4(pval, 12)
        else:
            line += "          NA           NA"
        fh.write(line + " \n")
    fh.close()
    log.log(f"Writing --dfam results to {out} ... done.")
