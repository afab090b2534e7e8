"""--mh/--bd Cochran-Mantel-Haenszel + Breslow-Day and --homog
stratified association tests, PLINK 1.9 parity.

Behavior reference: cmh_assoc / homog_assoc / cluster_assoc_init /
cluster_assoc_load_one (1.9/plink_assoc.c:10860-11960), cluster loading
(1.9/plink_cluster.c:393,528: cluster IDs sorted with strcmp_natural).

Counts are in allele space per (cluster, case/control): diploid samples
contribute 2 alleles, chrX males 1 (het-male calls zeroed via the
properly-constructed haploid filter here), chrY males only, other
haploid 1 each.  Only clusters with >= 1 case and >= 1 control are
kept, in sorted-name order (the CMH sums follow that order).
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
from .blocks import SMALL_EPSILON, set_allele_freqs_19
from .cluster import _ltqnorm


def load_clusters_19(ds: Dataset, cfg):
    """--within/--family cluster assignment: returns (names, assign)
    where assign[i] = cluster index in ASCII-sorted name order, or -1.
    Only samples passing the current filters are assigned."""
    si = ds.si
    n = ds.raw_sample_ct
    assign_name: dict[int, str] = {}
    if cfg.family:
        for i in range(n):
            if ds.sample_mask[i]:
                assign_name[i] = str(si.fid[i])
    elif cfg.within:
        mcol = (cfg.mwithin if cfg.mwithin else 1) + 1
        key = {}
        for i in range(n):
            if ds.sample_mask[i]:
                key[(str(si.fid[i]), str(si.iid[i]))] = i
        with open(cfg.within) as f:
            for line in f:
                toks = line.split()
                if len(toks) < mcol + 1:
                    continue
                i = key.get((toks[0], toks[1]))
                if i is not None:
                    assign_name[i] = toks[mcol]
    else:
        raise FlagError("--mh/--bd/--homog requires --within/--family.")
    import functools

    from .meta import strcmp_natural

    names = sorted(set(assign_name.values()),
                   key=functools.cmp_to_key(
                       lambda a, b: strcmp_natural(a.encode(),
                                                   b.encode())))
    idx = {nm: k for k, nm in enumerate(names)}
    assign = np.full(n, -1, np.int64)
    for i, nm in assign_name.items():
        assign[i] = idx[nm]
    return names, assign


def _chiprob(chisq, df):
    if not (chisq == chisq) or chisq < 0:
        return -9.0
    try:
        return math.exp(chisq_logsf(chisq, df))
    except (ValueError, OverflowError):
        return -9.0


class _CmhData:
    """Per-dataset cluster/count machinery shared by --mh, --mh2 and
    --homog."""

    def __init__(self, ds, cfg, flag_name, log, mh2=False):
        si = ds.si
        pc = next(iter(si.phenos.values()), None)
        if pc is None or pc.kind != "cc":
            raise FlagError(
                f"{flag_name} requires a case/control phenotype.")
        names, assign = load_clusters_19(ds, cfg)
        pheno_nm = pc.nonmiss & ds.sample_mask
        case = pheno_nm & (pc.data == 1)
        n = ds.raw_sample_ct
        male = ds.male_mask()[:n]
        # keep clusters with >=1 case and >=1 control (--mh2: any
        # pheno_nm member suffices, 1.9/plink_assoc.c:10818-10820)
        kept = []
        self.kept_names = []
        for k, nm in enumerate(names):
            mem = (assign == k) & pheno_nm[:n]
            c = int((mem & case[:n]).sum())
            u = int(mem.sum()) - c
            if (c and u) or (mh2 and (c or u)):
                kept.append(k)
                self.kept_names.append(nm)
        if len(kept) < 2:
            raise FlagError(
                f"{flag_name} requires at least two valid clusters.")
        K = len(kept)
        self.K = K
        self.members = []     # [K][2] index arrays (ctrl, case)
        self.male_cts = np.zeros((K, 2), np.int64)
        self.tot_cts = np.zeros((K, 2), np.int64)
        for kk, k in enumerate(kept):
            mem = (assign == k) & pheno_nm[:n]
            ctrl_idx = np.flatnonzero(mem & ~case[:n])
            case_idx = np.flatnonzero(mem & case[:n])
            self.members.append((ctrl_idx, case_idx))
            self.tot_cts[kk] = (ctrl_idx.size, case_idx.size)
            self.male_cts[kk] = (int(male[ctrl_idx].sum()),
                                 int(male[case_idx].sum()))
        self.male = male
        case_tot = int(self.tot_cts[:, 1].sum())
        tot = int(self.tot_cts.sum())
        log.log(f"{flag_name}: {K} valid clusters, with a total of "
                f"{case_tot} cases and {tot - case_tot} controls.")

    def counts(self, g, chrom):
        """Per cluster x pheno: (A1 allele ct, missing allele ct,
        current total allele ct).  g = minor-allele counts with 3 =
        missing (pre-haploid-fix)."""
        is_x = chrom == X_CODE
        is_y = chrom == Y_CODE
        is_hap = is_x or is_y or chrom == MT_CODE
        male = self.male
        out = []
        for kk in range(self.K):
            row = []
            for ph in range(2):
                idx = self.members[kk][ph]
                gv = g[idx]
                mv = male[idx]
                if not is_hap:
                    a1 = int((gv == 1).sum()) + 2 * int((gv == 2).sum())
                    miss = 2 * int((gv == 3).sum())
                    tot = 2 * idx.size
                elif is_x:
                    fem = ~mv
                    gf = gv[fem]
                    gm = gv[mv]
                    a1 = (int((gf == 1).sum())
                          + 2 * int((gf == 2).sum())
                          + int((gm == 2).sum()))
                    miss = (2 * int((gf == 3).sum())
                            + int(((gm == 3) | (gm == 1)).sum()))
                    tot = 2 * idx.size - int(mv.sum())
                elif is_y:
                    gm = gv[mv]
                    a1 = int((gm == 2).sum())
                    miss = int(((gm == 3) | (gm == 1)).sum())
                    tot = int(mv.sum())
                else:
                    a1 = int((gv == 2).sum())
                    miss = int(((gv == 3) | (gv == 1)).sum())
                    tot = idx.size
                row.append((a1, miss, tot))
            out.append(row)
        return out


def run_cmh(ds: Dataset, cfg, log: RunLogger) -> None:
    breslow_day = cfg.bd
    mods = set(cfg.mh_mods or ())
    for m in mods:
        if m in ("perm", "perm-count", "perm-bd") \
                or m.startswith("mperm"):
            raise FlagError(
                "--mh/--bd permutation tests are currently under "
                "development.")
        raise FlagError(f"Invalid --mh/--bd modifier '{m}'.")
    data = _CmhData(ds, cfg, "--mh/--bd", log)
    vi = ds.vi
    ci_size = cfg.ci if cfg.ci is not None else 0.95
    ci_zt = _ltqnorm(1 - (1 - ci_size) / 2)

    from ..ops.pairwise import _unpack_np
    from .basic_reports import alt_allele_freqs

    codes = _unpack_np(ds.all_packed())[:, : ds.raw_sample_ct]
    freqs19 = set_allele_freqs_19(ds, codes)
    af = alt_allele_freqs(ds, founders_only=True)
    a1_is_alt = ~(af > 0.5)
    alt1 = vi.alt1()
    inc = np.flatnonzero(ds.variant_mask)
    maxsnp = _fw_width(len(str(vi.vid[i])) for i in inc)
    chrci = vi.chr_info
    out = cfg.out + ".cmh"
    fh = open(out, "w")
    hdr = (" CHR " + "SNP".rjust(maxsnp)
           + "         BP   A1      MAF   A2      CHISQ          P"
           "         OR         SE        ")
    pct = int(ci_size * (100 + 0.000000000931322574615478515625))
    if pct >= 10:
        hdr += f"L{pct}        U{pct} "
    else:
        hdr += f" L{pct}         U{pct} "
    if breslow_day:
        hdr += "  CHISQ_BD       P_BD "
    fh.write(hdr + "\n")

    for v in inc:
        chrom = int(vi.chrom[v])
        raw = codes[v]
        g = raw if a1_is_alt[v] \
            else np.where(raw == 3, 3, 2 - raw).astype(raw.dtype)
        cts = data.counts(g, chrom)
        cmh_stat = 0.0
        cmh_denom = 0.0
        rtot = stot = 0.0
        v1 = v2 = v3 = 0.0
        for kk in range(data.K):
            (ca1, cmiss, ctot), (aa1, amiss, atot) = cts[kk]
            ctrl_ct = ctot - cmiss
            case_ct = atot - amiss
            if ctrl_ct and case_ct:
                allele_ct = ctrl_ct + case_ct
                ar = 1.0 / allele_ct
                am1r = 1.0 / (allele_ct - 1)
                ctrl_ctd = float(ctrl_ct)
                case_ctd = float(case_ct)
                ctrl_a1 = float(ca1)
                ctrl_a2 = ctrl_ctd - ctrl_a1
                case_a1 = float(aa1)
                case_a2 = case_ctd - case_a1
                a1d = ctrl_a1 + case_a1
                a2d = ctrl_a2 + case_a2
                mean_case_a1 = case_ctd * a1d * ar
                var_case_a1 = ctrl_ctd * case_ctd * a1d * a2d \
                    * ar * ar * am1r
                cmh_stat += case_a1 - mean_case_a1
                cmh_denom += var_case_a1
                r2 = case_a1 * ctrl_a2 * ar
                s2 = case_a2 * ctrl_a1 * ar
                rtot += r2
                stot += s2
                v1 += ar * r2 * (case_a1 + ctrl_a2)
                v2 += ar * s2 * (case_a2 + ctrl_a1)
                v3 += ar * ((case_a1 + ctrl_a2) * s2
                            + (case_a2 + ctrl_a1) * r2)
        with np.errstate(invalid="ignore", divide="ignore"):
            cmh_stat = float(
                np.float64(cmh_stat) * np.float64(cmh_stat)
                / np.float64(cmh_denom))
            if cmh_stat < 1e-28:
                cmh_stat = 0.0
            odds_ratio = float(np.float64(rtot) / np.float64(stot))
            if abs(1 - odds_ratio) < 1e-14:
                odds_ratio = 1.0
            se = float(np.sqrt(
                np.float64(v1) / (2 * rtot * rtot)
                + np.float64(v2) / (2 * stot * stot)
                + np.float64(v3) / (2 * rtot * stot)))
            log_or = float(np.log(np.float64(odds_ratio)))
        pval = _chiprob(cmh_stat, 1)
        a1s = str(alt1[v]) if a1_is_alt[v] else str(vi.ref[v])
        a2s = str(vi.ref[v]) if a1_is_alt[v] else str(alt1[v])
        line = (chrci.name19(chrom).rjust(4) + " "
                + _fw(str(vi.vid[v]), maxsnp) + " "
                + str(int(vi.pos[v])).rjust(10) + " "
                + _fw(a1s, 4) + " " + _g4(1.0 - freqs19[v], 8) + " "
                + _fw(a2s, 4))
        if math.isfinite(cmh_stat):
            line += " " + _g4(cmh_stat, 10) + " " \
                + _g4(max(pval, 0.0), 10) + " "
        else:
            line += "         NA         NA "
        if math.isfinite(odds_ratio):
            line += _g4(odds_ratio, 10) + " "
        else:
            line += "        NA "
        if math.isfinite(se):
            line += _g4(se, 10) + " "
            dxx = ci_zt * se
            for s in (log_or - dxx, log_or + dxx):
                try:
                    e = math.exp(s)
                except OverflowError:
                    e = math.inf
                if math.isfinite(e):
                    line += _g4(e, 10) + " "
                else:
                    line += "        NA "
        else:
            line += "        NA         NA         NA "
        if breslow_day:
            bd = _bd_stat(data, cts, odds_ratio)
            if bd is None:
                line += "        NA         NA "
            else:
                bdx2, cur_df = bd
                p = _chiprob(bdx2, cur_df)
                if p > -1:
                    line += _g4(bdx2, 10) + " " \
                        + _g4(max(p, 0.0), 10) + " "
                else:
                    line += "        NA         NA "
        fh.write(line + "\n")
    fh.close()
    log.log(f"Writing report to {out} ... done.")


def run_mh2(ds: Dataset, cfg, log: RunLogger) -> None:
    """--mh2: Cochran-Mantel-Haenszel 2xJx2 test (J = cluster count).

    Behavior reference: cmh2_assoc (1.9/plink_assoc.c:11385-11630):
    clusters need only one nonmissing-phenotype member; per marker,
    clusters with zero nonmissing observations are dropped, then
    Q = d' V^-1 d with d = n0 - u0 over the first J-1 clusters."""
    data = _CmhData(ds, cfg, "--mh2", log, mh2=True)
    ctrl_tot = int(data.tot_cts[:, 0].sum())
    case_tot = int(data.tot_cts[:, 1].sum())
    if ctrl_tot < 2 or case_tot < 2:
        raise FlagError(
            "--mh2 requires at least two cases and two controls.")
    vi = ds.vi

    from ..ops.pairwise import _unpack_np
    from ..utils.fmt import dtoa_g
    from .basic_reports import alt_allele_freqs

    codes = _unpack_np(ds.all_packed())[:, : ds.raw_sample_ct]
    af = alt_allele_freqs(ds, founders_only=True)
    a1_is_alt = ~(af > 0.5)
    inc = np.flatnonzero(ds.variant_mask)
    chrci = vi.chr_info
    out = cfg.out + ".cmh2"
    fh = open(out, "w")
    fh.write("CHR\tSNP\tCHISQ\tDF\tP\n")

    for v in inc:
        chrom = int(vi.chrom[v])
        raw = codes[v]
        g = raw if a1_is_alt[v] \
            else np.where(raw == 3, 3, 2 - raw).astype(raw.dtype)
        cts = data.counts(g, chrom)
        n0 = []
        ty_ctrl = []
        ty_case = []
        cur_ctrl = cur_case = ctrl_a1 = case_a1 = 0
        for kk in range(data.K):
            (ca1, cmiss, ctot), (aa1, amiss, atot) = cts[kk]
            cc = ctot - cmiss
            ac = atot - amiss
            if cc + ac:
                n0.append(float(ca1 + aa1))
                ctrl_a1 += ca1
                case_a1 += aa1
                cur_ctrl += cc
                cur_case += ac
                ty_ctrl.append(float(cc))
                ty_case.append(float(ac))
        J = len(n0)
        line = chrci.name19(chrom) + "\t" + str(vi.vid[v]) + "\t"
        if (cur_ctrl == 0 and cur_case) \
                or (cur_case == 0 and cur_ctrl) or J == 1:
            fh.write(line + "0\t0\tNA\n")
            continue
        if cur_ctrl < 2 or cur_case < 2 or J == 0:
            fh.write(line + "NA\tNA\tNA\n")
            continue
        Jm1 = J - 1
        ctrl_ctd = float(cur_ctrl)
        case_ctd = float(cur_case)
        ctrl_umult = float(ctrl_a1) / ctrl_ctd
        case_umult = float(case_a1) / case_ctd
        ctrl_vmult = ctrl_umult * (ctrl_ctd - float(ctrl_a1)) \
            / (ctrl_ctd * (ctrl_ctd - 1))
        case_vmult = case_umult * (case_ctd - float(case_a1)) \
            / (case_ctd * (case_ctd - 1))
        u0 = [ty_ctrl[j] * ctrl_umult + ty_case[j] * case_umult
              for j in range(Jm1)]
        V = np.empty((Jm1, Jm1))
        for j in range(Jm1):
            cvm = -ty_ctrl[j] * ctrl_vmult
            avm = -ty_case[j] * case_vmult
            V[j, j] = (ty_ctrl[j] - ctrl_ctd) * cvm \
                + (ty_case[j] - case_ctd) * avm
            for k in range(j + 1, Jm1):
                V[j, k] = ty_ctrl[k] * cvm + ty_case[k] * avm
                V[k, j] = V[j, k]
        try:
            Vinv = np.linalg.inv(V)
        except np.linalg.LinAlgError:
            fh.write(line + "NA\tNA\tNA\n")
            continue
        d = [n0[j] - u0[j] for j in range(Jm1)]
        chisq = 0.0
        for j in range(Jm1):
            dxx = 0.0
            for k in range(Jm1):
                dxx += Vinv[j, k] * d[k]
            chisq += dxx * d[j]
        p = _chiprob(chisq, Jm1)
        fh.write(line + dtoa_g(chisq) + "\t" + str(Jm1) + "\t"
                 + dtoa_g(max(p, 0.0)) + "\n")
    fh.close()
    log.log(f"Writing report to {out} ... done.")


def run_homog(ds: Dataset, cfg, log: RunLogger) -> None:
    """--homog: per-cluster odds-ratio homogeneity test.

    Behavior reference: homog_assoc (1.9/plink_assoc.c:11637-11900):
    +0.5/+1 continuity corrections, TOTAL/ASSOC/HOMOG partition rows,
    then one row per cluster."""
    data = _CmhData(ds, cfg, "--homog", log)
    vi = ds.vi
    K = data.K
    if K > 10:
        log.log("Warning: --homog statistics can be unreliable with "
                "small clusters.")

    from ..ops.pairwise import _unpack_np
    from .basic_reports import alt_allele_freqs

    codes = _unpack_np(ds.all_packed())[:, : ds.raw_sample_ct]
    af = alt_allele_freqs(ds, founders_only=True)
    a1_is_alt = ~(af > 0.5)
    alt1 = vi.alt1()
    inc = np.flatnonzero(ds.variant_mask)
    maxsnp = _fw_width(len(str(vi.vid[i])) for i in inc)
    chrci = vi.chr_info
    out = cfg.out + ".homog"
    fh = open(out, "w")
    fh.write(" CHR " + "SNP".rjust(maxsnp)
             + "   A1   A2      F_A      F_U      N_A      N_U"
             "     TEST      CHISQ   DF          P         OR\n")
    names6 = [_fw(nm, 6) for nm in data.kept_names]
    SE2 = SMALL_EPSILON * SMALL_EPSILON

    def u32w4(n):
        # uint32toa_w4 (1.9/plink_common.c:1054): for 10 <= n < 100 the
        # two pad spaces are overwritten by the digits without
        # advancing, so 2-digit values print with NO padding.
        if n < 10:
            return "   " + str(n)
        if n < 100:
            return str(n)
        if n < 1000:
            return " " + str(n)
        return str(n)

    for v in inc:
        chrom = int(vi.chrom[v])
        raw = codes[v]
        g = raw if a1_is_alt[v] \
            else np.where(raw == 3, 3, 2 - raw).astype(raw.dtype)
        cts = data.counts(g, chrom)
        tables = []
        cluster_or = []
        cluster_chisq = []
        x_total = x_assoc1 = x_assoc2 = 0.0
        for kk in range(K):
            (ca1, cmiss, ctot), (aa1, amiss, atot) = cts[kk]
            ctrl_ctd = float(1 + ctot - cmiss)
            case_ctd = float(1 + atot - amiss)
            ctrl_a1 = float(ca1) + 0.5
            ctrl_a2 = ctrl_ctd - ctrl_a1
            case_a1 = float(aa1) + 0.5
            case_a2 = case_ctd - case_a1
            tables.append((case_a1, case_a2, ctrl_a1, ctrl_a2))
            case_a2_recip = 1.0 / case_a2
            ctrl_a1_recip = 1.0 / ctrl_a1
            dxx = case_a1 * ctrl_a2 * case_a2_recip * ctrl_a1_recip
            cluster_or.append(dxx)
            ln_or = math.log(dxx)
            se_sq_recip = 1.0 / ((1.0 / case_a1) + (1.0 / ctrl_a2)
                                 + case_a2_recip + ctrl_a1_recip)
            x_assoc2 += se_sq_recip
            dxx = ln_or * se_sq_recip
            x_assoc1 += dxx
            dxx *= ln_or
            cluster_chisq.append(dxx)
            x_total += dxx
        x_assoc = x_assoc1 * x_assoc1 / x_assoc2
        a1s = str(alt1[v]) if a1_is_alt[v] else str(vi.ref[v])
        a2s = str(vi.ref[v]) if a1_is_alt[v] else str(alt1[v])
        prefix = (chrci.name19(chrom).rjust(4) + " "
                  + _fw(str(vi.vid[v]), maxsnp) + " "
                  + _fw(a1s, 4) + " " + _fw(a2s, 4) + " ")
        na4 = "      NA       NA       NA       NA "
        fh.write(prefix + na4 + " TOTAL " + _g4(x_total, 10) + " "
                 + u32w4(K) + " "
                 + _g4(_chiprob(x_total, K), 10)
                 + "         NA\n")
        fh.write(prefix + na4 + " ASSOC " + _g4(x_assoc, 10)
                 + "    1 " + _g4(_chiprob(x_assoc, 1), 10)
                 + "         NA\n")
        dxx = x_total - x_assoc
        fh.write(prefix + na4 + " HOMOG " + _g4(dxx, 10) + " "
                 + u32w4(K - 1) + " "
                 + _g4(_chiprob(dxx, K - 1), 10)
                 + "         NA\n")
        for kk in range(K):
            case_a1, case_a2, ctrl_a1, ctrl_a2 = tables[kk]
            case_ctd = case_a1 + case_a2
            ctrl_ctd = ctrl_a1 + ctrl_a2
            if case_ctd < 1.5 or ctrl_ctd < 1.5:
                # quirk: the reference builds this NA row but its
                # fwrite is inside the else branch
                # (1.9/plink_assoc.c:11821-11836), so the row is
                # silently dropped from the output.
                continue
            line = (prefix + _g4(case_a1 / case_ctd, 8) + " "
                    + _g4(ctrl_a1 / ctrl_ctd, 8) + " "
                    + _g4(case_ctd - 1, 8) + " "
                    + _g4(ctrl_ctd - 1, 8) + " " + names6[kk] + " ")
            chi = cluster_chisq[kk]
            if chi < SE2:
                chi = 0.0
            line += _g4(chi, 10) + "    1 " \
                + _g4(max(_chiprob(chi, 1), 0.0), 10) + " "
            orv = cluster_or[kk]
            if math.isfinite(orv):
                line += _g4(orv, 10) + "\n"
            else:
                line += "        NA\n"
            fh.write(line)
    fh.close()
    log.log(f"Writing report to {out} ... done.")


def _bd_stat(data, cts, odds_ratio):
    if not math.isfinite(odds_ratio) or odds_ratio == 1.0:
        return None
    one_minus = 1.0 - odds_ratio
    half_recip = 0.5 / one_minus
    bdx2 = 0.0
    cur_df = -1
    for kk in range(data.K):
        (ca1, cmiss, ctot), (aa1, amiss, atot) = cts[kk]
        ctrl_ct = ctot - cmiss
        case_ct = atot - amiss
        if ctrl_ct and case_ct:
            cur_df += 1
            ctrl_ctd = float(ctrl_ct)
            case_ctd = float(case_ct)
            ctrl_a1 = float(ca1)
            case_a1 = float(aa1)
            a1d = ctrl_a1 + case_a1
            amax = min(case_ctd, a1d)
            bb = ctrl_ctd + case_ctd * odds_ratio - a1d * one_minus
            discrim = math.sqrt(
                bb * bb + 4 * one_minus * odds_ratio * case_ctd * a1d)
            as_plus = (-bb + discrim) * half_recip
            as_minus = (-bb - discrim) * half_recip
            a_star = as_minus if (as_minus <= amax and as_minus >= 0) \
                else as_plus
            b_star = case_ctd - a_star
            c_star = a1d - a_star
            d_star = ctrl_ctd - a1d + a_star
            if a_star == 0.0 or b_star == 0.0 or c_star == 0.0 \
                    or d_star == 0.0:
                return None
            dxx = 1.0 / a_star + 1.0 / b_star + 1.0 / c_star \
                + 1.0 / d_star
            dyy = case_a1 - a_star
            bdx2 += dyy * dyy * dxx
    return bdx2, cur_df
