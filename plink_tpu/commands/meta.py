"""--meta-analysis: fixed/random-effects meta-analysis, PLINK 1.9 parity.

Behavior reference: meta_analysis / meta_analysis_open_and_read_header /
meta_analysis_allelic_match (1.9/plink_misc.c:5041-6600), strcmp_natural
(1.9/plink_common.c:5066-5191), flag parsing (1.9/plink.c).

Two passes over the input association files, replicated exactly:
pass 1 validates every line (BAD_CHR/BAD_BP/MISSING_A1/MISSING_A2/
BAD_ES/BAD_SE/ALLELE_MISMATCH/BAD_P/BAD_ESS/DUPLICATE -> .prob),
builds the master variant list keyed by first-seen chr/bp/alleles;
pass 2 re-reads, stores each file's (beta, se) with A1/A2-flip sign
correction against the first *contributing* file's allele order, then
computes inverse-variance fixed effects, DerSimonian-Laird random
effects, Cochran's Q and I^2 (plink_misc.c:6420-6500).
"""

from __future__ import annotations

import functools
import gzip
import math

import numpy as np

from ..cli import FlagError
from ..stats.distributions import chisq_logsf
from ..utils.fmt import dtoa_g
from ..utils.logging import RunLogger
from .assoc19 import _g4
from .cluster import _ltqnorm
from .epistasis import _normdist

_PROBLEM_STRINGS = ["BAD_CHR", "BAD_BP", "MISSING_A1", "MISSING_A2",
                    "BAD_ES", "BAD_SE", "ALLELE_MISMATCH", "BAD_P",
                    "BAD_ESS", "DUPLICATE"]


def _is_digit(c):
    return 48 <= c <= 57


def _is_nzdigit(c):
    return 49 <= c <= 57


def _scan_forward(s1, i1, s2, i2):
    """strcmp_natural_scan_forward: both strings mid-number, s1 < s2."""
    while True:
        i1 += 1
        i2 += 1
        if not _is_digit(s1[i1]):
            return -1
        if not _is_digit(s2[i2]):
            return 1


def _nat_tiebroken(s1, i1, s2, i2):
    """States 2/3: match except capitalization; ties favor s2."""
    i1 += 1
    i2 += 1
    c1, c2 = s1[i1], s2[i2]
    while True:
        while not _is_nzdigit(c1) and not _is_nzdigit(c2):
            # state 2
            if c1 != c2:
                u1 = c1 - 32 if 97 <= c1 <= 122 else c1
                u2 = c2 - 32 if 97 <= c2 <= 122 else c2
                if u1 < u2:
                    return -1
                if u1 > u2:
                    return 1
            elif not c1:
                return -1
            i1 += 1
            i2 += 1
            c1, c2 = s1[i1], s2[i2]
        if not _is_nzdigit(c1) or not _is_nzdigit(c2):
            return -1 if c1 < c2 else 1
        while True:
            # state 3
            if c1 != c2:
                if _is_digit(c2):
                    if c1 < c2:
                        return _scan_forward(s1, i1, s2, i2)
                    return -_scan_forward(s2, i2, s1, i1)
                return 1
            i1 += 1
            i2 += 1
            c1, c2 = s1[i1], s2[i2]
            if not _is_digit(c1):
                break
        if _is_digit(c2):
            return -1
        # fall through to state 2 WITHOUT the outer-loop guard: replicate
        # by one manual state-2 step then continue the outer loop
        if c1 != c2:
            u1 = c1 - 32 if 97 <= c1 <= 122 else c1
            u2 = c2 - 32 if 97 <= c2 <= 122 else c2
            if u1 < u2:
                return -1
            if u1 > u2:
                return 1
        elif not c1:
            return -1
        i1 += 1
        i2 += 1
        c1, c2 = s1[i1], s2[i2]


def strcmp_natural(a: bytes, b: bytes) -> int:
    """strcmp_natural_uncasted (1.9/plink_common.c:5139)."""
    s1 = a + b"\0"
    s2 = b + b"\0"
    i1 = i2 = 0
    c1, c2 = s1[0], s2[0]
    while True:
        while not _is_nzdigit(c1) and not _is_nzdigit(c2):
            # state 0
            if c1 != c2:
                if 97 <= c1 <= 122:
                    if c2 + 32 == c1:
                        return -_nat_tiebroken(s2, i2, s1, i1)
                    if not 97 <= c2 <= 122:
                        c1 -= 32
                elif 97 <= c2 <= 122:
                    c2 -= 32
                    if c1 == c2:
                        return _nat_tiebroken(s1, i1, s2, i2)
                return -1 if c1 < c2 else 1
            elif not c1:
                return 0
            i1 += 1
            i2 += 1
            c1, c2 = s1[i1], s2[i2]
        if not _is_nzdigit(c1) or not _is_nzdigit(c2):
            return -1 if c1 < c2 else 1
        while True:
            # state 1
            if c1 != c2:
                if _is_digit(c2):
                    if c1 < c2:
                        return _scan_forward(s1, i1, s2, i2)
                    return -_scan_forward(s2, i2, s1, i1)
                return 1
            i1 += 1
            i2 += 1
            c1, c2 = s1[i1], s2[i2]
            if not _is_digit(c1):
                break
        if _is_digit(c2):
            return -1
        # loop back to state 0 without advancing


_FLOAT_CHARS = set("0123456789.eE+-")


def _scan_double(tok: str):
    """C strtod prefix parse: returns float or None (no valid prefix)."""
    # fast path
    try:
        return float(tok)
    except ValueError:
        pass
    low = tok.lower()
    for pre in ("nan", "inf"):
        if low.startswith(pre) or low.startswith("+" + pre) \
                or low.startswith("-" + pre):
            s = low.lstrip("+")
            return float("-" + pre) if low.startswith("-") else float(pre)
    # longest valid numeric prefix
    best = None
    for k in range(len(tok), 0, -1):
        if tok[k - 1] not in _FLOAT_CHARS:
            continue
        try:
            best = float(tok[:k])
            break
        except ValueError:
            continue
    return best


def _cdiv(a: float, b: float) -> float:
    """C float division semantics: x/0 -> +-inf, 0/0 -> nan."""
    if b:
        return a / b
    if a != a or a == 0.0:
        return math.nan
    return math.copysign(math.inf, a) * math.copysign(1.0, b)


def _scan_uint(tok: str):
    """scan_uint_defcap-style prefix parse: optional '+', digit run."""
    t = tok[1:] if tok[:1] == "+" else tok
    k = 0
    while k < len(t) and t[k].isdigit():
        k += 1
    if not k:
        return None
    v = int(t[:k])
    return v if v <= 0x7FFFFFFE else None


def _chrom_code(tok: str):
    """get_chrom_code: numeric 0-26, X/Y/XY/MT/M, chr prefix ok."""
    t = tok
    if t[:3] in ("chr", "Chr", "CHR"):
        t = t[3:]
    tu = t.upper()
    special = {"X": 23, "Y": 24, "XY": 25, "MT": 26, "M": 26}
    if tu in special:
        return special[tu]
    try:
        v = int(t)
    except ValueError:
        return None
    return v if 0 <= v <= 26 else None


class _HeaderSpec:
    """Resolved column layout for one file."""

    def __init__(self, cols, a2_present):
        self.cols = cols  # role -> column index
        self.a2_present = a2_present


def _read_header(path, opener, dicts, weighted_z, use_map, no_allele):
    """meta_analysis_open_and_read_header: match header tokens against
    the search dictionaries; earlier entries in a custom search order
    win; duplicates of the winning name are an error."""
    with opener(path) as f:
        for line in f:
            toks = line.split()
            if toks:
                break
        else:
            raise FlagError(f"{path} is empty.")
    # roles: 0 SNP, 1 ES, 2 SE, 3 P, 4 ESS, 5 CHR, 6 BP, 7 A1, 8 A2
    best = {}
    col = {}
    for ci, t in enumerate(toks):
        for role, order in dicts.items():
            if t in order:
                rank = order.index(t)
                if role not in best or rank < best[role]:
                    best[role] = rank
                    col[role] = ci
                elif rank == best[role]:
                    raise FlagError(
                        f"Duplicate column header '{t}' in {path}.")
    if 0 not in col:
        raise FlagError(f"No variant ID field found in {path}.")
    if 1 not in col:
        raise FlagError(f"No effect size field found in {path}.")
    if 2 not in col:
        raise FlagError(f"No standard error field found in {path}.")
    if weighted_z and 3 not in col:
        raise FlagError(f"No p-value field found in {path}.")
    if weighted_z and 4 not in col:
        raise FlagError(
            f"No effective sample size field found in {path}.")
    if use_map:
        if 5 not in col:
            raise FlagError(f"No CHR field found in {path}.")
        if 6 not in col:
            raise FlagError(f"No BP field found in {path}.")
        if not no_allele and 7 not in col:
            raise FlagError(f"No A1 allele field found in {path}.")
    return _HeaderSpec(col, 8 in col), len(toks)


def _line_tokens(line, spec):
    """Extract role->token for one line; None if a needed column is
    missing (silently skipped, like the reference)."""
    toks = line.split()
    if not toks:
        return None
    maxcol = max(spec.cols.values())
    if len(toks) <= maxcol:
        return None
    return {role: toks[ci] for role, ci in spec.cols.items()}


def run_meta_analysis(cfg, log: RunLogger) -> None:
    mods = set(cfg.meta_analysis_mods)
    fnames = list(cfg.meta_analysis)
    use_map = "no-map" not in mods
    no_allele = ("no-allele" in mods) or (not use_map)
    input_beta = ("logscale" in mods) or ("qt" in mods)
    output_beta = "qt" in mods
    report_all = "report-all" in mods
    report_study = "study" in mods
    weighted_z = "weighted-z" in mods
    report_dups = "report-dups" in mods
    missing_geno = "0"

    def order(custom, default):
        return list(custom) if custom else [default]

    dicts = {
        0: order(cfg.meta_snp_field, "SNP"),
        1: ["BETA" if input_beta else "OR"],
        2: order(cfg.meta_se_field, "SE"),
    }
    if weighted_z:
        dicts[3] = order(cfg.meta_p_field, "P")
        dicts[4] = order(cfg.meta_ess_field, "NMISS")
    if use_map:
        dicts[5] = order(cfg.meta_chr_field, "CHR")
        dicts[6] = order(cfg.meta_bp_field, "BP")
        if not no_allele:
            dicts[7] = order(cfg.meta_a1_field, "A1")
            dicts[8] = order(cfg.meta_a2_field, "A2")

    def opener(path):
        from ..io.compress import open_text_auto

        return open_text_auto(path)

    # ---- pass 1: validate, report problems, build master list
    master: dict[str, list] = {}  # id -> [chrom, bp, a1, a2, file_ct]
    order_seen: list[str] = []
    prob_lines: list[str] = []
    rejected = 0
    specs = []
    for fname in fnames:
        spec, _ = _read_header(fname, opener, dicts, weighted_z,
                               use_map, no_allele)
        specs.append(spec)
        seen_ids = set()
        with opener(fname) as f:
            first = True
            for line in f:
                if first:
                    first = False
                    continue
                tp = _line_tokens(line, spec)
                if tp is None:
                    continue
                vid = tp[0]
                problem = 0
                if vid in seen_ids:
                    problem = 0x200
                else:
                    seen_ids.add(vid)
                    cur_chrom = cur_bp = None
                    a1 = a2 = None
                    if use_map:
                        cur_chrom = _chrom_code(tp[5])
                        if cur_chrom is None:
                            problem |= 1
                        cur_bp = _scan_uint(tp[6])
                        if cur_bp is None:
                            problem |= 2
                        if not no_allele:
                            a1 = tp[7]
                            if a1 == missing_geno:
                                problem |= 4
                            if spec.a2_present:
                                a2 = tp[8]
                                if a2 == missing_geno:
                                    problem |= 8
                    es = _scan_double(tp[1])
                    if es is None or es == math.inf \
                            or ((not input_beta) and not es >= 0) \
                            or (input_beta
                                and (es != es or es == -math.inf)):
                        problem |= 0x10
                    se = _scan_double(tp[2])
                    if se is None or not se >= 0.0 or se == math.inf:
                        problem |= 0x20
                    if weighted_z:
                        p = _scan_double(tp[3])
                        if p is None or not p >= 0.0 or p > 1.0:
                            problem |= 0x80
                        ess = _scan_double(tp[4])
                        if ess is None or not ess > 0.0 \
                                or ess == math.inf:
                            problem |= 0x100
                    ent = master.get(vid)
                    if ent is None:
                        if not problem:
                            master[vid] = [cur_chrom, cur_bp, a1,
                                           a2 if spec.a2_present else "",
                                           1]
                            order_seen.append(vid)
                        # problems on a brand-new variant: reported,
                        # not added
                    else:
                        # allele match against first-seen record
                        match = True
                        if use_map and not no_allele:
                            m = _allele_match(ent[2], ent[3], a1,
                                              a2 if spec.a2_present
                                              else None)
                            match = m != 0
                        if match:
                            if not problem:
                                ent[4] += 1
                        else:
                            problem |= 0x40
                if problem:
                    if problem == 0x200 and not report_dups:
                        continue
                    pm = problem
                    while pm:
                        bit = pm & -pm
                        prob_lines.append(
                            f"{fname}\t{vid}\t"
                            f"{_PROBLEM_STRINGS[bit.bit_length() - 1]}\n")
                        pm &= pm - 1
                    rejected += 1
    # mask-skipped chrom (not in mask) lines were handled inline via
    # problem flags; chrom_mask is all-inclusive here.
    if prob_lines:
        with open(cfg.out + ".prob", "w") as f:
            f.writelines(prob_lines)
        log.log(f"--meta-analysis: {rejected} problematic line"
                f"{'' if rejected == 1 else 's'}; see {cfg.out}.prob .")

    if report_all:
        final_ids = list(order_seen)
    else:
        final_ids = [v for v in order_seen if master[v][4] > 1]
    if not final_ids:
        raise FlagError("No --meta-analysis variants.")

    # ---- sort: (chrom byte, bp hi-uchar, natural variant id)
    def packed_key(vid):
        ent = master[vid]
        if use_map:
            bp = ent[1]
            pre = bytes([ent[0]]) + bytes(
                [(bp >> s) & 0x7F | 0x80 for s in (28, 21, 14, 7, 0)])
        else:
            pre = b""
        return pre + vid.encode()

    final_ids.sort(key=functools.cmp_to_key(
        lambda x, y: strcmp_natural(packed_key(x), packed_key(y))))
    id_to_idx = {v: i for i, v in enumerate(final_ids)}
    file_ct = len(fnames)

    # ---- pass 2: collect per-file data in one window
    data = [[] for _ in final_ids]       # list of (beta, se)
    files_of = [[] for _ in final_ids]   # contributing file indices
    alleles = [None] * len(final_ids)    # first contributor's (a1, a2)
    wz_num = np.zeros(len(final_ids))
    wz_den = np.zeros(len(final_ids))
    for file_idx, fname in enumerate(fnames):
        spec = specs[file_idx]
        seen_ids = set()
        with opener(fname) as f:
            first = True
            for line in f:
                if first:
                    first = False
                    continue
                tp = _line_tokens(line, spec)
                if tp is None:
                    continue
                vid = tp[0]
                if vid in seen_ids:
                    continue
                seen_ids.add(vid)
                if use_map:
                    if _chrom_code(tp[5]) is None:
                        continue
                    if _scan_uint(tp[6]) is None:
                        continue
                    if not no_allele:
                        a1 = tp[7]
                        if a1 == missing_geno:
                            continue
                        a2 = tp[8] if spec.a2_present else None
                        if a2 == missing_geno:
                            continue
                beta = _scan_double(tp[1])
                if beta is None:
                    continue
                if not input_beta:
                    beta = math.log(beta) if beta > 0 else (
                        -math.inf if beta == 0 else math.nan)
                if not math.isfinite(beta):
                    continue
                se = _scan_double(tp[2])
                if se is None or not se >= 0.0 or se == math.inf:
                    continue
                if weighted_z:
                    p = _scan_double(tp[3])
                    if p is None or not p >= 0.0 or p > 1.0:
                        continue
                    ess = _scan_double(tp[4])
                    if ess is None or not ess > 0.0 or ess == math.inf:
                        continue
                idx = id_to_idx.get(vid)
                if idx is None:
                    continue
                if use_map and not no_allele:
                    if alleles[idx] is None:
                        alleles[idx] = (
                            a1, a2 if spec.a2_present else "")
                    else:
                        m = _allele_match(alleles[idx][0],
                                          alleles[idx][1], a1,
                                          a2 if spec.a2_present
                                          else None)
                        if m == 0:
                            continue
                        if m == 2:
                            beta = -beta
                if weighted_z:
                    dxx = _ltqnorm(1.0 - p * 0.5) * math.sqrt(ess)
                    wz_num[idx] += dxx if beta > 0.0 else -dxx
                    wz_den[idx] += ess
                data[idx].append((beta, se))
                files_of[idx].append(file_idx)

    # ---- output
    out = cfg.out + ".meta"
    fh = open(out, "w")
    hdr = ""
    if use_map:
        hdr += " CHR          BP"
    hdr += "            SNP"
    if not no_allele:
        hdr += "  A1  A2"
    hdr += ("   N           P        P(R)    BETA BETA(R)       Q       I"
            if output_beta else
            "   N           P        P(R)      OR   OR(R)       Q       I")
    if weighted_z:
        hdr += "  WEIGHTED_Z       P(WZ)"
    if report_study:
        for fi in range(file_ct):
            hdr += f" F{fi}".rjust(8)
    fh.write(hdr + "\n")

    from ..utils.chrom import ChrInfo

    ci = ChrInfo()
    for idx, vid in enumerate(final_ids):
        ent = master[vid]
        line = ""
        if use_map:
            line += ci.name19(ent[0]).rjust(4) + "  " \
                + str(ent[1]).rjust(10)
        line += " " + vid.rjust(14)
        if not no_allele:
            al = alleles[idx] or ("?", "")
            a1, a2 = al
            line += " " + a1.rjust(3)
            if a2:
                line += " " + a2.rjust(3)
            else:
                line += "   ?"
        n = len(data[idx])
        line += " " + str(n).rjust(3)
        if n >= 2:
            line += " " + _meta_stats(
                data[idx], output_beta, weighted_z,
                wz_num[idx], wz_den[idx])
        elif n:
            beta, se = data[idx][0]
            st = _cdiv(beta, se)
            chi = st * st
            p1 = _chiprob(chi, 1)
            line += " "
            if p1 >= 0:
                line += _g4(max(p1, 0.0), 11) + " " \
                    + _g4(max(p1, 0.0), 11) + " "
            else:
                line += "         NA          NA "
            ob = beta if output_beta else math.exp(beta)
            line += _f74(ob) + " " + _f74(ob) + " " + "     NA      NA"
            if weighted_z:
                z = wz_num[idx] / math.sqrt(wz_den[idx])
                line += " " + _g4(z, 11) + " "
                pz = 1.0 - 2 * abs(_normdist(abs(z)) - 0.5)
                line += _g4(max(pz, 0.0), 11)
        else:
            line += "          NA          NA      NA      NA      NA" \
                "      NA"
            if weighted_z:
                line += "          NA          NA"
        if report_study:
            present = {fi: k for k, fi in enumerate(files_of[idx])}
            for fi in range(file_ct):
                if fi in present:
                    v = data[idx][present[fi]][0]
                    if not output_beta:
                        v = math.exp(v)
                    line += " " + _f74(v)
                else:
                    line += "      NA"
        fh.write(line + "\n")
    fh.close()
    log.log(f"--meta-analysis: Results written to {out} .")


def _allele_match(ea1, ea2, a1, a2):
    """meta_analysis_allelic_match: 1 same-direction, 2 reversed, 0
    mismatch.  a2 is None when the current file has no A2 column."""
    if ea1 != a1:
        if a2 is not None and ea1 == a2 and ea2 == a1:
            return 2
        return 0
    if a2 is None or ea2 == a2:
        return 1
    return 0


def _chiprob(chisq, df):
    if not (chisq == chisq):
        return -9.0
    try:
        return math.exp(chisq_logsf(chisq, df))
    except (ValueError, OverflowError):
        return -9.0


def _bround4(d: float, band) -> tuple:
    """double_bround4 (1.9/plink_common.c:1571): truncate, then add the
    even/odd banker band to the fractional part."""
    m = d * 10000.0
    rem = int(m)
    rem += int((m - rem) + band[rem & 1])
    return divmod(rem, 10000)


def _f74(x: float) -> str:
    """dtoa_f_w7p4 (1.9/plink_common.c:2345): %7.4f with banker-rounding
    bands that narrow as magnitude grows; ties round half-to-even."""
    if x != x:
        return "    nan"
    d = x
    neg = ""
    if d < 9.9999499999999:
        if d < 0:
            neg = "-"
            d = -d
        if d < 9.9999499999999:
            q, r = _bround4(d, (0.4999999995, 0.5000000005))
            return (neg or " ") + f"{q}.{r:04d}"
    if d < 99999.999949999:
        if d < 999.99994999999:
            band = ((0.499999995, 0.500000005) if d < 99.999949999999
                    else (0.49999995, 0.50000005))
        elif d < 9999.9999499999:
            band = (0.4999995, 0.5000005)
        else:
            band = (0.499995, 0.500005)
        q, r = _bround4(d, band)
        return neg + f"{q}.{r:04d}"
    if d == math.inf:
        return neg + "    inf" if not neg else "-inf"
    return neg + f"{d:.4f}"


def _fp2(x: float) -> str:
    """dtoa_f_p2: %.2f (no width)."""
    if x != x:
        return "nan"
    return f"{x:.2f}"


def _meta_stats(pairs, output_beta, weighted_z, wzn, wzd) -> str:
    n = len(pairs)
    numer = denom = denom2 = 0.0
    for beta, se in pairs:
        iv = _cdiv(1.0, se * se)
        numer += iv * beta
        denom += iv
        denom2 += iv * iv
    varsum = _cdiv(1.0, denom)
    summ = numer * varsum
    meta_q = 0.0
    for beta, se in pairs:
        d = _cdiv(beta - summ, se)
        meta_q += d * d
    df = float(n - 1)
    tau2 = _cdiv(meta_q - df, denom - _cdiv(denom2, denom))
    if tau2 < 0.0:
        tau2 = 0.0
    numer_r = denom_r = 0.0
    for beta, se in pairs:
        iv = _cdiv(1.0, se * se + tau2)
        numer_r += iv * beta
        denom_r += iv
    varsum_r = _cdiv(1.0, denom_r)
    summ_r = numer_r * varsum_r
    st = _cdiv(summ, math.sqrt(varsum)) if varsum >= 0 else math.nan
    st_r = _cdiv(summ_r, math.sqrt(varsum_r)) if varsum_r >= 0 \
        else math.nan
    p1 = _chiprob(st * st, 1)
    pr = _chiprob(st_r * st_r, 1)
    pq = _chiprob(meta_q, df)
    meta_i = 100 * _cdiv(meta_q - df, meta_q)
    if meta_i < 0.0:
        meta_i = 0.0
    elif meta_i > 100:
        meta_i = 100.0
    if not output_beta:
        summ = math.exp(summ)
        summ_r = math.exp(summ_r)
    out = ""
    out += (_g4(max(p1, 0.0), 11) + " ") if p1 >= 0.0 \
        else "         NA "
    out += (_g4(max(pr, 0.0), 11) + " ") if pr >= 0.0 \
        else "         NA "
    out += _f74(summ) + " " + _f74(summ_r) + " "
    out += (_f74(max(pq, 0.0)) + " ") if pq >= 0.0 else "     NA "
    out += _fp2(meta_i).rjust(7)
    if weighted_z:
        z = wzn / math.sqrt(wzd)
        out += " " + _g4(z, 11) + " "
        pz = 1.0 - 2 * abs(_normdist(abs(z)) - 0.5)
        out += _g4(max(pz, 0.0), 11)
    return out
