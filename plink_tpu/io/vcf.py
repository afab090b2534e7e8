"""VCF importer.

Behavior reference: VcfToPgen (2.0/plink2_import.cc:2768), a two-pass
converter.  Here a single streaming pass suffices: variant metadata and
packed genotype rows are accumulated block-wise (the .pgen writer appends
as we go, so memory stays bounded by one block).

Supported: plain and gzip/BGZF-compressed VCF, GT hard-calls (phased '|' or
unphased '/' separators), biallelic and multiallelic sites (ALT codes > 1
currently collapse to missing, matching a hard-call-only biallelic engine),
missing calls './.', --vcf-half-call modes, dosage import from DS / GP /
HDS FORMAT fields (16384-scale) with the reference's exact
--hard-call-threshold / --dosage-erase-threshold / --import-dosage-certainty
semantics (ParseVcfBiallelicDosage 2.0/plink2_import.cc:975,
ParseVcfBiallelicGp :932, ParseVcfBiallelicHds :1035, ApplyHardCallThresh
2.0/plink2_data.cc:3331), and --vcf-min-gq / --vcf-min-dp / --vcf-max-dp
per-call filters (VcfCheckQuals 2.0/plink2_import.cc:900).

Deviation: explicit phased-dosage (dphase) tracks are not stored; HDS
import keeps the combined dosage + hardcall phase only.
"""

from __future__ import annotations

import gzip
import os

import numpy as np

from .psam import PhenoCol, SampleInfo
from .pvar import VariantInfo
from ..utils.chrom import ChrInfo

_GT_MAP: dict = {}

# --import-dosage-certainty is pre-multiplied by (1 - kSmallEpsilon) at CLI
# parse time (2.0/plink2.cc:7372, kSmallEpsilon = 2^-44)
_SMALL_EPS = 2.0 ** -44
# default import hard-call threshold: kDosageMid/10 (2.0/plink2.cc:7377)
DEFAULT_IMPORT_HARD_CALL_THRESH = 16384 // 10


def _open_text(path: str):
    """mt-BGZF / decompress-ahead reader (see io/compress.py)."""
    from .compress import open_text_auto

    return open_text_auto(path)


def _parse_gt(tok: str, halfcall: int = 2) -> int:
    """GT token -> pgen code (0/1/2 ALT count, 3 missing).

    halfcall: 0=reference, 1=haploid, 2=missing, 3=error
    (VcfHalfCall, 2.0/plink2_import.h:30; the 'x/.' geno <<= mode trick is
    2.0/plink2_import.cc:1367)."""
    key = (tok, halfcall)
    code = _GT_MAP.get(key)
    if code is not None:
        return code
    a = tok.replace("|", "/").split(":", 1)[0].split("/")
    alleles = []
    half = False
    for s in a:
        if s == "." or s == "":
            half = True
            continue
        alleles.append(int(s))
    if half and alleles and len(a) > 1:
        # half-call like '1/.' (one known allele)
        if any(x > 1 for x in alleles):
            code = 3
        elif halfcall == 3:
            raise ValueError(
                "VCF half-call present; use --vcf-half-call to specify "
                "how these should be processed."
            )
        elif halfcall == 2:
            code = 3
        else:
            code = alleles[0] << halfcall
    elif not alleles:
        code = 3
    elif any(x > 1 for x in alleles):
        code = 3  # multiallelic ALT>1: treated as missing for now
    elif len(alleles) == 1:
        code = 2 if alleles[0] == 1 else 0  # haploid -> homozygous
    else:
        code = alleles[0] + alleles[1]
    _GT_MAP[key] = code
    return code


def _parse_gt_ma(tok: str, halfcall: int = 2):
    """Multiallelic GT parse -> (base_code, lo, hi, phased_het, swapped)
    with 0=REF, k=ALTk and lo <= hi; missing = (3, -1, -1, False, False).
    Base code follows the pgen patch convention (1 = REF-ALTx,
    2 = ALTx-ALTy; pgen_spec.tex:469-479).  phased_het is True for '|'-
    separated heterozygous calls; swapped = first allele index > second
    (pgen_spec.tex:556-560)."""
    gt = tok.split(":", 1)[0]
    phased = "|" in gt
    a = gt.replace("|", "/").split("/")
    alleles = []
    half = False
    for s in a:
        if s == "." or s == "":
            half = True
            continue
        alleles.append(int(s))
    if half and alleles and len(a) > 1:
        if halfcall == 3:
            raise ValueError(
                "VCF half-call present; use --vcf-half-call to specify "
                "how these should be processed."
            )
        if halfcall == 2:
            return 3, -1, -1, False, False
        if halfcall == 0:  # treat as REF for the unknown allele
            alleles = [0, alleles[0]]
        else:  # haploid
            alleles = [alleles[0], alleles[0]]
    if not alleles:
        return 3, -1, -1, False, False
    if len(alleles) == 1:
        alleles = [alleles[0], alleles[0]]
    het = alleles[0] != alleles[1]
    phased_het = phased and het
    swapped = phased_het and alleles[0] > alleles[1]
    lo, hi = min(alleles), max(alleles)
    if hi == 0:
        return 0, 0, 0, False, False
    if lo == 0:
        return 1, lo, hi, phased_het, swapped
    return 2, lo, hi, phased_het, swapped


def _parse_gt_ma_row(tokens, halfcall: int, with_phase: bool = False):
    """One multiallelic variant row -> (codes [N] uint8, patches tuple[,
    (phasepresent [N] bool, phaseinfo-swapped [N] bool)])."""
    n = len(tokens)
    codes = np.empty(n, np.uint8)
    ids01, a01, ids10, lo10, hi10 = [], [], [], [], []
    pp = np.zeros(n, bool) if with_phase else None
    pi = np.zeros(n, bool) if with_phase else None
    for i, g in enumerate(tokens):
        c, lo, hi, phased_het, swapped = _parse_gt_ma(g, halfcall)
        codes[i] = c
        if with_phase and phased_het:
            pp[i] = True
            pi[i] = swapped
        if c == 1 and hi >= 2:
            ids01.append(i)
            a01.append(hi)
        elif c == 2 and (lo != 1 or hi != 1):
            ids10.append(i)
            lo10.append(lo)
            hi10.append(hi)
    patches = (
        np.array(ids01, np.int64), np.array(a01, np.int64),
        np.array(ids10, np.int64), np.array(lo10, np.int64),
        np.array(hi10, np.int64),
    )
    if with_phase:
        return codes, patches, (pp, pi)
    return codes, patches


def _parse_dosage(parts, ds_idx, hds_idx, is_haploid, is_gp, certainty):
    """Returns (status, dosage_int, dphase_delta, hds_valid) with status
    'ok'/'missing'/'fm' (force-missing via --import-dosage-certainty).

    Mirrors ParseVcfBiallelicHds/Dosage/Gp (2.0/plink2_import.cc:932-1110);
    dosage_int is on the 16384-per-allele-copy scale; dphase_delta is
    16384 * (left - right haplotype dosage) when HDS carried two values."""
    if hds_idx is not None and len(parts) > hds_idx:
        tok = parts[hds_idx]
        if tok and tok[0] != "?" and not (
            tok[0] == "." and (len(tok) < 2 or not tok[1].isdigit())
        ):
            vals = tok.split(",")
            if len(vals) > 2:
                return "fm", 0, 0, 0  # polyploid -> force-missing
            d1 = float(vals[0])
            if not 0.0 <= d1 <= 1.0:
                raise ValueError(f"invalid HDS value {tok!r}")
            if len(vals) == 1:
                if certainty != 0.0 and (1.0 - d1 <= certainty) and (
                    d1 <= certainty
                ):
                    return "fm", 0, 0, 1
                return "ok", int(d1 * 32768 + 0.5), 0, 1
            d2 = float(vals[1])
            if not 0.0 <= d2 <= 1.0:
                raise ValueError(f"invalid HDS value {tok!r}")
            s = d1 + d2
            if certainty != 0.0:
                dist = abs(1.0 - s)
                if (1.0 - dist <= certainty) and (dist <= certainty):
                    return "fm", 0, 0, 1
            # delta forced through nonnegative space: int() truncates
            # toward zero (ParseVcfBiallelicHds, 2.0/plink2_import.cc:1095)
            delta = int((1.0 + d1 - d2) * 16384 + 0.5) - 16384
            return "ok", int(s * 16384 + 0.5), delta, 1
        if ds_idx is None:
            return "missing", 0, 0, 0
    if ds_idx is None or len(parts) <= ds_idx:
        return "missing", 0, 0, 0
    tok = parts[ds_idx]
    if not tok or tok[0] == "?" or (
        tok[0] == "." and (len(tok) < 2 or not tok[1].isdigit())
    ):
        return "missing", 0, 0, 0
    if is_gp:
        vals = [float(x) for x in tok.split(",")]
        if any(not 0.0 <= v <= 1.0 for v in vals[: 3 if not is_haploid else 2]):
            raise ValueError(f"invalid GP value {tok!r}")
        if is_haploid:
            if len(vals) < 2:
                raise ValueError(f"invalid GP value {tok!r}")
            p0, p1 = vals[0], vals[1]
            denom = p0 + p1
            if denom <= 2 * certainty and p0 <= certainty and p1 <= certainty:
                return "fm", 0, 0, 0
            ds = 2 * p1 / denom
        else:
            if len(vals) < 3:
                raise ValueError(f"invalid GP value {tok!r}")
            p0, p1, p2 = vals[0], vals[1], vals[2]
            denom = p0 + p1 + p2
            if denom <= 3 * certainty and p0 <= certainty and \
                    p1 <= certainty and p2 <= certainty:
                return "fm", 0, 0, 0
            ds = (p1 + 2 * p2) / denom
    else:
        ds = float(tok.split(",", 1)[0])
        if ds < 0.0:
            raise ValueError(f"invalid DS value {tok!r}")
        if is_haploid:
            if certainty != 0.0 and (1.0 - ds <= certainty) and (
                ds <= certainty
            ):
                return "fm", 0, 0, 0
            ds *= 2
        elif certainty != 0.0:
            dist = abs(1.0 - ds)
            if (1.0 - dist <= certainty) and (dist <= certainty):
                return "fm", 0, 0, 0
        if ds > 2.0:
            raise ValueError(f"invalid DS value {tok!r} (> 2.0)")
    return "ok", int(ds * 16384 + 0.5), 0, 0


def read_vcf(path: str, chr_info: ChrInfo | None = None,
             dosage_field: str | None = None, with_phase: bool = False,
             hard_call_thresh: int | None = None,
             dosage_erase_thresh: int = 0,
             import_dosage_certainty: float = 0.0,
             min_gq: int | None = None, min_dp: int | None = None,
             max_dp: int | None = None, halfcall_mode: int = 2):
    """Parse a VCF into (VariantInfo, SampleInfo, codes uint8 [M, N][,
    dosage rows]).  With dosage_field ("DS", "GP", or "HDS"), also returns a
    list of (dosage_ids, dosage_vals) per variant (None when the variant has
    no dosage entries).  Thresholds are on the 16384 scale; hard_call_thresh
    None uses the reference's import default (kDosageMid/10)."""
    ci = chr_info or ChrInfo()
    chroms, poss, vids, refs, alts, quals, filts, infos = (
        [], [], [], [], [], [], [], []
    )
    rows = []
    ma_rows: dict = {}
    info_pr_exists = False
    nonref_list: list[bool] = []
    dosage_rows: list = []
    phase_rows: list = []
    sample_ids: list[str] = []
    header_lines: list[str] = []
    is_gp = dosage_field == "GP"
    want_hds = dosage_field == "HDS"
    if hard_call_thresh is None:
        hard_call_thresh = DEFAULT_IMPORT_HARD_CALL_THRESH
    hc_halfdist = 8192 - hard_call_thresh
    erase_halfdist = 8192 - dosage_erase_thresh
    certainty = import_dosage_certainty * (1.0 - _SMALL_EPS)
    qual_filter = (min_gq is not None) or (min_dp is not None) or (
        max_dp is not None
    )
    # hot-loop acceleration: batch the raw GT regions (everything after the
    # 9th tab, NOT tokenized in Python) through the threaded C++ scanner
    # (native vcf_parse_gt_rows, role of the reference's
    # VcfGenoToPgenThread GT loop, 2.0/plink2_import.cc:1712+)
    use_fast = dosage_field is None and not qual_filter
    nlib = None
    if use_fast:
        from ..native import get_lib

        nlib = get_lib()
    batch_t9: list[bytes] = []
    batch_rowidx: list[int] = []
    spans: list = []  # (row0, [nb, N] uint8) contiguous fast-path blocks
    nthr = min(8, os.cpu_count() or 1)
    # the C++ GT scanner releases the GIL, so batches parse on a background
    # worker while the main thread keeps draining the BGZF decompress-ahead
    # stream (the reference overlaps these the same way: VcfGenoToPgenThread
    # workers behind the TextStream reader, 2.0/plink2_import.cc:72-89)
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    parse_pool = ThreadPoolExecutor(max_workers=1)
    parse_futures: deque = deque()

    def _flush_batch():
        if not batch_t9:
            return
        job_t9 = list(batch_t9)
        job_rowidx = list(batch_rowidx)
        batch_t9.clear()
        batch_rowidx.clear()
        parse_futures.append(
            parse_pool.submit(_parse_batch, job_t9, job_rowidx))
        while len(parse_futures) > 2:  # bound in-flight text buffers
            parse_futures.popleft().result()

    def _drain_parses():
        while parse_futures:
            parse_futures.popleft().result()
        parse_pool.shutdown()

    def _parse_batch(batch_t9, batch_rowidx):
        import ctypes

        if not batch_t9:
            return
        nb = len(batch_t9)
        ns_ = len(sample_ids)
        offs = np.zeros(nb + 1, np.int64)
        for i, b_ in enumerate(batch_t9):
            offs[i + 1] = offs[i] + len(b_) + 1
        buf = b"\n".join(batch_t9) + b"\n"
        out = np.empty((nb, ns_), np.uint8)
        status = np.zeros(nb, np.uint8)
        if with_phase:
            pha = np.zeros((nb, ns_), np.uint8)
            swp = np.zeros((nb, ns_), np.uint8)
            pha_p = pha.ctypes.data_as(ctypes.c_void_p)
            swp_p = swp.ctypes.data_as(ctypes.c_void_p)
        else:
            pha = swp = None
            pha_p = swp_p = None
        nlib.vcf_parse_gt_rows(
            buf, offs.ctypes.data_as(ctypes.c_void_p), nb, ns_,
            halfcall_mode, out.ctypes.data_as(ctypes.c_void_p),
            status.ctypes.data_as(ctypes.c_void_p), pha_p, swp_p, nthr,
        )
        if (not with_phase and not status.any()
                and batch_rowidx[-1] - batch_rowidx[0] == nb - 1):
            # contiguous clean batch: final assembly is one memcpy
            spans.append((batch_rowidx[0], out))
            return
        for i in range(nb):
            ri = batch_rowidx[i]
            if status[i] == 0:
                rows[ri] = out[i]
                if with_phase:
                    phase_rows[ri] = (pha[i].astype(bool),
                                      swp[i].astype(bool))
            else:
                # odd row (or half-call in 'error' mode): the scalar parser
                # reproduces exact behavior including the ValueError
                toks_ = batch_t9[i].decode().split("\t")
                rows[ri] = np.fromiter(
                    (_parse_gt(g, halfcall_mode) for g in toks_),
                    dtype=np.uint8, count=len(toks_),
                )
                if with_phase:
                    pp = np.zeros(len(toks_), bool)
                    pi = np.zeros(len(toks_), bool)
                    for s_i, g in enumerate(toks_):
                        gt = g.split(":", 1)[0]
                        if "|" in gt:
                            a = gt.split("|")
                            if (a[0] in ("0", "1") and a[1] in ("0", "1")
                                    and a[0] != a[1]):
                                pp[s_i] = True
                                pi[s_i] = a[0] == "1"
                    phase_rows[ri] = (pp, pi)

    from .compress import open_binary_auto

    with open_binary_auto(path) as f:
        for bline in f:
            bline = bline.rstrip(b"\n")
            if not bline:
                continue
            if bline.startswith(b"##"):
                # carry contig lines through to the .pvar header like the
                # reference's converter
                if bline.startswith(b"##contig="):
                    header_lines.append(bline.decode())
                elif bline.startswith(b"##INFO=<ID=PR,"):
                    # provisional-REF Flag key: converted to pgen
                    # nonref_flags, not kept as INFO (ref info_pr_exists,
                    # 2.0/plink2_import.cc:3012-3024)
                    if b"Type=Flag" in bline:
                        info_pr_exists = True
                continue
            if bline.startswith(b"#CHROM"):
                toks = bline.decode().split("\t")
                sample_ids = toks[9:]
                continue
            t = bline.split(b"\t", 9)
            if len(t) < 10:
                raise ValueError(
                    f"VCF data line with <10 columns: {bline[:80].decode(errors='replace')}")
            gt_exists = t[8] == b"GT" or t[8].startswith(b"GT:")
            if not gt_exists and dosage_field is None:
                raise ValueError("VCF FORMAT must lead with GT")
            chroms.append(ci.code(t[0].decode()))
            poss.append(int(t[1]))
            vids.append(t[2].decode())
            refs.append(t[3].decode())
            alts.append(t[4].decode())
            quals.append(None if t[5] == b"." else t[5].decode())
            filts.append(None if t[6] == b"." else t[6].decode())
            inf = t[7].decode()
            if info_pr_exists:
                toks_i = inf.split(";") if inf != "." else []
                if "PR" in toks_i:
                    nonref_list.append(True)
                    toks_i = [x for x in toks_i if x != "PR"]
                    inf = ";".join(toks_i) if toks_i else "."
                else:
                    nonref_list.append(False)
            infos.append(None if inf == "." else inf)
            is_ma = b"," in t[4]
            if is_ma and gt_exists:
                if with_phase:
                    codes, patches, ph = _parse_gt_ma_row(
                        t[9].decode().split("\t"), halfcall_mode, True)
                else:
                    codes, patches = _parse_gt_ma_row(
                        t[9].decode().split("\t"), halfcall_mode)
                    ph = None
                rows.append(codes)
                ma_rows[len(rows) - 1] = patches
                if dosage_field is not None:
                    dosage_rows.append(None)
                if with_phase:
                    phase_rows.append(ph)
                continue
            if use_fast and nlib is not None and sample_ids:
                rows.append(None)
                if with_phase:
                    phase_rows.append(None)
                batch_rowidx.append(len(rows) - 1)
                batch_t9.append(t[9])
                if len(batch_t9) >= 4096:
                    _flush_batch()
                continue
            fmt = t[8].decode().split(":")
            toks9 = t[9].decode().split("\t")
            ns = len(toks9)
            if dosage_field is None and not qual_filter:
                rows.append(np.fromiter(
                    (_parse_gt(g, halfcall_mode) for g in toks9),
                    dtype=np.uint8, count=ns,
                ))
            else:
                gq_idx = fmt.index("GQ") if (
                    min_gq is not None and "GQ" in fmt) else None
                dp_idx = fmt.index("DP") if (
                    (min_dp is not None or max_dp is not None)
                    and "DP" in fmt) else None
                ds_idx = fmt.index(
                    "DS" if want_hds else dosage_field
                ) if dosage_field and (
                    "DS" if want_hds else dosage_field) in fmt else None
                hds_idx = fmt.index("HDS") if (
                    want_hds and "HDS" in fmt) else None
                geno = np.full(ns, 3, np.uint8)
                dids, dvals = [], []
                dpids, dpdeltas = [], []
                pp_d = np.zeros(ns, bool)
                pi_d = np.zeros(ns, bool)
                # dphase erase threshold is stricter by a quarter-dosage
                # (VcfConvertPhasedBiallelicDosageLine,
                # 2.0/plink2_import.cc:1235)
                dphase_erase_halfdist = erase_halfdist + 8192
                for s_i, g in enumerate(toks9):
                    parts = g.split(":")
                    if gq_idx is not None and len(parts) > gq_idx:
                        try:
                            if int(parts[gq_idx]) < min_gq:
                                continue  # whole call filtered -> missing
                        except ValueError:
                            pass
                    if dp_idx is not None and len(parts) > dp_idx:
                        try:
                            dp = int(parts[dp_idx])
                            if (min_dp is not None and dp < min_dp) or (
                                max_dp is not None and dp > max_dp
                            ):
                                continue
                        except ValueError:
                            pass
                    gt = parts[0] if gt_exists else ""
                    is_hap = gt_exists and (
                        len(gt) < 2 or gt[1] not in "/|"
                    )
                    if dosage_field is not None:
                        st, dosage_int, delta, hds_valid = _parse_dosage(
                            parts, ds_idx, hds_idx, is_hap, is_gp, certainty
                        )
                    else:
                        st, dosage_int, delta, hds_valid = "missing", 0, 0, 0
                    if st == "fm":
                        continue  # force-missing: GT ignored
                    if st == "ok" and hds_valid:
                        # HDS present: hardcall + phase derived purely from
                        # the (possibly phased) dosage; GT is skipped
                        # (goto geno_done, 2.0/plink2_import.cc:1284-1312 +
                        # ApplyHardCallThreshPhased, plink2_data.cc:3377)
                        hd1 = abs(dosage_int + delta - 16384)
                        hd2 = abs(dosage_int - delta - 16384)
                        if hd1 < dphase_erase_halfdist or \
                                hd2 < dphase_erase_halfdist:
                            dids.append(s_i)
                            dvals.append(dosage_int)
                            halfdist = abs((dosage_int & 16383) - 8192)
                            g_code = 3 if halfdist < hc_halfdist else (
                                (dosage_int + 8192) >> 14
                            )
                            if delta != 0:
                                keep_dphase = True
                                if g_code == 1 and abs(delta) > 8192:
                                    pp_d[s_i] = True
                                    pi_d[s_i] = delta > 0
                                    if abs(delta) == dosage_int or \
                                            abs(delta) + dosage_int == 32768:
                                        # maximal delta: hardcall-phase
                                        # already encodes it (implicit form)
                                        keep_dphase = False
                                if keep_dphase:
                                    dpids.append(s_i)
                                    dpdeltas.append(delta)
                        else:
                            # both haplotype dosages are (near-)integer:
                            # synthesize hardcall, keep phase on hets
                            g_code = (dosage_int + 8192) >> 14
                            if g_code == 1:
                                pp_d[s_i] = True
                                pi_d[s_i] = delta > 0
                        geno[s_i] = g_code
                        continue
                    g_code = _parse_gt(gt, halfcall_mode) if gt_exists else 3
                    gt_phased_het = (
                        gt_exists and g_code == 1 and "|" in gt
                    )
                    if st == "ok":
                        halfdist = abs((dosage_int & 16383) - 8192)
                        if halfdist < erase_halfdist:
                            dids.append(s_i)
                            dvals.append(dosage_int)
                            new_g = 3 if halfdist < hc_halfdist else (
                                (dosage_int + 8192) >> 14
                            )
                            if gt_phased_het:
                                if new_g == 1:
                                    pp_d[s_i] = True
                                    pi_d[s_i] = gt[0] == "1"
                                else:
                                    # het hardcall overridden by the dosage:
                                    # GT phase becomes an explicit dphase
                                    # (ApplyHardCallThreshPhased,
                                    # plink2_data.cc:3436-3448)
                                    homdist = (
                                        32768 - dosage_int
                                        if dosage_int > 16384 else dosage_int
                                    )
                                    dpids.append(s_i)
                                    dpdeltas.append(
                                        homdist if gt[0] == "1" else -homdist
                                    )
                            g_code = new_g
                        else:
                            new_g = (dosage_int + 8192) >> 14
                            if gt_phased_het:
                                if new_g != 1:
                                    pass  # hardcall-phase no longer applies
                                else:
                                    pp_d[s_i] = True
                                    pi_d[s_i] = gt[0] == "1"
                                    if halfdist * 2 < dphase_erase_halfdist:
                                        # implicit phased-dosage edge case
                                        # (e.g. 0|0.99): store dosage anyway
                                        dids.append(s_i)
                                        dvals.append(dosage_int)
                            g_code = new_g
                    elif gt_phased_het:
                        pp_d[s_i] = True
                        pi_d[s_i] = gt[0] == "1"
                    geno[s_i] = g_code
                rows.append(geno)
                if dosage_field is not None:
                    dosage_rows.append(
                        (np.array(dids, np.uint32), np.array(dvals, "<u2"),
                         np.array(dpids, np.uint32),
                         np.array(dpdeltas, "<i2"),
                         pp_d, pi_d)
                        if (dids or pp_d.any()) else None
                    )
            if with_phase:
                pp = np.zeros(ns, bool)
                pi = np.zeros(ns, bool)
                for s_i, g in enumerate(toks9):
                    gt = g.split(":", 1)[0]
                    if "|" in gt:
                        a = gt.split("|")
                        if a[0] in ("0", "1") and a[1] in ("0", "1") and a[0] != a[1]:
                            pp[s_i] = True
                            pi[s_i] = a[0] == "1"  # "1|0" = swapped
                phase_rows.append((pp, pi))
        _flush_batch()
    _drain_parses()
    M, N = len(rows), len(sample_ids)
    codes = np.empty((M, N), dtype=np.uint8)
    for r0, blk in spans:
        codes[r0 : r0 + blk.shape[0]] = blk
    for ri, r in enumerate(rows):
        if r is not None:
            codes[ri] = r
    vi = VariantInfo(
        chrom=np.array(chroms, dtype=np.int16),
        pos=np.array(poss, dtype=np.int32),
        vid=np.array(vids, dtype=object),
        ref=np.array(refs, dtype=object),
        alt=np.array(alts, dtype=object),
        qual=np.array(quals, dtype=object),
        filt=np.array(filts, dtype=object),
        info=np.array(infos, dtype=object),
        header_lines=header_lines,
        chr_info=ci,
        nonref=np.array(nonref_list, bool) if info_pr_exists else None,
    )
    # sample IDs: plink2 splits FID_IID on '_' with --id-delim; default is
    # double-id off -> IID only (#IID psam)
    n = len(sample_ids)
    si = SampleInfo(
        fid=np.full(n, "0", dtype=object),
        iid=np.array(sample_ids, dtype=object),
        sid=None,
        pat=None,
        mat=None,
        sex=np.zeros(n, dtype=np.int8),
        phenos={},
        has_fid=False,
    )
    out = [vi, si, codes]
    if dosage_field is not None:
        out.append(dosage_rows)
    if with_phase:
        out.append(phase_rows)
    out.append(ma_rows)  # {row_idx: patch tuple} for multiallelic variants
    return tuple(out)
