"""--homozyg: run-of-homozygosity scan, PLINK 1.9 parity.

Behavior reference: calc_homozyg / roh_update / write_main_roh_reports
(1.9/plink_homozyg.c:27-670) and flag parsing (1.9/plink.c:7338-7470).

TPU-first re-design: 1.9 walks a circular 2-bit window buffer with
per-sample scalar state.  We instead decompose the scan into
 (1) vectorized window statistics -- per-chromosome cumulative sums give
     every scanning window's het/missing counts and every marker's
     overlapping-window hit count in O(M*S) numpy work, and
 (2) run decomposition -- a sample's candidate ROH are maximal runs of
     "hit" markers split at gap breaks and het-budget overflows, so the
     sequential 1.9 state machine reduces to a per-run closed form.
The 'extend' modifier's backward/forward growth and merge rules
(save_confirmed_roh_extend, 1.9/plink_homozyg.c:130-240) become a
per-sample post-pass over confirmed candidates.

Scan semantics (roh_update):
- genotype codes per marker: hom (either) / missing / het; scanning
  windows of --homozyg-window-snp markers "hit" when window het count <=
  --homozyg-window-het and missing count <= --homozyg-window-missing;
- a marker is ROH-eligible when >= hit_threshold of the windows
  containing it hit (swhit_min = floor(n*thr + 1 - EPSILON));
- ROH end triggers: eligibility lost, a het beyond --homozyg-het, or a
  position gap > --homozyg-gap; confirmation needs >= --homozyg-snp
  markers, >= --homozyg-kb bases, and density >= --homozyg-density.
- chromosomes scanned in file order; haploid chrs (Y/MT) skipped; chrX
  scanned with male samples skipped; chromosomes with fewer markers
  than the window are skipped entirely.
"""

from __future__ import annotations

import numpy as np

from ..cli import FlagError
from ..dataset import Dataset
from ..utils.chrom import MT_CODE, X_CODE, Y_CODE
from ..utils.fmt import dtoa_f_p3, dtoa_g
from ..utils.logging import RunLogger

EPSILON = 0.000000000931322574615478515625
SMALL_EPSILON = 0.00000000000005684341886080801486968994140625
SMALLISH_EPSILON = 0.00000000002910383045673370361328125


class HomozygParams:
    """Defaults per homozyg_init (1.9/plink_homozyg.c:27-40)."""

    def __init__(self, cfg):
        self.min_snp = 100
        self.min_bases = 1000000
        self.max_bases_per_snp = 50000.0 + EPSILON
        self.max_hets = 0xFFFFFFFF
        self.max_gap = 1000000
        self.window_size = 50
        self.window_max_hets = 1
        self.window_max_missing = 5
        self.hit_threshold = 0.05
        self.extend = False
        self.old_lengths = False
        self.group = False
        self.group_verbose = False
        self.consensus_match = False
        self.pool_size_min = 2
        self.overlap_min = 0.95
        mods = cfg.homozyg or ()
        for m in mods:
            if m == "extend":
                self.extend = True
            elif m == "subtract-1-from-lengths":
                self.old_lengths = True
            elif m == "group":
                if self.group_verbose:
                    raise FlagError(
                        "--homozyg 'group' and 'group-verbose' modifiers "
                        "cannot be used together.")
                self.group = True
            elif m == "group-verbose":
                if self.group:
                    raise FlagError(
                        "--homozyg 'group' and 'group-verbose' modifiers "
                        "cannot be used together.")
                self.group_verbose = True
            elif m == "consensus-match":
                self.consensus_match = True
            else:
                raise FlagError(f"Invalid --homozyg parameter '{m}'.")
        if getattr(cfg, "homozyg_match", None) is not None:
            # --homozyg-match implies group mode (1.9/plink.c:10037)
            if not 0.0 < cfg.homozyg_match <= 1.0:
                raise FlagError(
                    f"Invalid --homozyg-match parameter "
                    f"'{cfg.homozyg_match}'.")
            self.overlap_min = cfg.homozyg_match
            if not (self.group or self.group_verbose):
                self.group = True
        if getattr(cfg, "pool_size", None) is not None:
            if not (self.group or self.group_verbose):
                raise FlagError(
                    "--pool-size must be used with --homozyg "
                    "group{-verbose}.")
            if cfg.pool_size < 2:
                raise FlagError(
                    f"Invalid --pool-size parameter '{cfg.pool_size}'.")
            self.pool_size_min = cfg.pool_size
        if cfg.homozyg_snp is not None:
            if cfg.homozyg_snp < 2:
                raise FlagError(
                    f"Invalid --homozyg-snp parameter '{cfg.homozyg_snp}'.")
            self.min_snp = cfg.homozyg_snp
        if cfg.homozyg_kb is not None:
            # round up (1.9/plink.c:7386)
            self.min_bases = 1 + int(
                cfg.homozyg_kb * 1000 * (1 - SMALL_EPSILON))
        if cfg.homozyg_density is not None:
            self.max_bases_per_snp = float(
                int(cfg.homozyg_density * 1000 * (1 + SMALL_EPSILON)))
        if cfg.homozyg_gap is not None:
            self.max_gap = int(cfg.homozyg_gap * 1000 * (1 + SMALL_EPSILON))
        if cfg.homozyg_het is not None:
            self.max_hets = cfg.homozyg_het
            if self.max_hets and self.extend:
                raise FlagError(
                    "--homozyg-het with a nonzero parameter cannot be used "
                    "with --homozyg extend.")
        if cfg.homozyg_window_snp is not None:
            if cfg.homozyg_window_snp < 2:
                raise FlagError(
                    "Invalid --homozyg-window-snp parameter "
                    f"'{cfg.homozyg_window_snp}'.")
            self.window_size = cfg.homozyg_window_snp
        if cfg.homozyg_window_het is not None:
            self.window_max_hets = cfg.homozyg_window_het
        if cfg.homozyg_window_missing is not None:
            self.window_max_missing = cfg.homozyg_window_missing
        if cfg.homozyg_window_threshold is not None:
            if not 0.0 < cfg.homozyg_window_threshold <= 1.0:
                raise FlagError(
                    "Invalid --homozyg-window-threshold parameter "
                    f"'{cfg.homozyg_window_threshold}'.")
            self.hit_threshold = cfg.homozyg_window_threshold


def _fw_width(lengths, base=4):
    """Sequential width rule shared by calc_plink_maxsnp/calc_plink_maxfid
    (1.9/plink_misc.c:1771-1835): width starts at 4 and jumps to len+2
    whenever an id exceeds the current width (order-dependent)."""
    w = base
    for n in lengths:
        if n > w:
            w = n + 2
    return w


def _chrom_runs(chrom: np.ndarray):
    """Contiguous chromosome blocks in file order; errors when a code
    recurs in a later block (1.9 requires a sorted .bim)."""
    runs = []
    seen = set()
    i, m = 0, len(chrom)
    while i < m:
        j = i
        c = chrom[i]
        while j < m and chrom[j] == c:
            j += 1
        if int(c) in seen:
            raise FlagError(
                "Run-of-homozygosity scanning requires a sorted .bim.  "
                "Retry this command after using --make-bed to sort your "
                "data.")
        seen.add(int(c))
        runs.append((int(c), i, j))
        i = j
    return runs


def _window_hits(rc: np.ndarray, hp: HomozygParams):
    """Per-marker eligibility via vectorized window statistics.

    rc: [Mc, S] roh codes (0 hom / 1 missing / 2 het).
    Returns (is_hit [Mc+1, S] bool with a trailing flush row,
             chet, cmis prefix sums [Mc+1, S])."""
    mc, s_ct = rc.shape
    ws = hp.window_size
    chet = np.zeros((mc + 1, s_ct), np.int32)
    cmis = np.zeros((mc + 1, s_ct), np.int32)
    np.cumsum(rc == 2, axis=0, out=chet[1:])
    np.cumsum(rc == 1, axis=0, out=cmis[1:])
    # window starting at w covers markers [w, w+ws)
    whet = chet[ws:] - chet[:-ws]
    wmis = cmis[ws:] - cmis[:-ws]
    win_hit = (whet <= hp.window_max_hets) & (wmis <= hp.window_max_missing)
    cw = np.zeros((win_hit.shape[0] + 1, s_ct), np.int32)
    np.cumsum(win_hit, axis=0, out=cw[1:])
    last_w = mc - ws  # last window start == last main-loop cidx
    c = np.arange(mc)
    lo = np.maximum(0, c - ws + 1)
    hi = np.minimum(c, last_w)
    swhit = cw[hi + 1] - cw[lo]
    n_c = (hi - lo + 1).astype(np.float64)
    swhit_min = (n_c * hp.hit_threshold + 1.0 - EPSILON).astype(np.int32)
    is_hit = np.zeros((mc + 1, s_ct), bool)
    is_hit[:mc] = swhit >= swhit_min[:, None]
    return is_hit, chet, cmis


def _sample_candidates(hit_col, het_pos, forced, hp):
    """Candidate ROH [(start cidx, end-trigger cidx), ...] for one sample:
    maximal hit runs split at forced gap breaks, then at het-budget
    overflows (roh_update's end/start rules)."""
    mc = hit_col.size - 1
    h = hit_col  # h[mc] is the end-of-chromosome flush (False)
    brk = ~h
    brk[:mc] |= forced
    starts = np.flatnonzero(
        h[:mc] & (np.concatenate(([True], brk[: mc - 1])) | forced))
    if starts.size == 0:
        return []
    bpos = np.flatnonzero(brk)
    out = []
    k = hp.max_hets
    for a in starts:
        e = int(bpos[np.searchsorted(bpos, a, side="right")])
        if k == 0xFFFFFFFF:
            out.append((int(a), e))
            continue
        hets = het_pos[np.searchsorted(het_pos, a):
                       np.searchsorted(het_pos, e)]
        if k == 0:
            # an ROH can neither start at nor contain a het
            p = int(a)
            for hx in hets:
                if hx > p:
                    out.append((p, int(hx)))
                p = int(hx) + 1
            if p < e:
                out.append((p, e))
        else:
            # the (k+1)-th het ends the ROH and starts the next one AT
            # that het (counted into its budget)
            p = int(a)
            bi = k
            while bi < len(hets):
                out.append((p, int(hets[bi])))
                p = int(hets[bi])
                bi += k
            out.append((p, e))
    return out


def _extend_forward(ent, n_incr, pos_c, is_new, mbps):
    """roh_extend_forward (1.9/plink_homozyg.c:113): grow the entry
    [p, nsnp, hom, het] by the largest k <= n_incr trailing hom markers
    that keeps density legal."""
    sub = int(pos_c[ent[0]]) - is_new
    k = n_incr
    while k:
        if (ent[1] + k) * mbps >= float(int(pos_c[ent[0] + ent[1] + k - 1])
                                        - sub):
            ent[1] += k
            ent[2] += k
            return
        k -= 1


def _male_skip_mask(male_raw: np.ndarray, incl_raw: np.ndarray) -> np.ndarray:
    """Filtered-index mask of samples skipped as male on chrX, replicating
    the reference's buggy call
      copy_bitarr_subset_excl(sex_male, sample_exclude, sample_ct,
                              popcount_longs_exclude(...), sample_male)
    (1.9/plink_homozyg.c:2554): the raw-size argument receives the
    *filtered* sample count and the subset-size argument the *male* count,
    so the copy loop stops early and males whose write position lands in
    an unwritten (zero) word are not skipped.  Simulated bit-for-bit
    against copy_bitarr_subset_excl (1.9/plink_common.c:10204)."""
    s_filt = int(incl_raw.sum())
    words = (s_filt + 63) // 64
    lim = min(words * 64, male_raw.size)
    male_ct = int((male_raw[:lim] & incl_raw[:lim]).sum())
    out = np.zeros(s_filt, bool)
    excl = ~incl_raw
    write = 0
    item_idx = 0
    item_uidx = 0
    if not excl[:64].any() or excl.size < 1:
        bound = s_filt & ~63
        setpos = np.flatnonzero(excl[:bound])
        first_set = int(setpos[0]) if setpos.size else bound
        item_uidx = first_set & ~63
        n = min(item_uidx, out.size)
        out[:n] = male_raw[:n]
        write = item_uidx
        item_idx = item_uidx
    excl_set = np.flatnonzero(excl)
    while item_idx < male_ct:
        # next_unset_unsafe (unbounded) then next_set bounded by the bogus
        # raw-size argument (= filtered count)
        while item_uidx < male_raw.size and excl[item_uidx]:
            item_uidx += 1
        if item_uidx >= s_filt or item_uidx >= male_raw.size:
            break
        j = np.searchsorted(excl_set, item_uidx)
        stop = int(excl_set[j]) if j < excl_set.size else s_filt
        stop = min(stop, s_filt)
        item_idx += stop - item_uidx
        for u in range(item_uidx, stop):
            if write < out.size:
                out[write] = male_raw[u]
            write += 1
        item_uidx = stop
    return out


def run_homozyg(ds: Dataset, cfg, log: RunLogger) -> None:
    from ..ops.pairwise import _unpack_np

    hp = HomozygParams(cfg)
    vi, si = ds.vi, ds.si
    inc_s = np.flatnonzero(ds.sample_mask)
    vmask = ds.variant_mask
    pk = ds.all_packed()
    is_new = 0 if hp.old_lengths else 1
    mbps = hp.max_bases_per_snp

    runs = _chrom_runs(vi.chrom)
    # entry layout: [start_cidx, nsnp, hom_ct, het_ct]
    all_entries = []  # (run_i, end_cidx, s, entry, vidx_c)
    for run_i, (code, lo, hi) in enumerate(runs):
        if code in (Y_CODE, MT_CODE):
            continue
        vidx_c = np.flatnonzero(vmask[lo:hi]) + lo
        mc = vidx_c.size
        if mc < hp.window_size:
            continue
        pos_c = vi.pos[vidx_c].astype(np.int64)
        codes = _unpack_np(pk[vidx_c])[:, : ds.raw_sample_ct][:, inc_s]
        # roh codes: 0 hom / 1 missing / 2 het
        rc = np.zeros_like(codes)
        rc[codes == 3] = 1
        rc[codes == 1] = 2
        is_hit, chet, cmis = _window_hits(rc, hp)
        if code == X_CODE:
            skip = _male_skip_mask(si.sex == 1, ds.sample_mask)
            if skip.any():
                is_hit[:, skip] = False
        forced = np.zeros(mc, bool)
        forced[1:] = (pos_c[1:] - pos_c[:-1]) > hp.max_gap
        nonhom = rc != 0
        for s in np.flatnonzero(is_hit.any(axis=0)):
            cands = _sample_candidates(
                is_hit[:, s].copy(), np.flatnonzero(rc[:, s] == 2),
                forced, hp)
            if not cands:
                continue
            bad = np.flatnonzero(nonhom[:, s] | forced)
            nh = np.flatnonzero(nonhom[:, s])
            hrun = np.flatnonzero(forced)  # hom runs restart AT gap breaks
            is_bad = nonhom[:, s] | forced
            prev = None  # last saved entry, alive in the same hom string
            prev_q = -1
            gap_start = 0  # next unshielded cidx to scan for hom breaks
            ents = []
            for p, q in cands:
                nsnp = q - p
                base_len = int(pos_c[q - 1]) + is_new - int(pos_c[p])
                confirmed = (nsnp >= hp.min_snp
                             and base_len >= hp.min_bases
                             and nsnp * mbps >= float(base_len))
                if not hp.extend:
                    if confirmed:
                        het_ct = int(chet[q, s] - chet[p, s])
                        mis_ct = int(cmis[q, s] - cmis[p, s])
                        ents.append((q, s, [p, nsnp,
                                            nsnp - het_ct - mis_ct,
                                            het_ct]))
                    continue
                # ---- 'extend': save_confirmed_roh_extend semantics ----
                # the hom string carrying prev breaks at the first non-hom
                # call or gap while *outside* an ROH; in-progress ROH spans
                # shield their interiors but not their start marker
                if prev is not None:
                    bi = np.searchsorted(bad, gap_start)
                    cb = int(bad[bi]) if bi < bad.size else mc
                    if cb <= p:
                        if cb > prev_q:
                            _extend_forward(prev, cb - prev_q, pos_c,
                                            is_new, mbps)
                        prev = None
                if not confirmed:
                    if prev is not None:
                        # unconfirmed end: reset without forward extension
                        # when the trigger call is non-hom or a gap break
                        if q < mc and is_bad[q]:
                            prev = None
                        else:
                            gap_start = q
                    continue
                het_ct = int(chet[q, s] - chet[p, s])
                mis_ct = int(cmis[q, s] - cmis[p, s])
                er = None
                if prev is not None:
                    # same hom string as the previous ROH: direct merge if
                    # the density bound allows it
                    add_pos = int(pos_c[q - 1]) + is_new
                    ext = prev[1] + q - prev_q
                    if ext * mbps >= float(add_pos - int(pos_c[prev[0]])):
                        prev[2] += ext - het_ct - mis_ct - prev[1]
                        prev[3] += het_ct
                        prev[1] = ext
                        prev_q = q
                        gap_start = q
                        continue
                    _extend_forward(prev, p - prev_q, pos_c, is_new, mbps)
                    er = prev[0] + prev[1]
                if er is None:
                    if rc[p, s] != 0:
                        er = p
                    else:
                        # start of the hom-call run containing p
                        j = np.searchsorted(nh, p)
                        last_nonhom = int(nh[j - 1]) if j > 0 else -1
                        j2 = np.searchsorted(hrun, p, side="right")
                        last_forced = int(hrun[j2 - 1]) if j2 > 0 else -1
                        er = max(last_nonhom + 1, last_forced, 0)
                # backward extension: earliest start keeping density legal
                add_pos = int(pos_c[q - 1]) + is_new
                p2 = p
                while er < p:
                    if (nsnp + p - er) * mbps >= float(add_pos
                                                       - int(pos_c[er])):
                        p2 = er
                        break
                    er += 1
                nsnp2 = q - p2
                ent = [p2, nsnp2, nsnp2 - het_ct - mis_ct, het_ct]
                ents.append((q, s, ent))
                prev = ent
                prev_q = q
                gap_start = q
            if hp.extend and prev is not None:
                bi = np.searchsorted(bad, gap_start)
                cb = int(bad[bi]) if bi < bad.size else mc
                if cb < mc and cb > prev_q:
                    _extend_forward(prev, cb - prev_q, pos_c, is_new, mbps)
            for q, s2, ent in ents:
                all_entries.append((run_i, q, s2, ent, vidx_c))

    # global confirmation order: (chromosome, end cidx, sample)
    all_entries.sort(key=lambda t: (t[0], t[1], t[2]))
    log.log(f"--homozyg: Scan complete, found {len(all_entries)} ROH.")
    _write_reports(ds, cfg, hp, runs, all_entries, inc_s, log)


def _pheno_for_output(si, inc_s):
    """(pheno_nm, is_case or None, qt or None) mirroring the 1.9 single
    loaded phenotype."""
    pc = next(iter(si.phenos.values()), None)
    if pc is None:
        return np.zeros(inc_s.size, bool), None, None
    nm = pc.nonmiss[inc_s]
    if pc.kind == "cc":
        return nm, pc.data[inc_s] == 1, None
    if pc.kind == "qt":
        return nm, None, pc.data[inc_s].astype(np.float64)
    return np.zeros(inc_s.size, bool), None, None


def _write_reports(ds, cfg, hp, runs, entries, inc_s, log):
    vi, si = ds.vi, ds.si
    ci = vi.chr_info
    is_new = 0 if hp.old_lengths else 1
    fid = si.fid[inc_s]
    iid = si.iid[inc_s]
    maxfid = _fw_width(len(str(x)) for x in fid)
    maxiid = _fw_width(len(str(x)) for x in iid)
    inc_v = np.flatnonzero(ds.variant_mask)
    maxsnp = _fw_width(len(str(vi.vid[i])) for i in inc_v)

    def chrname(code):
        return ci.name19(code)

    nm, is_case, qt = _pheno_for_output(si, inc_s)
    missing_str = "-9"  # --output-missing-phenotype default
    mp3 = missing_str + ".000"

    def phe8(s):
        if not nm[s]:
            return mp3.rjust(8)
        if is_case is not None:
            return ("2" if is_case[s] else "1").rjust(8)
        return dtoa_f_p3(qt[s]).rjust(8)

    def phe4(s):
        if not nm[s]:
            return missing_str.rjust(4)
        if is_case is not None:
            return ("2" if is_case[s] else "1").rjust(4)
        return dtoa_g(qt[s]).rjust(4)

    # per-sample grouping, preserving global confirmation order
    per_sample = [[] for _ in range(inc_s.size)]
    for run_i, q, s, ent, vidx_c in entries:
        per_sample[s].append((run_i, ent, vidx_c))

    hom_path = cfg.out + ".hom"
    ind_path = cfg.out + ".hom.indiv"
    with open(hom_path, "w") as fh, open(ind_path, "w") as fi:
        fh.write(
            f"{'FID':>{maxfid}} {'IID':>{maxiid}}      PHE  CHR "
            f"{'SNP1':>{maxsnp}} {'SNP2':>{maxsnp}}         POS1"
            "         POS2         KB     NSNP  DENSITY     PHOM"
            "     PHET\n")
        fi.write(f"{'FID':>{maxfid}} {'IID':>{maxiid}}  PHE     NSEG"
                 "       KB    KBAVG\n")
        for s in range(inc_s.size):
            kb_tot = 0.0
            n_roh = len(per_sample[s])
            for run_i, ent, vidx_c in per_sample[s]:
                p, nsnp, hom_ct, het_ct = ent
                u1 = int(vidx_c[p])
                u2 = int(vidx_c[p + nsnp - 1])
                code = runs[run_i][0]
                dxx = (float(int(vi.pos[u2]) + is_new - int(vi.pos[u1]))
                       / (1000.0 - EPSILON))
                kb_tot += dxx
                dyy = (1.0 + SMALLISH_EPSILON) / float(nsnp)
                fh.write(
                    f"{fid[s]:>{maxfid}} {iid[s]:>{maxiid}} {phe8(s)} "
                    f"{chrname(code):>4} {vi.vid[u1]:>{maxsnp}} "
                    f"{vi.vid[u2]:>{maxsnp}}   {vi.pos[u1]:>10}   "
                    f"{vi.pos[u2]:>10} {dtoa_f_p3(dxx):>10} "
                    f"{nsnp:>8} {dtoa_f_p3(dxx * dyy):>8}    "
                    f"{dtoa_f_p3(hom_ct * dyy)}    "
                    f"{dtoa_f_p3(het_ct * dyy)}\n")
            avg = kb_tot / n_roh if n_roh else kb_tot
            trail = " " if n_roh else ""
            fi.write(
                f"{fid[s]:>{maxfid}} {iid[s]:>{maxiid}} {phe4(s)} "
                f"{n_roh:>8} {dtoa_g(kb_tot):>8} "
                f"{dtoa_g(avg):>8}{trail}\n")

    # .hom.summary: every loaded marker with overlapping-ROH counts
    by_run = {}
    for run_i, q, s, ent, vidx_c in entries:
        by_run.setdefault(run_i, []).append((s, ent, vidx_c))
    sum_path = cfg.out + ".hom.summary"
    max_pool_size = 0
    with open(sum_path, "w") as fo:
        fo.write(f" CHR {'SNP':>{maxsnp}}           BP      AFF    UNAFF\n")
        for run_i, (code, lo, hi) in enumerate(runs):
            ln = hi - lo
            aff_adj = np.zeros(ln + 1, np.int64)
            un_adj = np.zeros(ln + 1, np.int64)
            for s, ent, vidx_c in by_run.get(run_i, ()):
                u1 = int(vidx_c[ent[0]]) - lo
                u2 = int(vidx_c[ent[0] + ent[1] - 1]) - lo
                tgt = aff_adj if (is_case is not None and nm[s]
                                  and is_case[s]) else un_adj
                tgt[u1] += 1
                tgt[u2 + 1] -= 1
            aff = np.cumsum(aff_adj[:ln])
            un = np.cumsum(un_adj[:ln])
            nm4 = chrname(code).rjust(4)
            for k2 in range(ln):
                u = lo + k2
                if not ds.variant_mask[u]:
                    continue
                tot = int(aff[k2]) + int(un[k2])
                if tot > max_pool_size:
                    max_pool_size = tot
                fo.write(
                    f"{nm4} {vi.vid[u]:>{maxsnp}}   {vi.pos[u]:>10} "
                    f"{aff[k2]:>8} {un[k2]:>8}\n")
    log.log(
        f"Results saved to {hom_path} + {ind_path} + {sum_path} .")
    if hp.group or hp.group_verbose:
        if max_pool_size > 65536:
            raise FlagError(
                "--homozyg group{-verbose} does not support more than "
                "65536 overlapping ROH at a single marker.")
        from .homozyg_pool import write_pool_reports

        write_pool_reports(ds, cfg, hp, runs, entries, inc_s,
                           max_pool_size, log, fid, iid, maxfid, maxiid,
                           maxsnp, nm, is_case, qt)
