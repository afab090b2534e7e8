"""--homozyg group / group-verbose / consensus-match: ROH pool reports.

Behavior reference: roh_pool + helpers (1.9/plink_homozyg.c:1335-2430),
pool sweep :1494-1600, allelic matching :914-1321, report writers
:1935-2385, dispatch in calc_homozyg (:2680-2715).

TPU-first re-design notes: the reference streams the .bed through a
circular lookahead buffer and caches pairwise match bits across pools in
a triangular bitfield.  We already hold the decoded genotype matrix, so
 (1) maximal pools fall out of a per-chromosome reverse interval sweep
     (the same heap-of-starts algorithm, minus the storage gymnastics);
 (2) each pool's pairwise allelic-match matrix is a vectorized popcount
     over numpy slices -- the reference's cross-pool cache is purely an
     optimization (group-mode overlap windows depend only on the pair),
     so recomputing per pool is semantics-preserving;
 (3) word-granularity quirks of is_allelic_match are replicated for
     consensus-match mode, where the SSE2 loop counts whole 32-genotype
     words around the consensus region ([64*floor(cs/64),
     32*ceil(ce/32)) in chromosome marker-index space).  The one
     deviation: when the reference's word count satisfies
     words_left % 12 == 11 its vector loop reads one extra word of
     *stale slot memory* past the buffered ROH (plink_homozyg.c:956);
     we treat that word as padding instead of replaying heap garbage.
"""

from __future__ import annotations

import numpy as np

from ..utils.fmt import dtoa_g_wxp2, dtoa_g_wxp4, dtoa_g_wxp8
from .assoc19 import _g4 as dtoa_g_wxp4

CONSUMED = 0xFFFFFFFF


def find_pools(rohs_by_run, pool_size_min):
    """Maximal overlapping-ROH pools, one chromosome at a time.

    rohs_by_run: {run_i: [(start_cidx, last_cidx, global_roh_idx), ...]}
    in roh_list order (ascending end).  Mirrors the reverse sweep at
    1.9/plink_homozyg.c:1494-1600: scanning ROH by descending last
    marker, a max-heap of start positions tracks the active set; a
    maximal pool is emitted at every ROH-start boundary that was
    preceded by an ROH end ("fresh_meat").  Returns a list of
    (run_i, emission_seq, [member indices into rohs_by_run[run_i]]),
    with emission over (descending run, descending position).
    """
    import heapq

    pools = []
    seq = 0
    for run_i in sorted(rohs_by_run, reverse=True):
        rohs = rohs_by_run[run_i]
        n = len(rohs)
        if not n:
            continue
        heap = []  # (-start, local idx); max start on top
        active = set()
        fresh = False
        idx = n  # next to consume is idx-1
        marker2 = 0  # max active start (0 when heap empty)
        marker1 = rohs[n - 1][1]  # end of next ROH to consume
        while idx > 0 or heap:
            if marker2 <= marker1 and idx > 0:
                idx -= 1
                start, _last, _g = rohs[idx]
                if heap or (idx > 0 and rohs[idx - 1][1] >= start):
                    heapq.heappush(heap, (-start, idx))
                    active.add(idx)
                    marker2 = -heap[0][0]
                    fresh = True
                marker1 = rohs[idx - 1][1] if idx > 0 else 0
            else:
                if fresh:
                    if len(active) >= pool_size_min:
                        pools.append((run_i, seq, sorted(active)))
                        seq += 1
                    fresh = False
                # remove every active ROH sharing the max start
                top = -heap[0][0]
                while heap and -heap[0][0] == top:
                    _, j = heapq.heappop(heap)
                    active.discard(j)
                marker2 = -heap[0][0] if heap else 0
        # heap drained; marker2 is 0 again for the next chromosome
    return pools


def _pair_counts(hom, val, si, sj, a, b):
    """(joint hom ct, joint mismatch ct) over marker cidx [a, b)."""
    jm = hom[a:b, si] & hom[a:b, sj]
    mm = jm & (val[a:b, si] != val[a:b, sj])
    return int(jm.sum()), int(mm.sum())


def compute_pool_groups(members, hom, val, mc, mismatch_max,
                        consensus_match):
    """NSIM counts + allelic-match group assignment for one pool.

    members: [(start_cidx, last_cidx, sample_idx), ...] sorted by
    ascending sample (the reference's roh_slot_map order).  Port of
    compute_allelic_match_matrix + assign_allelic_match_groups
    (1.9/plink_homozyg.c:1137-1321)."""
    p = len(members)
    con_s = max(m[0] for m in members)
    con_e = min(m[1] for m in members) + 1
    match = np.zeros((p, p), bool)
    for i in range(1, p):
        s_i, l_i, samp_i = members[i]
        for j in range(i):
            s_j, l_j, samp_j = members[j]
            if consensus_match:
                # whole-word scan around the consensus region; het
                # padding outside each ROH zeroes the extra columns
                w0 = (con_s // 64) * 64
                w1 = min(-(-con_e // 32) * 32, mc)
                a = max(w0, s_i, s_j)
                b = min(w1, l_i + 1, l_j + 1)
            else:
                a = max(s_i, s_j)
                b = min(l_i, l_j) + 1
            if b <= a:
                jh, mm = 0, 0
            else:
                jh, mm = _pair_counts(hom, val, samp_i, samp_j, a, b)
            match[i, j] = match[j, i] = mm <= mismatch_max * jh
    cts = match.sum(axis=1).astype(np.int64)
    nsim = [int(c) for c in cts]
    # greedy reference-member selection (assign_allelic_match_groups)
    work = nsim[:]
    group = [0] * p
    is_ref = [False] * p
    nz = sum(1 for c in work if c)
    gidx = 1
    while nz:
        mx, mi = 0, 0
        for i in range(p):
            c = work[i]
            if c != CONSUMED and c > mx:
                mx, mi = c, i
        nz -= 1
        work[mi] = CONSUMED
        for j in range(p):
            if j == mi:
                continue
            if match[mi][j]:
                if work[j] != CONSUMED:
                    nz -= 1
                    work[j] = CONSUMED
                group[j] = gidx
                is_ref[j] = False
        group[mi] = gidx
        is_ref[mi] = True
        gidx += 1
    for i in range(p):
        if work[i] != CONSUMED:
            group[i] = gidx
            is_ref[i] = True
            gidx += 1
    return nsim, group, is_ref


def _middle(vid, pos, maxsnp, is_new, u1, u2):
    """roh_pool_write_middle (1.9/plink_homozyg.c:1322): SNP1 SNP2 BP1
    BP2 KB columns shared by member and CON/UNION rows."""
    kb = float(int(pos[u2]) + is_new - int(pos[u1])) / 1000.0
    return (f" {vid[u1]:>{maxsnp}} {vid[u2]:>{maxsnp}}     "
            f"{int(pos[u1]):>10}     {int(pos[u2]):>10} "
            f"{dtoa_g_wxp8(kb, 8)} ")


def write_pool_reports(ds, cfg, hp, runs, entries, inc_s, max_pool_size,
                       log, fid, iid, maxfid, maxiid, maxsnp, nm,
                       is_case, qt):
    """Top-level --homozyg group driver: pool sweep, ID assignment,
    .hom.overlap (+ per-pool .S*.verbose) writers."""
    from ..ops.pairwise import _unpack_np
    from .basic_reports import alt_allele_freqs

    if max_pool_size < hp.pool_size_min:
        mod = "-verbose" if hp.group_verbose else ""
        log.log(
            f"Warning: Skipping --homozyg group{mod} report since there "
            "are no pools.")
        return
    vi = ds.vi
    ci = vi.chr_info
    is_new = 0 if hp.old_lengths else 1
    mismatch_max = 1 - (hp.overlap_min * (1 - 9.31322574615478515625e-10))

    # roh_list order (ascending (run, end, sample)) is the caller's
    # entries order; record per-run views
    rohs_by_run = {}
    roh_recs = []  # (run_i, start, last, nsnp, sample, vidx_c)
    for g_idx, (run_i, _q, s, ent, vidx_c) in enumerate(entries):
        p0, nsnp = ent[0], ent[1]
        roh_recs.append((run_i, p0, p0 + nsnp - 1, nsnp, s, vidx_c))
        rohs_by_run.setdefault(run_i, []).append(
            (p0, p0 + nsnp - 1, g_idx))

    pools = find_pools(rohs_by_run, hp.pool_size_min)
    n_pools = len(pools)
    size_txt = (f" size-{hp.pool_size_min}+" if hp.pool_size_min > 2
                else "")
    log.log(f"{n_pools}{size_txt} pool"
            f"{'' if n_pools == 1 else 's'} of overlapping ROH present.")

    # ID assignment: descending size, then ascending (chrom, position)
    # (= descending emission seq) -- plink_homozyg.c:1621-1640
    order = sorted(range(n_pools),
                   key=lambda k: (-len(pools[k][2]), -pools[k][1]))
    pool_id = {}
    for rank, k in enumerate(order):
        pool_id[k] = rank + 1

    # genotype planes per run, on demand
    pk = ds.all_packed()
    vmask = ds.variant_mask
    run_codes = {}

    def codes_for(run_i):
        if run_i not in run_codes:
            _code, lo, hi = runs[run_i]
            vidx_c = np.flatnonzero(vmask[lo:hi]) + lo
            c = _unpack_np(pk[vidx_c])[:, : ds.raw_sample_ct][:, inc_s]
            run_codes[run_i] = c
        return run_codes[run_i]

    # 1.9 A1/A2 naming for the verbose genotype dumps (A1 = minor by
    # founder frequency, as in every other 1.9-facing module here)
    verbose = hp.group_verbose
    if verbose:
        freqs = alt_allele_freqs(ds, founders_only=True)
        a1_is_alt = ~(freqs > 0.5)
        alt1 = vi.alt1()
        ref = vi.ref

    # roh_pool rebuilds missing_pheno_str as dtoa_g_wxp4(missing_pheno, 8)
    # (plink_homozyg.c:2724-2728), NOT the ".000"-padded main-report form
    missing8 = dtoa_g_wxp4(-9.0, 8)

    def phe8(s):
        if not nm[s]:
            return missing8
        if is_case is not None:
            return ("2" if is_case[s] else "1").rjust(8)
        return dtoa_g_wxp4(float(qt[s]), 8)

    # per-pool analysis, in the writer's (ID) order
    results = {}
    for k in range(n_pools):
        run_i, _seq, local = pools[k]
        rohs = rohs_by_run[run_i]
        mem_g = [rohs[j][2] for j in local]
        # sort by ascending sample index (roh_slot_map order)
        mem_g.sort(key=lambda g: roh_recs[g][4])
        members = [(roh_recs[g][1], roh_recs[g][2], roh_recs[g][4])
                   for g in mem_g]
        codes = codes_for(run_i)
        hom = (codes == 0) | (codes == 2)
        val = codes == 2
        nsim, group, is_ref = compute_pool_groups(
            members, hom, val, codes.shape[0], mismatch_max,
            hp.consensus_match)
        results[k] = (mem_g, members, nsim, group, is_ref)

    if verbose:
        for k in range(n_pools):
            _write_verbose_pool(
                ds, cfg, pools[k][0], results[k], pool_id[k], runs,
                roh_recs, codes_for(pools[k][0]), fid, iid, maxfid,
                maxiid, maxsnp, nm, is_case, qt, a1_is_alt, alt1, ref,
                missing8)

    path = cfg.out + ".hom.overlap"
    with open(path, "w") as f:
        f.write(f" POOL {'FID':>{maxfid}} {'IID':>{maxiid}}      PHE  "
                f"CHR {'SNP1':>{maxsnp}} {'SNP2':>{maxsnp}}            "
                "BP1            BP2       KB     NSNP NSIM    GRP\n")
        for k in order:
            run_i, _seq, _local = pools[k]
            mem_g, members, nsim, group, is_ref = results[k]
            p_ct = len(mem_g)
            pid = f"S{pool_id[k]}".rjust(5) + " "
            code = runs[run_i][0]
            chr4 = ci.name19(code).rjust(4)
            vidx_c = roh_recs[mem_g[0]][5]
            case_ct = 0
            # member rows sorted by (group, pool idx)
            worder = sorted(range(p_ct), key=lambda i: (group[i], i))
            con_s = max(m[0] for m in members)
            con_l = min(m[1] for m in members)
            uni_s = min(m[0] for m in members)
            uni_l = max(m[1] for m in members)
            for i in worder:
                g = mem_g[i]
                _run, p0, last, nsnp, s, _v = roh_recs[g]
                if nm[s] and is_case is not None and is_case[s]:
                    case_ct += 1
                u1, u2 = int(vidx_c[p0]), int(vidx_c[last])
                grp = str(group[i]).rjust(5) + ("*" if is_ref[i]
                                                else " ")
                f.write(
                    f"{pid}{fid[s]:>{maxfid}} {iid[s]:>{maxiid}} "
                    f"{phe8(s)} {chr4}"
                    f"{_middle(vi.vid, vi.pos, maxsnp, is_new, u1, u2)}"
                    f"{nsnp:>8} {u32_w4(nsim[i])} {grp} \n")
            aff = f"{case_ct}:{p_ct - case_ct}".rjust(8)
            for tag, s0, l0 in (("CON", con_s, con_l),
                                ("UNION", uni_s, uni_l)):
                u1, u2 = int(vidx_c[s0]), int(vidx_c[l0])
                f.write(
                    f"{pid}{tag:>{maxfid}} {p_ct:>{maxiid}} {aff} "
                    f"{chr4}"
                    f"{_middle(vi.vid, vi.pos, maxsnp, is_new, u1, u2)}"
                    f"{l0 - s0 + 1:>8}    NA     NA \n")
            f.write("\n")
    log.log(f"ROH pool report written to {path} .")
    if verbose:
        if n_pools == 1:
            tail = "S1"
        elif n_pools == 2:
            tail = "S{1,2}"
        else:
            tail = f"S{{1,...,{n_pools}}}"
        log.log(f"Per-pool report{'' if n_pools == 1 else 's'} written "
                f"to {path}.{tail}.verbose.")


def u32_w4(n: int) -> str:
    """1.9 uint32toa_w4 (plink_common.c:1054-1074) including its quirk:
    for 10 <= n < 100 the memset(start, 32, 2) result is overwritten
    in place (start is not advanced), so two-digit values emit only the
    2 digits with NO left padding."""
    n = int(n)
    if n < 10:
        return f"   {n}"
    if n < 100:
        return str(n)
    if n < 1000:
        return f" {n}"
    return str(n)


def _geno_cell(code, in_roh, a1s, a2s, alts, refs):
    """One bracketed genotype cell of the verbose matrices.  Codes are
    ours (0 hom-ref / 1 het / 2 hom-alt / 3 missing); the reference
    prints raw-.bed-orientation homozygotes and current-A1/A2 hets,
    which collapses to this mapping (see module docstring)."""
    if code == 3:
        g = "0/0"
    elif code == 1:
        g = f"{a1s}/{a2s}"
    elif code == 2:
        g = f"{alts}/{alts}"
    else:
        g = f"{refs}/{refs}"
    return ("[" if in_roh else " ") + g + ("]" if in_roh else " ") + " "


def _write_verbose_pool(ds, cfg, run_i, result, pid, runs, roh_recs,
                        codes, fid, iid, maxfid, maxiid, maxsnp, nm,
                        is_case, qt, a1_is_alt, alt1, ref, missing8):
    """One .hom.overlap.S<pid>.verbose file (plink_homozyg.c:1895-2215)."""
    vi = ds.vi
    mem_g, members, nsim, group, is_ref = result
    p_ct = len(mem_g)
    vidx_c = roh_recs[mem_g[0]][5]
    worder = sorted(range(p_ct), key=lambda i: (group[i], i))
    con_s = max(m[0] for m in members)
    con_l = min(m[1] for m in members)
    uni_s = min(m[0] for m in members)
    uni_l = max(m[1] for m in members)

    def phev(s):
        if not nm[s]:
            return missing8
        if is_case is not None:
            return " " * 7 + ("2" if is_case[s] else "1")
        return dtoa_g_wxp2(float(qt[s]), 8)

    def astr(u, which):
        # which: "a1"/"a2" current minor/major, "alt"/"ref" raw
        if which == "alt":
            return str(alt1[u])
        if which == "ref":
            return str(ref[u])
        if bool(a1_is_alt[u]):
            return str(alt1[u]) if which == "a1" else str(ref[u])
        return str(ref[u]) if which == "a1" else str(alt1[u])

    path = f"{cfg.out}.hom.overlap.S{pid}.verbose"
    with open(path, "w") as f:
        f.write(f"       {'FID':>{maxfid}} {'IID':>{maxiid}}  GRP \n")
        # top member list + matrix header: uint32toa + width_force(4)
        # (plink_homozyg.c:1920-1943) -- proper right-justification, no
        # uint32toa_w4 quirk here
        for row, i in enumerate(worder):
            s = members[i][2]
            f.write(f"{row + 1:>4})  {fid[s]:>{maxfid}} "
                    f"{iid[s]:>{maxiid}}   {group[i]}\n")
        f.write("\n")
        f.write(" " * (maxsnp - 3) + "SNP ")
        for row in range(p_ct):
            f.write(f"{row + 1:>4}  ")
        f.write("\n\n")
        for c in range(uni_s, uni_l + 1):
            u = int(vidx_c[c])
            if c == con_s:
                f.write("\n")
            f.write(f"{vi.vid[u]:>{maxsnp}} ")
            for i in worder:
                s0, l0, s = members[i]
                f.write(_geno_cell(int(codes[c, s]), s0 <= c <= l0,
                                   astr(u, "a1"), astr(u, "a2"),
                                   astr(u, "alt"), astr(u, "ref")))
            f.write("\n")
            if c == con_l:
                f.write("\n")
        f.write("\n\n")
        # per-group member lists + consensus-haplotype matrices
        gi = 0
        while gi < p_ct:
            ge = gi + 1
            gnum = group[worder[gi]]
            while ge < p_ct and group[worder[ge]] == gnum:
                ge += 1
            f.write(f"Group {gnum}\n\n")
            for row in range(gi, ge):
                s = members[worder[row]][2]
                f.write(f"{u32_w4(row + 1)}) {fid[s]:>{maxfid}} "
                        f"{iid[s]:>{maxiid}} {phev(s)}\n")
            f.write("\n\n")
            f.write(" " * (maxsnp - 3) + "SNP         ")
            for row in range(gi, ge):
                f.write(f"{u32_w4(row + 1)}  ")
            f.write("\n\n")
            for c in range(uni_s, uni_l + 1):
                u = int(vidx_c[c])
                if c == con_s:
                    f.write("\n")
                f.write(f"{vi.vid[u]:>{maxsnp}} ")
                n_alt = n_ref = 0
                for row in range(gi, ge):
                    s0, l0, s = members[worder[row]]
                    if s0 <= c <= l0:
                        cd = int(codes[c, s])
                        if cd == 2:
                            n_alt += 1  # raw-code-0 (hom file-A1) homs
                        elif cd == 0:
                            n_ref += 1
                if n_ref > n_alt:
                    hap = astr(u, "ref").rjust(2)
                elif n_alt > n_ref:
                    hap = astr(u, "alt").rjust(2)
                else:
                    hap = " ?"
                f.write(hap + " " * 6)
                for row in range(gi, ge):
                    s0, l0, s = members[worder[row]]
                    f.write(_geno_cell(int(codes[c, s]), s0 <= c <= l0,
                                       astr(u, "a1"), astr(u, "a2"),
                                       astr(u, "alt"), astr(u, "ref")))
                f.write("\n")
                if c == con_l:
                    f.write("\n")
            f.write("\n")
            gi = ge
        f.write("\n\n")
        # final all-group consensus matrix: the reference prints RAW
        # allele pointers here (current A1/A2, no reverse correction) --
        # replicated bug-for-bug (plink_homozyg.c:2160-2210)
        for c in range(uni_s, uni_l + 1):
            u = int(vidx_c[c])
            if c == con_s:
                f.write("\n")
            f.write(f"{vi.vid[u]:>{maxsnp}} ")
            gi = 0
            while gi < p_ct:
                ge = gi + 1
                gnum = group[worder[gi]]
                while ge < p_ct and group[worder[ge]] == gnum:
                    ge += 1
                n_alt = n_ref = 0
                for row in range(gi, ge):
                    s0, l0, s = members[worder[row]]
                    if s0 <= c <= l0:
                        cd = int(codes[c, s])
                        if cd == 2:
                            n_alt += 1
                        elif cd == 0:
                            n_ref += 1
                if n_ref > n_alt:
                    f.write(astr(u, "a2"))
                elif n_alt > n_ref:
                    f.write(astr(u, "a1"))
                else:
                    f.write("?")
                f.write(" ")
                gi = ge
            f.write("\n")
            if c == con_l:
                f.write("\n")
