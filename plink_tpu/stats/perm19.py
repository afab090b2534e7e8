"""PLINK 1.9 permutation-vector generators, bit-exact RNG consumption.

Behavior reference: 1.9/plink_perm.c:60-470 (generate_cc_perm_vec /
generate_cc_perm1 / cluster variants / generate_qt_perms_smajor_thread)
and 1.9/plink_cluster.c cluster_include_and_reindex /
adjust_cc_perm_preimage.

The reference's magic-number division ((magic * ((urand >> pre) + incr))
>> post) is an exact uint32 floor division by tot_quotient for every
dividend (plink_common.c:3383 magic_num), so plain // is used here.
Thread partitioning is replicated so any --threads value can be
matched; thread 0 draws from the master SFMT stream, thread t>0 from a
generator seeded with 4 master draws (plink_common.c:10860).
"""

from __future__ import annotations

import numpy as np

from .sfmt import Sfmt, sfmt_thread_array


def master_sfmt(cfg):
    """Per-run master generator (g_sfmt): all RNG consumers in a run
    share one stream, in pipeline order, exactly like the reference."""
    m = getattr(cfg, "_sfmt_master", None)
    if m is None:
        if cfg.seed is not None:
            m = Sfmt(cfg.seed & 0xFFFFFFFF)
        else:
            import os

            m = Sfmt(int.from_bytes(os.urandom(4), "little"))
        object.__setattr__(cfg, "_sfmt_master", m)
    return m


def _draw(sfmt, tot_quotient, upper_bound):
    while True:
        urand = sfmt.genrand_uint32()
        if urand <= upper_bound:
            return urand // tot_quotient


def generate_cc_perm(tot_ct, set_ct, sfmt):
    """generate_cc_perm_vec / generate_cc_perm1 (identical RNG stream
    and case-set; only the bit packing differed).  Returns a bool
    array: True = case."""
    tot_quotient = (1 << 32) // tot_ct
    upper_bound = tot_ct * tot_quotient - 1
    out = np.zeros(tot_ct, bool)
    if set_ct * 2 < tot_ct:
        n = set_ct
        want = False     # draw until we hit a clear slot, then set
    else:
        out[:] = True
        n = tot_ct - set_ct
        want = True      # draw until we hit a set slot, then clear
    for _ in range(n):
        while True:
            uii = _draw(sfmt, tot_quotient, upper_bound)
            if out[uii] == want:
                break
        out[uii] = not want
    return out


def generate_cc_cluster_perm(tot_ct, preimage, clusters, case_cts,
                             sfmt):
    """generate_cc_cluster_perm_vec/perm1.  clusters: list of collapsed
    member index arrays (each size >= 2), case_cts aligned; preimage is
    the majority-adjusted bool array (True = case)."""
    out = preimage.copy()
    for members, target_ct in zip(clusters, case_cts):
        size = len(members)
        if not target_ct or target_ct == size:
            continue
        tot_quotient = (1 << 32) // size
        upper_bound = size * tot_quotient - 1
        if target_ct * 2 < size:
            n, want = target_ct, False
        else:
            n, want = size - target_ct, True
        for _ in range(n):
            while True:
                uii = int(members[_draw(sfmt, tot_quotient,
                                        upper_bound)])
                if out[uii] == want:
                    break
            out[uii] = not want
    return out


def cc_perm_matrix(pheno_case, perm_ct, thread_ct, master,
                   clusters=None, sfmts=None):
    """All --make-perm-pheno style case/control permutations:
    [perm_ct, n] bool.  pheno_case: bool array over pheno-nonmissing
    samples in filtered order.  clusters: optional
    (member_arrays, case_cts, preimage) from reindex_clusters_19.
    Pass a persistent ``sfmts`` list (sized to the max thread count) to
    continue thread RNG streams across generation batches (--linear/
    --logistic multi-pass permutation)."""
    n = pheno_case.size
    case_ct = int(pheno_case.sum())
    thread_ct = min(thread_ct, perm_ct)
    if sfmts is None:
        sfmts = sfmt_thread_array(master, thread_ct)
    out = np.zeros((perm_ct, n), bool)
    for tidx in range(thread_ct):
        pidx = (tidx * perm_ct) // thread_ct
        pmax = ((tidx + 1) * perm_ct) // thread_ct
        for p in range(pidx, pmax):
            if clusters is None:
                out[p] = generate_cc_perm(n, case_ct, sfmts[tidx])
            else:
                members, case_cts, preimage = clusters
                out[p] = generate_cc_cluster_perm(
                    n, preimage, members, case_cts, sfmts[tidx])
    return out


def qt_perm_matrix(pheno_d2, perm_ct, thread_ct, master=None,
                   clusters=None, sfmts=None):
    """generate_qt_perms_smajor_thread (+cluster variant): [n, perm_ct]
    float64 of permuted phenotype values.  clusters: optional
    (member_arrays, sample_to_cluster) for within-cluster shuffles.
    Pass a persistent ``sfmts`` list to continue thread RNG streams
    across generation batches (QT --assoc); otherwise fresh thread
    streams are derived from ``master``."""
    n = pheno_d2.size
    thread_ct = min(thread_ct, perm_ct)
    if sfmts is None:
        sfmts = sfmt_thread_array(master, thread_ct)
    ctcl8 = (perm_ct + 7) // 8
    out = np.zeros((n, perm_ct))
    if clusters is not None:
        members, sample_to_cluster = clusters
    for tidx in range(thread_ct):
        pmin = 8 * ((tidx * ctcl8) // thread_ct)
        pmax = 8 * (((tidx + 1) * ctcl8) // thread_ct)
        if tidx + 1 == thread_ct:
            pmax = perm_ct
        pdiff = pmax - pmin
        if pdiff <= 0:
            continue
        sf = sfmts[tidx]
        sub = out[:, pmin:pmax]
        if clusters is None:
            sub[0, :] = pheno_d2[0]
            for si in range(1, n):
                tot_quotient = (1 << 32) // (si + 1)
                upper_bound = (si + 1) * tot_quotient - 1
                cur = pheno_d2[si]
                for p in range(pdiff):
                    uii = _draw(sf, tot_quotient, upper_bound)
                    sub[si, p] = sub[uii, p]
                    sub[uii, p] = cur
        else:
            in_cluster_pos = {}
            for si in range(n):
                cur = pheno_d2[si]
                cl = sample_to_cluster[si]
                if cl < 0:
                    pos = 0
                else:
                    pos = in_cluster_pos.get(cl, 0)
                    in_cluster_pos[cl] = pos + 1
                if pos == 0:
                    sub[si, :] = cur
                    continue
                mm = members[cl]
                tot_quotient = (1 << 32) // (pos + 1)
                upper_bound = (pos + 1) * tot_quotient - 1
                for p in range(pdiff):
                    uii = _draw(sf, tot_quotient, upper_bound)
                    tgt = int(mm[uii])
                    sub[si, p] = sub[tgt, p]
                    sub[tgt, p] = cur
    return out


def reindex_clusters_19(assign_nm, case_nm=None):
    """cluster_include_and_reindex with remove_size1=1
    (1.9/plink_cluster.c): assign_nm = cluster index (or -1) per
    pheno-nonmissing sample in filtered order, cluster indices already
    natural-name-sorted.  Returns (member_arrays, case_cts, preimage,
    sample_to_cluster); case_cts/preimage are None without case_nm."""
    n = assign_nm.size
    kept_members = []
    case_cts = [] if case_nm is not None else None
    sample_to_cluster = np.full(n, -1, np.int64)
    kmax = int(assign_nm.max()) + 1 if n else 0
    for k in range(kmax):
        mem = np.flatnonzero(assign_nm == k)
        if mem.size <= 1:
            continue
        sample_to_cluster[mem] = len(kept_members)
        kept_members.append(mem)
        if case_nm is not None:
            case_cts.append(int(case_nm[mem].sum()))
    preimage = None
    if case_nm is not None:
        preimage = case_nm.copy()
        for mem, cct in zip(kept_members, case_cts):
            preimage[mem] = not (cct * 2 < mem.size)
    return kept_members, case_cts, preimage, sample_to_cluster


def qt_perm_pmajor(pheno_d2, perm_ct, thread_ct, sfmts):
    """generate_qt_perms_pmajor_thread (1.9/plink_perm.c:489): [perm_ct, n]
    float64 permutation-major QT phenotype permutations.

    Per-permutation Fisher-Yates with the precompute_mods rejection
    sampler (lbound = 2^32 mod (i+1), plink_common.h:2737) -- a DIFFERENT
    RNG consumption pattern from the sample-major generator used by
    --assoc.  Thread p-ranges split on CACHELINE_INT32(=16) boundaries;
    ``sfmts`` must be the persistent per-thread stream array."""
    n = pheno_d2.size
    out = np.empty((perm_ct, n))
    ctcl = (perm_ct + 15) // 16
    lbound = np.array(
        [0x100000000 % (i + 1) for i in range(1, n)], np.uint32)
    for tidx in range(thread_ct):
        pmin = 16 * ((tidx * ctcl) // thread_ct)
        pmax = 16 * (((tidx + 1) * ctcl) // thread_ct)
        if tidx + 1 == thread_ct:
            pmax = perm_ct
        sf = sfmts[tidx]
        for p in range(pmin, pmax):
            row = out[p]
            row[0] = pheno_d2[0]
            for i in range(1, n):
                lb = int(lbound[i - 1])
                while True:
                    urand = sf.genrand_uint32()
                    if urand >= lb:
                        break
                urand %= i + 1
                row[i] = row[urand]
                row[urand] = pheno_d2[i]
    return out
