"""Pairwise LD (r^2) sufficient statistics as banded plane Grams.

TPU re-design of the reference's per-pair popcount path
(ComputeIndepPairwiseR2Components, 2.0/plink2_ld.cc:194-414): genotypes are
scored x in {+1 hom-ref, 0 het, -1 hom-alt} with pairwise-complete
missing handling.  All six per-pair quantities (shared nonmissing count,
both conditional sums/ssqs, dot product) are entries of the 3x3 Gram of the
{hom-ref, hom-alt, valid} planes, contracted over SAMPLES on the MXU:
    dot    = RR - RA - AR + AA
    nm     = VV
    sum_i  = RV - AV        ssq_i = RV + AV     (i = row variant)
    sum_j  = VR - VA        ssq_j = VR + VA
The greedy window walk itself (inherently serial) runs on the host against
these precomputed bands.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .planes import unpack_codes


def _planes_rav(packed: jax.Array, smask: jax.Array) -> jax.Array:
    """packed [C, NB] -> [3C, npad] int8 planes (R rows | A rows | V rows),
    sample-masked."""
    codes = unpack_codes(packed, 0)
    b0 = (codes & 1).astype(jnp.int8)
    b1 = ((codes >> 1) & 1).astype(jnp.int8)
    miss = b0 & b1
    r = (1 - b0) & (1 - b1)
    a = b1 - miss
    v = 1 - miss
    m = smask[None, :]
    return jnp.concatenate([r * m, a * m, v * m], axis=0)


@jax.jit
def ld_gram_pair(pka: jax.Array, pkb: jax.Array, smask: jax.Array) -> jax.Array:
    """[3Ca, 3Cb] int32 Gram of RAV planes between two variant chunks,
    contracting the sample axis."""
    p3 = _planes_rav(pka, smask)
    q3 = _planes_rav(pkb, smask)
    return lax.dot_general(
        p3, q3, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )


def pair_stats_from_gram(g: np.ndarray, ca: int, cb: int) -> dict[str, np.ndarray]:
    """Gram [3ca, 3cb] -> the six pair-stat matrices [ca, cb] (int64)."""
    g = np.asarray(g, dtype=np.int64)
    R, A, V = 0, 1, 2
    blk = lambda x, y: g[x * ca : (x + 1) * ca, y * cb : (y + 1) * cb]
    rr, ra, rv = blk(R, R), blk(R, A), blk(R, V)
    ar, aa, av = blk(A, R), blk(A, A), blk(A, V)
    vr, va, vv = blk(V, R), blk(V, A), blk(V, V)
    return {
        "dot": rr - ra - ar + aa,
        "nm": vv,
        "sum_i": rv - av,
        "ssq_i": rv + av,
        "sum_j": vr - va,
        "ssq_j": vr + va,
    }


@partial(jax.jit, static_argnames=("width",))
def _ld_band_scan(blocks: jax.Array, nxt: jax.Array, smask: jax.Array,
                  width: int):
    """Banded pair statistics for a whole subcontig in ONE device call.

    blocks [nc, c, NB] uint8 chunked variant rows (c >= width); nxt is
    blocks rolled by one (next chunk, zeros for the last).  For each chunk:
    the RAV plane Gram against itself and against the next chunk, band-
    extracted on device so only [nc, 6, c, width+1] int32 crosses the wire
    (the full Gram would be ~c/width times larger).  Returns (bands, nm1,
    homref1, homalt1).
    """
    c = blocks.shape[1]

    def body(carry, xs):
        pa, pb = xs
        p3 = _planes_rav(pa, smask)
        q3 = _planes_rav(pb, smask)
        g_self = lax.dot_general(
            p3, p3, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        g_cross = lax.dot_general(
            p3, q3, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        ii = jnp.arange(c)[:, None]
        dd = jnp.arange(width + 1)[None, :]
        jidx = jnp.minimum(ii + dd, 2 * c - 1)  # [c, width+1]

        def band(a, b):
            m_self = lax.dynamic_slice(g_self, (a * c, b * c), (c, c))
            m_cross = lax.dynamic_slice(g_cross, (a * c, b * c), (c, c))
            mcat = jnp.concatenate([m_self, m_cross], axis=1)  # [c, 2c]
            return jnp.take_along_axis(mcat, jidx, axis=1)

        rr, ra, rv = band(0, 0), band(0, 1), band(0, 2)
        ar, aa, av = band(1, 0), band(1, 1), band(1, 2)
        vr, va, vv = band(2, 0), band(2, 1), band(2, 2)
        six = jnp.stack([
            rr - ra - ar + aa,  # dot
            vv,                 # nm
            rv - av,            # sum_i
            rv + av,            # ssq_i
            vr - va,            # sum_j
            vr + va,            # ssq_j
        ])  # [6, c, width+1]
        nm1 = vv[:, 0]
        homref1 = rv[:, 0]
        homalt1 = av[:, 0]
        return carry, (six, nm1, homref1, homalt1)

    _, outs = lax.scan(body, 0, (blocks, nxt))
    return outs


@partial(jax.jit, static_argnames=("width",))
def _ld_band_bits_scan(blocks: jax.Array, nxt: jax.Array, smask: jax.Array,
                       r2t: jax.Array, width: int):
    """Like _ld_band_scan, but the r^2-vs-threshold DECISION is made on
    device: only [nc, c, width+1] uint8 exceeds-bits (+ three per-variant
    count vectors) cross the wire -- 24x fewer bytes than the six int32
    bands, which dominates --indep-pairwise wall-clock on tunnel-attached
    TPUs.  cov/var products stay exact in f64 (counts < 2^26)."""
    c = blocks.shape[1]

    def body(carry, xs):
        pa, pb = xs
        p3 = _planes_rav(pa, smask)
        q3 = _planes_rav(pb, smask)
        g_self = lax.dot_general(
            p3, p3, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        g_cross = lax.dot_general(
            p3, q3, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        ii = jnp.arange(c)[:, None]
        dd = jnp.arange(width + 1)[None, :]
        jidx = jnp.minimum(ii + dd, 2 * c - 1)  # [c, width+1]

        def band(a, b):
            m_self = lax.dynamic_slice(g_self, (a * c, b * c), (c, c))
            m_cross = lax.dynamic_slice(g_cross, (a * c, b * c), (c, c))
            mcat = jnp.concatenate([m_self, m_cross], axis=1)  # [c, 2c]
            return jnp.take_along_axis(mcat, jidx, axis=1).astype(jnp.float64)

        rr, ra, rv = band(0, 0), band(0, 1), band(0, 2)
        ar, aa, av = band(1, 0), band(1, 1), band(1, 2)
        vr, va, vv = band(2, 0), band(2, 1), band(2, 2)
        dot = rr - ra - ar + aa
        s_i, q_i = rv - av, rv + av
        s_j, q_j = vr - va, vr + va
        cov = dot * vv - s_i * s_j
        var1 = q_i * vv - s_i * s_i
        var2 = q_j * vv - s_j * s_j
        exceeds = (cov * cov > r2t * var1 * var2).astype(jnp.uint8)
        nm1 = vv[:, 0].astype(jnp.int32)
        homref1 = rv[:, 0].astype(jnp.int32)
        homalt1 = av[:, 0].astype(jnp.int32)
        return carry, (exceeds, nm1, homref1, homalt1)

    _, outs = lax.scan(body, 0, (blocks, nxt))
    return outs


class LdBitsBand:
    """Banded r^2-exceeds-threshold DECISIONS for one subcontig: entry
    [i, d] is 1 iff cov^2 > r2t * var1 * var2 for the pair (i, i+d)
    (strict >, matching the reference's zero-common-observation guard).
    The threshold compare runs on device; see _ld_band_bits_scan."""

    def __init__(self, packed_rows, smask: np.ndarray, width: int,
                 r2t: float, chunk: int | None = None, n: int | None = None,
                 block_cache: dict | None = None, cache_key=None):
        """packed_rows: uint8 [n, NB] array OR a zero-arg callable returning
        one (called only on a block-cache miss, so repeat invocations skip
        the host read + upload entirely)."""
        if n is None:
            n = packed_rows.shape[0]
        self.n = n
        self.width = min(width, max(n - 1, 0))
        c = max(chunk or 512, self.width, 1)
        c = min(c, max(n, 1))
        nc = max(1, -(-n // c))
        blocks = None
        full_key = None
        if block_cache is not None and cache_key is not None:
            full_key = (cache_key, nc, c)
            blocks = block_cache.get(full_key)
        if blocks is None:
            pr = packed_rows() if callable(packed_rows) else packed_rows
            pad_rows = nc * c - n
            if pad_rows:
                pr = np.concatenate(
                    [pr, np.zeros((pad_rows, pr.shape[1]), np.uint8)]
                )
            blocks = jnp.asarray(pr.reshape(nc, c, pr.shape[1]))
            if full_key is not None:
                if len(block_cache) > 8:  # bound HBM held by the cache
                    block_cache.clear()
                block_cache[full_key] = blocks
        nxt = jnp.concatenate(
            [blocks[1:], jnp.zeros_like(blocks[:1])], axis=0
        )
        sm = jnp.asarray(np.asarray(smask, dtype=np.int8))
        exceeds, nm1, homref1, homalt1 = _ld_band_bits_scan(
            blocks, nxt, sm, jnp.asarray(r2t, jnp.float64), self.width
        )
        ex = np.asarray(exceeds).reshape(nc * c, self.width + 1)[:n]
        ii = np.arange(n)[:, None]
        dd = np.arange(self.width + 1)[None, :]
        ex = ex.copy()
        ex[ii + dd >= n] = 0  # padding-row pairs are garbage
        ex[:, 0] = 0
        self.exceeds = ex
        self.nm1 = np.asarray(nm1, np.int64).reshape(nc * c)[:n]
        self.homref1 = np.asarray(homref1, np.int64).reshape(nc * c)[:n]
        self.homalt1 = np.asarray(homalt1, np.int64).reshape(nc * c)[:n]

    def r2_exceeds_vec(self, firsts: np.ndarray, second: int, thresh=None):
        return self.exceeds[firsts, second - firsts].astype(bool)


class LdJointBand:
    """Banded 3x3 joint genotype-count tables for variant pairs.

    Entry [i, d] holds, for the pair (i, i+d), the counts of samples with
    each (genotype_i, genotype_j) combination over both-nonmissing samples,
    derived from the RAV plane Gram (R=homref, A=homalt, V=valid; H=V-R-A).
    Used by --r2-phased/--r-phased haplotype-EM r (ref: Vcor,
    2.0/plink2_ld.cc:12054, algorithm inherited from plink 1.9 --r2).
    """

    RAW = ("RR", "RA", "RV", "AR", "AA", "AV", "VR", "VA", "VV")

    def __init__(self, packed_rows: np.ndarray, smask: np.ndarray, width: int,
                 chunk: int | None = None):
        n = packed_rows.shape[0]
        self.n = n
        self.width = min(width, max(n - 1, 0))
        c = max(chunk or 256, self.width, 1)
        c = min(c, max(n, 1))
        self.bands = {
            k: np.zeros((n, self.width + 1), dtype=np.int64) for k in self.RAW
        }
        sm = jnp.asarray(np.asarray(smask, dtype=np.int8))
        chunks = [(s, min(s + c, n)) for s in range(0, n, c)]
        for s0, s1 in chunks:
            pa = jnp.asarray(packed_rows[s0:s1])
            g_aa = np.asarray(ld_gram_pair(pa, pa, sm))
            self._fill(g_aa, s0, s1 - s0, s0, s1 - s0)
            if s1 < n:
                s2 = min(s1 + c, n)
                pb = jnp.asarray(packed_rows[s1:s2])
                g_ab = np.asarray(ld_gram_pair(pa, pb, sm))
                self._fill(g_ab, s0, s1 - s0, s1, s2 - s1)

    def _fill(self, g, s0, ca, t0, cb):
        g = g.astype(np.int64)
        names = {"R": 0, "A": 1, "V": 2}
        for ka, ia in names.items():
            for kb, ib in names.items():
                m = g[ia * ca : (ia + 1) * ca, ib * cb : (ib + 1) * cb]
                key = ka + kb
                if s0 == t0:
                    for d in range(1, min(self.width, ca - 1) + 1):
                        self.bands[key][s0 : s0 + ca - d, d] = np.diagonal(m, d)
                else:
                    for il in range(ca):
                        i = s0 + il
                        dmin = t0 - i
                        if dmin > self.width:
                            continue
                        dmax = min(self.width, t0 + cb - 1 - i)
                        if dmax < dmin:
                            continue
                        self.bands[key][i, dmin : dmax + 1] = m[
                            il, 0 : dmax - dmin + 1
                        ]

    def joint_counts(self, firsts: np.ndarray, d: np.ndarray) -> dict:
        """For pairs (firsts, firsts+d): 3x3 counts keyed 'ab' with a,b in
        {0,1,2} = ALT copies of the first/second variant, plus 'nm'."""
        b = {k: self.bands[k][firsts, d] for k in self.RAW}
        out = {}
        # R = 0 copies, H = 1, A = 2 ; H* = V* - R* - A*
        out["00"] = b["RR"]
        out["02"] = b["RA"]
        out["20"] = b["AR"]
        out["22"] = b["AA"]
        out["01"] = b["RV"] - b["RR"] - b["RA"]
        out["21"] = b["AV"] - b["AR"] - b["AA"]
        out["10"] = b["VR"] - b["RR"] - b["AR"]
        out["12"] = b["VA"] - b["RA"] - b["AA"]
        out["nm"] = b["VV"]
        out["11"] = (
            b["VV"] - out["00"] - out["01"] - out["02"] - out["10"]
            - out["12"] - out["20"] - out["21"] - out["22"]
        )
        return out


class LdBand:
    """Banded pair statistics for one subcontig: entry [i, d] describes the
    pair (i, i+d), 1 <= d <= width, i in subcontig-local included-variant
    indices.  Also exposes per-variant (nm, homref, homalt) counts."""

    KEYS = ("dot", "nm", "sum_i", "ssq_i", "sum_j", "ssq_j")

    def __init__(self, packed_rows: np.ndarray, smask: np.ndarray, width: int,
                 chunk: int | None = None):
        """packed_rows: uint8 [n_sub, NB] packed genotypes (raw sample axis,
        padded); smask: f32/bool [npad] sample-inclusion mask."""
        n = packed_rows.shape[0]
        self.n = n
        self.width = min(width, max(n - 1, 0))
        # cross-chunk pairs are only computed between ADJACENT chunks, so the
        # chunk edge must be >= the band width
        c = max(chunk or 64, self.width, 1)
        c = min(c, max(n, 1))
        # round the chunk edge so every chunk has one static shape (one XLA
        # compile) -- the variant axis is padded with zero rows
        nc = max(1, -(-n // c))
        pad_rows = nc * c - n
        pr = packed_rows
        if pad_rows:
            pr = np.concatenate(
                [pr, np.zeros((pad_rows, pr.shape[1]), np.uint8)]
            )
        blocks = jnp.asarray(pr.reshape(nc, c, pr.shape[1]))
        nxt = jnp.concatenate(
            [blocks[1:], jnp.zeros_like(blocks[:1])], axis=0
        )
        sm = jnp.asarray(np.asarray(smask, dtype=np.int8))
        six, nm1, homref1, homalt1 = _ld_band_scan(
            blocks, nxt, sm, self.width
        )
        six = np.asarray(six, dtype=np.int64)  # [nc, 6, c, width+1]
        flat = six.transpose(1, 0, 2, 3).reshape(6, nc * c, self.width + 1)
        # zero out entries whose pair index exceeds the subcontig (padding
        # rows contribute garbage via the clipped gather)
        self.bands = {}
        for k_i, k in enumerate(self.KEYS):
            b = flat[k_i][:n].copy()
            ii = np.arange(n)[:, None]
            dd = np.arange(self.width + 1)[None, :]
            b[ii + dd >= n] = 0
            self.bands[k] = b
        self.nm1 = np.asarray(nm1, np.int64).reshape(nc * c)[:n]
        self.homref1 = np.asarray(homref1, np.int64).reshape(nc * c)[:n]
        self.homalt1 = np.asarray(homalt1, np.int64).reshape(nc * c)[:n]

    def _fill_self(self, stats, s0, clen):
        vv = stats["nm"]
        self.nm1[s0 : s0 + clen] = np.diagonal(vv)
        # homref count among nonmissing = diag of RV; homalt = diag of AV
        self.homref1[s0 : s0 + clen] = (
            np.diagonal(stats["ssq_i"]) + np.diagonal(stats["sum_i"])
        ) // 2
        self.homalt1[s0 : s0 + clen] = (
            np.diagonal(stats["ssq_i"]) - np.diagonal(stats["sum_i"])
        ) // 2
        for k in self.KEYS:
            m = stats[k]
            for d in range(1, min(self.width, clen - 1) + 1):
                diag = np.diagonal(m, offset=d)
                self.bands[k][s0 : s0 + clen - d, d] = diag

    def _fill_cross(self, stats, s0, ca, t0, cb):
        for k in self.KEYS:
            m = stats[k]
            for il in range(ca):
                i = s0 + il
                dmin = t0 - i
                if dmin > self.width:
                    continue
                dmax = min(self.width, t0 + cb - 1 - i)
                if dmax < dmin:
                    continue
                self.bands[k][i, dmin : dmax + 1] = m[il, 0 : dmax - dmin + 1]

    def pair(self, key: str, i: int, j: int) -> int:
        return int(self.bands[key][i, j - i])

    def r2_exceeds_vec(self, firsts: np.ndarray, second: int, thresh: float):
        """Vectorized 'cov^2 > thresh * var1 * var2' (strict >, matching the
        reference's zero-common-observation guard) for pairs (f, second)."""
        d = second - firsts
        dot = self.bands["dot"][firsts, d].astype(np.float64)
        nm = self.bands["nm"][firsts, d].astype(np.float64)
        s_i = self.bands["sum_i"][firsts, d].astype(np.float64)
        q_i = self.bands["ssq_i"][firsts, d].astype(np.float64)
        s_j = self.bands["sum_j"][firsts, d].astype(np.float64)
        q_j = self.bands["ssq_j"][firsts, d].astype(np.float64)
        cov = dot * nm - s_i * s_j
        var1 = q_i * nm - s_i * s_i
        var2 = q_j * nm - s_j * s_j
        return cov * cov > thresh * var1 * var2
