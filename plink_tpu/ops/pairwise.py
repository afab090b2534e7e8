"""Pairwise sample×sample kernels: KING-robust kinship and GRM.

TPU-first re-design of the reference's pair-tile popcount/BLAS layer:

- KING (ref: CalcKing / CalcKingDenseThread, 2.0/plink2_matrix_calc.cc:1662,
  1533): the reference keeps 5 popcount accumulators per sample pair
  (kKingOffsetIbs0..Homhom, :864-868) over 1024-variant bitplane batches.
  Here each genotype column decomposes into three {0,1} planes
  H(et)/A(hom-alt)/V(alid); all five accumulators are linear combinations of
  the 3x3 plane Gram matrix G = [H A V]^T [H A V], which is ONE int8 matmul
  per (sample-tile, variant-block) on the MXU:
    hethet        = G[H,H]
    ibs0          = G[V,A] + G[A,V] - G[H,A] - G[A,H] - 2*G[A,A]
    het_r * hom_c = G[H,V] - G[H,H]      (row sample het, col sample hom)
    het_c * hom_r = G[V,H] - G[H,H]
    nsnp          = G[V,V],  homhom = nsnp - others
- GRM (ref: CalcGrm, :4555; ExpandCenteredVarmaj :3839): normed dosage
  Z = (x - 2*alt_freq) * inv_stdev with missing->0, GRM tile = Z^T Z
  accumulated in f32 with HIGHEST precision (6-pass bf16 on MXU), plus an
  int8 V^T V Gram for the per-pair observed-variant denominators
  (ref: CalcMissingMatrix :4404, denominator logic :4769-4781).

Both kernels stream a [num_blocks, vb, NB]-shaped packed 2-bit genotype
tensor resident in HBM (2 bits/genotype read per tile), so HBM traffic per
tile is vb*(s+t)/4 bytes against 9*s*t*vb int8 MACs — strongly MXU-bound
for s,t >= 512.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .planes import unpack_codes

# default tile/block geometry (multiples of 128 lanes / 8 sublanes; sample
# tiles must be multiples of 4 so packed-byte column slicing stays aligned)
DEFAULT_TILE = 2048
DEFAULT_VB = 2048


def _planes3(packed_slice: jax.Array, vmask: jax.Array) -> jax.Array:
    """packed [vb, w/4] uint8, vmask int8 [vb, 1] -> [vb, 3w] int8 planes
    (H | A | V), variant-masked."""
    codes = unpack_codes(packed_slice, 0)
    b0 = (codes & 1).astype(jnp.int8)
    b1 = ((codes >> 1) & 1).astype(jnp.int8)
    miss = b0 & b1
    h = (b0 - miss) * vmask
    a = (b1 - miss) * vmask
    v = (1 - miss) * vmask
    return jnp.concatenate([h, a, v], axis=1)


@partial(jax.jit, static_argnames=("s", "t"))
def king_gram_tile(
    packed: jax.Array,  # [nb, vb, NB] uint8
    vmask: jax.Array,  # [nb, vb] int8 (1 = variant included)
    row0: jax.Array,  # scalar int32, multiple of 4
    col0: jax.Array,
    s: int,
    t: int,
) -> jax.Array:
    """Accumulated 3x3 plane Gram [3s, 3t] int32 for one sample tile."""
    vb = packed.shape[1]

    def body(acc, xs):
        pk, vm = xs
        vmc = vm[:, None]
        pr = lax.dynamic_slice_in_dim(pk, row0 // 4, s // 4, axis=1)
        pc = lax.dynamic_slice_in_dim(pk, col0 // 4, t // 4, axis=1)
        p = _planes3(pr, vmc)
        q = _planes3(pc, vmc)
        g = lax.dot_general(
            p, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return acc + g, None

    acc0 = jnp.zeros((3 * s, 3 * t), jnp.int32)
    acc, _ = lax.scan(body, acc0, (packed, vmask))
    return acc


@partial(jax.jit, static_argnames=("s", "t"))
def wmiss_gram_tile(
    packed: jax.Array,  # [nb, vb, NB] uint8
    vmask: jax.Array,  # [nb, vb] int8
    wlimbs: jax.Array,  # [nb, vb, 5] int8: 7-bit limbs of a uint32 weight
    row0: jax.Array,
    col0: jax.Array,
    s: int,
    t: int,
) -> jax.Array:
    """Weighted joint-missing Gram [5s, t] int32: limb-k block holds
    sum_m limb_k(w_m) * miss_{m,i} * miss_{m,j}.  Exact integer arithmetic
    via five int8 MXU matmuls (limbs < 128, so every product fits int8 and
    the int32 accumulator holds 127 * M for M < 16.9M variants)."""

    def miss_plane(pk_slice, vmc):
        codes = unpack_codes(pk_slice, 0)
        b0 = (codes & 1).astype(jnp.int8)
        b1 = ((codes >> 1) & 1).astype(jnp.int8)
        return (b0 & b1) * vmc

    def body(acc, xs):
        pk, vm, wl = xs
        vmc = vm[:, None]
        pr = lax.dynamic_slice_in_dim(pk, row0 // 4, s // 4, axis=1)
        pc = lax.dynamic_slice_in_dim(pk, col0 // 4, t // 4, axis=1)
        mr = miss_plane(pr, vmc)
        mc = miss_plane(pc, vmc)
        vb = mr.shape[0]
        mw = (mr[:, None, :] * wl[:, :, None]).reshape(vb, 5 * s)
        g = lax.dot_general(
            mw, mc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return acc + g, None

    acc0 = jnp.zeros((5 * s, t), jnp.int32)
    acc, _ = lax.scan(body, acc0, (packed, vmask, wlimbs))
    return acc


def weight_limbs(wi: np.ndarray, nblocks: int, vb: int) -> np.ndarray:
    """uint32 weights [M] -> [nblocks, vb, 5] int8 7-bit limb planes."""
    out = np.zeros((nblocks * vb, 5), dtype=np.int8)
    w = wi.astype(np.int64)
    for k in range(5):
        out[: len(wi), k] = (w >> (7 * k)) & 0x7F
    return out.reshape(nblocks, vb, 5)


def king_counts_from_gram(g: np.ndarray, s: int, t: int) -> dict[str, np.ndarray]:
    """Split a [3s, 3t] Gram into the reference's five per-pair accumulators
    plus nsnp (all [s, t] int64). Keys follow kKingOffset* naming with
    het_r_hom_c = (row-sample het) x (col-sample hom)."""
    g = np.asarray(g, dtype=np.int64)
    H, A, V = 0, 1, 2
    blk = lambda a, b: g[a * s : (a + 1) * s, b * t : (b + 1) * t]
    hethet = blk(H, H)
    ibs0 = blk(V, A) + blk(A, V) - blk(H, A) - blk(A, H) - 2 * blk(A, A)
    het_r_hom_c = blk(H, V) - hethet
    het_c_hom_r = blk(V, H) - hethet
    nsnp = blk(V, V)
    homhom = nsnp - ibs0 - hethet - het_r_hom_c - het_c_hom_r
    return {
        "ibs0": ibs0,
        "hethet": hethet,
        "het_r_hom_c": het_r_hom_c,
        "het_c_hom_r": het_c_hom_r,
        "homhom": homhom,
        "nsnp": nsnp,
    }


def king_kinship(counts: dict[str, np.ndarray]) -> np.ndarray:
    """KING-robust kinship (ref: ComputeKinship, plink2_matrix_calc.cc:1555):
    0.5 - (4*ibs0 + het1hom2 + het2hom1) / (4*(hethet + min(het1hom2, het2hom1))).
    -inf when the denominator is zero, matching the reference edge case."""
    ibs0 = counts["ibs0"].astype(np.float64)
    h12 = counts["het_r_hom_c"].astype(np.float64)
    h21 = counts["het_c_hom_r"].astype(np.float64)
    smaller = counts["hethet"].astype(np.float64) + np.minimum(h12, h21)
    with np.errstate(divide="ignore", invalid="ignore"):
        return 0.5 - (4.0 * ibs0 + h12 + h21) / (4.0 * smaller)


@partial(jax.jit, static_argnames=("s", "t"))
def king_tile_stats(
    g: jax.Array,  # [3s, 3t] int32 plane Gram
    row0: jax.Array,
    col0: jax.Array,
    n: jax.Array,  # included sample count (pairs beyond are padding)
    thresh: jax.Array,  # f64 kinship filter (-inf = keep all)
    s: int,
    t: int,
):
    """Per-pair KING statistics computed ON DEVICE from the plane Gram.

    Returns (kin f64 [s,t], nsnp i32, hethet i32, ibs0 i32, pass_mask bool,
    pass_ct i32).  pass_mask applies the strictly-lower-triangle validity
    (global row > global col, both < n) and the --king-table-filter
    threshold (reference keeps kinship >= filter,
    2.0/plink2_matrix_calc.cc:2306).  Streaming callers fetch pass_ct
    first (one scalar) and pull the tiles only when something passed --
    at biobank n the full per-pair table never crosses the wire.
    """
    gi = g.astype(jnp.int32)
    H, A, V = 0, 1, 2
    blk = lambda a, b: gi[a * s : (a + 1) * s, b * t : (b + 1) * t]
    hethet = blk(H, H)
    ibs0 = blk(V, A) + blk(A, V) - blk(H, A) - blk(A, H) - 2 * blk(A, A)
    hrhc = blk(H, V) - hethet
    hchr = blk(V, H) - hethet
    nsnp = blk(V, V)
    # f64 from the start: 4*ibs0 can overflow int32 at extreme variant counts
    smaller = hethet.astype(jnp.float64) + jnp.minimum(hrhc, hchr).astype(jnp.float64)
    num = (4.0 * ibs0.astype(jnp.float64) + hrhc.astype(jnp.float64)
           + hchr.astype(jnp.float64))
    kin = 0.5 - num / (4.0 * smaller)  # -inf when smaller == 0, matching ref
    rows = row0 + jnp.arange(s)
    cols = col0 + jnp.arange(t)
    valid = (rows[:, None] > cols[None, :]) & (rows[:, None] < n) & (
        cols[None, :] < n
    )
    passing = valid & (kin >= thresh)
    return kin, nsnp, hethet, ibs0, passing, passing.sum(dtype=jnp.int32)


@partial(jax.jit, static_argnames=("s", "t", "fetch32"))
def grm_tile(
    packed: jax.Array,  # [nb, vb, NB] uint8
    coef: jax.Array,  # [nb, vb, 3] f32: normed value for codes 0/1/2 (0 if excluded)
    vmask: jax.Array,  # [nb, vb] int8
    row0: jax.Array,
    col0: jax.Array,
    s: int,
    t: int,
    fetch32: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """One GRM sample tile: (f32 [s, t] weighted sums, int32 [s, t] per-pair
    observed counts)."""
    vb = packed.shape[1]

    def normed(pk_slice, cf):
        codes = unpack_codes(pk_slice, 0)
        b0 = (codes & 1).astype(jnp.float32)
        b1 = ((codes >> 1) & 1).astype(jnp.float32)
        miss = b0 * b1
        r = 1.0 - b0 - b1 + miss
        h = b0 - miss
        a = b1 - miss
        return r * cf[:, 0:1] + h * cf[:, 1:2] + a * cf[:, 2:3]

    def valid(pk_slice, vm):
        codes = unpack_codes(pk_slice, 0)
        b0 = (codes & 1).astype(jnp.int8)
        b1 = ((codes >> 1) & 1).astype(jnp.int8)
        return (1 - (b0 & b1)) * vm

    def body(carry, xs):
        acc, nm = carry
        pk, cf, vm = xs
        vmc = vm[:, None]
        pr = lax.dynamic_slice_in_dim(pk, row0 // 4, s // 4, axis=1)
        pc = lax.dynamic_slice_in_dim(pk, col0 // 4, t // 4, axis=1)
        zr = normed(pr, cf)
        zc = normed(pc, cf)
        # per-block product in f32 (6-pass MXU), carried in f64 so the
        # accumulation error stays bounded by one block's rounding no matter
        # how many variants stream through
        acc = acc + lax.dot_general(
            zr,
            zc,
            (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ).astype(jnp.float64)
        nm = nm + lax.dot_general(
            valid(pr, vmc),
            valid(pc, vmc),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc, nm), None

    acc0 = jnp.zeros((s, t), jnp.float64)
    nm0 = jnp.zeros((s, t), jnp.int32)
    (acc, nm), _ = lax.scan(body, (acc0, nm0), (packed, coef, vmask))
    if fetch32:
        # shrink the device->host bytes at biobank n: the written .grm.bin
        # is float32 anyway, and pair counts fit u16 below 65536 variants
        acc = acc.astype(jnp.float32)
        nm = nm.astype(jnp.uint16)
    return acc, nm


# ---------------------------------------------------------------------------
# streaming GRM chunks: everything derivable is computed ON DEVICE so the
# device->host transfer per pair is 5 bytes (f32 ratio + u8 joint-missing
# delta) instead of the 12+ bytes of the naive (f32 numerator, i32 count)
# fetch.  On tunnel-attached TPUs (~40 MB/s D2H) the transfer IS the GRM
# wall-clock, so bytes-per-pair is the figure of merit.
#   nm_ij = Mv - m_i - m_j + jm_ij   (jm = joint-missing count, E[jm] =
#   Mv * miss_rate^2 -- single digits at real missingness, so it fits u8;
#   the kernel returns max(jm) and the caller refetches in u16 on overflow)
# ref: CalcGrm / CalcMissingMatrix / denominators
# (2.0/plink2_matrix_calc.cc:4555,4404,4769-4781).
# ---------------------------------------------------------------------------


def _miss_plane(pk_slice, vmc):
    codes = unpack_codes(pk_slice, 0)
    b0 = (codes & 1).astype(jnp.int8)
    b1 = ((codes >> 1) & 1).astype(jnp.int8)
    return (b0 & b1) * vmc


def _grm_chunk_local(packed, coef, vmask, row0, col0, s: int, c: int):
    """Scan over variant blocks: (f64 [s,c] weighted-sum accumulator,
    i32 [s,c] joint-missing counts)."""

    def normed(pk_slice, cf):
        codes = unpack_codes(pk_slice, 0)
        b0 = (codes & 1).astype(jnp.float32)
        b1 = ((codes >> 1) & 1).astype(jnp.float32)
        miss = b0 * b1
        r = 1.0 - b0 - b1 + miss
        h = b0 - miss
        a = b1 - miss
        return r * cf[:, 0:1] + h * cf[:, 1:2] + a * cf[:, 2:3]

    def body(carry, xs):
        acc, jm = carry
        pk, cf, vm = xs
        vmc = vm[:, None]
        pr = lax.dynamic_slice_in_dim(pk, row0 // 4, s // 4, axis=1)
        pc = lax.dynamic_slice_in_dim(pk, col0 // 4, c // 4, axis=1)
        acc = acc + lax.dot_general(
            normed(pr, cf), normed(pc, cf),
            (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ).astype(jnp.float64)
        jm = jm + lax.dot_general(
            _miss_plane(pr, vmc), _miss_plane(pc, vmc),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.int32,
        )
        return (acc, jm), None

    (acc, jm), _ = lax.scan(
        body,
        (jnp.zeros((s, c), jnp.float64), jnp.zeros((s, c), jnp.int32)),
        (packed, coef, vmask),
    )
    return acc, jm


def _grm_chunk_finish(acc, jm, miss_cts, mv, row0, col0, s: int, c: int,
                      jm16: bool):
    m_r = lax.dynamic_slice_in_dim(miss_cts, row0, s).astype(jnp.float64)
    m_c = lax.dynamic_slice_in_dim(miss_cts, col0, c).astype(jnp.float64)
    nm = (mv.astype(jnp.float64) - m_r[:, None] - m_c[None, :]) \
        + jm.astype(jnp.float64)
    g = (acc / nm).astype(jnp.float32)
    jm_out = jm.astype(jnp.uint16 if jm16 else jnp.uint8)
    return g, jm_out, jm.max()


@partial(jax.jit, static_argnames=("s", "c", "jm16"))
def grm_chunk(packed, coef, vmask, miss_cts, mv, row0, col0,
              s: int, c: int, jm16: bool = False):
    """One [s, c] GRM output chunk with the division done on device.

    Returns (grm f32 [s, c], jm u8|u16 [s, c], jm_max i32).  The caller
    reconstructs the .grm.N.bin counts as Mv - m_i - m_j + jm on the host.
    """
    acc, jm = _grm_chunk_local(packed, coef, vmask, row0, col0, s, c)
    return _grm_chunk_finish(acc, jm, miss_cts, mv, row0, col0, s, c, jm16)


@jax.jit
def sample_miss_counts(packed, vmask):
    """Per-sample missing-genotype counts [npad] int32 over masked variants."""

    def body(acc, xs):
        pk, vm = xs
        blk = _miss_plane(pk, vm[:, None]).sum(0, dtype=jnp.int32)
        return acc + blk, None

    acc0 = jnp.zeros((packed.shape[2] * 4,), jnp.int32)
    acc, _ = lax.scan(body, acc0, (packed, vmask))
    return acc


# ---------------------------------------------------------------------------
# mesh-sharded dispatchers: when the packed block tensor is sharded over the
# variant-block axis (PackedDevice on a >1-device mesh), the contraction
# over variants runs per-device and the partial Grams psum over ICI --
# replacing the reference's manual --parallel sharding
# (2.0/plink2_matrix_calc.cc:81-117) with real collectives.
# ---------------------------------------------------------------------------

from functools import lru_cache


@lru_cache(maxsize=None)
def _king_sharded(mesh, s, t):
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import AXIS

    def local(pk, vm, row0, col0):
        return lax.psum(king_gram_tile(pk, vm, row0, col0, s, t), AXIS)

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(), P()),
        out_specs=P(), check_rep=False,
    ))


def king_gram_tile_any(packed, vmask, row0, col0, s: int, t: int):
    """king_gram_tile that routes block-sharded inputs through shard_map."""
    from ..parallel.mesh import sharded_mesh_of

    mesh = sharded_mesh_of(packed)
    if mesh is None:
        return king_gram_tile(packed, vmask, row0, col0, s, t)
    return _king_sharded(mesh, s, t)(
        packed, vmask, jnp.asarray(row0, jnp.int32), jnp.asarray(col0, jnp.int32)
    )


@lru_cache(maxsize=None)
def _grm_sharded(mesh, s, t, fetch32=False):
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import AXIS

    def local(pk, cf, vm, row0, col0):
        acc, nm = grm_tile(pk, cf, vm, row0, col0, s, t, fetch32)
        return lax.psum(acc, AXIS), lax.psum(nm, AXIS)

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(), P()),
        out_specs=(P(), P()), check_rep=False,
    ))


def grm_tile_any(packed, coef, vmask, row0, col0, s: int, t: int,
                 fetch32: bool = False):
    """grm_tile that routes block-sharded inputs through shard_map."""
    from ..parallel.mesh import sharded_mesh_of

    mesh = sharded_mesh_of(packed)
    if mesh is None:
        return grm_tile(packed, coef, vmask, row0, col0, s, t, fetch32)
    return _grm_sharded(mesh, s, t, fetch32)(
        packed, coef, vmask,
        jnp.asarray(row0, jnp.int32), jnp.asarray(col0, jnp.int32),
    )


@lru_cache(maxsize=None)
def _grm_chunk_sharded(mesh, s, c, jm16):
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import AXIS

    def local(pk, cf, vm, miss_cts, mv, row0, col0):
        acc, jm = _grm_chunk_local(pk, cf, vm, row0, col0, s, c)
        acc = lax.psum(acc, AXIS)
        jm = lax.psum(jm, AXIS)
        return _grm_chunk_finish(acc, jm, miss_cts, mv, row0, col0, s, c, jm16)

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(), P(), P(), P()),
        out_specs=(P(), P(), P()), check_rep=False,
    ))


def grm_chunk_any(packed, coef, vmask, miss_cts, mv, row0, col0,
                  s: int, c: int, jm16: bool = False):
    """grm_chunk that routes block-sharded inputs through shard_map."""
    from ..parallel.mesh import sharded_mesh_of

    mesh = sharded_mesh_of(packed)
    if mesh is None:
        return grm_chunk(packed, coef, vmask, miss_cts, mv, row0, col0,
                         s, c, jm16)
    return _grm_chunk_sharded(mesh, s, c, jm16)(
        packed, coef, vmask, miss_cts, mv,
        jnp.asarray(row0, jnp.int32), jnp.asarray(col0, jnp.int32),
    )


@lru_cache(maxsize=None)
def _miss_counts_sharded(mesh):
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import AXIS

    def local(pk, vm):
        return lax.psum(sample_miss_counts(pk, vm), AXIS)

    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
        out_specs=P(), check_rep=False,
    ))


def sample_miss_counts_any(packed, vmask):
    from ..parallel.mesh import sharded_mesh_of

    mesh = sharded_mesh_of(packed)
    if mesh is None:
        return sample_miss_counts(packed, vmask)
    return _miss_counts_sharded(mesh)(packed, vmask)


def grm_coefs(
    alt_freq: np.ndarray, is_haploid: np.ndarray, vmask: np.ndarray,
    variance_standardize: bool = True,
) -> np.ndarray:
    """Per-variant normed-dosage values for codes {homref, het, homalt}.

    ref: ExpandCenteredVarmaj (2.0/plink2_matrix_calc.cc:3839-3885):
    value = (x - 2*alt_freq) / sqrt(2*ref*alt), haploid gets an extra 1/sqrt2;
    near-zero-variance variants zero-fill (but stay in the denominator).
    Excluded variants (vmask 0) zero-fill AND must be masked from the
    denominator by the caller via the int8 vmask.
    """
    p = np.asarray(alt_freq, dtype=np.float64)
    var = 2.0 * p * (1.0 - p)
    eps = 2 ** -44  # kSmallEpsilon (2.0/include/plink2_base.h)
    if variance_standardize:
        with np.errstate(divide="ignore", invalid="ignore"):
            inv_sd = np.where(var > eps, 1.0 / np.sqrt(var), 0.0)
    else:
        inv_sd = np.where(np.isfinite(p), 1.0, 0.0)
    inv_sd = np.where(is_haploid, inv_sd / np.sqrt(2.0), inv_sd)
    inv_sd = np.where(vmask, inv_sd, 0.0)
    x = np.stack([np.zeros_like(p), np.ones_like(p), np.full_like(p, 2.0)], axis=1)
    coefs = (x - 2.0 * p[:, None]) * inv_sd[:, None]
    return np.nan_to_num(coefs).astype(np.float32)


class PackedDevice:
    """Whole-cohort packed genotypes as an HBM-resident [nb, vb, NB] tensor.

    Sample columns are compacted to the included set on the host (one cheap
    numpy repack) so device kernels never gather; variant blocks are
    zero-padded and masked via the int8 vmask channel.
    """

    def __init__(
        self,
        ds,
        vmask: np.ndarray,
        vb: int = DEFAULT_VB,
        tile: int = DEFAULT_TILE,
        sample_mask: np.ndarray | None = None,
    ):
        import os

        env_vb = os.environ.get("PLINK_TPU_VB")
        if env_vb:
            vb = max(8, (int(env_vb) // 8) * 8)
        smask = ds.sample_mask if sample_mask is None else sample_mask
        self.include_idx = np.flatnonzero(smask)
        self.n = int(self.include_idx.size)
        # pad the sample axis so every fixed-size tile slice is in-bounds:
        # single tile -> round to 4; multi-tile -> round to a tile multiple
        if self.n <= tile:
            self.tile = self.npad = -(-self.n // 4) * 4
        else:
            self.tile = tile
            self.npad = -(-self.n // tile) * tile
        self.vb = vb
        M = ds.raw_variant_ct
        self.nblocks = max(1, -(-M // vb))
        from ..parallel import mesh as pmesh

        mesh = pmesh.active_mesh() if self.nblocks > 1 else None
        if mesh is not None:
            # shard the variant-block axis over the mesh (P1 data
            # parallelism); padded all-zero blocks are masked via vmask
            self.nblocks = pmesh.pad_to_multiple(self.nblocks, mesh.size)
        nb_bytes = self.npad // 4
        compact = self.include_idx.size != ds.raw_sample_ct
        fullmask = np.asarray(vmask, dtype=bool)
        vm = np.zeros((self.nblocks, vb), dtype=np.int8)
        for bi in range(self.nblocks):
            v0 = bi * vb
            vct = min(vb, max(0, M - v0))
            if vct > 0:
                vm[bi, :vct] = fullmask[v0 : v0 + vct]
        dp = None
        if mesh is None and not compact:
            dp = getattr(ds, "device_all_packed", lambda: None)()
        if dp is not None and dp.shape[1] == nb_bytes:
            # device-side reshape of the dataset's resident copy.  Padding
            # the MAJOR (variant) axis is cheap; padding the byte axis is
            # NOT (relayout of unaligned uint8 on a tunnel-attached TPU
            # measured ~100x slower than re-uploading), hence the exact
            # nb_bytes match requirement.
            pad_v = self.nblocks * vb - M
            dpad = jnp.pad(dp, ((0, pad_v), (0, 0))) if pad_v else dp
            self.packed = dpad.reshape(self.nblocks, vb, nb_bytes)
        else:
            blocks = np.zeros((self.nblocks, vb, nb_bytes), dtype=np.uint8)
            for bi, (v0, packed) in enumerate(ds.iter_packed_blocks(block_size=vb)):
                vct = packed.shape[0]
                if compact:
                    codes = _unpack_np(packed)[:, self.include_idx]
                    packed = _pack_np(codes, self.npad)
                blocks[bi, :vct, : packed.shape[1]] = packed[:, :nb_bytes]
            import jax

            if mesh is not None:
                self.packed = jax.device_put(blocks, pmesh.shard_rows(mesh))
                self.vmask = jax.device_put(vm, pmesh.shard_rows(mesh))
                self.variant_ct = int(fullmask.sum())
                return
            self.packed = jax.device_put(blocks)
        self.vmask = jnp.asarray(vm)
        self.variant_ct = int(fullmask.sum())

    def tile_starts(self) -> list[int]:
        return list(range(0, self.npad, self.tile))


def _unpack_np(packed: np.ndarray) -> np.ndarray:
    """uint8 [V, NB] -> code matrix [V, NB*4] on host."""
    v, nb = packed.shape
    out = np.empty((v, nb, 4), dtype=np.uint8)
    for k in range(4):
        out[:, :, k] = (packed >> (2 * k)) & 3
    return out.reshape(v, nb * 4)


def _pack_np(codes: np.ndarray, npad: int) -> np.ndarray:
    """code matrix [V, n] -> packed uint8 [V, npad/4] on host."""
    v, n = codes.shape
    buf = np.zeros((v, npad), dtype=np.uint8)
    buf[:, :n] = codes
    buf = buf.reshape(v, npad // 4, 4)
    return (
        buf[:, :, 0] | (buf[:, :, 1] << 2) | (buf[:, :, 2] << 4) | (buf[:, :, 3] << 6)
    ).astype(np.uint8)


def iter_lower_tiles(n: int, tile: int):
    """Yield (row0, col0) lower-triangle tile origins covering all pairs i>j."""
    starts = list(range(0, n, tile))
    for r0 in starts:
        for c0 in starts:
            if c0 <= r0:
                yield r0, c0
