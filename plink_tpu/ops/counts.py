"""Genotype counting kernels.

Replaces the reference's popcount counting pipeline
(LoadAlleleAndGenoCounts, 2.0/plink2_data.cc:2970 and
LoadAlleleAndGenoCountsThread :2304): per-variant genotype category counts
are three masked plane reductions on device, fused by XLA with the 2-bit
unpack so the packed representation is read straight from HBM.

All counts are exact: planes hold {0,1} and reductions accumulate in f32
(exact below 2^24 per partial sum) on a bf16xbf16->f32 dot.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

from .planes import unpack_codes


# Below this many genotypes the tunnel round trip (~40 ms on networked
# TPU attachments) dwarfs the count itself: use host numpy instead.
HOST_SMALL_GENOTYPES = 1 << 22


def _unpack_np(packed: np.ndarray) -> np.ndarray:
    """uint8 [V, NB] -> codes [V, NB*4] on host (small panels only)."""
    v, nb = packed.shape
    out = np.empty((v, nb, 4), dtype=np.uint8)
    for k in range(4):
        out[:, :, k] = (packed >> (2 * k)) & 3
    return out.reshape(v, nb * 4)


def _np_counts_masked(packed: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Host counts [V, 4] (homref, het, homalt, missing) over mask>0 cols."""
    codes = _unpack_np(packed)
    m = np.asarray(mask) > 0
    cm = codes[:, : m.size][:, m]
    out = np.empty((packed.shape[0], 4), np.int64)
    for c in range(4):
        out[:, c] = (cm == c).sum(axis=1)
    return out


@partial(jax.jit, static_argnames=("npad",))
def _geno_counts_masked(packed: jax.Array, mask: jax.Array, npad: int) -> jax.Array:
    """packed uint8 [V, NB], mask f32 [npad] (0/1) -> int32 counts [V, 4].

    Column order: hom-REF, het, hom-ALT, missing.
    """
    codes = unpack_codes(packed, npad)[:, :npad]
    b0 = (codes & 1).astype(jnp.bfloat16)
    b1 = (codes >> 1).astype(jnp.bfloat16)
    m = mask.astype(jnp.bfloat16)
    s0 = jnp.dot(b0, m, preferred_element_type=jnp.float32)
    s1 = jnp.dot(b1, m, preferred_element_type=jnp.float32)
    s01 = jnp.dot(b0 * b1, m, preferred_element_type=jnp.float32)
    n_mask = jnp.sum(mask, dtype=jnp.float32)
    n_miss = s01
    n_het = s0 - s01
    n_alt2 = s1 - s01
    n_ref = n_mask - n_het - n_alt2 - n_miss
    return jnp.stack([n_ref, n_het, n_alt2, n_miss], axis=1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("npad",))
def _sample_miss_counts(packed: jax.Array, vmask: jax.Array, npad: int) -> jax.Array:
    """Per-sample missing counts: packed [V, NB], vmask f32 [V] -> int32 [npad]."""
    codes = unpack_codes(packed, npad)[:, :npad]
    b0 = (codes & 1).astype(jnp.bfloat16)
    b1 = (codes >> 1).astype(jnp.bfloat16)
    miss = b0 * b1
    return jnp.dot(vmask.astype(jnp.bfloat16), miss, preferred_element_type=jnp.float32).astype(
        jnp.int32
    )


@partial(jax.jit, static_argnames=("npad",))
def _sample_het_hom_counts(packed: jax.Array, vmask: jax.Array, npad: int) -> jax.Array:
    """Per-sample (het, hom-alt, missing) counts -> int32 [3, npad]."""
    codes = unpack_codes(packed, npad)[:, :npad]
    b0 = (codes & 1).astype(jnp.bfloat16)
    b1 = (codes >> 1).astype(jnp.bfloat16)
    miss = b0 * b1
    vm = vmask.astype(jnp.bfloat16)
    s0 = jnp.dot(vm, b0, preferred_element_type=jnp.float32)
    s1 = jnp.dot(vm, b1, preferred_element_type=jnp.float32)
    sm = jnp.dot(vm, miss, preferred_element_type=jnp.float32)
    return jnp.stack([s0 - sm, s1 - sm, sm]).astype(jnp.int32)


@partial(jax.jit, static_argnames=("npad",))
def _geno_counts_multimask(packed: jax.Array, masks: jax.Array, npad: int) -> jax.Array:
    """packed uint8 [V, NB], masks f32 [npad, G] -> int32 counts [G, V, 4].

    One device upload + one set of plane matmuls for G sample subsets
    (all/male/female in the freq/hardy path), instead of G separate passes.
    """
    codes = unpack_codes(packed, npad)[:, :npad]
    b0 = (codes & 1).astype(jnp.bfloat16)
    b1 = (codes >> 1).astype(jnp.bfloat16)
    m = masks.astype(jnp.bfloat16)
    s0 = jnp.dot(b0, m, preferred_element_type=jnp.float32)  # [V, G]
    s1 = jnp.dot(b1, m, preferred_element_type=jnp.float32)
    s01 = jnp.dot(b0 * b1, m, preferred_element_type=jnp.float32)
    n_mask = jnp.sum(masks, axis=0, dtype=jnp.float32)[None, :]
    n_miss = s01
    n_het = s0 - s01
    n_alt2 = s1 - s01
    n_ref = n_mask - n_het - n_alt2 - n_miss
    return jnp.stack([n_ref, n_het, n_alt2, n_miss], axis=2).transpose(1, 0, 2).astype(
        jnp.int32
    )


def geno_counts_multimask(
    packed: np.ndarray, sample_ct: int, masks: list[np.ndarray]
) -> list[np.ndarray]:
    """Per-variant counts [V, 4] for several sample masks in one device pass."""
    npad = ((sample_ct + 3) // 4) * 4
    mm = np.zeros((npad, len(masks)), dtype=np.float32)
    for g, m in enumerate(masks):
        mm[: m.shape[0], g] = m.astype(np.float32)
    out = np.asarray(_geno_counts_multimask(jnp.asarray(packed), jnp.asarray(mm), npad))
    return [out[g].astype(np.int64) for g in range(len(masks))]


@partial(jax.jit, static_argnames=("npad",))
def _geno_counts_scan(blocks: jax.Array, masks: jax.Array, npad: int) -> jax.Array:
    """Whole-dataset multimask counts in ONE device call.

    blocks [nb, vb, NB] uint8, masks f32 [npad, G] -> int32 [nb, G, vb, 4].
    lax.scan over blocks: one dispatch + one small fetch instead of a
    blocking round trip per block (round-trip latency on a tunnel-attached
    TPU costs far more than the counting matmuls themselves).
    """

    def body(carry, pk):
        return carry, _geno_counts_multimask(pk, masks, npad)

    _, outs = lax.scan(body, 0, blocks)
    return outs


def _counts_scan_any(blocks, masks, npad):
    from ..parallel.mesh import sharded_mesh_of

    mesh = sharded_mesh_of(blocks)
    if mesh is None:
        return _geno_counts_scan(blocks, masks, npad)
    return _counts_scan_sharded(mesh, npad)(blocks, masks)


@lru_cache(maxsize=None)
def _counts_scan_sharded(mesh, npad):
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import AXIS

    def local(blocks, masks):
        def body(carry, pk):
            return carry, _geno_counts_multimask(pk, masks, npad)

        _, outs = lax.scan(body, 0, blocks)
        return outs

    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=(P(AXIS), P()), out_specs=P(AXIS),
        check_rep=False,
    ))


def geno_counts_multimask_all(
    blocks, sample_ct: int, masks: list[np.ndarray], variant_ct: int
) -> list[np.ndarray]:
    """Counts for the full dataset from a device-resident [nb, vb, NB]
    block tensor (block-sharded tensors scan per-device); returns per-mask
    int64 [variant_ct, 4]."""
    npad = ((sample_ct + 3) // 4) * 4
    mm = np.zeros((npad, len(masks)), dtype=np.float32)
    for g, m in enumerate(masks):
        mm[: m.shape[0], g] = m.astype(np.float32)
    out = np.asarray(_counts_scan_any(blocks, jnp.asarray(mm), npad))
    nb, G, vb, _ = out.shape
    flat = out.transpose(1, 0, 2, 3).reshape(G, nb * vb, 4)[:, :variant_ct]
    return [flat[g].astype(np.int64) for g in range(len(masks))]


@partial(jax.jit, static_argnames=("npad", "f64"))
def _sample_plane_weighted(
    packed: jax.Array, wts: jax.Array, npad: int, f64: bool
) -> jax.Array:
    """packed [V, NB], wts [V, 4] (weights for homref/het/homalt/missing
    planes) -> per-sample weighted sums [npad].

    One pass serves --het (expected-het corrections), --score (per-variant
    coefficient x genotype-class), and --sample-counts (class indicators).
    f64=True runs the dots in float64 (small V*n cost, needed where 6-sig-fig
    output sits on a rounding boundary).
    """
    dt = jnp.float64 if f64 else jnp.float32
    codes = unpack_codes(packed, npad)[:, :npad]
    b0 = (codes & 1).astype(dt)
    b1 = ((codes >> 1) & 1).astype(dt)
    miss = b0 * b1
    het = b0 - miss
    homalt = b1 - miss
    homref = 1.0 - b0 - b1 + miss
    hi = jax.lax.Precision.HIGHEST
    w = wts.astype(dt)
    dotv = lambda wv, p: jnp.dot(wv, p, preferred_element_type=dt, precision=hi)
    return (
        dotv(w[:, 0], homref)
        + dotv(w[:, 1], het)
        + dotv(w[:, 2], homalt)
        + dotv(w[:, 3], miss)
    )


def sample_plane_weighted(
    packed: np.ndarray, sample_ct: int, wts: np.ndarray, f64: bool = True
) -> np.ndarray:
    """Host wrapper: per-sample weighted plane sums (float64 [sample_ct])."""
    npad = ((sample_ct + 3) // 4) * 4
    out = _sample_plane_weighted(
        jnp.asarray(packed), jnp.asarray(wts), npad, f64
    )
    return np.asarray(out, dtype=np.float64)[:sample_ct]


@partial(jax.jit, static_argnames=("npad", "f64"))
def _variant_plane_weighted(
    packed: jax.Array, w: jax.Array, npad: int, f64: bool
) -> jax.Array:
    """packed [V, NB], w [npad, K] sample weights -> [V, K, 3] weighted sums
    over the (het, hom-alt, valid) planes.  One MXU matmul per plane serves
    --variant-score: score_vk = het_vk + 2*homalt_vk +
    (wtot_k - valid_vk) * 2*altfreq_v (forced mean imputation,
    2.0/plink2_matrix_calc.cc:9296)."""
    dt = jnp.float64 if f64 else jnp.float32
    codes = unpack_codes(packed, npad)[:, :npad]
    b0 = (codes & 1).astype(dt)
    b1 = ((codes >> 1) & 1).astype(dt)
    miss = b0 * b1
    het = b0 - miss
    homalt = b1 - miss
    valid = 1.0 - miss
    hi = jax.lax.Precision.HIGHEST
    wd = w.astype(dt)
    m = lambda p: jnp.dot(p, wd, preferred_element_type=dt, precision=hi)
    return jnp.stack([m(het), m(homalt), m(valid)], axis=2)


def variant_plane_weighted(
    packed: np.ndarray, sample_ct: int, w: np.ndarray, f64: bool = True
) -> np.ndarray:
    """Host wrapper: [V, K, 3] (het, homalt, valid) weighted sums."""
    npad = ((sample_ct + 3) // 4) * 4
    wpad = np.zeros((npad, w.shape[1]), dtype=np.float64 if f64 else np.float32)
    wpad[:sample_ct] = w
    return np.asarray(
        _variant_plane_weighted(jnp.asarray(packed), jnp.asarray(wpad), npad, f64),
        dtype=np.float64,
    )


def _pad_mask(mask: np.ndarray, npad: int) -> np.ndarray:
    out = np.zeros(npad, dtype=np.float32)
    out[: mask.shape[0]] = mask.astype(np.float32)
    return out


class GenoCounter:
    """Streaming per-variant/per-sample counting over variant blocks.

    Feed packed blocks in variant order; accumulates device-side results.
    """

    def __init__(self, sample_ct: int, sample_mask: np.ndarray | None = None):
        self.sample_ct = sample_ct
        self.npad = ((sample_ct + 3) // 4) * 4
        mask = np.ones(sample_ct, dtype=np.float32) if sample_mask is None else sample_mask
        self._mask_np = _pad_mask(mask, self.npad)
        self._mask = None  # device copy, created on first device-path block
        self.n_samples = int(mask.sum())
        self._per_variant: list[np.ndarray] = []

    def add_block(self, packed: np.ndarray) -> np.ndarray:
        if packed.size * 4 <= HOST_SMALL_GENOTYPES \
                and isinstance(packed, np.ndarray):
            arr = _np_counts_masked(packed, self._mask_np)
        else:
            if self._mask is None:
                self._mask = jnp.asarray(self._mask_np)
            counts = _geno_counts_masked(
                jnp.asarray(packed), self._mask, self.npad)
            arr = np.asarray(counts)
        self._per_variant.append(arr)
        return arr

    def result(self) -> np.ndarray:
        """int64 [V, 4] counts: hom-ref, het, hom-alt, missing."""
        if not self._per_variant:
            return np.zeros((0, 4), dtype=np.int64)
        return np.concatenate(self._per_variant).astype(np.int64)


def geno_counts(packed: np.ndarray, sample_ct: int, sample_mask: np.ndarray | None = None) -> np.ndarray:
    """One-shot per-variant counts for a packed block. [V, 4] int64."""
    gc = GenoCounter(sample_ct, sample_mask)
    gc.add_block(packed)
    return gc.result()


def sample_missing_counts(
    packed: np.ndarray, sample_ct: int, vmask: np.ndarray | None = None
) -> np.ndarray:
    """Per-sample missing-genotype counts for a packed block. [N] int64."""
    npad = ((sample_ct + 3) // 4) * 4
    V = packed.shape[0]
    vm = np.ones(V, dtype=np.float32) if vmask is None else vmask.astype(np.float32)
    if packed.size * 4 <= HOST_SMALL_GENOTYPES and isinstance(packed, np.ndarray):
        codes = _unpack_np(packed)
        miss = (codes == 3) * (vm[:, None] > 0)
        return miss.sum(axis=0)[:sample_ct].astype(np.int64)
    out = _sample_miss_counts(jnp.asarray(packed), jnp.asarray(vm), npad)
    return np.asarray(out)[:sample_ct].astype(np.int64)


def sample_het_hom_counts(
    packed: np.ndarray, sample_ct: int, vmask: np.ndarray | None = None
) -> np.ndarray:
    """Per-sample [3, N] (het, hom-alt, missing) counts for a packed block."""
    npad = ((sample_ct + 3) // 4) * 4
    V = packed.shape[0]
    vm = np.ones(V, dtype=np.float32) if vmask is None else vmask.astype(np.float32)
    out = _sample_het_hom_counts(jnp.asarray(packed), jnp.asarray(vm), npad)
    return np.asarray(out)[:, :sample_ct].astype(np.int64)
