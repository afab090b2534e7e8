"""On-device genotype plane decode.

Genotypes travel host->HBM as 2-bit-packed uint8 ([V, ceil(N/4)], pgen
encoding 0=hom-REF 1=het 2=hom-ALT 3=missing) and are expanded on device.
This replaces the reference's CPU popcount/SSE layer
(2.0/include/plink2_bits.{h,cc}, plink2_simd.h): once decoded to {0,1}
"planes", every popcount statistic becomes an MXU matmul or VPU reduction,
and XLA fuses the decode into the consuming op so packed data is read from
HBM at 2 bits/genotype.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def unpack_codes(packed: jax.Array, sample_ct: int) -> jax.Array:
    """uint8 [..., NB] -> uint8 codes [..., NB*4] (caller slices to N).

    Padding genotypes (beyond sample_ct) decode to 0 (hom-REF); mask them
    with a sample mask when they matter.
    """
    shifts = jnp.arange(4, dtype=jnp.uint8) * 2
    expanded = (packed[..., None] >> shifts) & 3  # [..., NB, 4]
    return expanded.reshape(*packed.shape[:-1], packed.shape[-1] * 4)


def bit_planes(codes: jax.Array, dtype=jnp.bfloat16) -> tuple[jax.Array, jax.Array, jax.Array]:
    """codes -> (b0, b1, miss) planes.

    b0 = low bit (set for het & missing), b1 = high bit (set for hom-ALT &
    missing), miss = b0*b1.  Derived planes: het = b0 - miss,
    homalt = b1 - miss, dosage = b0 + b1 - 2*miss (wait: dosage = het + 2*homalt
    = b0 + b1 + ... computed by callers from these three).
    """
    b0 = (codes & 1).astype(dtype)
    b1 = (codes >> 1).astype(dtype)
    miss = b0 * b1
    return b0, b1, miss


def category_planes(codes: jax.Array, dtype=jnp.bfloat16):
    """codes -> (homref, het, homalt, miss) one-hot planes."""
    b0 = codes & 1
    b1 = codes >> 1
    miss = (b0 & b1).astype(dtype)
    het = (b0 & (1 - b1)).astype(dtype)
    homalt = (b1 & (1 - b0)).astype(dtype)
    homref = ((1 - b0) & (1 - b1)).astype(dtype)
    return homref, het, homalt, miss


def dosage_and_valid(codes: jax.Array, dtype=jnp.float32) -> tuple[jax.Array, jax.Array]:
    """codes -> (ALT dosage with missing=0, validity mask)."""
    b0 = (codes & 1).astype(dtype)
    b1 = (codes >> 1).astype(dtype)
    miss = b0 * b1
    dosage = b0 + 2 * b1 - 3 * miss  # het=1, homalt=2, miss: 1+2-3=0
    valid = 1 - miss
    return dosage, valid
