"""Streaming randomized-PCA operators (ref: CalcPca approx mode,
2.0/plink2_matrix_calc.cc:5697-5930, itself a port of EIGENSOFT 6
kjg_fpca.c / Halko-Martinsson-Shkolnisky-Tygert 2011).

The standardized genotype matrix X [M, n] never materializes: each power
iteration streams the HBM-resident packed blocks through the same
normed-dosage decode as the GRM kernel, computing X^T (X Q) with two MXU
matmuls per block.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .planes import unpack_codes


def _normed_block(pk: jax.Array, cf: jax.Array, smask: jax.Array) -> jax.Array:
    """packed [vb, NB] uint8 + coefs [vb, 3] f32 + sample mask [npad] ->
    standardized dosages [vb, n] f32 (missing -> 0; excluded variants have
    zero coefs; pgen pad samples beyond the true count zeroed)."""
    codes = unpack_codes(pk, 0)
    b0 = (codes & 1).astype(jnp.float32)
    b1 = ((codes >> 1) & 1).astype(jnp.float32)
    miss = b0 * b1
    r = 1.0 - b0 - b1 + miss
    h = b0 - miss
    a = b1 - miss
    return (r * cf[:, 0:1] + h * cf[:, 1:2] + a * cf[:, 2:3]) * smask[None, :]


@jax.jit
def xtx_apply(
    packed: jax.Array, coef: jax.Array, smask: jax.Array, q: jax.Array
) -> jax.Array:
    """(X^T X) @ q streamed over variant blocks.

    packed [nb, vb, NB], coef [nb, vb, 3], q [npad, L] -> [npad, L] f32.
    """

    def body(acc, xs):
        pk, cf = xs
        z = _normed_block(pk, cf, smask)
        t = lax.dot_general(
            z, q, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
        )
        acc = acc + lax.dot_general(
            z, t, (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
        )
        return acc, None

    acc0 = jnp.zeros((packed.shape[2] * 4, q.shape[1]), jnp.float32)
    acc, _ = lax.scan(body, acc0, (packed, coef))
    return acc


@jax.jit
def x_apply(
    packed: jax.Array, coef: jax.Array, smask: jax.Array, q: jax.Array
) -> jax.Array:
    """X @ q streamed: -> [nb, vb, L] f32 (caller trims the variant pad)."""

    def body(_, xs):
        pk, cf = xs
        z = _normed_block(pk, cf, smask)
        return None, lax.dot_general(
            z, q, (((1,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
        )

    _, out = lax.scan(body, None, (packed, coef))
    return out


@jax.jit
def xt_apply(
    packed: jax.Array, coef: jax.Array, smask: jax.Array, b: jax.Array
) -> jax.Array:
    """X^T @ b streamed: b [nb, vb, L] -> [npad, L] f32."""

    def body(acc, xs):
        pk, cf, bb = xs
        z = _normed_block(pk, cf, smask)
        return acc + lax.dot_general(
            z, bb, (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
        ), None

    acc0 = jnp.zeros((packed.shape[2] * 4, b.shape[2]), jnp.float32)
    acc, _ = lax.scan(body, acc0, (packed, coef, b))
    return acc


# --- mesh-sharded dispatchers (variant-block axis sharded, psum over ICI) ---

from functools import lru_cache


@lru_cache(maxsize=None)
def _pca_sharded(mesh, which):
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import AXIS

    if which == "xtx":
        def local(packed, coef, smask, q):
            return lax.psum(xtx_apply(packed, coef, smask, q), AXIS)

        in_specs = (P(AXIS), P(AXIS), P(), P())
        out_specs = P()
    elif which == "x":
        def local(packed, coef, smask, q):
            return x_apply(packed, coef, smask, q)

        in_specs = (P(AXIS), P(AXIS), P(), P())
        out_specs = P(AXIS)
    else:  # xt
        def local(packed, coef, smask, b):
            return lax.psum(xt_apply(packed, coef, smask, b), AXIS)

        in_specs = (P(AXIS), P(AXIS), P(), P(AXIS))
        out_specs = P()
    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_rep=False,
    ))


def _dispatch(which, fallback, packed, coef, smask, last):
    from ..parallel.mesh import sharded_mesh_of

    mesh = sharded_mesh_of(packed)
    if mesh is None:
        return fallback(packed, coef, smask, last)
    return _pca_sharded(mesh, which)(packed, coef, smask, last)


def xtx_apply_any(packed, coef, smask, q):
    """(X^T X) @ q with block-sharded streaming + psum when on a mesh."""
    return _dispatch("xtx", xtx_apply, packed, coef, smask, q)


def x_apply_any(packed, coef, smask, q):
    return _dispatch("x", x_apply, packed, coef, smask, q)


def xt_apply_any(packed, coef, smask, b):
    return _dispatch("xt", xt_apply, packed, coef, smask, b)
