"""Device mesh and sharding policy.

The reference is a single-node pthreads tool (SURVEY.md section 2.6); its
parallel axes map to TPU as:
  P1 variant-block data parallelism  -> shard the variant axis over the mesh
  P2 sample-pair tile parallelism    -> shard one side of Gram products; psum
  P3 within-variant SIMD             -> VPU/MXU lanes (free)
  P4 BLAS threads                    -> XLA dot_general on the MXU

One 1-D mesh axis "d" covers both uses: streaming per-variant statistics
shard rows (variants) across devices with no collectives; Gram-matrix
kernels (KING/GRM/PCA) contract over the sharded variant axis, and XLA
inserts the psum over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_mesh: Mesh | None = None

AXIS = "d"


def get_mesh(n_devices: int | None = None) -> Mesh:
    global _mesh
    if _mesh is None or (n_devices is not None and _mesh.size != n_devices):
        devs = jax.devices()
        if n_devices is not None:
            devs = devs[:n_devices]
        _mesh = Mesh(np.array(devs), (AXIS,))
    return _mesh


def set_mesh(mesh: Mesh) -> None:
    global _mesh
    _mesh = mesh


def device_count() -> int:
    return get_mesh().size


def shard_rows(mesh: Mesh | None = None) -> NamedSharding:
    """Sharding for arrays whose leading axis is the variant axis."""
    return NamedSharding(mesh or get_mesh(), P(AXIS))


def replicated(mesh: Mesh | None = None) -> NamedSharding:
    return NamedSharding(mesh or get_mesh(), P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def with_variant_sharding(arr: jax.Array | np.ndarray, mesh: Mesh | None = None) -> jax.Array:
    """Place a [V, ...] array on device, sharded over variants, padding V to
    a multiple of the mesh size (padding rows are zeros)."""
    mesh = mesh or get_mesh()
    v = arr.shape[0]
    vp = pad_to_multiple(v, mesh.size)
    if vp != v:
        pad = [(0, vp - v)] + [(0, 0)] * (arr.ndim - 1)
        arr = np.pad(np.asarray(arr), pad)
    return jax.device_put(arr, shard_rows(mesh))
