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


def active_mesh() -> Mesh | None:
    """The production mesh, or None on a single-device system.

    Commands consult this to decide whether block tensors are placed
    sharded over the variant-block axis (P1 of SURVEY.md section 2.6) —
    single-device systems keep the zero-overhead resident-array paths.
    PLINK_TPU_DEVICES caps the device count (1 disables sharding; tests use
    it for single-vs-multi-device equivalence checks)."""
    import os

    env = os.environ.get("PLINK_TPU_DEVICES")
    cap = int(env) if env else None
    if cap is not None and cap <= 1:
        return None
    if jax.device_count() <= 1:
        return None
    return get_mesh(cap)


def sharded_mesh_of(arr) -> Mesh | None:
    """The mesh an array is block-sharded over (leading axis on AXIS), or
    None for replicated/single-device arrays.  Kernel dispatchers use this
    to pick the shard_map path."""
    sh = getattr(arr, "sharding", None)
    if not isinstance(sh, NamedSharding):
        return None
    spec = sh.spec
    if not spec or spec[0] != AXIS:
        return None
    m = sh.mesh
    if isinstance(m, jax.sharding.AbstractMesh):
        m = get_mesh()
    return m if m.size > 1 else None


def put_blocks(host_blocks: np.ndarray, mesh: Mesh | None = None) -> jax.Array:
    """Place a [nb, ...] block tensor sharded over the block axis, padding
    nb to a mesh multiple with zero blocks (callers mask them out)."""
    mesh = mesh or get_mesh()
    nb = host_blocks.shape[0]
    nbp = pad_to_multiple(nb, mesh.size)
    if nbp != nb:
        pad = [(0, nbp - nb)] + [(0, 0)] * (host_blocks.ndim - 1)
        host_blocks = np.pad(host_blocks, pad)
    return jax.device_put(host_blocks, shard_rows(mesh))
