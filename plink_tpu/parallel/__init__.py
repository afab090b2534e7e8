from .mesh import (
    device_count,
    get_mesh,
    replicated,
    shard_rows,
    with_variant_sharding,
)

__all__ = ["get_mesh", "device_count", "shard_rows", "replicated", "with_variant_sharding"]
