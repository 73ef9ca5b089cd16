from .mesh import (  # noqa: F401
    data_sharding,
    halo_exchange_y,
    make_mesh,
    replicated,
    shard_batch,
    spatial_sharding,
)
