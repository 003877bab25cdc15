from .mesh import (  # noqa: F401
    P,
    data_sharding,
    make_mesh,
    model_sharding,
    replicated,
    shard_msa,
)
