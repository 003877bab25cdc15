from .mesh import (  # noqa: F401
    P,
    data_sharding,
    make_mesh,
    model_sharding,
    replicated,
    shard_msa,
)
from .data import (  # noqa: F401
    ShardedMSA,
    read_msa_distributed,
    weights_distributed,
)
from .fit import (  # noqa: F401
    fit_plm_sharded,
    init_distributed,
    mfdca_sharded,
    sequence_weights_sharded,
)
