from .distributed import (  # noqa: F401
    global_mesh,
    init_distributed,
    process_batch_slice,
    shard_host_batch,
)
from .mesh import (  # noqa: F401
    batch_sharding,
    head_sharding,
    make_mesh,
    make_pp_mesh,
    replicate,
    shard_batch,
)
from .pipeline import (  # noqa: F401
    PipelinedModel,
    merge_raw_variables,
    merge_variables,
    split_variables,
)
