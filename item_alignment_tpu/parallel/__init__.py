from item_alignment_tpu.parallel.mesh import create_mesh  # noqa: F401
from item_alignment_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_partition_spec,
    shard_params,
    tree_shardings,
)
