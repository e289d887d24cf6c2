from .mesh import (  # noqa: F401
    make_mesh,
    shard_data,
    replicate,
    initialize_distributed,
)
from .tp import (  # noqa: F401
    make_mesh_2d,
    tree_partition_specs,
    shard_tree,
    shard_batch_2d,
)
