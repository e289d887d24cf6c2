from .mesh import (  # noqa: F401
    make_mesh,
    shard_data,
    replicate,
    initialize_distributed,
)
