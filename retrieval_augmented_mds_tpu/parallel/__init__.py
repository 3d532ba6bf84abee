from .mesh import (  # noqa: F401
    MeshSpec,
    best_mesh,
    data_sharding,
    host_staging,
    replicated,
    shard_index_rows,
    with_mesh,
)
from .zero import zero_sharding_for_tree  # noqa: F401
