from .mesh import MeshRuntime, make_mesh, runtime_init  # noqa: F401
from .sharding import (  # noqa: F401
    batch_sharding,
    host_local_batch_to_global,
    pad_to_multiple,
    replicated,
    shard_params,
)
