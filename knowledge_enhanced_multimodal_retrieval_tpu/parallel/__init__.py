from .mesh import MeshRuntime, make_mesh, runtime_init  # noqa: F401
from .sharding import (  # noqa: F401
    batch_sharding,
    host_local_batch_to_global,
    pad_to_multiple,
    replicated,
    shard_params,
)
from .tp import shard_params_tp, tp_param_pspecs, tp_shardings  # noqa: F401
from .pp import pipeline_apply, stack_stages, stage_sharding  # noqa: F401
from .sp import ring_attention, sp_block_apply  # noqa: F401
from .ep import ep_shardings, init_moe_params, moe_apply  # noqa: F401
from .fsdp import fsdp_param_pspecs, fsdp_shardings, shard_params_fsdp  # noqa: F401
