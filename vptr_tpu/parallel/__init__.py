from vptr_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    host_id,
    make_mesh,
    num_hosts,
    replicated,
    shard_params,
    tp_param_specs,
)
