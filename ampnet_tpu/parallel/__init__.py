from ampnet_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_sharded_step_fns,
    replicate_sharding,
    shard_batch,
)
