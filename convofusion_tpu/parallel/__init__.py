from convofusion_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicate,
    shard_batch,
)
