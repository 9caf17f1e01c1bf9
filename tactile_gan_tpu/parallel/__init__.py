from tactile_gan_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicate_sharding, shard_batch, shard_state,
)
