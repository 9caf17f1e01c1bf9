from tactile_gan_tpu.parallel.mesh import (
    batch_sharding, make_mesh, maybe_init_distributed, replicate_sharding,
    shard_batch, shard_state, shard_state_tp,
)
