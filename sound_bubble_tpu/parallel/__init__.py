from sound_bubble_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, get_mesh, pad_batch, replicated, shard_batch,
)
