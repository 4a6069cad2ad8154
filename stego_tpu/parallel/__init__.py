from stego_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    host_split,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
