"""Multi-host support: single-process degeneration + loader sharding."""

import jax
import jax.numpy as jnp
import numpy as np

from stego_tpu.data.loader import DataLoader
from stego_tpu.parallel.mesh import batch_sharding, make_mesh
from stego_tpu.parallel.multihost import (
    global_batch,
    is_primary,
    maybe_initialize_distributed,
    process_shard,
)


def test_single_process_passthrough():
    assert maybe_initialize_distributed() is False
    assert is_primary()
    np.testing.assert_array_equal(process_shard(10), np.arange(10))


def test_global_batch_equals_sharded_device_put(cpu_devices):
    mesh = make_mesh()
    batch = {"img": np.random.default_rng(0).standard_normal(
        (8, 4, 4, 3)).astype(np.float32)}
    g = global_batch(mesh, batch)
    direct = jax.device_put(jnp.asarray(batch["img"]), batch_sharding(mesh))
    np.testing.assert_array_equal(np.asarray(g["img"]), np.asarray(direct))
    assert g["img"].sharding.is_equivalent_to(direct.sharding, 4)


def test_loader_sharding_partitions_globally():
    data = [{"x": np.full((2,), i)} for i in range(17)]
    shards = []
    for si in range(4):
        loader = DataLoader(data, batch_size=2, shuffle=True, seed=3,
                            num_shards=4, shard_index=si, prefetch=0)
        seen = []
        for b in loader:
            seen.extend(b["x"][:, 0].tolist())
        shards.append(seen)
        assert len(loader) == 2  # 17 -> 4 per shard -> 2 batches of 2
    flat = [v for s in shards for v in s]
    # disjoint across shards
    assert len(set(flat)) == len(flat)
    # equal lengths -> same number of steps on every host
    assert len({len(s) for s in shards}) == 1
