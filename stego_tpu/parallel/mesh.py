"""Device mesh + sharding layer: the framework's "communication backend".

The reference's distribution story is Lightning DDP over NCCL
(train_segmentation.py:476) plus torchmetrics dist-sync (utils.py:209-217).
Here the same semantics fall out of sharded ``jit`` over a named mesh:

* a 1-D ``data`` axis carries the batch; parameters are replicated;
* gradient all-reduce, metric confusion-matrix reduction, and the batch-wide
  negative-sampling gathers are XLA collectives over ICI inserted by the
  partitioner — no hand-written backend;
* the KNN index build all-gathers per-device feature shards (see
  stego_tpu/train/knn.py);
* Pallas kernels (pure batch parallelism, no cross-shard coupling) run
  per-shard via :func:`shard_kernel` (``jax.shard_map``) so the fast paths
  survive multi-chip meshes.

The same code runs single-chip (mesh of 1) and on a virtual 8-device CPU mesh
in the test suite.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over local devices (0 = all)."""
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def shard_kernel(fn, mesh: Optional[Mesh], n_in: int, n_out: int = 1,
                 n_rep: int = 0):
    """Run a batch-parallel Pallas kernel per shard of a >1-device mesh.

    GSPMD cannot auto-partition Mosaic (Pallas) custom calls, but every
    kernel in this repo grids over the batch dimension with zero cross-batch
    coupling, so manual partitioning via ``jax.shard_map`` is exact: each
    device runs the identical kernel on its contiguous batch shard, and the
    surrounding XLA program (loss finalize reductions, negative-sample
    gathers, metric psums) is auto-partitioned around it. This keeps the
    measured single-chip fast paths — kernel attention, the fused correlation
    loss, and dense full-field mode — live at any mesh size (reference DDP
    keeps its full per-GPU perf path likewise, train_segmentation.py:476).

    ``fn`` must derive all shapes from its array arguments (it is traced with
    per-shard shapes). With no mesh (or one device) ``fn`` is returned as-is.
    The last ``n_rep`` arguments are replicated (whole array on every device)
    rather than batch-sharded — used for small traced parameters (e.g. the
    layernorm scale/bias) that shard_map cannot capture by closure.
    """
    if mesh is None or mesh.devices.size <= 1:
        return fn
    d = mesh.devices.size
    spec = P(DATA_AXIS)
    out_specs = spec if n_out == 1 else tuple([spec] * n_out)
    in_specs = (spec,) * n_in + (P(),) * n_rep
    sharded = jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                            out_specs=out_specs, check_vma=False)

    def wrapped(*args):
        for a in args[:n_in]:
            if a.shape[0] % d:
                raise ValueError(
                    f"kernel batch dim {a.shape[0]} not divisible by mesh "
                    f"size {d} — Pallas kernels shard the batch contiguously "
                    f"(pad the batch or adjust batch_size)")
        return sharded(*args)

    return wrapped


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (n_steps, batch, ...) stacks: steps replicated in time,
    batch sharded over the data axis (multi-step dispatch,
    train/segmenter.py:make_cached_multi_step)."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def sharded_row_take(arr, ind, mesh: Mesh):
    """Gather rows of a ROW-SHARDED array by global indices (embedding-lookup
    pattern).

    ``arr`` (N, ...) lives block-distributed over the ``data`` axis (device k
    owns rows [k·N/d, (k+1)·N/d)); ``ind`` (B,) int32 is batch-sharded. Each
    device all-gathers the tiny index vector, serves the rows it owns (zeros
    elsewhere), and a reduce-scatter sums the single owner's contribution
    into the batch-sharded result — the standard sharded-embedding-table
    gather, riding ICI. Out-of-range indices (e.g. -1 validation padding)
    produce zero rows. N must be divisible by the mesh size (the cache
    builder pads).

    Cost per call ≈ one (B, ...) reduce-scatter; for the train footprint's
    feature rows that is a few MB over ICI — noise next to the step. The
    payoff: cache capacity scales with the mesh (a replicated cache is
    capped by ONE device's HBM).
    """
    if mesh is None or mesh.devices.size <= 1:
        # degenerate case: a plain clipped take (negative padding indices
        # yield row 0; downstream label masking ignores those pixels exactly
        # as in the replicated path)
        return jnp.take(arr, jnp.maximum(ind, 0), axis=0)

    def body(a_local, ind_local):
        idx_all = jax.lax.all_gather(ind_local, DATA_AXIS, tiled=True)
        k = jax.lax.axis_index(DATA_AXIS)
        rows = a_local.shape[0]
        local_idx = idx_all - k * rows
        own = (local_idx >= 0) & (local_idx < rows)
        safe = jnp.clip(local_idx, 0, rows - 1)
        vals = jnp.take(a_local, safe, axis=0)
        own = own.reshape((-1,) + (1,) * (vals.ndim - 1))
        vals = jnp.where(own, vals, jnp.zeros((), vals.dtype))
        return jax.lax.psum_scatter(vals, DATA_AXIS, scatter_dimension=0,
                                    tiled=True)

    spec = P(DATA_AXIS)
    return jax.shard_map(body, mesh=mesh, in_specs=(spec, spec),
                         out_specs=spec, check_vma=False)(arr, ind)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a pytree of host arrays with the batch dim sharded over the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def host_split(n: int, mesh: Mesh) -> int:
    """Per-device batch size; validates divisibility early with a clear error."""
    d = mesh.devices.size
    if n % d != 0:
        raise ValueError(f"global batch {n} not divisible by mesh size {d}")
    return n // d
