"""Multi-host (pod-slice) support.

Single-host training shards the batch over local devices; on a pod slice each
host additionally owns 1/process_count of the global batch. This module keeps
that difference out of the training loop:

* :func:`maybe_initialize_distributed` brings up ``jax.distributed`` when a
  coordinator is configured (env vars or explicit args) — after it,
  ``jax.devices()`` is global and the data mesh spans the slice (ICI within a
  host's chips, DCN across hosts — XLA routes collectives accordingly);
* :func:`global_batch` assembles the host-local arrays into global jax.Arrays
  sharded over the mesh (``jax.make_array_from_process_local_data``), which is
  a plain sharded device_put in the single-process case.

The logic degenerates exactly to the single-host path when process_count == 1,
so the whole stack is exercised by the regular test mesh.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from stego_tpu.parallel.mesh import batch_sharding


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when configured; returns True if running
    multi-process. Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID when args are not given (TPU pod slices auto-configure
    via the TPU metadata server when all args are None)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        # no explicit coordinator: single-process, or pod auto-config already
        # happened before backend init (TPU_WORKER_HOSTNAMES alone is not a
        # reliable signal — single-chip tunnels set it too)
        return jax.process_count() > 1
    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized():
        if jax.process_count() == 1:
            print("WARNING: coordinator configured but jax backends already "
                  "initialized — running single-process.")
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=int(num_processes
                          or os.environ.get("JAX_NUM_PROCESSES", 1)),
        process_id=int(process_id or os.environ.get("JAX_PROCESS_ID", 0)),
    )
    return jax.process_count() > 1


def is_primary() -> bool:
    """Host 0 owns logging, checkpoint writes and figure export."""
    return jax.process_index() == 0


def global_batch(mesh, host_batch: Dict[str, Any],
                 sharding=None) -> Dict[str, Any]:
    """Host-local numpy batch -> global jax.Arrays sharded over the mesh.

    Each process passes its local slice of the global batch; the result is a
    single global array whose shards live on this host's devices. With one
    process this is exactly a sharded device_put. ``sharding`` overrides the
    default leading-axis batch sharding (multi-step dispatch stacks are
    (n_steps, batch, ...) with the batch on axis 1)."""
    sharding = sharding or batch_sharding(mesh)

    def put(a):
        return jax.make_array_from_process_local_data(sharding, np.asarray(a))

    return jax.tree.map(put, host_batch)
