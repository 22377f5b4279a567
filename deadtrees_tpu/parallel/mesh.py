"""Device mesh + sharding for data-parallel training.

This is THE parallelism layer of the rebuild (SURVEY.md §2.2): the reference
trains on a single GPU (/root/reference/configs/trainer/default.yaml:3
``gpus: 1``) with only latent DDP; here data parallelism is first-class —
a named 1-D ``data`` mesh, batches sharded across it, parameters replicated,
and the gradient all-reduce inserted by XLA (riding ICI within a slice, DCN
across hosts). No NCCL/MPI translation: ``jit`` + ``NamedSharding`` is the
whole story.

The spatial axis of inference (the Tiler's independent subtile batches,
reference tiler.py:142-145) shards over the same ``data`` axis — the
reference's analogue of sequence parallelism (SURVEY.md §5.7).
"""

from __future__ import annotations

import logging
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger(__name__)

DATA_AXIS = "data"


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bootstrap (the SLURM/NCCL analogue, SURVEY.md §5.8).

    No-op for single-process runs; on a TPU pod each host calls this before
    any other JAX API (args auto-discovered on TPU VMs when omitted).
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)


def create_mesh(
    n_devices: Optional[int] = None, devices: Optional[Sequence[Any]] = None
) -> Mesh:
    """Create the 1-D data-parallel mesh over all (or the first N) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batched arrays: leading (batch) axis split over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for parameters/optimizer state: fully replicated."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch on the mesh, splitting axis 0 across ``data``.

    Single process: an explicit device_put that XLA overlaps with compute
    (replacing the reference's implicit Lightning H2D copies, SURVEY.md §3.1
    boundary #1). Multi-host: the batch is this process's LOCAL slice (the
    input pipeline assigns disjoint shards per process) and the global array
    is assembled with ``jax.make_array_from_process_local_data`` — each
    host feeds only its addressable devices, nothing crosses DCN.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params, optimizer state) across the mesh."""
    sharding = replicate_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
