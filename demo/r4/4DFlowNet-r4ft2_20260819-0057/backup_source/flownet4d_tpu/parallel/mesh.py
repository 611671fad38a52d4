"""Device mesh and sharding policy.

The reference is strictly single-device (no DP/TP/PP anywhere — see
SURVEY.md §2). The TPU rebuild scales by **data parallelism over the
batch axis of patches**: a 1-D ``jax.sharding.Mesh`` over all chips, batch
leaves sharded on axis 0, parameters and optimizer state replicated. With
``jax.jit`` over these shardings XLA inserts the gradient ``psum`` over
ICI automatically; nothing in the step function mentions collectives.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh
and the same code spans slices (DCN between hosts, ICI within).

The model is ~3.5M params, so TP/PP are intentionally out of scope
(SURVEY.md §2); the inference-time analogue of sequence parallelism is
sharding the *patch grid* of a large volume over the same mesh
(inference/predictor.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multi_host(coordinator_address=None, num_processes=None, process_id=None):
    """Join a multi-host TPU slice (call before make_mesh on every host).

    Thin wrapper over ``jax.distributed.initialize``: afterwards
    ``jax.devices()`` spans all hosts, the same 1-D data mesh covers the
    slice, and XLA routes gradient reductions over ICI within a slice and
    DCN across slices. Arguments default to TPU auto-detection.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (the batch) across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_with_sharding(tree, sharding: NamedSharding):
    """Host pytree -> sharded global arrays, multi-host safe.

    Single-process: one ``jax.device_put`` over the whole tree (the runtime
    batches the transfers). Multi-process (mesh spans hosts): every process
    holds the same host values and fills only its *addressable* shards via
    ``make_array_from_callback`` — ``device_put`` to a non-addressable
    sharding attempts a cross-host transfer and deadlocks on CPU clusters
    (observed in the 2-process smoke, tests/test_multihost.py).
    """
    if sharding.is_fully_addressable:
        return jax.device_put(tree, sharding)

    def put_leaf(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    return jax.tree_util.tree_map(put_leaf, tree)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Move a host batch to the mesh with its batch axis sharded.

    Every leaf is batch-major (venc, weights and rotation codes included).
    One device_put call over the whole pytree lets the runtime batch the
    transfers; an explicit sharded put measured ~3x faster per training
    step than jit's implicit numpy-argument transfer on relay-attached
    TPUs, and is required for >1 device anyway.
    """
    return put_with_sharding(batch, batch_sharding(mesh, axis_name))
