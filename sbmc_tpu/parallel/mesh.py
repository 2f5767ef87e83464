"""Device-mesh helpers for data-parallel training and sharded inference.

The reference is single-device (SURVEY.md §2.3); the TPU-native design runs
data-parallel over ICI: a 1-D ``("data",)`` mesh, parameters replicated,
batches sharded on the leading axis. Gradients are reduced automatically by
XLA (the ``jit`` of the train step sees replicated params + sharded batch
and inserts the ``psum`` over ICI).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "shard_batch", "replicate"]


def make_mesh(n_devices=None, axis_name="data", devices=None):
    """Create a 1-D data-parallel mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def data_sharding(mesh, axis_name="data"):
    """NamedSharding that splits the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch, mesh, axis_name="data"):
    """Device-put a dict of host arrays, sharding the leading axis.

    Scalars / non-arrays are replicated.
    """
    sharded = data_sharding(mesh, axis_name)
    repl = NamedSharding(mesh, P())
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1 \
                and v.shape[0] % mesh.devices.size == 0:
            out[k] = jax.device_put(v, sharded)
        else:
            out[k] = jax.device_put(v, repl)
    return out


def replicate(tree, mesh):
    """Replicate a pytree (e.g. params) across the mesh."""
    repl = NamedSharding(mesh, P())
    return jax.device_put(tree, repl)


def maybe_init_distributed():
    """Initialize jax.distributed for multi-host training when the standard
    coordination env vars are present (no-op on a single host).

    Reads ``SBMC_COORDINATOR`` (address:port), ``SBMC_NUM_PROCESSES`` and
    ``SBMC_PROCESS_ID`` — or defers to jax's own autodetection when running
    under a recognized cluster environment. Returns (process_index,
    process_count).
    """
    import os

    import jax

    coord = os.environ.get("SBMC_COORDINATOR")
    if coord and jax.process_count() == 1:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["SBMC_NUM_PROCESSES"]),
            process_id=int(os.environ["SBMC_PROCESS_ID"]))
    return jax.process_index(), jax.process_count()
