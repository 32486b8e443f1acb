"""Device-mesh sharding for the engine's batched kernels.

The reference's parallelism is share-nothing batch fan-out over files scheduled
by Snakemake (SURVEY.md §2.8); here the same axes (contig batches, DP segment
batches, density regions) become data-parallel shards over a jax.sharding.Mesh.
There is no model state — the mesh carries one 'dp' axis and collectives are
gathers of per-shard call tables.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis='dp'):
    """A 1-D device mesh over up to n_devices (defaults to all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def pad_to_multiple(arr, multiple, axis=0, fill=0):
    """Pad an array along `axis` so its length divides `multiple`."""
    n = arr.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return arr, n
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=fill), n


def shard_batch(mesh, arr, axis_name='dp'):
    """Device-put a batch array sharded along its leading axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(arr, sharding)


def sharded_call(mesh, fn, *arrays, axis_name='dp'):
    """Run a jitted batch kernel with inputs sharded along the leading axis.

    All arrays must share the leading batch dim, padded to a multiple of the
    mesh size (use pad_to_multiple). XLA partitions the computation; for the
    engine's kernels every op is batch-elementwise, so no cross-device
    collectives are inserted and the step scales linearly over ICI-connected
    devices.
    """
    shards = [shard_batch(mesh, a, axis_name) for a in arrays]
    return fn(*shards)
