"""Device-mesh helpers.

The reference is single-process TF with no distribution story (SURVEY.md §2,
parallelism inventory). dgp_tpu's scaling axis is the data axis N of the
minibatch ELBO: params replicate, data shards, and the log-likelihood partial
sums / gradients reduce over ICI with ``psum`` (scaling-book recipe).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, only {len(devices)} available")
    return Mesh(np.array(devices[:n]), (axis_name,))


def make_mesh_2d(
    data: int, sample: int, axis_names: Sequence[str] = ("data", "sample")
) -> Mesh:
    """(data x sample) mesh for combined data- and MC-sample parallelism."""
    devices = jax.devices()
    if data * sample > len(devices):
        raise ValueError(
            f"requested {data}x{sample} devices, only {len(devices)} available"
        )
    grid = np.array(devices[: data * sample]).reshape(data, sample)
    return Mesh(grid, tuple(axis_names))


def shard_batch(mesh: Mesh, *arrays, axis_name: str = "data"):
    """Place arrays with their leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)


def pad_to_multiple(array, multiple: int, axis: int = 0):
    """Zero-pad ``axis`` up to a multiple; returns (padded, original_size)."""
    n = array.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return array, n
    pad = [(0, 0)] * array.ndim
    pad[axis] = (0, rem)
    return np.pad(np.asarray(array), pad), n
