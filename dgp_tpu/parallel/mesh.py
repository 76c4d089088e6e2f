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


def make_mesh_multislice(
    n_slices: Optional[int] = None,
    per_slice: Optional[int] = None,
    axis_names: Sequence[str] = ("slice", "data"),
) -> Mesh:
    """Hybrid DCN x ICI mesh for multi-slice pods.

    On a real multi-slice deployment devices carry ``slice_index``; the outer
    mesh axis is laid out across slices (its collectives cross DCN) and the
    inner axis stays within a slice (collectives ride ICI) — the standard
    hybrid-mesh layout (scaling-book recipe; cf.
    jax.experimental.mesh_utils.create_hybrid_device_mesh). Single-slice /
    CPU runs emulate the topology by reshaping the flat device list, which is
    what the driver's virtual-device dryrun exercises.
    """
    devices = jax.devices()
    slice_ids = sorted({getattr(d, "slice_index", None) or 0 for d in devices})
    if len(slice_ids) > 1:
        by_slice = [
            [d for d in devices if (getattr(d, "slice_index", None) or 0) == s]
            for s in slice_ids
        ]
        n_slices = n_slices or len(by_slice)
        per_slice = per_slice or min(len(g) for g in by_slice)
        if n_slices > len(by_slice):
            raise ValueError(
                f"requested {n_slices} slices, only {len(by_slice)} present"
            )
        grid = np.array([g[:per_slice] for g in by_slice[:n_slices]])
    else:
        n_slices = n_slices or 2
        per_slice = per_slice or len(devices) // n_slices
        if n_slices * per_slice > len(devices):
            raise ValueError(
                f"requested {n_slices}x{per_slice} devices, only "
                f"{len(devices)} available"
            )
        grid = np.array(devices[: n_slices * per_slice]).reshape(
            n_slices, per_slice
        )
    return Mesh(grid, tuple(axis_names))


def shard_batch(mesh: Mesh, *arrays, axis_name="data"):
    """Place arrays with their leading axis sharded over the mesh.

    ``axis_name`` may be a single mesh axis or a tuple of axes (e.g.
    ``("slice", "data")`` for a hybrid DCN x ICI mesh): rows then shard over
    the *product* of those axes, outermost first."""
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
