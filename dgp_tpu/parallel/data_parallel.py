"""Data-parallel ELBO over a TPU mesh.

The DGP ELBO's data term is a sum over independent data rows
(/root/reference/dgp_dace/models/dgp.py:96-99), so it shards embarrassingly
over the N axis: parameters replicate, each device evaluates its rows'
variational expectations, and a single ``psum`` over ICI reduces the partial
sums (and, by transposition, the parameter gradients). The reference has no
counterpart — it is single-process TF (SURVEY.md §2).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # JAX >= 0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from ..layers.svgp import layer_kl
from ..models.dgp import DGPParams, predict_f


def make_data_parallel_elbo(
    mesh: Mesh,
    num_samples: int,
    num_data: Optional[int] = None,
    axis_name: str = "data",
):
    """Build elbo(params, X, Y, key) with X/Y sharded on their leading axis.

    Per-device work: propagate local rows with a device-distinct PRNG key,
    sum the local variational expectations, ``psum`` over the mesh, subtract
    the (replicated) KL. Output is device-invariant.
    """

    def _shard_elbo(params: DGPParams, X, Y, key):
        idx = jax.lax.axis_index(axis_name)
        key = jax.random.fold_in(key, idx)
        Fmean, Fvar = predict_f(params, X, key, num_samples)
        var_exp = params.likelihood.variational_expectations(Fmean, Fvar, Y)
        local = jnp.sum(jnp.mean(var_exp, axis=0))
        total = jax.lax.psum(local, axis_name)
        n_local = X.shape[0]
        n_batch = n_local * jax.lax.psum(1, axis_name)
        scale = (num_data or n_batch) / n_batch
        kl = sum(layer_kl(layer, layer.z) for layer in params.layers)
        return total * scale - kl

    return _shard_map(
        _shard_elbo,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P()),
        out_specs=P(),
        check_vma=False,
    )


def make_data_sample_parallel_elbo(
    mesh: Mesh,
    num_samples: int,
    num_data: Optional[int] = None,
    data_axis: str = "data",
    sample_axis: str = "sample",
):
    """2-D mesh ELBO: the N axis shards over ``data_axis`` and the S
    Monte-Carlo sample axis shards over ``sample_axis`` — each device draws
    S / sample_devices paths for its rows, the variational-expectation mean
    reduces over both axes with psums over ICI.

    X/Y enter sharded as P('data') on their leading axis; params replicated.
    """
    n_sample_devices = mesh.shape[sample_axis]
    if num_samples % n_sample_devices:
        raise ValueError(
            f"num_samples={num_samples} must divide over the "
            f"{n_sample_devices}-way sample axis"
        )
    s_local = num_samples // n_sample_devices

    def _shard_elbo(params: DGPParams, X, Y, key):
        di = jax.lax.axis_index(data_axis)
        si = jax.lax.axis_index(sample_axis)
        key = jax.random.fold_in(jax.random.fold_in(key, di), si)
        Fmean, Fvar = predict_f(params, X, key, s_local)
        var_exp = params.likelihood.variational_expectations(Fmean, Fvar, Y)
        # mean over the full S axis = psum of local sums / S
        local = jnp.sum(var_exp) / num_samples
        total = jax.lax.psum(local, (data_axis, sample_axis))
        n_batch = X.shape[0] * jax.lax.psum(1, data_axis)
        scale = (num_data or n_batch) / n_batch
        kl = sum(layer_kl(layer, layer.z) for layer in params.layers)
        return total * scale - kl

    return _shard_map(
        _shard_elbo,
        mesh=mesh,
        in_specs=(P(), P(data_axis), P(data_axis), P()),
        out_specs=P(),
        check_vma=False,
    )


def make_multislice_elbo(
    mesh: Mesh,
    num_samples: int,
    num_data: Optional[int] = None,
    slice_axis: str = "slice",
    data_axis: str = "data",
):
    """Data-parallel ELBO over a hybrid DCN x ICI mesh
    (mesh.make_mesh_multislice): the N axis shards over the *product* of the
    slice and intra-slice axes; the reduction is explicitly hierarchical —
    ``psum`` within the slice first (ICI), then one scalar per slice across
    slices (DCN) — so per-step DCN traffic for the value is one scalar, and
    XLA lowers the gradient all-reduce the same hierarchical way.
    """

    def _shard_elbo(params: DGPParams, X, Y, key):
        si = jax.lax.axis_index(slice_axis)
        di = jax.lax.axis_index(data_axis)
        key = jax.random.fold_in(jax.random.fold_in(key, si), di)
        Fmean, Fvar = predict_f(params, X, key, num_samples)
        var_exp = params.likelihood.variational_expectations(Fmean, Fvar, Y)
        local = jnp.sum(jnp.mean(var_exp, axis=0))
        intra = jax.lax.psum(local, data_axis)          # ICI
        total = jax.lax.psum(intra, slice_axis)          # DCN: one scalar
        n_batch = (
            X.shape[0]
            * jax.lax.psum(1, data_axis)
            * jax.lax.psum(1, slice_axis)
        )
        scale = (num_data or n_batch) / n_batch
        kl = sum(layer_kl(layer, layer.z) for layer in params.layers)
        return total * scale - kl

    return _shard_map(
        _shard_elbo,
        mesh=mesh,
        in_specs=(P(), P((slice_axis, data_axis)), P((slice_axis, data_axis)),
                  P()),
        out_specs=P(),
        check_vma=False,
    )


def make_data_parallel_loss(mesh, num_samples, num_data=None, axis_name="data"):
    """Negative data-parallel ELBO with the (params, key) signature expected by
    the training engines; X/Y are closed over by the caller."""
    pelbo = make_data_parallel_elbo(mesh, num_samples, num_data, axis_name)

    def make(X, Y):
        def loss(params, key):
            return -pelbo(params, X, Y, key)

        return loss

    return make
