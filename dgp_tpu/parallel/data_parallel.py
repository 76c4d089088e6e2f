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
    the training engines; X/Y are closed over by the caller.

    NOTE: closure-over-data takes the uncached legacy engine path — the
    trainer-integrated route is :func:`sharded_dgp_loss` (traced batch,
    cached engines). Kept for ad-hoc use."""
    pelbo = make_data_parallel_elbo(mesh, num_samples, num_data, axis_name)

    def make(X, Y):
        def loss(params, key):
            return -pelbo(params, X, Y, key)

        return loss

    return make


# -- trainer-integrated sharded losses ------------------------------------------
#
# These are the data-parallel counterparts of the cached loss factories in
# models/{dgp,mf_dgp,mf_dgp_em,mo_dgp}.py: stable function objects (lru_cache
# on the hashable Mesh + static sizes) whose batch enters as a *traced*
# pytree, so the jitted scan engines in models/training.py cache and re-use
# the compiled program across retrains. Row weights make the padded-to-
# device-multiple shapes exact no-ops (weight-0 rows contribute nothing), and
# the single psum per reduction rides ICI.

import functools as _functools

from ..models import dgp as _dgp_mod
from ..models import mf_dgp as _mf_mod
from ..models import mf_dgp_em as _em_mod
from ..models import mo_dgp as _mo_mod


def mesh_row_axes(mesh: Mesh, axis_name: str = "data"):
    """Classify a mesh for the trainer-reachable sharded losses.

    Returns ``(row_axes, sample_axis)``: data rows shard over the *product*
    of ``row_axes`` (mesh order, outermost first); the Monte-Carlo sample
    axis shards over ``sample_axis`` when present. Supported topologies:

    * ``(axis_name,)`` — 1-D data-parallel (make_mesh);
    * ``(axis_name, 'sample')`` / ``('sample', axis_name)`` — 2-D data x
      sample parallelism (make_mesh_2d);
    * ``('slice', axis_name)`` — hierarchical DCN x ICI multislice
      (make_mesh_multislice): rows shard over slices x intra-slice devices,
      reductions run ICI-first so per-step DCN traffic is one scalar.
    """
    names = tuple(mesh.axis_names)
    if names == (axis_name,):
        return (axis_name,), None
    if set(names) == {axis_name, "sample"}:
        return (axis_name,), "sample"
    if names == ("slice", axis_name):
        return names, None
    raise ValueError(
        f"unsupported mesh axes {names}: expected ({axis_name!r},), a "
        f"{{{axis_name!r}, 'sample'}} pair, or ('slice', {axis_name!r})"
    )


def _fold_key(key, axes):
    for a in axes:
        key = jax.random.fold_in(key, jax.lax.axis_index(a))
    return key


def _row_psum(x, row_axes):
    # innermost (intra-slice / ICI) reduction first; the outer (DCN) psum
    # then moves one scalar per slice
    for a in reversed(row_axes):
        x = jax.lax.psum(x, a)
    return x


def _split_samples(mesh, num_samples, sample_axis):
    if sample_axis is None:
        return 1, num_samples
    s_dev = mesh.shape[sample_axis]
    if num_samples % s_dev:
        raise ValueError(
            f"num_samples={num_samples} must divide over the {s_dev}-way "
            f"sample axis"
        )
    return s_dev, num_samples // s_dev


@_functools.lru_cache(maxsize=None)
def sharded_dgp_loss(mesh: Mesh, num_samples: int, axis_name: str = "data"):
    """-ELBO for the plain DGP under shard_map; batch = (X, Y, w, num_data)
    with X/Y/w row-sharded and num_data a replicated scalar (the full N, so
    weight-decoupled padding keeps the value identical to single-device).

    Accepts every mesh_row_axes topology: on a 2-D data x sample mesh each
    device draws num_samples / sample_devices paths; on a multislice mesh the
    reduction runs hierarchically (ICI first, one scalar over DCN)."""
    row_axes, sample_axis = mesh_row_axes(mesh, axis_name)
    _, s_local = _split_samples(mesh, num_samples, sample_axis)

    def _shard(params, X, Y, w, num_data, key):
        key = _fold_key(key, row_axes + ((sample_axis,) if sample_axis else ()))
        Fmean, Fvar = predict_f(params, X, key, s_local)
        var_exp = params.likelihood.variational_expectations(Fmean, Fvar, Y)
        local = jnp.sum(w[:, None] * jnp.sum(var_exp, axis=0)) / num_samples
        if sample_axis is not None:
            local = jax.lax.psum(local, sample_axis)
        total = _row_psum(local, row_axes)
        eff = _row_psum(jnp.sum(w), row_axes)
        kl = sum(layer_kl(layer, layer.z) for layer in params.layers)
        return total * (num_data / eff) - kl

    pelbo = _shard_map(
        _shard,
        mesh=mesh,
        in_specs=(P(), P(row_axes), P(row_axes), P(row_axes), P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    def loss(params, key, batch):
        X, Y, w, num_data = batch
        return -pelbo(params, X, Y, w, num_data, key)

    return loss


@_functools.lru_cache(maxsize=None)
def sharded_dgp_minibatch_loss(mesh: Mesh, num_samples: int, batch_size: int,
                               axis_name: str = "data"):
    """Data-parallel *minibatch* -ELBO (SURVEY.md §2's distributed story:
    N-axis sharding of the minibatch ELBO, which the full-batch-only round-2
    losses left on the table).

    Each row-device draws ``batch_size // n_row_devices`` indices uniformly
    (with replacement) from its *device-local* true rows and scales its
    partial sum by ``n_local / B_local`` — an unbiased estimator of the full
    data term for any padding split, with no cross-device gather: the only
    collectives per step remain the scalar/gradient psums over ICI. Requires
    each local block's true rows to be a contiguous prefix, which
    pad_shard_batch's tail padding guarantees. Devices whose block is all
    padding (n_local == 0) contribute exactly zero. batch = (X, Y, w,
    num_data) as for sharded_dgp_loss; num_data keeps the reference's
    minibatch scale (MF_DGP.py:219-220) exact.
    """
    row_axes, sample_axis = mesh_row_axes(mesh, axis_name)
    n_row_dev = 1
    for a in row_axes:
        n_row_dev *= mesh.shape[a]
    _, s_local = _split_samples(mesh, num_samples, sample_axis)
    b_local = max(1, batch_size // n_row_dev)

    def _shard(params, X, Y, w, num_data, key):
        # the batch draw folds in only the row-device index, so all
        # sample-devices of one data shard evaluate the same rows
        k_draw, k_prop = jax.random.split(_fold_key(key, row_axes))
        if sample_axis is not None:
            k_prop = jax.random.fold_in(
                k_prop, jax.lax.axis_index(sample_axis)
            )
        idx, n_local = _local_draw(k_draw, w, b_local)
        Fmean, Fvar = predict_f(params, X[idx], k_prop, s_local)
        var_exp = params.likelihood.variational_expectations(
            Fmean, Fvar, Y[idx]
        )
        est = (jnp.sum(var_exp) / num_samples) * (
            n_local.astype(var_exp.dtype) / b_local
        )
        if sample_axis is not None:
            est = jax.lax.psum(est, sample_axis)
        total = _row_psum(est, row_axes)
        eff = _row_psum(jnp.sum(w), row_axes)
        kl = sum(layer_kl(layer, layer.z) for layer in params.layers)
        return total * (num_data / eff) - kl

    pelbo = _shard_map(
        _shard,
        mesh=mesh,
        in_specs=(P(), P(row_axes), P(row_axes), P(row_axes), P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    def loss(params, key, batch):
        X, Y, w, num_data = batch
        return -pelbo(params, X, Y, w, num_data, key)

    return loss


@_functools.lru_cache(maxsize=None)
def sharded_mf_loss(mesh: Mesh, num_samples: int, train_upto: int = -1,
                    axis_name: str = "data"):
    """-ELBO for MF-DGP under shard_map: every fidelity's rows shard over the
    same data axis (per-fidelity row sums are embarrassingly parallel,
    /root/reference/dgp_dace/models/MF_DGP.py:211-223); the augmented-Z
    recomputation (M x M work) replicates per device. batch = (Xs, Ys, ws,
    nds) per-fidelity tuples, rows padded to a device multiple."""

    def _shard(params, Xs, Ys, ws, nds, key):
        idx = jax.lax.axis_index(axis_name)
        key, kz = jax.random.split(jax.random.fold_in(key, idx))
        zs_full = _mf_mod.compute_full_zs(params.layers, kz)
        n_layers = len(params.layers)
        L = 0.0
        KL = 0.0
        for f in range(n_layers):
            if train_upto != -1 and f > train_upto:
                continue
            key, sub = jax.random.split(key)
            _, Fmeans, Fvars = _mf_mod.propagate(
                params, Xs[f], sub, num_samples, zs_full=zs_full, upto=f
            )
            if f == n_layers - 1:
                ve = params.likelihood.variational_expectations(
                    Fmeans[f], Fvars[f], Ys[f]
                )
            else:
                from ..ops.likelihoods import fidelity_variational_expectations

                ve = fidelity_variational_expectations(
                    Fmeans[f], Fvars[f], Ys[f],
                    _mf_mod._white_variance(params.layers[f]),
                )
            local = jnp.sum(ws[f][:, None] * jnp.mean(ve, axis=0))
            total = jax.lax.psum(local, axis_name)
            eff = jax.lax.psum(jnp.sum(ws[f]), axis_name)
            L += total * (nds[f] / eff)
            KL += layer_kl(params.layers[f], zs_full[f])
        return L - KL

    pelbo = _shard_map(
        _shard,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name), P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    def loss(params, key, batch):
        Xs, Ys, ws, nds = batch
        return -pelbo(params, Xs, Ys, ws, nds, key)

    return loss


@_functools.lru_cache(maxsize=None)
def sharded_em_loss(mesh: Mesh, num_samples: int, train_upto: int = -1,
                    axis_name: str = "data"):
    """-ELBO for MF-DGP-EM under shard_map. The X_red projection rows pair
    with the next fidelity's rows, so they shard with the same spec and the
    same padding (models/mf_dgp_em._loss_spec bucket path). batch = (Xs, Ys,
    Xr, ws, nds)."""

    def _shard(params, Xs, Ys, Xr, ws, nds, key):
        idx = jax.lax.axis_index(axis_name)
        key, kz = jax.random.split(jax.random.fold_in(key, idx))
        zs_full = _em_mod.compute_full_zs_em(params, kz)
        n_layers = len(params.layers)
        L = 0.0
        KL = 0.0
        L_red = 0.0
        KL_red = 0.0
        for f in range(n_layers):
            if train_upto != -1 and f > train_upto:
                continue
            key, sub = jax.random.split(key)
            _, Fmeans, Fvars = _em_mod.propagate(
                params, Xs[f], sub, num_samples, zs_full=zs_full,
                fidelity_dim=f,
            )
            if f == n_layers - 1:
                ve = params.likelihood.variational_expectations(
                    Fmeans[f], Fvars[f], Ys[f]
                )
            else:
                from ..ops.likelihoods import fidelity_variational_expectations

                ve = fidelity_variational_expectations(
                    Fmeans[f], Fvars[f], Ys[f],
                    params.layers[f].kernel.kernels[-1].variance,
                )
            local = jnp.sum(ws[f][:, None] * jnp.mean(ve, axis=0))
            eff = jax.lax.psum(jnp.sum(ws[f]), axis_name)
            L += jax.lax.psum(local, axis_name) * (nds[f] / eff)
            KL += layer_kl(params.layers[f], zs_full[f])
            if f < n_layers - 1:
                key, sub = jax.random.split(key)
                Hmean, Hvar = _em_mod.project(
                    params, Xs[f + 1], sub, num_samples, fidelity=f,
                    fidelity_dim=f + 1,
                )
                ve_red = params.likelihood_projection.variational_expectations(
                    Hmean, Hvar, Xr[f]
                )
                local_r = jnp.sum(ws[f + 1][:, None] * jnp.mean(ve_red, axis=0))
                eff_next = jax.lax.psum(jnp.sum(ws[f + 1]), axis_name)
                scale = (nds[f + 1] / eff_next) * (nds[f + 1] / nds[f])
                L_red += jax.lax.psum(local_r, axis_name) * scale
                KL_red += layer_kl(params.layers_red[f],
                                   params.layers_red[f].z)
        return L + L_red - KL - KL_red

    pelbo = _shard_map(
        _shard,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                  P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    def loss(params, key, batch):
        Xs, Ys, Xr, ws, nds = batch
        return -pelbo(params, Xs, Ys, Xr, ws, nds, key)

    return loss


@_functools.lru_cache(maxsize=None)
def sharded_mo_loss(mesh: Mesh, num_samples: int, loop: int,
                    train_upto: int = -1, axis_name: str = "data"):
    """-ELBO for MO-DGP under shard_map (per-objective row sums,
    /root/reference/dgp_dace/models/MO_DGP.py:190-217). batch = (Xs, Ys, ws,
    nds)."""

    def _shard(params, Xs, Ys, ws, nds, key):
        idx = jax.lax.axis_index(axis_name)
        key = jax.random.fold_in(key, idx)
        n = len(params.layers)
        key, kz = jax.random.split(key)
        zs_full = _mf_mod.compute_full_zs(params.layers, kz, pad_cols=1)
        L = 0.0
        KL = 0.0
        for obj in range(n):
            if train_upto != -1 and obj > train_upto:
                continue
            key, sub = jax.random.split(key)
            _, Fmeans, Fvars = _mo_mod.propagate(params, Xs[obj], sub,
                                                 num_samples, loop=loop)
            if obj == n - 1:
                ve = params.likelihood.variational_expectations(
                    Fmeans[obj], Fvars[obj], Ys[obj]
                )
            else:
                from ..ops.likelihoods import fidelity_variational_expectations

                ve = fidelity_variational_expectations(
                    Fmeans[obj], Fvars[obj], Ys[obj],
                    params.layers[obj].kernel.kernels[-1].variance,
                )
            local = jnp.sum(ws[obj][:, None] * jnp.mean(ve, axis=0))
            eff = jax.lax.psum(jnp.sum(ws[obj]), axis_name)
            L += jax.lax.psum(local, axis_name) * (nds[obj] / eff)
            KL += layer_kl(params.layers[obj], zs_full[obj])
        return L - KL

    pelbo = _shard_map(
        _shard,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name), P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    def loss(params, key, batch):
        Xs, Ys, ws, nds = batch
        return -pelbo(params, Xs, Ys, ws, nds, key)

    return loss


def _require_1d(mesh: Mesh, axis_name: str, what: str):
    row_axes, sample_axis = mesh_row_axes(mesh, axis_name)
    if sample_axis is not None or len(row_axes) != 1:
        raise ValueError(
            f"{what} supports 1-D ({axis_name!r},) data meshes only; got "
            f"axes {tuple(mesh.axis_names)}"
        )


def _local_batch_sizes(mesh: Mesh, batch_sizes, axis_name: str = "data"):
    n_dev = mesh.shape[axis_name]
    return tuple(max(1, int(b) // n_dev) for b in batch_sizes)


def _local_draw(kb, w, b_local):
    """Per-device minibatch draw: (indices [b_local], n_local int32).

    True rows form a contiguous prefix of the local block (tail padding), so
    uniform indices in [0, n_local) select only true rows; an all-padding
    device draws row 0 and contributes zero through the n_local scale."""
    n_local = jnp.sum(w).astype(jnp.int32)
    idx = jax.random.randint(kb, (b_local,), 0, jnp.maximum(n_local, 1))
    return idx, n_local


@_functools.lru_cache(maxsize=None)
def sharded_mf_minibatch_loss(mesh: Mesh, num_samples: int,
                              batch_sizes: tuple, train_upto: int = -1,
                              axis_name: str = "data"):
    """Sharded per-fidelity minibatch -ELBO for MF-DGP: each device draws
    B_f / n_devices rows per fidelity from its local shard and scales by
    n_local / B_local (unbiased, see sharded_dgp_minibatch_loss), keeping the
    reference's per-fidelity N_f/B_f scale
    (/root/reference/dgp_dace/models/MF_DGP.py:219-220) exact in expectation.
    The augmented-Z recomputation (M x M work) replicates per device. batch =
    (Xs, Ys, ws, nds) as for sharded_mf_loss."""
    _require_1d(mesh, axis_name, "sharded_mf_minibatch_loss")
    b_locals = _local_batch_sizes(mesh, batch_sizes, axis_name)

    def _shard(params, Xs, Ys, ws, nds, key):
        idx = jax.lax.axis_index(axis_name)
        key, kz = jax.random.split(jax.random.fold_in(key, idx))
        zs_full = _mf_mod.compute_full_zs(params.layers, kz)
        n_layers = len(params.layers)
        L = 0.0
        KL = 0.0
        for f in range(n_layers):
            if train_upto != -1 and f > train_upto:
                continue
            key, kb, sub = jax.random.split(key, 3)
            ridx, n_local = _local_draw(kb, ws[f], b_locals[f])
            _, Fmeans, Fvars = _mf_mod.propagate(
                params, Xs[f][ridx], sub, num_samples, zs_full=zs_full,
                upto=f
            )
            if f == n_layers - 1:
                ve = params.likelihood.variational_expectations(
                    Fmeans[f], Fvars[f], Ys[f][ridx]
                )
            else:
                from ..ops.likelihoods import fidelity_variational_expectations

                ve = fidelity_variational_expectations(
                    Fmeans[f], Fvars[f], Ys[f][ridx],
                    _mf_mod._white_variance(params.layers[f]),
                )
            est = jnp.sum(jnp.mean(ve, axis=0)) * (
                n_local.astype(ve.dtype) / b_locals[f]
            )
            eff = jax.lax.psum(jnp.sum(ws[f]), axis_name)
            L += jax.lax.psum(est, axis_name) * (nds[f] / eff)
            KL += layer_kl(params.layers[f], zs_full[f])
        return L - KL

    pelbo = _shard_map(
        _shard,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name), P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    def loss(params, key, batch):
        Xs, Ys, ws, nds = batch
        return -pelbo(params, Xs, Ys, ws, nds, key)

    return loss


@_functools.lru_cache(maxsize=None)
def sharded_em_minibatch_loss(mesh: Mesh, num_samples: int,
                              batch_sizes: tuple, train_upto: int = -1,
                              axis_name: str = "data"):
    """Sharded per-fidelity minibatch -ELBO for MF-DGP-EM. The X_red[f]
    projection rows pair with fidelity f+1's rows, so the L_red term reuses
    fidelity f+1's index draw — the sharded counterpart of
    models.mf_dgp_em._em_minibatch_loss's lockstep subsampling. batch = (Xs,
    Ys, Xr, ws, nds) as for sharded_em_loss."""
    _require_1d(mesh, axis_name, "sharded_em_minibatch_loss")
    b_locals = _local_batch_sizes(mesh, batch_sizes, axis_name)

    def _shard(params, Xs, Ys, Xr, ws, nds, key):
        idx = jax.lax.axis_index(axis_name)
        key, kz = jax.random.split(jax.random.fold_in(key, idx))
        zs_full = _em_mod.compute_full_zs_em(params, kz)
        n_layers = len(params.layers)
        ridxs, n_locals = [], []
        for f in range(n_layers):
            key, kb = jax.random.split(key)
            ridx, n_local = _local_draw(kb, ws[f], b_locals[f])
            ridxs.append(ridx)
            n_locals.append(n_local)
        L = 0.0
        KL = 0.0
        L_red = 0.0
        KL_red = 0.0
        for f in range(n_layers):
            if train_upto != -1 and f > train_upto:
                continue
            key, sub = jax.random.split(key)
            _, Fmeans, Fvars = _em_mod.propagate(
                params, Xs[f][ridxs[f]], sub, num_samples, zs_full=zs_full,
                fidelity_dim=f,
            )
            if f == n_layers - 1:
                ve = params.likelihood.variational_expectations(
                    Fmeans[f], Fvars[f], Ys[f][ridxs[f]]
                )
            else:
                from ..ops.likelihoods import fidelity_variational_expectations

                ve = fidelity_variational_expectations(
                    Fmeans[f], Fvars[f], Ys[f][ridxs[f]],
                    params.layers[f].kernel.kernels[-1].variance,
                )
            est = jnp.sum(jnp.mean(ve, axis=0)) * (
                n_locals[f].astype(ve.dtype) / b_locals[f]
            )
            eff = jax.lax.psum(jnp.sum(ws[f]), axis_name)
            L += jax.lax.psum(est, axis_name) * (nds[f] / eff)
            KL += layer_kl(params.layers[f], zs_full[f])
            if f < n_layers - 1:
                key, sub = jax.random.split(key)
                Hmean, Hvar = _em_mod.project(
                    params, Xs[f + 1][ridxs[f + 1]], sub, num_samples,
                    fidelity=f, fidelity_dim=f + 1,
                )
                ve_red = params.likelihood_projection.variational_expectations(
                    Hmean, Hvar, Xr[f][ridxs[f + 1]]
                )
                est_r = jnp.sum(jnp.mean(ve_red, axis=0)) * (
                    n_locals[f + 1].astype(ve_red.dtype) / b_locals[f + 1]
                )
                eff_next = jax.lax.psum(jnp.sum(ws[f + 1]), axis_name)
                scale = (nds[f + 1] / eff_next) * (nds[f + 1] / nds[f])
                L_red += jax.lax.psum(est_r, axis_name) * scale
                KL_red += layer_kl(params.layers_red[f],
                                   params.layers_red[f].z)
        return L + L_red - KL - KL_red

    pelbo = _shard_map(
        _shard,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                  P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    def loss(params, key, batch):
        Xs, Ys, Xr, ws, nds = batch
        return -pelbo(params, Xs, Ys, Xr, ws, nds, key)

    return loss


@_functools.lru_cache(maxsize=None)
def sharded_mo_minibatch_loss(mesh: Mesh, num_samples: int, loop: int,
                              batch_sizes: tuple, train_upto: int = -1,
                              axis_name: str = "data"):
    """Sharded per-objective minibatch -ELBO for MO-DGP (device-local draws,
    unbiased n_local/B_local scaling — see sharded_dgp_minibatch_loss).
    batch = (Xs, Ys, ws, nds) as for sharded_mo_loss."""
    _require_1d(mesh, axis_name, "sharded_mo_minibatch_loss")
    b_locals = _local_batch_sizes(mesh, batch_sizes, axis_name)

    def _shard(params, Xs, Ys, ws, nds, key):
        idx = jax.lax.axis_index(axis_name)
        key = jax.random.fold_in(key, idx)
        n = len(params.layers)
        key, kz = jax.random.split(key)
        zs_full = _mf_mod.compute_full_zs(params.layers, kz, pad_cols=1)
        L = 0.0
        KL = 0.0
        for obj in range(n):
            if train_upto != -1 and obj > train_upto:
                continue
            key, kb, sub = jax.random.split(key, 3)
            ridx, n_local = _local_draw(kb, ws[obj], b_locals[obj])
            _, Fmeans, Fvars = _mo_mod.propagate(params, Xs[obj][ridx], sub,
                                                 num_samples, loop=loop)
            if obj == n - 1:
                ve = params.likelihood.variational_expectations(
                    Fmeans[obj], Fvars[obj], Ys[obj][ridx]
                )
            else:
                from ..ops.likelihoods import fidelity_variational_expectations

                ve = fidelity_variational_expectations(
                    Fmeans[obj], Fvars[obj], Ys[obj][ridx],
                    params.layers[obj].kernel.kernels[-1].variance,
                )
            est = jnp.sum(jnp.mean(ve, axis=0)) * (
                n_local.astype(ve.dtype) / b_locals[obj]
            )
            eff = jax.lax.psum(jnp.sum(ws[obj]), axis_name)
            L += jax.lax.psum(est, axis_name) * (nds[obj] / eff)
            KL += layer_kl(params.layers[obj], zs_full[obj])
        return L - KL

    pelbo = _shard_map(
        _shard,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name), P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    def loss(params, key, batch):
        Xs, Ys, ws, nds = batch
        return -pelbo(params, Xs, Ys, ws, nds, key)

    return loss


def pad_shard_fidelity_batch(mesh: Mesh, Xs, Ys, n_bucket=None,
                             axis_name: str = "data"):
    """Per-fidelity pad_shard_batch: returns (Xs, Ys, ws, nds) tuples ready
    for sharded_mf_loss / sharded_mo_loss."""
    import math

    from ..models.training import pad_to_bucket
    from .mesh import shard_batch as _shard_batch

    row_axes, _ = mesh_row_axes(mesh, axis_name)
    n_dev = 1
    for a in row_axes:
        n_dev *= mesh.shape[a]
    bucket = math.lcm(n_dev, n_bucket or 1)
    Xp, Yp, ws, nds = [], [], [], []
    for X, Y in zip(Xs, Ys):
        n = X.shape[0]
        Xf, Yf, w = pad_to_bucket(X, Y, bucket)
        Xf, Yf, w = _shard_batch(mesh, Xf, Yf, w, axis_name=row_axes)
        Xp.append(Xf)
        Yp.append(Yf)
        ws.append(w)
        nds.append(jnp.asarray(n, X.dtype))
    return tuple(Xp), tuple(Yp), tuple(ws), tuple(nds)


def pad_shard_batch(mesh: Mesh, X, Y, n_bucket=None, axis_name: str = "data"):
    """Pad (X, Y) rows to a multiple of lcm(row-device count, bucket), build
    the 0/1 row-weight vector, and place all three sharded over the mesh's
    row axes (the data axis; for a multislice mesh the slice x data product).
    Returns (Xp, Yp, w, num_data) ready for the sharded loss factories.
    Tail padding keeps each device-local block's true rows a contiguous
    prefix — the invariant sharded_dgp_minibatch_loss's device-local index
    draws rely on."""
    import math

    from ..models.training import pad_to_bucket
    from .mesh import shard_batch as _shard_batch

    row_axes, _ = mesh_row_axes(mesh, axis_name)
    n_dev = 1
    for a in row_axes:
        n_dev *= mesh.shape[a]
    bucket = math.lcm(n_dev, n_bucket or 1)
    n = X.shape[0]
    Xp, Yp, w = pad_to_bucket(X, Y, bucket)
    Xp, Yp, w = _shard_batch(mesh, Xp, Yp, w, axis_name=row_axes)
    return Xp, Yp, w, jnp.asarray(n, X.dtype)
