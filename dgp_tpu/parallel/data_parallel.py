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


@_functools.lru_cache(maxsize=None)
def sharded_dgp_loss(mesh: Mesh, num_samples: int, axis_name: str = "data"):
    """-ELBO for the plain DGP under shard_map; batch = (X, Y, w, num_data)
    with X/Y/w row-sharded and num_data a replicated scalar (the full N, so
    weight-decoupled padding keeps the value identical to single-device)."""

    def _shard(params, X, Y, w, num_data, key):
        idx = jax.lax.axis_index(axis_name)
        key = jax.random.fold_in(key, idx)
        Fmean, Fvar = predict_f(params, X, key, num_samples)
        var_exp = params.likelihood.variational_expectations(Fmean, Fvar, Y)
        local = jnp.sum(w[:, None] * jnp.mean(var_exp, axis=0))
        total = jax.lax.psum(local, axis_name)
        eff = jax.lax.psum(jnp.sum(w), axis_name)
        kl = sum(layer_kl(layer, layer.z) for layer in params.layers)
        return total * (num_data / eff) - kl

    pelbo = _shard_map(
        _shard,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name), P(), P()),
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


def pad_shard_fidelity_batch(mesh: Mesh, Xs, Ys, n_bucket=None,
                             axis_name: str = "data"):
    """Per-fidelity pad_shard_batch: returns (Xs, Ys, ws, nds) tuples ready
    for sharded_mf_loss / sharded_mo_loss."""
    import math

    from ..models.training import pad_to_bucket
    from .mesh import shard_batch as _shard_batch

    n_dev = mesh.shape[axis_name]
    bucket = math.lcm(n_dev, n_bucket or 1)
    Xp, Yp, ws, nds = [], [], [], []
    for X, Y in zip(Xs, Ys):
        n = X.shape[0]
        Xf, Yf, w = pad_to_bucket(X, Y, bucket)
        Xf, Yf, w = _shard_batch(mesh, Xf, Yf, w, axis_name=axis_name)
        Xp.append(Xf)
        Yp.append(Yf)
        ws.append(w)
        nds.append(jnp.asarray(n, X.dtype))
    return tuple(Xp), tuple(Yp), tuple(ws), tuple(nds)


def pad_shard_batch(mesh: Mesh, X, Y, n_bucket=None, axis_name: str = "data"):
    """Pad (X, Y) rows to a multiple of lcm(device count, bucket), build the
    0/1 row-weight vector, and place all three sharded on the data axis.
    Returns (Xp, Yp, w, num_data) ready for the sharded loss factories."""
    import math

    from ..models.training import pad_to_bucket
    from .mesh import shard_batch as _shard_batch

    n_dev = mesh.shape[axis_name]
    bucket = math.lcm(n_dev, n_bucket or 1)
    n = X.shape[0]
    Xp, Yp, w = pad_to_bucket(X, Y, bucket)
    Xp, Yp, w = _shard_batch(mesh, Xp, Yp, w, axis_name=axis_name)
    return Xp, Yp, w, jnp.asarray(n, X.dtype)
