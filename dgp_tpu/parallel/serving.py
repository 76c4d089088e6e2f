"""Data-parallel batched inference (serving) over a device mesh.

The training side shards the ELBO (``data_parallel.py``); this module shards
*prediction*: rows of ``X`` split over the mesh's data axis, every device
runs the same conditional math on its local rows under a device-folded PRNG
key, and the outputs come back row-sharded. Prediction is embarrassingly
row-parallel, so the hot path needs **no collectives at all** — shard_map
here buys memory scaling (each device holds only the ``[S, N/n_dev, D]``
intermediates) and n_dev-way throughput, not communication overlap.

The reference (Hebbalali/dgp-toolbox) has no serving path — its predict
methods (dgp.py:154-172, MF_DGP.py:252-300) are eager single-process calls —
so everything here is beyond-reference infrastructure for production batch
inference.

Key semantics: each device folds ``jax.lax.axis_index`` into the caller's
key, so the Monte-Carlo draws differ from (but are distributed identically
to) a single-device call. For a 1-layer stack the predictive moments are
deterministic in ``X`` and the sharded result equals the single-device one
exactly (pinned in tests/test_serving.py).
"""

from __future__ import annotations

import functools as _functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

try:  # JAX >= 0.6 exposes shard_map at top level, with check_vma
    from jax import shard_map as _shard_map

    _SHMAP_CHECK_KW = {"check_vma": False}
except ImportError:  # pragma: no cover — older JAX spells the kwarg check_rep
    from jax.experimental.shard_map import shard_map as _shard_map

    _SHMAP_CHECK_KW = {"check_rep": False}

from ..models import dgp as _dgp
from .data_parallel import _require_1d


def sharded_rowwise(mesh: Mesh, fn, axis_name: str = "data", row_axis: int = 1):
    """Row-shard any ``fn(params, X, key) -> pytree`` whose output leaves all
    carry X's row count on dimension ``row_axis`` (``predict_f``/``predict_y``
    return ``[S, N, D]`` → ``row_axis=1``).

    ``params`` and ``key`` replicate; ``X`` shards on its leading axis; the
    key is folded with the device index so devices draw independent MC
    streams. X's row count must be a device multiple — pad with
    :func:`pad_rows` first. Generic on purpose: any family's pure predict
    function (``mf_dgp.predict_y``, ``mo_dgp.predict_f`` partials, …) shards
    through this same wrapper.

    Diag-variance predictions only: ``full_cov=True`` outputs carry
    *cross-row* covariances ``[..., N, N]``, which are not row-parallel —
    sharding such a fn here would silently return the block-diagonal. Compute
    full-cov blocks per chunk on one device instead.
    """
    _require_1d(mesh, axis_name, "sharded_rowwise")

    def _shard(params, X, key):
        idx = jax.lax.axis_index(axis_name)
        return fn(params, X, jax.random.fold_in(key, idx))

    out_spec = P(*([None] * row_axis + [axis_name]))
    return _shard_map(
        _shard,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P()),
        out_specs=out_spec,
        **_SHMAP_CHECK_KW,
    )


def pad_rows(mesh: Mesh, X, axis_name: str = "data"):
    """Zero-pad X's rows to a device multiple; returns ``(Xp, n_true)``.

    Zero rows are *computed* (harmlessly — prediction has no data term to
    bias) and sliced away by the caller; this keeps the compiled program's
    shape stable across serving batches of equal padded size. Pads on device
    (``jnp.pad``) — an np-side pad would ``device_get`` the whole serving
    batch and re-upload it (same rationale as :func:`run_sharded`).
    """
    X = jnp.asarray(X)
    n = X.shape[0]
    rem = (-n) % mesh.shape[axis_name]
    Xp = jnp.pad(X, [(0, rem)] + [(0, 0)] * (X.ndim - 1)) if rem else X
    return Xp, n


@_functools.lru_cache(maxsize=None)
def sharded_predict_f(mesh: Mesh, num_samples: int, axis_name: str = "data"):
    """jitted data-parallel DGP ``predict_f``: ``fn(params, X, key) ->
    (Fmean, Fvar)`` each ``[S, N, D]`` with rows sharded over ``axis_name``.
    Cached per (mesh, S) so repeat serving calls reuse one compiled program.
    """

    def _fn(params, X, key):
        return _dgp.predict_f(params, X, key, num_samples)

    return jax.jit(sharded_rowwise(mesh, _fn, axis_name))


@_functools.lru_cache(maxsize=None)
def sharded_predict_y(mesh: Mesh, num_samples: int, axis_name: str = "data"):
    """jitted data-parallel DGP ``predict_y`` (predictive mean/var through
    the likelihood); same layout contract as :func:`sharded_predict_f`."""

    def _fn(params, X, key):
        return _dgp.predict_y(params, X, key, num_samples)

    return jax.jit(sharded_rowwise(mesh, _fn, axis_name))


@_functools.lru_cache(maxsize=None)
def sharded_predict_y_mf(mesh: Mesh, num_samples: int,
                         axis_name: str = "data"):
    """jitted data-parallel MF-DGP ``predict_y`` (highest-fidelity
    predictive through the likelihood, MF_DGP.py:252-300's eager path);
    layout contract as :func:`sharded_predict_f`."""
    from ..models import mf_dgp as _mf

    def _fn(params, X, key):
        return _mf.predict_y(params, X, key, num_samples)

    return jax.jit(sharded_rowwise(mesh, _fn, axis_name))


@_functools.lru_cache(maxsize=None)
def sharded_predict_y_em(mesh: Mesh, num_samples: int,
                         axis_name: str = "data"):
    """jitted data-parallel MF-DGP-EM ``predict_y``."""
    from ..models import mf_dgp_em as _em

    def _fn(params, X, key):
        return _em.predict_y(params, X, key, num_samples)

    return jax.jit(sharded_rowwise(mesh, _fn, axis_name))


@_functools.lru_cache(maxsize=None)
def sharded_predict_y_mo(mesh: Mesh, num_samples: int, loop: int = 2,
                         axis_name: str = "data"):
    """jitted data-parallel MO-DGP predictive for the LAST objective (the
    class method's ``predict_y`` semantics, MO_DGP.py recurrent stack)."""
    from ..models import mo_dgp as _mo

    def _fn(params, X, key):
        Fmean, Fvar = _mo.predict_f(params, X, key, num_samples, None, loop)
        return params.likelihood.predict_mean_and_var(Fmean, Fvar)

    return jax.jit(sharded_rowwise(mesh, _fn, axis_name))


@_functools.lru_cache(maxsize=None)
def sharded_gpr_predict_y(mesh: Mesh, axis_name: str = "data"):
    """jitted data-parallel exact-GPR ``predict_y``: ``fn((params, data),
    Xnew, key) -> (mean, var)`` each ``[m, D]`` with rows sharded on axis 0.

    The training set replicates to every device (the exact-GP predictive
    needs the full Gram factor either way); the per-device work is the
    column-block of back-substitutions for its local rows, so the sharded
    result equals the single-device one to reduction-order rounding (no MC,
    no collectives; the mean is bitwise, the variance's kss - sum(A^2)
    cancellation reassociates under sharded shapes). The PRNG key is
    accepted for wrapper uniformity and unused.
    """
    from ..models import gpr as _gpr

    def _fn(params_and_data, X, key):
        del key  # exact predictive — deterministic in X
        params, data = params_and_data
        return _gpr.predict_y(params, data, X)

    return jax.jit(sharded_rowwise(mesh, _fn, axis_name, row_axis=0))


def run_sharded(engine, params, X, key, mesh, chunk_size=None, row_axis: int = 1,
                axis_name: str = "data"):
    """Drive a :func:`sharded_rowwise` engine over an arbitrary row count:
    pads rows to a device multiple, slices the outputs back, and (with
    ``chunk_size``) host-loops over fixed-shape chunks via
    :func:`predict_in_chunks`. Shared by every family's
    ``predict_y_sharded`` wrapper."""
    X = jnp.asarray(X)
    if chunk_size is not None:
        if chunk_size % mesh.shape[axis_name]:
            raise ValueError("chunk_size must be a device multiple")
        return predict_in_chunks(engine, params, X, key, chunk_size, row_axis)
    Xp, n = pad_rows(mesh, X, axis_name)
    out = engine(params, Xp, key)
    sl = (slice(None),) * row_axis + (slice(0, n),)
    return jax.tree_util.tree_map(lambda a: a[sl], out)


def predict_in_chunks(predict, params, X, key, chunk_size: int,
                      row_axis: int = 1):
    """Host-side loop over fixed-size row chunks for prediction sets too
    large to hold the ``[S, N, D]`` intermediates on device at once.

    Pads the tail chunk to ``chunk_size`` (one static shape → one compiled
    program), folds the chunk index into the key, and concatenates the
    outputs on ``row_axis`` back to X's true row count. ``predict`` is any
    ``fn(params, X, key) -> pytree`` with rows on ``row_axis`` — a jitted
    single-device predict or a :func:`sharded_rowwise` engine (then
    ``chunk_size`` must be a device multiple).
    """
    n = X.shape[0]
    outs = []
    for c, start in enumerate(range(0, n, chunk_size)):
        Xc = X[start:start + chunk_size]
        if Xc.shape[0] < chunk_size:  # pad the tail; sliced off below
            Xc = jnp.concatenate(
                [Xc, jnp.zeros((chunk_size - Xc.shape[0],) + Xc.shape[1:],
                               dtype=Xc.dtype)], axis=0)
        outs.append(predict(params, Xc, jax.random.fold_in(key, c)))
    def take(*leaf_chunks):
        full = jnp.concatenate(leaf_chunks, axis=row_axis)
        return full[(slice(None),) * row_axis + (slice(0, n),)]

    return jax.tree_util.tree_map(take, *outs)
