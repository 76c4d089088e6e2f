"""Doubly-stochastic Deep GP (Salimbeni & Deisenroth 2017).

TPU-native counterpart of ``DGP_Base``/``DGP``
(/root/reference/dgp_dace/models/dgp.py:21-366). The model is a pure pytree
(``DGPParams``) plus pure functions (``propagate``/``elbo``/``predict_*``);
the ``DGP`` class is a thin stateful wrapper exposing the reference's training
API (``optimize_adam``, ``optimize_nat_adam``) on top of the jitted engines in
``training.py``.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import default_float
from ..layers.initializations import init_layers_linear
from ..layers.svgp import (
    SVGPLayer,
    layer_kl,
    sample_from_conditional,
    stack_projections,
)
from ..ops.likelihoods import Gaussian
from . import training
from ._jit import maybe_jit


class DGPParams(struct.PyTreeNode):
    layers: Tuple[SVGPLayer, ...]
    likelihood: Gaussian


# -- pure functions ------------------------------------------------------------


def propagate(params: DGPParams, X, key, S: int, full_cov=False, zs=None):
    """Chain layer-wise reparameterized samples (dgp.py:34-63).

    :return: (Fs, Fmeans, Fvars) tuples of per-layer [S, N, D] arrays.
    """
    sX = jnp.tile(X[None], (S, 1, 1))
    F = sX
    Fs, Fmeans, Fvars = [], [], []
    zs = zs if zs is not None else [None] * len(params.layers)
    projs = stack_projections(params.layers, [l.z for l in params.layers])
    for layer, z, proj in zip(params.layers, zs, projs):
        key, sub = jax.random.split(key)
        F, Fmean, Fvar = sample_from_conditional(
            layer, layer.z, F, sub, full_cov=full_cov, z=z, proj=proj
        )
        Fs.append(F)
        Fmeans.append(Fmean)
        Fvars.append(Fvar)
    return tuple(Fs), tuple(Fmeans), tuple(Fvars)


def predict_f(params: DGPParams, X, key, S: int, full_cov=False):
    _, Fmeans, Fvars = propagate(params, X, key, S, full_cov=full_cov)
    return Fmeans[-1], Fvars[-1]


def elbo(params: DGPParams, X, Y, key, num_samples: int,
         num_data: Optional[int] = None, row_weights=None):
    """Monte-Carlo ELBO (dgp.py:79-100): scale * sum_n E_q[log p(y|f)] - sum KL.

    :param num_data: full-dataset size when (X, Y) is a minibatch (may be a
        traced scalar).
    :param row_weights: optional [N] 0/1 weights — rows with weight 0 are
        shape padding (training.pad_to_bucket) and contribute nothing to the
        data term; the effective row count is sum(row_weights).
    """
    Fmean, Fvar = predict_f(params, X, key, num_samples)
    var_exp = params.likelihood.variational_expectations(Fmean, Fvar, Y)  # [S,N,D]
    per_row = jnp.mean(var_exp, axis=0)  # [N, D]
    if row_weights is None:
        L = jnp.sum(per_row)
        denom = X.shape[0]
    else:
        L = jnp.sum(row_weights[:, None] * per_row)
        denom = jnp.sum(row_weights)
    kl = sum(layer_kl(layer, layer.z) for layer in params.layers)
    scale = 1.0 if num_data is None else num_data / denom
    return L * scale - kl


def predict_y(params: DGPParams, X, key, S: int):
    Fmean, Fvar = predict_f(params, X, key, S)
    return params.likelihood.predict_mean_and_var(Fmean, Fvar)


def predict_density(params: DGPParams, X, Y, key, S: int):
    Fmean, Fvar = predict_f(params, X, key, S)
    log_p = params.likelihood.predict_density(Fmean, Fvar, Y)  # [S, N, D]
    return jax.scipy.special.logsumexp(
        log_p - jnp.log(jnp.asarray(S, dtype=log_p.dtype)), axis=0
    )


# jitted entry points for the stateful wrappers (shape-cached by jax.jit);
# inference must not dispatch op-by-op in a serving loop
_elbo_jit = maybe_jit(elbo, static_argnums=(4, 5))
_propagate_jit = maybe_jit(propagate, static_argnums=(3, 4))
_predict_f_jit = maybe_jit(predict_f, static_argnums=(3, 4))
_predict_y_jit = maybe_jit(predict_y, static_argnums=(3,))
_predict_density_jit = maybe_jit(predict_density, static_argnums=(4,))


def moment_matched(y_means, y_vars):
    """Collapse the S-sample mixture to a single Gaussian per point
    (dgp.py:362-366): mean = E[m], var = E[v + m^2] - E[m]^2."""
    mean = jnp.mean(y_means, axis=0)
    var = jnp.mean(y_vars + y_means**2, axis=0) - mean**2
    return mean, var


def shrink_inner_q_sqrt(params: DGPParams, factor=1e-3) -> DGPParams:
    """Scale inner-layer q_sqrt for optimization stability (dgp.py:268-269)."""
    new_layers = [
        layer.replace(q_sqrt=layer.q_sqrt * factor) for layer in params.layers[:-1]
    ]
    new_layers.append(params.layers[-1])
    return params.replace(layers=tuple(new_layers))


# -- variational-parameter plumbing for natural gradients ----------------------


def get_qs(params: DGPParams, indices):
    return [(params.layers[i].q_mu, params.layers[i].q_sqrt) for i in indices]


def set_qs(params: DGPParams, indices, qs) -> DGPParams:
    layers = list(params.layers)
    for i, (q_mu, q_sqrt) in zip(indices, qs):
        layers[i] = layers[i].replace(q_mu=q_mu, q_sqrt=q_sqrt)
    return params.replace(layers=tuple(layers))


@functools.lru_cache(maxsize=None)
def _qs_accessors(sel: tuple):
    """Stable (get_qs, set_qs) pair for a layer selection — required for the
    training engine cache to hit across optimize_nat_adam calls."""

    def get(p):
        return get_qs(p, sel)

    def set_(p, qs):
        return set_qs(p, sel, qs)

    return get, set_


# -- cached loss factories (stable objects => training engine cache hits) ------


@functools.lru_cache(maxsize=None)
def _full_batch_loss(num_samples: int):
    """-ELBO over a full (possibly row-padded) batch; batch = (X, Y, w, n)."""

    def loss(params, key, batch):
        X, Y, w, num_data = batch
        return -elbo(params, X, Y, key, num_samples,
                     num_data=num_data, row_weights=w)

    return loss


@functools.lru_cache(maxsize=None)
def _minibatch_loss(num_samples: int, batch_size: int):
    """-ELBO over a uniform random minibatch; batch = (X, Y, n_true) where
    n_true is a traced scalar so N changes don't recompile. Padded rows (if
    any) sit past n_true and are never sampled."""

    def loss(params, key, batch):
        X, Y, n_true = batch
        kb, ks = jax.random.split(key)
        idx = jax.random.randint(kb, (batch_size,), 0, n_true)
        return -elbo(params, X[idx], Y[idx], ks, num_samples, num_data=n_true)

    return loss


# -- stateful wrapper -----------------------------------------------------------


class DGP:
    """Reference-parity wrapper (models/dgp.py:221-366).

    :param kernels: list of ``dgp_tpu.ops.kernels.Kernel`` (len(num_units)+1).
    :param num_units: hidden widths, e.g. [1, 1] for the notebook's [1,1,1] arch.
    """

    name = "dgp"

    def __init__(
        self,
        X,
        Y,
        Z,
        kernels,
        num_units,
        likelihood: Optional[Gaussian] = None,
        num_outputs=None,
        mean_function=None,
        white=False,
        num_samples=1,
        minibatch_size: Optional[int] = None,
        n_bucket: Optional[int] = None,
        mesh=None,
        seed=0,
    ):
        dtype = default_float()
        layers = init_layers_linear(
            X, Y, Z, kernels, num_units,
            num_outputs=num_outputs, mean_function=mean_function, white=white,
        )
        likelihood = likelihood or Gaussian.create(1.0, dtype=dtype)
        self.params = DGPParams(layers=tuple(layers), likelihood=likelihood)
        self.num_samples = num_samples
        self.minibatch_size = minibatch_size
        self.n_bucket = n_bucket
        self.mesh = mesh
        self.data = (
            jnp.asarray(np.asarray(X), dtype=dtype),
            jnp.asarray(np.asarray(Y), dtype=dtype),
        )
        self._key = jax.random.PRNGKey(seed)

    @classmethod
    def from_layers(cls, X, Y, layers, likelihood=None, num_samples=1,
                    minibatch_size=None, n_bucket=None, mesh=None, seed=0):
        """Build a DGP from a custom layer stack (the reference's direct
        ``DGP_Base(likelihood, layers)`` construction, dgp.py:21-32)."""
        self = cls.__new__(cls)
        dtype = default_float()
        likelihood = likelihood or Gaussian.create(1.0, dtype=dtype)
        self.params = DGPParams(layers=tuple(layers), likelihood=likelihood)
        self.num_samples = num_samples
        self.minibatch_size = minibatch_size
        self.n_bucket = n_bucket
        self.mesh = mesh
        self.data = (
            jnp.asarray(np.asarray(X), dtype=dtype),
            jnp.asarray(np.asarray(Y), dtype=dtype),
        )
        self._key = jax.random.PRNGKey(seed)
        return self

    # -- utilities -------------------------------------------------------------
    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _loss_spec(self):
        """(loss_fn, batch) for the cached training engines.

        With ``minibatch_size`` set, each evaluation draws a uniform random
        batch and rescales the data term to the full N (the reference stores
        a ``minibatch_size`` it never consumes, MF_DGP.py:88 — here it is
        live). With ``n_bucket`` set, (X, Y) is padded to the next row bucket
        so the jitted engine's shapes — and therefore its compilation — are
        stable while a BO loop grows N one point at a time. With ``mesh``
        set, the ELBO runs data-parallel under shard_map (rows padded to a
        device multiple with 0/1 weights; psum over ICI) through the same
        cached engines — 1-D data meshes, 2-D data x sample meshes
        (parallel.mesh.make_mesh_2d), and hierarchical DCN x ICI multislice
        meshes (make_mesh_multislice) are all accepted, and combine with
        ``minibatch_size`` via device-local unbiased index draws
        (parallel.data_parallel.sharded_dgp_minibatch_loss)."""
        X, Y = self.data
        S = self.num_samples
        B = self.minibatch_size
        N = X.shape[0]
        if self.mesh is not None:
            from ..parallel.data_parallel import (
                pad_shard_batch,
                sharded_dgp_loss,
                sharded_dgp_minibatch_loss,
            )

            Xp, Yp, w, n = pad_shard_batch(self.mesh, X, Y, self.n_bucket)
            if B is not None and B < N:
                return (sharded_dgp_minibatch_loss(self.mesh, S, B),
                        (Xp, Yp, w, n))
            return sharded_dgp_loss(self.mesh, S), (Xp, Yp, w, n)
        if B is not None and B < N:
            if self.n_bucket:
                X, Y, _ = training.pad_to_bucket(X, Y, self.n_bucket)
            n_true = jnp.asarray(N, dtype=jnp.int32)
            return _minibatch_loss(S, B), (X, Y, n_true)
        if self.n_bucket:
            Xp, Yp, w = training.pad_to_bucket(X, Y, self.n_bucket)
            return _full_batch_loss(S), (Xp, Yp, w, None)
        return _full_batch_loss(S), (X, Y, None, None)

    # -- reference API ----------------------------------------------------------
    def ELBO(self):
        X, Y = self.data
        return _elbo_jit(self.params, X, Y, self._next_key(), self.num_samples, None)

    def propagate(self, X, full_cov=False, S=1, zs=None):
        X = jnp.asarray(X, dtype=default_float())
        if zs is not None:
            return propagate(self.params, X, self._next_key(), S, full_cov, zs)
        return _propagate_jit(self.params, X, self._next_key(), S, full_cov)

    def predict_f(self, X, full_cov=False, S=1):
        X = jnp.asarray(X, dtype=default_float())
        return _predict_f_jit(self.params, X, self._next_key(), S, full_cov)

    def predict_y(self, Xnew, num_samples):
        Xnew = jnp.asarray(Xnew, dtype=default_float())
        return _predict_y_jit(self.params, Xnew, self._next_key(), num_samples)

    def predict_density(self, Xnew, Ynew, num_samples):
        Xnew = jnp.asarray(Xnew, dtype=default_float())
        Ynew = jnp.asarray(Ynew, dtype=default_float())
        return _predict_density_jit(self.params, Xnew, Ynew, self._next_key(), num_samples)

    def predict(self, Xnew, num_samples):
        y_m, y_v = self.predict_y(Xnew, num_samples)
        mean, var = moment_matched(y_m, y_v)
        return np.asarray(mean), np.asarray(var)

    def predict_y_sharded(self, Xnew, num_samples, mesh=None, chunk_size=None):
        """Data-parallel batch inference (serving path, beyond reference):
        rows of ``Xnew`` shard over the mesh's data axis, each device runs
        the conditional math on its local rows (no collectives — prediction
        is row-parallel), outputs gather back to the true row count.

        :param mesh: 1-D data mesh (default: the model's training mesh).
        :param chunk_size: optional device-multiple row chunk — bounds the
            on-device ``[S, chunk, D]`` intermediates for very large
            prediction sets (one compiled program, host loop over chunks).
        :returns: ``(mean, var)`` each ``[S, N, D]``, as ``predict_y``.
        """
        from ..parallel import serving

        mesh = mesh if mesh is not None else self.mesh
        if mesh is None:
            raise ValueError("predict_y_sharded needs a mesh (pass mesh= or "
                             "construct the model with one)")
        Xnew = jnp.asarray(Xnew, dtype=default_float())
        return serving.run_sharded(
            serving.sharded_predict_y(mesh, num_samples), self.params, Xnew,
            self._next_key(), mesh, chunk_size)

    def number_parameters(self, trainable=True):
        mask = training.make_mask(self.params)
        leaves_p = jax.tree_util.tree_leaves(self.params)
        leaves_m = jax.tree_util.tree_leaves(mask)
        total = 0
        for leaf, m in zip(leaves_p, leaves_m):
            if m or not trainable:
                total += int(np.prod(np.shape(leaf)))
        return total

    def _checkpoint_fn(self, checkpoint_path):
        return (training.make_checkpoint_fn(checkpoint_path)
                if checkpoint_path else None)

    def _train_scope(self):
        """The DGP trainers run with 1-pass (DEFAULT) cotangent matmuls on
        f32: quality-verified at full published schedules (step-function
        notebook: ELBO +110.7 / RMSE 0.0086; N=1M minibatch run: test RMSE
        at the noise floor) for +14% step throughput. The *global* default
        stays 3-pass because the stiff staged trainers (MF/EM/MO) measurably
        degrade under 1-pass — see config.bwd_precision."""
        from ..config import precision_scope

        if default_float() == jnp.dtype("float32"):
            return precision_scope(bwd="default")
        import contextlib

        return contextlib.nullcontext()

    def optimize_adam(
        self, iterations=5000, lr=0.01, beta_1=0.9, beta_2=0.999,
        epsilon=1e-7, messages=100, checkpoint_path=None, checkpoint_every=0,
        shrink_inner=True,
    ):
        """Plain Adam on everything, inner q_sqrt shrunk 1e-3 (dgp.py:255-278).

        :param checkpoint_path: with ``checkpoint_every`` > 0, the phase runs
            as chunked scans saving params here between chunks, so a long
            run survives preemption (restore via utils.checkpoint.load).
        :param shrink_inner: scale inner-layer q_sqrt by 1e-3 before the run
            (the reference does this at the top of EVERY optimize call,
            dgp.py:268-269 — correct for cold/warm full training, destructive
            for short warm refits such as batch-BO believer conditioning,
            which pass False)."""
        with self._train_scope():
            return self._optimize_adam(iterations, lr, beta_1, beta_2,
                                       epsilon, messages, checkpoint_path,
                                       checkpoint_every, shrink_inner)

    def _optimize_adam(self, iterations, lr, beta_1, beta_2, epsilon,
                       messages, checkpoint_path, checkpoint_every,
                       shrink_inner=True):
        if shrink_inner:
            self.params = shrink_inner_q_sqrt(self.params)
        mask = training.make_mask(self.params)
        loss_fn, batch = self._loss_spec()
        self.params, losses = training.adam_run(
            loss_fn, self.params, mask, self._next_key(),
            steps=iterations, lr=lr, b1=beta_1, b2=beta_2, eps=epsilon,
            messages=messages, data=batch,
            checkpoint_every=checkpoint_every,
            checkpoint_fn=self._checkpoint_fn(checkpoint_path),
        )
        return losses

    def optimize_nat_adam(
        self, iterations1=100, iterations2=5000, lr_adam=0.01, lr_gamma=0.01,
        beta_1=0.9, beta_2=0.999, epsilon=1e-7, ng_all=True, messages=100,
        checkpoint_path=None, checkpoint_every=0, shrink_inner=True,
    ):
        """Two-phase Adam -> Adam+NatGrad training (dgp.py:280-345).
        Runs under the 1-pass-cotangent scope (see ``_train_scope``).

        :param shrink_inner: scale inner-layer q_sqrt by 1e-3 first (reference
            parity, dgp.py:323-324); warm refits (batch-BO lies) pass False —
            repeating the shrink per refit collapses the trained inner
            posterior by 1e-3 each time."""
        with self._train_scope():
            return self._optimize_nat_adam(
                iterations1, iterations2, lr_adam, lr_gamma, beta_1, beta_2,
                epsilon, ng_all, messages, checkpoint_path, checkpoint_every,
                shrink_inner)

    def _optimize_nat_adam(self, iterations1, iterations2, lr_adam, lr_gamma,
                           beta_1, beta_2, epsilon, ng_all, messages,
                           checkpoint_path, checkpoint_every,
                           shrink_inner=True):
        if shrink_inner:
            self.params = shrink_inner_q_sqrt(self.params)
        n_layers = len(self.params.layers)
        sel = tuple(range(n_layers)) if ng_all else (n_layers - 1,)
        frozen = {i: {"q_mu", "q_sqrt"} for i in sel}
        euclid_mask = training.make_mask(self.params, frozen_layer_fields=frozen)
        loss_fn, batch = self._loss_spec()
        get_q, set_q = _qs_accessors(sel)
        ckpt_fn = self._checkpoint_fn(checkpoint_path)

        self.params, losses1 = training.adam_run(
            loss_fn, self.params, euclid_mask, self._next_key(),
            steps=iterations1, lr=lr_adam, b1=beta_1, b2=beta_2, eps=epsilon,
            messages=messages, data=batch,
            checkpoint_every=checkpoint_every, checkpoint_fn=ckpt_fn,
        )
        self.params, losses2 = training.nat_adam_run(
            loss_fn, self.params, euclid_mask,
            get_qs=get_q, set_qs=set_q,
            key=self._next_key(),
            steps=iterations2, lr_adam=lr_adam, gamma=lr_gamma,
            b1=beta_1, b2=beta_2, eps=epsilon, messages=messages, data=batch,
            checkpoint_every=checkpoint_every, checkpoint_fn=ckpt_fn,
        )
        return jnp.concatenate([losses1, losses2]) if iterations1 else losses2
