"""Multi-fidelity deep GP (Cutajar et al. style, Hebbal improvements).

TPU-native counterpart of /root/reference/dgp_dace/models/MF_DGP.py: one SVGP
layer per fidelity; layer i's input is [x, f_{i-1}(x)]; layers i >= 1 carry
*augmented inducing points* Z_i = [Z_left, Z_right] where Z_left is trainable
and Z_right is recomputed INSIDE the loss by propagating Z_left through the
earlier layers with a 50-sample mean (MF_DGP.py:33-44,204-207) — gradients
flow into Z_left through both the concat and the propagation. In JAX this is
simply a pure function of (params, key).

Composite per-fidelity kernel: k_corr * (k_prev + Linear) + k_in (+ White on
non-last layers, whose variance doubles as the inner-fidelity likelihood
noise; MF_DGP.py:249-297,188).

Deviation (documented): the reference's ELBO-time ``sample_Z_right`` applies
layer 0 twice for i=0 (MF_DGP.py:38-44); since layer 0's kernel only reads the
first Din columns, the second application is an identical-distribution
resample, so we apply each layer once (as the reference's own init-time
variant does, utils/layers.py:171-178).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import default_float
from ..layers.svgp import (
    SVGPLayer,
    layer_kl,
    make_svgp_layer,
    mean_propagated_sample,
    sample_from_conditional,
)
from ..ops import kernels as K
from ..ops.likelihoods import Gaussian, fidelity_variational_expectations
from . import training
from ._jit import maybe_jit
from .dgp import moment_matched


@functools.lru_cache(maxsize=None)
def _mf_loss(num_samples: int, train_upto: int = -1):
    """Stable -ELBO object for the cached training engines;
    batch = (Xs, Ys, row_weights, num_data) tuples — the latter two may be
    None (plain full batch)."""

    def loss(params, key, batch):
        Xs, Ys, ws, nd = batch
        return -elbo(params, Xs, Ys, key, num_samples,
                     train_upto_fidelity=train_upto, row_weights=ws,
                     num_data=nd)

    return loss


@functools.lru_cache(maxsize=None)
def _mf_minibatch_loss(num_samples: int, batch_sizes: tuple,
                       train_upto: int = -1):
    """-ELBO over per-fidelity uniform random minibatches with the
    reference's per-fidelity scale N_f/B_f (MF_DGP.py:219-220 — it stores a
    ``minibatch_size`` it never consumes, MF_DGP.py:88; here it is live).
    batch = (Xs, Ys, n_trues) with n_trues traced scalars so N growth does
    not recompile."""

    def loss(params, key, batch):
        Xs, Ys, n_trues = batch
        key, ks = jax.random.split(key)
        Xb, Yb = [], []
        for f, B in enumerate(batch_sizes):
            key, kf = jax.random.split(key)
            idx = jax.random.randint(kf, (B,), 0, n_trues[f])
            Xb.append(Xs[f][idx])
            Yb.append(Ys[f][idx])
        return -elbo(params, tuple(Xb), tuple(Yb), ks, num_samples,
                     train_upto_fidelity=train_upto, num_data=n_trues)

    return loss


class MFDGPParams(struct.PyTreeNode):
    layers: Tuple[SVGPLayer, ...]
    likelihood: Gaussian


# -- augmented inducing points -------------------------------------------------


def z_right(layers: Sequence[SVGPLayer], zs_full: Sequence, points, key,
            num_samples=50, pad_cols: int = 0):
    """Propagate ``points`` through ``layers`` (with their effective inducing
    inputs ``zs_full``) as a mean of reparameterized samples, re-deriving the
    augmented coordinate (MF_DGP.py:38-44).

    :param pad_cols: zero columns appended to the first chain input. Used by
        MO-DGP, whose layer 0 consumes [x, f]-shaped inputs: the reference
        feeds it bare x and only functions because TF's GPU gather returns
        zeros for the out-of-range column (MO_DGP.py:28-34 with the kernels of
        MO_DGP.py:264-289); the zero-padding makes that behavior explicit.
    """
    zr = None
    for j, (layer, zf) in enumerate(zip(layers, zs_full)):
        key, sub = jax.random.split(key)
        if j == 0:
            inp = points
            if pad_cols:
                zeros = jnp.zeros((points.shape[0], pad_cols), dtype=points.dtype)
                inp = jnp.concatenate([points, zeros], axis=1)
        else:
            inp = jnp.concatenate([points, zr], axis=1)
        zr = mean_propagated_sample(layer, zf, inp, sub, num_samples)
    return zr


def compute_full_zs(layers: Sequence[SVGPLayer], key, num_samples=50,
                    pad_cols: int = 0):
    """Effective per-layer inducing inputs, recomputed each loss evaluation
    (the in-graph side effect of MF_DGP.py:204-207 made pure)."""
    zs = [layers[0].z]
    for i in range(1, len(layers)):
        key, sub = jax.random.split(key)
        zr = z_right(layers[:i], zs[:i], layers[i].z_left, sub, num_samples,
                     pad_cols=pad_cols)
        zs.append(jnp.concatenate([layers[i].z_left, zr], axis=1))
    return zs


# -- model math -----------------------------------------------------------------


def propagate(params: MFDGPParams, X, key, S: int, zs_full=None,
              upto: Optional[int] = None, full_cov=False):
    """Layer 0 on x; layer i on [x, F_{i-1}] (MF_DGP.py:98-132).

    :param upto: propagate only fidelities 0..upto (inclusive); None = all.
    """
    if zs_full is None:
        key, sub = jax.random.split(key)
        zs_full = compute_full_zs(params.layers, sub)
    n_layers = len(params.layers) if upto is None else upto + 1
    sX = jnp.tile(X[None], (S, 1, 1))
    F = sX
    Fs, Fmeans, Fvars = [], [], []
    for i in range(n_layers):
        key, sub = jax.random.split(key)
        inp = sX if i == 0 else jnp.concatenate([sX, F], axis=2)
        F, Fmean, Fvar = sample_from_conditional(
            params.layers[i], zs_full[i], inp, sub, full_cov=full_cov
        )
        Fs.append(F)
        Fmeans.append(Fmean)
        Fvars.append(Fvar)
    return tuple(Fs), tuple(Fmeans), tuple(Fvars)


def predict_f(params: MFDGPParams, X, key, S: int, fidelity: Optional[int] = None,
              full_cov=False):
    upto = fidelity if fidelity is not None and fidelity >= 0 else None
    _, Fmeans, Fvars = propagate(params, X, key, S, upto=upto, full_cov=full_cov)
    idx = -1 if fidelity is None else fidelity
    return Fmeans[idx], Fvars[idx]


def _white_variance(layer: SVGPLayer):
    """Inner-fidelity likelihood noise = trailing White kernel variance
    (MF_DGP.py:188)."""
    return layer.kernel.kernels[-1].variance


def _weighted_data_term(var_exp, w):
    """(weighted row sum of E_S[var_exp], effective row count) — rows with
    weight 0 are shape padding (training.pad_to_bucket) and contribute
    nothing."""
    per_row = jnp.mean(var_exp, axis=0)  # [N, D]
    if w is None:
        return jnp.sum(per_row), per_row.shape[0]
    return jnp.sum(w[:, None] * per_row), jnp.sum(w)


def elbo(params: MFDGPParams, Xs, Ys, key, num_samples: int,
         train_upto_fidelity: int = -1, row_weights=None, num_data=None):
    """Sum of per-fidelity data terms (model likelihood on the last layer,
    White-kernel Gaussian on inner layers) minus per-layer KLs
    (MF_DGP.py:199-226).

    :param row_weights: optional per-fidelity tuple of 0/1 row weights (or
        None entries) marking shape padding.
    :param num_data: optional per-fidelity tuple of full-dataset sizes; each
        fidelity's data term is then scaled by N_f / batch_f — the
        reference's per-fidelity minibatch scale (MF_DGP.py:219-220).
    """
    key, kz = jax.random.split(key)
    zs_full = compute_full_zs(params.layers, kz)
    n_layers = len(params.layers)
    L = 0.0
    KL = 0.0
    for fidelity in range(n_layers):
        if train_upto_fidelity != -1 and fidelity > train_upto_fidelity:
            continue
        key, sub = jax.random.split(key)
        _, Fmeans, Fvars = propagate(
            params, Xs[fidelity], sub, num_samples, zs_full=zs_full,
            upto=fidelity,
        )
        Fmean, Fvar = Fmeans[fidelity], Fvars[fidelity]
        if fidelity == n_layers - 1:
            var_exp = params.likelihood.variational_expectations(
                Fmean, Fvar, Ys[fidelity]
            )
        else:
            var_exp = fidelity_variational_expectations(
                Fmean, Fvar, Ys[fidelity], _white_variance(params.layers[fidelity])
            )
        w = None if row_weights is None else row_weights[fidelity]
        term, eff = _weighted_data_term(var_exp, w)
        scale = 1.0 if num_data is None else num_data[fidelity] / eff
        L += term * scale
        KL += layer_kl(params.layers[fidelity], zs_full[fidelity])
    return L - KL


def predict_y(params: MFDGPParams, X, key, S: int, full_cov=False):
    Fmean, Fvar = predict_f(params, X, key, S, full_cov=full_cov)
    return params.likelihood.predict_mean_and_var(Fmean, Fvar)


_elbo_jit = maybe_jit(elbo, static_argnums=(4, 5))
_propagate_jit = maybe_jit(propagate, static_argnums=(3, 5, 6))
_predict_f_jit = maybe_jit(predict_f, static_argnums=(3, 4, 5))
_predict_y_jit = maybe_jit(predict_y, static_argnums=(3, 4))


# -- construction ----------------------------------------------------------------


def make_mf_kernels(Din: int, n_fidelities: int, add_linear=True, dtype=None):
    """The MF composite kernel stack (MF_DGP.py:266-290)."""
    kernels = [K.RBF.create(variance=1.0, lengthscales=[1.0] * Din,
                            active_dims=list(range(Din)), dtype=dtype)]
    for _ in range(1, n_fidelities):
        D = Din + 1
        d_in = tuple(range(Din))
        d_prev = tuple(range(Din, D))
        k_corr = K.RBF.create(variance=1.0, active_dims=d_in, dtype=dtype)
        k_prev = K.RBF.create(variance=1.0, active_dims=d_prev, dtype=dtype)
        k_in = K.RBF.create(variance=1.0, active_dims=d_in, dtype=dtype)
        if add_linear:
            k_l = k_corr * (k_prev + K.Linear.create(variance=1.0,
                                                     active_dims=d_prev,
                                                     dtype=dtype)) + k_in
        else:
            k_l = k_corr * k_prev + k_in
        kernels.append(k_l)
    # White on all but the last layer (inner-fidelity noise)
    out = []
    for i, kern in enumerate(kernels):
        if i < n_fidelities - 1:
            kern = kern + K.White.create(variance=1e-6, dtype=dtype)
        out.append(kern)
    return out


def init_layers_mf(Z: List, kernels, num_outputs=1, key=None, num_samples=100,
                   pad_cols: int = 0):
    """Layer list with augmented inducing variables for i >= 1
    (MF_DGP.py:46-64, utils/layers.py:208-213)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    dtype = default_float()
    layers = [make_svgp_layer(kernels[0], Z[0], num_outputs, dtype=dtype)]
    zs_full = [layers[0].z]
    for i in range(1, len(Z)):
        key, sub = jax.random.split(key)
        zl = jnp.asarray(np.asarray(Z[i]), dtype=dtype)
        zr = z_right(layers[:i], zs_full[:i], zl, sub, num_samples,
                     pad_cols=pad_cols)
        z_full = jnp.concatenate([zl, zr], axis=1)
        layers.append(
            make_svgp_layer(kernels[i], zl, num_outputs, augmented=True,
                            Z_full_init=z_full, dtype=dtype)
        )
        zs_full.append(z_full)
    return layers


class MultiFidelityDeepGP:
    """Reference-parity wrapper (MF_DGP.py:306-537): 3-phase staged training
    (kernel-only -> +inducing -> +q/likelihood with natural gradients),
    default Z = training inputs, moment-matched prediction over 250 samples."""

    name = "mf_dgp"

    def __init__(self, X, Y, Z=None, n_iter=5000, fix_inducing=True,
                 num_samples=10, add_linear=True, seed=0,
                 minibatch_size=None, n_bucket=None, mesh=None):
        dtype = default_float()
        self._X = [jnp.asarray(np.asarray(x), dtype=dtype) for x in X]
        self._Y = [jnp.asarray(np.asarray(y), dtype=dtype) for y in Y]
        self.n_fidelities = len(X)
        self.num_samples = num_samples
        # per-fidelity minibatch sizes (int shared, or list); the reference
        # stores minibatch_size and never consumes it (MF_DGP.py:88) — here
        # it is live with the N_f/B_f scale of MF_DGP.py:219-220
        if isinstance(minibatch_size, int):
            minibatch_size = [minibatch_size] * len(X)
        self.minibatch_size = minibatch_size
        self.n_bucket = n_bucket
        self.mesh = mesh
        self._key = jax.random.PRNGKey(seed)
        if Z is None:
            Z = [np.asarray(X[0]).copy()] + [np.asarray(x).copy() for x in X[1:]]
        self.Z = Z
        kernels = make_mf_kernels(np.asarray(X[0]).shape[1], len(X),
                                  add_linear=add_linear, dtype=dtype)
        layers = init_layers_mf(Z, kernels, key=self._next_key())
        self.params = MFDGPParams(layers=tuple(layers),
                                  likelihood=Gaussian.create(1.0, dtype=dtype))
        self.n_iter = n_iter
        self.fix_inducing = fix_inducing

    # -- utilities ------------------------------------------------------------
    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _loss_spec(self, train_upto: int = -1):
        """(stable loss_fn, traced batch) — see training._ENGINE_CACHE: a
        fresh instance at the same shapes (e.g. the 20-seed benchmark
        harness, nb_mfdgp_improved cell 4) reuses the compiled engines.

        With ``minibatch_size``: per-fidelity uniform batches + N_f/B_f
        scale. With ``n_bucket``: rows padded per fidelity with 0/1 weights
        so a growing dataset keeps stable compiled shapes. With ``mesh``:
        every fidelity's rows shard over the data axis under shard_map."""
        Xs, Ys = list(self._X), list(self._Y)
        if self.mesh is not None:
            from ..parallel.data_parallel import (
                pad_shard_fidelity_batch,
                sharded_mf_loss,
                sharded_mf_minibatch_loss,
            )

            batch = pad_shard_fidelity_batch(self.mesh, Xs, Ys,
                                             self.n_bucket)
            if self.minibatch_size is not None:
                sizes = tuple(
                    min(int(b), x.shape[0])
                    for b, x in zip(self.minibatch_size, self._X)
                )
                return (sharded_mf_minibatch_loss(self.mesh,
                                                  self.num_samples, sizes,
                                                  train_upto), batch)
            return sharded_mf_loss(self.mesh, self.num_samples,
                                   train_upto), batch
        if self.minibatch_size is not None:
            sizes = tuple(
                min(int(b), x.shape[0])
                for b, x in zip(self.minibatch_size, Xs)
            )
            n_trues = tuple(
                jnp.asarray(x.shape[0], dtype=jnp.int32) for x in Xs
            )
            if self.n_bucket:
                padded = [training.pad_to_bucket(x, y, self.n_bucket)[:2]
                          for x, y in zip(Xs, Ys)]
                Xs = [p[0] for p in padded]
                Ys = [p[1] for p in padded]
            return (_mf_minibatch_loss(self.num_samples, sizes, train_upto),
                    (tuple(Xs), tuple(Ys), n_trues))
        if self.n_bucket:
            ws, nd = [], []
            for f in range(len(Xs)):
                Xp, Yp, w = training.pad_to_bucket(Xs[f], Ys[f],
                                                   self.n_bucket)
                Xs[f], Ys[f] = Xp, Yp
                ws.append(w)
                nd.append(jnp.asarray(self._X[f].shape[0], Xp.dtype))
            return (_mf_loss(self.num_samples, train_upto),
                    (tuple(Xs), tuple(Ys), tuple(ws), tuple(nd)))
        return (_mf_loss(self.num_samples, train_upto),
                (tuple(Xs), tuple(Ys), None, None))

    def objective(self):
        return _elbo_jit(self.params, tuple(self._X), tuple(self._Y),
                    self._next_key(), self.num_samples, -1)

    ELBO = objective

    def propagate(self, X, full_cov=False, S=1):
        X = jnp.asarray(X, dtype=default_float())
        return _propagate_jit(self.params, X, self._next_key(), S, None, None, full_cov)

    def predict_all_layers(self, Xnew, num_samples):
        """All per-layer samples/means/vars (MF_DGP.py:234-235)."""
        return self.propagate(Xnew, full_cov=False, S=num_samples)

    def predict_f(self, X, full_cov=False, S=1, fidelity=None):
        X = jnp.asarray(X, dtype=default_float())
        return _predict_f_jit(self.params, X, self._next_key(), S, fidelity, full_cov)

    def predict_y(self, Xnew, num_samples, full_cov=False):
        Xnew = jnp.asarray(Xnew, dtype=default_float())
        return _predict_y_jit(self.params, Xnew, self._next_key(), num_samples, full_cov)

    def predict_y_sharded(self, Xnew, num_samples, mesh=None, chunk_size=None):
        """Data-parallel highest-fidelity batch inference (serving path,
        beyond reference — see DGP.predict_y_sharded)."""
        from ..parallel import serving

        mesh = mesh if mesh is not None else self.mesh
        if mesh is None:
            raise ValueError("predict_y_sharded needs a mesh (pass mesh= or "
                             "construct the model with one)")
        Xnew = jnp.asarray(Xnew, dtype=default_float())
        return serving.run_sharded(
            serving.sharded_predict_y_mf(mesh, num_samples), self.params,
            Xnew, self._next_key(), mesh, chunk_size)

    def predict_density(self, Xnew, Ynew, num_samples):
        """log E_S[p(y|f)] via logsumexp over samples (MF_DGP.py:243-247)."""
        import jax.scipy.special as _jsp

        Fmean, Fvar = self.predict_f(Xnew, S=num_samples)
        Ynew = jnp.asarray(np.asarray(Ynew), dtype=default_float())
        log_p = self.params.likelihood.predict_density(Fmean, Fvar, Ynew)
        S = num_samples
        return _jsp.logsumexp(
            log_p - jnp.log(jnp.asarray(S, dtype=log_p.dtype)), axis=0
        )

    def predict(self, X_test, full_cov=False):
        """Highest fidelity, moment-matched over 250 samples
        (MF_DGP.py:336-341)."""
        y_m, y_v = self.predict_y(X_test, 250, full_cov=full_cov)
        mean, var = moment_matched(y_m, y_v)
        return (np.asarray(mean).reshape(-1, 1),
                np.asarray(var).reshape(-1, 1))

    # -- staged training --------------------------------------------------------
    def _init_variational(self, q_sqrt_scale=1e-2):
        """q init recipe (MF_DGP.py:457-475): q_mu <- Y_f, q_sqrt scaled by
        var(Y_f); likelihood variance <- var(Y_last) * 1e-2."""
        layers = list(self.params.layers)
        for i in range(len(layers)):
            y = self._Y[i]
            if layers[i].q_mu.shape == y.shape:
                q_mu = y
            else:  # custom Z: keep zeros (the reference would crash here)
                q_mu = layers[i].q_mu
            scale = q_sqrt_scale * jnp.var(y)
            layers[i] = layers[i].replace(q_mu=q_mu,
                                          q_sqrt=layers[i].q_sqrt * scale)
        lik = Gaussian.create(float(jnp.var(self._Y[-1])) * 1e-2,
                              dtype=default_float())
        self.params = self.params.replace(layers=tuple(layers), likelihood=lik)

    def _phase_masks(self):
        """Frozen sets per phase (MF_DGP.py:457-516)."""
        q = {"q_mu", "q_sqrt"}
        z = {"z", "z_left"}
        lik = {"likelihood"}
        m1 = training.make_mask(self.params, frozen_fields=lik | z,
                                frozen_layer_fields={"all": q})
        m2 = training.make_mask(self.params, frozen_fields=lik,
                                frozen_layer_fields={"all": q})
        m3 = training.make_mask(self.params,
                                frozen_layer_fields={"all": q})
        return m1, m2, m3

    def optimize_adam(self, lr=0.01, iterations1=2000, iterations2=5000,
                      iterations3=7500, beta_1=0.9, beta_2=0.999,
                      epsilon=1e-7, messages=500, q_sqrt_scale=1e-2,
                      train_upto_fidelity=-1,
                      checkpoint_path=None, checkpoint_every=0):
        """3-phase Adam (MF_DGP.py:345-424); phase 3 unfreezes q + likelihood
        for Adam instead of natural gradients.

        :param train_upto_fidelity: restrict the ELBO's data terms to
            fidelities 0..k (the reference's ``_train_upto_fidelity``,
            MF_DGP.py:214); -1 = all.
        """
        self._init_variational(q_sqrt_scale)
        traces = []
        loss_fn, batch = self._loss_spec(train_upto_fidelity)
        _ckpt = (training.make_checkpoint_fn(checkpoint_path)
                 if checkpoint_path else None)
        m1, m2, _ = self._phase_masks()
        m3 = training.make_mask(self.params)  # everything (but means)
        for steps, mask in ((iterations1, m1), (iterations2, m2),
                            (iterations3, m3)):
            self.params, _ls = training.adam_run(
                loss_fn, self.params, mask, self._next_key(), steps=steps,
                lr=lr, b1=beta_1, b2=beta_2, eps=epsilon, messages=messages,
                data=batch, checkpoint_every=checkpoint_every,
                checkpoint_fn=_ckpt,
            )
            traces.append(_ls)
        return jnp.concatenate([jnp.ravel(t) for t in traces]) if traces else jnp.zeros((0,))

    def optimize_nat_adam(self, lr_adam=0.01, lr_gamma=0.01, iterations1=2000,
                          iterations2=5000, iterations3=7500, beta_1=0.9,
                          beta_2=0.999, epsilon=1e-7, messages=500,
                          q_sqrt_scale=1e-2, train_upto_fidelity=-1,
                          checkpoint_path=None, checkpoint_every=0):
        """3-phase Adam -> +inducing -> Adam+NatGrad (MF_DGP.py:426-519).

        :param train_upto_fidelity: restrict the ELBO's data terms to
            fidelities 0..k (MF_DGP.py:214); -1 = all.
        """
        from .dgp import _qs_accessors

        self._init_variational(q_sqrt_scale)
        traces = []
        loss_fn, batch = self._loss_spec(train_upto_fidelity)
        _ckpt = (training.make_checkpoint_fn(checkpoint_path)
                 if checkpoint_path else None)
        m1, m2, m3 = self._phase_masks()
        self.params, _ls = training.adam_run(
            loss_fn, self.params, m1, self._next_key(), steps=iterations1,
            lr=lr_adam, b1=beta_1, b2=beta_2, eps=epsilon, messages=messages,
            data=batch, checkpoint_every=checkpoint_every,
            checkpoint_fn=_ckpt,
        )
        traces.append(_ls)
        self.params, _ls = training.adam_run(
            loss_fn, self.params, m2, self._next_key(), steps=iterations2,
            lr=lr_adam, b1=beta_1, b2=beta_2, eps=epsilon, messages=messages,
            data=batch, checkpoint_every=checkpoint_every,
            checkpoint_fn=_ckpt,
        )
        traces.append(_ls)
        # phase 3: likelihood variance unfrozen; NatGrad on all layers' q
        get_q, set_q = _qs_accessors(tuple(range(len(self.params.layers))))
        self.params, _ls = training.nat_adam_run(
            loss_fn, self.params, m3,
            get_qs=get_q, set_qs=set_q,
            key=self._next_key(), steps=iterations3, lr_adam=lr_adam,
            gamma=lr_gamma, b1=beta_1, b2=beta_2, eps=epsilon,
            messages=messages, data=batch,
            checkpoint_every=checkpoint_every, checkpoint_fn=_ckpt,
        )
        traces.append(_ls)
        return jnp.concatenate([jnp.ravel(t) for t in traces]) if traces else jnp.zeros((0,))

    @staticmethod
    def _make_inducing_points(X: List, Y: List) -> List:
        return [np.asarray(X[0]).copy()] + [np.asarray(x).copy() for x in X[1:]]
