"""Multi-fidelity deep GP with Embedded Mapping (variant input dimensions).

TPU-native counterpart of /root/reference/dgp_dace/models/MF_DGP_EM.py:
fidelities whose input spaces have different dimensions are bridged by a stack
of *reduction* GP layers mapping the high-dimensional inputs down to each
lower space (MF_DGP_EM.py:60-86). Propagation first runs the reduction chain
collecting representations Hs, then the fidelity chain with skip-connected
concatenation [Hs[-(i+1)], F] (MF_DGP_EM.py:123-168). The ELBO adds a
projection data term L_red supervising the reduction posterior with given
projections X_red under a dedicated Gaussian likelihood, plus the reduction
KLs (MF_DGP_EM.py:262-301).

Faithfully kept quirk: the reference scales L_red by
N_{f+1} / N_f (n_data of the next fidelity over the *current* fidelity's
batch size, MF_DGP_EM.py:292-293); the published Park_VD numbers were
produced with it.
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


class MFDGPEMParams(struct.PyTreeNode):
    layers: Tuple[SVGPLayer, ...]
    layers_red: Tuple[SVGPLayer, ...]
    likelihood: Gaussian
    likelihood_projection: Gaussian


# -- augmented inducing points through the reduction stack -----------------------


def z_right_em(layers, zs_full, layers_red, zs_red, points, key, num_samples=50):
    """sample_Z_right with reduction layers (MF_DGP_EM.py:38-58): map the
    trainable left block through the reduction chain, then through the earlier
    fidelity layers with skip concat."""
    H = points
    Hs = [H]
    for layer_red, zr_ in zip(layers_red, zs_red):
        key, sub = jax.random.split(key)
        H = mean_propagated_sample(layer_red, zr_, H, sub, num_samples)
        Hs.append(H)
    zr = None
    for i, (layer, zf) in enumerate(zip(layers, zs_full)):
        key, sub = jax.random.split(key)
        if i == 0:
            inp = Hs[-1]
        else:
            inp = jnp.concatenate([Hs[-(i + 1)], zr], axis=1)
        zr = mean_propagated_sample(layer, zf, inp, sub, num_samples)
    return zr


def compute_full_zs_em(params: MFDGPEMParams, key, num_samples=50):
    """Per-fidelity effective inducing inputs (MF_DGP_EM.py:269-271):
    layer i >= 1 uses reduction sub-chain layers_red[L-i:]."""
    L = len(params.layers_red)
    zs_red = [l.z for l in params.layers_red]
    zs = [params.layers[0].z]
    for i in range(1, len(params.layers)):
        key, sub = jax.random.split(key)
        zl = params.layers[i].z_left
        zr = z_right_em(
            params.layers[:i], zs[:i],
            params.layers_red[L - i:], zs_red[L - i:],
            zl, sub, num_samples,
        )
        zs.append(jnp.concatenate([zl, zr], axis=1))
    return zs


# -- propagation ------------------------------------------------------------------


def propagate(params: MFDGPEMParams, X, key, S: int, zs_full=None,
              fidelity_dim: Optional[int] = None, project=False,
              full_cov=False):
    """Reduction chain then fidelity chain (MF_DGP_EM.py:123-168).

    :param fidelity_dim: how many reduction layers to apply
        (layers_red[L-fidelity_dim:]) and fidelity layers (0..fidelity_dim).
        None = all (highest fidelity).
    :param project: return the reduction outputs (Hs) instead.
    """
    L = len(params.layers_red)
    fidelity_dim = L if fidelity_dim is None else fidelity_dim
    if zs_full is None:
        key, sub = jax.random.split(key)
        zs_full = compute_full_zs_em(params, sub)
    sX = jnp.tile(X[None], (S, 1, 1))
    H = sX
    Hs = [H]
    Hmeans, Hvars = [], []
    for layer_red in params.layers_red[L - fidelity_dim:]:
        key, sub = jax.random.split(key)
        H, Hmean, Hvar = sample_from_conditional(
            layer_red, layer_red.z, H, sub, full_cov=full_cov
        )
        Hs.append(H)
        Hmeans.append(Hmean)
        Hvars.append(Hvar)
    if project:
        return tuple(Hs), tuple(Hmeans), tuple(Hvars)

    F = None
    Fs, Fmeans, Fvars = [], [], []
    for i in range(fidelity_dim + 1):
        key, sub = jax.random.split(key)
        inp = Hs[-1] if i == 0 else jnp.concatenate([Hs[-(i + 1)], F], axis=2)
        F, Fmean, Fvar = sample_from_conditional(
            params.layers[i], zs_full[i], inp, sub, full_cov=full_cov
        )
        Fs.append(F)
        Fmeans.append(Fmean)
        Fvars.append(Fvar)
    return tuple(Fs), tuple(Fmeans), tuple(Fvars)


def predict_f(params: MFDGPEMParams, X, key, S: int,
              fidelity: Optional[int] = None,
              fidelity_dim: Optional[int] = None, full_cov=False):
    _, Fmeans, Fvars = propagate(params, X, key, S, fidelity_dim=fidelity_dim,
                                 full_cov=full_cov)
    idx = -1 if fidelity is None else fidelity
    return Fmeans[idx], Fvars[idx]


def project(params: MFDGPEMParams, X, key, S: int,
            fidelity: Optional[int] = None,
            fidelity_dim: Optional[int] = None):
    """Reduction posterior at X (MF_DGP_EM.py:187-203)."""
    _, Hmeans, Hvars = propagate(params, X, key, S, fidelity_dim=fidelity_dim,
                                 project=True)
    idx = -1 if fidelity is None else fidelity
    return Hmeans[idx], Hvars[idx]


def _weighted_data_term(var_exp, w):
    """(weighted row sum of E_S[var_exp], effective row count); rows with
    weight 0 are shape padding (training.pad_to_bucket)."""
    per_row = jnp.mean(var_exp, axis=0)
    if w is None:
        return jnp.sum(per_row), per_row.shape[0]
    return jnp.sum(w[:, None] * per_row), jnp.sum(w)


def elbo(params: MFDGPEMParams, Xs, Ys, X_red, key, num_samples: int,
         train_upto_fidelity: int = -1, row_weights=None, num_data=None):
    """Fidelity data terms + projection data terms - all KLs
    (MF_DGP_EM.py:262-301).

    :param row_weights: optional per-fidelity 0/1 row-weight tuple (padding).
    :param num_data: optional per-fidelity full-dataset sizes; data terms are
        then scaled N_f/B_f and the projection term generalizes the
        reference's N_{f+1}/batch_f quirk (MF_DGP_EM.py:292-293) to
        (N_{f+1}/B_{f+1}) * (N_{f+1}/N_f) — both reduce to the reference's
        value at full batch.
    """
    key, kz = jax.random.split(key)
    zs_full = compute_full_zs_em(params, kz)
    n_layers = len(params.layers)
    L = 0.0
    KL = 0.0
    L_red = 0.0
    KL_red = 0.0
    for fidelity in range(n_layers):
        if train_upto_fidelity != -1 and fidelity > train_upto_fidelity:
            continue
        key, sub = jax.random.split(key)
        _, Fmeans, Fvars = propagate(params, Xs[fidelity], sub, num_samples,
                                     zs_full=zs_full, fidelity_dim=fidelity)
        Fmean, Fvar = Fmeans[fidelity], Fvars[fidelity]
        if fidelity == n_layers - 1:
            var_exp = params.likelihood.variational_expectations(
                Fmean, Fvar, Ys[fidelity]
            )
        else:
            var_exp = fidelity_variational_expectations(
                Fmean, Fvar, Ys[fidelity],
                params.layers[fidelity].kernel.kernels[-1].variance,
            )
        w = None if row_weights is None else row_weights[fidelity]
        term, eff = _weighted_data_term(var_exp, w)
        n_cur = eff if num_data is None else num_data[fidelity]
        L += term * (n_cur / eff)
        KL += layer_kl(params.layers[fidelity], zs_full[fidelity])
        if fidelity < n_layers - 1:
            key, sub = jax.random.split(key)
            Hmean, Hvar = project(params, Xs[fidelity + 1], sub, num_samples,
                                  fidelity=fidelity,
                                  fidelity_dim=fidelity + 1)
            ve_red = params.likelihood_projection.variational_expectations(
                Hmean, Hvar, X_red[fidelity]
            )
            w_next = None if row_weights is None else row_weights[fidelity + 1]
            term_red, eff_next = _weighted_data_term(ve_red, w_next)
            n_next = eff_next if num_data is None else num_data[fidelity + 1]
            # (estimation factor) * (the reference's N_{f+1}/N_f quirk)
            scale = (n_next / eff_next) * (n_next / n_cur)
            L_red += term_red * scale
            KL_red += layer_kl(params.layers_red[fidelity],
                               params.layers_red[fidelity].z)
    return L + L_red - KL - KL_red


def predict_y(params: MFDGPEMParams, X, key, S: int, full_cov=False):
    Fmean, Fvar = predict_f(params, X, key, S, full_cov=full_cov)
    return params.likelihood.predict_mean_and_var(Fmean, Fvar)


# -- construction --------------------------------------------------------------------


def make_mf_em_kernels(X: Sequence, add_linear=True, dtype=None):
    """Per-fidelity composite kernels with per-fidelity input dims, plus
    reduction RBFs (MF_DGP_EM.py:325-374)."""
    n_fidelities = len(X)
    Din0 = np.asarray(X[0]).shape[1]
    kernels = [K.RBF.create(variance=1.0, lengthscales=[1.0] * Din0,
                            active_dims=list(range(Din0)), dtype=dtype)]
    for l in range(1, n_fidelities):
        Din = np.asarray(X[l]).shape[1]
        D = Din + 1
        d_in = tuple(range(Din))
        d_prev = tuple(range(Din, D))
        k_corr = K.RBF.create(variance=1.0, active_dims=d_in, dtype=dtype)
        k_prev = K.RBF.create(variance=1.0, active_dims=d_prev, dtype=dtype)
        k_in = K.RBF.create(variance=1.0, active_dims=d_in, dtype=dtype)
        if add_linear:
            k_l = k_corr * (k_prev + K.Linear.create(
                variance=1.0, active_dims=d_prev, dtype=dtype)) + k_in
        else:
            k_l = k_corr * k_prev + k_in
        kernels.append(k_l)
    kernels = [
        k + K.White.create(variance=1e-6, dtype=dtype)
        if i < n_fidelities - 1 else k
        for i, k in enumerate(kernels)
    ]
    kernels_red = [
        K.RBF.create(variance=1.0,
                     lengthscales=[1.0] * np.asarray(X[-(l + 1)]).shape[1],
                     dtype=dtype)
        for l in range(n_fidelities - 1)
    ]
    return kernels, kernels_red


def init_layers_mf_em(X, Z, W, kernels, kernels_red, num_outputs=1, key=None,
                      num_samples=100):
    """Reduction + fidelity layers (MF_DGP_EM.py:60-86)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    dtype = default_float()
    layers_red = []
    for i in range(1, len(X)):
        num_outputs_red = np.asarray(X[-(1 + i)]).shape[1]
        layers_red.append(
            make_svgp_layer(kernels_red[i - 1], W[i - 1], num_outputs_red,
                            dtype=dtype)
        )
    L = len(layers_red)
    zs_red = [l.z for l in layers_red]

    layers = [make_svgp_layer(kernels[0], Z[0], num_outputs, dtype=dtype)]
    zs_full = [layers[0].z]
    for i in range(1, len(Z)):
        key, sub = jax.random.split(key)
        zl = jnp.asarray(np.asarray(Z[i]), dtype=dtype)
        zr = z_right_em(layers[:i], zs_full[:i], layers_red[L - i:],
                        zs_red[L - i:], zl, sub, num_samples)
        z_full = jnp.concatenate([zl, zr], axis=1)
        layers.append(
            make_svgp_layer(kernels[i], zl, num_outputs, augmented=True,
                            Z_full_init=z_full, dtype=dtype)
        )
        zs_full.append(z_full)
    return layers, layers_red


_elbo_jit = maybe_jit(elbo, static_argnums=(5, 6))
_propagate_jit = maybe_jit(propagate, static_argnums=(3, 5, 6, 7))
_predict_f_jit = maybe_jit(predict_f, static_argnums=(3, 4, 5, 6))
_project_jit = maybe_jit(project, static_argnums=(3, 4, 5))
_predict_y_jit = maybe_jit(predict_y, static_argnums=(3, 4))


@functools.lru_cache(maxsize=None)
def _em_loss(num_samples: int, train_upto: int = -1):
    """Stable -ELBO object for the cached training engines;
    batch = (Xs, Ys, X_red, row_weights, num_data) tuples — the last two may
    be None (plain full batch)."""

    def loss(params, key, batch):
        Xs, Ys, Xr, ws, nd = batch
        return -elbo(params, Xs, Ys, Xr, key, num_samples,
                     train_upto_fidelity=train_upto, row_weights=ws,
                     num_data=nd)

    return loss


@functools.lru_cache(maxsize=None)
def _em_minibatch_loss(num_samples: int, batch_sizes: tuple,
                       train_upto: int = -1):
    """-ELBO over per-fidelity uniform minibatches; the X_red[f] projection
    targets are rows paired with Xs[f+1], so they subsample with the same
    index draw. batch = (Xs, Ys, X_red, n_trues)."""

    def loss(params, key, batch):
        Xs, Ys, Xr, n_trues = batch
        key, ks = jax.random.split(key)
        idxs = []
        for f, B in enumerate(batch_sizes):
            key, kf = jax.random.split(key)
            idxs.append(jax.random.randint(kf, (B,), 0, n_trues[f]))
        Xb = tuple(Xs[f][idxs[f]] for f in range(len(batch_sizes)))
        Yb = tuple(Ys[f][idxs[f]] for f in range(len(batch_sizes)))
        Xrb = tuple(Xr[f][idxs[f + 1]] for f in range(len(batch_sizes) - 1))
        return -elbo(params, Xb, Yb, Xrb, ks, num_samples,
                     train_upto_fidelity=train_upto, num_data=n_trues)

    return loss


@functools.lru_cache(maxsize=None)
def _em_qs_accessors(n_fid: int, n_red: int):
    """Stable natural-gradient accessors over both the fidelity and the
    reduction layers' q (MF_DGP_EM.py:501-578 phase 3)."""

    def get(p):
        qs = [(p.layers[i].q_mu, p.layers[i].q_sqrt) for i in range(n_fid)]
        qs += [(p.layers_red[i].q_mu, p.layers_red[i].q_sqrt)
               for i in range(n_red)]
        return qs

    def set_(p, qs):
        layers = list(p.layers)
        for i in range(n_fid):
            layers[i] = layers[i].replace(q_mu=qs[i][0], q_sqrt=qs[i][1])
        layers_red = list(p.layers_red)
        for i in range(n_red):
            q_mu, q_sqrt = qs[n_fid + i]
            layers_red[i] = layers_red[i].replace(q_mu=q_mu, q_sqrt=q_sqrt)
        return p.replace(layers=tuple(layers), layers_red=tuple(layers_red))

    return get, set_


class MultiFidelityDeepGP_EM:
    """Reference-parity wrapper (MF_DGP_EM.py:383-596).

    :param X: per-fidelity inputs (different dims allowed; low -> high).
    :param X_red: given projections of the higher-fidelity inputs into each
        lower space (nb_mfdgpem cell 8 uses X[1][:, :2]).
    :param W: reduction-layer inducing inputs; default [X[-1], X[-2], ...]
        (MF_DGP_EM.py:400-405).
    """

    name = "mf_dgp_EM"

    def __init__(self, X, Y, X_red, Z=None, W=None, n_iter=5000,
                 fix_inducing=True, num_samples=100, seed=0,
                 minibatch_size=None, n_bucket=None, mesh=None):
        dtype = default_float()
        self._X = [jnp.asarray(np.asarray(x), dtype=dtype) for x in X]
        self._Y = [jnp.asarray(np.asarray(y), dtype=dtype) for y in Y]
        self._X_red = [jnp.asarray(np.asarray(x), dtype=dtype) for x in X_red]
        self.num_samples = num_samples
        if isinstance(minibatch_size, int):
            minibatch_size = [minibatch_size] * len(X)
        self.minibatch_size = minibatch_size
        self.n_bucket = n_bucket
        self.mesh = mesh
        self._key = jax.random.PRNGKey(seed)
        if Z is None:
            Z = [np.asarray(X[0]).copy()] + [np.asarray(x).copy() for x in X[1:]]
        if W is None:
            W = [np.asarray(X[-1]).copy()]
            for i in range(1, len(X) - 1):
                W.append(np.asarray(X[-(1 + i)]).copy())
        self.Z, self.W = Z, W
        kernels, kernels_red = make_mf_em_kernels(X, dtype=dtype)
        layers, layers_red = init_layers_mf_em(X, Z, W, kernels, kernels_red,
                                               key=self._next_key())
        self.params = MFDGPEMParams(
            layers=tuple(layers), layers_red=tuple(layers_red),
            likelihood=Gaussian.create(1.0, dtype=dtype),
            likelihood_projection=Gaussian.create(1.0, dtype=dtype),
        )
        self.n_fidelities = len(X)
        self.n_iter = n_iter
        self.fix_inducing = fix_inducing

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _loss_spec(self, train_upto: int = -1):
        """(stable loss_fn, traced batch) for the cached training engines
        (training._ENGINE_CACHE). Supports per-fidelity minibatching (the
        X_red projection rows pair with the next fidelity's index draw) and
        row bucketing — see mf_dgp._loss_spec."""
        Xs, Ys = list(self._X), list(self._Y)
        Xr = list(self._X_red)
        if self.mesh is not None:
            import math

            from ..parallel.data_parallel import (
                sharded_em_loss,
                sharded_em_minibatch_loss,
            )
            from ..parallel.mesh import shard_batch

            n_dev = self.mesh.shape["data"]
            bucket = math.lcm(n_dev, self.n_bucket or 1)
            ws, nds = [], []
            for f in range(len(Xs)):
                Xp, Yp, w = training.pad_to_bucket(Xs[f], Ys[f], bucket)
                if f >= 1:  # X_red[f-1] rows pair with Xs[f] rows
                    Xrp = training.pad_to_bucket(self._X[f], Xr[f - 1],
                                                 bucket)[1]
                    Xr[f - 1] = shard_batch(self.mesh, Xrp)
                Xp, Yp, w = shard_batch(self.mesh, Xp, Yp, w)
                Xs[f], Ys[f] = Xp, Yp
                ws.append(w)
                nds.append(jnp.asarray(self._X[f].shape[0], Xp.dtype))
            batch = (tuple(Xs), tuple(Ys), tuple(Xr), tuple(ws), tuple(nds))
            if self.minibatch_size is not None:
                sizes = tuple(
                    min(int(b), x.shape[0])
                    for b, x in zip(self.minibatch_size, self._X)
                )
                return (sharded_em_minibatch_loss(self.mesh,
                                                  self.num_samples, sizes,
                                                  train_upto), batch)
            return sharded_em_loss(self.mesh, self.num_samples,
                                   train_upto), batch
        if self.minibatch_size is not None:
            sizes = tuple(
                min(int(b), x.shape[0])
                for b, x in zip(self.minibatch_size, Xs)
            )
            n_trues = tuple(
                jnp.asarray(x.shape[0], dtype=jnp.int32) for x in Xs
            )
            return (_em_minibatch_loss(self.num_samples, sizes, train_upto),
                    (tuple(Xs), tuple(Ys), tuple(Xr), n_trues))
        if self.n_bucket:
            ws, nd = [], []
            for f in range(len(Xs)):
                Xp, Yp, w = training.pad_to_bucket(Xs[f], Ys[f],
                                                    self.n_bucket)
                if f >= 1:  # X_red[f-1] rows pair with Xs[f] rows
                    Xr[f - 1] = training.pad_to_bucket(
                        self._X[f], Xr[f - 1], self.n_bucket)[1]
                Xs[f], Ys[f] = Xp, Yp
                ws.append(w)
                nd.append(jnp.asarray(self._X[f].shape[0], Xp.dtype))
            return (_em_loss(self.num_samples, train_upto),
                    (tuple(Xs), tuple(Ys), tuple(Xr), tuple(ws), tuple(nd)))
        return (_em_loss(self.num_samples, train_upto),
                (tuple(Xs), tuple(Ys), tuple(Xr), None, None))

    def objective(self):
        return _elbo_jit(self.params, tuple(self._X), tuple(self._Y),
                    tuple(self._X_red), self._next_key(), self.num_samples, -1)

    ELBO = objective

    def propagate(self, X, full_cov=False, S=1, fidelity_dim=None,
                  project=False):
        X = jnp.asarray(X, dtype=default_float())
        return _propagate_jit(self.params, X, self._next_key(), S, None,
                              fidelity_dim, project, full_cov)

    def predict_all_layers(self, Xnew, num_samples):
        """All per-layer samples/means/vars (MF_DGP.py:234-235)."""
        return self.propagate(Xnew, full_cov=False, S=num_samples)

    def predict_f(self, X, full_cov=False, S=1, fidelity=None,
                  fidelity_dim=None):
        X = jnp.asarray(X, dtype=default_float())
        return _predict_f_jit(self.params, X, self._next_key(), S, fidelity,
                              fidelity_dim, full_cov)

    def project(self, X, full_cov=False, S=1, fidelity=None, fidelity_dim=None):
        X = jnp.asarray(X, dtype=default_float())
        return _project_jit(self.params, X, self._next_key(), S, fidelity,
                            fidelity_dim)

    def predict_y(self, Xnew, num_samples, full_cov=False):
        Xnew = jnp.asarray(Xnew, dtype=default_float())
        return _predict_y_jit(self.params, Xnew, self._next_key(), num_samples,
                              full_cov)

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
            serving.sharded_predict_y_em(mesh, num_samples), self.params,
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
        y_m, y_v = self.predict_y(X_test, 250, full_cov=full_cov)
        mean, var = moment_matched(y_m, y_v)
        return (np.asarray(mean).reshape(-1, 1), np.asarray(var).reshape(-1, 1))

    # -- staged training -----------------------------------------------------------
    def _init_variational(self, q_scale_fid=1e-3, q_scale_red=1e-5):
        """MF_DGP_EM.py:507-526: q_mu <- Y_i / X_red; q_sqrt scaled; both
        likelihood variances initialized and (per the reference's nat_adam)
        kept frozen throughout."""
        layers = list(self.params.layers)
        for i in range(len(layers)):
            y = self._Y[i]
            q_mu = y if layers[i].q_mu.shape == y.shape else layers[i].q_mu
            layers[i] = layers[i].replace(
                q_mu=q_mu, q_sqrt=layers[i].q_sqrt * (q_scale_fid * jnp.var(y))
            )
        layers_red = list(self.params.layers_red)
        for i in range(len(layers_red)):
            xr = self._X_red[-(i + 1)]
            q_mu = xr if layers_red[i].q_mu.shape == xr.shape else layers_red[i].q_mu
            layers_red[i] = layers_red[i].replace(
                q_mu=q_mu, q_sqrt=layers_red[i].q_sqrt * q_scale_red
            )
        self.params = self.params.replace(
            layers=tuple(layers), layers_red=tuple(layers_red),
            likelihood=Gaussian.create(
                float(jnp.var(self._Y[-1])) * 1e-3, dtype=default_float()
            ),
            likelihood_projection=Gaussian.create(
                float(jnp.var(self._X_red[-1])) * 1e-3, dtype=default_float()
            ),
        )

    def optimize_nat_adam(self, lr_adam=0.01, lr_gamma=0.01, iterations1=2000,
                          iterations2=5000, iterations3=7500, beta_1=0.9,
                          beta_2=0.999, epsilon=1e-7, messages=500,
                          train_upto_fidelity=-1,
                          checkpoint_path=None, checkpoint_every=0):
        """3-phase training (MF_DGP_EM.py:501-578): phase 3 runs natural
        gradients over both the fidelity and the reduction layers' q."""
        self._init_variational()
        traces = []
        loss_fn, batch = self._loss_spec(train_upto_fidelity)
        _ckpt = (training.make_checkpoint_fn(checkpoint_path)
                 if checkpoint_path else None)
        q = {"q_mu", "q_sqrt"}
        lik = {"likelihood", "likelihood_projection"}
        # phase 1: kernels + reduction inducing only
        m1 = training.make_mask(
            self.params, frozen_fields=lik,
            frozen_layer_fields={("layers", "all"): q | {"z", "z_left"},
                                 ("layers_red", "all"): q},
        )
        # phase 2: + fidelity inducing inputs
        m2 = training.make_mask(
            self.params, frozen_fields=lik,
            frozen_layer_fields={("layers", "all"): q,
                                 ("layers_red", "all"): q},
        )
        m3 = m2  # likelihood variances stay frozen (MF_DGP_EM.py:562)
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

        get_q, set_q = _em_qs_accessors(len(self.params.layers),
                                        len(self.params.layers_red))
        self.params, _ls = training.nat_adam_run(
            loss_fn, self.params, m3, get_qs=get_q, set_qs=set_q,
            key=self._next_key(), steps=iterations3, lr_adam=lr_adam,
            gamma=lr_gamma, b1=beta_1, b2=beta_2, eps=epsilon,
            messages=messages, data=batch,
            checkpoint_every=checkpoint_every, checkpoint_fn=_ckpt,
        )
        traces.append(_ls)
        return jnp.concatenate([jnp.ravel(t) for t in traces]) if traces else jnp.zeros((0,))

    def optimize_adam(self, lr=0.01, iterations1=2000, iterations2=5000,
                      iterations3=7500, beta_1=0.9, beta_2=0.999, epsilon=1e-7,
                      messages=500, train_upto_fidelity=-1,
                      checkpoint_path=None, checkpoint_every=0):
        """3-phase plain Adam (MF_DGP_EM.py:429-499): phase 3 unfreezes the
        fidelity q and the model likelihood."""
        self._init_variational(q_scale_fid=1e-2, q_scale_red=1e-2)
        traces = []
        loss_fn, batch = self._loss_spec(train_upto_fidelity)
        _ckpt = (training.make_checkpoint_fn(checkpoint_path)
                 if checkpoint_path else None)
        q = {"q_mu", "q_sqrt"}
        lik = {"likelihood", "likelihood_projection"}
        m1 = training.make_mask(
            self.params, frozen_fields=lik,
            frozen_layer_fields={("layers", "all"): q | {"z", "z_left"},
                                 ("layers_red", "all"): q},
        )
        m2 = training.make_mask(
            self.params, frozen_fields=lik,
            frozen_layer_fields={("layers", "all"): q,
                                 ("layers_red", "all"): q},
        )
        m3 = training.make_mask(
            self.params, frozen_fields={"likelihood_projection"},
            frozen_layer_fields={("layers_red", "all"): q},
        )
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

    @staticmethod
    def _make_inducing_points(X: List, Y: List) -> List:
        return [np.asarray(X[0]).copy()] + [np.asarray(x).copy() for x in X[1:]]
