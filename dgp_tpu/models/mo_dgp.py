"""Multi-objective deep GP.

TPU-native counterpart of /root/reference/dgp_dace/models/MO_DGP.py: each of
two objectives is one SVGP layer; layers are coupled by a recurrent
alternation — the chain is seeded with a random normal column, layer 0 is
applied to [x, F], then layers (1, 0, 1, 0, ...) alternate for 2*loop steps,
and the final outputs of layer 0 then layer 1 become the two objectives
(MO_DGP.py:88-122). Both layers use the MF composite kernel and layer >= 1
carries augmented inducing points exactly as MF-DGP.

Reference bug fixed: the ``_train_upto_fidelity`` typo in the ELBO guard
(MO_DGP.py:204, attribute is ``_train_upto_objective``).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import default_float
from ..layers.svgp import SVGPLayer, layer_kl, sample_from_conditional
from ..ops import kernels as K
from ..ops.likelihoods import Gaussian, fidelity_variational_expectations
from . import training
from ._jit import maybe_jit
from .dgp import moment_matched
from .mf_dgp import compute_full_zs, init_layers_mf


class MODGPParams(struct.PyTreeNode):
    layers: Tuple[SVGPLayer, ...]
    likelihood: Gaussian


def _jitter_lengthscales(params, key, sigma=0.5):
    """Log-normal multiplicative jitter on every kernel lengthscale leaf
    (restart init diversity for ``optimize_nat_adam(restarts=k)``)."""
    from ..ops.transforms import positive, positive_inverse

    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for i, (path, leaf) in enumerate(leaves):
        if path and "lengthscales_raw" in str(path[-1]):
            eps = jax.random.normal(jax.random.fold_in(key, i),
                                    jnp.shape(leaf), dtype=leaf.dtype)
            leaf = positive_inverse(positive(leaf) * jnp.exp(sigma * eps))
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def make_mo_kernels(Din: int, n_objectives: int, add_linear=True, dtype=None,
                    white_variance=1e-6):
    """Every layer (including the first) uses the composite coupled kernel on
    [x, f_other] inputs (MO_DGP.py:264-289).

    :param white_variance: init of the inner-objective noise (the reference
        hardcodes 1e-6, MO_DGP.py:289). The tiny value makes the inner data
        term astronomically stiff (the reference's own notebook stops at ELBO
        -1.7e8), but measured here a looser 1e-2 init destabilizes the
        coupled recursion entirely (feedback blowup) — the stiff anchor is
        load-bearing, so the default stays at the reference value.
    """
    kernels = []
    for _ in range(n_objectives):
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
    return [
        k + K.White.create(variance=white_variance, dtype=dtype)
        if i < n_objectives - 1
        else k
        for i, k in enumerate(kernels)
    ]


def propagate(params: MODGPParams, X, key, S: int, loop: int = 2,
              full_cov=False):
    """Recurrent alternation (MO_DGP.py:98-122). Returns exactly two entries
    per output list: (objective 0, objective 1).

    Note: like the reference (MO_DGP.py:102-103), the seed column is one
    random draw per data point, shared across the S sample paths.
    """
    key, kz, kseed = jax.random.split(key, 3)
    zs_full = compute_full_zs(params.layers, kz, pad_cols=1)
    sX = jnp.tile(X[None], (S, 1, 1))
    F0 = jax.random.normal(kseed, (X.shape[0], 1), dtype=X.dtype)
    F = jnp.tile(F0[None], (S, 1, 1))

    key, sub = jax.random.split(key)
    F, Fmean, Fvar = sample_from_conditional(
        params.layers[0], zs_full[0], jnp.concatenate([sX, F], 2), sub,
        full_cov=full_cov,
    )
    if loop == 0:
        key, sub = jax.random.split(key)
        F, Fmean, Fvar = sample_from_conditional(
            params.layers[1], zs_full[1], jnp.concatenate([sX, F], 2), sub,
            full_cov=full_cov,
        )
    else:
        for j in range(2 * loop):
            k_idx = (j + 1) % 2
            key, sub = jax.random.split(key)
            F, Fmean, Fvar = sample_from_conditional(
                params.layers[k_idx], zs_full[k_idx],
                jnp.concatenate([sX, F], 2), sub, full_cov=full_cov,
            )
    Fs, Fmeans, Fvars = [F], [Fmean], [Fvar]
    key, sub = jax.random.split(key)
    F, Fmean, Fvar = sample_from_conditional(
        params.layers[1], zs_full[1], jnp.concatenate([sX, F], 2), sub,
        full_cov=full_cov,
    )
    Fs.append(F)
    Fmeans.append(Fmean)
    Fvars.append(Fvar)
    return tuple(Fs), tuple(Fmeans), tuple(Fvars)


def predict_f(params: MODGPParams, X, key, S: int, objective: Optional[int] = None,
              loop: int = 2, full_cov=False):
    idx = -1 if objective is None else objective
    _, Fmeans, Fvars = propagate(params, X, key, S, loop=loop, full_cov=full_cov)
    return Fmeans[idx], Fvars[idx]


def elbo(params: MODGPParams, Xs, Ys, key, num_samples: int, loop: int = 2,
         train_upto_objective: int = -1, row_weights=None, num_data=None):
    """Per-objective data terms + per-layer KLs (MO_DGP.py:190-217).

    :param row_weights: optional per-objective tuple of 0/1 row weights
        (shape padding, training.pad_to_bucket).
    :param num_data: optional per-objective full-dataset sizes; data terms
        are then scaled N/B (the minibatch scale the reference stores and
        never consumes, MF_DGP.py:88)."""
    from .mf_dgp import _weighted_data_term

    key, kz = jax.random.split(key)
    zs_full = compute_full_zs(params.layers, kz, pad_cols=1)
    n = len(params.layers)
    L = 0.0
    KL = 0.0
    for objective in range(n):
        if train_upto_objective != -1 and objective > train_upto_objective:
            continue
        key, sub = jax.random.split(key)
        _, Fmeans, Fvars = propagate(params, Xs[objective], sub, num_samples,
                                     loop=loop)
        Fmean, Fvar = Fmeans[objective], Fvars[objective]
        if objective == n - 1:
            var_exp = params.likelihood.variational_expectations(
                Fmean, Fvar, Ys[objective]
            )
        else:
            var_exp = fidelity_variational_expectations(
                Fmean, Fvar, Ys[objective],
                params.layers[objective].kernel.kernels[-1].variance,
            )
        w = None if row_weights is None else row_weights[objective]
        term, eff = _weighted_data_term(var_exp, w)
        scale = 1.0 if num_data is None else num_data[objective] / eff
        L += term * scale
        KL += layer_kl(params.layers[objective], zs_full[objective])
    return L - KL


_elbo_jit = maybe_jit(elbo, static_argnums=(4, 5, 6))
_propagate_jit = maybe_jit(propagate, static_argnums=(3, 4, 5))
_predict_f_jit = maybe_jit(predict_f, static_argnums=(3, 4, 5, 6))


@functools.lru_cache(maxsize=None)
def _mo_loss(num_samples: int, loop: int, train_upto: int = -1):
    """Stable -ELBO object for the cached training engines;
    batch = (Xs, Ys, row_weights, num_data) tuples — the last two may be
    None (plain full batch)."""

    def loss(params, key, batch):
        Xs, Ys, ws, nd = batch
        return -elbo(params, Xs, Ys, key, num_samples, loop=loop,
                     train_upto_objective=train_upto, row_weights=ws,
                     num_data=nd)

    return loss


@functools.lru_cache(maxsize=None)
def _mo_minibatch_loss(num_samples: int, loop: int, batch_sizes: tuple,
                       train_upto: int = -1):
    """-ELBO over per-objective uniform minibatches with the N/B scale;
    batch = (Xs, Ys, n_trues) with n_trues traced scalars."""

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
                     loop=loop, train_upto_objective=train_upto,
                     num_data=n_trues)

    return loss


class MultiObjDeepGP:
    """Reference-parity wrapper (MO_DGP.py:305-512). Default inducing points:
    Z[0] = [X, Y_2], Z[1] = X (MO_DGP.py:495-512)."""

    name = "mo_dgp"

    def __init__(self, X, Y, Z=None, n_iter=5000, loop=2, fix_inducing=True,
                 num_samples=10, white_variance=1e-6, seed=0,
                 minibatch_size=None, n_bucket=None, mesh=None):
        dtype = default_float()
        self._X = [jnp.asarray(np.asarray(x), dtype=dtype) for x in X]
        self._Y = [jnp.asarray(np.asarray(y), dtype=dtype) for y in Y]
        self.loop = loop
        self.num_samples = num_samples
        if isinstance(minibatch_size, int):
            minibatch_size = [minibatch_size] * len(X)
        self.minibatch_size = minibatch_size
        self.n_bucket = n_bucket
        self.mesh = mesh
        self._key = jax.random.PRNGKey(seed)
        if Z is None:
            Z = self._make_inducing_points(X, Y)
        self.Z = Z
        kernels = make_mo_kernels(np.asarray(X[0]).shape[1], len(X),
                                  dtype=dtype, white_variance=white_variance)
        layers = init_layers_mf(Z, kernels, key=self._next_key(), pad_cols=1)
        self.params = MODGPParams(layers=tuple(layers),
                                  likelihood=Gaussian.create(1.0, dtype=dtype))
        self.n_fidelities = len(X)
        self.n_iter = n_iter
        self.fix_inducing = fix_inducing
        # expose a .model with .propagate for EHVI parity (EHVI.py:125)
        self.model = self

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _loss_spec(self, train_upto: int = -1):
        """(stable loss_fn, traced batch) for the cached training engines
        (training._ENGINE_CACHE); minibatch/bucket/mesh variants mirror
        mf_dgp._loss_spec."""
        Xs, Ys = list(self._X), list(self._Y)
        if self.mesh is not None:
            from ..parallel.data_parallel import (
                pad_shard_fidelity_batch,
                sharded_mo_loss,
                sharded_mo_minibatch_loss,
            )

            batch = pad_shard_fidelity_batch(self.mesh, Xs, Ys,
                                             self.n_bucket)
            if self.minibatch_size is not None:
                sizes = tuple(
                    min(int(b), x.shape[0])
                    for b, x in zip(self.minibatch_size, self._X)
                )
                return (sharded_mo_minibatch_loss(self.mesh,
                                                  self.num_samples,
                                                  self.loop, sizes,
                                                  train_upto), batch)
            return (sharded_mo_loss(self.mesh, self.num_samples, self.loop,
                                    train_upto), batch)
        if self.minibatch_size is not None:
            sizes = tuple(
                min(int(b), x.shape[0])
                for b, x in zip(self.minibatch_size, Xs)
            )
            n_trues = tuple(
                jnp.asarray(x.shape[0], dtype=jnp.int32) for x in Xs
            )
            return (_mo_minibatch_loss(self.num_samples, self.loop, sizes,
                                       train_upto),
                    (tuple(Xs), tuple(Ys), n_trues))
        if self.n_bucket:
            ws, nd = [], []
            for f in range(len(Xs)):
                Xp, Yp, w = training.pad_to_bucket(Xs[f], Ys[f],
                                                   self.n_bucket)
                Xs[f], Ys[f] = Xp, Yp
                ws.append(w)
                nd.append(jnp.asarray(self._X[f].shape[0], Xp.dtype))
            return (_mo_loss(self.num_samples, self.loop, train_upto),
                    (tuple(Xs), tuple(Ys), tuple(ws), tuple(nd)))
        return (_mo_loss(self.num_samples, self.loop, train_upto),
                (tuple(Xs), tuple(Ys), None, None))

    def objective(self):
        return _elbo_jit(self.params, tuple(self._X), tuple(self._Y),
                    self._next_key(), self.num_samples, self.loop, -1)

    ELBO = objective

    def propagate(self, X, full_cov=False, S=1):
        X = jnp.asarray(X, dtype=default_float())
        return _propagate_jit(self.params, X, self._next_key(), S, self.loop,
                              full_cov)

    def predict_all_layers(self, Xnew, num_samples):
        """All per-layer samples/means/vars (MF_DGP.py:234-235)."""
        return self.propagate(Xnew, full_cov=False, S=num_samples)

    def predict_f(self, X, full_cov=False, S=1, objective=None):
        X = jnp.asarray(X, dtype=default_float())
        return _predict_f_jit(self.params, X, self._next_key(), S, objective,
                              self.loop, full_cov)

    def predict_y(self, Xnew, num_samples, full_cov=False):
        Fmean, Fvar = self.predict_f(Xnew, S=num_samples, full_cov=full_cov)
        return self.params.likelihood.predict_mean_and_var(Fmean, Fvar)

    def predict_y_sharded(self, Xnew, num_samples, mesh=None, chunk_size=None):
        """Data-parallel last-objective batch inference (serving path,
        beyond reference — see DGP.predict_y_sharded). Per-objective
        predictives shard the same way through
        ``parallel.serving.sharded_rowwise`` on a ``predict_f`` partial."""
        from ..parallel import serving

        mesh = mesh if mesh is not None else self.mesh
        if mesh is None:
            raise ValueError("predict_y_sharded needs a mesh (pass mesh= or "
                             "construct the model with one)")
        Xnew = jnp.asarray(Xnew, dtype=default_float())
        return serving.run_sharded(
            serving.sharded_predict_y_mo(mesh, num_samples, self.loop),
            self.params, Xnew, self._next_key(), mesh, chunk_size)

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

    # -- staged training ----------------------------------------------------------
    def _init_variational(self, q_sqrt_scale=1e-2):
        """MO_DGP.py:440-450: q_mu <- Y_i; q_sqrt scaled by var(Y); likelihood
        variance <- var(Y_last)*1e-2."""
        layers = list(self.params.layers)
        for i in range(len(layers)):
            y = self._Y[i]
            q_mu = y if layers[i].q_mu.shape == y.shape else layers[i].q_mu
            scale = q_sqrt_scale * jnp.var(self._Y[min(i, len(self._Y) - 1)])
            layers[i] = layers[i].replace(q_mu=q_mu,
                                          q_sqrt=layers[i].q_sqrt * scale)
        lik = Gaussian.create(float(jnp.var(self._Y[-1])) * 1e-2,
                              dtype=default_float())
        self.params = self.params.replace(layers=tuple(layers), likelihood=lik)

    def optimize_nat_adam(self, lr_adam=0.01, lr_gamma=0.01, iterations1=2000,
                          iterations2=5000, iterations3=7500, messages=500,
                          q_sqrt_scale=1e-2, train_upto_objective=-1,
                          checkpoint_path=None, checkpoint_every=0,
                          restarts="auto", restart_select="fit",
                          restart_threshold=0.9, max_restarts=4):
        """3-phase training (MO_DGP.py:418-494).

        :param train_upto_objective: restrict the ELBO's data terms to
            objectives 0..k (the reference's guard had a fatal typo,
            MO_DGP.py:204); -1 = all.
        :param restarts: best-of-k multi-start. The coupled recurrent
            landscape is chaotic — trajectories are ulp-sensitive to the MC
            key stream, and a minority land in poor basins that the natgrad
            loss guard cannot rescue (measured: 1 of 4 seeds at the full
            published schedule). With ``restarts=k > 1`` the schedule runs k
            times — restart 0 from the exact published init AND the exact
            restarts=1 MC stream, later restarts with independent PRNG
            streams *and* log-normal-jittered kernel lengthscale inits
            (sigma=0.5; stream-only restarts measured insufficient on
            bad-DoE seeds) — and the best candidate's parameters are kept.
            Candidates reuse the cached compiled engines, so warm restarts
            cost only the step time (~seconds at the reference's tiny-n
            configs), and they are embarrassingly parallel in principle.
            The default ``"auto"`` is the bad-basin escalation: run once
            (the exact published trajectory), score the fit, and only when
            the worst per-objective train r2 falls below
            ``restart_threshold`` keep restarting (up to ``max_restarts``
            total). Good seeds pay one extra ~50-sample fit evaluation;
            the measured ~1-in-4 silently-bad seeds (r2 0.49 at the
            published schedule, mo_seeds_results.json) get rescued instead
            of shipped. ``restarts=1`` restores the unguarded single run.
        :param restart_threshold: "auto" escalation trigger — the measured
            bad basins sit at worst-objective train r2 0.49-0.72 while
            healthy runs land >=0.997, so 0.9 separates them with margin.
            On genuinely noisy data where a DGP cannot reach train r2 0.9,
            every candidate scores below threshold and "auto" degenerates to
            best-of-``max_restarts`` — set ``restarts=1`` there.
        :param max_restarts: attempt budget for ``restarts="auto"``.
        :param restart_select: selection criterion. ``"fit"`` (default)
            maximizes the worst per-objective train r2 under a shared
            evaluation key — final ELBO provably does NOT separate good from
            bad basins here (a measured r2=0.49 run ended at ELBO -59 while
            an r2=0.96 run ended at -142: the bad basin buys a smaller KL).
            ``"elbo"`` selects by same-key ELBO anyway (for landscapes where
            fit evaluation is too costly).

        The whole schedule runs under ``precision_scope(bwd="high")``: the
        recurrent coupled landscape is stiff enough that the global 1-pass
        cotangent default collapses training (measured on v5e: train r2
        0.985 -> -0.05; restored at 3-pass) — see dgp_tpu/config.py.
        """
        from ..config import precision_scope
        from .dgp import _qs_accessors

        auto = restarts == "auto"
        if auto:
            n_restarts = int(max_restarts)
        else:
            n_restarts = int(restarts)
        with precision_scope(bwd="high"):
            if n_restarts <= 1 and not auto:
                return self._nat_adam_guarded(
                    lr_adam, lr_gamma, iterations1, iterations2, iterations3,
                    messages, q_sqrt_scale, train_upto_objective,
                    checkpoint_path, checkpoint_every, _qs_accessors)
            params0, key0 = self.params, self._key
            eval_key = jax.random.fold_in(key0, 0x5e1ec7)
            best = None
            for r in range(n_restarts):
                # restart 0 is the exact published init; later restarts
                # jitter the kernel-lengthscale init too — varying only the
                # MC stream leaves every candidate in the same init basin
                # (measured: a bad-DoE seed stuck at obj0 r2 0.65-0.72
                # across 4 streams at the full schedule)
                self.params = (params0 if r == 0 else _jitter_lengthscales(
                    params0, jax.random.fold_in(key0, 0xD1CE + r)))
                # restart 0 keeps key0 UNCHANGED so its MC stream — not just
                # its parameters — is the exact restarts=1 trajectory:
                # best-of-k strictly contains the single run as a candidate
                self._key = key0 if r == 0 else jax.random.fold_in(key0, r)
                # per-restart checkpoint path: sharing one path would leave
                # the LAST restart's mid-schedule state on disk, not the
                # selected candidate (the final save below fixes the latter)
                ckpt_r = (None if checkpoint_path is None
                          else f"{checkpoint_path}.r{r}")
                losses = self._nat_adam_guarded(
                    lr_adam, lr_gamma, iterations1, iterations2, iterations3,
                    messages, q_sqrt_scale, train_upto_objective,
                    ckpt_r, checkpoint_every, _qs_accessors)
                # "auto" escalation needs an r2-scale score for its
                # threshold, so it always scores by fit
                score = self._restart_score(
                    "fit" if auto else restart_select, eval_key)
                if messages:
                    print(f"restart {r}: score={score:.4f}")
                # a NaN score must never win (NaN comparisons are False both
                # ways, so a diverged restart 0 would otherwise be kept
                # forever); a finite score always beats a non-finite best
                better = best is None or (
                    math.isfinite(score)
                    and (not math.isfinite(best[0]) or score > best[0]))
                if better:
                    best = (score, self.params, self._key, losses)
                if (auto and math.isfinite(score)
                        and score >= restart_threshold):
                    break
            _, self.params, self._key, losses = best
            if checkpoint_path is not None:
                training.make_checkpoint_fn(checkpoint_path)(self.params, -1)
            return losses

    def _restart_score(self, criterion, eval_key):
        """Scalar candidate score under a shared key (higher is better)."""
        if criterion == "elbo":
            return float(_elbo_jit(self.params, tuple(self._X),
                                   tuple(self._Y), eval_key,
                                   self.num_samples, self.loop, -1))
        if criterion != "fit":
            raise ValueError(f"unknown restart_select {criterion!r}")
        r2s = []
        for obj in range(len(self._Y)):
            Fmean, Fvar = _predict_f_jit(self.params, self._X[obj], eval_key,
                                         50, obj, self.loop, False)
            mean, _ = moment_matched(Fmean, Fvar)
            y = self._Y[obj]
            ss_res = jnp.sum((mean.reshape(y.shape) - y) ** 2)
            ss_tot = jnp.sum((y - y.mean()) ** 2)
            r2s.append(float(1.0 - ss_res / ss_tot))
        return min(r2s)

    def _nat_adam_guarded(self, lr_adam, lr_gamma, iterations1, iterations2,
                          iterations3, messages, q_sqrt_scale,
                          train_upto_objective, checkpoint_path,
                          checkpoint_every, _qs_accessors):
        self._init_variational(q_sqrt_scale)
        traces = []
        loss_fn, batch = self._loss_spec(train_upto_objective)
        _ckpt = (training.make_checkpoint_fn(checkpoint_path)
                 if checkpoint_path else None)
        q = {"q_mu", "q_sqrt"}
        m1 = training.make_mask(self.params,
                                frozen_fields={"likelihood", "z", "z_left"},
                                frozen_layer_fields={"all": q})
        m2 = training.make_mask(self.params, frozen_fields={"likelihood"},
                                frozen_layer_fields={"all": q})
        m3 = training.make_mask(self.params, frozen_layer_fields={"all": q})
        self.params, _ls = training.adam_run(
            loss_fn, self.params, m1, self._next_key(), steps=iterations1,
            lr=lr_adam, messages=messages, data=batch,
            checkpoint_every=checkpoint_every, checkpoint_fn=_ckpt,
        )
        traces.append(_ls)
        self.params, _ls = training.adam_run(
            loss_fn, self.params, m2, self._next_key(), steps=iterations2,
            lr=lr_adam, messages=messages, data=batch,
            checkpoint_every=checkpoint_every, checkpoint_fn=_ckpt,
        )
        traces.append(_ls)
        get_q, set_q = _qs_accessors(tuple(range(len(self.params.layers))))
        # guard_loss: the 1e-6 white anchor makes this landscape stiff enough
        # that a finite natural-gradient step can raise the loss ~1e8x
        # (measured 3e7 -> 4e15, never recovering); the same-key guard
        # rejects those (variational/natgrad.py)
        self.params, _ls = training.nat_adam_run(
            loss_fn, self.params, m3,
            get_qs=get_q, set_qs=set_q,
            key=self._next_key(), steps=iterations3, lr_adam=lr_adam,
            gamma=lr_gamma, messages=messages, data=batch,
            checkpoint_every=checkpoint_every, checkpoint_fn=_ckpt,
            guard_loss=True,
        )
        traces.append(_ls)
        return jnp.concatenate([jnp.ravel(t) for t in traces]) if traces else jnp.zeros((0,))

    def optimize_adam(self, lr=0.01, iterations1=2000, iterations2=5000,
                      iterations3=7500, messages=500, q_sqrt_scale=1e-5,
                      train_upto_objective=-1,
                      checkpoint_path=None, checkpoint_every=0):
        """3-phase plain-Adam variant (MO_DGP.py:345-417). Runs at 3-pass
        cotangents like optimize_nat_adam (see there)."""
        from ..config import precision_scope

        with precision_scope(bwd="high"):
            return self._adam_staged(
                lr, iterations1, iterations2, iterations3, messages,
                q_sqrt_scale, train_upto_objective, checkpoint_path,
                checkpoint_every)

    def _adam_staged(self, lr, iterations1, iterations2, iterations3,
                     messages, q_sqrt_scale, train_upto_objective,
                     checkpoint_path, checkpoint_every):
        self._init_variational(q_sqrt_scale)
        traces = []
        loss_fn, batch = self._loss_spec(train_upto_objective)
        _ckpt = (training.make_checkpoint_fn(checkpoint_path)
                 if checkpoint_path else None)
        q = {"q_mu", "q_sqrt"}
        m1 = training.make_mask(self.params,
                                frozen_fields={"likelihood", "z", "z_left"},
                                frozen_layer_fields={"all": q})
        m2 = training.make_mask(self.params, frozen_fields={"likelihood"},
                                frozen_layer_fields={"all": q})
        m3 = training.make_mask(self.params)
        for steps, mask in ((iterations1, m1), (iterations2, m2),
                            (iterations3, m3)):
            self.params, _ls = training.adam_run(
                loss_fn, self.params, mask, self._next_key(), steps=steps,
                lr=lr, messages=messages, data=batch,
                checkpoint_every=checkpoint_every, checkpoint_fn=_ckpt,
            )
            traces.append(_ls)
        return jnp.concatenate([jnp.ravel(t) for t in traces]) if traces else jnp.zeros((0,))

    @staticmethod
    def _make_inducing_points(X: List, Y: List) -> List:
        Z = [np.concatenate((np.asarray(X[0]).copy(), np.asarray(Y[1]).copy()),
                            axis=1)]
        for x in X[1:]:
            Z.append(np.asarray(x).copy())
        return Z
