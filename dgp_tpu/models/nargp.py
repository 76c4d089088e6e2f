"""Nonlinear autoregressive multi-fidelity GP (NARGP, Perdikaris et al.
2017, "Nonlinear information fusion algorithms for data-efficient
multi-fidelity modelling").

Beyond reference: the reference's only MF surrogate is the variational
MF-DGP (/root/reference/dgp_dace/models/MF_DGP.py). dgp_tpu additionally
ships exact AR(1) co-kriging (models/cokriging.py) for the tiny-n BO
regime — but AR(1) is *linear* across fidelities:
``f_t = rho * f_{t-1} + delta_t``. NARGP is its nonlinear complement:

    f_0(x) = g_0(x),
    f_t(x) = g_t(x, f_{t-1}(x)),   g_t ~ GP(0, k_t),    t = 1..L-1,

with the paper's composite covariance over the augmented input (x, f):

    k_t((x, f), (x', f')) = k_rho(x, x') * k_f(f, f') + k_delta(x, x').

Because level t conditions on the *realization* of level t-1 at its own
training inputs (the nested-design assumption: each fidelity's inputs are
observed at the fidelity below, or close enough that the posterior mean
stands in), the joint factorizes and training is L independent exact GPR
marginal-likelihood problems — each trained here with the same jitted
multi-start Adam recipe as :mod:`models.cokriging`, on bucket-padded rows
(exactly-decoupled masked Gram, :mod:`models.gpr`) so growing BO archives
keep stable compiled shapes.

Prediction propagates uncertainty by Monte Carlo (paper §3(b)): sample
f_{t-1}(x*) from the previous level's posterior, evaluate level t's exact
posterior at each (x*, sample), and return the per-sample moments — the
same ``[S, m, 1]`` moments contract as the MC surrogates (``propagate``/
``moment_matched``), so every acquisition engine works unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import default_float
from ..ops import kernels as kernels_lib
from ..ops.likelihoods import Gaussian
from . import gpr as gpr_mod
from .gpr import GPRParams
from .training import multistart_adam_engine, pad_to_bucket

_KERNELS = {"rbf": kernels_lib.RBF, "matern32": kernels_lib.Matern32,
            "matern52": kernels_lib.Matern52}


def _level_params(level: int, d: int, kernel: str, noise_variance: float,
                  dtype) -> GPRParams:
    """Untrained params for one level: level 0 is a plain kernel on the d
    inputs; level t>=1 is the NARGP composite
    k_rho(x)*k_f(f) + k_delta(x) over the augmented [x, f] input."""
    kcls = _KERNELS[kernel]
    xdims = tuple(range(d))
    if level == 0:
        kern = kcls.create(variance=1.0, lengthscales=[0.5] * d, dtype=dtype)
    else:
        k_rho = kcls.create(variance=1.0, lengthscales=[0.5] * d,
                            active_dims=xdims, dtype=dtype)
        k_f = kcls.create(variance=1.0, lengthscales=[0.5],
                          active_dims=(d,), dtype=dtype)
        k_delta = kcls.create(variance=0.1, lengthscales=[0.5] * d,
                              active_dims=xdims, dtype=dtype)
        kern = kernels_lib.Sum(
            kernels=(kernels_lib.Product(kernels=(k_rho, k_f)), k_delta))
    return GPRParams(kernel=kern,
                     likelihood=Gaussian.create(noise_variance, dtype=dtype))


# -- pure prediction (acquisition engines trace this) ---------------------------


def _sample(key, mean, var):
    z = jax.random.normal(key, mean.shape, mean.dtype)
    return mean + jnp.sqrt(jnp.maximum(var, 0.0)) * z


def predict_f(levels, datas, Xnew, key, num_samples, fidelity=-1):
    """Latent posterior of f_{fidelity} at ``Xnew`` [m, d] with MC
    uncertainty propagation through the level chain: per-sample moments
    ([S, m, 1], [S, m, 1]); fidelity 0 is exact ([1, m, 1]).

    ``levels`` = per-level :class:`~models.gpr.GPRParams`, ``datas`` =
    per-level (X_aug, Y, w) triples (level 0's X_aug is just X)."""
    n_fid = len(levels)
    t_stop = fidelity % n_fid
    mean, var = gpr_mod.predict_f(levels[0], datas[0], Xnew)
    if t_stop == 0:
        return mean[None], var[None]
    f = _sample(key, mean[None].repeat(num_samples, 0), var[None])
    Xt = jnp.broadcast_to(Xnew, (num_samples,) + Xnew.shape)
    for t in range(1, t_stop + 1):
        Xaug = jnp.concatenate([Xt, f], axis=-1)  # [S, m, d+1]
        mean, var = jax.vmap(
            lambda xa: gpr_mod.predict_f(levels[t], datas[t], xa))(Xaug)
        if t < t_stop:
            key = jax.random.fold_in(key, t)
            f = _sample(key, mean, var)
    return mean, var


def predict_y(levels, datas, Xnew, key, num_samples, fidelity=-1):
    """Observation posterior (latent + level noise), same contract."""
    mean, var = predict_f(levels, datas, Xnew, key, num_samples, fidelity)
    n_fid = len(levels)
    return levels[fidelity % n_fid].likelihood.predict_mean_and_var(mean, var)


def _mean_chain(levels, datas, Xnew, upto):
    """Deterministic mean propagation m_{upto}(Xnew) [n, 1] — what level
    ``upto + 1`` trains its augmented input column on (the paper's nested
    design: the previous level's posterior mean at this level's inputs)."""
    m, _ = gpr_mod.predict_f(levels[0], datas[0], Xnew)
    for t in range(1, upto + 1):
        Xa = jnp.concatenate([Xnew, m], axis=1)
        m, _ = gpr_mod.predict_f(levels[t], datas[t], Xa)
    return m


# -- training -------------------------------------------------------------------


class NARGP:
    """Stateful wrapper with the surrogate surface MF_BO and the
    acquisition engines rely on: ``name``, ``params``/``train_data``
    pytrees, ``predict_f(Xnew, S=, fidelity=)``.

    :param data: (Xs, Ys) per-fidelity lists, low -> high (the MF-DGP
        convention, models/mf_dgp.py).
    :param n_bucket: pad each level's rows to multiples of this (exactly
        decoupled padding) for compile-stable growing archives.
    :param kernel: 'rbf' | 'matern32' | 'matern52' for k_rho/k_f/k_delta.
    :param num_samples: default MC sample count for uncertainty
        propagation in ``predict_f``.
    """

    name = "nargp"

    def __init__(self, data, n_bucket: Optional[int] = None,
                 kernel: str = "rbf", noise_variance: float = 1e-4,
                 num_samples: int = 100, seed: int = 0):
        dtype = default_float()
        Xs, Ys = data
        if len(Xs) < 2 or len(Xs) != len(Ys):
            raise ValueError("need >= 2 fidelities, one Y block per X block")
        self.n_fid = len(Xs)
        self.n_bucket = n_bucket
        self.num_samples = int(num_samples)
        self.data = (
            tuple(jnp.asarray(np.asarray(x), dtype=dtype) for x in Xs),
            tuple(jnp.asarray(np.asarray(y), dtype=dtype).reshape(-1, 1)
                  for y in Ys),
        )
        d = int(self.data[0][0].shape[1])
        self.params = tuple(
            _level_params(t, d, kernel, noise_variance, dtype)
            for t in range(self.n_fid))
        self._predict_key = jax.random.PRNGKey(seed)

    @property
    def params(self):
        return self._params

    @params.setter
    def params(self, value):
        # the augmented train_data is a function of params — invalidate
        self._params = value
        self._train_data = None

    @property
    def data(self):
        return self._data

    @data.setter
    def data(self, value):
        # the augmented train_data is a function of the data too: believer
        # conditioning (MF_BO batch/async infill) appends fantasy rows and
        # must see a recomputed mean chain
        self._data = value
        self._train_data = None

    def _padded(self, X, Y):
        if self.n_bucket:
            return pad_to_bucket(X, Y, self.n_bucket)
        return (X, Y, None)

    @property
    def train_data(self):
        """Per-level (X_aug, Y, w) triples under the CURRENT params: level
        t>=1's augmented column is the mean-chain of levels < t at its
        inputs. Padding rows reuse row 0's augmented value (weight-0 rows
        are exactly decoupled either way). Cached per params assignment —
        the mean chain is L-1 eager exact-GP predicts, and every
        predict_f/acquisition call reads this under frozen params."""
        if self._train_data is None:
            Xs, Ys = self.data
            datas = [self._padded(Xs[0], Ys[0])]
            for t in range(1, self.n_fid):
                m = _mean_chain(self.params[:t], tuple(datas), Xs[t], t - 1)
                Xaug = jnp.concatenate([Xs[t], m], axis=1)
                datas.append(self._padded(Xaug, Ys[t]))
            self._train_data = tuple(datas)
        return self._train_data

    def training_loss(self):
        """Sum of the per-level exact NLLs (they factorize)."""
        return sum(
            gpr_mod.neg_log_marginal_likelihood(p, X, Y, w)
            for p, (X, Y, w) in zip(self.params, self.train_data))

    def _starts(self, params: GPRParams, n_starts: int, key):
        """Stacked init pytree: start 0 canonical, later starts jitter the
        unconstrained leaves (sigma 0.7) — same recipe as
        cokriging._starts; the tiny-n per-level NLL is multimodal."""
        outs = [params]
        leaves, treedef = jax.tree.flatten(params)
        for r in range(1, n_starts):
            k = jax.random.fold_in(key, r)
            jittered = [
                leaf + 0.7 * jax.random.normal(jax.random.fold_in(k, i),
                                               leaf.shape, leaf.dtype)
                for i, leaf in enumerate(leaves)]
            outs.append(jax.tree.unflatten(treedef, jittered))
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    def optimize(self, n_starts: int = 8, iterations: int = 2000,
                 lr: float = 0.05, seed: int = 0):
        """Sequential level-by-level multi-start Adam (level t's augmented
        inputs use the freshly trained levels below it). Returns the
        winning per-level loss traces."""
        run = multistart_adam_engine(gpr_mod.neg_log_marginal_likelihood,
                                     int(iterations), float(lr))
        Xs, Ys = self.data
        key = jax.random.PRNGKey(seed)
        params = list(self.params)
        datas = [self._padded(Xs[0], Ys[0])]
        traces = []
        nlls = []
        for t in range(self.n_fid):
            if t > 0:
                m = _mean_chain(tuple(params[:t]), tuple(datas), Xs[t], t - 1)
                Xaug = jnp.concatenate([Xs[t], m], axis=1)
                datas.append(self._padded(Xaug, Ys[t]))
            stacked = self._starts(params[t], int(n_starts),
                                   jax.random.fold_in(key, t))
            params[t], nll, losses = run(stacked, datas[t])
            traces.append(losses)
            nlls.append(float(nll))
        self.params = tuple(params)
        # the loop conditioned each level on its freshly trained lowers, so
        # these datas ARE the post-training train_data — seed the cache
        self._train_data = tuple(datas)
        # joint NLL (levels factorize) — comparable with AR1CoKriging._nll
        self._nll = float(sum(nlls))
        return traces

    def predict_f(self, Xnew, S: Optional[int] = None,
                  fidelity: Optional[int] = None, key=None):
        """MC-propagated latent moments ([S, m, 1], [S, m, 1]); fidelity 0
        is exact ([1, m, 1]). ``key=None`` uses the model's fixed
        prediction key (deterministic repeated calls)."""
        Xnew = jnp.asarray(np.asarray(Xnew), dtype=default_float())
        t = self.n_fid - 1 if fidelity is None else int(fidelity)
        S = self.num_samples if S is None else int(S)
        key = self._predict_key if key is None else key
        return _predict_f_jit(self.params, self.train_data, Xnew, key, S, t)

    def predict_y(self, Xnew, num_samples: Optional[int] = None,
                  fidelity: Optional[int] = None, key=None):
        t = self.n_fid - 1 if fidelity is None else int(fidelity)
        mean, var = self.predict_f(Xnew, num_samples, fidelity, key)
        return self.params[t].likelihood.predict_mean_and_var(mean, var)


@functools.partial(jax.jit, static_argnums=(4, 5))
def _predict_f_jit(levels, datas, Xnew, key, num_samples, fidelity):
    return predict_f(levels, datas, Xnew, key, num_samples, fidelity)
