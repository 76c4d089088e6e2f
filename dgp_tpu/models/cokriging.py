"""Exact AR(1) co-kriging (Kennedy & O'Hagan 2000) over L fidelities.

Beyond reference: the reference's only multi-fidelity surrogate is the
MF-DGP (/root/reference/dgp_dace/models/MF_DGP.py). At BO-loop data sizes
(a handful of points per fidelity) the MF-DGP's variational fit is measured
to be badly mis-calibrated — on the Forrester pair it collapses to a
near-linear posterior mean with ~0.05 posterior std while being wrong by
5-16, and neither longer schedules nor jittered restarts escape (the
marginal likelihood genuinely prefers the degenerate basin at 4 high-
fidelity points). This module is the right-sized exact surrogate for that
regime — the same lesson the MO-BO bake-off measured for MO surrogates
(benchmarks/mo_bo_bakeoff.json): with 10-20 points, exact GPs win.

Model (recursive autoregressive):

    f_0(x) = delta_0(x)
    f_t(x) = rho_{t-1} * f_{t-1}(x) + delta_t(x),   t = 1..L-1

with independent GP priors delta_t ~ GP(0, k_t). Every f_t is then a GP and
the joint covariance is closed-form:

    cov(f_t(x), f_s(x')) = sum_{k<=min(t,s)} a_{t,k} a_{s,k} k_k(x, x'),
    a_{t,k} = prod_{j=k}^{t-1} rho_j   (a_{t,t} = 1).

Training is exact log-marginal-likelihood maximization over one joint Gram
across all fidelity blocks — jitted multi-start Adam (the tiny-n landscape
is multimodal; start 0 is a canonical init, later starts jitter the log
hyperparameters and rho). Per-fidelity archives are bucket-padded with the
exactly-decoupled masked-Gram idiom of :mod:`models.gpr` so growing BO
archives keep stable compiled shapes.

All matrices here are tiny (tens of rows); the value of this module is
statistical honesty, not FLOPs — it runs as a single fused XLA program
either way.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import default_float, default_jitter
from ..ops import kernels as kernels_lib
from ..ops.likelihoods import Gaussian
from ..ops.linalg import log_det_from_chol, tri_solve
from .training import bucket_rows, multistart_adam_engine


class AR1Params(struct.PyTreeNode):
    """kernels[t] is delta_t's kernel; rho [L-1] is unconstrained (negative
    cross-fidelity correlation is legitimate); likelihoods[t] is the
    per-level Gaussian observation noise."""

    kernels: tuple
    rho: jnp.ndarray
    likelihoods: tuple


def _coeffs(rho, n_fid, dtype):
    """a[t][k] = prod_{j=k}^{t-1} rho_j for k <= t (a[t][t] = 1), else 0.
    n_fid is static so this unrolls at trace time."""
    one = jnp.asarray(1.0, dtype=dtype)
    a = [[None] * n_fid for _ in range(n_fid)]
    for t in range(n_fid):
        a[t][t] = one
        for k in range(t - 1, -1, -1):
            a[t][k] = a[t][k + 1] * rho[k]
    return a


def _block(params: AR1Params, a, t, s, Xt, Xs):
    """cov(f_t(Xt), f_s(Xs)) [nt, ns]."""
    out = 0.0
    for k in range(min(t, s) + 1):
        out = out + (a[t][k] * a[s][k]) * params.kernels[k].K(Xt, Xs)
    return out


def _joint_gram(params: AR1Params, Xs, ws):
    """Noise-augmented joint Gram over all fidelity blocks with the
    exactly-decoupled masked padding of gpr._masked_gram: weight-0 rows get
    zero cross-covariance and a unit diagonal, so they contribute only a
    parameter-independent constant to the log marginal likelihood and
    nothing to the posterior."""
    n_fid = len(Xs)
    dtype = Xs[0].dtype
    a = _coeffs(params.rho, n_fid, dtype)
    rows = []
    for t in range(n_fid):
        rows.append(jnp.concatenate(
            [_block(params, a, t, s, Xs[t], Xs[s]) for s in range(n_fid)],
            axis=1))
    K = jnp.concatenate(rows, axis=0)
    w = jnp.concatenate(ws)
    noise = jnp.concatenate([
        jnp.full((Xs[t].shape[0],),
                 params.likelihoods[t].variance + default_jitter(),
                 dtype=dtype)
        for t in range(n_fid)])
    return jnp.outer(w, w) * K + jnp.diag(w * noise + (1.0 - w))


def neg_log_marginal_likelihood(params: AR1Params, Xs, Ys, ws):
    """Joint NLL over all fidelity blocks (padded rows add a constant)."""
    y = jnp.concatenate(Ys, axis=0)
    L = jnp.linalg.cholesky(_joint_gram(params, Xs, ws))
    alpha = tri_solve(L, y, lower=True)
    half_log_2pi = 0.9189385332046727
    return (0.5 * jnp.sum(alpha**2) + 0.5 * log_det_from_chol(L)
            + half_log_2pi * y.shape[0])


def predict_f(params: AR1Params, data, Xnew, fidelity=-1):
    """Exact latent posterior of f_{fidelity} at Xnew: (mean [m,1],
    var [m,1]). ``data`` = (Xs, Ys, ws) per-fidelity tuples (ws entries may
    be all-ones when unpadded)."""
    Xs, Ys, ws = data
    n_fid = len(Xs)
    t = fidelity % n_fid
    dtype = Xs[0].dtype
    a = _coeffs(params.rho, n_fid, dtype)
    y = jnp.concatenate(Ys, axis=0)
    w = jnp.concatenate(ws)
    L = jnp.linalg.cholesky(_joint_gram(params, Xs, ws))
    Ks = jnp.concatenate(
        [_block(params, a, t, s, Xnew, Xs[s]) for s in range(n_fid)],
        axis=1) * w[None, :]
    kss = 0.0
    for k in range(t + 1):
        kss = kss + a[t][k] ** 2 * params.kernels[k].K_diag(Xnew)
    A = tri_solve(L, Ks.T, lower=True)
    beta = tri_solve(L, y, lower=True)
    mean = A.T @ beta
    var = jnp.maximum(kss - jnp.sum(A**2, axis=0), 0.0)
    return mean, var[:, None]


def predict_y(params: AR1Params, data, Xnew, fidelity=-1):
    mean, var = predict_f(params, data, Xnew, fidelity)
    n_fid = len(data[0])
    return params.likelihoods[fidelity % n_fid].predict_mean_and_var(
        mean, var)


def _pad_level(X, Y, bucket):
    n = X.shape[0]
    n_pad = bucket_rows(n, bucket) if bucket else n
    w = jnp.zeros((n_pad,), X.dtype).at[:n].set(1.0)
    if n_pad == n:
        return X, Y, w
    pad = n_pad - n
    Xp = jnp.concatenate([X, jnp.tile(X[:1], (pad, 1))], axis=0)
    Yp = jnp.concatenate([Y, jnp.zeros((pad, Y.shape[1]), Y.dtype)], axis=0)
    return Xp, Yp, w


class AR1CoKriging:
    """Stateful wrapper with the surrogate surface MF_BO and the acquisition
    engines rely on: ``name``, ``params``, ``train_data``,
    ``predict_f(Xnew, S=, fidelity=)``.

    :param data: (Xs, Ys) per-fidelity lists, low -> high (the MF-DGP
        convention, models/mf_dgp.py).
    :param n_bucket: pad each fidelity block to row multiples of this
        (exactly-decoupled padding) so growing archives keep one compiled
        NLL/posterior program per bucket shape.
    :param kernel: 'rbf' | 'matern32' | 'matern52' for every delta level.

    ``predict_f`` returns moments with a leading singleton sample axis
    ([1, m, 1]) so callers written against the MC surrogates'
    (S-samples, moment_matched) contract work unchanged — the moments are
    exact, the "S samples" are one deterministic entry.
    """

    name = "ar1"

    _KERNELS = {"rbf": kernels_lib.RBF, "matern32": kernels_lib.Matern32,
                "matern52": kernels_lib.Matern52}

    def __init__(self, data, n_bucket: Optional[int] = None,
                 kernel: str = "rbf", noise_variance: float = 1e-4):
        dtype = default_float()
        Xs, Ys = data
        if len(Xs) < 2 or len(Xs) != len(Ys):
            raise ValueError("need >= 2 fidelities, one Y block per X block")
        self.n_fid = len(Xs)
        self.n_bucket = n_bucket
        self.data = (
            tuple(jnp.asarray(np.asarray(x), dtype=dtype) for x in Xs),
            tuple(jnp.asarray(np.asarray(y), dtype=dtype).reshape(-1, 1)
                  for y in Ys),
        )
        d = int(self.data[0][0].shape[1])
        kcls = self._KERNELS[kernel]
        self.params = AR1Params(
            kernels=tuple(kcls.create(variance=1.0, lengthscales=[0.5] * d,
                                      dtype=dtype)
                          for _ in range(self.n_fid)),
            rho=jnp.ones((self.n_fid - 1,), dtype=dtype),
            likelihoods=tuple(Gaussian.create(noise_variance, dtype=dtype)
                              for _ in range(self.n_fid)),
        )

    @property
    def train_data(self):
        """(Xs, Ys, ws) per-fidelity tuples, rows padded to the bucket."""
        Xs, Ys = self.data
        padded = [_pad_level(x, y, self.n_bucket)
                  for x, y in zip(Xs, Ys)]
        return (tuple(p[0] for p in padded), tuple(p[1] for p in padded),
                tuple(p[2] for p in padded))

    def training_loss(self):
        Xs, Ys, ws = self.train_data
        return neg_log_marginal_likelihood(self.params, Xs, Ys, ws)

    def _starts(self, n_starts, key):
        """Stacked init pytree: start 0 = the canonical init; later starts
        jitter log-lengthscales/log-variances (sigma 0.7) and draw rho from
        {1, 2, 0.5, -1} + noise — the tiny-n joint NLL is multimodal and
        the informative (|rho| large) basins are exactly the ones a single
        canonical start is measured to miss (see module docstring)."""
        base = self.params
        outs = [base]
        rhos = jnp.asarray([1.0, 2.0, 0.5, -1.0], dtype=self.params.rho.dtype)
        for r in range(1, n_starts):
            k = jax.random.fold_in(key, r)
            k1, k2, k3 = jax.random.split(k, 3)
            leaves, treedef = jax.tree.flatten(base)
            jittered = []
            for i, leaf in enumerate(leaves):
                ki = jax.random.fold_in(k1, i)
                jittered.append(
                    leaf + 0.7 * jax.random.normal(ki, leaf.shape,
                                                   leaf.dtype))
            cand = jax.tree.unflatten(treedef, jittered)
            rho = (rhos[jax.random.randint(k2, (self.n_fid - 1,), 0, 4)]
                   + 0.3 * jax.random.normal(k3, (self.n_fid - 1,),
                                             self.params.rho.dtype))
            outs.append(cand.replace(rho=rho))
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    def optimize(self, n_starts: int = 8, iterations: int = 1500,
                 lr: float = 0.05, seed: int = 0):
        """Multi-start Adam on the joint NLL; keeps the best finite
        candidate. Returns the winning start's loss trace."""
        run = multistart_adam_engine(neg_log_marginal_likelihood,
                                     int(iterations), float(lr))
        stacked = self._starts(int(n_starts), jax.random.PRNGKey(seed))
        self.params, best_nll, losses = run(stacked, self.train_data)
        self._nll = float(best_nll)
        return losses

    def predict_f(self, Xnew, S: int = 1, fidelity: Optional[int] = None):
        """Exact moments with a leading singleton sample axis (see class
        docstring); fidelity=None means the highest."""
        Xnew = jnp.asarray(np.asarray(Xnew), dtype=default_float())
        t = self.n_fid - 1 if fidelity is None else int(fidelity)
        mean, var = _predict_f_jit(self.params, self.train_data, Xnew, t)
        return mean[None], var[None]

    def predict_y(self, Xnew, num_samples: int = 1,
                  fidelity: Optional[int] = None):
        Xnew = jnp.asarray(np.asarray(Xnew), dtype=default_float())
        t = self.n_fid - 1 if fidelity is None else int(fidelity)
        mean, var = predict_y(self.params, self.train_data, Xnew, t)
        return mean[None], var[None]


@functools.partial(jax.jit, static_argnums=(3,))
def _predict_f_jit(params, data, Xnew, fidelity):
    return predict_f(params, data, Xnew, fidelity)
