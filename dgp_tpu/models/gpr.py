"""Exact GP regression (the num_layers=0 surrogate of SO_BO.make_model,
/root/reference/dgp_dace/BO/SO_BO.py:187-200, backed there by gpflow.models.GPR).

Pure-pytree params + jitted Adam training on the negative log marginal
likelihood (the reference trains via ``training_loss_closure`` + Adam,
SO_BO.py:252-256).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..config import default_float, default_jitter
from ..ops import kernels as kernels_lib
from ..ops.likelihoods import Gaussian
from ..ops.linalg import log_det_from_chol, tri_solve
from .training import pad_to_bucket


class GPRParams(struct.PyTreeNode):
    kernel: kernels_lib.Kernel
    likelihood: Gaussian


def _masked_gram(params: GPRParams, X, row_weights):
    """Noise-augmented Gram matrix; with 0/1 ``row_weights`` the weight-0
    (padding) rows are *exactly* decoupled: their cross-covariances are zeroed
    and their diagonal set to 1, making K block-diagonal. The padded block
    then adds only a parameter-independent constant to the log marginal
    likelihood and nothing to the posterior — bucketed shapes (stable XLA
    programs while BO grows N) at zero numerical cost."""
    n = X.shape[0]
    noise = params.likelihood.variance + default_jitter()
    K = params.kernel.K(X)
    if row_weights is None:
        return K + noise * jnp.eye(n, dtype=X.dtype)
    w = row_weights
    return jnp.outer(w, w) * K + jnp.diag(w * noise + (1.0 - w))


def neg_log_marginal_likelihood(params: GPRParams, X, Y, row_weights=None):
    n = X.shape[0]
    L = jnp.linalg.cholesky(_masked_gram(params, X, row_weights))
    alpha = tri_solve(L, Y, lower=True)
    d = Y.shape[1]
    half_log_2pi = 0.9189385332046727
    return (
        0.5 * jnp.sum(alpha**2)
        + 0.5 * d * log_det_from_chol(L)
        + half_log_2pi * n * d
    )


def predict_f(params: GPRParams, data, Xnew):
    """Exact GP posterior at Xnew: mean [m, D], var [m, D] (pure).

    ``data`` is (X, Y) or the padded (X, Y, row_weights) triple."""
    X, Y = data[0], data[1]
    w = data[2] if len(data) > 2 else None
    L = jnp.linalg.cholesky(_masked_gram(params, X, w))
    Ks = params.kernel.K(X, Xnew)
    if w is not None:
        Ks = w[:, None] * Ks
    A = tri_solve(L, Ks, lower=True)
    beta = tri_solve(L, Y, lower=True)
    mean = A.T @ beta
    kss = params.kernel.K_diag(Xnew)
    var = kss - jnp.sum(A**2, axis=0)
    return mean, jnp.tile(var[:, None], (1, Y.shape[1]))


def predict_y(params: GPRParams, data, Xnew):
    mean, var = predict_f(params, data, Xnew)
    return params.likelihood.predict_mean_and_var(mean, var)


@functools.lru_cache(maxsize=None)
def _adam_engine(iterations, lr, b1, b2, eps):
    """Cached jitted Adam scan on the (possibly padded) nmll; batch is a
    traced (X, Y, w) pytree so re-training after new data of the same bucket
    shape reuses the compiled program (see training._ENGINE_CACHE)."""
    opt = optax.adam(lr, b1=b1, b2=b2, eps=eps)

    @jax.jit
    def run(params, batch):
        X, Y, w = batch
        opt_state = opt.init(params)

        def step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(neg_log_marginal_likelihood)(
                params, X, Y, w
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, _), losses = jax.lax.scan(
            step, (params, opt_state), None, length=iterations
        )
        return params, losses

    return run


class GPR:
    """Stateful wrapper mirroring the gpflow GPR surface SO_BO relies on:
    ``name``, ``data``, ``predict_y``, ``predict_f``, Adam training.

    :param n_bucket: pad the training rows to multiples of this (exactly
        decoupled padding, ``_masked_gram``) so a growing BO dataset keeps a
        stable compiled shape."""

    name = "gpr"

    def __init__(self, data, kernel, noise_variance=1e-5, n_bucket=None):
        dtype = default_float()
        X, Y = data
        self.n_bucket = n_bucket
        self.data = (
            jnp.asarray(np.asarray(X), dtype=dtype),
            jnp.asarray(np.asarray(Y), dtype=dtype),
        )
        self.params = GPRParams(
            kernel=kernel, likelihood=Gaussian.create(noise_variance, dtype=dtype)
        )

    @property
    def train_data(self):
        """(X, Y, row_weights) with rows padded to the bucket (w=None when
        unbucketed). Predictions through this triple equal predictions
        through ``data`` exactly."""
        X, Y = self.data
        if self.n_bucket:
            return pad_to_bucket(X, Y, self.n_bucket)
        return (X, Y, None)

    def training_loss(self):
        X, Y, w = self.train_data
        return neg_log_marginal_likelihood(self.params, X, Y, w)

    def optimize_adam(self, iterations=3000, lr=0.001, beta_1=0.9, beta_2=0.999,
                      epsilon=1e-7):
        run = _adam_engine(iterations, lr, beta_1, beta_2, epsilon)
        self.params, losses = run(self.params, self.train_data)
        return losses

    def predict_f(self, Xnew):
        Xnew = jnp.asarray(Xnew, dtype=default_float())
        return predict_f(self.params, self.train_data, Xnew)

    def predict_y(self, Xnew):
        Xnew = jnp.asarray(Xnew, dtype=default_float())
        return predict_y(self.params, self.train_data, Xnew)

    def predict_y_sharded(self, Xnew, mesh, chunk_size=None):
        """Data-parallel exact-GP batch inference (serving path, beyond
        reference): prediction rows shard over the mesh's data axis, the
        training factorization replicates, results equal the single-device
        ``predict_y`` to reduction-order rounding (deterministic — no MC)."""
        import jax as _jax

        from ..parallel import serving

        Xnew = jnp.asarray(Xnew, dtype=default_float())
        return serving.run_sharded(
            serving.sharded_gpr_predict_y(mesh),
            (self.params, self.train_data), Xnew, _jax.random.PRNGKey(0),
            mesh, chunk_size, row_axis=0)
