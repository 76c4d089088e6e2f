"""Exact GP regression (the num_layers=0 surrogate of SO_BO.make_model,
/root/reference/dgp_dace/BO/SO_BO.py:187-200, backed there by gpflow.models.GPR).

Pure-pytree params + jitted Adam training on the negative log marginal
likelihood (the reference trains via ``training_loss_closure`` + Adam,
SO_BO.py:252-256).
"""

from __future__ import annotations

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


class GPRParams(struct.PyTreeNode):
    kernel: kernels_lib.Kernel
    likelihood: Gaussian


def neg_log_marginal_likelihood(params: GPRParams, X, Y):
    n = X.shape[0]
    K = params.kernel.K(X) + (params.likelihood.variance + default_jitter()) * jnp.eye(
        n, dtype=X.dtype
    )
    L = jnp.linalg.cholesky(K)
    alpha = tri_solve(L, Y, lower=True)
    d = Y.shape[1]
    half_log_2pi = 0.9189385332046727
    return (
        0.5 * jnp.sum(alpha**2)
        + 0.5 * d * log_det_from_chol(L)
        + half_log_2pi * n * d
    )


def predict_f(params: GPRParams, data, Xnew):
    """Exact GP posterior at Xnew: mean [m, D], var [m, D] (pure)."""
    X, Y = data
    n = X.shape[0]
    K = params.kernel.K(X) + (params.likelihood.variance + default_jitter()) * jnp.eye(
        n, dtype=X.dtype
    )
    L = jnp.linalg.cholesky(K)
    Ks = params.kernel.K(X, Xnew)
    A = tri_solve(L, Ks, lower=True)
    beta = tri_solve(L, Y, lower=True)
    mean = A.T @ beta
    kss = params.kernel.K_diag(Xnew)
    var = kss - jnp.sum(A**2, axis=0)
    return mean, jnp.tile(var[:, None], (1, Y.shape[1]))


def predict_y(params: GPRParams, data, Xnew):
    mean, var = predict_f(params, data, Xnew)
    return params.likelihood.predict_mean_and_var(mean, var)


class GPR:
    """Stateful wrapper mirroring the gpflow GPR surface SO_BO relies on:
    ``name``, ``data``, ``predict_y``, ``predict_f``, Adam training."""

    name = "gpr"

    def __init__(self, data, kernel, noise_variance=1e-5):
        dtype = default_float()
        X, Y = data
        self.data = (
            jnp.asarray(np.asarray(X), dtype=dtype),
            jnp.asarray(np.asarray(Y), dtype=dtype),
        )
        self.params = GPRParams(
            kernel=kernel, likelihood=Gaussian.create(noise_variance, dtype=dtype)
        )

    def training_loss(self):
        X, Y = self.data
        return neg_log_marginal_likelihood(self.params, X, Y)

    def optimize_adam(self, iterations=3000, lr=0.001, beta_1=0.9, beta_2=0.999,
                      epsilon=1e-7):
        X, Y = self.data
        opt = optax.adam(lr, b1=beta_1, b2=beta_2, eps=epsilon)

        @jax.jit
        def run(params):
            opt_state = opt.init(params)

            def step(carry, _):
                params, opt_state = carry
                loss, grads = jax.value_and_grad(neg_log_marginal_likelihood)(
                    params, X, Y
                )
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, _), losses = jax.lax.scan(
                step, (params, opt_state), None, length=iterations
            )
            return params, losses

        self.params, losses = run(self.params)
        return losses

    def predict_f(self, Xnew):
        Xnew = jnp.asarray(Xnew, dtype=default_float())
        return predict_f(self.params, self.data, Xnew)

    def predict_y(self, Xnew):
        Xnew = jnp.asarray(Xnew, dtype=default_float())
        return predict_y(self.params, self.data, Xnew)
