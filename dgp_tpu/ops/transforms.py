"""Bijectors for constrained parameters.

The reference stores positive hyperparameters behind gpflow's default
``softplus`` bijector and lower-triangular variational scales behind a
``triangular()`` transform (/root/reference/dgp_dace/utils/layers.py:207).
dgp_tpu keeps the same conventions: positive parameters are stored
unconstrained and mapped through a numerically-stable softplus; triangular
matrices are stored dense and masked with ``tril`` at use-sites.
"""

from __future__ import annotations

import jax.numpy as jnp


def softplus(x):
    """log(1 + exp(x)), stable for large |x|."""
    return jnp.logaddexp(x, 0.0)


def inv_softplus(y):
    """Inverse of softplus: log(exp(y) - 1), stable for large y."""
    y = jnp.asarray(y)
    return y + jnp.log(-jnp.expm1(-y))


def positive(raw):
    """Unconstrained -> positive."""
    return softplus(raw)


def positive_inverse(value):
    """Positive -> unconstrained (for initialization)."""
    return inv_softplus(value)


def tril(mat):
    """Lower-triangular mask, applied wherever a q_sqrt-like factor is used."""
    return jnp.tril(mat)
