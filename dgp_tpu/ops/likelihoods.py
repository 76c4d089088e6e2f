"""Likelihoods.

The reference wraps gpflow likelihoods in ``BroadcastingLikelihood``
(/root/reference/dgp_dace/utils/utils.py:54-117) purely to make non-Gaussian
likelihoods broadcast over the Monte-Carlo sample axis S. In JAX all formulas
below are written rank-polymorphically ([..., N, D] against [N, D] data), so
the wrapper disappears: closed-form Gaussian expressions broadcast natively
and anything user-supplied can be vmapped over S by the caller.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..config import default_float
from .transforms import positive, positive_inverse

_HALF_LOG_2PI = 0.9189385332046727  # 0.5 * log(2 pi)


class Gaussian(struct.PyTreeNode):
    """Gaussian likelihood y = f + eps, eps ~ N(0, variance)."""

    variance_raw: jnp.ndarray

    @classmethod
    def create(cls, variance=1.0, dtype=None):
        dtype = dtype or default_float()
        return cls(variance_raw=positive_inverse(jnp.asarray(variance, dtype=dtype)))

    @property
    def variance(self):
        return positive(self.variance_raw)

    def variational_expectations(self, Fmu, Fvar, Y):
        """E_{q(f)=N(Fmu,Fvar)}[log N(Y | f, sigma^2)], closed form.

        Matches gpflow's Gaussian.variational_expectations used through
        /root/reference/dgp_dace/utils/utils.py:89-93.
        """
        var = self.variance
        return (
            -_HALF_LOG_2PI
            - 0.5 * jnp.log(var)
            - 0.5 * ((Y - Fmu) ** 2 + Fvar) / var
        )

    def log_prob(self, F, Y):
        var = self.variance
        return -_HALF_LOG_2PI - 0.5 * jnp.log(var) - 0.5 * (Y - F) ** 2 / var

    def predict_mean_and_var(self, Fmu, Fvar):
        return Fmu, Fvar + self.variance

    def predict_density(self, Fmu, Fvar, Y):
        tot = Fvar + self.variance
        return -_HALF_LOG_2PI - 0.5 * jnp.log(tot) - 0.5 * (Y - Fmu) ** 2 / tot


def gaussian_logdensity(Y, mu, var):
    """log N(Y | mu, var) with explicit variance (the inner-fidelity likelihood
    of /root/reference/dgp_dace/models/MF_DGP.py:151-162)."""
    return -_HALF_LOG_2PI - 0.5 * jnp.log(var) - 0.5 * (Y - mu) ** 2 / var


def fidelity_variational_expectations(Fmu, Fvar, Y, variance):
    """E_q[log N(Y | f, variance)] with an externally-supplied noise variance
    (the White-kernel variance of inner multi-fidelity layers,
    /root/reference/dgp_dace/models/MF_DGP.py:151-196)."""
    return (
        -_HALF_LOG_2PI
        - 0.5 * jnp.log(variance)
        - 0.5 * ((Y - Fmu) ** 2 + Fvar) / variance
    )
