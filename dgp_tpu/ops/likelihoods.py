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
import numpy as np
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


class QuadratureLikelihood(struct.PyTreeNode):
    """Base for non-conjugate likelihoods: variational expectations and
    predictive densities via Gauss-Hermite quadrature.

    This is the rank-polymorphic replacement for the reference's
    ``BroadcastingLikelihood`` tile+flatten machinery
    (/root/reference/dgp_dace/utils/utils.py:75-86): every quadrature formula
    below broadcasts over arbitrary leading sample axes.
    """

    num_gh: int = struct.field(pytree_node=False, default=20)

    def log_prob(self, F, Y):  # pragma: no cover - abstract
        raise NotImplementedError

    def _gh(self, dtype):
        x, w = np.polynomial.hermite_e.hermegauss(self.num_gh)
        w = w / np.sqrt(2 * np.pi)
        return jnp.asarray(x, dtype=dtype), jnp.asarray(w, dtype=dtype)

    def variational_expectations(self, Fmu, Fvar, Y):
        x, w = self._gh(Fmu.dtype)
        f = Fmu[..., None] + jnp.sqrt(jnp.maximum(Fvar, 0.0))[..., None] * x
        lp = self.log_prob(f, Y[..., None])
        return jnp.sum(lp * w, axis=-1)

    def predict_density(self, Fmu, Fvar, Y):
        x, w = self._gh(Fmu.dtype)
        f = Fmu[..., None] + jnp.sqrt(jnp.maximum(Fvar, 0.0))[..., None] * x
        lp = self.log_prob(f, Y[..., None])
        m = jnp.max(lp, axis=-1, keepdims=True)
        return jnp.log(jnp.sum(jnp.exp(lp - m) * w, axis=-1)) + m[..., 0]

    def predict_mean_and_var(self, Fmu, Fvar):
        x, w = self._gh(Fmu.dtype)
        f = Fmu[..., None] + jnp.sqrt(jnp.maximum(Fvar, 0.0))[..., None] * x
        cm = self.conditional_mean(f)
        cv = self.conditional_variance(f)
        mean = jnp.sum(cm * w, axis=-1)
        e2 = jnp.sum((cv + cm**2) * w, axis=-1)
        return mean, e2 - mean**2


class Bernoulli(QuadratureLikelihood):
    """Probit Bernoulli for classification heads (Y in {0, 1})."""

    def _p(self, F):
        from jax.scipy.stats import norm as _norm

        return jnp.clip(_norm.cdf(F), 1e-9, 1 - 1e-9)

    def log_prob(self, F, Y):
        # Stable probit log-likelihood via log_ndtr. The clipped-cdf form
        # (Y log p + (1-Y) log1p(-p)) NaNs in float32: 1 - 1e-9 rounds to
        # exactly 1.0 (f32 eps ~1.2e-7), so log1p(-p) hits -inf wherever
        # cdf(F) rounds to 1 and 0 * -inf poisons the whole ELBO — this is
        # what broke the first on-chip classification evidence run.
        from jax.scipy.stats import norm as _norm

        return Y * _norm.logcdf(F) + (1 - Y) * _norm.logcdf(-F)

    def conditional_mean(self, F):
        return self._p(F)

    def conditional_variance(self, F):
        p = self._p(F)
        return p * (1 - p)


class StudentT(QuadratureLikelihood):
    """Student-t observation noise for heavy-tailed regression."""

    scale_raw: jnp.ndarray = None
    df: float = struct.field(pytree_node=False, default=3.0)

    @classmethod
    def create(cls, scale=1.0, df=3.0, num_gh=20, dtype=None):
        dtype = dtype or default_float()
        return cls(
            scale_raw=positive_inverse(jnp.asarray(scale, dtype=dtype)),
            df=df, num_gh=num_gh,
        )

    @property
    def scale(self):
        return positive(self.scale_raw)

    def log_prob(self, F, Y):
        import jax.scipy.special as jsp

        nu = self.df
        s = self.scale
        z = (Y - F) / s
        return (
            jsp.gammaln((nu + 1) / 2.0)
            - jsp.gammaln(nu / 2.0)
            - 0.5 * jnp.log(jnp.pi * nu)
            - jnp.log(s)
            - (nu + 1) / 2.0 * jnp.log1p(z**2 / nu)
        )

    def conditional_mean(self, F):
        return F

    def conditional_variance(self, F):
        nu = self.df
        return jnp.full_like(F, self.scale**2 * nu / (nu - 2.0))


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
