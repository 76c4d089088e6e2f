"""Stationary / linear / noise kernels and kernel algebra.

Functional JAX counterpart of the gpflow kernels the reference relies on
(used at /root/reference/dgp_dace/utils/layers.py:230-231,243 via
``covs.Kuu``/``covs.Kuf`` and built in /root/reference/dgp_dace/models/MF_DGP.py:266-290,
/root/reference/dgp_dace/BO/SO_BO.py:192-247). Kernels are flax pytree
dataclasses: hyperparameters (variance, lengthscales) are traced leaves stored
through a softplus bijector; ``active_dims`` is static metadata. The algebra
``k_corr * (k_prev + Linear) + k_in + White`` needed by the multi-fidelity
models composes through ``Sum``/``Product`` (also via ``+``/``*`` operators).

All pairwise computations are written matmul-first (scaled-square-distance via
an X @ X2.T contraction) so XLA lowers the hot path onto the TPU MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import default_float
from .transforms import positive, positive_inverse


def _as_param(value, dtype=None):
    dtype = dtype or default_float()
    return positive_inverse(jnp.asarray(value, dtype=dtype))


class Kernel(struct.PyTreeNode):
    """Base: active-dims slicing, algebra operators, public K / K_diag."""

    def _slice(self, X):
        active_dims = getattr(self, "active_dims", None)
        if active_dims is None:
            return X
        return X[..., jnp.array(active_dims)]

    # Public API ------------------------------------------------------------
    def K(self, X, X2=None):
        """Covariance matrix [n, m] (X2=None means X2=X, including noise terms)."""
        raise NotImplementedError

    def K_diag(self, X):
        """Diagonal of K(X, X), shape [n]."""
        raise NotImplementedError

    # Algebra ---------------------------------------------------------------
    def __add__(self, other):
        return Sum(kernels=(self, other))

    def __mul__(self, other):
        return Product(kernels=(self, other))


class _Stationary(Kernel):
    """Shared machinery for kernels of the scaled Euclidean distance."""

    def _scaled(self, X):
        ls = positive(self.lengthscales_raw)
        return self._slice(X) / ls

    def _sqdist(self, X, X2):
        Xs = self._scaled(X)
        if X2 is None:
            X2s = Xs
        else:
            X2s = self._scaled(X2)
        # ||x||^2 + ||z||^2 - 2 x.z — one big matmul for the cross term (MXU).
        # HIGHEST precision: the TPU default would compute the cross term in
        # bf16, whose ~1e-2 error destroys the Kff - Qff cancellation in f32.
        xx = jnp.sum(Xs * Xs, axis=-1)[:, None]
        zz = jnp.sum(X2s * X2s, axis=-1)[None, :]
        cross = jnp.matmul(Xs, X2s.T, precision=jax.lax.Precision.HIGHEST)
        return jnp.maximum(xx + zz - 2.0 * cross, 0.0)

    @property
    def variance(self):
        return positive(self.variance_raw)

    @property
    def lengthscales(self):
        return positive(self.lengthscales_raw)

    def K_diag(self, X):
        n = self._slice(X).shape[0]
        return jnp.full((n,), self.variance, dtype=X.dtype)


class RBF(_Stationary):
    """Squared-exponential (gpflow ``SquaredExponential``/``RBF``)."""

    variance_raw: jnp.ndarray
    lengthscales_raw: jnp.ndarray
    active_dims: Optional[Tuple[int, ...]] = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, variance=1.0, lengthscales=1.0, active_dims=None, dtype=None):
        return cls(
            variance_raw=_as_param(variance, dtype),
            lengthscales_raw=_as_param(lengthscales, dtype),
            active_dims=tuple(active_dims) if active_dims is not None else None,
        )

    def K(self, X, X2=None):
        return self.variance * jnp.exp(-0.5 * self._sqdist(X, X2))


def _safe_dist(sqdist):
    # sqrt with a finite gradient at 0 (distance gradients vanish there anyway
    # for the Matern forms below once multiplied by exp(-r)).
    tiny = jnp.asarray(1e-36, dtype=sqdist.dtype)
    return jnp.sqrt(sqdist + tiny)


class Matern32(_Stationary):
    variance_raw: jnp.ndarray
    lengthscales_raw: jnp.ndarray
    active_dims: Optional[Tuple[int, ...]] = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, variance=1.0, lengthscales=1.0, active_dims=None, dtype=None):
        return cls(
            variance_raw=_as_param(variance, dtype),
            lengthscales_raw=_as_param(lengthscales, dtype),
            active_dims=tuple(active_dims) if active_dims is not None else None,
        )

    def K(self, X, X2=None):
        r = _safe_dist(self._sqdist(X, X2))
        sqrt3 = jnp.sqrt(jnp.asarray(3.0, dtype=r.dtype))
        return self.variance * (1.0 + sqrt3 * r) * jnp.exp(-sqrt3 * r)


class Matern52(_Stationary):
    variance_raw: jnp.ndarray
    lengthscales_raw: jnp.ndarray
    active_dims: Optional[Tuple[int, ...]] = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, variance=1.0, lengthscales=1.0, active_dims=None, dtype=None):
        return cls(
            variance_raw=_as_param(variance, dtype),
            lengthscales_raw=_as_param(lengthscales, dtype),
            active_dims=tuple(active_dims) if active_dims is not None else None,
        )

    def K(self, X, X2=None):
        r2 = self._sqdist(X, X2)
        r = _safe_dist(r2)
        sqrt5 = jnp.sqrt(jnp.asarray(5.0, dtype=r.dtype))
        return (
            self.variance
            * (1.0 + sqrt5 * r + (5.0 / 3.0) * r2)
            * jnp.exp(-sqrt5 * r)
        )


class Linear(Kernel):
    """Dot-product kernel: K = variance * X X2^T (gpflow ``Linear``)."""

    variance_raw: jnp.ndarray
    active_dims: Optional[Tuple[int, ...]] = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, variance=1.0, active_dims=None, dtype=None):
        return cls(
            variance_raw=_as_param(variance, dtype),
            active_dims=tuple(active_dims) if active_dims is not None else None,
        )

    @property
    def variance(self):
        return positive(self.variance_raw)

    def K(self, X, X2=None):
        Xs = self._slice(X)
        X2s = Xs if X2 is None else self._slice(X2)
        return (Xs * self.variance) @ X2s.T

    def K_diag(self, X):
        Xs = self._slice(X)
        return jnp.sum(Xs * self.variance * Xs, axis=-1)


class White(Kernel):
    """IID-noise kernel: variance on the diagonal of K(X, X), zero cross-cov.

    Its variance doubles as the inner-fidelity likelihood noise of the
    multi-fidelity models (/root/reference/dgp_dace/models/MF_DGP.py:188).
    """

    variance_raw: jnp.ndarray
    active_dims: Optional[Tuple[int, ...]] = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, variance=1.0, active_dims=None, dtype=None):
        return cls(
            variance_raw=_as_param(variance, dtype),
            active_dims=tuple(active_dims) if active_dims is not None else None,
        )

    @property
    def variance(self):
        return positive(self.variance_raw)

    def K(self, X, X2=None):
        n = X.shape[0]
        if X2 is None:
            return self.variance * jnp.eye(n, dtype=X.dtype)
        return jnp.zeros((n, X2.shape[0]), dtype=X.dtype)

    def K_diag(self, X):
        return jnp.full((X.shape[0],), self.variance, dtype=X.dtype)


class Sum(Kernel):
    kernels: Tuple[Kernel, ...]

    def K(self, X, X2=None):
        out = self.kernels[0].K(X, X2)
        for k in self.kernels[1:]:
            out = out + k.K(X, X2)
        return out

    def K_diag(self, X):
        out = self.kernels[0].K_diag(X)
        for k in self.kernels[1:]:
            out = out + k.K_diag(X)
        return out


class Product(Kernel):
    kernels: Tuple[Kernel, ...]

    def K(self, X, X2=None):
        out = self.kernels[0].K(X, X2)
        for k in self.kernels[1:]:
            out = out * k.K(X, X2)
        return out

    def K_diag(self, X):
        out = self.kernels[0].K_diag(X)
        for k in self.kernels[1:]:
            out = out * k.K_diag(X)
        return out


_BY_NAME = {"rbf": RBF, "matern32": Matern32, "matern52": Matern52}


def by_name(name: str, num_dims: int, dtype=None) -> Kernel:
    """Spec-dict kernel factory, parity with SO_BO.make_model's kernel strings
    (/root/reference/dgp_dace/BO/SO_BO.py:192-247)."""
    try:
        cls = _BY_NAME[name]
    except KeyError:
        raise ValueError(
            f"Unknown kernel {name!r}: expected one of {sorted(_BY_NAME)}"
        ) from None
    return cls.create(variance=1.0, lengthscales=[1.0] * num_dims, dtype=dtype)
