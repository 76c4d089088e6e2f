"""Dense linear-algebra helpers for the GP hot core.

Counterpart of the TF ops the reference leans on at
/root/reference/dgp_dace/utils/layers.py:230-231,245-247,299-300
(jittered Kuu Cholesky, triangular solves, cholesky_solve).
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..config import default_jitter


def add_jitter(K, jitter=None):
    jitter = default_jitter() if jitter is None else jitter
    return K + jitter * jnp.eye(K.shape[-1], dtype=K.dtype)


def safe_cholesky(K, jitter=None):
    """Cholesky of K + jitter*I (batched over leading dims)."""
    return jnp.linalg.cholesky(add_jitter(K, jitter))


def tri_solve(L, B, lower=True):
    return jsl.solve_triangular(L, B, lower=lower)


def cho_solve(L, B):
    """Solve (L L^T) x = B given the lower Cholesky factor L."""
    return jsl.cho_solve((L, True), B)


def log_det_from_chol(L):
    """log det(A) where A = L L^T."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
