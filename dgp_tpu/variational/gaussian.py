"""Gaussian variational distributions q(u) = N(q_mu, q_sqrt q_sqrt^T).

KL divergences matching /root/reference/dgp_dace/utils/layers.py:280-308:
whitened prior N(0, I) or non-whitened prior N(0, Kuu), independently per
output GP, with q_sqrt a [D, M, M] batch of lower-triangular factors.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.linalg import cho_solve, tri_solve


def gauss_kl(q_mu, q_sqrt, Lu=None):
    """KL[ q(u) || p(u) ] summed over the D output GPs.

    :param q_mu: [M, D]
    :param q_sqrt: [D, M, M] (tril applied internally)
    :param Lu: [M, M] lower Cholesky of the prior covariance Kuu, or None for
        a whitened N(0, I) prior.
    """
    M, D = q_mu.shape
    L = jnp.tril(q_sqrt)
    diag = jnp.diagonal(L, axis1=-2, axis2=-1)  # [D, M]
    kl = -0.5 * D * M
    kl -= 0.5 * jnp.sum(jnp.log(diag**2))
    if Lu is None:  # whitened
        kl += 0.5 * jnp.sum(L**2)
        kl += 0.5 * jnp.sum(q_mu**2)
    else:
        kl += D * jnp.sum(jnp.log(jnp.diag(Lu)))
        # trace term: || Lu^{-1} q_sqrt ||_F^2 per output
        A = tri_solve(Lu[None].repeat(D, axis=0), L, lower=True)
        kl += 0.5 * jnp.sum(A**2)
        # Mahalanobis term: q_mu^T Kuu^{-1} q_mu
        Kinv_m = cho_solve(Lu, q_mu)
        kl += 0.5 * jnp.sum(q_mu * Kinv_m)
    return kl
