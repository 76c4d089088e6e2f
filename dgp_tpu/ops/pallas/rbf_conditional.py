"""Fused RBF SVGP-conditional Pallas kernel.

The hottest op in every model is the per-layer conditional over the folded
[S*N] point axis (/root/reference/dgp_dace/utils/layers.py:237-278): build
Kuf, solve against chol(Kuu), assemble mean and diagonal variance. Rewritten
TPU-first, the per-point work reduces to pure MXU matmuls against per-step
precomputed M x M matrices:

    K      = sigma_f^2 * exp(-0.5 * dist2(x, Z))          (distance matmul)
    mean_d = K @ alpha_d          alpha = B^{-T} q_mu      (B = Lu or Kuu)
    var_d  = Kff + rowsum(K * (K @ E_d)),  E_d = B^{-T} (S_d - C) B^{-1}
             (C = I whitened / Kuu non-whitened)

One grid step streams a row-tile of X through VMEM, computes the distance
cross-term, the exponential, the mean matmul and D variance quadforms without
touching HBM in between. M, D and the feature dim are zero-padded to lane
boundaries; padding rows/cols carry zero alpha/E so they contribute nothing.

The backward pass reuses the jnp reference implementation via custom_vjp
(XLA fuses it well; a handwritten bwd kernel is a further optimization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pragma: no cover - exercised on TPU
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

LANE = 128
TILE_N = 256

# Flip to True (tests do) to run the kernel through the Pallas interpreter on
# CPU; compiled Mosaic otherwise.
INTERPRET = False


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def rbf_conditional_diag_ref(Xs, Zs, alpha, E, sigma2f):
    """jnp reference of the fused conditional (also the VJP path).

    :param Xs: [n, d] inputs scaled by lengthscales
    :param Zs: [M, d] inducing inputs scaled by lengthscales
    :param alpha: [M, D]
    :param E: [D, M, M]; when the caller uses the PSD-split form, E carries
        E2_d - E1 pre-combined or the split is applied outside — this
        reference computes the generic quadform quad_d = diag(K E_d K^T)
    :param sigma2f: scalar kernel variance
    :return: mean [n, D], var [n, D] (var excludes the leading Kff term's
        clamping; caller adds Kff = sigma2f and clamps)
    """
    hi = jax.lax.Precision.HIGHEST
    xx = jnp.sum(Xs * Xs, axis=-1)[:, None]
    zz = jnp.sum(Zs * Zs, axis=-1)[None, :]
    d2 = jnp.maximum(xx + zz - 2.0 * jnp.matmul(Xs, Zs.T, precision=hi), 0.0)
    K = sigma2f * jnp.exp(-0.5 * d2)  # [n, M]
    mean = jnp.matmul(K, alpha, precision=hi)  # [n, D]
    KE = jnp.matmul(K[None], E, precision=hi)  # [D, n, M]
    quad = jnp.sum(KE * K[None], axis=-1).T  # [n, D]
    return mean, quad


def _kernel(xs_ref, zs_ref, zz_ref, alpha_ref, e_ref, sig_ref, mean_ref,
            var_ref, *, D):
    xs = xs_ref[:]                       # [T, d_pad]
    zs = zs_ref[:]                       # [M_pad, d_pad]
    sigma2f = sig_ref[0, 0]
    xx = jnp.sum(xs * xs, axis=-1, keepdims=True)          # [T, 1]
    cross = jnp.dot(xs, zs.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(xx + zz_ref[:] - 2.0 * cross, 0.0)    # [T, M_pad]
    K = sigma2f * jnp.exp(-0.5 * d2)
    mean_ref[:] = jnp.dot(K, alpha_ref[:],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
    cols = []
    for d in range(D):
        KE = jnp.dot(K, e_ref[d], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        cols.append(jnp.sum(KE * K, axis=-1, keepdims=True))
    quad = jnp.concatenate(cols, axis=1)                    # [T, D]
    pad = var_ref.shape[1] - D
    if pad:
        quad = jnp.pad(quad, ((0, 0), (0, pad)))
    var_ref[:] = quad


def _pallas_forward(Xs, Zs, zz, alpha, E, sigma2f):
    n, d = Xs.shape
    M = Zs.shape[0]
    D = alpha.shape[1]
    d_pad = _round_up(max(d, 1), LANE)
    m_pad = _round_up(M, LANE)
    dp_out = _round_up(D, LANE)
    n_pad = _round_up(n, TILE_N)

    f32 = jnp.float32
    Xs_p = jnp.zeros((n_pad, d_pad), f32).at[:n, :d].set(Xs.astype(f32))
    Zs_p = jnp.zeros((m_pad, d_pad), f32).at[:M, :d].set(Zs.astype(f32))
    zz_p = jnp.full((1, m_pad), 1e20, f32).at[0, :M].set(zz.astype(f32))
    # padding Z rows sit at huge distance -> K=0 there regardless of alpha/E
    alpha_p = jnp.zeros((m_pad, dp_out), f32).at[:M, :D].set(alpha.astype(f32))
    E_p = jnp.zeros((D, m_pad, m_pad), f32).at[:, :M, :M].set(E.astype(f32))
    sig = jnp.asarray(sigma2f, f32).reshape(1, 1)

    grid = (n_pad // TILE_N,)
    mean_p, var_p = pl.pallas_call(
        functools.partial(_kernel, D=D),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, d_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, d_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, dp_out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, m_pad, m_pad), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, dp_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, dp_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, dp_out), f32),
            jax.ShapeDtypeStruct((n_pad, dp_out), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * (d_pad + dp_out + D * m_pad),
            bytes_accessed=4 * (n_pad * d_pad + 2 * n_pad * dp_out),
            transcendentals=n_pad * m_pad,
        ),
        interpret=INTERPRET,
    )(Xs_p, Zs_p, zz_p, alpha_p, E_p, sig)
    dtype = Xs.dtype
    return (mean_p[:n, :D].astype(dtype), var_p[:n, :D].astype(dtype))


@jax.custom_vjp
def rbf_conditional_diag(Xs, Zs, alpha, E, sigma2f):
    """Fused (mean, quad) with a Pallas forward and jnp-autodiff backward."""
    zz = jnp.sum(Zs * Zs, axis=-1)
    return _pallas_forward(Xs, Zs, zz, alpha, E, sigma2f)


def _fwd(Xs, Zs, alpha, E, sigma2f):
    out = rbf_conditional_diag(Xs, Zs, alpha, E, sigma2f)
    return out, (Xs, Zs, alpha, E, sigma2f)


def _bwd(res, cts):
    Xs, Zs, alpha, E, sigma2f = res
    _, vjp = jax.vjp(rbf_conditional_diag_ref, Xs, Zs, alpha, E, sigma2f)
    return vjp(cts)


rbf_conditional_diag.defvjp(_fwd, _bwd)
