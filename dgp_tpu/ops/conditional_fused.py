"""Fully fused whitened SVGP conditional kernel (diag path).

One Pallas pass computes, per point tile, everything the whitened
conditional (ops/conditionals.py:conditional_diag, the rebuild of
/root/reference/dgp_dace/utils/layers.py:237-278) derives from the
projection A = Lu^{-1} Kuf:

    A     = Pinv @ Kuf            (6-pass bf16: ||A||^2 cancels vs Kff)
    mean  = A^T q_mu
    t1    = ||A||^2 per point
    B     = Sq @ A,  t2 = ||B||^2 per (output, point)
    var   = max(Kff - t1 + t2, 0)

so the two [M, S*N] intermediates (A, B) never touch HBM at all — under
XLA, A is materialized once forward and re-read by four consumers plus
saved as a backward residual. The hand-written backward recomputes A and B
tile-wise at the cotangent precision and emits exactly the operator-level
cotangents (dPinv, dKuf, dq_mu, dSq, dKff); everything upstream (the RBF
exp chain into Kuf/Kff, the Cholesky chain into Pinv, tril into Sq) stays
ordinary XLA autodiff.

Same dispatch gates as the quadform kernel (f32 TPU, bandwidth-bound
regime); the non-whitened path and small shapes use the jnp/quadform
implementations. Numerics: forward A at HIGHEST and the B matmul at
3-pass match conditional_diag exactly by construction; backward drift vs
the XLA path is the cotangent 1-pass budget (~1e-5 relative, measured).
"""

from __future__ import annotations

import functools

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp

from ..config import bwd_precision, quad_precision
from .quadform_pallas import TILE_N, _dot, _pad_n, _worst

# test hook (CPU CI)
_INTERPRET = False


def fused_applicable(Sq, Kuf):
    """Gates beyond the quadform kernel's: the fused kernel wins in the
    bandwidth-bound M <= pallas_max_m regime (default 128). The round-2
    Mosaic verification failure at M=256 ('vector.broadcast' element-type
    mismatch on the in-kernel HIGHEST projection) no longer reproduces on
    jax 0.9.0 — fwd and bwd compile and run at M=256 — so the gate is now
    purely the measured performance crossover (config.set_pallas_max_m)."""
    from ..config import pallas_max_m
    from .quadform_pallas import _kernel_applicable

    return _kernel_applicable(Sq, Kuf) and Sq.shape[1] <= pallas_max_m()


def _tile_n(D, M, prec=None):
    """VMEM-bounded point tile for the fused kernels: the backward keeps
    B and its cotangent ([D*M, TN]) plus A/dA/Kuf/dKuf ([M, TN]) live."""
    budget = 9 * 2 ** 20
    if prec == jax.lax.Precision.HIGHEST:
        budget = budget * 2 // 3
    tn = TILE_N
    while tn > 128 and 4 * (2 * D * M + 4 * M) * tn > budget:
        tn //= 2
    return tn


# -- kernels -------------------------------------------------------------------


def _fwd_kernel(D, M, quad_prec, pinv_ref, kuf_ref, qmu_ref, sq_ref,
                kff_ref, mean_ref, var_ref):
    # everything stays lane-major over the point axis ([D, TN], [M, TN]):
    # a [TN, D]-shaped block puts D=O(8) in the 128-lane dimension and the
    # per-tile relayouts measured 276 -> 154 steps/s end-to-end
    hi = jax.lax.Precision.HIGHEST
    a = _dot(pinv_ref[:], kuf_ref[:], ((1,), (0,)), hi)      # [M, TN]
    mean_ref[:] = _dot(qmu_ref[:], a, ((0,), (0,)), hi)      # [D, TN]
    t1 = jnp.sum(a * a, axis=0, keepdims=True)               # [1, TN]
    b = _dot(sq_ref[:], a, ((1,), (0,)), quad_prec)          # [D*M, TN]
    tn = b.shape[-1]
    t2 = jnp.sum(b.reshape(D, M, tn) * b.reshape(D, M, tn), axis=1)
    var_ref[:] = jnp.maximum((kff_ref[:] - t1) + t2, 0.0)    # [D, TN]


def _bwd_kernel(D, M, quad_prec, bwd_prec, pinv_ref, kuf_ref, qmu_ref,
                sq_ref, kff_ref, gmean_ref, gvar_ref,
                dkuf_ref, dkff_ref, dpinv_ref, dqmu_ref, dsq_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dpinv_ref[:] = jnp.zeros_like(dpinv_ref)
        dqmu_ref[:] = jnp.zeros_like(dqmu_ref)
        dsq_ref[:] = jnp.zeros_like(dsq_ref)

    kuf = kuf_ref[:]
    sq = sq_ref[:]
    # recompute A at 3-pass: unlike B (whose 1-pass recompute drifts
    # gradients ~1e-5), A's error is amplified through the t1/mean cotangent
    # chains — 1-pass A measured 1.7e-2 relative gradient drift vs 2.7e-5 at
    # 3-pass, for ~3.5% of the step (bench 304.5 vs 293.9 steps/s).
    # B recomputes at the cotangent precision.
    a = _dot(pinv_ref[:], kuf, ((1,), (0,)), jax.lax.Precision.HIGH)
    b = _dot(sq, a, ((1,), (0,)), bwd_prec)                  # [D*M, TN]
    tn = b.shape[-1]
    t1 = jnp.sum(a * a, axis=0, keepdims=True)               # [1, TN]
    t2 = jnp.sum(b.reshape(D, M, tn) * b.reshape(D, M, tn), axis=1)
    lin = (kff_ref[:] - t1) + t2                             # [D, TN]
    # Clamp-mask caveat: the forward computed var from A at HIGHEST and B at
    # quad precision; this recompute uses A at HIGH and B at bwd precision, so
    # near var == 0 (exactly where the clamp acts) the active set can disagree
    # with the forward — passing gradient through a point the forward clamped,
    # or zeroing one it didn't. This is part of the measured 2.7e-5 relative
    # gradient-drift budget above; shipping the forward mask instead would
    # cost an extra [D, N] HBM stream for a sub-ulp-rate event.
    gv = gvar_ref[:] * (lin > 0.0)                           # [D, TN]
    s = jnp.sum(gv, axis=0, keepdims=True)                   # [1, TN]
    dkff_ref[:] = s
    # gb = 2 B * g_t2[d] broadcast over that d's M-block of rows
    gexp = jnp.broadcast_to(gv[:, None, :], (D, M, tn)).reshape(D * M, tn)
    gb = (2.0 * b) * gexp
    # dA: t2 chain + t1 chain (g_t1 = -s) + mean chain
    da = _dot(sq, gb, ((0,), (0,)), bwd_prec)                # [M, TN]
    da = da - (2.0 * a) * s
    da = da + _dot(qmu_ref[:], gmean_ref[:], ((1,), (0,)), bwd_prec)
    # operator cotangents
    dkuf_ref[:] = _dot(pinv_ref[:], da, ((0,), (0,)), bwd_prec)
    dpinv_ref[:] += _dot(da, kuf, ((1,), (1,)), bwd_prec)    # [M, M]
    dqmu_ref[:] += _dot(a, gmean_ref[:], ((1,), (1,)), bwd_prec)  # [M, D]
    dsq_ref[:] += _dot(gb, a, ((1,), (1,)), bwd_prec)        # [D*M, M]


# -- pallas_call wrappers ------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _fwd_call(D, M, n_pad, quad_prec, interpret):
    from jax.experimental.pallas import tpu as pltpu

    TN = _tile_n(D, M, quad_prec)
    grid = (n_pad // TN,)
    kernel = functools.partial(_fwd_kernel, D, M, quad_prec)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vmem((M, M), lambda i: (0, 0)),
            vmem((M, TN), lambda i: (0, i)),
            vmem((M, D), lambda i: (0, 0)),
            vmem((D * M, M), lambda i: (0, 0)),
            vmem((1, TN), lambda i: (0, i)),
        ],
        out_specs=(
            vmem((D, TN), lambda i: (0, i)),
            vmem((D, TN), lambda i: (0, i)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((D, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((D, n_pad), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * n_pad * (6 * M + 3 * D * M + D),
            bytes_accessed=4 * (M * n_pad + 2 * D * n_pad + D * M * M),
            transcendentals=0,
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _bwd_call(D, M, n_pad, quad_prec, bwd_prec, interpret):
    from jax.experimental.pallas import tpu as pltpu

    TN = _tile_n(D, M, _worst(quad_prec, bwd_prec))
    grid = (n_pad // TN,)
    kernel = functools.partial(_bwd_kernel, D, M, quad_prec, bwd_prec)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vmem((M, M), lambda i: (0, 0)),
            vmem((M, TN), lambda i: (0, i)),
            vmem((M, D), lambda i: (0, 0)),
            vmem((D * M, M), lambda i: (0, 0)),
            vmem((1, TN), lambda i: (0, i)),
            vmem((D, TN), lambda i: (0, i)),
            vmem((D, TN), lambda i: (0, i)),
        ],
        out_specs=(
            vmem((M, TN), lambda i: (0, i)),
            vmem((1, TN), lambda i: (0, i)),
            vmem((M, M), lambda i: (0, 0)),
            vmem((M, D), lambda i: (0, 0)),
            vmem((D * M, M), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((M, M), jnp.float32),
            jax.ShapeDtypeStruct((M, D), jnp.float32),
            jax.ShapeDtypeStruct((D * M, M), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * n_pad * (2 * M + 5 * D * M + 3 * D),
            bytes_accessed=4 * (2 * M * n_pad + 3 * D * n_pad + D * M * M),
            transcendentals=0,
        ),
        interpret=interpret,
    )


# -- public op -----------------------------------------------------------------


@jax.custom_vjp
def fused_conditional_white(Pinv, Kuf, q_mu, Sq, Kff):
    """(mean [n, D], var [n, D]) of the whitened SVGP conditional."""
    return _fused_fwd(Pinv, Kuf, q_mu, Sq, Kff)


def _fused_fwd(Pinv, Kuf, q_mu, Sq, Kff):
    D, M = Sq.shape[0], Sq.shape[1]
    tn = _tile_n(D, M, quad_precision())
    Kufp, n = _pad_n(Kuf, tn)
    Kffp, _ = _pad_n(Kff[None, :], tn)
    meanT, varT = _fwd_call(D, M, Kufp.shape[-1], quad_precision(),
                            _INTERPRET)(Pinv, Kufp, q_mu,
                                        Sq.reshape(D * M, M), Kffp)
    # kernel layouts are lane-major over points; the [n, D] transpose at the
    # boundary is a cheap XLA relayout of a small array
    return meanT[:, :n].T, varT[:, :n].T


def _fused_vjp_fwd(Pinv, Kuf, q_mu, Sq, Kff):
    return _fused_fwd(Pinv, Kuf, q_mu, Sq, Kff), (Pinv, Kuf, q_mu, Sq, Kff)


def _fused_vjp_bwd(res, gs):
    Pinv, Kuf, q_mu, Sq, Kff = res
    g_mean, g_var = gs
    D, M = Sq.shape[0], Sq.shape[1]
    tn = _tile_n(D, M, _worst(quad_precision(), bwd_precision()))
    Kufp, n = _pad_n(Kuf, tn)
    Kffp, _ = _pad_n(Kff[None, :], tn)
    g_meanT, _ = _pad_n(g_mean.T, tn)
    g_varT, _ = _pad_n(g_var.T, tn)
    dKuf, dKff, dPinv, dq_mu, dSq = _bwd_call(
        D, M, Kufp.shape[-1], quad_precision(), bwd_precision(),
        _INTERPRET)(Pinv, Kufp, q_mu, Sq.reshape(D * M, M), Kffp,
                    g_meanT, g_varT)
    return (dPinv, dKuf[:, :n], dq_mu, dSq.reshape(D, M, M), dKff[0, :n])


fused_conditional_white.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)
