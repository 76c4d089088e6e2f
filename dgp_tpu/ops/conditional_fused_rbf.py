"""Fully fused whitened stationary-SVGP conditional: Kuf never touches HBM.

Extends ops/conditional_fused.py (which consumes a materialized [M, S*N]
Kuf) by folding the stationary cross-kernel construction (RBF, Matern-3/2,
Matern-5/2 — every stationary kernel the SO_BO spec dicts offer) into the
same Pallas pass: each point tile computes, entirely in VMEM,

    sq    = max(||x||^2 + ||z||^2 - 2 z @ x, 0)     (HIGHEST cross term)
    Kuf   = k(sq)            (v*exp(-sq/2) | Matern forms on r = sqrt(sq))
    A     = Pinv @ Kuf                               (HIGHEST)
    mean  = A^T q_mu,  t1 = ||A||^2
    B     = Sq @ A,    t2 = ||B||^2 per output
    var   = max(v - t1 + t2, 0)                      (stationary: Kff == v)

The hand-written Matern cotangent chain works in sq, where the 1/r factor
of dr/dsq cancels analytically (dk/dsq is smooth at r=0: -(3v/2)e^{-ar}
for nu=3/2, -(5v/6)(1+ar)e^{-ar} for nu=5/2) — no _safe_dist epsilon
needed, unlike the autodiff path (ops/kernels.py:112-116).

Why: at the bench shapes (M=128, S*N=1e5, D=8) the [M, S*N] Kuf round-trips
are the largest remaining HBM streams after the round-2 fused conditional —
per layer per step roughly Kuf write + 2 kernel reads + dKuf write + the
XLA sqdist-backward's dKuf/Kuf reads ~ 300 MB, ~0.4 ms of the 3.3 ms step.
The hand-written backward recomputes sq/Kuf/A/B per tile and chains the
cotangents all the way to the *scaled* inputs (dXs, dZs accumulated across
tiles, dvariance including the Kff = v chain), so XLA's autodiff only
handles the tiny elementwise lengthscale scaling outside.

Reference op chain being replaced: Kuf/Kff construction + conditional of
/root/reference/dgp_dace/utils/layers.py:227-278 with a gpflow RBF kernel.

Numerics: identical pass structure to conditional_fused.py (fwd A at
HIGHEST, B at quad precision; bwd A recomputed at HIGH, B at bwd
precision); the in-kernel exp is Mosaic's f32 exp vs XLA's — agreement with
the unfused path is ~1e-6 relative (tests/test_conditional_fused_rbf.py).
Gated to plain full-dimension RBF kernels on the whitened f32 TPU path at
M <= pallas_max_m.
"""

from __future__ import annotations

import functools

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp

from ..config import bwd_precision, quad_precision
from .quadform_pallas import _dot, _pad_n, _worst

# test hook (CPU CI); conditional_fused's flag is honored too so existing
# dispatch-equivalence tests drive both kernels through the interpreter
_INTERPRET = False


def _interpret():
    from . import conditional_fused as _cf

    return _INTERPRET or _cf._INTERPRET


def fused_kind(kernel, Sq, n):
    """Static kernel-kind id (0=RBF, 1=Matern32, 2=Matern52) if the fused
    stationary kernel applies, else None. Requires a plain full-dimension
    stationary kernel (no active_dims slicing), whitened f32, and the same
    MXU-worthy size gates as the Kuf-consuming fused kernel."""
    from .kernels import RBF, Matern32, Matern52
    from .quadform_pallas import _kernel_applicable
    from ..config import pallas_max_m

    kind = {RBF: 0, Matern32: 1, Matern52: 2}.get(type(kernel))
    if kind is None or kernel.active_dims is not None:
        return None
    if Sq.dtype != jnp.float32:
        return None
    fake_a = jax.ShapeDtypeStruct((Sq.shape[1], n), jnp.float32)
    if not (_kernel_applicable(Sq, fake_a) and Sq.shape[1] <= pallas_max_m()):
        return None
    return kind


def rbf_fused_applicable(kernel, Sq, n):
    """Back-compat boolean wrapper around :func:`fused_kind`."""
    return fused_kind(kernel, Sq, n) is not None


def _kuf_tile(kind, v, sqd):
    """Stationary k(sq) on scaled squared distances (Kff == v for all)."""
    if kind == 0:
        return v * jnp.exp(-0.5 * sqd)
    r = jnp.sqrt(sqd)
    if kind == 1:
        a = 3.0 ** 0.5
        return v * (1.0 + a * r) * jnp.exp(-a * r)
    a = 5.0 ** 0.5
    return v * (1.0 + a * r + (5.0 / 3.0) * sqd) * jnp.exp(-a * r)


def _dkuf_dsq(kind, v, sqd, kuf):
    """d kuf / d sq — the 1/(2r) of dr/dsq cancels analytically, so every
    branch is smooth at sq == 0 (the autodiff path needs _safe_dist)."""
    if kind == 0:
        return -0.5 * kuf
    r = jnp.sqrt(sqd)
    if kind == 1:
        return -(1.5 * v) * jnp.exp(-(3.0 ** 0.5) * r)
    a = 5.0 ** 0.5
    return -((5.0 / 6.0) * v) * (1.0 + a * r) * jnp.exp(-a * r)


def _tile_n_rbf(D, M, prec=None):
    """VMEM-bounded point tile; same budget model as conditional_fused
    (+ the in-kernel Kuf tile is the same size as the A tile it replaces,
    and xs/dxs tiles are Din * TN with Din << M)."""
    from .conditional_fused import _tile_n

    return _tile_n(D, M, prec)


# -- kernels -------------------------------------------------------------------


def _sq_tile(zs, xs, hi):
    """[M, TN] scaled squared distances from zs [M, Dp] and xs [Dp, TN]."""
    xx = jnp.sum(xs * xs, axis=0, keepdims=True)          # [1, TN]
    zz = jnp.sum(zs * zs, axis=1, keepdims=True)          # [M, 1]
    cross = _dot(zs, xs, ((1,), (0,)), hi)                # [M, TN]
    return jnp.maximum((xx - 2.0 * cross) + zz, 0.0)


def _fwd_kernel(kind, D, M, quad_prec, pinv_ref, xs_ref, zs_ref, v_ref,
                qmu_ref, sq_ref, mean_ref, var_ref):
    hi = jax.lax.Precision.HIGHEST
    v = v_ref[0, 0]
    kuf = _kuf_tile(kind, v, _sq_tile(zs_ref[:], xs_ref[:], hi))  # [M, TN]
    a = _dot(pinv_ref[:], kuf, ((1,), (0,)), hi)          # [M, TN]
    mean_ref[:] = _dot(qmu_ref[:], a, ((0,), (0,)), hi)   # [D, TN]
    t1 = jnp.sum(a * a, axis=0, keepdims=True)            # [1, TN]
    b = _dot(sq_ref[:], a, ((1,), (0,)), quad_prec)       # [D*M, TN]
    tn = b.shape[-1]
    t2 = jnp.sum(b.reshape(D, M, tn) * b.reshape(D, M, tn), axis=1)
    var_ref[:] = jnp.maximum((v - t1) + t2, 0.0)          # [D, TN]


def _bwd_kernel(kind, D, M, quad_prec, bwd_prec, pinv_ref, xs_ref, zs_ref,
                v_ref, qmu_ref, sq_ref, gmean_ref, gvar_ref,
                dxs_ref, dpinv_ref, dzs_ref, dv_ref, dqmu_ref, dsq_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dpinv_ref[:] = jnp.zeros_like(dpinv_ref)
        dzs_ref[:] = jnp.zeros_like(dzs_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)
        dqmu_ref[:] = jnp.zeros_like(dqmu_ref)
        dsq_ref[:] = jnp.zeros_like(dsq_ref)

    hi = jax.lax.Precision.HIGHEST
    v = v_ref[0, 0]
    xs = xs_ref[:]
    zs = zs_ref[:]
    sqd = _sq_tile(zs, xs, hi)                            # [M, TN]
    kuf = _kuf_tile(kind, v, sqd)
    # pass structure as conditional_fused._bwd_kernel: A at HIGH (1-pass A
    # drifts 1.7e-2 through the cancellation-amplified t1/mean chains), B at
    # the cotangent precision.
    a = _dot(pinv_ref[:], kuf, ((1,), (0,)), jax.lax.Precision.HIGH)
    b = _dot(sq_ref[:], a, ((1,), (0,)), bwd_prec)        # [D*M, TN]
    tn = b.shape[-1]
    t1 = jnp.sum(a * a, axis=0, keepdims=True)
    t2 = jnp.sum(b.reshape(D, M, tn) * b.reshape(D, M, tn), axis=1)
    lin = (v - t1) + t2                                   # [D, TN]
    # same clamp-mask recompute caveat as conditional_fused._bwd_kernel
    gv = gvar_ref[:] * (lin > 0.0)                        # [D, TN]
    s = jnp.sum(gv, axis=0, keepdims=True)                # [1, TN]
    gexp = jnp.broadcast_to(gv[:, None, :], (D, M, tn)).reshape(D * M, tn)
    gb = (2.0 * b) * gexp
    da = _dot(sq_ref[:], gb, ((0,), (0,)), bwd_prec)      # [M, TN]
    da = da - (2.0 * a) * s
    da = da + _dot(qmu_ref[:], gmean_ref[:], ((1,), (0,)), bwd_prec)
    dkuf = _dot(pinv_ref[:], da, ((0,), (0,)), bwd_prec)  # [M, TN]
    # operator cotangents shared with the Kuf-consuming kernel
    dpinv_ref[:] += _dot(da, kuf, ((1,), (1,)), bwd_prec)          # [M, M]
    dqmu_ref[:] += _dot(a, gmean_ref[:], ((1,), (1,)), bwd_prec)   # [M, D]
    dsq_ref[:] += _dot(gb, a, ((1,), (1,)), bwd_prec)              # [D*M, M]
    # stationary chain: Kuf = v f(sq), Kff = v
    #   dv  += sum(dkuf . kuf)/v + sum(gv)        (Kuf chain + Kff chain)
    #   dsq  = (dk/dsq) . dkuf, masked where the sqdist clamp was active
    # (1, 1)-shaped store: Mosaic cannot store scalars to VMEM
    dv_ref[:] += (jnp.sum(dkuf * kuf) / v + jnp.sum(gv)).reshape(1, 1)
    dsqd = _dkuf_dsq(kind, v, sqd, kuf) * dkuf * (sqd > 0.0)  # [M, TN]
    # sq = xx + zz - 2 zs @ xs
    dxx = jnp.sum(dsqd, axis=0, keepdims=True)            # [1, TN]
    dzz = jnp.sum(dsqd, axis=1, keepdims=True)            # [M, 1]
    dxs_ref[:] = (2.0 * xs) * dxx - 2.0 * _dot(
        zs, dsqd, ((0,), (0,)), bwd_prec)                 # [Dp, TN]
    dzs_ref[:] += (2.0 * zs) * dzz - 2.0 * _dot(
        dsqd, xs, ((1,), (1,)), bwd_prec)                 # [M, Dp]


# -- pallas_call wrappers ------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _fwd_call(kind, D, M, Dp, n_pad, quad_prec, interpret):
    from jax.experimental.pallas import tpu as pltpu

    TN = _tile_n_rbf(D, M, quad_prec)
    grid = (n_pad // TN,)
    kernel = functools.partial(_fwd_kernel, kind, D, M, quad_prec)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vmem((M, M), lambda i: (0, 0)),
            vmem((Dp, TN), lambda i: (0, i)),
            vmem((M, Dp), lambda i: (0, 0)),
            vmem((1, 1), lambda i: (0, 0)),
            vmem((M, D), lambda i: (0, 0)),
            vmem((D * M, M), lambda i: (0, 0)),
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
            flops=2 * M * n_pad * (Dp + 6 * M + 3 * D * M + D),
            bytes_accessed=4 * (Dp * n_pad + 2 * D * n_pad + D * M * M),
            transcendentals=M * n_pad,
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _bwd_call(kind, D, M, Dp, n_pad, quad_prec, bwd_prec, interpret):
    from jax.experimental.pallas import tpu as pltpu

    TN = _tile_n_rbf(D, M, _worst(quad_prec, bwd_prec))
    grid = (n_pad // TN,)
    kernel = functools.partial(_bwd_kernel, kind, D, M, quad_prec, bwd_prec)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vmem((M, M), lambda i: (0, 0)),
            vmem((Dp, TN), lambda i: (0, i)),
            vmem((M, Dp), lambda i: (0, 0)),
            vmem((1, 1), lambda i: (0, 0)),
            vmem((M, D), lambda i: (0, 0)),
            vmem((D * M, M), lambda i: (0, 0)),
            vmem((D, TN), lambda i: (0, i)),
            vmem((D, TN), lambda i: (0, i)),
        ],
        out_specs=(
            vmem((Dp, TN), lambda i: (0, i)),
            vmem((M, M), lambda i: (0, 0)),
            vmem((M, Dp), lambda i: (0, 0)),
            vmem((1, 1), lambda i: (0, 0)),
            vmem((M, D), lambda i: (0, 0)),
            vmem((D * M, M), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Dp, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((M, M), jnp.float32),
            jax.ShapeDtypeStruct((M, Dp), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((M, D), jnp.float32),
            jax.ShapeDtypeStruct((D * M, M), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * n_pad * (2 * Dp + 2 * M + 5 * D * M + 3 * D),
            bytes_accessed=4 * (2 * Dp * n_pad + 3 * D * n_pad + D * M * M),
            transcendentals=M * n_pad,
        ),
        interpret=interpret,
    )


# -- public op -----------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_conditional_white_stationary(kind, Pinv, Xs, Zs, variance, q_mu,
                                       Sq):
    """(mean [n, D], var [n, D]) of the whitened stationary-SVGP conditional.

    :param kind: static kernel id from :func:`fused_kind`
    :param Xs: points / lengthscales, [n, Din]
    :param Zs: inducing inputs / lengthscales, [M, Din]
    :param variance: kernel variance scalar (Kff == variance)
    """
    return _fused_fwd(kind, Pinv, Xs, Zs, variance, q_mu, Sq)


def _prep(Xs, Zs, tn):
    """Lane-major [Din, n] points padded to the tile, Zs as an [M, Din]
    resident block."""
    XsT, n = _pad_n(Xs.T, tn)
    return XsT, Zs, n


def _fused_fwd(kind, Pinv, Xs, Zs, variance, q_mu, Sq):
    D, M = Sq.shape[0], Sq.shape[1]
    Dp = Xs.shape[1]
    tn = _tile_n_rbf(D, M, quad_precision())
    XsT, _, n = _prep(Xs, Zs, tn)
    v = jnp.asarray(variance, jnp.float32).reshape(1, 1)
    meanT, varT = _fwd_call(kind, D, M, Dp, XsT.shape[-1], quad_precision(),
                            _interpret())(Pinv, XsT, Zs, v, q_mu,
                                          Sq.reshape(D * M, M))
    return meanT[:, :n].T, varT[:, :n].T


def _fused_vjp_fwd(kind, Pinv, Xs, Zs, variance, q_mu, Sq):
    out = _fused_fwd(kind, Pinv, Xs, Zs, variance, q_mu, Sq)
    return out, (Pinv, Xs, Zs, variance, q_mu, Sq)


def _fused_vjp_bwd(kind, res, gs):
    Pinv, Xs, Zs, variance, q_mu, Sq = res
    g_mean, g_var = gs
    D, M = Sq.shape[0], Sq.shape[1]
    Dp = Xs.shape[1]
    tn = _tile_n_rbf(D, M, _worst(quad_precision(), bwd_precision()))
    XsT, _, n = _prep(Xs, Zs, tn)
    v = jnp.asarray(variance, jnp.float32).reshape(1, 1)
    g_meanT, _ = _pad_n(g_mean.T, tn)
    g_varT, _ = _pad_n(g_var.T, tn)
    dXsT, dPinv, dZs, dv, dq_mu, dSq = _bwd_call(
        kind, D, M, Dp, XsT.shape[-1], quad_precision(), bwd_precision(),
        _interpret())(Pinv, XsT, Zs, v, q_mu, Sq.reshape(D * M, M),
                      g_meanT, g_varT)
    dvar = jnp.asarray(dv[0, 0], dtype=jnp.result_type(variance))
    return (dPinv, dXsT[:, :n].T, dZs, dvar, dq_mu, dSq.reshape(D, M, M))


fused_conditional_white_stationary.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def fused_conditional_white_rbf(Pinv, Xs, Zs, variance, q_mu, Sq):
    """Back-compat RBF entry point (kind 0)."""
    return fused_conditional_white_stationary(0, Pinv, Xs, Zs, variance,
                                              q_mu, Sq)
