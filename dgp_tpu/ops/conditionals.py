"""Sparse-variational GP conditionals and the reparameterization trick.

TPU-native rewrite of the hot core at
/root/reference/dgp_dace/utils/layers.py:227-278 (Kuu Cholesky, Kuf, two
triangular solves, mean/variance assembly) and
/root/reference/dgp_dace/utils/utils.py:22-51 (reparameterize).

Differences from the reference, by design:

* The reference tiles Kuu/Lu per output GP (layers.py:232-233,251); here the
  shared-Kuu structure is kept and broadcast against the [D, M, M] q_sqrt
  batch, so the per-output work is pure batched matmul on the MXU.
* The S-sample axis is folded into the point axis before the conditional
  (one [M, S*N] Kuf matmul instead of S small ones), mirroring
  layers.py:81-85 but keeping everything in one fused XLA computation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..config import bwd_precision, default_jitter, quad_precision
from .precision import mm
from .quadform_pallas import quadform_t2, quadform_t2_t1


class SVGPProjection(NamedTuple):
    """Per-layer quantities that depend only on (kernel, Z, q) — not on X."""

    Lu: jnp.ndarray        # [M, M] lower Cholesky of Kuu + jitter I
    Kuu: jnp.ndarray       # [M, M] (jittered)
    SK: jnp.ndarray        # [D, M, M] = q_sqrt q_sqrt^T - (Kuu or I)
    Pinv: jnp.ndarray      # [M, M] projector: Lu^{-1} (white) or Kuu^{-1}


def precompute_projection(kernel, Z, q_sqrt, white: bool, jitter=None) -> SVGPProjection:
    jitter = default_jitter() if jitter is None else jitter
    M = Z.shape[0]
    Kuu = kernel.K(Z) + jitter * jnp.eye(M, dtype=Z.dtype)
    Lu = jnp.linalg.cholesky(Kuu)
    eye = jnp.eye(M, dtype=Kuu.dtype)
    if white:
        # A = Lu^{-1} Kuf computed as (one tiny M x M solve) @ Kuf: XLA's
        # triangular_solve against a wide [M, S*N] RHS is far off the MXU
        # roofline on TPU, an inverse-multiply is a single big matmul.
        Pinv = jsl.solve_triangular(Lu, eye, lower=True)
    else:
        Pinv = jsl.cho_solve((Lu, True), eye)  # Kuu^{-1}
    return SVGPProjection(Lu=Lu, Kuu=Kuu, SK=_make_sk(q_sqrt, Kuu, white),
                          Pinv=Pinv)


def _make_sk(q_sqrt, Kuu, white):
    M = Kuu.shape[-1]
    q = jnp.tril(q_sqrt)
    S = jnp.matmul(q, jnp.swapaxes(q, -1, -2),
                   precision=jax.lax.Precision.HIGHEST)  # [D, M, M]
    eye = jnp.eye(M, dtype=Kuu.dtype)
    return S - (eye[None] if white else Kuu[None])


def precompute_projections(items, jitter=None):
    """Batched :func:`precompute_projection` over a layer stack.

    :param items: list of (kernel, Z, q_sqrt, white).
    :return: list of :class:`SVGPProjection`, one per item.

    The per-layer M x M Cholesky + projector solve are the *sequential* ops
    of the training step (a TPU core executes one stream — L independent
    128 x 128 factorizations run back-to-back unless batched). Layers
    sharing (M, white) are stacked into one [G, M, M] batched
    cholesky/solve, which the blocked XLA implementations amortize across
    the batch; measured ~+8% end-to-end on bench.py for L=2 at M=128.
    """
    jitter = default_jitter() if jitter is None else jitter
    Kuus = []
    for kernel, Z, q_sqrt, white in items:
        M = Z.shape[0]
        Kuus.append(kernel.K(Z) + jitter * jnp.eye(M, dtype=Z.dtype))
    groups: dict = {}
    for i, (kernel, Z, q_sqrt, white) in enumerate(items):
        groups.setdefault((Z.shape[0], bool(white)), []).append(i)
    Lus = [None] * len(items)
    Pinvs = [None] * len(items)
    for (M, white), idxs in groups.items():
        Kstack = (jnp.stack([Kuus[i] for i in idxs])
                  if len(idxs) > 1 else Kuus[idxs[0]][None])
        Ls = jnp.linalg.cholesky(Kstack)
        eye = jnp.eye(M, dtype=Kstack.dtype)
        if white:
            Ps = jsl.solve_triangular(
                Ls, jnp.broadcast_to(eye, Kstack.shape), lower=True)
        else:
            Ps = jax.vmap(lambda l: jsl.cho_solve((l, True), eye))(Ls)
        for j, i in enumerate(idxs):
            Lus[i] = Ls[j]
            Pinvs[i] = Ps[j]
    return [
        SVGPProjection(Lu=Lus[i], Kuu=Kuus[i],
                       SK=_make_sk(q_sqrt, Kuus[i], white), Pinv=Pinvs[i])
        for i, (kernel, Z, q_sqrt, white) in enumerate(items)
    ]


def conditional_diag(kernel, Z, q_mu, q_sqrt, X, *, white: bool, jitter=None,
                     proj: SVGPProjection | None = None):
    """Marginal posterior q(f(X)) per point.

    :param Z: inducing inputs [M, Din]
    :param q_mu: [M, D]
    :param q_sqrt: [D, M, M] (lower-triangular factor; tril applied here)
    :param X: [n, Din]
    :return: mean [n, D], var [n, D]  (mean excludes the mean function)
    """
    if proj is None:
        proj = precompute_projection(kernel, Z, q_sqrt, white, jitter)
    hi = jax.lax.Precision.HIGHEST
    bwd = bwd_precision()
    Sq = jnp.swapaxes(jnp.tril(q_sqrt), -1, -2)  # [D, M, M]
    if white:
        from ..config import use_pallas

        if use_pallas():
            from .conditional_fused_rbf import (
                fused_conditional_white_stationary,
                fused_kind,
            )

            kind = fused_kind(kernel, Sq, X.shape[0])
            if kind is not None:
                # deepest fusion: the stationary Kuf tiles are built in VMEM
                # from the scaled points — no [M, S*N] Kuf/dKuf HBM
                # round-trips at all (ops/conditional_fused_rbf.py); only
                # the tiny elementwise lengthscale scaling stays in XLA
                # autodiff
                ls = kernel.lengthscales
                return fused_conditional_white_stationary(
                    kind, proj.Pinv, X / ls, Z / ls, kernel.variance, q_mu,
                    Sq)
    Kuf = kernel.K(Z, X)                       # [M, n]
    if white:
        from ..config import use_pallas
        from .conditional_fused import fused_applicable

        if use_pallas() and fused_applicable(Sq, Kuf):
            # fully fused whitened conditional: A/mean/t1/t2/var in one
            # Pallas pass, hand-written VJP — A and B never reach HBM
            # (ops/conditional_fused.py)
            from .conditional_fused import fused_conditional_white

            Kff = kernel.K_diag(X)
            return fused_conditional_white(proj.Pinv, Kuf, q_mu, Sq, Kff)
    # A (white) = Lu^{-1} Kuf: MXU matmul against the precomputed triangular
    # inverse instead of a wide triangular solve. Forward must be HIGHEST
    # (||A||^2 cancels against Kff below); the cotangent matmuls only feed
    # optimizer steps and run at the configured bwd precision.
    # A (non-white) = Kuu^{-1} Kuf via two substitution solves: measured in
    # f32 at cond(Kuu)~3e5 the explicit-inverse multiply loses ~10x accuracy
    # vs substitution (mean relerr 0.155 vs 0.010, var 0.044 vs 0.004 of
    # scale — tests/test_conditionals.py::test_nonwhite_f32_vs_f64_oracle),
    # and every non-whitened consumer (MF/EM/MO, tiny n) is far from the
    # MXU roofline anyway; the whitened hot path keeps the matmul form.
    if white:
        A = mm(proj.Pinv, Kuf, hi, bwd)
    else:
        A = jsl.cho_solve((proj.Lu, True), Kuf)
    mean = jnp.matmul(A.T, q_mu, precision=hi)  # [n, D]
    # variance as two PSD quadforms (prior-reduction + variational), each a
    # cancellation-free sum of products, instead of the indefinite
    # A^T (SS^T - C) A form — same FLOPs, much better f32 conditioning:
    #   white:      var = Kff - ||A||^2        + ||q_sqrt^T A||^2
    #   non-white:  var = Kff - sum(Kuf * A)   + ||q_sqrt^T A||^2
    # t2 is a positive sum of squares (no cancellation): its forward matmul
    # runs at the configured quadform precision — the FLOP-dominant
    # contraction of the whole model (D outputs x M^2 x S*N). On f32 TPU at
    # MXU-worthy shapes this dispatches to the fused Pallas kernel that
    # never materializes the [D, M, n] intermediate (quadform_pallas.py);
    # the whitened t1 = ||A||^2 rides in the same kernel pass.
    if white:
        t2, t1 = quadform_t2_t1(Sq, A)         # [D, n], [n]
    else:
        t1 = jnp.sum(Kuf * A, axis=0)          # kuf^T Kuu^{-1} kuf
        t2 = quadform_t2(Sq, A)                # [D, n]
    Kff = kernel.K_diag(X)                     # [n]
    # clamp: var >= 0 mathematically (Schur complement); f32 rounding in the
    # final subtraction can still push it slightly negative, which would NaN
    # the sqrt in reparameterize.
    var = jnp.maximum((Kff[None, :] - t1[None, :] + t2).T, 0.0)  # [n, D]
    return mean, var


def conditional_full(kernel, Z, q_mu, q_sqrt, X, *, white: bool, jitter=None,
                     proj: SVGPProjection | None = None):
    """Joint posterior over X: mean [n, D], cov [n, n, D]
    (axis order matches layers.py:265-276)."""
    if proj is None:
        proj = precompute_projection(kernel, Z, q_sqrt, white, jitter)
    hi = jax.lax.Precision.HIGHEST
    Kuf = kernel.K(Z, X)
    # same projection split as conditional_diag: substitution solves for the
    # non-white Kuu^{-1} application (f32 accuracy), matmul for white
    if white:
        A = jnp.matmul(proj.Pinv, Kuf, precision=hi)
    else:
        A = jsl.cho_solve((proj.Lu, True), Kuf)
    mean = jnp.matmul(A.T, q_mu, precision=hi)
    B = jnp.matmul(proj.SK, A[None], precision=hi)            # [D, M, n]
    delta = jnp.matmul(jnp.swapaxes(A[None], -1, -2), B, precision=hi)
    Kff = kernel.K(X)                          # [n, n]
    cov = jnp.transpose(Kff[None] + delta, (1, 2, 0))  # [n, n, D]
    return mean, cov


def reparameterize(mean, var, z, full_cov: bool = False, jitter=None):
    """Draw N(mean, var) samples from unit normals z.

    Diagonal: mean [..., N, D], var [..., N, D].
    Full-cov: var [..., N, N, D]; a per-(sample, output) Cholesky is taken,
    matching /root/reference/dgp_dace/utils/utils.py:43-51.
    """
    jitter = default_jitter() if jitter is None else jitter
    if var is None:
        return mean
    if not full_cov:
        return mean + z * jnp.sqrt(jnp.maximum(var, 0.0) + jitter)
    # [..., N, N, D] -> [..., D, N, N]
    var_d = jnp.moveaxis(var, -1, -3)
    eye = jnp.eye(var_d.shape[-1], dtype=var_d.dtype)
    chol = jnp.linalg.cholesky(var_d + jitter * eye)
    z_d = jnp.moveaxis(z, -1, -2)[..., None]           # [..., D, N, 1]
    f = jnp.moveaxis(mean, -1, -2) + (chol @ z_d)[..., 0]
    return jnp.moveaxis(f, -2, -1)
