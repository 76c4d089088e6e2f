"""Expected hypervolume improvement (EHVI) + Pareto utilities.

TPU-native counterpart of /root/reference/dgp_dace/EHVI.py: 2-D staircase
hypervolume (HV_calcul), feasibility-filtered non-dominated sort (NDC), front
padding (Y_ND), the psi helper, and the EHVI acquisition in three estimators
(exact 2-D, Gaussian approximation with MC sample covariance, KDE over
samples), plus the DE/Adam EHVI optimizer.

Supported model forms: a list of two independent DGPs (reference branch
EHVI.py:124-130), a list of two independent exact GPRs (beyond reference:
analytic moments, no MC propagate), or a MultiObjDeepGP (the reference's
TF1-era 'coreg' branch, EHVI.py:131-149, is dead code and is not ported).
Reference bug fixed: optimize_EHVI passed population_stddev and
population_size swapped into tfp (EHVI.py:216).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.stats import norm

from ..config import default_float
from ..models import dgp as dgp_mod


# -- Pareto utilities (numpy, small-n host code) --------------------------------


def HV_calcul(ND, Y, bounds):
    """2-D staircase dominated hypervolume w.r.t. the upper corner (U1, U2)
    (EHVI.py:8-33). ``ND`` is an obj1-ascending index list into Y[0]/Y[1]."""
    L1, L2, U1, U2 = bounds
    y1 = np.asarray(Y[0]).reshape(-1)
    y2 = np.asarray(Y[1]).reshape(-1)
    if len(ND) == 0:
        return 0.0
    if any((y1[i] > U1) and (y2[i] > U2) for i in ND):
        return 0.0
    hv = max((U1 - y1[ND[0]]) * (U2 - y2[ND[0]]), 0.0)
    for i in range(len(ND) - 1):
        cur, nxt = ND[i], ND[i + 1]
        if (y1[nxt] > U1) or (y2[nxt] > U2):
            a = 0.0
        elif (y2[nxt] <= U2) and (y2[cur] > U2):
            a = (U2 - y2[nxt]) * (U1 - y1[nxt])
        else:
            a = (y2[cur] - y2[nxt]) * (U1 - y1[nxt])
        hv += a
    return float(hv)


def NDC(Y, C, obj1_ascending=True):
    """Feasibility-filtered non-dominated indices, sorted by objective 1
    (EHVI.py:35-81). Minimization; a point is dominated if another feasible
    point is <= in both objectives and < in one.

    Large archives dispatch to the O(n log n) C++ sweep in ``dgp_tpu.native``
    when the extension is available."""
    if len(np.asarray(Y[0])) >= 512:
        from .. import native

        if native.available():
            return native.nd_sort_2d(Y, C, obj1_ascending=obj1_ascending)
    return _ndc_numpy(Y, C, obj1_ascending=obj1_ascending)


def _ndc_numpy(Y, C, obj1_ascending=True):
    """Pure-numpy O(n^2) reference implementation (also the native fallback)."""
    y = np.concatenate((np.asarray(Y[0]), np.asarray(Y[1])), axis=1)
    C = np.asarray(C)
    feasible = [i for i in range(len(y)) if C[i].max() <= 0]
    if not feasible:
        return []
    nd = []
    for i in feasible:
        dominated = any(
            (y[j, 0] < y[i, 0] and y[j, 1] <= y[i, 1])
            or (y[j, 0] <= y[i, 0] and y[j, 1] < y[i, 1])
            for j in feasible
        )
        if not dominated:
            nd.append(i)
    nd.sort(key=lambda i: y[i, 0])
    return nd if obj1_ascending else nd[::-1]


def Y_ND(Y, ND, nadir, ideal=(0.0, 0.0)):
    """Pad the (obj1-descending) front with nadir/ideal corners
    (EHVI.py:90-100)."""
    y0 = np.asarray(Y[0])[ND]
    y1 = np.asarray(Y[1])[ND]
    out0 = np.zeros((len(ND) + 2, 1))
    out1 = np.zeros((len(ND) + 2, 1))
    out0[1:-1] = y0.reshape(-1, 1)
    out1[1:-1] = y1.reshape(-1, 1)
    out0[0], out0[-1] = nadir[0], ideal[0]
    out1[0], out1[-1] = ideal[1], nadir[1]
    return [out0, out1]


def pad_front(YND, bucket):
    """Pad a padded front (Y_ND output) to a multiple of ``bucket`` rows by
    repeating the nadir corner row. Duplicate adjacent points create
    zero-width staircase segments: every EHVI estimator term for such a
    segment carries a psi(a, b0) - psi(a, b0) = 0 factor, so the value is
    EXACTLY unchanged (pinned numerically for all three estimators in
    tests/test_ehvi.py). Lets BO loops keep the jitted EHVI/DE engines
    compile-stable while the non-dominated front grows."""
    if not bucket:
        return YND
    k = (-len(np.asarray(YND[0]))) % int(bucket)
    if not k:
        return YND
    return [np.vstack([np.repeat(np.asarray(y)[:1], k, axis=0),
                       np.asarray(y)]) for y in YND]


def psi(a, b, mu, sigma):
    """sigma*phi((b-mu)/sigma) + (a-mu)*Phi((b-mu)/sigma) (EHVI.py:102-104)."""
    z = (b - mu) / sigma
    return sigma * norm.pdf(z) + (a - mu) * norm.cdf(z)


# -- model moments/samples -------------------------------------------------------


def _mo_model_state(model_Y):
    """(kind, static_info, traced params-state) for the supported MO model
    forms — the pure counterpart of the object dispatch, enabling cached
    jitted EHVI programs (bo/de._ENGINE_CACHE)."""
    if isinstance(model_Y, (list, tuple)):
        names = [getattr(m, "name", None) for m in model_Y]
        if names == ["gpr", "gpr"]:
            # exact GPs: analytic moments; train_data is the padded triple,
            # so bucketed BO loops keep a stable traced shape
            return "two_gpr", None, (model_Y[0].params, model_Y[0].train_data,
                                     model_Y[1].params, model_Y[1].train_data)
        if names == ["dgp", "dgp"]:
            return "two_dgp", None, (model_Y[0].params, model_Y[1].params)
        raise ValueError(
            f"a model list must be two DGPs or two GPRs, got {names}")
    if getattr(model_Y, "name", None) == "mo_dgp":
        return "mo_dgp", model_Y.loop, model_Y.params
    raise ValueError(
        "model_Y must be a list of two DGPs/GPRs or a MultiObjDeepGP (the "
        "reference's TF1 'coreg' branch is not supported)"
    )


def _mo_moments_and_samples_pure(kind, loop, state, Xcand, S, key,
                                 need_samples):
    """(mean0, var0, mean1, var1, samples [S, n, 2] or None)."""
    if kind == "two_gpr":
        from ..models import gpr as gpr_mod

        p0, d0, p1, d1 = state
        m0, v0 = gpr_mod.predict_f(p0, d0, Xcand)
        m1, v1 = gpr_mod.predict_f(p1, d1, Xcand)
        samples = None
        if need_samples:
            # independent exact-GP posteriors: draws are independent
            # Gaussians at the analytic moments
            k0, k1 = jax.random.split(key)
            n = Xcand.shape[0]
            s0 = m0[None, :, 0] + jnp.sqrt(jnp.maximum(v0[None, :, 0], 0.0)) \
                * jax.random.normal(k0, (S, n), dtype=m0.dtype)
            s1 = m1[None, :, 0] + jnp.sqrt(jnp.maximum(v1[None, :, 0], 0.0)) \
                * jax.random.normal(k1, (S, n), dtype=m1.dtype)
            samples = jnp.stack([s0, s1], axis=2)
        return m0, v0, m1, v1, samples
    if kind == "two_dgp":
        p0, p1 = state
        k0, k1 = jax.random.split(key)
        Fs0, Fm0, Fv0 = dgp_mod.propagate(p0, Xcand, k0, S)
        Fs1, Fm1, Fv1 = dgp_mod.propagate(p1, Xcand, k1, S)
        m0 = jnp.mean(Fm0[-1], axis=0)
        v0 = jnp.mean(Fv0[-1] + Fm0[-1] ** 2, axis=0) - m0**2
        m1 = jnp.mean(Fm1[-1], axis=0)
        v1 = jnp.mean(Fv1[-1] + Fm1[-1] ** 2, axis=0) - m1**2
        samples = (
            jnp.concatenate([Fs0[-1], Fs1[-1]], axis=2) if need_samples else None
        )
        return m0, v0, m1, v1, samples
    from ..models import mo_dgp as mo_mod

    Fs, Fms, Fvs = mo_mod.propagate(state, Xcand, key, S, loop=loop)
    m0 = jnp.mean(Fms[-2], axis=0)
    v0 = jnp.mean(Fvs[-2] + Fms[-2] ** 2, axis=0) - m0**2
    m1 = jnp.mean(Fms[-1], axis=0)
    v1 = jnp.mean(Fvs[-1] + Fms[-1] ** 2, axis=0) - m1**2
    samples = (
        jnp.concatenate([Fs[-2], Fs[-1]], axis=2) if need_samples else None
    )
    return m0, v0, m1, v1, samples


# -- EHVI estimators ---------------------------------------------------------------


def EHVI(model_Y, Xcand, YND, corr=False, approximation="None", S=1000,
         key=None):
    """Expected hypervolume improvement at candidate points (EHVI.py:107-197).

    :param YND: padded front [Y0 [n,1], Y1 [n,1]] from :func:`Y_ND`
        (obj1-descending, corners included).
    :return: [n_cand, 1]
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    kind, loop, state = _mo_model_state(model_Y)
    Xcand = jnp.asarray(Xcand, dtype=default_float())
    Y0 = jnp.asarray(np.asarray(YND[0]).reshape(-1), dtype=default_float())
    Y1 = jnp.asarray(np.asarray(YND[1]).reshape(-1), dtype=default_float())
    return _ehvi_pure(kind, loop, corr, approximation, S,
                      state, Xcand, Y0, Y1, key)


def _ehvi_pure(kind, loop, corr, approximation, S, state, Xcand, Y0, Y1, key):
    """Traceable EHVI core: everything iteration-dependent (model params,
    candidates, padded front, key) is a traced argument."""
    n = Y0.shape[0]
    need_samples = (approximation == "KDE") or (
        approximation == "Gaussian" and corr
    )
    m0, v0, m1, v1, samples = _mo_moments_and_samples_pure(
        kind, loop, state, Xcand, S, key, need_samples
    )
    m0, v0, m1, v1 = m0[:, 0], v0[:, 0], m1[:, 0], v1[:, 0]
    # variance floor: psi() divides by sigma, and moment-matched variances can
    # hit 0 at observed points (cf. acquisition._floored_sigma)
    s0 = jnp.sqrt(jnp.maximum(v0, 1e-12))
    s1 = jnp.sqrt(jnp.maximum(v1, 1e-12))

    if approximation == "None":
        if corr:
            raise NotImplementedError(
                "exact EHVI under output correlation is not available "
                "(the reference only prints a message here, EHVI.py:152)"
            )
        # staircase sums, vectorized over front segments (EHVI.py:154-156)
        def seg1(i):
            return (
                (Y0[i - 1] - Y0[i])
                * (norm.cdf((Y0[i] - m0) / s0) - norm.cdf((Y0[-1] - m0) / s0))
                * (psi(Y1[i], Y1[i], m1, s1) - psi(Y1[i], Y1[0], m1, s1))
            )

        def seg2(i):
            return (
                psi(Y0[i - 1], Y0[i - 1], m0, s0) - psi(Y0[i - 1], Y0[i], m0, s0)
            ) * (psi(Y1[i], Y1[i], m1, s1) - psi(Y1[i], Y1[0], m1, s1))

        term1 = sum(seg1(i) for i in range(1, n - 1))
        term2 = sum(seg2(i) for i in range(1, n))
        return (term1 + term2)[:, None]

    if approximation == "Gaussian":
        # Gaussian cell-integral approximation (EHVI.py:158-191)
        n_cand = m0.shape[0]
        if corr:
            sbar = jnp.mean(samples, axis=0)  # [n_cand, 2]
            diff = jnp.transpose(samples - sbar[None], (1, 0, 2))  # [n_cand,S,2]
            Sigma = jnp.matmul(jnp.swapaxes(diff, -1, -2), diff) / S
        else:
            Sigma = jax.vmap(jnp.diag)(jnp.stack([v0, v1], axis=1))
        mu = jnp.stack([m0, m1], axis=1)  # [n_cand, 2]

        def mvn_pdf(lam, cov):
            d = lam[None, :] - mu  # [n_cand, 2]
            cinv = jnp.linalg.inv(cov)
            det = jnp.linalg.det(cov)
            quad = jnp.einsum("ni,nij,nj->n", d, cinv, d)
            return jnp.exp(-0.5 * quad) / (2 * jnp.pi * jnp.sqrt(det))

        total = jnp.zeros(n_cand, dtype=m0.dtype)
        for i in range(1, int(n) - 1):
            z = jnp.array([Y0[i] - Y0[-1], 0.5 * (Y1[i] - Y1[0]) ** 2])
            lam = jnp.array([0.5 * (Y0[i] + Y0[-1]), (Y1[i] + 2 * Y1[0]) / 3.0])
            tau2 = jnp.array(
                [(Y0[i] - Y0[-1]) ** 2 / 12.0, (Y1[i] - Y1[0]) ** 2 / 18.0]
            )
            pdf = mvn_pdf(lam, Sigma + jnp.diag(tau2)[None])
            total = total + (Y0[i - 1] - Y0[i]) * jnp.prod(z) * pdf
        for i in range(1, int(n)):
            z = jnp.array(
                [0.5 * (Y0[i - 1] - Y0[i]) ** 2, 0.5 * (Y1[i] - Y1[0]) ** 2]
            )
            lam = jnp.array(
                [(Y0[i - 1] + 2 * Y0[i]) / 3.0, (Y1[i] + 2 * Y1[0]) / 3.0]
            )
            tau2 = jnp.array(
                [(Y0[i - 1] - Y0[i]) ** 2 / 18.0, (Y1[i] - Y1[0]) ** 2 / 18.0]
            )
            pdf = mvn_pdf(lam, Sigma + jnp.diag(tau2)[None])
            total = total + jnp.prod(z) * pdf
        return total[:, None]

    if approximation == "KDE":
        # Silverman-bandwidth KDE over the joint samples (EHVI.py:192-197)
        h0 = ((4.0 / 4.0) ** (1.0 / 6.0) * S ** (-1.0 / 6.0) * s0) ** 2
        h1 = ((4.0 / 4.0) ** (1.0 / 6.0) * S ** (-1.0 / 6.0) * s1) ** 2
        b0, b1 = jnp.sqrt(h0), jnp.sqrt(h1)  # [n_cand]
        F0 = samples[:, :, 0]  # [S, n_cand]
        F1 = samples[:, :, 1]

        def seg1(i):
            return (Y0[i - 1] - Y0[i]) * jnp.mean(
                (norm.cdf((Y0[i] - F0) / b0) - norm.cdf((Y0[-1] - F0) / b0))
                * (psi(Y1[i], Y1[i], F1, b1) - psi(Y1[i], Y1[0], F1, b1)),
                axis=0,
            )

        def seg2(i):
            return jnp.mean(
                (psi(Y0[i - 1], Y0[i - 1], F0, b0) - psi(Y0[i - 1], Y0[i], F0, b0))
                * (psi(Y1[i], Y1[i], F1, b1) - psi(Y1[i], Y1[0], F1, b1)),
                axis=0,
            )

        term1 = sum(seg1(i) for i in range(1, int(n) - 1))
        term2 = sum(seg2(i) for i in range(1, int(n)))
        return (term1 + term2)[:, None]

    raise ValueError(f"unknown approximation {approximation!r}")


def _pof_pure(con_states, zero_n, Xcand):
    """Product of per-constraint probabilities of feasibility at Xcand.

    :param con_states: static-length tuple of (GPRParams, train_data), one
        exact-GPR surrogate per constraint (analytic predict_y moments, the
        same surrogate form SO_BO's constraint handling trains).
    :param zero_n: [n_con] feasibility thresholds in each surrogate's
        normalized output space — the image of 0 under that constraint
        column's normalization (feasible = g(x) <= 0, the NDC sign
        convention).
    :return: [n] prod_i P(g_i(x) <= 0).
    """
    from ..models import gpr as gpr_mod

    pof = 1.0
    for i, (p, dta) in enumerate(con_states):
        m, v = gpr_mod.predict_y(p, dta, Xcand)
        s = jnp.sqrt(jnp.maximum(v[:, 0], 1e-12))
        pof = pof * norm.cdf((zero_n[i] - m[:, 0]) / s)
    return pof


@functools.lru_cache(maxsize=None)
def _neg_ehvi_pof_loss(kind, loop, corr, approximation, S, n_con):
    """-(EHVI * prod PoF) — the standard constrained-EHVI acquisition (the
    multi-objective analogue of acquisition.PoF.run_with_IC's EI*PoF). EHVI
    >= 0 by construction, so the product needs no clamping; cached per
    static signature like :func:`_neg_ehvi_loss` so the DE/Adam engines
    stay compile-stable. Box-domain: acquisition.optimize_box lifts it onto
    the sigmoid map."""

    def loss(x, args):
        state, Y0, Y1, cstates, zero_n, key = args
        ehvi = _ehvi_pure(kind, loop, corr, approximation, S,
                          state, x, Y0, Y1, key).reshape(-1)
        return -(ehvi * _pof_pure(cstates, zero_n, x))

    return loss


@functools.lru_cache(maxsize=None)
def _neg_pof_loss(n_con):
    """-prod PoF alone: the fallback acquisition while the archive has no
    feasible point yet (EHVI is undefined without a front; maximizing the
    probability of feasibility is the standard bootstrap)."""

    def loss(x, args):
        cstates, zero_n = args
        return -_pof_pure(cstates, zero_n, x)

    return loss


@functools.lru_cache(maxsize=None)
def _neg_ehvi_loss(kind, loop, corr, approximation, S):
    """Stable -EHVI objective for the cached DE/Adam engines; args =
    (model-state, Y0, Y1, key). The front length only forces a (cached)
    retrace when it crosses a new size. Box-domain: acquisition.optimize_box
    lifts it onto the sigmoid map."""

    def loss(x, args):
        state, Y0, Y1, key = args
        return -_ehvi_pure(kind, loop, corr, approximation, S,
                           state, x, Y0, Y1, key).reshape(-1)

    return loss


def optimize_EHVI(model, YND, popsize_DE=300, popstd_DE=1.5, iterations_DE=400,
                  init_adam=None, lr_adam=0.01, iterations_adam=1000,
                  method="DE", corr=False, approximation="None", S=1000,
                  bounds=(0.0, 1.0), key=None, model_C=None, zero_c=None):
    """Maximize EHVI over the box via DE and/or Adam on the sigmoid map
    (EHVI.py:208-235; fixes the swapped DE population args at line 216).

    :param model_C: optional list of trained exact-GPR constraint
        surrogates; the acquisition becomes the constrained
        EHVI(x) * prod_i PoF_i(x) (beyond reference — the reference
        handles constraints only in its single-objective loop).
    :param zero_c: [n_con] feasibility thresholds in each constraint
        surrogate's (normalized) output space; required with ``model_C``.
    :param YND: padded descending front, or ``None`` (only with
        ``model_C``) to maximize the probability of feasibility alone —
        the bootstrap acquisition while the archive has no feasible point.
    :return: x_opt [1, d]
    """
    from .acquisition import optimize_box

    key = key if key is not None else jax.random.PRNGKey(0)
    dtype = default_float()
    d = np.asarray(model._X[0]).shape[1] if not isinstance(model, (list, tuple)) \
        else np.asarray(model[0].data[0]).shape[1]
    key, k_mc, k_de = jax.random.split(key, 3)

    if model_C is not None:
        names = [getattr(m, "name", None) for m in model_C]
        if any(n != "gpr" for n in names):
            raise ValueError(
                f"constraint surrogates must be exact GPRs, got {names}")
        if zero_c is None:
            raise ValueError("zero_c is required with model_C")
        cstates = tuple((m.params, m.train_data) for m in model_C)
        zn = jnp.asarray(np.asarray(zero_c).reshape(-1), dtype=dtype)
        if YND is None:
            fct = _neg_pof_loss(len(cstates))
            fct_args = (cstates, zn)
        else:
            kind, loop, state = _mo_model_state(model)
            fct = _neg_ehvi_pof_loss(kind, loop, corr, approximation, S,
                                     len(cstates))
            Y0 = jnp.asarray(np.asarray(YND[0]).reshape(-1), dtype=dtype)
            Y1 = jnp.asarray(np.asarray(YND[1]).reshape(-1), dtype=dtype)
            fct_args = (state, Y0, Y1, cstates, zn, k_mc)
    else:
        if YND is None:
            raise ValueError("YND=None requires constraint surrogates")
        kind, loop, state = _mo_model_state(model)
        fct = _neg_ehvi_loss(kind, loop, corr, approximation, S)
        Y0 = jnp.asarray(np.asarray(YND[0]).reshape(-1), dtype=dtype)
        Y1 = jnp.asarray(np.asarray(YND[1]).reshape(-1), dtype=dtype)
        fct_args = (state, Y0, Y1, k_mc)

    x_opt, _ = optimize_box(
        fct, fct_args, bounds, d, popsize_DE=popsize_DE, popstd_DE=popstd_DE,
        iterations_DE=iterations_DE, init_adam=init_adam,
        iterations_adam=iterations_adam, lr_adam=lr_adam, method=method,
        key=k_de)
    return x_opt


# -- m-objective utilities (beyond the reference's bi-objective stack) -----------
#
# The reference's EHVI machinery is intrinsically bi-objective: HV_calcul
# walks a 2-D staircase (EHVI.py:8-33) and the exact EHVI sums psi terms
# over consecutive front segments (EHVI.py:150-157). The acquisition
# OPTIMIZATION path above keeps that scope (PARITY.md scope note). The
# utilities below lift the analysis side to any m >= 2: generic
# non-dominated filtering, WFG hypervolume, and a Monte-Carlo EHVI
# evaluator for scoring candidates under independent per-objective
# surrogates — enough to measure m>=3 fronts; a jitted m>=3 acquisition
# optimizer (box-decomposition EHVI) remains future work.


def pareto_mask(F):
    """Boolean non-dominated mask for minimization.

    :param F: [n, m] objective rows.
    :return: [n] bool — True where no other row weakly dominates with at
        least one strict improvement. O(n^2 m), n is front-archive scale.
    """
    F = np.asarray(F, dtype=float)
    n = len(F)
    mask = np.ones(n, dtype=bool)
    for i in range(n):
        if not mask[i]:
            continue
        dominates_i = np.all(F <= F[i], axis=1) & np.any(F < F[i], axis=1)
        if dominates_i.any():
            mask[i] = False
    return mask


def hypervolume(F, ref):
    """Exact hypervolume (minimization) of the region dominated by ``F``
    and bounded above by ``ref`` — the WFG exclusive-volume recursion
    (While et al. 2012), any m >= 1. Points not strictly below ``ref``
    contribute nothing.

    :param F: [n, m] objective rows (need not be mutually non-dominated).
    :param ref: [m] reference (upper) corner.
    """
    F = np.asarray(F, dtype=float).reshape(-1, len(np.ravel(ref)))
    ref = np.asarray(ref, dtype=float).ravel()
    F = F[np.all(F < ref, axis=1)]
    if not len(F):
        return 0.0
    F = F[pareto_mask(F)]
    # sort by first objective: limits the exclusive sets in the recursion
    F = F[np.argsort(F[:, 0])]

    def _wfg(front):
        total = 0.0
        for i in range(len(front)):
            p = front[i]
            box = float(np.prod(ref - p))
            if i + 1 < len(front):
                # points that could overlap p's box, clipped to it
                clipped = np.maximum(front[i + 1:], p)
                clipped = clipped[np.all(clipped < ref, axis=1)]
                if len(clipped):
                    clipped = clipped[pareto_mask(clipped)]
                    box -= _wfg(clipped)
            total += box
        return total

    return float(_wfg(F))


def ehvi_mc(model, F_nd, ref, Xcand, key=None, S=200):
    """Monte-Carlo EHVI for any number of objectives m >= 2 (minimization):
    E[ HV(F_nd ∪ {Y(x)}) - HV(F_nd) ] with Y(x) sampled from the
    surrogates' posteriors. Host-side evaluator (numpy WFG per sample) for
    scoring candidate sets and validating the jitted bi-objective
    estimators — NOT wired into the DE engines.

    :param model: list of m independent per-objective surrogates (each with
        the ``predict_f``/sample contract of so_bo.make_single_model).
    :param F_nd: [k, m] current non-dominated front (objective units of the
        surrogates' training targets).
    :param ref: [m] reference corner (e.g. the nadir of the HV box).
    :param Xcand: [n, d] candidate inputs.
    :return: [n] MC-estimated EHVI values.
    """
    import jax

    from ..models.dgp import moment_matched

    key = key if key is not None else jax.random.PRNGKey(0)
    F_nd = np.asarray(F_nd, dtype=float)
    ref = np.asarray(ref, dtype=float).ravel()
    m = len(ref)
    if len(model) != m:
        raise ValueError("one surrogate per objective")
    Xcand = np.asarray(Xcand, dtype=float)
    n = len(Xcand)

    # per-objective posterior moments -> independent Gaussian samples
    means, sds = [], []
    for j, mj in enumerate(model):
        if mj.name == "gpr":
            mu, var = mj.predict_f(Xcand)
            mu, var = np.asarray(mu), np.asarray(var)
        else:
            m_s, v_s = mj.predict_f(Xcand, S=max(S, 64))
            mu, var = moment_matched(np.asarray(m_s), np.asarray(v_s))
            mu, var = np.asarray(mu), np.asarray(var)
        means.append(mu.reshape(n))
        sds.append(np.sqrt(np.maximum(var.reshape(n), 1e-12)))
    means = np.stack(means, axis=1)  # [n, m]
    sds = np.stack(sds, axis=1)

    rng = np.random.default_rng(int(np.asarray(
        jax.random.randint(key, (), 0, 2**31 - 1))))
    z = rng.standard_normal((S, n, m))
    samples = means[None] + sds[None] * z  # [S, n, m]

    hv_base = hypervolume(F_nd, ref)
    out = np.zeros(n)
    for i in range(n):
        gain = 0.0
        for s in range(S):
            y = samples[s, i]
            if np.all(y < ref):
                gain += hypervolume(np.vstack([F_nd, y[None]]),
                                    ref) - hv_base
        out[i] = gain / S
    return out
