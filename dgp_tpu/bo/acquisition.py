"""Infill criteria (acquisition functions) for single-objective BO.

TPU-native counterpart of /root/reference/dgp_dace/Infill_criteria.py:
EI / WB2 / WB2S acquisitions, EV (expected violation) and PoF (probability of
feasibility) constraint handling, each with a DE + Adam-on-sigmoid optimizer.

Differences from the reference, by design:
* The acquisition surface is evaluated with *common random numbers* (one PRNG
  key fixed per optimize() call) so DE/Adam see a deterministic surface; the
  reference redraws TF's global RNG every evaluation.
* The DE loop is a single jitted XLA program (bo/de.py) instead of tfp's
  Python-driven optimizer.
* Latent bugs fixed (SURVEY.md §7.3): WB2S's undefined scale on the GPR branch
  (Infill_criteria.py:179-198) becomes an explicit ``scale`` argument; PoF.run
  returning None (325-341) and its class-name reference (345) are implemented
  properly; ``optimize`` returns shape [1, d] (usable for any d, the
  reference's reshape(d, 1) only worked for d=1).
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
from ..models import gpr as gpr_mod
from . import de


def sigmoid_box_map(lw, up, V):
    """Unconstrained -> box: x = lw + (up-lw) * 1/(1+exp(V))
    (Infill_criteria.py:63)."""
    return lw + (up - lw) / (1.0 + jnp.exp(V))


def inverse_box_map(lw, up, x):
    """Box -> unconstrained init for Adam (Infill_criteria.py:76)."""
    return jnp.log((up - x + 1e-3) / (x - lw + 1e-3))


def _moment_matched(m_s, v_s):
    mean = jnp.mean(m_s, axis=0)
    var = jnp.mean(v_s + m_s**2, axis=0) - mean**2
    return mean, var


def _floored_sigma(var):
    """sqrt(var) with a variance floor. An exact-interpolation surrogate
    (GPR with tiny noise evaluated at an observed x) drives var -> 0; the
    unguarded z-scores would then be 0/0 = NaN inside the DE population and
    poison the acquisition optimum."""
    return jnp.sqrt(jnp.maximum(var, 1e-12))


def _expected_improvement(y_min, mean, var):
    """EI(x) = (y_min - mu) Phi(z) + sigma phi(z); the reference's
    ``var * N(y_min | mu, sigma)`` equals sigma*phi(z) exactly
    (Infill_criteria.py:32-35)."""
    sigma = _floored_sigma(var)
    z = (y_min - mean) / sigma
    return (y_min - mean) * norm.cdf(z) + sigma * norm.pdf(z)


# -- pure model forwards + cached loss factories --------------------------------
#
# The acquisition surface gets re-optimized every BO infill. To reuse the
# compiled DE/Adam programs across infills (bo/de._ENGINE_CACHE), the loss
# must be a *stable function object* with everything iteration-dependent
# (model params/data, y_min, PRNG key, thresholds) passed as a traced args
# pytree. ``kind`` ('gpr'/'dgp') and sample counts are static factory keys.


def _model_state(model):
    """(kind, traced-state) for a surrogate: GPR/AR1-co-kriging carry
    (params, padded train data); SVGP-based DGP/MF-DGP predictions need
    params only (the MF-DGP's augmented inducing rows are a pure function
    of params+key)."""
    if model.name == "gpr":
        return "gpr", (model.params, model.train_data)
    if model.name == "ar1":
        return "ar1", (model.params, model.train_data)
    if model.name == "nargp":
        return "nargp", (model.params, model.train_data)
    if model.name == "mf_dgp":
        return "mf_dgp", model.params
    if model.name == "mf_dgp_EM":
        return "em", model.params
    if model.name == "dgp":
        return "dgp", model.params
    # fail at the dispatch boundary: an unknown wrapper's params pytree would
    # otherwise reach dgp_mod.predict_y and die (or silently mis-predict)
    # deep inside the conditional
    raise ValueError(
        f"unsupported surrogate kind {model.name!r} for acquisition moments; "
        "supported: gpr, ar1, nargp, mf_dgp, mf_dgp_EM, dgp")


def _y_moments_pure(kind, state, x, key, num_samples):
    if kind == "gpr":
        params, data = state
        return gpr_mod.predict_y(params, data, x)
    if kind == "ar1":
        from ..models import cokriging as ar1_mod

        params, data = state
        return ar1_mod.predict_y(params, data, x, -1)
    if kind == "nargp":
        from ..models import nargp as nargp_mod

        params, datas = state
        m_s, v_s = nargp_mod.predict_y(params, datas, x, key, num_samples)
        return _moment_matched(m_s, v_s)
    if kind == "mf_dgp":
        from ..models import mf_dgp as mf_mod

        m_s, v_s = mf_mod.predict_y(state, x, key, num_samples)
        return _moment_matched(m_s, v_s)
    if kind == "em":
        from ..models import mf_dgp_em as em_mod

        m_s, v_s = em_mod.predict_y(state, x, key, num_samples)
        return _moment_matched(m_s, v_s)
    m_s, v_s = dgp_mod.predict_y(state, x, key, num_samples)
    return _moment_matched(m_s, v_s)


def _f_moments_pure(kind, state, x, key, num_samples):
    if kind == "gpr":
        params, data = state
        return gpr_mod.predict_y(params, data, x)
    if kind == "ar1":
        from ..models import cokriging as ar1_mod

        params, data = state
        # highest-fidelity exact latent posterior
        return ar1_mod.predict_f(params, data, x, -1)
    if kind == "nargp":
        from ..models import nargp as nargp_mod

        params, datas = state
        # highest-fidelity MC-propagated latent posterior
        m_s, v_s = nargp_mod.predict_f(params, datas, x, key, num_samples)
        return _moment_matched(m_s, v_s)
    if kind == "mf_dgp":
        from ..models import mf_dgp as mf_mod

        # highest-fidelity latent posterior (fidelity=None = last layer)
        m_s, v_s = mf_mod.predict_f(state, x, key, num_samples)
        return _moment_matched(m_s, v_s)
    if kind == "em":
        from ..models import mf_dgp_em as em_mod

        # highest-fidelity latent posterior through the reduction chain
        m_s, v_s = em_mod.predict_f(state, x, key, num_samples)
        return _moment_matched(m_s, v_s)
    m_s, v_s = dgp_mod.predict_f(state, x, key, num_samples)
    return _moment_matched(m_s, v_s)


def _samples_pure(kind, state, x, key, num_samples):
    if kind == "gpr":
        params, data = state
        mean, var = gpr_mod.predict_y(params, data, x)
        z = jax.random.normal(key, (num_samples,) + mean.shape, mean.dtype)
        return mean[None] + jnp.sqrt(var)[None] * z
    if kind == "ar1":
        from ..models import cokriging as ar1_mod

        params, data = state
        mean, var = ar1_mod.predict_y(params, data, x, -1)
        z = jax.random.normal(key, (num_samples,) + mean.shape, mean.dtype)
        return mean[None] + jnp.sqrt(var)[None] * z
    if kind == "nargp":
        from ..models import nargp as nargp_mod

        params, datas = state
        k1, k2 = jax.random.split(key)
        m_s, v_s = nargp_mod.predict_y(params, datas, x, k1, num_samples)
        z = jax.random.normal(k2, m_s.shape, m_s.dtype)
        return m_s + jnp.sqrt(jnp.maximum(v_s, 0.0)) * z
    if kind == "mf_dgp":
        from ..models import mf_dgp as mf_mod

        Fs, _, _ = mf_mod.propagate(state, x, key, num_samples)
        return Fs[-1]
    if kind == "em":
        from ..models import mf_dgp_em as em_mod

        Fs, _, _ = em_mod.propagate(state, x, key, num_samples)
        return Fs[-1]
    Fs, _, _ = dgp_mod.propagate(state, x, key, num_samples)
    return Fs[-1]


@functools.lru_cache(maxsize=None)
def _ei_loss(kind: str, analytic: bool, num_samples: int):
    """args = (state, y_min, key) -> -EI [n, 1]."""

    def loss(x, args):
        state, y_min, key = args
        if analytic:
            mean, var = _f_moments_pure(kind, state, x, key, num_samples)
            return -_expected_improvement(y_min, mean, var)
        F = _samples_pure(kind, state, x, key, num_samples)
        return -jnp.mean(jnp.maximum(y_min - F, 0.0), axis=0)

    return loss


@functools.lru_cache(maxsize=None)
def _wb2_loss(kind: str, num_samples: int):
    """args = (state, y_min, scale, key) -> -(scale*EI - mean); scale=1
    recovers WB2."""

    def loss(x, args):
        state, y_min, scale, key = args
        mean, var = _y_moments_pure(kind, state, x, key, num_samples)
        ei = _expected_improvement(y_min, mean, var)
        return -(scale * ei - mean)

    return loss


def _ev_one_pure(kind, state, x, key, zero_c, analytic, num_samples):
    if analytic:
        S = 500 if kind == "dgp" else num_samples
        mean, var = _y_moments_pure(kind, state, x, key, S)
        sigma = _floored_sigma(var)
        z = (mean - zero_c) / sigma
        return (mean - zero_c) * norm.cdf(z) + sigma * norm.pdf(z)
    F = _samples_pure(kind, state, x, key, num_samples)
    return jnp.mean(jnp.maximum(F - zero_c, 0.0), axis=0)


@functools.lru_cache(maxsize=None)
def _ev_ic_loss(ic_loss, c_kinds: tuple, analytic: bool, num_samples: int):
    """args = (ic_args, c_states, zero_c [n_c], threshold, key)."""

    def loss(x, args):
        ic_args, c_states, zero_c, threshold, key = args
        evs = []
        for i, kind in enumerate(c_kinds):
            sub = jax.random.fold_in(key, i)
            evs.append(
                _ev_one_pure(kind, c_states[i], x, sub, zero_c[i], analytic,
                             num_samples)
            )
        ev = jnp.concatenate(evs, axis=1)
        ev_max = jnp.max(ev, axis=1, keepdims=True)
        ei = ic_loss(x, ic_args)
        penalty = jnp.sum(ev, axis=1, keepdims=True) + 10000.0
        return jnp.where(ev_max > threshold, penalty, ei)

    return loss


@functools.lru_cache(maxsize=None)
def _pof_ic_loss(ic_loss, c_kinds: tuple, num_samples: int):
    """args = (ic_args, c_states, zero_c [n_c], key) -> -(EI * prod PoF_i).

    The IC loss is clamped to <= 0 before the PoF weighting: weighting is
    only order-preserving for non-positive losses (true for -EI; WB2/WB2S's
    -(scale*EI - mean) can be positive where the predicted mean dominates,
    and shrinking a *positive* loss toward 0 by a small PoF would score
    highly infeasible bad regions above feasible mediocre ones)."""

    def loss(x, args):
        ic_args, c_states, zero_c, key = args
        pof = 1.0
        for i, kind in enumerate(c_kinds):
            sub = jax.random.fold_in(key, i)
            mean, var = _y_moments_pure(kind, c_states[i], x, sub, num_samples)
            pof = pof * norm.cdf((zero_c[i] - mean) / _floored_sigma(var))
        return jnp.minimum(ic_loss(x, ic_args), 0.0) * pof

    return loss


@functools.lru_cache(maxsize=None)
def _boxed(loss_fn):
    """Lift a box-domain loss to the unconstrained DE/Adam space;
    args = (lw, up, inner_args)."""

    def fct(V, args):
        lw, up, inner = args
        return loss_fn(sigmoid_box_map(lw, up, V), inner)

    return fct


def optimize_box(loss_fn, loss_args, bounds, d, popsize_DE=300, popstd_DE=1.5,
                 iterations_DE=400, init_adam=None, iterations_adam=1000,
                 lr_adam=0.01, method="DE", key=None):
    """Generic DE + Adam-on-sigmoid optimizer over a box domain — the one
    scaffold every acquisition (EI/WB2/WB2S/EV/PoF here, EHVI in bo/ehvi.py)
    drives its search through.

    ``loss_fn(x [P, d] in the box, loss_args) -> [P] or [P, 1]`` must be a
    stable (factory-cached) function object so the jitted DE/Adam engines
    (bo/de.py) are reused across BO infills; everything iteration-dependent
    travels in the traced ``loss_args`` pytree. Returns ``(x_opt [1, d],
    objective)``."""
    dtype = default_float()
    lw = jnp.broadcast_to(jnp.asarray(bounds[0], dtype=dtype), (d,))
    up = jnp.broadcast_to(jnp.asarray(bounds[1], dtype=dtype), (d,))
    key = key if key is not None else jax.random.PRNGKey(0)

    fct = _boxed(loss_fn)
    fct_args = (lw, up, loss_args)

    x_opt = None
    objective = None
    if method in ("DE", "DE+Adam"):
        res = de.minimize(
            fct, jnp.zeros((d,), dtype=dtype), key,
            population_size=popsize_DE, population_stddev=popstd_DE,
            max_iterations=iterations_DE, fn_args=fct_args,
        )
        x_opt = sigmoid_box_map(lw, up, res.position)
        objective = float(res.objective)
    if method in ("Adam", "DE+Adam"):
        if init_adam is not None:
            v0 = inverse_box_map(lw, up, jnp.asarray(init_adam, dtype=dtype))
        elif x_opt is not None:
            v0 = inverse_box_map(lw, up, x_opt)
        else:
            v0 = jnp.zeros((d,), dtype=dtype)
        v, obj = de.adam_refine(fct, v0, iterations=iterations_adam,
                                lr=lr_adam, fn_args=fct_args)
        x_opt = sigmoid_box_map(lw, up, v)
        objective = float(obj)
    if x_opt is None:
        raise ValueError(
            f"unknown method {method!r}: use 'DE', 'Adam' or 'DE+Adam'")
    return np.asarray(x_opt)[None, :], objective


class InfillCriteria:
    name = "Infill criteria"

    def __init__(self, d):
        self.d = d
        self.IC_optimized = None
        self.x_opt = None

    # -- model forwards (pure in model params) --------------------------------
    @staticmethod
    def _predict_y_moments(model, x, key, num_samples):
        """Moment-matched predictive-y moments, [n,1] each. Dispatches via
        :func:`_model_state`, so every surrogate kind the pure factories
        handle (gpr/dgp/ar1/nargp/mf_dgp) works here too — WB2S.resolve_scale
        reaches this with MF_BO's surrogates."""
        kind, state = _model_state(model)
        return _y_moments_pure(kind, state, x, key, num_samples)

    @staticmethod
    def _predict_f_moments(model, x, key, num_samples):
        """Moment-matched latent-f moments (EI's analytic dgp branch,
        Infill_criteria.py:39-41)."""
        kind, state = _model_state(model)
        return _f_moments_pure(kind, state, x, key, num_samples)

    @staticmethod
    def _samples(model, x, key, num_samples):
        """Last-layer MC samples [S, n, 1]."""
        kind, state = _model_state(model)
        return _samples_pure(kind, state, x, key, num_samples)

    # -- generic DE + Adam optimizer over the sigmoid box map -----------------
    def _optimize_box(
        self, loss_fn, loss_args, bounds, popsize_DE=300, popstd_DE=1.5,
        iterations_DE=400, init_adam=None, iterations_adam=1000, method="DE",
        key=None,
    ):
        """:func:`optimize_box` with this criterion's d, recording the
        optimum into ``x_opt`` / ``IC_optimized``; returns x_opt [1, d]."""
        self.x_opt, self.IC_optimized = optimize_box(
            loss_fn, loss_args, bounds, self.d, popsize_DE=popsize_DE,
            popstd_DE=popstd_DE, iterations_DE=iterations_DE,
            init_adam=init_adam, iterations_adam=iterations_adam,
            method=method, key=key)
        return self.x_opt


class EI(InfillCriteria):
    """Expected improvement (Infill_criteria.py:20-87). ``run`` returns -EI."""

    name = "Expected Improvement"

    def __init__(self, y_min, d):
        super().__init__(d)
        self.y_min = jnp.asarray(y_min, dtype=default_float()).reshape(())

    def run(self, model, x, analytic=True, num_samples=1000, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        x = jnp.asarray(x, dtype=default_float())
        if analytic:
            mean, var = self._predict_f_moments(model, x, key, num_samples)
            return -_expected_improvement(self.y_min, mean, var)
        F = self._samples(model, x, key, num_samples)
        ei = jnp.mean(jnp.maximum(self.y_min - F, 0.0), axis=0)
        return -ei

    def _default_loss_spec(self, model, key, analytic=True, num_samples=1000):
        """(stable loss_fn, traced args) — run()'s semantics at its defaults
        (the constrained combiners evaluate the IC at defaults,
        Infill_criteria.py:284-289)."""
        kind, state = _model_state(model)
        return _ei_loss(kind, analytic, num_samples), (state, self.y_min, key)

    def optimize(self, model, bounds, popsize_DE=300, popstd_DE=1.5,
                 iterations_DE=400, init_adam=None, iterations_adam=1000,
                 method="DE", analytic=True, num_samples=1000, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        key, sub = jax.random.split(key)
        loss_fn, args = self._default_loss_spec(model, sub, analytic=analytic,
                                                num_samples=num_samples)
        return self._optimize_box(loss_fn, args, bounds, popsize_DE, popstd_DE,
                                  iterations_DE, init_adam, iterations_adam,
                                  method, key)


class WB2(InfillCriteria):
    """WB2 = EI - predicted mean (Infill_criteria.py:106-168); run returns
    -(EI - mean)."""

    name = "WB2 criterion"

    def __init__(self, y_min, d):
        super().__init__(d)
        self.y_min = jnp.asarray(y_min, dtype=default_float()).reshape(())

    def run(self, model, x, num_samples=500, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        x = jnp.asarray(x, dtype=default_float())
        mean, var = self._predict_y_moments(model, x, key, num_samples)
        ei = _expected_improvement(self.y_min, mean, var)
        return -(ei - mean)

    def _default_loss_spec(self, model, key, analytic=True, num_samples=500):
        kind, state = _model_state(model)
        scale = jnp.asarray(getattr(self, "scale", 1.0), dtype=default_float())
        return _wb2_loss(kind, num_samples), (state, self.y_min, scale, key)

    def optimize(self, model, bounds, popsize_DE=300, popstd_DE=1.5,
                 iterations_DE=400, init_adam=None, iterations_adam=1000,
                 method="DE", num_samples=500, key=None, analytic=True):
        """``analytic`` is accepted for interface uniformity with EI (SO_BO
        passes it to whichever IC the user picked) and ignored: WB2's EI
        term is defined on the analytic predictive-y moments."""
        key = key if key is not None else jax.random.PRNGKey(0)
        key, sub = jax.random.split(key)
        loss_fn, args = self._default_loss_spec(model, sub,
                                                num_samples=num_samples)
        return self._optimize_box(loss_fn, args, bounds, popsize_DE, popstd_DE,
                                  iterations_DE, init_adam, iterations_adam,
                                  method, key)


class WB2S(InfillCriteria):
    """WB2S = scale*EI - mean with the literature's adaptive scale
    (Bartoli et al. 2019, "Adaptive modeling strategy for constrained global
    optimization..."): s = beta * |mean(x*_EI)| / EI(x*_EI) where x*_EI is
    the EI maximizer, so the EI term stays comparable to the exploitation
    term; s falls back to 1 when EI* ~ 0.

    The reference's implementation is broken — its GPR branch references an
    undefined variable (Infill_criteria.py:198) — so ``scale`` here is either
    'auto' (adaptive, resolved per :meth:`optimize`/:meth:`resolve_scale`
    call) or an explicit number."""

    name = "WB2S criterion"

    def __init__(self, y_min, d, scale="auto", beta=100.0):
        super().__init__(d)
        self.y_min = jnp.asarray(y_min, dtype=default_float()).reshape(())
        self.scale = scale
        self.beta = beta
        self._scale_value = None if isinstance(scale, str) else float(scale)

    def resolve_scale(self, model, bounds, key=None, popsize_DE=100,
                      iterations_DE=100, num_samples=500):
        """Compute (and cache) the adaptive s from a short EI
        pre-optimization; no-op when a numeric scale was given."""
        if self._scale_value is not None:
            return self._scale_value
        key = key if key is not None else jax.random.PRNGKey(0)
        k_opt, k_mean = jax.random.split(key)
        ei = EI(self.y_min, self.d)
        x_star = ei.optimize(model, bounds, popsize_DE=popsize_DE,
                             iterations_DE=iterations_DE, method="DE",
                             key=k_opt)
        ei_star = -ei.IC_optimized  # optimize minimizes -EI
        mean_star, _ = self._predict_y_moments(
            model, jnp.asarray(x_star, dtype=default_float()), k_mean,
            num_samples)
        m_abs = float(np.abs(np.asarray(mean_star)).reshape(-1)[0])
        self._scale_value = (
            self.beta * m_abs / ei_star if ei_star > 1e-300 else 1.0
        )
        return self._scale_value

    def _effective_scale(self):
        return 1.0 if self._scale_value is None else self._scale_value

    def run(self, model, x, num_samples=500, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        x = jnp.asarray(x, dtype=default_float())
        mean, var = self._predict_y_moments(model, x, key, num_samples)
        ei = _expected_improvement(self.y_min, mean, var)
        return -(self._effective_scale() * ei - mean)

    def _default_loss_spec(self, model, key, analytic=True, num_samples=500):
        kind, state = _model_state(model)
        scale = jnp.asarray(self._effective_scale(), dtype=default_float())
        return _wb2_loss(kind, num_samples), (state, self.y_min, scale, key)

    def optimize(self, model, bounds, popsize_DE=300, popstd_DE=1.5,
                 iterations_DE=400, init_adam=None, iterations_adam=1000,
                 method="DE", num_samples=500, key=None, analytic=True):
        """``analytic`` accepted-and-ignored, as in :meth:`WB2.optimize`."""
        key = key if key is not None else jax.random.PRNGKey(0)
        key, k_scale = jax.random.split(key)
        self.resolve_scale(model, bounds, key=k_scale)
        return WB2.optimize(self, model, bounds, popsize_DE, popstd_DE,
                            iterations_DE, init_adam, iterations_adam,
                            method, num_samples, key)


class EV_one_constraint(InfillCriteria):
    """Expected violation of one constraint g(x) <= zero_c
    (Infill_criteria.py:235-263)."""

    name = "Expected Violation"

    def __init__(self, zero_c, d):
        super().__init__(d)
        self.zero_c = jnp.asarray(zero_c, dtype=default_float()).reshape(())

    def run(self, model, x, analytic=True, num_samples=100, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        x = jnp.asarray(x, dtype=default_float())
        if analytic:
            S = 500 if model.name == "dgp" else num_samples
            mean, var = self._predict_y_moments(model, x, key, S)
            sigma = _floored_sigma(var)
            z = (mean - self.zero_c) / sigma
            return (mean - self.zero_c) * norm.cdf(z) + sigma * norm.pdf(z)
        F = self._samples(model, x, key, num_samples)
        return jnp.mean(jnp.maximum(F - self.zero_c, 0.0), axis=0)


class EV(InfillCriteria):
    """Stacked expected violations + feasibility-thresholded acquisition
    (Infill_criteria.py:265-316)."""

    name = "Expected Violation"

    def __init__(self, zero_c, d):
        super().__init__(d)
        self.zero_c = np.asarray(zero_c).reshape(-1)

    def run(self, model_C, x, analytic=True, num_samples=100, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        evs = []
        for i, m in enumerate(model_C):
            sub = jax.random.fold_in(key, i)
            evs.append(
                EV_one_constraint(self.zero_c[i], self.d).run(
                    m, x, analytic=analytic, num_samples=num_samples, key=sub
                )
            )
        return jnp.concatenate(evs, axis=1)  # [n, n_c]

    def run_with_IC(self, IC, model_Y, model_C, x, threshold=0.1, analytic=True,
                    num_samples=100, key=None):
        """EI where predicted-feasible, sum(EV)+1e4 penalty elsewhere —
        vectorized replacement of the per-row tf.cond loop
        (Infill_criteria.py:284-289)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        k_ev, k_ei = jax.random.split(key)
        ev = self.run(model_C, x, analytic=analytic, num_samples=num_samples,
                      key=k_ev)
        ev_max = jnp.max(ev, axis=1, keepdims=True)
        ei = IC.run(model_Y, x, key=k_ei)
        penalty = jnp.sum(ev, axis=1, keepdims=True) + 10000.0
        return jnp.where(ev_max > threshold, penalty, ei)

    def optimize_with_IC(self, IC, model_Y, model_C, bounds, threshold=0.1,
                         analytic=True, num_samples=100, popsize_DE=300,
                         popstd_DE=1.5, iterations_DE=400, init_adam=None,
                         iterations_adam=1000, method="DE", key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        key, sub = jax.random.split(key)
        k_ev, k_ei = jax.random.split(sub)
        ic_loss, ic_args = IC._default_loss_spec(model_Y, k_ei)
        kinds, states = zip(*(_model_state(m) for m in model_C))
        loss_fn = _ev_ic_loss(ic_loss, tuple(kinds), analytic, num_samples)
        dtype = default_float()
        args = (ic_args, tuple(states),
                jnp.asarray(self.zero_c, dtype=dtype),
                jnp.asarray(threshold, dtype=dtype), k_ev)
        return self._optimize_box(loss_fn, args, bounds, popsize_DE, popstd_DE,
                                  iterations_DE, init_adam, iterations_adam,
                                  method, key)


class PoF(InfillCriteria):
    """Probability of feasibility P(g(x) <= zero_c), and EI*PoF acquisition.

    The reference implementation is inoperative (run returns None,
    Infill_criteria.py:325-341; run_with_IC references the class object,
    line 345); this is the repaired semantics: maximize EI * prod(PoF_i),
    i.e. minimize -(EI * PoF).
    """

    name = "Probability of feasibility"

    def __init__(self, zero_c, d):
        super().__init__(d)
        self.zero_c = np.asarray(zero_c).reshape(-1)

    def run(self, model_C, x, num_samples=500, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        models = model_C if isinstance(model_C, (list, tuple)) else [model_C]
        x = jnp.asarray(x, dtype=default_float())
        pof = 1.0
        for i, m in enumerate(models):
            sub = jax.random.fold_in(key, i)
            mean, var = self._predict_y_moments(m, x, sub, num_samples)
            pof = pof * norm.cdf((self.zero_c[i] - mean) / _floored_sigma(var))
        return pof  # [n, 1]

    def run_with_IC(self, IC, model_Y, model_C, x, key=None):
        """Clamped to <= 0 before weighting — see :func:`_pof_ic_loss`."""
        key = key if key is not None else jax.random.PRNGKey(0)
        k_pof, k_ei = jax.random.split(key)
        pof = self.run(model_C, x, key=k_pof)
        neg_ei = IC.run(model_Y, x, key=k_ei)  # IC.run returns -EI
        return jnp.minimum(neg_ei, 0.0) * pof  # minimize -(EI * PoF)

    def optimize_with_IC(self, IC, model_Y, model_C, bounds, popsize_DE=300,
                         popstd_DE=1.5, iterations_DE=400, init_adam=None,
                         iterations_adam=1000, method="DE", key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        key, sub = jax.random.split(key)
        k_pof, k_ei = jax.random.split(sub)
        models = model_C if isinstance(model_C, (list, tuple)) else [model_C]
        ic_loss, ic_args = IC._default_loss_spec(model_Y, k_ei)
        kinds, states = zip(*(_model_state(m) for m in models))
        loss_fn = _pof_ic_loss(ic_loss, tuple(kinds), 500)
        args = (ic_args, tuple(states),
                jnp.asarray(self.zero_c, dtype=default_float()), k_pof)
        return self._optimize_box(loss_fn, args, bounds, popsize_DE, popstd_DE,
                                  iterations_DE, init_adam, iterations_adam,
                                  method, key)
