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


def _expected_improvement(y_min, mean, var):
    """EI(x) = (y_min - mu) Phi(z) + sigma phi(z); the reference's
    ``var * N(y_min | mu, sigma)`` equals sigma*phi(z) exactly
    (Infill_criteria.py:32-35)."""
    sigma = jnp.sqrt(var)
    z = (y_min - mean) / sigma
    return (y_min - mean) * norm.cdf(z) + sigma * norm.pdf(z)


class InfillCriteria:
    name = "Infill criteria"

    def __init__(self, d):
        self.d = d
        self.IC_optimized = None
        self.x_opt = None

    # -- model forwards (pure in model params) --------------------------------
    @staticmethod
    def _predict_y_moments(model, x, key, num_samples):
        """Moment-matched predictive-y moments, [n,1] each."""
        if model.name == "gpr":
            return gpr_mod.predict_y(model.params, model.data, x)
        m_s, v_s = dgp_mod.predict_y(model.params, x, key, num_samples)
        return _moment_matched(m_s, v_s)

    @staticmethod
    def _predict_f_moments(model, x, key, num_samples):
        """Moment-matched latent-f moments (EI's analytic dgp branch,
        Infill_criteria.py:39-41)."""
        if model.name == "gpr":
            return gpr_mod.predict_y(model.params, model.data, x)
        m_s, v_s = dgp_mod.predict_f(model.params, x, key, num_samples)
        return _moment_matched(m_s, v_s)

    @staticmethod
    def _samples(model, x, key, num_samples):
        """Last-layer MC samples [S, n, 1]."""
        if model.name == "gpr":
            mean, var = gpr_mod.predict_y(model.params, model.data, x)
            z = jax.random.normal(key, (num_samples,) + mean.shape, mean.dtype)
            return mean[None] + jnp.sqrt(var)[None] * z
        Fs, _, _ = dgp_mod.propagate(model.params, x, key, num_samples)
        return Fs[-1]

    # -- generic DE + Adam optimizer over the sigmoid box map -----------------
    def _optimize_box(
        self, loss_fn, bounds, popsize_DE=300, popstd_DE=1.5, iterations_DE=400,
        init_adam=None, iterations_adam=1000, method="DE", key=None,
    ):
        """loss_fn: [P, d] (in the box) -> [P, 1]; returns x_opt [1, d]."""
        dtype = default_float()
        lw = jnp.broadcast_to(jnp.asarray(bounds[0], dtype=dtype), (self.d,))
        up = jnp.broadcast_to(jnp.asarray(bounds[1], dtype=dtype), (self.d,))
        key = key if key is not None else jax.random.PRNGKey(0)

        def fct(V):
            return loss_fn(sigmoid_box_map(lw, up, V))

        x_opt = None
        if method in ("DE", "DE+Adam"):
            res = de.minimize(
                jax.jit(fct), jnp.zeros((self.d,), dtype=dtype), key,
                population_size=popsize_DE, population_stddev=popstd_DE,
                max_iterations=iterations_DE,
            )
            x_opt = sigmoid_box_map(lw, up, res.position)
            self.IC_optimized = float(res.objective)
        if method in ("Adam", "DE+Adam"):
            if init_adam is not None:
                v0 = inverse_box_map(lw, up, jnp.asarray(init_adam, dtype=dtype))
            elif x_opt is not None:
                v0 = inverse_box_map(lw, up, x_opt)
            else:
                v0 = jnp.zeros((self.d,), dtype=dtype)
            v, obj = de.adam_refine(fct, v0, iterations=iterations_adam)
            x_opt = sigmoid_box_map(lw, up, v)
            self.IC_optimized = float(obj)
        if x_opt is None:
            raise ValueError(f"unknown method {method!r}: use 'DE', 'Adam' or 'DE+Adam'")
        self.x_opt = np.asarray(x_opt)[None, :]  # [1, d]
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

    def optimize(self, model, bounds, popsize_DE=300, popstd_DE=1.5,
                 iterations_DE=400, init_adam=None, iterations_adam=1000,
                 method="DE", analytic=True, num_samples=1000, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        key, sub = jax.random.split(key)
        loss = lambda xb: self.run(model, xb, analytic=analytic,
                                   num_samples=num_samples, key=sub)
        return self._optimize_box(loss, bounds, popsize_DE, popstd_DE,
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

    def optimize(self, model, bounds, popsize_DE=300, popstd_DE=1.5,
                 iterations_DE=400, init_adam=None, iterations_adam=1000,
                 method="DE", num_samples=500, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        key, sub = jax.random.split(key)
        loss = lambda xb: self.run(model, xb, num_samples=num_samples, key=sub)
        return self._optimize_box(loss, bounds, popsize_DE, popstd_DE,
                                  iterations_DE, init_adam, iterations_adam,
                                  method, key)


class WB2S(InfillCriteria):
    """WB2S = scale*EI - mean. The reference's per-point sigmoid scale is
    replaced by an explicit ``scale`` (its GPR branch referenced an undefined
    variable, Infill_criteria.py:198)."""

    name = "WB2S criterion"

    def __init__(self, y_min, d, scale=1.0):
        super().__init__(d)
        self.y_min = jnp.asarray(y_min, dtype=default_float()).reshape(())
        self.scale = scale

    def run(self, model, x, num_samples=500, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        x = jnp.asarray(x, dtype=default_float())
        mean, var = self._predict_y_moments(model, x, key, num_samples)
        ei = _expected_improvement(self.y_min, mean, var)
        return -(self.scale * ei - mean)

    optimize = WB2.optimize


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
            sigma = jnp.sqrt(var)
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
        loss = lambda xb: self.run_with_IC(
            IC, model_Y, model_C, xb, threshold=threshold, analytic=analytic,
            num_samples=num_samples, key=sub,
        )
        return self._optimize_box(loss, bounds, popsize_DE, popstd_DE,
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
            pof = pof * norm.cdf((self.zero_c[i] - mean) / jnp.sqrt(var))
        return pof  # [n, 1]

    def run_with_IC(self, IC, model_Y, model_C, x, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        k_pof, k_ei = jax.random.split(key)
        pof = self.run(model_C, x, key=k_pof)
        neg_ei = IC.run(model_Y, x, key=k_ei)  # IC.run returns -EI
        return neg_ei * pof  # minimize -(EI * PoF)

    def optimize_with_IC(self, IC, model_Y, model_C, bounds, popsize_DE=300,
                         popstd_DE=1.5, iterations_DE=400, init_adam=None,
                         iterations_adam=1000, method="DE", key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        key, sub = jax.random.split(key)
        loss = lambda xb: self.run_with_IC(IC, model_Y, model_C, xb, key=sub)
        return self._optimize_box(loss, bounds, popsize_DE, popstd_DE,
                                  iterations_DE, init_adam, iterations_adam,
                                  method, key)
