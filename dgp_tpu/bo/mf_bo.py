"""Multi-fidelity Bayesian optimization driver (MF-DGP + EI + cost-aware
fidelity selection).

Beyond reference: the reference ships the MF-DGP surrogate
(/root/reference/dgp_dace/models/MF_DGP.py) and a single-fidelity BO loop
(/root/reference/dgp_dace/BO/SO_BO.py) but never the loop that joins them.
``MF_BO`` is that missing driver, with the same conventions as SO_BO/MO_BO:
LHS DoE, a persistent PRNG stream across ``run()`` calls, fresh surrogate
per infill, save/load checkpointing.

Per infill:

1. Train a fresh surrogate on the per-fidelity archives (pooled output
   normalization so the cross-fidelity structure is preserved).
   ``model_dic['type']`` picks the form: ``'ar1'`` = exact AR(1)
   co-kriging (:mod:`~dgp_tpu.models.cokriging`, Kennedy & O'Hagan),
   ``'nargp'`` = nonlinear autoregressive GP (:mod:`~dgp_tpu.models.nargp`,
   Perdikaris et al. 2017), or ``'mf_dgp'`` / no ``'type'`` key = the
   reference's :class:`~dgp_tpu.models.mf_dgp.MultiFidelityDeepGP`.
2. Maximize EI on the **highest-fidelity** latent posterior over the unit
   box (the jitted DE engines of ``bo/acquisition.py`` — ``MF_BO`` adds the
   ``mf_dgp`` dispatch there).
3. Pick the evaluation fidelity by the cost-aware information rule of
   MF-GP-UCB/BOCA (Kandasamy et al. 2016/2017): evaluate the *lowest*
   fidelity f whose posterior std at the proposal still exceeds
   ``gamma * sqrt(cost_f / cost_top)`` — query cheap sources while they are
   informative, escalate to the expensive one once they are resolved.

The inducing inputs are pinned to the initial DoE (``Z = X_doe`` per
fidelity) so the surrogate's parameter shapes — and therefore every jitted
training/EI engine — stay compile-stable as the archives grow; data rows
are bucket-padded by the model's own ``n_bucket`` machinery.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from .doe import lhs

#: Default surrogate, picked by the measured bake-off
#: (benchmarks/mf_bo_bakeoff.json, v5e): exact AR(1) co-kriging reaches the
#: Forrester optimum to regret <5e-5 on 3/3 seeds where the variational
#: MF-DGP strands 2/3 seeds at regret ~5 (its tiny-n posterior collapses
#: overconfident — models/cokriging.py docstring), ties or wins Park, and
#: is faster everywhere. The reference's MF-DGP surrogate stays one
#: ``model_dic`` away: any dict without ``'type'`` (e.g.
#: ``{"num_samples": 5, "schedule": (200, 200, 400)}``) selects it.
DEFAULT_MODEL_DIC = {"type": "ar1", "n_starts": 8, "iterations": 2000}


class MF_BO:
    """Single-objective minimization over [0, 1]^d with a choice of
    information sources (fidelities) per evaluation.

    :param fidelities: list of callables low -> high, each mapping
        [n, d] -> [n, 1] on the unit box (``utils.test_functions``
        convention; the last entry is the objective being minimized).
    :param costs: per-fidelity evaluation costs, ascending with fidelity;
        defaults to a 10x-per-level geometric ladder ending at 1.0.
    :param DoE_sizes: per-fidelity LHS DoE sizes (low -> high), e.g.
        (20, 5); more low-fidelity points is the standard MF design.
    :param X, Y: optional known per-fidelity archives instead of a DoE.
    :param d: input dimension (required when generating a DoE).
    :param model_dic: surrogate spec (:data:`DEFAULT_MODEL_DIC`).
        ``{'type': 'ar1', 'n_starts': k, 'iterations': n, 'lr': r,
        'kernel': 'rbf'|'matern32'|'matern52'}`` = exact AR(1) co-kriging
        (the measured default); ``{'type': 'nargp', ...same keys...,
        'num_samples': S}`` = nonlinear autoregressive GP (for nonlinear
        cross-fidelity maps); ``{'num_samples': S,
        'schedule': (it1, it2, it3)}`` (no ``'type'``) = the reference's
        MF-DGP surrogate.
    :param gamma: fidelity-selection threshold in normalized output units —
        evaluate the lowest fidelity f with
        sigma_f(x*) >= gamma * sqrt(cost_f / cost_top), else the highest.
        0 always queries the lowest *non-duplicate* fidelity, ``inf``
        always the highest (re-querying a deterministic source at an
        already-evaluated point is skipped regardless of gamma — see
        :meth:`_select_fidelity`).
    :param dup_tol: duplicate-escalation tolerance (relative to sqrt(d));
        a fidelity whose archive already holds a point within
        ``dup_tol*sqrt(d)`` of the proposal is skipped. 0 disables the
        guard (pure BOCA gamma rule).
    """

    def __init__(self, fidelities: Sequence = None, costs=None,
                 DoE_sizes=None, X=None, Y=None, d: Optional[int] = None,
                 model_dic: Optional[dict] = None,
                 seed: Optional[int] = None, n_bucket: Optional[int] = 8,
                 gamma: float = 0.3, dup_tol: float = 1e-3):
        if not fidelities or len(fidelities) < 2:
            raise ValueError("fidelities must list >= 2 callables, low->high")
        self.fidelities = list(fidelities)
        self.n_fid = len(self.fidelities)
        if costs is None:
            costs = [10.0 ** (f - (self.n_fid - 1))
                     for f in range(self.n_fid)]
        self.costs = [float(c) for c in costs]
        if len(self.costs) != self.n_fid or any(
                a > b for a, b in zip(self.costs, self.costs[1:])):
            raise ValueError("costs must be ascending, one per fidelity")
        self.model_dic = dict(DEFAULT_MODEL_DIC if model_dic is None
                              else model_dic)
        self.gamma = float(gamma)
        self.dup_tol = float(dup_tol)
        self.n_bucket = n_bucket
        self._seed = seed

        if X is None:
            if DoE_sizes is None or d is None:
                raise ValueError(
                    "You have to specify either (DoE_sizes, d) to generate "
                    "a DoE or known per-fidelity archives (X, Y)")
            if len(DoE_sizes) != self.n_fid:
                raise ValueError("one DoE size per fidelity")
            X = [lhs(d, n, seed=None if seed is None else seed + f)
                 for f, n in enumerate(DoE_sizes)]
            Y = [np.asarray(self.fidelities[f](X[f]), dtype=float)
                 .reshape(-1, 1) for f in range(self.n_fid)]
        else:
            X = [np.array(x, copy=True) for x in X]
            Y = [np.array(y, copy=True).reshape(-1, 1) for y in Y]
        self.X = X
        self.Y = Y
        self.d = X[0].shape[1]
        # inducing inputs pinned to the DoE: parameter shapes stay stable
        # across infills (see module docstring)
        self._Z0 = [x.copy() for x in X]

        import jax

        self._run_key = jax.random.PRNGKey(seed or 0)
        self._iteration = 0
        self.cost_spent: float = 0.0
        self.best_trace: List[float] = [float(np.min(self.Y[-1]))]
        self.cost_trace: List[float] = [0.0]
        self.fidelity_choices: List[int] = []

    # -- helpers ----------------------------------------------------------------
    def _next_run_key(self):
        import jax

        self._run_key, sub = jax.random.split(self._run_key)
        return sub

    def _normalized_Y(self):
        """Per-fidelity archives under ONE pooled normalization (mean/std
        over all fidelities' observations) + the stats. A per-fidelity
        normalization would distort the cross-fidelity mapping the MF-DGP
        layers model."""
        pooled = np.vstack(self.Y)
        mu, sd = float(pooled.mean()), float(pooled.std() or 1.0)
        return [(y - mu) / sd for y in self.Y], mu, sd

    def make_model(self, Ys_n, seed):
        """Untrained surrogate per ``model_dic['type']``: ``'ar1'`` = exact
        AR(1) co-kriging (models/cokriging.py); ``'nargp'`` = nonlinear
        autoregressive GP (models/nargp.py — for nonlinear cross-fidelity
        maps an AR(1) cannot represent); ``'mf_dgp'`` or a dict without
        ``'type'`` = the reference's MF-DGP surrogate."""
        kind = self.model_dic.get("type", "mf_dgp")
        if kind == "ar1":
            from ..models.cokriging import AR1CoKriging

            return AR1CoKriging(
                (self.X, Ys_n), n_bucket=self.n_bucket,
                kernel=self.model_dic.get("kernel", "rbf"))
        if kind == "nargp":
            from ..models.nargp import NARGP

            return NARGP(
                (self.X, Ys_n), n_bucket=self.n_bucket,
                kernel=self.model_dic.get("kernel", "rbf"),
                num_samples=int(self.model_dic.get("num_samples", 100)),
                seed=seed)
        if kind != "mf_dgp":
            raise ValueError(f"unknown surrogate type {kind!r}")
        from ..models.mf_dgp import MultiFidelityDeepGP

        return MultiFidelityDeepGP(
            self.X, Ys_n, Z=[z.copy() for z in self._Z0],
            num_samples=int(self.model_dic.get("num_samples", 5)),
            seed=seed, n_bucket=self.n_bucket)

    def _fit_model(self, Ys_n, seed):
        """Build + train one fresh surrogate on the current archives."""
        model = self.make_model(Ys_n, seed=seed)
        if self.model_dic.get("type", "mf_dgp") in ("ar1", "nargp"):
            model.optimize(
                n_starts=int(self.model_dic.get("n_starts", 8)),
                iterations=int(self.model_dic.get("iterations", 2000)),
                lr=float(self.model_dic.get("lr", 0.05)), seed=seed)
        else:
            sched = self.model_dic.get("schedule", (200, 200, 400))
            model.optimize_nat_adam(
                iterations1=sched[0], iterations2=sched[1],
                iterations3=sched[2], messages=0)
        return model

    def _select_fidelity(self, model, x_new, S=100):
        """BOCA-style rule: lowest fidelity still informative at x_new
        (posterior std >= gamma * sqrt(cost ratio)), else the highest —
        with a duplicate-escalation guard: the sources are deterministic,
        so re-querying a fidelity within ``dup_tol`` (relative to sqrt(d))
        of one of its existing points adds zero information; escalate past
        it. Without the guard a deceptive low-fidelity minimum can sink the
        whole budget into repeats of the same cheap point (observed on the
        Forrester pair: the low function's minimum at x~0.092 is far from
        the high function's at 0.757)."""
        from ..models.dgp import moment_matched

        tol = self.dup_tol * np.sqrt(self.d)

        def _is_dup(f):
            return bool(np.min(np.linalg.norm(
                self.X[f] - x_new.reshape(1, -1), axis=1)) < tol)

        for f in range(self.n_fid - 1):
            if _is_dup(f):
                continue
            m_s, v_s = model.predict_f(x_new, S=S, fidelity=f)
            _, var = moment_matched(m_s, v_s)
            sigma = float(np.sqrt(max(float(np.max(var)), 0.0)))
            if sigma >= self.gamma * np.sqrt(
                    self.costs[f] / self.costs[-1]):
                return f
        return self.n_fid - 1

    # -- the loop ---------------------------------------------------------------
    def run(self, iterations=1, IC="EI", popsize_DE=300, iterations_DE=400,
            num_samples=500, verbose=True):
        """``iterations`` infills; returns the best observed
        highest-fidelity value after each infill (index 0 = DoE best).

        Infills evaluated at a lower fidelity do not change the best trace
        (they refine the surrogate); their cost is still accounted in
        ``cost_trace``.
        """
        for _ in range(iterations):
            it = self._iteration
            x_new, f = self._propose(IC=IC, popsize_DE=popsize_DE,
                                     iterations_DE=iterations_DE,
                                     num_samples=num_samples)
            y_new = np.asarray(self.fidelities[f](x_new),
                               dtype=float).reshape(1, 1)
            self.observe(x_new, y_new, f)
            if verbose:
                print(f"infill {it}: x={np.round(x_new.ravel(), 4)} "
                      f"fidelity={f} y={y_new.item():.4f} "
                      f"best_hf={self.best_trace[-1]:.4f} "
                      f"cost={self.cost_spent:.2f}", flush=True)
        return list(self.best_trace)

    def _propose(self, IC="EI", popsize_DE=300, iterations_DE=400,
                 num_samples=500):
        """One acquisition round: fit a fresh surrogate, maximize the infill
        criterion (``IC`` in EI/WB2/WB2S, SO_BO's menu) on the top-fidelity
        posterior, pick the query fidelity (BOCA rule + duplicate-escalation
        guard). Returns ``(x_new [1, d], fidelity)`` without evaluating or
        touching the archives."""
        from .acquisition import EI, WB2, WB2S

        it = self._iteration
        Ys_n, mu, sd = self._normalized_Y()
        model = self._fit_model(Ys_n, seed=it)

        y_min_n = float((np.min(self.Y[-1]) - mu) / sd)
        if IC == "EI":
            ic = EI(y_min_n, self.d)
        elif IC == "WB2":
            ic = WB2(y_min_n, self.d)
        elif IC == "WB2S":
            ic = WB2S(y_min_n, self.d)
        else:
            raise ValueError(f"unknown IC {IC!r}")
        if isinstance(ic, WB2S):
            ic.resolve_scale(model, (0.0, 1.0), key=self._next_run_key())
        x_new = ic.optimize(
            model, bounds=(0.0, 1.0), popsize_DE=popsize_DE,
            iterations_DE=iterations_DE, num_samples=num_samples,
            key=self._next_run_key())
        x_new = np.clip(np.asarray(x_new).reshape(1, self.d), 0.0, 1.0)
        return x_new, self._select_fidelity(model, x_new)

    # -- ask/tell interface ---------------------------------------------------------
    def suggest(self, **propose_kwargs):
        """Ask/tell interface, step 1 (beyond reference): return the next
        query as ``(x_new [1, d], fidelity)`` WITHOUT evaluating the source
        — for external/asynchronous evaluation. Feed the result back with
        :meth:`observe`. Accepts :meth:`_propose`'s keyword arguments
        (``IC``, ``popsize_DE``, ``iterations_DE``, ``num_samples``);
        shares the infill counter and PRNG stream with ``run``."""
        return self._propose(**propose_kwargs)

    def observe(self, x_new, y_new, fidelity):
        """Ask/tell interface, step 2: append one externally evaluated
        observation at ``fidelity``, account its cost, and advance the
        infill counter. Lower-fidelity observations refine the surrogate
        but do not change the best-high-fidelity trace."""
        f = int(fidelity)
        if not 0 <= f < self.n_fid:
            raise ValueError(f"fidelity must be in [0, {self.n_fid - 1}]")
        x_new = np.asarray(x_new, dtype=float).reshape(1, self.d)
        y_new = np.asarray(y_new, dtype=float).reshape(1, 1)
        self.X[f] = np.vstack([self.X[f], x_new])
        self.Y[f] = np.vstack([self.Y[f], y_new])
        self.fidelity_choices.append(f)
        self.cost_spent += self.costs[f]
        self.best_trace.append(float(np.min(self.Y[-1])))
        self.cost_trace.append(self.cost_spent)
        self._iteration += 1
        return list(self.best_trace)

    @property
    def x_best(self):
        """Best observed highest-fidelity input."""
        i = int(np.argmin(self.Y[-1]))
        return self.X[-1][i]

    # -- checkpoint / resume -----------------------------------------------------
    def save(self, path: str):
        import json
        import os

        state = {
            "n_fid": np.asarray(self.n_fid),
            "costs": np.asarray(self.costs),
            "gamma": np.asarray(self.gamma),
            "dup_tol": np.asarray(self.dup_tol),
            "seed": np.asarray(self._seed if self._seed is not None else -1),
            "iteration": np.asarray(self._iteration),
            "n_bucket": np.asarray(self.n_bucket or 0),
            "run_key": np.asarray(self._run_key),
            "cost_spent": np.asarray(self.cost_spent),
            "best_trace": np.asarray(self.best_trace),
            "cost_trace": np.asarray(self.cost_trace),
            "fidelity_choices": np.asarray(self.fidelity_choices,
                                           dtype=int),
            "model_dic": np.asarray(json.dumps(self.model_dic)),
        }
        for f in range(self.n_fid):
            state[f"X{f}"] = self.X[f]
            state[f"Y{f}"] = self.Y[f]
            state[f"Z{f}"] = self._Z0[f]
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            np.savez(fh, **state)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str, fidelities, model_dic=None):
        """Restore a saved loop; ``fidelities`` are the (unpicklable)
        callables, everything else comes from the checkpoint."""
        import jax
        import json

        data = np.load(path)
        n_fid = int(data["n_fid"])
        if len(fidelities) != n_fid:
            raise ValueError(f"checkpoint has {n_fid} fidelities")
        seed = int(data["seed"])
        if model_dic is None:
            model_dic = json.loads(str(data["model_dic"]))
            if isinstance(model_dic.get("schedule"), list):
                model_dic["schedule"] = tuple(model_dic["schedule"])
        bo = cls(fidelities=fidelities,
                 costs=[float(c) for c in data["costs"]],
                 X=[data[f"X{f}"] for f in range(n_fid)],
                 Y=[data[f"Y{f}"] for f in range(n_fid)],
                 model_dic=model_dic,
                 seed=None if seed == -1 else seed,
                 n_bucket=int(data["n_bucket"]) or None,
                 gamma=float(data["gamma"]),
                 dup_tol=(float(data["dup_tol"])
                          if "dup_tol" in data.files else 1e-3))
        bo._Z0 = [np.asarray(data[f"Z{f}"]) for f in range(n_fid)]
        bo._run_key = jax.numpy.asarray(data["run_key"])
        bo._iteration = int(data["iteration"])
        bo.cost_spent = float(data["cost_spent"])
        bo.best_trace = [float(v) for v in data["best_trace"]]
        bo.cost_trace = [float(v) for v in data["cost_trace"]]
        bo.fidelity_choices = [int(v) for v in data["fidelity_choices"]]
        return bo
