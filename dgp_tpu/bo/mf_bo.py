"""Multi-fidelity Bayesian optimization driver (MF surrogates + EI +
cost-aware fidelity selection).

Beyond reference: the reference ships the MF-DGP surrogate
(/root/reference/dgp_dace/models/MF_DGP.py) and a single-fidelity BO loop
(/root/reference/dgp_dace/BO/SO_BO.py) but never the loop that joins them.
``MF_BO`` is that missing driver, with the same conventions as SO_BO/MO_BO:
LHS DoE, a persistent PRNG stream across ``run()`` calls, batch (q-point)
infill with believer lies, pending-aware asynchronous ask/tell, constraint
handling, save/load checkpointing.

Per infill:

1. Train a fresh surrogate on the per-fidelity archives (pooled output
   normalization so the cross-fidelity structure is preserved).
   ``model_dic['type']`` picks the form: ``'ar1'`` = exact AR(1)
   co-kriging (:mod:`~dgp_tpu.models.cokriging`, Kennedy & O'Hagan),
   ``'nargp'`` = nonlinear autoregressive GP (:mod:`~dgp_tpu.models.nargp`,
   Perdikaris et al. 2017), ``'em'`` = the reference's embedded-mapping
   MF-DGP (:mod:`~dgp_tpu.models.mf_dgp_em`, for fidelity stacks whose
   input spaces have DIFFERENT dimensions), or ``'mf_dgp'`` / no ``'type'``
   key = the reference's :class:`~dgp_tpu.models.mf_dgp.MultiFidelityDeepGP`.
2. Maximize the infill criterion on the **highest-fidelity** latent
   posterior over the unit box (the jitted DE engines of
   ``bo/acquisition.py``). Constrained problems (``constraints=[g_i]``,
   g_i(x) <= 0 feasible, evaluated in the top-fidelity input space)
   combine it with 'EV' or 'PoF' handling over per-constraint exact-GPR
   surrogates trained on ALL queried points — the reference handles
   constraints only in SO_BO.
3. Pick the evaluation fidelity by the cost-aware information rule of
   MF-GP-UCB/BOCA (Kandasamy et al. 2016/2017): evaluate the *lowest*
   fidelity f whose posterior std at the proposal still exceeds
   ``gamma * sqrt(cost_f / cost_top)`` — query cheap sources while they are
   informative, escalate to the expensive one once they are resolved.

With ``batch_size=q`` (or across ``suggest()`` calls, via the pending
registry) the surrogate is conditioned on a believer lie between picks:
the fantasized observation (posterior mean at the pick's chosen fidelity)
is appended to the surrogate's data — exact posterior conditioning for the
AR1/NARGP forms — and, when the pick targets the top fidelity and is
predicted feasible, the in-batch EI incumbent drops with it (Kriging
Believer, Ginsbourger et al. 2010). Real archives record only real
evaluations.

The inducing inputs are pinned to the initial DoE (``Z = X_doe`` per
fidelity) so the variational surrogates' parameter shapes — and therefore
every jitted training/EI engine — stay compile-stable as the archives
grow; data rows are bucket-padded by the model's own ``n_bucket``
machinery.
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
        [n, d_f] -> [n, 1] on the unit box (``utils.test_functions``
        convention; the last entry is the objective being minimized).
        With the ``'em'`` surrogate the per-fidelity input dimensions
        may differ — see ``projections``.
    :param costs: per-fidelity evaluation costs, ascending with fidelity;
        defaults to a 10x-per-level geometric ladder ending at 1.0.
    :param DoE_sizes: per-fidelity LHS DoE sizes (low -> high), e.g.
        (20, 5); more low-fidelity points is the standard MF design.
        Variant-dimension ('em') stacks must pass explicit archives
        (X, Y) instead.
    :param X, Y: optional known per-fidelity archives instead of a DoE.
    :param d: input dimension (required when generating a DoE).
    :param model_dic: surrogate spec (:data:`DEFAULT_MODEL_DIC`).
        ``{'type': 'ar1', 'n_starts': k, 'iterations': n, 'lr': r,
        'kernel': 'rbf'|'matern32'|'matern52'}`` = exact AR(1) co-kriging
        (the measured default); ``{'type': 'nargp', ...same keys...,
        'num_samples': S}`` = nonlinear autoregressive GP (for nonlinear
        cross-fidelity maps); ``{'type': 'em', 'num_samples': S,
        'schedule': (it1, it2, it3)}`` = the embedded-mapping MF-DGP for
        variant-input-dimension fidelity stacks (reference
        MF_DGP_EM.py:383; two fidelities); ``{'num_samples': S,
        'schedule': (it1, it2, it3)}`` (no ``'type'``) = the reference's
        MF-DGP surrogate.
    :param constraints: optional list of callables g_i mapping [n, d] ->
        [n]/[n, 1] values in the TOP-fidelity input space, feasible iff
        g_i(x) <= 0. They are evaluated at every queried point (whatever
        its fidelity) and modeled by per-constraint exact GPRs on the
        pooled archive; the acquisition becomes EV- or PoF-handled EI and
        ``best_trace`` tracks the best FEASIBLE top-fidelity value (the
        top-fidelity maximum while none is feasible, SO_BO's convention).
        Not supported together with variant-dimension ('em') stacks.
    :param model_C_dic: constraint-surrogate spec,
        ``{'kernels': 'rbf', 'iterations': 2000}`` default.
    :param C: optional known per-fidelity constraint-value arrays aligned
        with ``X`` (used by :meth:`load`); omitted, the constraints are
        evaluated at the archive points once at construction.
    :param projections: per-lower-fidelity callables mapping top-space
        [n, d] rows to that fidelity's own input space [n, d_f] (e.g.
        ``lambda x: x[:, :2]`` for Park_VD). Required to QUERY lower
        fidelities of a variant-dimension stack (and to build the 'em'
        surrogate's X_red supervision); identity when omitted for
        shared-dimension stacks.
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
                 constraints: Optional[Sequence] = None,
                 model_C_dic: Optional[dict] = None, C=None,
                 projections: Optional[Sequence] = None,
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
        self.constraints = list(constraints or [])
        self.n_con = len(self.constraints)
        self.model_C_dic = dict(model_C_dic
                                or {"kernels": "rbf", "iterations": 2000})
        self.projections = list(projections) if projections else None
        if (self.projections is not None
                and len(self.projections) != self.n_fid - 1):
            raise ValueError(
                f"projections must have one entry per lower fidelity "
                f"({self.n_fid - 1}), got {len(self.projections)}")
        self.gamma = float(gamma)
        self.dup_tol = float(dup_tol)
        self.n_bucket = n_bucket
        self._seed = seed

        kind = self.model_dic.get("type", "mf_dgp")
        if kind == "em" and self.n_fid != 2:
            raise ValueError(
                "the 'em' surrogate supports exactly 2 fidelities "
                "(reference MF_DGP_EM scope)")
        if X is None:
            if DoE_sizes is None or d is None:
                raise ValueError(
                    "You have to specify either (DoE_sizes, d) to generate "
                    "a DoE or known per-fidelity archives (X, Y)")
            if len(DoE_sizes) != self.n_fid:
                raise ValueError("one DoE size per fidelity")
            # DoEs are drawn in each fidelity's QUERY space: top space
            # projected down for variant-dimension stacks (identity
            # otherwise), so archives always hold source-native coords
            X = []
            for f, n in enumerate(DoE_sizes):
                x_top = lhs(d, n, seed=None if seed is None else seed + f)
                X.append(np.asarray(self._project(x_top, f)))
            Y = [np.asarray(self.fidelities[f](X[f]), dtype=float)
                 .reshape(-1, 1) for f in range(self.n_fid)]
        else:
            X = [np.array(x, copy=True) for x in X]
            Y = [np.array(y, copy=True).reshape(-1, 1) for y in Y]
        self.X = X
        self.Y = Y
        self.d = X[-1].shape[1]
        dims = {x.shape[1] for x in X}
        if len(dims) > 1:
            if kind != "em":
                raise ValueError(
                    "per-fidelity input dimensions differ — that needs the "
                    "embedded-mapping surrogate (model_dic={'type': 'em'})")
            if self.n_con:
                raise ValueError(
                    "constraints are not supported with variant-dimension "
                    "('em') fidelity stacks")
        # per-fidelity constraint archives aligned with X[f] rows; known
        # values (``C=`` — e.g. a checkpoint resume) are taken as-is so a
        # load never re-runs potentially expensive constraint callables
        # over the whole archive
        if not self.n_con:
            self.C = None
        elif C is not None:
            self.C = [np.array(c, copy=True).reshape(len(x), -1)
                      for c, x in zip(C, self.X)]
        else:
            self.C = [self._eval_cons(x) for x in self.X]
        # inducing inputs pinned to the DoE: parameter shapes stay stable
        # across infills (see module docstring)
        self._Z0 = [x.copy() for x in X]

        import jax

        self._run_key = jax.random.PRNGKey(seed or 0)
        self._iteration = 0
        self.cost_spent: float = 0.0
        self.best_trace: List[float] = [self._best_feasible()]
        self.cost_trace: List[float] = [0.0]
        self.fidelity_choices: List[int] = []
        # pending-point registry (asynchronous ask/tell, as SO_BO/MO_BO):
        # top-space rows + chosen fidelities suggested but not yet
        # observed; they persist as believer lies across suggest() calls
        # and survive save/load
        self.pending_X = np.zeros((0, self.d))
        self.pending_f = np.zeros((0,), dtype=int)
        self._batch_open = False
        self._bstate = None
        self._n_lied = 0

    # -- helpers ----------------------------------------------------------------
    def _next_run_key(self):
        import jax

        self._run_key, sub = jax.random.split(self._run_key)
        return sub

    def _project(self, x_top, f):
        """Top-space [n, d] -> fidelity f's own query coordinates."""
        x_top = np.asarray(x_top, dtype=float)
        if f == self.n_fid - 1 or self.projections is None:
            return x_top
        return np.asarray(self.projections[f](x_top), dtype=float)

    def _eval_cons(self, X_rows):
        """[n, n_con] constraint values at top-space rows (<= 0 feasible)."""
        return np.hstack([
            np.asarray(g(X_rows), dtype=float).reshape(len(X_rows), 1)
            for g in self.constraints])

    def _best_feasible(self):
        """Best observed top-fidelity value; with constraints, the best
        FEASIBLE one (the top-fidelity max while none is feasible —
        SO_BO.feasible's convention)."""
        y_top = self.Y[-1]
        if self.n_con:
            feas = self.C[-1].max(axis=1) <= 0
            if feas.any():
                return float(y_top[feas].min())
            return float(y_top.max())
        return float(np.min(y_top))

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
        maps an AR(1) cannot represent); ``'em'`` = the embedded-mapping
        MF-DGP (models/mf_dgp_em.py — variant input dims); ``'mf_dgp'`` or
        a dict without ``'type'`` = the reference's MF-DGP surrogate."""
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
        if kind == "em":
            from ..models.mf_dgp_em import MultiFidelityDeepGP_EM

            if self.projections is None and self.X[0].shape[1] != self.d:
                raise ValueError(
                    "variant-dimension 'em' stacks need projections= to "
                    "supervise the reduction layers (X_red)")
            # X_red = the given projections of the top-fidelity inputs
            # into each lower space (reference MF_DGP_EM.py:400-405,
            # nb_mfdgpem cell 8 uses X[1][:, :2])
            X_red = [self._project(self.X[-1], f)
                     for f in range(self.n_fid - 1)]
            return MultiFidelityDeepGP_EM(
                self.X, Ys_n, X_red=X_red, Z=[z.copy() for z in self._Z0],
                num_samples=int(self.model_dic.get("num_samples", 5)),
                seed=seed, n_bucket=self.n_bucket)
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

    def _make_train_con_models(self):
        """Per-infill constraint surrogates: one exact GPR per constraint
        on the POOLED archive (every queried point, whatever its fidelity —
        constraints are fidelity-free), plus the feasibility threshold in
        normalized space. (None, None) for unconstrained problems."""
        if not self.n_con:
            return None, None
        from .so_bo import make_single_model, normalize

        X_all = np.vstack(self.X)
        model_C, zero_n = [], []
        for i in range(self.n_con):
            c = np.vstack([cf[:, i:i + 1] for cf in self.C])
            spec = {"num_layers": 0,
                    "kernels": self.model_C_dic.get("kernels", "rbf")}
            m = make_single_model(spec, X_all, normalize(c),
                                  n_bucket=self.n_bucket, seed=self._seed)
            m.optimize_adam(
                iterations=int(self.model_C_dic.get("iterations", 2000)),
                lr=0.001)
            model_C.append(m)
            zero_n.append(float((0.0 - c.mean()) / _col_std(c)))
        return model_C, np.asarray(zero_n)

    def _select_fidelity(self, model, x_new, S=100, extra_queries=()):
        """BOCA-style rule: lowest fidelity still informative at x_new
        (posterior std >= gamma * sqrt(cost ratio)), else the highest —
        with a duplicate-escalation guard: the sources are deterministic,
        so re-querying a fidelity within ``dup_tol`` (relative to sqrt(d))
        of one of its existing points adds zero information; escalate past
        it. Without the guard a deceptive low-fidelity minimum can sink the
        whole budget into repeats of the same cheap point (observed on the
        Forrester pair: the low function's minimum at x~0.092 is far from
        the high function's at 0.757). ``extra_queries`` — (row, fidelity)
        pairs in query coordinates — extends the guard to in-flight
        pending points and earlier in-batch picks, which are committed
        queries the archive does not hold yet."""
        from ..models.dgp import moment_matched

        def _is_dup(f):
            xq = self._project(x_new, f).reshape(1, -1)
            tol = self.dup_tol * np.sqrt(xq.shape[1])
            rows = [self.X[f]] + [np.asarray(r).reshape(1, -1)
                                  for r, fe in extra_queries if fe == f]
            return bool(min(
                float(np.min(np.linalg.norm(block - xq, axis=1)))
                for block in rows) < tol)

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

    # -- batch / pending conditioning --------------------------------------------
    def clear_pending(self):
        """Drop all outstanding suggested-but-unobserved points; their
        believer lies stop conditioning future proposals at the next
        fresh surrogate fit."""
        self.pending_X = np.zeros((0, self.d))
        self.pending_f = np.zeros((0,), dtype=int)
        self._batch_open = False
        self._bstate = None
        self._n_lied = 0

    def _archive_changed(self):
        self._batch_open = False
        self._bstate = None
        self._n_lied = 0

    def _lie_value(self, st, x_new, f, lie):
        """The fantasized (normalized-units) observation at ``x_new`` for
        fidelity ``f``: the surrogate's believer mean, or the constant
        liar's min/max of that fidelity's normalized archive."""
        from ..models.dgp import moment_matched

        if lie == "believer":
            m_s, v_s = st["model"].predict_f(x_new, S=64, fidelity=f)
            m, _ = moment_matched(np.asarray(m_s), np.asarray(v_s))
            return float(np.asarray(m).reshape(-1)[0])
        y_f_n = (np.asarray(self.Y[f]) - st["mu"]) / st["sd"]
        if lie == "min":
            return float(y_f_n.min())
        if lie == "max":
            return float(y_f_n.max())
        raise ValueError(f"unknown lie {lie!r}")

    def _lie_at(self, st, x_new, f, lie, lie_train_iterations):
        """Condition the batch state on a fantasized observation at
        (``x_new`` top-space [1, d], fidelity ``f``): append the lie row to
        the surrogate's level-f data (exact posterior conditioning for the
        AR1/NARGP forms; for the variational forms the rows enter the data
        terms and only move the posterior through the optional
        ``lie_train_iterations`` phase-3 refit), condition the constraint
        GPRs on their believer means, and — when the pick targets the top
        fidelity and is predicted feasible — drop the in-batch EI incumbent
        to the believed value (Kriging Believer)."""
        import jax.numpy as jnp

        from ..config import default_float

        dt = default_float()
        model = st["model"]
        x_new = np.asarray(x_new, dtype=float).reshape(1, self.d)
        xq = self._project(x_new, f)
        y_lie_n = self._lie_value(st, x_new, f, lie)

        if model.name in ("ar1", "nargp"):
            Xs, Ys = model.data
            Xs = list(Xs)
            Ys = list(Ys)
            Xs[f] = jnp.concatenate(
                [Xs[f], jnp.asarray(xq, dtype=dt)], axis=0)
            Ys[f] = jnp.concatenate(
                [Ys[f], jnp.asarray([[y_lie_n]], dtype=dt)], axis=0)
            model.data = (tuple(Xs), tuple(Ys))
        else:
            # variational wrappers hold per-fidelity _X/_Y lists read as
            # traced args by their engines (bucket-padded rows keep the
            # compiled shapes while the bucket is not crossed)
            model._X[f] = jnp.concatenate(
                [model._X[f], jnp.asarray(xq, dtype=dt)], axis=0)
            model._Y[f] = jnp.concatenate(
                [model._Y[f], jnp.asarray([[y_lie_n]], dtype=dt)], axis=0)
            if model.name == "mf_dgp_EM" and f == self.n_fid - 1:
                # a top-fidelity row also supervises the reduction chain
                for r in range(self.n_fid - 1):
                    model._X_red[r] = jnp.concatenate(
                        [model._X_red[r],
                         jnp.asarray(self._project(x_new, r), dtype=dt)],
                        axis=0)
            # an SVGP posterior only moves through training, so a lie
            # without a refit would be a posterior NO-OP and the next pick
            # could re-propose the same point — default to a short WARM
            # Adam refit like SO_BO/MO_BO's DGP lies (200 steps). The
            # staged trainers cannot be used here: optimize_nat_adam
            # unconditionally runs _init_variational first (q_mu <- Y,
            # q_sqrt *= 1e-2*var, likelihood reset), which would wreck the
            # trained posterior mid-batch — so run training.adam_run
            # directly on the current params (the loo_probe._warm_refit
            # pattern).
            iters = 200 if lie_train_iterations is None \
                else lie_train_iterations
            if iters:
                from ..models import training as training_mod

                loss_fn, batch = model._loss_spec()
                mask = training_mod.make_mask(model.params)
                model.params, _ = training_mod.adam_run(
                    loss_fn, model.params, mask, model._next_key(),
                    steps=iters, lr=0.01, messages=0, data=batch)

        feasible_lie = True
        if st["model_C"]:
            from .so_bo import fantasy_mean

            for i, m in enumerate(st["model_C"]):
                c_lie = fantasy_mean(m, x_new)
                feasible_lie &= bool(float(c_lie[0, 0]) <= st["zero_n"][i])
                Xt = np.vstack([np.asarray(m.data[0]), x_new])
                Yt = np.vstack([np.asarray(m.data[1]), c_lie])
                m.data = (jnp.asarray(Xt, dtype=dt), jnp.asarray(Yt, dtype=dt))
        if f == self.n_fid - 1 and feasible_lie:
            st["ic"].y_min = jnp.minimum(st["ic"].y_min, y_lie_n)

    def _build_ic(self, IC, mu, sd, model):
        """The incumbent-bearing IC object in pooled-normalized units."""
        from .acquisition import EI, WB2, WB2S

        y_min_n = float((self._best_feasible() - mu) / sd)
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
        return ic

    def _fresh_batch_state(self, IC):
        """Fit a fresh surrogate + constraint models on the real archives
        and freeze the batch state (pooled normalization stats + the
        incumbent-bearing IC object)."""
        it = self._iteration
        Ys_n, mu, sd = self._normalized_Y()
        model = self._fit_model(Ys_n, seed=it)
        model_C, zero_n = self._make_train_con_models()
        st = dict(model=model, model_C=model_C, zero_n=zero_n,
                  mu=mu, sd=sd)
        st["ic"] = self._build_ic(IC, mu, sd, model)
        return st

    # -- the loop ---------------------------------------------------------------
    def run(self, iterations=1, IC="EI", popsize_DE=300, iterations_DE=400,
            num_samples=500, batch_size=1, lie="believer",
            lie_train_iterations=None, constraint_handling="PoF",
            threshold=0.1, verbose=True):
        """``iterations`` infill rounds of ``batch_size`` picks each;
        returns the best observed (feasible) highest-fidelity value after
        each evaluation (index 0 = DoE best).

        Infills evaluated at a lower fidelity do not change the best trace
        (they refine the surrogate); their cost is still accounted in
        ``cost_trace``. With ``batch_size`` > 1 the surrogate is
        believer-conditioned between picks (module docstring) and all q
        picks are evaluated together.
        """
        for _ in range(iterations):
            it = self._iteration
            picks_x, picks_f = self._propose(
                IC=IC, popsize_DE=popsize_DE, iterations_DE=iterations_DE,
                num_samples=num_samples, batch_size=batch_size, lie=lie,
                lie_train_iterations=lie_train_iterations,
                constraint_handling=constraint_handling, threshold=threshold)
            ys, cs = [], []
            for x, f in zip(picks_x, picks_f):
                xq = self._project(x, f)
                ys.append(np.asarray(self.fidelities[f](xq),
                                     dtype=float).reshape(1, 1))
                if self.n_con:
                    cs.append(self._eval_cons(x))
            X_new = np.vstack(picks_x)
            self.observe(X_new, np.vstack(ys), picks_f,
                         np.vstack(cs) if self.n_con else None)
            if verbose:
                for x, f, y in zip(picks_x, picks_f, ys):
                    print(f"infill {it}: x={np.round(x.ravel(), 4)} "
                          f"fidelity={f} y={y.item():.4f} "
                          f"best_hf={self.best_trace[-1]:.4f} "
                          f"cost={self.cost_spent:.2f}", flush=True)
        return list(self.best_trace)

    def _propose(self, IC="EI", popsize_DE=300, iterations_DE=400,
                 num_samples=500, batch_size=1, lie="believer",
                 lie_train_iterations=None, constraint_handling="PoF",
                 threshold=0.1, verbose=False, _continue_batch=False):
        """One acquisition round: fit a fresh surrogate (or, on the
        suggest() continuation path with an unchanged archive, reuse the
        in-progress batch state), condition on all outstanding pending
        points, then pick ``batch_size`` (point, fidelity) pairs with
        believer conditioning between picks. Returns (list of top-space
        [1, d] rows, list of fidelities) without evaluating or touching
        the archives."""
        from .acquisition import EV, PoF

        if IC not in ("EI", "WB2", "WB2S"):
            raise ValueError(f"unknown IC {IC!r}")
        # switching the criterion mid-batch voids the continuation (the
        # believer-incumbent drops of already-conditioned lies live only
        # in the old IC object): the fresh path re-applies every pending
        # lie under the new criterion
        cont = (_continue_batch and self._batch_open
                and len(self.pending_X) > 0 and self._bstate is not None
                and type(self._bstate["ic"]).__name__ == IC)
        if not cont:
            self._bstate = self._fresh_batch_state(IC)
            self._n_lied = 0
        st = self._bstate
        for i in range(self._n_lied, len(self.pending_X)):
            self._lie_at(st, self.pending_X[i:i + 1],
                         int(self.pending_f[i]), lie, lie_train_iterations)
        self._n_lied = len(self.pending_X)
        # committed queries the archive does not hold yet: the duplicate-
        # escalation guard must see them or a deterministic source gets
        # double-queried at an in-flight/in-batch point
        extras = [(self._project(self.pending_X[i:i + 1],
                                 int(self.pending_f[i])),
                   int(self.pending_f[i]))
                  for i in range(len(self.pending_X))]

        picks_x, picks_f = [], []
        for bq in range(batch_size):
            sub = self._next_run_key()
            if self.n_con:
                if constraint_handling == "PoF":
                    handler = PoF(st["zero_n"], self.d)
                    x_new = handler.optimize_with_IC(
                        st["ic"], st["model"], st["model_C"], (0.0, 1.0),
                        popsize_DE=popsize_DE, iterations_DE=iterations_DE,
                        method="DE", key=sub)
                elif constraint_handling == "EV":
                    handler = EV(st["zero_n"], self.d)
                    x_new = handler.optimize_with_IC(
                        st["ic"], st["model"], st["model_C"], (0.0, 1.0),
                        threshold=threshold, popsize_DE=popsize_DE,
                        iterations_DE=iterations_DE, method="DE", key=sub)
                else:
                    raise ValueError(
                        f"unknown constraint_handling {constraint_handling!r}")
            else:
                x_new = st["ic"].optimize(
                    st["model"], bounds=(0.0, 1.0), popsize_DE=popsize_DE,
                    iterations_DE=iterations_DE, num_samples=num_samples,
                    key=sub)
            x_new = np.clip(np.asarray(x_new).reshape(1, self.d), 0.0, 1.0)
            f = self._select_fidelity(st["model"], x_new,
                                      extra_queries=extras)
            picks_x.append(x_new)
            picks_f.append(f)
            extras.append((self._project(x_new, f), f))
            if bq < batch_size - 1:
                self._lie_at(st, x_new, f, lie, lie_train_iterations)
        return picks_x, picks_f

    # -- ask/tell interface ---------------------------------------------------------
    def suggest(self, batch_size=1, **propose_kwargs):
        """Ask/tell interface, step 1 (beyond reference): return the next
        query — ``(x_new [1, d], fidelity)`` for ``batch_size=1``
        (backward-compatible), else ``(X [q, d], fidelities [q])`` —
        WITHOUT evaluating the source. Feed results back with
        :meth:`observe`. Accepts :meth:`run`'s keyword arguments; shares
        the infill counter and PRNG stream with ``run``.

        Every suggested point is registered as pending and conditions
        later proposals as a believer lie until :meth:`observe` resolves
        it, so back-to-back ``suggest()`` calls propose different queries
        while evaluations are in flight; pending state survives save/load.
        Abandon outstanding points with :meth:`clear_pending`."""
        picks_x, picks_f = self._propose(batch_size=batch_size,
                                         _continue_batch=True,
                                         **propose_kwargs)
        X = np.vstack(picks_x)
        self.pending_X = np.vstack([self.pending_X, X])
        self.pending_f = np.concatenate(
            [self.pending_f, np.asarray(picks_f, dtype=int)])
        self._n_lied = len(self.pending_X) - 1
        self._batch_open = True
        if batch_size == 1:
            return picks_x[0], picks_f[0]
        return X, np.asarray(picks_f, dtype=int)

    def observe(self, x_new, y_new, fidelity, c_new=None):
        """Ask/tell interface, step 2: append externally evaluated
        observations, account their cost, resolve matching pending
        entries, and advance the infill counter. ``x_new`` [q, d] is in
        TOP-space coordinates (projections are applied internally for
        lower fidelities of variant-dimension stacks); ``fidelity`` is an
        int or a length-q sequence; ``c_new`` [q, n_con] is required for
        constrained problems. Lower-fidelity observations refine the
        surrogate but do not change the best-high-fidelity trace."""
        x_new = np.asarray(x_new, dtype=float).reshape(-1, self.d)
        q = len(x_new)
        y_new = np.asarray(y_new, dtype=float).reshape(q, 1)
        fids = ([int(fidelity)] * q if np.ndim(fidelity) == 0
                else [int(v) for v in fidelity])
        if len(fids) != q:
            raise ValueError("one fidelity per observed row")
        for f in fids:
            if not 0 <= f < self.n_fid:
                raise ValueError(f"fidelity must be in [0, {self.n_fid - 1}]")
        if self.n_con:
            if c_new is None:
                raise ValueError(
                    "constrained problem: constraint values are required")
            c_new = np.asarray(c_new, dtype=float).reshape(q, self.n_con)
        for i in range(q):
            f = fids[i]
            xq = self._project(x_new[i:i + 1], f)
            self.X[f] = np.vstack([self.X[f], xq])
            self.Y[f] = np.vstack([self.Y[f], y_new[i:i + 1]])
            if self.n_con:
                self.C[f] = np.vstack([self.C[f], c_new[i:i + 1]])
            self.fidelity_choices.append(f)
            self.cost_spent += self.costs[f]
            self.best_trace.append(self._best_feasible())
            self.cost_trace.append(self.cost_spent)
        self._resolve_pending(x_new, fids)
        self._archive_changed()
        self._iteration += 1
        return list(self.best_trace)

    def _resolve_pending(self, X_obs, fids):
        """Remove observed (row, fidelity) pairs from the pending registry
        (matching policy shared with the other drivers,
        :func:`so_bo.match_pending_row`, restricted to entries of the SAME
        fidelity — the same top-space x can legitimately be pending at two
        fidelities, and an observation must pop its own)."""
        from .so_bo import match_pending_row

        pending_X = np.asarray(self.pending_X,
                               dtype=float).reshape(-1, self.d)
        pending_f = np.asarray(self.pending_f, dtype=int)
        keep_mask = np.ones(len(pending_X), dtype=bool)
        for row, f in zip(np.asarray(X_obs, dtype=float).reshape(-1, self.d),
                          fids):
            cand = np.flatnonzero(keep_mask & (pending_f == int(f)))
            if not len(cand):
                continue
            k = match_pending_row(pending_X[cand], row)
            if k is not None:
                keep_mask[cand[k]] = False
        self.pending_X = pending_X[keep_mask]
        self.pending_f = pending_f[keep_mask]

    @property
    def x_best(self):
        """Best observed highest-fidelity input — the best FEASIBLE one
        for constrained problems (matching ``best_trace``); falls back to
        the unconstrained argmin while no top-fidelity point is feasible."""
        y = np.asarray(self.Y[-1]).reshape(-1)
        if self.n_con:
            feas = self.C[-1].max(axis=1) <= 0
            if feas.any():
                idx = np.flatnonzero(feas)
                return self.X[-1][idx[int(np.argmin(y[feas]))]]
        return self.X[-1][int(np.argmin(y))]

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
            "model_C_dic": np.asarray(json.dumps(self.model_C_dic)),
            "pending_X": self.pending_X,
            "pending_f": self.pending_f,
        }
        for f in range(self.n_fid):
            state[f"X{f}"] = self.X[f]
            state[f"Y{f}"] = self.Y[f]
            state[f"Z{f}"] = self._Z0[f]
            if self.n_con:
                state[f"C{f}"] = self.C[f]
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            np.savez(fh, **state)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str, fidelities, model_dic=None, constraints=None,
             projections=None):
        """Restore a saved loop; ``fidelities`` (and ``constraints``/
        ``projections`` when used) are the (unpicklable) callables,
        everything else comes from the checkpoint."""
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
        model_C_dic = (json.loads(str(data["model_C_dic"]))
                       if "model_C_dic" in data.files else None)
        bo = cls(fidelities=fidelities,
                 costs=[float(c) for c in data["costs"]],
                 X=[data[f"X{f}"] for f in range(n_fid)],
                 Y=[data[f"Y{f}"] for f in range(n_fid)],
                 model_dic=model_dic,
                 constraints=constraints,
                 model_C_dic=model_C_dic,
                 # archived constraint values travel with the checkpoint so
                 # the constructor never re-evaluates the callables
                 C=([data[f"C{f}"] for f in range(n_fid)]
                    if constraints and f"C{0}" in data.files else None),
                 projections=projections,
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
        if "pending_X" in data.files:
            bo.pending_X = np.asarray(data["pending_X"],
                                      dtype=float).reshape(-1, bo.d)
            bo.pending_f = np.asarray(data["pending_f"],
                                      dtype=int).reshape(-1)
        return bo


def _col_std(a):
    """Scalar columnwise std with the zero-variance guard of
    so_bo._safe_std."""
    from .so_bo import _safe_std

    return float(_safe_std(np.asarray(a, dtype=float)).item())
