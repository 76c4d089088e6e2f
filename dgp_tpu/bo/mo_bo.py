"""Multi-objective Bayesian optimization driver (MO-DGP + EHVI).

The reference runs this workflow only as loose notebook cells
(/root/reference/Notebooks_dgp/nb_modgp.ipynb cells 19-33: train MO-DGP,
build the padded non-dominated front, maximize EHVI, evaluate, append,
retrain) — there is no driver class like ``SO_BO``. ``MO_BO`` is that
missing sibling, with SO_BO's conventions: LHS DoE, input/output
normalization, a persistent PRNG stream across ``run()`` calls, and
save/load checkpointing of the whole loop.

Per infill the surrogate is rebuilt and retrained from scratch exactly as
the notebook does (each iteration constructs a fresh surrogate); for the
coupled MO-DGP form the default ``restarts='auto'`` escalates to a
best-of-k multi-start only when the trained surrogate's fit score flags a
bad basin of the chaotic landscape (models/mo_dgp.py).

The default surrogate is a pair of independent per-objective exact GPRs —
a measured choice, not a stylistic one: the round-4 bake-off
(benchmarks/mo_bo_bakeoff.{py,json}; 4 surrogate forms x 3 problems x 3
seeds x 8 infills on v5e) has the GPR pair reaching equal-or-higher final
hypervolume than the published-schedule coupled MO-DGP in 8/9 cells at
~18x less wall time (184 s vs 3257 s for the full 9-cell slate), while the
old fast-schedule MO-DGP default barely moved HV at all (mean gain 0.32 vs
the GPR pair's 51.1 across problems). Pass a dict without ``'type'`` (or
``{'type': 'mo_dgp', ...}``) to get the notebook's coupled MO-DGP.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..models.mo_dgp import MultiObjDeepGP
from .doe import lhs
from .ehvi import HV_calcul, NDC, Y_ND, optimize_EHVI, pad_front
from .so_bo import (_safe_std, denormalize, make_single_model, normalize,
                    normalize_X)

#: Measured-default surrogate spec (see module docstring + the bake-off).
DEFAULT_MODEL_DIC = {"type": "independent", "num_layers": 0,
                     "kernels": "rbf", "iterations": 2000}


class MO_BO:
    """Bi-objective minimization over [0, 1]^d with EHVI infill.

    :param problem: a ``bo.problems.MOProblem`` (``dim``, ``bounds`` =
        (ideal1, ideal2, nadir1, nadir2) hypervolume reference box,
        ``fun(x) -> [f1, f2]``).
    :param model_dic: surrogate spec. ``None`` (default) uses
        :data:`DEFAULT_MODEL_DIC` — two independent exact GPRs, the form
        the bake-off measured best on both HV and wall time. A dict
        WITHOUT ``'type'`` keeps its historical meaning (the notebook's
        coupled MO-DGP): {'loop': 2, 'num_samples': 5,
        'schedule': (it1, it2, it3), 'restarts': 'auto'} — schedule
        defaults to the fast loop (100, 0, 0), pass the published
        (2000, 5000, 7500) for full-quality coupled surrogates; 'restarts'
        defaults to the bad-basin auto escalation
        (MultiObjDeepGP.optimize_nat_adam). ``{'type': 'independent',
        'num_layers': L, ...}`` builds per-objective GPR (L=0) or DGP
        (L>=1) pairs via so_bo.make_single_model; the DGP-pair (100, 0)
        schedule default is measured (bake-off indep_dgp_fast column:
        neither it nor (500, 1000) dominates on the seed-chaotic tiny-n
        landscape, and fast is ~3x cheaper).
    :param X, F: optional known DoE — X [n, d] and F a list of two [n, 1]
        objective columns; otherwise an LHS DoE of ``DoE_size`` points is
        generated and evaluated.
    :param C: optional known [n, n_con] constraint values for a constrained
        problem's DoE (<= 0 feasible); recomputed from ``problem.cons``
        when omitted.
    :param model_C_dic: constraint-surrogate spec for constrained problems
        ({'kernels': 'rbf', 'iterations': 2000} default) — one exact GPR
        per constraint, trained per infill like SO_BO's constraint models;
        the acquisition becomes EHVI(x) * prod_i PoF_i(x), with a PoF-only
        bootstrap while the archive has no feasible point. Beyond
        reference: the reference handles constraints only in SO_BO.
    """

    def __init__(self, problem=None, X=None, F=None, C=None, DoE_size=None,
                 model_dic: Optional[dict] = None,
                 model_C_dic: Optional[dict] = None,
                 seed: Optional[int] = None, n_bucket: Optional[int] = 8):
        if problem is None:
            raise ValueError("You have to specify a problem to optimize")
        self.problem = problem
        self.d = problem.dim
        # None -> the measured default (independent GPR pair); an explicit
        # dict without 'type' keeps meaning the notebook's coupled MO-DGP
        self.model_dic = dict(DEFAULT_MODEL_DIC if model_dic is None
                              else model_dic)
        # constrained problems (problem.cons nonempty, g_i(x) <= 0
        # feasible): one exact-GPR surrogate per constraint, and the
        # acquisition becomes EHVI * prod PoF (bo/ehvi.py; beyond reference
        # — the reference handles constraints only in SO_BO)
        self.n_con = int(getattr(problem, "n_con", 0) or 0)
        self.model_C_dic = dict(model_C_dic
                                or {"kernels": "rbf", "iterations": 2000})
        self._seed = seed
        # pad the surrogate's data rows AND its default inducing rows to
        # multiples of n_bucket so the jitted training engines stay
        # compile-stable while the loop adds one point per infill — the
        # same default-on bucketing as SO_BO (measured there: ~25 s
        # recompiling infills -> ~3 s warm)
        self.n_bucket = n_bucket

        if X is None:
            if DoE_size is None:
                raise ValueError(
                    "You have to specify either a size to generate a DoE or "
                    "a known DoE (X, F)")
            X = lhs(self.d, DoE_size, seed=seed)
            F = self._evaluate(X)
            C = self._evaluate_cons(X)
        else:
            X = np.array(X, copy=True)
            F = [np.array(f, copy=True).reshape(-1, 1) for f in F]
            if self.n_con and C is None:
                C = self._evaluate_cons(X)
        self.X = X
        self.F = F
        # feasibility column(s) for the reference's filtered non-dominated
        # sort (NDC, feasible iff max <= 0): real constraint values for
        # constrained problems, the all-pass -1 column otherwise
        self.C = (np.array(C, copy=True).reshape(len(X), -1)
                  if self.n_con else -np.ones((len(X), 1)))

        self.hv_trace: List[float] = [self._hv()]
        self.added_points: List[np.ndarray] = []
        # pending-point registry (asynchronous ask/tell, as SO_BO): raw-
        # coordinate rows suggested but not yet observed. They persist on
        # the fantasy front (and, for independent surrogates, as believer
        # lies in the surrogate data) across suggest() calls, and survive
        # save/load.
        self.pending = np.zeros((0, self.d))
        # session-only continuation state: normalized pending coords, how
        # many of them the current batch state already conditions on, and
        # the in-progress batch state itself (trained surrogates + frozen
        # normalization + fantasy front)
        self._pending_n: List[np.ndarray] = []
        self._n_lied = 0
        self._batch_open = False
        self._bstate = None
        import jax

        self._run_key = jax.random.PRNGKey(seed or 0)
        self._iteration = 0

    # -- helpers ----------------------------------------------------------------
    def _evaluate(self, X):
        rows = [self.problem.fun(x) for x in X]
        return [np.asarray([np.reshape(r[i], ()) for r in rows],
                           dtype=float).reshape(-1, 1) for i in (0, 1)]

    def _evaluate_cons(self, X):
        """[n, n_con] constraint values (<= 0 feasible), or None."""
        if not self.n_con:
            return None
        return np.asarray([self.problem.con(x) for x in X], dtype=float)

    def _make_train_con_models(self, Xn):
        """Per-infill constraint surrogates: one exact GPR on each
        normalized constraint column, plus the feasibility threshold in
        that normalized space (the image of 0). Returns (None, None) for
        unconstrained problems."""
        if not self.n_con:
            return None, None
        if self.model_C_dic.get("num_layers", 0) != 0:
            raise ValueError(
                "MO_BO constraint surrogates are exact GPRs "
                "(model_C_dic['num_layers'] must be 0 or absent)")
        model_C, zero_n = [], []
        for i in range(self.n_con):
            c = self.C[:, i:i + 1]
            spec = {"num_layers": 0,
                    "kernels": self.model_C_dic.get("kernels", "rbf")}
            m = make_single_model(spec, Xn, normalize(c),
                                  n_bucket=self.n_bucket, seed=self._seed)
            m.optimize_adam(
                iterations=int(self.model_C_dic.get("iterations", 2000)),
                lr=0.001)
            model_C.append(m)
            zero_n.append(float((0.0 - c.mean()) / _safe_std(c).item()))
        return model_C, np.asarray(zero_n)

    def _next_run_key(self):
        import jax

        self._run_key, sub = jax.random.split(self._run_key)
        return sub

    def _hv(self):
        return HV_calcul(NDC(self.F, self.C), self.F, self.problem.bounds)

    def pareto(self):
        """(X_nd, F_nd) — the current feasible non-dominated set."""
        nd = NDC(self.F, self.C)
        F = np.hstack(self.F)
        return self.X[nd], F[nd]

    def _normalized(self):
        """(Xn, Fn, lw_n, up_n): normalized data plus the [0,1]^d domain
        box mapped through the same normalization (zero-variance columns
        guarded by so_bo._safe_std) — the EHVI search must run over the
        mapped box, NOT the unit box of normalized coordinates (which would
        confine denormalized proposals to [mean, mean+std] per dimension)."""
        Xn, lw_n, up_n = normalize_X(self.X)
        Fn = [normalize(f) for f in self.F]
        return Xn, Fn, lw_n, up_n

    def _bucketed_inducing(self, Xn, Fn):
        """MO-DGP's default inducing rows (Z0 = [X, Y_2], Z1 = X,
        MO_DGP.py:495-512) padded to the bucket with distinct in-range rows
        (duplicates would make Kuu singular; extra inducing points only add
        variational capacity)."""
        Z = [np.concatenate([Xn, np.asarray(Fn[1])], axis=1), Xn.copy()]
        if not self.n_bucket:
            return Z
        from ..models.training import bucket_rows

        rng = np.random.default_rng(self._seed or 0)
        out = []
        for z in Z:
            n, d = z.shape
            n_pad = bucket_rows(n, self.n_bucket)
            if n_pad > n:
                lo, hi = z.min(axis=0), z.max(axis=0)
                extra = rng.uniform(size=(n_pad - n, d)) * (hi - lo) + lo
                z = np.concatenate([z, extra], axis=0)
            out.append(z)
        return out

    def make_model(self, Xn, Fn, seed):
        """Surrogate per model_dic['type']:

        * ``"mo_dgp"`` (default) — the notebook's coupled recurrent
          ``MultiObjDeepGP``.
        * ``"independent"`` — a list of two independent per-objective
          surrogates from the SO_BO spec-dict factory
          (``so_bo.make_single_model``): ``num_layers=0`` exact GPRs or
          ``num_layers>=1`` DGPs. bo/ehvi.py evaluates EHVI over the pair
          (the reference's own EHVI.py:124-130 list branch); the coupled
          MO-DGP landscape is chaotic (models/mo_dgp.py) while the
          independent pair is convex(GPR)/well-behaved — see
          benchmarks/mo_bo_bakeoff.py for the measured comparison.
        """
        mtype = self.model_dic.get("type", "mo_dgp")
        if mtype == "mo_dgp":
            return MultiObjDeepGP(
                [Xn, Xn.copy()], Fn, Z=self._bucketed_inducing(Xn, Fn),
                loop=int(self.model_dic.get("loop", 2)),
                num_samples=int(self.model_dic.get("num_samples", 5)),
                seed=seed, n_bucket=self.n_bucket)
        if mtype == "independent":
            spec = {
                "num_layers": int(self.model_dic.get("num_layers", 0)),
                "kernels": self.model_dic.get("kernels", "rbf"),
                "num_units": self.model_dic.get("num_units", 1),
                "num_samples": int(self.model_dic.get("num_samples", 5)),
            }
            return [make_single_model(spec, Xn, np.asarray(f),
                                      n_bucket=self.n_bucket,
                                      seed=self._seed)
                    for f in Fn]
        raise ValueError(f"unknown model_dic type {mtype!r}")

    def _train_model(self, model, sched, restarts):
        """Per-infill surrogate training (notebook semantics: from scratch).

        mo_dgp: the 3-phase staged NatGrad schedule. independent GPR pair:
        Adam on the log marginal likelihood for model_dic['iterations']
        (default 2000) steps each. independent DGP pair: the 2-phase
        Adam -> Adam+NatGrad trainer with (sched[0], sched[1])."""
        if not isinstance(model, list):
            model.optimize_nat_adam(
                iterations1=sched[0], iterations2=sched[1],
                iterations3=sched[2], messages=0, restarts=restarts)
            return
        for m in model:
            if m.name == "gpr":
                m.optimize_adam(
                    iterations=int(self.model_dic.get("iterations", 2000)),
                    lr=0.001)
            else:
                m.optimize_nat_adam(iterations1=sched[0],
                                    iterations2=sched[1], messages=0)

    # -- batch (q-point) infill helpers -------------------------------------------
    def _fantasy_objectives(self, model, x_n):
        """Believer lie values for both objectives at x_n [1, d]: the
        surrogate posterior means in NORMALIZED objective space. Works for
        both surrogate forms (independent pair / coupled MO-DGP)."""
        from ..models.dgp import moment_matched
        from .so_bo import fantasy_mean

        if isinstance(model, list):
            return [float(fantasy_mean(m, x_n)[0, 0]) for m in model]
        out = []
        for i in (0, 1):
            m_s, v_s = model.predict_f(x_n, S=64, objective=i)
            m, _ = moment_matched(np.asarray(m_s), np.asarray(v_s))
            out.append(float(np.asarray(m).reshape(-1)[0]))
        return out

    def _condition_on_lie(self, model, model_C, x_n, f_lie_n,
                          lie_train_iterations):
        """Append the fantasized (normalized) observation to the surrogate
        training data. Exact posterior conditioning for GPRs (their
        posterior recomputes from ``data``); DGP pairs take a short Adam
        refit (the SVGP posterior only moves through training). The coupled
        MO-DGP is NOT conditioned — its in-batch deduplication comes from
        the fantasy front alone (EHVI at a point whose believer outcome is
        already on the front is ~0)."""
        import jax.numpy as jnp

        from ..config import default_float
        from .so_bo import fantasy_mean

        dt = default_float()
        as_j = lambda a: jnp.asarray(np.asarray(a), dtype=dt)

        def _append(m, y_val):
            Xt = np.vstack([np.asarray(m.data[0]), x_n])
            Yt = np.vstack([np.asarray(m.data[1]),
                            np.asarray(y_val, dtype=float).reshape(1, -1)])
            m.data = (as_j(Xt), as_j(Yt))
            iters = lie_train_iterations
            if iters is None:
                iters = 0 if m.name == "gpr" else 200
            if iters:
                if m.name == "gpr":
                    m.optimize_adam(iterations=iters, lr=0.001)
                else:
                    # shrink_inner=False: warm refit, not a cold (re)train —
                    # see SO_BO._apply_lie
                    m.optimize_nat_adam(iterations1=iters, iterations2=0,
                                        messages=0, shrink_inner=False)

        if isinstance(model, list):
            for i, m in enumerate(model):
                _append(m, f_lie_n[i])
        if model_C:
            for m in model_C:
                _append(m, fantasy_mean(m, x_n))

    # -- the loop ---------------------------------------------------------------
    def run(self, iterations=1, approximation="None", S=1000, method="DE",
            popsize_DE=300, iterations_DE=400, iterations_adam=1000,
            batch_size=1, lie_train_iterations=None, verbose=True):
        """``iterations`` EHVI infills; returns the hypervolume trace
        (including the initial DoE hypervolume at index 0).

        :param approximation: EHVI estimator — "None" (exact 2-D),
            "Gaussian", or "KDE" (bo/ehvi.py).
        :param batch_size: q points per infill for parallel evaluation
            (beyond reference). After each in-batch pick the believer
            outcome (surrogate posterior means of BOTH objectives) is added
            to a fantasy front and — for independent surrogates — the
            surrogate data is conditioned on it (Kriging Believer,
            Ginsbourger et al. 2010), so the re-optimized EHVI collapses at
            the pick and the batch spreads. The hypervolume trace and
            archive record only REAL evaluations.
        :param lie_train_iterations: in-batch refit steps after each lie
            (None = 0 for exact GPRs — conditioning is exact — and 200 Adam
            steps for DGP pairs).
        """
        for _ in range(iterations):
            it = self._iteration
            raw = self._propose(
                batch_size=batch_size, approximation=approximation, S=S,
                method=method, popsize_DE=popsize_DE,
                iterations_DE=iterations_DE,
                iterations_adam=iterations_adam,
                lie_train_iterations=lie_train_iterations)
            for x_new in raw:
                f_new = self._evaluate(x_new)
                c_new = self._evaluate_cons(x_new)

                self.X = np.vstack([self.X, x_new])
                self.F = [np.vstack([self.F[i], f_new[i]]) for i in (0, 1)]
                self.C = np.vstack([self.C, c_new if self.n_con
                                    else [[-1.0]]])
                self.added_points.append(x_new)
                self.hv_trace.append(self._hv())
                if verbose:
                    print(f"infill {it}: x={np.round(x_new.ravel(), 4)} "
                          f"f=({f_new[0].item():.4f}, {f_new[1].item():.4f}) "
                          f"HV={self.hv_trace[-1]:.5f}", flush=True)
            self._archive_changed()
            self._iteration += 1
        return list(self.hv_trace)

    def _normalize_x(self, x_raw):
        """Raw [1, d] -> the surrogate's normalized input coordinates."""
        x_raw = np.asarray(x_raw, dtype=float).reshape(1, self.d)
        return (x_raw - self.X.mean(axis=0)) / _safe_std(self.X)

    def clear_pending(self):
        """Drop all outstanding suggested-but-unobserved points; their
        believer outcomes stop conditioning future proposals at the next
        fresh batch."""
        self.pending = np.zeros((0, self.d))
        self._pending_n = []
        self._n_lied = 0
        self._batch_open = False
        self._bstate = None

    def _fresh_batch_state(self, it):
        """Train surrogates on the real archive and freeze the batch
        state: normalized domain box, objective-normalization stats, the
        hypervolume box mapped through them, and fantasy copies of the
        archive (believer outcomes land there — and in the surrogate data
        — but never in self.F/self.C). The stats are FROZEN for the whole
        batch: the surrogate was trained under them, and fantasy rows must
        not shift them (nb_modgp cell 26 workflow)."""
        # (100, 0, 0) is the measured default for DGP pairs too (round 5,
        # benchmarks/mo_bo_bakeoff.json indep_dgp_fast vs indep_dgp): at
        # these tiny-n archives the pair training is seed-chaotic and
        # NEITHER schedule dominates — the fast (100, 0) column wins 5/9
        # cells (incl. both kursawe jackpots, hv_gain 185 vs 17) at ~3x
        # less wall than (500, 1000); both are far below the shipped
        # indep-GPR default, which is why DGP pairs are opt-in at all.
        sched = self.model_dic.get("schedule", (100, 0, 0))
        # "auto" = run once, escalate to best-of-k only on a measured bad
        # basin (models/mo_dgp.py optimize_nat_adam)
        restarts = self.model_dic.get("restarts", "auto")
        if restarts != "auto":
            restarts = int(restarts)
        Xn, Fn, lw_n, up_n = self._normalized()
        model = self.make_model(Xn, Fn, seed=it)
        self._train_model(model, sched, restarts)
        model_C, zero_n = self._make_train_con_models(Xn)

        b = self.problem.bounds
        f0, f1 = self.F
        mu = (f0.mean(), f1.mean())
        sd = (_safe_std(f0).item(), _safe_std(f1).item())
        nadir = (float((b[2] - mu[0]) / sd[0]),
                 float((b[3] - mu[1]) / sd[1]))
        ideal = (float((b[0] - mu[0]) / sd[0]),
                 float((b[1] - mu[1]) / sd[1]))
        return dict(model=model, model_C=model_C, zero_n=zero_n,
                    mu=mu, sd=sd, nadir=nadir, ideal=ideal,
                    lw_n=lw_n, up_n=up_n,
                    F_fant=[self.F[0].copy(), self.F[1].copy()],
                    C_fant=self.C.copy())

    def _lie_at(self, st, x_n, lie_train_iterations):
        """Fantasize a believer outcome at normalized ``x_n``: append it to
        the batch state's fantasy front (raw objective units) and condition
        the independent surrogates on it."""
        f_lie_n = self._fantasy_objectives(st["model"], x_n)
        mu, sd = st["mu"], st["sd"]
        st["F_fant"] = [np.vstack([st["F_fant"][i],
                                   [[f_lie_n[i] * sd[i] + mu[i]]]])
                        for i in (0, 1)]
        if self.n_con:
            # believer constraint row: the fantasy point counts as
            # feasible for the fantasy front iff every constraint
            # surrogate's mean is feasible
            from .so_bo import fantasy_mean as _fm

            c_row = [1.0 if float(_fm(st["model_C"][i],
                                      x_n)[0, 0]) > st["zero_n"][i]
                     else -1.0 for i in range(self.n_con)]
            st["C_fant"] = np.vstack([st["C_fant"], [c_row]])
        else:
            st["C_fant"] = np.vstack([st["C_fant"], [[-1.0]]])
        self._condition_on_lie(st["model"], st["model_C"], x_n, f_lie_n,
                               lie_train_iterations)

    def _propose(self, batch_size=1, approximation="None", S=1000,
                 method="DE", popsize_DE=300, iterations_DE=400,
                 iterations_adam=1000, lie_train_iterations=None,
                 verbose=False, _continue_batch=False):
        """One acquisition round: train a fresh surrogate on the current
        archive, maximize EHVI ``batch_size`` times with believer
        conditioning + fantasy-front updates between picks, and return the
        picks as a list of raw-coordinate [1, d] rows (clipped to the
        domain box; the archive is NOT touched).

        Outstanding :attr:`pending` points always join the fantasy front
        (and condition independent surrogates) before picking, so
        proposals avoid in-flight evaluations. With ``_continue_batch``
        (the suggest() path) and an unchanged archive, the in-progress
        batch state is reused — a second suggest() before any observe()
        continues the batch exactly as one larger batch_size would."""
        cont = (_continue_batch and self._batch_open
                and len(self.pending) > 0 and self._bstate is not None)
        if not cont:
            self._bstate = self._fresh_batch_state(self._iteration)
            self._pending_n = [self._normalize_x(p) for p in self.pending]
            self._n_lied = 0
        st = self._bstate
        # condition on pending rows the current batch state has not seen
        for i in range(self._n_lied, len(self._pending_n)):
            self._lie_at(st, self._pending_n[i], lie_train_iterations)
        self._n_lied = len(self._pending_n)

        picks = []
        for bq in range(batch_size):
            # repeat the nadir corner up to the bucket: zero-width
            # staircase segments leave every EHVI estimator exactly
            # unchanged (test_pad_front_ehvi_invariant) but keep the
            # jitted EHVI/DE engines compile-stable while the front
            # grows. Constrained problems can start with ZERO feasible
            # rows — then there is no front and optimize_EHVI runs the
            # PoF-only bootstrap (YND=None) until a feasible point lands
            NDT = NDC(st["F_fant"], st["C_fant"], obj1_ascending=False)
            Fn_fant = [(st["F_fant"][i] - st["mu"][i]) / st["sd"][i]
                       for i in (0, 1)]
            YND = (pad_front(Y_ND(Fn_fant, NDT, nadir=st["nadir"],
                                  ideal=st["ideal"]), self.n_bucket)
                   if len(NDT) else None)

            x_opt_n = optimize_EHVI(
                st["model"], YND, method=method, popsize_DE=popsize_DE,
                iterations_DE=iterations_DE,
                iterations_adam=iterations_adam,
                approximation=approximation, S=S,
                bounds=(st["lw_n"], st["up_n"]),
                key=self._next_run_key(),
                model_C=st["model_C"], zero_c=st["zero_n"])
            x_opt_n = np.asarray(x_opt_n).reshape(1, self.d)
            picks.append(x_opt_n)
            if bq < batch_size - 1:
                self._lie_at(st, x_opt_n, lie_train_iterations)

        # normalized picks for suggest()'s pending bookkeeping
        self._proposed_n = picks
        # denormalize against the batch-start archive (self.X is
        # untouched here, so its stats are the frozen ones every pick
        # was proposed in) and clip to the domain box
        return [np.clip(denormalize(x_opt_n, self.X), 0.0, 1.0)
                for x_opt_n in picks]

    # -- ask/tell interface ---------------------------------------------------------
    def suggest(self, batch_size=1, **propose_kwargs):
        """Ask/tell interface, step 1 (beyond reference): train a fresh
        surrogate and return ``batch_size`` EHVI-proposed points as a raw-
        coordinate [q, d] array WITHOUT evaluating the problem — for
        external/asynchronous evaluation. Feed results back with
        :meth:`observe`. Accepts :meth:`run`'s keyword arguments
        (approximation=, S=, method=, ...). Shares the infill counter and
        PRNG stream with ``run``, so the two interleave freely.

        Every suggested point is registered in :attr:`pending` and joins
        the fantasy front (its believer outcome conditions later EHVI
        proposals) until :meth:`observe` resolves it — back-to-back
        ``suggest()`` calls without an ``observe()`` therefore propose
        different points, and ``suggest(1); suggest(1); observe(both)``
        walks the same batch state and key stream as one ``suggest(2)``.
        Abandon outstanding points with :meth:`clear_pending`; pending
        state survives save/load."""
        raw = self._propose(batch_size=batch_size, _continue_batch=True,
                            **propose_kwargs)
        arr = np.vstack(raw)
        self.pending = np.vstack([self.pending, arr])
        # keep the exact normalized coords the picks were optimized in
        # (renormalizing raw would round-trip through the domain clip)
        self._pending_n.extend(self._proposed_n)
        # _propose conditioned on all old pending rows and on every
        # in-batch pick except the last
        self._n_lied = len(self._pending_n) - 1
        self._batch_open = True
        return arr

    def observe(self, X_new, F_new, C_new=None):
        """Ask/tell interface, step 2: append externally evaluated points.

        :param X_new: [q, d] raw coordinates.
        :param F_new: the two objective columns — a list/tuple of two
            [q]- or [q, 1]-shaped arrays, or one [q, 2] array.
        :param C_new: [q, n_con] constraint values for constrained
            problems (<= 0 feasible)."""
        X_new = np.asarray(X_new, dtype=float).reshape(-1, self.d)
        q = len(X_new)
        if isinstance(F_new, (list, tuple)):
            F_cols = [np.asarray(F_new[i], dtype=float).reshape(q, 1)
                      for i in (0, 1)]
        else:
            F_new = np.asarray(F_new, dtype=float).reshape(q, 2)
            F_cols = [F_new[:, i:i + 1] for i in (0, 1)]
        if self.n_con:
            if C_new is None:
                raise ValueError(
                    "constrained problem: constraint values are required")
            C_rows = np.asarray(C_new, dtype=float).reshape(q, self.n_con)
        for i in range(q):
            self.X = np.vstack([self.X, X_new[i:i + 1]])
            self.F = [np.vstack([self.F[j], F_cols[j][i:i + 1]])
                      for j in (0, 1)]
            self.C = np.vstack([self.C, C_rows[i:i + 1] if self.n_con
                                else [[-1.0]]])
            self.added_points.append(X_new[i:i + 1])
            self.hv_trace.append(self._hv())
        self._resolve_pending(X_new)
        self._archive_changed()
        self._iteration += 1
        return list(self.hv_trace)

    def _resolve_pending(self, X_obs):
        """Remove observed rows from the pending registry (shared policy,
        :func:`so_bo.resolve_pending_rows`)."""
        from .so_bo import resolve_pending_rows

        keep = resolve_pending_rows(self.pending, X_obs, self.d)
        self.pending = np.asarray(self.pending,
                                  dtype=float).reshape(-1, self.d)[keep]

    def _archive_changed(self):
        """The archive (and its normalization) changed: any in-progress
        batch state is stale."""
        self._batch_open = False
        self._bstate = None
        self._pending_n = []
        self._n_lied = 0

    # -- checkpoint / resume -----------------------------------------------------
    def save(self, path: str):
        """One .npz with the data archive, HV trace and PRNG stream. The
        surrogate retrains from scratch every infill (notebook semantics),
        so the data + stream position reproduce the continuation exactly."""
        import os

        import json

        state = {
            "X": self.X, "F0": self.F[0], "F1": self.F[1], "C": self.C,
            "hv_trace": np.asarray(self.hv_trace, dtype=float),
            "run_key": np.asarray(self._run_key),
            "seed": np.asarray(self._seed if self._seed is not None else -1),
            "iteration": np.asarray(self._iteration),
            "n_bucket": np.asarray(self.n_bucket or 0),
            # surrogate spec travels with the checkpoint: a resume that
            # forgot to re-pass model_dic would otherwise silently retrain
            # with defaults, breaking exact continuation
            "model_dic": np.asarray(json.dumps(self.model_dic)),
            "model_C_dic": np.asarray(json.dumps(self.model_C_dic)),
            "added_points": (np.concatenate(self.added_points, axis=0)
                             if self.added_points
                             else np.zeros((0, self.d))),
            "pending": self.pending,
        }
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **state)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str, problem, model_dic=None):
        """Restore a saved loop. ``model_dic`` defaults to the dict the
        checkpoint was saved with; pass one explicitly only to override it."""
        import jax
        import json

        data = np.load(path)
        seed = int(data["seed"])
        if model_dic is None:
            # checkpoints persist the spec; a pre-persistence checkpoint
            # keeps its historical meaning ({} = coupled MO-DGP defaults)
            # rather than silently adopting today's DEFAULT_MODEL_DIC
            model_dic = (json.loads(str(data["model_dic"]))
                         if "model_dic" in data.files else {})
        if "n_bucket" in data.files:
            n_bucket = int(data["n_bucket"]) or None
        else:
            n_bucket = 8
        model_C_dic = (json.loads(str(data["model_C_dic"]))
                       if "model_C_dic" in data.files else None)
        bo = cls(problem=problem, X=data["X"], F=[data["F0"], data["F1"]],
                 C=data["C"] if getattr(problem, "n_con", 0) else None,
                 model_dic=model_dic, model_C_dic=model_C_dic,
                 seed=None if seed == -1 else seed, n_bucket=n_bucket)
        bo.hv_trace = list(np.asarray(data["hv_trace"], dtype=float))
        bo._run_key = jax.numpy.asarray(data["run_key"])
        bo._iteration = int(data["iteration"])
        bo.C = np.asarray(data["C"], dtype=float)
        bo.added_points = [row[None, :] for row in
                           np.asarray(data["added_points"], dtype=float)]
        if "pending" in data.files:
            bo.pending = np.asarray(data["pending"],
                                    dtype=float).reshape(-1, bo.d)
        return bo
