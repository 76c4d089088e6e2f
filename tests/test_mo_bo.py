"""MO_BO driver (bo/mo_bo.py) — the class form of the nb_modgp BO loop."""

import os
import tempfile

import numpy as np
import pytest

from dgp_tpu.bo.mo_bo import MO_BO
from dgp_tpu.bo.problems import get


def _fast_spec():
    # restarts=1: at these deliberately-tiny schedules the "auto" default
    # would always escalate to best-of-4 and quadruple the suite time
    return {"loop": 1, "num_samples": 3, "schedule": (30, 0, 0),
            "restarts": 1}


def _fast_run_kwargs():
    return dict(S=50, popsize_DE=20, iterations_DE=20, verbose=False)


def test_mo_bo_infills_grow_hypervolume():
    bo = MO_BO(problem=get("multi_obj_1D_4"), DoE_size=10,
               model_dic=_fast_spec(), seed=0)
    n0 = len(bo.X)
    trace = bo.run(2, **_fast_run_kwargs())
    assert len(bo.X) == n0 + 2 and len(bo.F[0]) == n0 + 2
    # hypervolume w.r.t. the problem box is monotone under point addition
    assert all(b >= a - 1e-12 for a, b in zip(trace, trace[1:]))
    assert len(trace) == 3
    Xnd, Fnd = bo.pareto()
    assert Xnd.shape[1] == 1 and Fnd.shape[1] == 2 and len(Xnd) >= 1
    # new points stay in the box
    for x in bo.added_points:
        assert np.all(x >= 0.0) and np.all(x <= 1.0)


def test_mo_bo_estimators_and_known_doe():
    problem = get("multi_obj_1D_2")
    rng = np.random.default_rng(3)
    X = rng.uniform(0.05, 0.95, (8, 1))
    F = [np.concatenate([np.reshape(problem.fun(x)[i], (1,)) for x in X])
         .reshape(-1, 1) for i in (0, 1)]
    for approx in ("Gaussian", "KDE"):
        bo = MO_BO(problem=problem, X=X, F=F, model_dic=_fast_spec(), seed=1)
        trace = bo.run(1, approximation=approx, **_fast_run_kwargs())
        assert np.isfinite(trace[-1]) and trace[-1] >= trace[0] - 1e-12


def test_mo_bo_save_load_exact_resume():
    """Same stream position + data => the continuation reproduces exactly."""
    problem = get("multi_obj_1D_4")
    kw = _fast_run_kwargs()

    bo = MO_BO(problem=problem, DoE_size=10, model_dic=_fast_spec(), seed=4)
    bo.run(1, **kw)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "mo_bo.npz")
        bo.save(path)
        trace_a = bo.run(1, **kw)

        # model_dic is NOT re-passed: load() must restore the surrogate spec
        # from the checkpoint itself (a forgotten dict would silently
        # retrain with defaults and break exact continuation)
        bo2 = MO_BO.load(path, problem)
        assert bo2._iteration == 1 and len(bo2.X) == len(bo.X) - 1
        spec = _fast_spec()
        assert {k: tuple(v) if isinstance(v, (list, tuple)) else v
                for k, v in bo2.model_dic.items()} == spec
        trace_b = bo2.run(1, **kw)
    np.testing.assert_allclose(trace_b[-1], trace_a[-1], rtol=0, atol=0)
    np.testing.assert_array_equal(bo2.X, bo.X)


def test_mo_bo_search_box_covers_domain(monkeypatch):
    """The EHVI search must run over the [0,1]^d domain mapped through the
    input normalization — not the unit box of normalized coordinates, which
    would confine denormalized proposals to [mean, mean+std] per dimension
    (a bug the vacuous HV-monotone assertion cannot catch)."""
    import dgp_tpu.bo.mo_bo as mo_bo_mod
    from dgp_tpu.bo.so_bo import _safe_std

    bo = MO_BO(problem=get("multi_obj_1D_4"), DoE_size=10,
               model_dic=_fast_spec(), seed=0)
    mu, sd = bo.X.mean(0), _safe_std(bo.X)
    target = 0.02  # a domain point well below the DoE mean
    captured = {}

    def fake_optimize(model, YND, **kw):
        captured["bounds"] = kw["bounds"]
        return ((target - mu) / sd)[None, :]

    monkeypatch.setattr(mo_bo_mod, "optimize_EHVI", fake_optimize)
    bo.run(1, **_fast_run_kwargs())
    lw, up = captured["bounds"]
    np.testing.assert_allclose(lw, (0.0 - mu) / sd)
    np.testing.assert_allclose(up, (1.0 - mu) / sd)
    # the proposal denormalizes back to the intended domain point
    np.testing.assert_allclose(bo.X[-1], [target], atol=1e-12)
    assert bo.X[-1][0] < bo.X[:-1].mean()


def test_mo_bo_multidim_problem():
    """d=3 (kursawe): the infill search and denormalization are per-column."""
    bo = MO_BO(problem=get("kursawe"), DoE_size=12,
               model_dic={"loop": 1, "num_samples": 3, "schedule": (20, 0, 0)},
               seed=2)
    trace = bo.run(1, **_fast_run_kwargs())
    assert bo.X.shape == (13, 3)
    assert np.isfinite(trace[-1]) and trace[-1] >= trace[0] - 1e-12


def test_mo_bo_independent_gpr_surrogates():
    """model_dic type='independent' with num_layers=0: two exact GPRs per
    infill, EHVI over the pair (bo/ehvi.py two_gpr); loop runs, HV stays
    monotone, save/load keeps the surrogate type."""
    spec = {"type": "independent", "num_layers": 0, "kernels": "rbf",
            "iterations": 100}
    bo = MO_BO(problem=get("multi_obj_1D_4"), DoE_size=10, model_dic=spec,
               seed=0)
    model = bo.make_model(*bo._normalized()[:2], seed=0)
    assert isinstance(model, list) and [m.name for m in model] == [
        "gpr", "gpr"]
    trace = bo.run(2, **_fast_run_kwargs())
    assert all(b >= a - 1e-12 for a, b in zip(trace, trace[1:]))
    for x in bo.added_points:
        assert np.all(x >= 0.0) and np.all(x <= 1.0)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "mo_bo_ind.npz")
        bo.save(path)
        bo2 = MO_BO.load(path, get("multi_obj_1D_4"))
        assert bo2.model_dic["type"] == "independent"
        assert bo2.model_dic["num_layers"] == 0


def test_mo_bo_default_model_dic_is_independent_gpr():
    """model_dic=None resolves to DEFAULT_MODEL_DIC (the bake-off winner:
    two exact GPRs, benchmarks/mo_bo_bakeoff.json); an explicit dict
    WITHOUT 'type' keeps its historical coupled-MO-DGP meaning."""
    from dgp_tpu.bo.mo_bo import DEFAULT_MODEL_DIC
    from dgp_tpu.models.mo_dgp import MultiObjDeepGP

    bo = MO_BO(problem=get("multi_obj_1D_4"), DoE_size=10, seed=0)
    assert bo.model_dic == DEFAULT_MODEL_DIC
    model = bo.make_model(*bo._normalized()[:2], seed=0)
    assert isinstance(model, list) and [m.name for m in model] == [
        "gpr", "gpr"]

    bo_legacy = MO_BO(problem=get("multi_obj_1D_4"), DoE_size=10,
                      model_dic={"loop": 1, "num_samples": 3}, seed=0)
    legacy = bo_legacy.make_model(*bo_legacy._normalized()[:2], seed=0)
    assert isinstance(legacy, MultiObjDeepGP)


def test_mo_bo_independent_dgp_surrogates():
    """num_layers>=1 builds two independent DGPs trained by the 2-phase
    Adam->NatGrad trainer with (sched[0], sched[1])."""
    spec = {"type": "independent", "num_layers": 1, "num_units": 1,
            "kernels": "rbf", "num_samples": 2, "schedule": (10, 5, 0)}
    bo = MO_BO(problem=get("multi_obj_1D_2"), DoE_size=8, model_dic=spec,
               seed=1)
    model = bo.make_model(*bo._normalized()[:2], seed=0)
    assert isinstance(model, list) and [m.name for m in model] == [
        "dgp", "dgp"]
    trace = bo.run(1, **_fast_run_kwargs())
    assert np.isfinite(trace[-1]) and trace[-1] >= trace[0] - 1e-12


def test_mo_bo_unknown_model_type():
    bo = MO_BO(problem=get("multi_obj_1D_4"), DoE_size=8,
               model_dic={"type": "nope"}, seed=0)
    with pytest.raises(ValueError, match="unknown model_dic type"):
        bo.run(1, **_fast_run_kwargs())


def test_mo_bo_default_auto_restarts(monkeypatch):
    """Without 'restarts' in model_dic the driver passes restarts='auto'
    through to the surrogate trainer (bad-basin escalation default-on)."""
    from dgp_tpu.models.mo_dgp import MultiObjDeepGP

    seen = {}
    monkeypatch.setattr(MultiObjDeepGP, "_restart_score",
                        lambda self, crit, key: seen.setdefault("scored", 1.0))
    orig = MultiObjDeepGP.optimize_nat_adam

    def spy(self, *a, **kw):
        seen["restarts"] = kw.get("restarts")
        return orig(self, *a, **kw)

    monkeypatch.setattr(MultiObjDeepGP, "optimize_nat_adam", spy)
    spec = {"loop": 1, "num_samples": 3, "schedule": (20, 0, 0)}
    bo = MO_BO(problem=get("multi_obj_1D_4"), DoE_size=10,
               model_dic=spec, seed=0)
    trace = bo.run(1, **_fast_run_kwargs())
    assert seen["restarts"] == "auto" and seen["scored"] == 1.0
    assert np.isfinite(trace[-1])


def test_constrained_problems_registry():
    """BNH/SRN: constraint signs at hand-checked points (g <= 0 feasible,
    the NDC convention)."""
    bnh = get("bnh")
    assert bnh.n_con == 2 and bnh.dim == 2
    assert all(v <= 0 for v in bnh.con(np.array([0.2, 0.2])))  # feasible
    assert bnh.con(np.array([0.0, 1.0]))[0] > 0  # outside the g1 disk
    srn = get("srn")
    assert srn.n_con == 2
    assert srn.con(np.array([1.0, 0.0]))[0] > 0  # x=(20,-20): ||x|| > 15
    assert all(v <= 0 for v in srn.con(np.array([0.4, 0.6])))
    # unconstrained problems keep an empty cons tuple
    assert get("multi_obj_1D_4").n_con == 0


def test_pof_pure_orders_feasibility():
    """A GPR trained on a linear constraint g(x) = x - 0.5 must give
    PoF ~ 1 deep in the feasible half and ~ 0 deep in the infeasible half."""
    import jax.numpy as jnp

    from dgp_tpu.bo.ehvi import _pof_pure
    from dgp_tpu.bo.so_bo import make_single_model, normalize

    X = np.linspace(0, 1, 24)[:, None]
    c = X - 0.5
    m = make_single_model({"num_layers": 0, "kernels": "rbf"}, X,
                          normalize(c), n_bucket=8, seed=0)
    m.optimize_adam(iterations=300, lr=0.01)
    zero_n = np.asarray([(0.0 - c.mean()) / c.std()])
    pof = np.asarray(_pof_pure(
        ((m.params, m.train_data),), jnp.asarray(zero_n),
        jnp.asarray([[0.05], [0.5], [0.95]])))
    assert pof[0] > 0.95 and pof[2] < 0.05
    assert 0.2 < pof[1] < 0.8  # boundary: genuinely uncertain
    assert pof[0] > pof[1] > pof[2]


def test_mo_bo_constrained_loop_bnh():
    """Constrained MO-BO end-to-end on BNH: real constraint columns flow
    through NDC/HV, the cEHVI proposal appends constraint values, and the
    checkpoint round-trips the constrained state."""
    bo = MO_BO(problem=get("bnh"), DoE_size=12, seed=0)
    assert bo.n_con == 2 and bo.C.shape == (12, 2)
    trace = bo.run(2, **_fast_run_kwargs())
    assert len(bo.X) == 14 and bo.C.shape == (14, 2)
    assert all(b >= a - 1e-12 for a, b in zip(trace, trace[1:]))
    assert np.isfinite(bo.C).all()
    # the feasible-only front: every pareto() row satisfies both constraints
    X_nd, F_nd = bo.pareto()
    for x in X_nd:
        assert all(v <= 0 for v in get("bnh").con(x))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "mo_bo_bnh.npz")
        bo.save(path)
        bo2 = MO_BO.load(path, get("bnh"))
        assert np.allclose(bo2.C, bo.C)
        assert bo2.model_C_dic == bo.model_C_dic
        assert bo2.hv_trace == bo.hv_trace


def test_mo_bo_pof_bootstrap_without_feasible_point():
    """An all-infeasible DoE has no front: the loop must fall back to
    maximizing the probability of feasibility instead of crashing, and the
    DoE hypervolume is 0 (empty feasible front)."""
    problem = get("srn")
    rng = np.random.default_rng(0)
    # x1 in [0.95, 1] -> 18 <= x1' <= 20; x2 in [0, 0.05] -> x2' ~ -20:
    # ||x'|| > 15 violates g1 everywhere in this patch
    X = np.column_stack([rng.uniform(0.95, 1.0, 8),
                         rng.uniform(0.0, 0.05, 8)])
    F_rows = [problem.fun(x) for x in X]
    F = [np.asarray([r[i] for r in F_rows], dtype=float).reshape(-1, 1)
         for i in (0, 1)]
    bo = MO_BO(problem=problem, X=X, F=F, seed=0)
    assert (bo.C[:, 0] > 0).all()
    assert bo.hv_trace[0] == 0.0
    trace = bo.run(1, **_fast_run_kwargs())
    assert len(bo.X) == 9 and bo.C.shape == (9, 2)
    assert np.isfinite(trace[-1])


def test_mo_bo_validation_errors():
    with pytest.raises(ValueError):
        MO_BO()
    with pytest.raises(ValueError):
        MO_BO(problem=get("multi_obj_1D_4"))


# -- batch (q-point) infill -------------------------------------------------------

def test_mo_bo_batch_infill_spreads_and_grows():
    """batch_size=q proposes q in-batch picks per infill with the believer
    outcome added to a fantasy front + the conditioned GPR pair, so the
    re-optimized EHVI moves away from an already-picked point."""
    bo = MO_BO(problem=get("multi_obj_1D_4"), DoE_size=10, seed=0)
    n0 = len(bo.X)
    trace = bo.run(2, batch_size=3, **_fast_run_kwargs())
    assert len(bo.X) == n0 + 2 * 3
    assert len(trace) == 1 + 2 * 3        # HV recorded per evaluated point
    assert all(b >= a - 1e-12 for a, b in zip(trace, trace[1:]))
    # the last batch's picks are pairwise distinct
    batch = np.vstack(bo.added_points[-3:])
    for i in range(3):
        for j in range(i + 1, 3):
            assert abs(batch[i, 0] - batch[j, 0]) > 1e-5


def test_mo_bo_batch_lies_never_reach_archive():
    """The fantasy front/conditioning must not leak into the real archive:
    every F row equals the problem's own value at the matching X row."""
    problem = get("multi_obj_1D_4")
    bo = MO_BO(problem=problem, DoE_size=8, seed=2)
    bo.run(1, batch_size=2, **_fast_run_kwargs())
    for k, x in enumerate(bo.X):
        f = problem.fun(x)
        np.testing.assert_allclose(bo.F[0][k, 0], np.reshape(f[0], ()),
                                   rtol=1e-12)
        np.testing.assert_allclose(bo.F[1][k, 0], np.reshape(f[1], ()),
                                   rtol=1e-12)


def test_mo_bo_batch_coupled_surrogate_front_only():
    """batch_size with the coupled MO-DGP surrogate: deduplication comes
    from the fantasy front alone (no conditioning); the loop must still
    produce q distinct real evaluations per infill."""
    bo = MO_BO(problem=get("multi_obj_1D_4"), DoE_size=10,
               model_dic=_fast_spec(), seed=1)
    n0 = len(bo.X)
    trace = bo.run(1, batch_size=2, **_fast_run_kwargs())
    assert len(bo.X) == n0 + 2
    assert len(trace) == 3
    assert np.isfinite(trace[-1])


def test_mo_bo_batch_constrained():
    """Constrained batch: believer constraint rows gate the fantasy front's
    feasibility and the constraint GPRs are conditioned on their own lies."""
    bo = MO_BO(problem=get("bnh"), DoE_size=12, seed=3)
    n0 = len(bo.X)
    bo.run(1, batch_size=2, **_fast_run_kwargs())
    assert len(bo.X) == n0 + 2
    assert bo.C.shape == (n0 + 2, bo.n_con)
    assert np.all(np.isfinite(bo.hv_trace))


# -- ask/tell (suggest/observe) ---------------------------------------------------

def test_mo_bo_suggest_observe_matches_run_exactly():
    problem = get("multi_obj_1D_4")
    kw = _fast_run_kwargs()
    kw.pop("verbose")

    bo1 = MO_BO(problem=problem, DoE_size=8, seed=5)
    bo1.run(2, batch_size=2, verbose=False, **kw)

    bo2 = MO_BO(problem=problem, DoE_size=8, seed=5)
    for _ in range(2):
        X_new = bo2.suggest(batch_size=2, **kw)
        assert X_new.shape == (2, 1)
        F_new = [np.asarray([np.reshape(problem.fun(x)[i], ()) for x in X_new])
                 for i in (0, 1)]
        bo2.observe(X_new, F_new)

    np.testing.assert_array_equal(bo1.X, bo2.X)
    np.testing.assert_array_equal(bo1.F[0], bo2.F[0])
    np.testing.assert_allclose(bo1.hv_trace, bo2.hv_trace, rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(bo1._run_key),
                                  np.asarray(bo2._run_key))
    assert bo1._iteration == bo2._iteration


def test_mo_bo_observe_accepts_stacked_f():
    problem = get("multi_obj_1D_4")
    bo = MO_BO(problem=problem, DoE_size=8, seed=6)
    n0 = len(bo.X)
    X_new = np.asarray([[0.3], [0.7]])
    F_stacked = np.asarray([[0.1, 0.2], [0.3, 0.4]])
    trace = bo.observe(X_new, F_stacked)
    assert len(bo.X) == n0 + 2
    np.testing.assert_allclose(bo.F[0][-2:, 0], [0.1, 0.3])
    np.testing.assert_allclose(bo.F[1][-2:, 0], [0.2, 0.4])
    assert len(trace) == 1 + 2


def test_mo_bo_observe_constrained_requires_c():
    bo = MO_BO(problem=get("bnh"), DoE_size=10, seed=0)
    with pytest.raises(ValueError, match="constraint values"):
        bo.observe(np.asarray([[0.5, 0.5]]), np.asarray([[1.0, 2.0]]))


# -- pending registry (asynchronous ask/tell) -------------------------------------

def test_mo_bo_async_suggests_match_batch_infill():
    """suggest(1); suggest(1); observe(both) must reproduce the
    batch_size=2 trajectory exactly: the continuation reuses the trained
    batch state, fantasizes the identical believer outcome, and draws the
    identical next key."""
    problem = get("multi_obj_1D_4")
    kw = _fast_run_kwargs()
    kw.pop("verbose")

    def f_of(X_new):
        return [np.asarray([np.reshape(problem.fun(x)[i], ()) for x in X_new])
                for i in (0, 1)]

    bo1 = MO_BO(problem=problem, DoE_size=8, seed=5)
    X_b = bo1.suggest(batch_size=2, **kw)
    bo1.observe(X_b, f_of(X_b))

    bo2 = MO_BO(problem=problem, DoE_size=8, seed=5)
    xa = bo2.suggest(batch_size=1, **kw)
    assert bo2.pending.shape == (1, 1)
    xb = bo2.suggest(batch_size=1, **kw)
    X_a = np.vstack([xa, xb])
    bo2.observe(X_a, f_of(X_a))

    np.testing.assert_array_equal(X_b, X_a)
    np.testing.assert_array_equal(bo1.X, bo2.X)
    np.testing.assert_allclose(bo1.hv_trace, bo2.hv_trace, rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(bo1._run_key),
                                  np.asarray(bo2._run_key))
    assert bo1.pending.shape == bo2.pending.shape == (0, 1)


def test_mo_bo_pending_persists_and_conditions():
    """Outstanding pending points keep conditioning proposals: the second
    suggest() continues the in-progress batch (fantasy front grew by the
    first pick's believer outcome; with independent GPR surrogates the lie
    row lands in the surrogate data too), and observe() of a subset
    resolves exactly the matching entries."""
    problem = get("multi_obj_1D_4")
    kw = _fast_run_kwargs()
    kw.pop("verbose")
    bo = MO_BO(problem=problem, DoE_size=8, seed=2)
    n0 = len(bo.X)
    x1 = bo.suggest(batch_size=1, **kw)
    assert bo._bstate is not None
    rows0 = np.asarray(bo._bstate["model"][0].data[0]).shape[0]
    x2 = bo.suggest(batch_size=1, **kw)
    # continuation: same batch state, one believer row added per objective
    assert np.asarray(bo._bstate["model"][0].data[0]).shape[0] == rows0 + 1
    assert len(bo._bstate["F_fant"][0]) == n0 + 1
    assert bo.pending.shape == (2, 1)
    # resolve only the first suggestion
    F1 = [np.reshape(problem.fun(x1[0])[i], (1,)) for i in (0, 1)]
    bo.observe(x1, F1)
    assert bo.pending.shape == (1, 1)
    np.testing.assert_allclose(bo.pending, x2, atol=1e-12)
    # the still-outstanding point conditions the next fresh proposal
    bo.suggest(batch_size=1, **kw)
    assert len(bo._bstate["F_fant"][0]) == len(bo.F[0]) + 1


def test_mo_bo_pending_roundtrips_save_load():
    problem = get("multi_obj_1D_4")
    kw = _fast_run_kwargs()
    kw.pop("verbose")
    bo = MO_BO(problem=problem, DoE_size=8, seed=3)
    x1 = bo.suggest(batch_size=2, **kw)
    fd, path = tempfile.mkstemp(suffix=".npz")
    os.close(fd)
    try:
        bo.save(path)
        bo2 = MO_BO.load(path, problem)
        np.testing.assert_array_equal(bo2.pending, bo.pending)
        np.testing.assert_array_equal(bo2.pending, x1)
        # the loaded loop conditions on both outstanding points
        bo2.suggest(batch_size=1, **kw)
        assert len(bo2._bstate["F_fant"][0]) == len(bo2.F[0]) + 2
        assert bo2.pending.shape == (3, 1)
        bo2.clear_pending()
        assert bo2.pending.shape == (0, 1)
    finally:
        os.remove(path)


def test_mo_bo_pending_constrained_problem():
    """Pending registry on a CONSTRAINED MO problem: believer constraint
    rows join the fantasy feasibility column, consecutive suggests spread,
    and observe() with constraint values resolves the entries."""
    problem = get("bnh")
    kw = dict(S=40, popsize_DE=15, iterations_DE=15)
    bo = MO_BO(problem=problem, DoE_size=10, seed=1)
    x1 = bo.suggest(batch_size=1, **kw)
    x2 = bo.suggest(batch_size=1, **kw)
    assert bo.pending.shape == (2, 2)
    # the fantasy feasibility column grew with the believer rows
    assert len(bo._bstate["C_fant"]) == len(bo.C) + 1
    X_obs = np.vstack([x1, x2])
    F_obs = [np.asarray([np.reshape(problem.fun(x)[i], ()) for x in X_obs])
             for i in (0, 1)]
    C_obs = np.asarray([problem.con(x) for x in X_obs], dtype=float)
    bo.observe(X_obs, F_obs, C_obs)
    assert bo.pending.shape == (0, 2)
    assert len(bo.X) == 12
