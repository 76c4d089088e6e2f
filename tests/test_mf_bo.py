"""MF_BO driver (bo/mf_bo.py) — multi-fidelity BO with MF-DGP surrogates.

Beyond reference: the reference ships MF-DGP + a single-fidelity BO loop
but never the driver joining them."""

import os
import tempfile

import numpy as np
import pytest

from dgp_tpu.bo.mf_bo import MF_BO, DEFAULT_MODEL_DIC
from dgp_tpu.utils.test_functions import forrester_high, forrester_low


def _fast_spec():
    return {"num_samples": 3, "schedule": (20, 10, 10)}


def _fast_run_kwargs():
    return dict(popsize_DE=15, iterations_DE=15, num_samples=15,
                verbose=False)


def test_mf_bo_loop_runs_and_accounts():
    bo = MF_BO(fidelities=[forrester_low, forrester_high], DoE_sizes=(8, 4),
               d=1, model_dic=_fast_spec(), seed=0)
    assert bo.n_fid == 2 and bo.costs == [0.1, 1.0]
    n0 = [len(x) for x in bo.X]
    trace = bo.run(2, **_fast_run_kwargs())
    assert len(trace) == 3 and len(bo.fidelity_choices) == 2
    # exactly the chosen fidelities' archives grew
    for f in range(2):
        assert len(bo.X[f]) == n0[f] + bo.fidelity_choices.count(f)
        assert len(bo.Y[f]) == len(bo.X[f])
    # best high-fidelity value can only improve
    assert all(b <= a + 1e-12 for a, b in zip(trace, trace[1:]))
    # cost accounting = sum of the chosen fidelities' costs
    assert bo.cost_spent == pytest.approx(
        sum(bo.costs[f] for f in bo.fidelity_choices))
    assert bo.cost_trace[-1] == pytest.approx(bo.cost_spent)
    for x in np.vstack([bo.X[0][n0[0]:], bo.X[1][n0[1]:]]):
        assert np.all(x >= 0.0) and np.all(x <= 1.0)


def test_mf_bo_fidelity_rule_extremes():
    """gamma=0 (dup guard off): sigma >= 0 always, so every infill queries
    the lowest fidelity; gamma huge: no low fidelity passes, every infill
    queries the highest."""
    bo_lo = MF_BO(fidelities=[forrester_low, forrester_high],
                  DoE_sizes=(6, 3), d=1, model_dic=_fast_spec(), seed=1,
                  gamma=0.0, dup_tol=0.0)
    bo_lo.run(2, **_fast_run_kwargs())
    assert bo_lo.fidelity_choices == [0, 0]
    assert bo_lo.cost_spent == pytest.approx(0.2)
    # low-fidelity infills must not touch the high-fidelity best
    assert bo_lo.best_trace[-1] == bo_lo.best_trace[0]

    bo_hi = MF_BO(fidelities=[forrester_low, forrester_high],
                  DoE_sizes=(6, 3), d=1, model_dic=_fast_spec(), seed=1,
                  gamma=1e9)
    bo_hi.run(2, **_fast_run_kwargs())
    assert bo_hi.fidelity_choices == [1, 1]


def test_mf_bo_acquisition_dispatch_mf_dgp():
    """The acquisition layer's mf_dgp kind: pure moments match the
    wrapper's moment-matched highest-fidelity prediction."""
    import jax

    from dgp_tpu.bo.acquisition import _f_moments_pure, _model_state
    from dgp_tpu.models.dgp import moment_matched

    bo = MF_BO(fidelities=[forrester_low, forrester_high], DoE_sizes=(8, 4),
               d=1, model_dic=_fast_spec(), seed=0)
    Ys_n, _, _ = bo._normalized_Y()
    m = bo.make_model(Ys_n, seed=0)
    m.optimize_nat_adam(iterations1=10, iterations2=0, iterations3=10,
                        messages=0)
    kind, state = _model_state(m)
    assert kind == "mf_dgp"
    x = np.linspace(0, 1, 5)[:, None]
    key = jax.random.PRNGKey(7)
    mean, var = _f_moments_pure(kind, state, x, key, 64)
    m_s, v_s = m.predict_f(x, S=64)
    # not the same key -> compare statistically, generous tolerance
    mean2, var2 = moment_matched(m_s, v_s)
    assert mean.shape == mean2.shape == (5, 1)
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.asarray(var) >= 0)


def test_mf_bo_save_load_exact():
    bo = MF_BO(fidelities=[forrester_low, forrester_high], DoE_sizes=(6, 3),
               d=1, model_dic=_fast_spec(), seed=3, dup_tol=2e-3)
    bo.run(1, **_fast_run_kwargs())
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "mf_bo.npz")
        bo.save(path)
        bo2 = MF_BO.load(path, [forrester_low, forrester_high])
        assert bo2.best_trace == bo.best_trace
        assert bo2.cost_trace == bo.cost_trace
        assert bo2.fidelity_choices == bo.fidelity_choices
        assert bo2.model_dic == bo.model_dic
        assert bo2.dup_tol == bo.dup_tol == 2e-3
        assert all(np.allclose(a, b) for a, b in zip(bo2.X, bo.X))
        assert all(np.allclose(a, b) for a, b in zip(bo2._Z0, bo._Z0))
        assert np.allclose(np.asarray(bo2._run_key),
                           np.asarray(bo._run_key))


def test_mf_bo_duplicate_escalation():
    """Re-querying a deterministic source at an (almost) already-evaluated
    point is zero information: _select_fidelity must skip past a fidelity
    whose archive already contains x_new, even at gamma=0 (which otherwise
    always picks the lowest). A fresh point at gamma=0 still picks 0."""
    bo = MF_BO(fidelities=[forrester_low, forrester_high], DoE_sizes=(6, 3),
               d=1, model_dic=_fast_spec(), seed=5, gamma=0.0)
    Ys_n, _, _ = bo._normalized_Y()
    m = bo.make_model(Ys_n, seed=0)
    m.optimize_nat_adam(iterations1=5, iterations2=0, iterations3=0,
                        messages=0)
    x_dup = bo.X[0][2].reshape(1, -1) + 1e-5  # inside the dup tolerance
    assert bo._select_fidelity(m, x_dup) == 1
    # a point far from every low-fidelity archive row stays at fidelity 0
    xs = np.sort(bo.X[0].ravel())
    gaps = np.diff(xs)
    x_fresh = np.array([[xs[int(np.argmax(gaps))] + gaps.max() / 2.0]])
    assert bo._select_fidelity(m, x_fresh) == 0


def test_mf_bo_three_fidelity_loop():
    """n_fid=3 end-to-end (AR1 surrogate): default geometric cost ladder
    (0.01, 0.1, 1.0), per-level accounting, only top-fidelity evaluations
    move the best trace."""
    from dgp_tpu.bo.mf_bo import MF_BO

    def mid(x):
        return 0.5 * (forrester_low(x) + forrester_high(x))

    bo = MF_BO(fidelities=[forrester_low, mid, forrester_high],
               DoE_sizes=(8, 5, 3), d=1,
               model_dic={"type": "ar1", "n_starts": 3, "iterations": 100},
               seed=0)
    assert bo.costs == [0.01, 0.1, 1.0]
    n0 = [len(x) for x in bo.X]
    trace = bo.run(3, popsize_DE=15, iterations_DE=15, num_samples=15,
                   verbose=False)
    assert len(trace) == 4 and len(bo.fidelity_choices) == 3
    for f in range(3):
        assert len(bo.X[f]) == n0[f] + bo.fidelity_choices.count(f)
    assert bo.cost_spent == pytest.approx(
        sum(bo.costs[f] for f in bo.fidelity_choices))
    assert all(b <= a + 1e-12 for a, b in zip(trace, trace[1:]))


def test_mf_bo_validation_errors():
    with pytest.raises(ValueError, match="fidelities"):
        MF_BO(fidelities=[forrester_high], DoE_sizes=(4,), d=1)
    with pytest.raises(ValueError, match="DoE_sizes"):
        MF_BO(fidelities=[forrester_low, forrester_high])
    with pytest.raises(ValueError, match="ascending"):
        MF_BO(fidelities=[forrester_low, forrester_high], costs=[1.0, 0.1],
              DoE_sizes=(4, 2), d=1)
    # the shipped default is the bake-off winner (mf_bo_bakeoff.json)
    assert DEFAULT_MODEL_DIC["type"] == "ar1"


# -- ask/tell (suggest/observe) ---------------------------------------------------

def test_mf_bo_suggest_observe_matches_run_exactly():
    """suggest()+observe() with externally computed values reproduces
    run()'s trajectory bit-exactly (same key stream + infill counter)."""
    kw = _fast_run_kwargs()
    kw.pop("verbose")
    fids = [forrester_low, forrester_high]

    bo1 = MF_BO(fidelities=fids, DoE_sizes=(8, 4), d=1,
                model_dic=_fast_spec(), seed=3)
    bo1.run(2, verbose=False, **kw)

    bo2 = MF_BO(fidelities=fids, DoE_sizes=(8, 4), d=1,
                model_dic=_fast_spec(), seed=3)
    for _ in range(2):
        x_new, f = bo2.suggest(**kw)
        assert x_new.shape == (1, 1) and f in (0, 1)
        y_new = np.asarray(fids[f](x_new), dtype=float).reshape(1, 1)
        bo2.observe(x_new, y_new, f)

    for f in range(2):
        np.testing.assert_array_equal(bo1.X[f], bo2.X[f])
        np.testing.assert_array_equal(bo1.Y[f], bo2.Y[f])
    assert bo1.fidelity_choices == bo2.fidelity_choices
    np.testing.assert_allclose(bo1.best_trace, bo2.best_trace)
    np.testing.assert_array_equal(np.asarray(bo1._run_key),
                                  np.asarray(bo2._run_key))


def test_mf_bo_observe_validates_fidelity():
    bo = MF_BO(fidelities=[forrester_low, forrester_high], DoE_sizes=(6, 3),
               d=1, model_dic=_fast_spec(), seed=0)
    with pytest.raises(ValueError, match="fidelity"):
        bo.observe(np.asarray([[0.5]]), np.asarray([[1.0]]), 2)
    # a low-fidelity observation accounts cost but keeps the best trace
    best0 = bo.best_trace[-1]
    bo.observe(np.asarray([[0.5]]), np.asarray([[-100.0]]), 0)
    assert bo.best_trace[-1] == best0
    assert bo.cost_spent == pytest.approx(bo.costs[0])


def test_mf_bo_ic_dispatch():
    """suggest(IC=...) honors the criterion: WB2 runs (distinct engine from
    EI), unknown names raise instead of silently optimizing EI."""
    spec = {"type": "ar1", "n_starts": 2, "iterations": 60}
    bo = MF_BO(fidelities=[forrester_low, forrester_high], DoE_sizes=(6, 3),
               d=1, model_dic=spec, seed=3)
    x, f = bo.suggest(IC="WB2", popsize_DE=12, iterations_DE=10,
                      num_samples=8)
    assert x.shape == (1, 1) and 0.0 <= x.item() <= 1.0 and f in (0, 1)
    with pytest.raises(ValueError, match="unknown IC"):
        bo.suggest(IC="LCB", popsize_DE=12, iterations_DE=10, num_samples=8)


def test_mf_bo_wb2s_with_ar1_surrogate():
    """WB2S's adaptive-scale resolution routes through the generic
    _predict_y_moments dispatch, which must handle the MF surrogates
    (ar1 default here) — not just gpr/dgp."""
    spec = {"type": "ar1", "n_starts": 2, "iterations": 60}
    bo = MF_BO(fidelities=[forrester_low, forrester_high], DoE_sizes=(6, 3),
               d=1, model_dic=spec, seed=5)
    x, f = bo.suggest(IC="WB2S", popsize_DE=12, iterations_DE=10,
                      num_samples=8)
    assert x.shape == (1, 1) and 0.0 <= x.item() <= 1.0 and f in (0, 1)


# -- batch (q-point) infill --------------------------------------------------------

def test_mf_bo_batch_infill_spreads_and_accounts():
    """batch_size=q proposes q picks per round with believer conditioning
    between them (exact for the AR1 surrogate): the picks are pairwise
    distinct, every pick's archive/cost bookkeeping lands, and the round
    advances the infill counter once."""
    spec = {"type": "ar1", "n_starts": 3, "iterations": 150}
    bo = MF_BO(fidelities=[forrester_low, forrester_high], DoE_sizes=(6, 3),
               d=1, model_dic=spec, seed=0)
    n0 = [len(x) for x in bo.X]
    bo.run(1, batch_size=3, popsize_DE=20, iterations_DE=20, num_samples=15,
           verbose=False)
    assert bo._iteration == 1
    assert len(bo.fidelity_choices) == 3
    assert sum(len(bo.X[f]) - n0[f] for f in range(2)) == 3
    assert bo.cost_spent == pytest.approx(
        sum(bo.costs[f] for f in bo.fidelity_choices))
    new_rows = np.vstack([bo.X[0][n0[0]:], bo.X[1][n0[1]:]])
    d01 = np.abs(new_rows[:, None, 0] - new_rows[None, :, 0])
    iu = np.triu_indices(3, k=1)
    assert np.min(d01[iu]) > 1e-4


def test_mf_bo_batch_lies_never_reach_archive():
    """Fantasy rows condition only the in-batch surrogate copy; the real
    archives hold exactly the evaluated points."""
    spec = {"type": "ar1", "n_starts": 2, "iterations": 100}
    bo = MF_BO(fidelities=[forrester_low, forrester_high], DoE_sizes=(6, 3),
               d=1, model_dic=spec, seed=1)
    bo.run(1, batch_size=2, popsize_DE=15, iterations_DE=15, num_samples=10,
           verbose=False)
    for f in range(2):
        for i in range(len(bo.X[f])):
            want = np.asarray(
                [forrester_low, forrester_high][f](bo.X[f][i:i + 1]),
                dtype=float).reshape(1, 1)
            np.testing.assert_allclose(bo.Y[f][i:i + 1], want, atol=1e-10)


# -- pending registry (asynchronous ask/tell) --------------------------------------

def test_mf_bo_async_suggests_match_batch_infill():
    """suggest(1); suggest(1); observe(both) reproduces the batch_size=2
    trajectory exactly (same surrogate state, same key stream)."""
    spec = {"type": "ar1", "n_starts": 2, "iterations": 100}
    kw = dict(popsize_DE=15, iterations_DE=15, num_samples=10)

    def evaluate(X, fids):
        return np.vstack([
            np.asarray([forrester_low, forrester_high][f](X[i:i + 1]),
                       dtype=float).reshape(1, 1)
            for i, f in enumerate(fids)])

    bo1 = MF_BO(fidelities=[forrester_low, forrester_high], DoE_sizes=(6, 3),
                d=1, model_dic=spec, seed=7)
    Xb, fb = bo1.suggest(batch_size=2, **kw)
    bo1.observe(Xb, evaluate(Xb, fb), fb)

    bo2 = MF_BO(fidelities=[forrester_low, forrester_high], DoE_sizes=(6, 3),
                d=1, model_dic=spec, seed=7)
    xa, fa = bo2.suggest(batch_size=1, **kw)
    assert bo2.pending_X.shape == (1, 1)
    xc, fc = bo2.suggest(batch_size=1, **kw)
    Xa = np.vstack([xa, xc])
    fids = [fa, fc]
    bo2.observe(Xa, evaluate(Xa, fids), fids)

    np.testing.assert_array_equal(Xb, Xa)
    assert list(fb) == fids
    assert all(np.array_equal(a, b) for a, b in zip(bo1.X, bo2.X))
    np.testing.assert_array_equal(np.asarray(bo1._run_key),
                                  np.asarray(bo2._run_key))
    assert bo1.pending_X.shape == bo2.pending_X.shape == (0, 1)
    assert bo1._iteration == bo2._iteration == 1


def test_mf_bo_pending_roundtrips_save_load():
    spec = {"type": "ar1", "n_starts": 2, "iterations": 100}
    kw = dict(popsize_DE=15, iterations_DE=15, num_samples=10)
    bo = MF_BO(fidelities=[forrester_low, forrester_high], DoE_sizes=(6, 3),
               d=1, model_dic=spec, seed=4)
    x1, f1 = bo.suggest(**kw)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "mf_pending.npz")
        bo.save(path)
        bo2 = MF_BO.load(path, [forrester_low, forrester_high])
        np.testing.assert_array_equal(bo2.pending_X, bo.pending_X)
        np.testing.assert_array_equal(bo2.pending_f, bo.pending_f)
        np.testing.assert_array_equal(bo2.pending_X, x1)
        # the loaded loop conditions on the outstanding lie: the in-batch
        # surrogate data grew by one row at the pending fidelity
        bo2.suggest(**kw)
        Xs, _ = bo2._bstate["model"].data
        assert Xs[int(f1)].shape[0] == len(bo2.X[int(f1)]) + 1
        assert bo2.pending_X.shape == (2, 1)
        bo2.clear_pending()
        assert bo2.pending_X.shape == (0, 1)


# -- constrained MF-BO -------------------------------------------------------------

def _ring_con(x):
    """Feasible iff x >= 0.55 (keeps the Forrester optimum x*=0.757)."""
    return 0.55 - np.asarray(x)[:, 0]


def test_mf_bo_constrained_loop():
    """Constrained MF-BO: EV and PoF handling both run end-to-end, the
    best trace tracks only FEASIBLE top-fidelity values, and constraint
    archives stay aligned with the per-fidelity X archives."""
    for handling in ("EV", "PoF"):
        bo = MF_BO(fidelities=[forrester_low, forrester_high],
                   DoE_sizes=(8, 4), d=1,
                   model_dic={"type": "ar1", "n_starts": 2,
                              "iterations": 100},
                   constraints=[_ring_con], seed=0)
        assert bo.n_con == 1
        for f in range(2):
            assert bo.C[f].shape == (len(bo.X[f]), 1)
        trace = bo.run(2, constraint_handling=handling, popsize_DE=20,
                       iterations_DE=20, num_samples=10, verbose=False)
        assert all(b <= a + 1e-12 for a, b in zip(trace, trace[1:]))
        # every recorded best is a feasible top-fidelity value (or the
        # bootstrap max while none is feasible)
        feas = bo.C[-1].max(axis=1) <= 0
        if feas.any():
            assert trace[-1] == pytest.approx(float(bo.Y[-1][feas].min()))
        for f in range(2):
            assert bo.C[f].shape == (len(bo.X[f]), 1)


def test_mf_bo_constrained_save_load():
    bo = MF_BO(fidelities=[forrester_low, forrester_high], DoE_sizes=(6, 3),
               d=1, model_dic={"type": "ar1", "n_starts": 2,
                               "iterations": 80},
               constraints=[_ring_con], seed=2)
    bo.run(1, popsize_DE=12, iterations_DE=10, num_samples=8, verbose=False)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "mf_con.npz")
        bo.save(path)
        bo2 = MF_BO.load(path, [forrester_low, forrester_high],
                         constraints=[_ring_con])
        assert all(np.allclose(a, b) for a, b in zip(bo2.C, bo.C))
        assert bo2.best_trace == bo.best_trace


# -- embedded-mapping (variant-dimension) surrogate --------------------------------

def _park_vd_low(x2d):
    """2-D low-fidelity source (Park-like, unit box)."""
    x = np.asarray(x2d, dtype=float)
    return (np.sin(3.0 * x[:, :1]) + 0.5 * x[:, 1:2]).reshape(-1, 1)


def _park_vd_high(x4d):
    """4-D high-fidelity source whose first two dims follow the low one."""
    x = np.asarray(x4d, dtype=float)
    return (np.sin(3.0 * x[:, :1]) + 0.5 * x[:, 1:2]
            + 0.25 * x[:, 2:3] * x[:, 3:4]).reshape(-1, 1)


def test_mf_bo_em_surrogate_variant_dims():
    """{'type': 'em'} wires models/mf_dgp_em.py in for fidelity stacks
    with DIFFERENT input dimensions (reference MF_DGP_EM.py:383): the
    acquisition runs on the top-fidelity posterior through the reduction
    chain, low fidelities are queried through the projection."""
    rng = np.random.default_rng(0)
    X_low = rng.uniform(0, 1, (10, 2))
    X_high = rng.uniform(0, 1, (5, 4))
    proj = lambda x: np.asarray(x)[:, :2]
    bo = MF_BO(fidelities=[_park_vd_low, _park_vd_high],
               X=[X_low, X_high],
               Y=[_park_vd_low(X_low), _park_vd_high(X_high)],
               model_dic={"type": "em", "num_samples": 3,
                          "schedule": (15, 5, 10)},
               projections=[proj], seed=0, gamma=0.05)
    assert bo.d == 4
    n0 = [len(x) for x in bo.X]
    trace = bo.run(2, popsize_DE=12, iterations_DE=10, num_samples=8,
                   verbose=False)
    assert len(trace) == 3 and len(bo.fidelity_choices) == 2
    for f, dim in ((0, 2), (1, 4)):
        assert bo.X[f].shape[1] == dim
        assert len(bo.X[f]) == n0[f] + bo.fidelity_choices.count(f)
    assert all(np.isfinite(v) for v in trace)


def test_mf_bo_em_validation():
    with pytest.raises(ValueError, match="'em'"):
        # variant dims without the em surrogate
        MF_BO(fidelities=[_park_vd_low, _park_vd_high],
              X=[np.random.uniform(0, 1, (6, 2)),
                 np.random.uniform(0, 1, (3, 4))],
              Y=[np.zeros((6, 1)), np.zeros((3, 1))],
              model_dic={"type": "ar1"}, seed=0)
    with pytest.raises(ValueError, match="constraints"):
        MF_BO(fidelities=[_park_vd_low, _park_vd_high],
              X=[np.random.uniform(0, 1, (6, 2)),
                 np.random.uniform(0, 1, (3, 4))],
              Y=[np.zeros((6, 1)), np.zeros((3, 1))],
              model_dic={"type": "em"},
              constraints=[lambda x: -np.ones(len(x))],
              projections=[lambda x: np.asarray(x)[:, :2]], seed=0)


# -- round-5 review fixes ----------------------------------------------------------

def test_mf_bo_x_best_is_feasible():
    """x_best must match best_trace's convention: the best FEASIBLE
    top-fidelity input, not the unconstrained argmin."""
    X = [np.asarray([[0.1], [0.4], [0.6], [0.9]]),
         np.asarray([[0.2], [0.5], [0.8]])]
    Y = [forrester_low(x) for x in X[:1]] + [forrester_high(X[1])]
    Y = [forrester_low(X[0]), np.asarray([[3.0], [-1.0], [2.0]])]
    bo = MF_BO(fidelities=[forrester_low, forrester_high], X=X, Y=Y,
               constraints=[_ring_con], seed=0)
    # constraint: feasible iff x >= 0.55 -> rows 0.2, 0.5 infeasible; the
    # unconstrained argmin (y=-1 at x=0.5) is infeasible, so x_best is the
    # best feasible row (x=0.8, y=2.0) and best_trace agrees
    assert float(bo.x_best[0]) == pytest.approx(0.8)
    assert bo.best_trace[0] == pytest.approx(2.0)


def test_mf_bo_dup_guard_sees_pending():
    """The duplicate-escalation guard must treat in-flight pending points
    as committed queries: a proposal within dup_tol of a pending low-fid
    query escalates even though the archive does not hold it yet."""
    spec = {"type": "ar1", "n_starts": 2, "iterations": 80}
    bo = MF_BO(fidelities=[forrester_low, forrester_high], DoE_sizes=(6, 3),
               d=1, model_dic=spec, seed=5, gamma=0.0)
    Ys_n, _, _ = bo._normalized_Y()
    m = bo.make_model(Ys_n, seed=0)
    m.optimize(n_starts=2, iterations=50, seed=0)
    # a fresh point at gamma=0 picks fidelity 0...
    xs = np.sort(bo.X[0].ravel())
    gaps = np.diff(xs)
    x_fresh = np.array([[xs[int(np.argmax(gaps))] + gaps.max() / 2.0]])
    assert bo._select_fidelity(m, x_fresh) == 0
    # ...but with the same point pending at fidelity 0, it escalates
    extras = [(x_fresh, 0)]
    assert bo._select_fidelity(m, x_fresh + 1e-5, extra_queries=extras) == 1


def test_mf_bo_constrained_load_never_reevaluates(tmp_path):
    """load() of a constrained checkpoint must take the archived constraint
    values instead of re-running the (potentially expensive) callables
    over the whole archive."""
    calls = {"n": 0}

    def counting_con(x):
        calls["n"] += 1
        return _ring_con(x)

    bo = MF_BO(fidelities=[forrester_low, forrester_high], DoE_sizes=(6, 3),
               d=1, model_dic={"type": "ar1", "n_starts": 2,
                               "iterations": 60},
               constraints=[counting_con], seed=2)
    n_init = calls["n"]
    assert n_init > 0
    path = str(tmp_path / "mf_con2.npz")
    bo.save(path)
    bo2 = MF_BO.load(path, [forrester_low, forrester_high],
                     constraints=[counting_con])
    assert calls["n"] == n_init  # zero constraint calls during load
    assert all(np.allclose(a, b) for a, b in zip(bo2.C, bo.C))


def test_mf_bo_suggest_accepts_run_kwargs():
    """suggest() advertises run()'s keyword arguments; verbose= must not
    raise (MO_BO shares the fix)."""
    spec = {"type": "ar1", "n_starts": 2, "iterations": 60}
    bo = MF_BO(fidelities=[forrester_low, forrester_high], DoE_sizes=(6, 3),
               d=1, model_dic=spec, seed=3)
    x, f = bo.suggest(popsize_DE=10, iterations_DE=8, num_samples=8,
                      verbose=False)
    assert x.shape == (1, 1) and f in (0, 1)


def test_mf_bo_variational_lie_preserves_posterior():
    """Round-5 review fix: the believer-lie refit on variational (mf_dgp/
    em) surrogates must WARM-refit — the staged optimize_nat_adam would
    first re-init q (q_mu<-Y, q_sqrt *= 1e-2*var, likelihood reset) and
    wreck the trained posterior mid-batch. The lie must leave the trained
    q_sqrt scale intact (the old path collapsed it ~100x)."""
    import jax.numpy as jnp

    bo = MF_BO(fidelities=[forrester_low, forrester_high], DoE_sizes=(6, 3),
               d=1, model_dic={"num_samples": 3, "schedule": (20, 10, 10)},
               seed=0)
    st = bo._fresh_batch_state("EI")
    n0 = float(jnp.linalg.norm(st["model"].params.layers[0].q_sqrt))
    bo._lie_at(st, np.asarray([[0.4]]), 1, "believer",
               lie_train_iterations=2)
    n1 = float(jnp.linalg.norm(st["model"].params.layers[0].q_sqrt))
    assert n1 > 0.5 * n0, (n0, n1)
    # and the lie row actually landed in the surrogate data
    assert st["model"]._X[1].shape[0] == len(bo.X[1]) + 1


def test_mf_bo_resolve_pending_is_fidelity_aware():
    """The same top-space x can be pending at two fidelities; an
    observation pops only its own (row, fidelity) entry."""
    spec = {"type": "ar1", "n_starts": 2, "iterations": 40}
    bo = MF_BO(fidelities=[forrester_low, forrester_high], DoE_sizes=(6, 3),
               d=1, model_dic=spec, seed=0)
    bo.pending_X = np.asarray([[0.5], [0.5]])
    bo.pending_f = np.asarray([0, 1])
    bo.observe(np.asarray([[0.5]]), np.asarray([[1.0]]), 1)
    assert bo.pending_X.shape == (1, 1)
    assert list(bo.pending_f) == [0]


def test_mf_bo_projections_length_validated():
    with pytest.raises(ValueError, match="projections"):
        MF_BO(fidelities=[forrester_low, forrester_low, forrester_high],
              DoE_sizes=(6, 4, 3), d=1,
              model_dic={"type": "ar1", "n_starts": 2, "iterations": 40},
              projections=[lambda x: x], seed=0)
