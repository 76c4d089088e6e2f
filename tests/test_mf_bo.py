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
