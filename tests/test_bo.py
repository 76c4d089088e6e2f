import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgp_tpu.bo import de
from dgp_tpu.bo.acquisition import EI, EV, PoF, WB2, WB2S, EV_one_constraint
from dgp_tpu.bo.doe import lhs
from dgp_tpu.bo.so_bo import SO_BO
from dgp_tpu.models.gpr import GPR
from dgp_tpu.ops import kernels as K


def test_de_minimizes_shifted_sphere():
    target = jnp.asarray([1.3, -0.7, 0.4])

    def fn(x):  # [P, 3] -> [P]
        return jnp.sum((x - target) ** 2, axis=1)

    res = de.minimize(fn, jnp.zeros(3), jax.random.PRNGKey(0),
                      population_size=60, max_iterations=150)
    np.testing.assert_allclose(np.asarray(res.position), np.asarray(target),
                               atol=1e-3)


def test_adam_refine_polishes():
    target = jnp.asarray([0.5, -0.25])

    def fn(x):
        return jnp.sum((x - target) ** 2, axis=1)

    v, obj = de.adam_refine(fn, jnp.zeros(2), iterations=800, lr=0.05)
    np.testing.assert_allclose(np.asarray(v), np.asarray(target), atol=1e-3)


def test_lhs_stratification():
    X = lhs(3, 20, seed=0)
    assert X.shape == (20, 3)
    for j in range(3):
        counts, _ = np.histogram(X[:, j], bins=20, range=(0, 1))
        assert np.all(counts == 1)


@pytest.fixture(scope="module")
def gpr_model():
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, (25, 1))
    Y = (X - 0.5) ** 2 + 0.001 * rng.normal(size=X.shape)
    m = GPR((X, Y), K.RBF.create(lengthscales=[0.3], variance=0.1),
            noise_variance=1e-4)
    m.optimize_adam(iterations=300, lr=0.02)
    return m


def test_ei_analytic_matches_mc(gpr_model):
    """Analytic EI must agree with a direct Monte-Carlo estimate of
    E[max(y_min - Y, 0)] under the predictive Gaussian."""
    x = jnp.asarray([[0.3], [0.5], [0.9]])
    y_min = 0.05
    ei = EI(y_min, 1)
    analytic = -np.asarray(ei.run(gpr_model, x))
    mean, var = gpr_model.predict_y(x)
    rng = np.random.default_rng(1)
    samples = np.asarray(mean)[None] + np.sqrt(np.asarray(var))[None] * \
        rng.normal(size=(200000,) + mean.shape)
    mc = np.maximum(y_min - samples, 0).mean(axis=0)
    np.testing.assert_allclose(analytic, mc, rtol=0.05, atol=1e-4)


def test_ev_analytic_matches_mc(gpr_model):
    x = jnp.asarray([[0.2], [0.6]])
    zero_c = 0.08
    ev = EV_one_constraint(zero_c, 1)
    analytic = np.asarray(ev.run(gpr_model, x, analytic=True))
    mean, var = gpr_model.predict_y(x)
    rng = np.random.default_rng(2)
    samples = np.asarray(mean)[None] + np.sqrt(np.asarray(var))[None] * \
        rng.normal(size=(200000,) + mean.shape)
    mc = np.maximum(samples - zero_c, 0).mean(axis=0)
    np.testing.assert_allclose(analytic, mc, rtol=0.05, atol=1e-4)


def test_pof_is_probability(gpr_model):
    x = jnp.asarray([[0.1], [0.5], [0.95]])
    pof = PoF(np.asarray([0.05]), 1)
    p = np.asarray(pof.run([gpr_model], x))
    assert np.all(p >= 0) and np.all(p <= 1)
    mean, var = gpr_model.predict_y(x)
    from scipy.stats import norm as snorm

    expected = snorm.cdf((0.05 - np.asarray(mean)) / np.sqrt(np.asarray(var)))
    np.testing.assert_allclose(p, expected, rtol=1e-6)


def test_ei_optimize_finds_minimum_region(gpr_model):
    """The surrogate models (x-0.5)^2; EI with a mediocre y_min should pick a
    point near the true minimum x=0.5."""
    ei = EI(0.02, 1)
    x_opt = ei.optimize(gpr_model, (np.zeros(1), np.ones(1)), popsize_DE=50,
                        iterations_DE=60, method="DE",
                        key=jax.random.PRNGKey(0))
    assert x_opt.shape == (1, 1)
    assert abs(float(x_opt[0, 0]) - 0.5) < 0.15


def test_wb2_runs(gpr_model):
    w = WB2(0.02, 1)
    out = np.asarray(w.run(gpr_model, jnp.asarray([[0.4]])))
    assert out.shape == (1, 1) and np.isfinite(out).all()


class _ConstrainedProblem:
    """nb_dgp_BO cell 5: min (x-0.5)^2 s.t. step(x-0.25) <= 0."""

    def __init__(self):
        self.constraint = True
        self.dim = 1

    def fun(self, x):
        return [(x - 0.5) ** 2, np.where(x > 0.25, 1.0, 0.0)]


def test_so_bo_end_to_end_gpr():
    """Shortened nb_dgp_BO: GPR objective + GPR constraint, EV handling.
    The optimum is x=0.25, f=0.0625 (published Ymin reaches 0.06256/0.06888)."""
    problem = _ConstrainedProblem()
    spec = {"num_layers": 0, "kernels": "rbf"}
    bo = SO_BO(problem=problem, DoE_size=6, model_Y_dic=spec,
               model_C_dic=spec, seed=3)
    bo.run(4, IC="EI", constraint_handling="EV", train_iterations=200,
           popsize_DE=40, popstd_DE=3.0, iterations_DE=50, IC_method="DE",
           verbose=False)
    assert len(bo.Ymin) == 5
    assert np.all(np.diff(bo.Ymin) <= 1e-12)  # monotone non-increasing
    # every recorded Ymin is a feasible objective value
    assert bo.Ymin[-1] >= 0.0625 - 1e-6
    assert bo.Ymin[-1] < 0.2


def test_so_bo_unconstrained_pof_branch():
    class Unconstrained:
        constraint = False
        dim = 1

        def fun(self, x):
            return [(x - 0.3) ** 2]

    spec = {"num_layers": 0, "kernels": "matern52"}
    bo = SO_BO(problem=Unconstrained(), DoE_size=5, model_Y_dic=spec, seed=0)
    bo.run(2, IC="EI", train_iterations=150, popsize_DE=30, iterations_DE=40,
           IC_method="DE", verbose=False)
    assert bo.Ymin[-1] <= bo.Ymin[0] + 1e-12


def test_so_bo_with_dgp_surrogate():
    """Exercises make_model's num_layers>=1 branch inside the BO loop (the
    notebook's DGP constraint model, nb_dgp_BO cell 11) with tiny budgets."""
    problem = _ConstrainedProblem()
    spec_gp = {"num_layers": 0, "kernels": "rbf"}
    spec_dgp = {"num_layers": 1, "num_units": 1, "kernels": "rbf",
                "num_samples": 3}
    bo = SO_BO(problem=problem, DoE_size=6, model_Y_dic=spec_gp,
               model_C_dic=spec_dgp, seed=5)
    assert bo.model_C[0].name == "dgp"
    bo.run(1, IC="EI", constraint_handling="EV", train_iterations=40,
           popsize_DE=20, iterations_DE=15, IC_method="DE", verbose=False)
    assert len(bo.Ymin) == 2
    assert np.isfinite(bo.Ymin[-1])


def test_ei_nonanalytic_and_adam_refinement(gpr_model):
    """MC-EI (analytic=False, Infill_criteria.py:48-51) + DE+Adam method."""
    ei = EI(0.05, 1)
    out = np.asarray(ei.run(gpr_model, jnp.asarray([[0.4], [0.9]]),
                            analytic=False, num_samples=400,
                            key=jax.random.PRNGKey(0)))
    assert out.shape == (2, 1) and np.all(np.isfinite(out))
    assert out[0, 0] < out[1, 0]  # x=0.4 (near optimum) has higher EI
    x_opt = ei.optimize(gpr_model, (np.zeros(1), np.ones(1)), popsize_DE=30,
                        iterations_DE=30, iterations_adam=100,
                        method="DE+Adam", key=jax.random.PRNGKey(1))
    assert abs(float(x_opt[0, 0]) - 0.5) < 0.2


def test_wb2s_optimize(gpr_model):
    w = WB2S(0.02, 1, scale=2.0)
    x_opt = w.optimize(gpr_model, (np.zeros(1), np.ones(1)), popsize_DE=30,
                       iterations_DE=30, method="DE",
                       key=jax.random.PRNGKey(0))
    assert x_opt.shape == (1, 1) and 0 <= float(x_opt[0, 0]) <= 1


def test_ev_multiple_constraints(gpr_model):
    ev = EV(np.array([0.05, 0.1]), 1)
    out = np.asarray(ev.run([gpr_model, gpr_model],
                            jnp.asarray([[0.3], [0.7]]),
                            key=jax.random.PRNGKey(0)))
    assert out.shape == (2, 2)
    assert np.all(out >= 0)


def test_so_bo_from_scratch_rebuild():
    """The from_scratch branch rebuilds both models and retrains
    (SO_BO.py:277-292; the reference discarded the rebuilt objective)."""
    problem = _ConstrainedProblem()
    spec = {"num_layers": 0, "kernels": "rbf"}
    bo = SO_BO(problem=problem, DoE_size=6, model_Y_dic=spec,
               model_C_dic=spec, seed=9)
    first_model = bo.model_Y
    bo.run(3, from_scratch=2, IC="EI", constraint_handling="EV",
           train_iterations=100, popsize_DE=20, iterations_DE=15,
           IC_method="DE", verbose=False)
    # iteration 2 (j=2, j%2==0, j!=0) must have rebuilt the objective model
    assert bo.model_Y is not first_model
    assert len(bo.Ymin) == 4



def test_so_bo_two_constraints():
    """Multi-constraint bookkeeping through the full loop (the reference's
    multi-constraint rebind was broken, SO_BO.py:291)."""

    class TwoConstraints:
        constraint = True
        dim = 1

        def fun(self, x):
            g1 = np.where(x > 0.6, 1.0, -1.0)   # feasible x <= 0.6
            g2 = np.where(x < 0.1, 1.0, -1.0)   # feasible x >= 0.1
            return [(x - 0.4) ** 2, np.concatenate([g1, g2], axis=-1)]

    spec = {"num_layers": 0, "kernels": "rbf"}
    bo = SO_BO(problem=TwoConstraints(), DoE_size=8, model_Y_dic=spec,
               model_C_dic=spec, seed=2)
    assert len(bo.model_C) == 2
    assert bo.C.shape == (8, 2)
    bo.run(3, IC="EI", constraint_handling="EV", train_iterations=150,
           popsize_DE=30, iterations_DE=25, IC_method="DE", verbose=False)
    assert bo.C.shape == (11, 2)
    assert np.all(np.diff(bo.Ymin) <= 1e-12)
    # the recorded minimum is feasible for BOTH constraints
    i_best = np.argmin(np.where(bo.C.max(axis=1) <= 0, bo.Y[:, 0], np.inf))
    assert bo.C[i_best].max() <= 0


def test_wb2s_auto_scale(gpr_model):
    """Adaptive WB2S (Bartoli et al.): s = beta*|mean(x*_EI)|/EI* resolved
    from a short EI pre-optimization; numeric scales bypass resolution."""
    w = WB2S(0.02, 1)  # default scale="auto"
    assert w._scale_value is None
    s = w.resolve_scale(gpr_model, (np.zeros(1), np.ones(1)),
                        key=jax.random.PRNGKey(0), popsize_DE=20,
                        iterations_DE=20)
    assert np.isfinite(s) and s > 0
    assert w.resolve_scale(gpr_model, (np.zeros(1), np.ones(1))) == s  # cached
    x_opt = w.optimize(gpr_model, (np.zeros(1), np.ones(1)), popsize_DE=20,
                       iterations_DE=20, method="DE",
                       key=jax.random.PRNGKey(1))
    assert x_opt.shape == (1, 1) and 0 <= float(x_opt[0, 0]) <= 1
    # numeric scale: no resolution needed, used verbatim
    w2 = WB2S(0.02, 1, scale=3.5)
    assert w2._effective_scale() == 3.5


def test_acquisition_engines_cached_across_calls(gpr_model):
    """Two optimize calls reuse the jitted DE program (bo/de engine cache)."""
    from dgp_tpu.bo import de as de_mod
    from dgp_tpu.bo.acquisition import EI

    de_mod.clear_engine_cache()
    ei = EI(0.02, 1)
    ei.optimize(gpr_model, (np.zeros(1), np.ones(1)), popsize_DE=20,
                iterations_DE=10, method="DE", key=jax.random.PRNGKey(0))
    n1 = de_mod.engine_cache_size()
    ei2 = EI(0.015, 1)  # fresh IC object, new y_min — same program
    ei2.optimize(gpr_model, (np.zeros(1), np.ones(1)), popsize_DE=20,
                 iterations_DE=10, method="DE", key=jax.random.PRNGKey(1))
    assert de_mod.engine_cache_size() == n1 == 1


def test_so_bo_checkpoint_resume_exact(tmp_path):
    """save() + load() + continue == uninterrupted run, exactly: the data
    archive, surrogate params and PRNG stream position all round-trip
    (GPR surrogates are deterministic given data + key stream)."""
    from dgp_tpu.bo.so_bo import SO_BO

    class Problem:
        dim = 1
        constraint = True

        def fun(self, x):
            return [(x - 0.5) ** 2, np.where(x > 0.25, -1.0, 1.0)]

    spec = {"num_layers": 0, "kernels": "rbf"}
    kw = dict(model_Y_dic=spec, model_C_dic=spec, seed=3, n_bucket=8)
    run_kw = dict(IC="EI", constraint_handling="EV", train_iterations=60,
                  popsize_DE=20, iterations_DE=15, iterations_adam=20,
                  IC_method="DE", verbose=False)

    ref = SO_BO(problem=Problem(), DoE_size=5, **kw)
    ref.run(3, **run_kw)

    bo = SO_BO(problem=Problem(), DoE_size=5, **kw)
    bo.run(2, **run_kw)
    path = str(tmp_path / "bo.npz")
    bo.save(path)
    bo2 = SO_BO.load(path, Problem(), spec, spec)
    # restored state matches the saved loop
    np.testing.assert_array_equal(bo2.X, bo.X)
    np.testing.assert_array_equal(np.asarray(bo2._run_key),
                                  np.asarray(bo._run_key))
    for a, b in zip(jax.tree_util.tree_leaves(bo2.model_Y.params),
                    jax.tree_util.tree_leaves(bo.model_Y.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    bo2.run(1, **run_kw)
    np.testing.assert_allclose(bo2.X, ref.X, atol=1e-12)
    np.testing.assert_allclose(np.asarray(bo2.Ymin), np.asarray(ref.Ymin),
                               atol=1e-12)


def test_ei_finite_at_zero_variance(gpr_model):
    """Sigma floor: an exact-interpolation point (var -> 0) must not produce
    NaN acquisition values (they would poison the DE population)."""
    X_train = np.asarray(gpr_model.data[0])
    ei = EI(0.05, 1)
    out = np.asarray(ei.run(gpr_model, jnp.asarray(X_train[:3])))
    assert np.all(np.isfinite(out))
    # direct zero-variance check on the raw formula
    from dgp_tpu.bo.acquisition import _expected_improvement

    v = _expected_improvement(jnp.asarray(0.1), jnp.asarray([0.2]),
                              jnp.asarray([0.0]))
    assert np.isfinite(np.asarray(v)).all()


def test_pof_clamps_positive_ic_loss(gpr_model):
    """PoF weighting is only order-preserving for non-positive losses; a
    positive WB2 loss must be clamped to 0 before the PoF product so
    infeasible bad regions can never outscore feasible mediocre ones."""
    w = WB2(-10.0, 1)  # absurd y_min makes EI ~ 0 => loss = +mean > 0 wherever mean > 0
    pof = PoF(np.asarray([0.05]), 1)
    x = jnp.linspace(0.05, 0.95, 7).reshape(-1, 1)
    out = np.asarray(pof.run_with_IC(w, gpr_model, [gpr_model], x,
                                     key=jax.random.PRNGKey(0)))
    assert np.all(out <= 0.0)


def test_denormalize_roundtrip_constant_column():
    """A constant DoE column must round-trip through normalize_X/denormalize
    (raw std would pin the coordinate to the column mean)."""
    from dgp_tpu.bo.so_bo import denormalize, normalize_X

    X = np.column_stack([np.linspace(0, 1, 6), np.full(6, 0.7)])
    X_n, _, _ = normalize_X(X)
    np.testing.assert_allclose(denormalize(X_n, X), X, atol=1e-12)
    # a *moved* normalized coordinate in the constant column must move back
    x_new = np.array([[0.3, 0.2]])
    assert denormalize(x_new, X)[0, 1] != denormalize(
        np.array([[0.3, -0.4]]), X)[0, 1]


def test_add_point_feasible_archive_stays_2d():
    """The reference's axis-less np.append flattened Xfeasible after the
    first feasible infill, corrupting it for d > 1 (SO_BO.py:332-333)."""

    class Problem2D:
        constraint = True
        dim = 2

        def fun(self, x):
            return [np.sum((x - 0.4) ** 2, axis=-1, keepdims=True),
                    np.full((x.shape[0], 1), -1.0)]  # always feasible

    spec = {"num_layers": 0, "kernels": "rbf"}
    bo = SO_BO(problem=Problem2D(), DoE_size=6, model_Y_dic=spec,
               model_C_dic=spec, seed=1)
    bo.run(2, IC="EI", constraint_handling="EV", train_iterations=60,
           popsize_DE=15, iterations_DE=10, IC_method="DE", verbose=False)
    assert bo.Xfeasible.ndim == 2 and bo.Xfeasible.shape[1] == 2
    assert bo.Yfeasible.ndim == 2 and bo.Yfeasible.shape[1] == 1
    assert bo.Xfeasible.shape[0] == bo.X.shape[0]  # all points feasible


def test_adam_refine_objective_matches_final_position():
    """The reported objective must be evaluated AT the returned position,
    not one optimizer step earlier."""
    target = jnp.asarray([0.2, -0.6])

    def fn(x, args):
        return jnp.sum((x - args) ** 2, axis=1)

    v, obj = de.adam_refine(fn, jnp.ones(2), iterations=50, lr=0.1,
                            fn_args=target)
    np.testing.assert_allclose(float(obj), float(fn(v[None], target)[0]),
                               rtol=1e-12)


def test_training_surfaces_nonfinite_loss():
    """A diverged phase (NaN losses) must raise a RuntimeWarning naming the
    first bad step (SURVEY.md §5 failure-detection commitment)."""
    import warnings

    from dgp_tpu.models import training

    params = jnp.asarray(1.0)

    def bad_loss(p, key):
        return p * jnp.nan

    mask = True
    with pytest.warns(RuntimeWarning, match="non-finite"):
        training.adam_run(bad_loss, params, mask, jax.random.PRNGKey(0),
                          steps=3, lr=0.1)


# -- batch (q-point) infill -------------------------------------------------------

def test_so_bo_batch_infill_unconstrained_spreads():
    """batch_size=q proposes q DISTINCT points per infill: the Kriging-
    Believer lie collapses EI at an already-picked point, so the re-
    optimized acquisition must move away from it (Ginsbourger et al. 2010)."""

    class Unconstrained:
        constraint = False
        dim = 1

        def fun(self, x):
            return [(x - 0.3) ** 2]

    spec = {"num_layers": 0, "kernels": "rbf"}
    kw = dict(IC="EI", train_iterations=150, popsize_DE=30, iterations_DE=40,
              IC_method="DE", batch_size=3, verbose=False)
    bo = SO_BO(problem=Unconstrained(), DoE_size=6, model_Y_dic=spec, seed=1)
    bo.run(1, **kw)
    # the q picks of the FIRST infill (real posterior uncertainty) are
    # pairwise distinct in normalized coords; by later infills the optimum
    # is exploited, the posterior collapses, and clustering is legitimate
    batch = np.asarray(bo.added_points)
    assert batch.shape == (3, 1)
    d01 = abs(batch[0, 0] - batch[1, 0])
    d02 = abs(batch[0, 0] - batch[2, 0])
    d12 = abs(batch[1, 0] - batch[2, 0])
    assert min(d01, d02, d12) > 1e-4
    bo.run(1, **kw)
    # archive grows by q per infill; Ymin traces every evaluated point
    assert bo.X.shape == (12, 1)
    assert len(bo.Ymin) == 1 + 2 * 3
    assert np.all(np.diff(bo.Ymin) <= 1e-12)


def test_so_bo_batch_lies_never_reach_archive():
    """Fantasized observations condition the surrogates only: the real
    archive must contain exactly the problem's own values at bo.X, and the
    surrogate data must be rebound to the real archive after the batch."""

    class Tracked:
        constraint = False
        dim = 1

        def __init__(self):
            self.calls = []

        def fun(self, x):
            self.calls.append(np.asarray(x).copy())
            return [(x - 0.3) ** 2]

    problem = Tracked()
    spec = {"num_layers": 0, "kernels": "rbf"}
    bo = SO_BO(problem=problem, DoE_size=5, model_Y_dic=spec, seed=2)
    bo.run(1, IC="EI", train_iterations=100, popsize_DE=25, iterations_DE=30,
           IC_method="DE", batch_size=2, lie="believer", verbose=False)
    # every archive row is a REAL evaluation
    np.testing.assert_allclose(bo.Y, (bo.X - 0.3) ** 2, rtol=1e-12)
    # surrogate data was rebound to the real (normalized) archive
    Xm, Ym = bo.model_Y.data
    assert Xm.shape[0] == bo.X.shape[0]
    np.testing.assert_allclose(np.asarray(Xm), bo.X_train, rtol=1e-12)


@pytest.mark.parametrize("lie", ["min", "max"])
def test_so_bo_batch_constant_liar(lie):
    class Unconstrained:
        constraint = False
        dim = 1

        def fun(self, x):
            return [np.sin(5.0 * x) + (x - 0.4) ** 2]

    spec = {"num_layers": 0, "kernels": "matern52"}
    bo = SO_BO(problem=Unconstrained(), DoE_size=6, model_Y_dic=spec, seed=4)
    bo.run(1, IC="EI", train_iterations=100, popsize_DE=25, iterations_DE=30,
           IC_method="DE", batch_size=2, lie=lie, verbose=False)
    assert bo.X.shape == (8, 1)
    assert np.all(np.isfinite(bo.Ymin))


def test_so_bo_batch_constrained():
    """Constrained batch: the believer lie conditions BOTH the objective and
    the constraint surrogates; feasibility bookkeeping stays per-point."""
    problem = _ConstrainedProblem()
    spec = {"num_layers": 0, "kernels": "rbf"}
    bo = SO_BO(problem=problem, DoE_size=6, model_Y_dic=spec,
               model_C_dic=spec, seed=3)
    bo.run(2, IC="EI", constraint_handling="EV", train_iterations=150,
           popsize_DE=30, iterations_DE=30, IC_method="DE", batch_size=2,
           verbose=False)
    assert bo.X.shape == (10, 1)
    assert bo.C.shape == (10, 1)
    assert len(bo.Ymin) == 1 + 2 * 2
    assert np.all(np.diff(bo.Ymin) <= 1e-12)
    # recorded minimum is feasible
    i_best = np.argmin(np.where(bo.C.max(axis=1) <= 0, bo.Y[:, 0], np.inf))
    assert bo.C[i_best].max() <= 0


def test_so_bo_batch_unknown_lie_raises():
    class Unconstrained:
        constraint = False
        dim = 1

        def fun(self, x):
            return [(x - 0.3) ** 2]

    spec = {"num_layers": 0, "kernels": "rbf"}
    bo = SO_BO(problem=Unconstrained(), DoE_size=5, model_Y_dic=spec, seed=0)
    with pytest.raises(ValueError, match="unknown lie"):
        bo.run(1, IC="EI", train_iterations=50, popsize_DE=20,
               iterations_DE=10, IC_method="DE", batch_size=2,
               lie="bogus", verbose=False)


# -- ask/tell (suggest/observe) ---------------------------------------------------

def test_so_bo_suggest_observe_matches_run_exactly():
    """suggest()+observe() with externally computed values must reproduce
    run()'s trajectory bit-exactly: same key stream, same infill counter,
    same archive bookkeeping."""

    class Unconstrained:
        constraint = False
        dim = 1

        def fun(self, x):
            return [(x - 0.3) ** 2]

    spec = {"num_layers": 0, "kernels": "rbf"}
    kw = dict(IC="EI", train_iterations=100, popsize_DE=25, iterations_DE=30,
              IC_method="DE")

    bo1 = SO_BO(problem=Unconstrained(), DoE_size=6, model_Y_dic=spec, seed=7)
    bo1.run(2, batch_size=2, verbose=False, **kw)

    bo2 = SO_BO(problem=Unconstrained(), DoE_size=6, model_Y_dic=spec, seed=7)
    for _ in range(2):
        X_new = bo2.suggest(batch_size=2, **kw)
        assert X_new.shape == (2, 1)
        bo2.observe(X_new, (X_new - 0.3) ** 2)

    np.testing.assert_array_equal(bo1.X, bo2.X)
    np.testing.assert_array_equal(bo1.Y, bo2.Y)
    np.testing.assert_array_equal(np.asarray(bo1.Ymin), np.asarray(bo2.Ymin))
    np.testing.assert_array_equal(np.asarray(bo1._run_key),
                                  np.asarray(bo2._run_key))
    assert bo1._iteration == bo2._iteration


def test_so_bo_observe_constrained_requires_c():
    problem = _ConstrainedProblem()
    spec = {"num_layers": 0, "kernels": "rbf"}
    bo = SO_BO(problem=problem, DoE_size=6, model_Y_dic=spec,
               model_C_dic=spec, seed=1)
    x = np.asarray([[0.2]])
    with pytest.raises(ValueError, match="constraint values"):
        bo.observe(x, np.asarray([[0.01]]))
    bo.observe(x, np.asarray([[0.01]]), np.asarray([[-1.0]]))
    assert bo.X.shape == (7, 1) and bo.C.shape == (7, 1)
    assert bo.Ymin[-1] <= 0.01 + 1e-12


class _Offset100:
    """Unconstrained 1-D quadratic with values ~100 — exposes output-space
    mismatches between the surrogate and the incumbent."""

    constraint = False
    dim = 1

    def fun(self, x):
        return [100.0 * (x - 0.3) ** 2 + 100.0]


def test_so_bo_wb2_family_unconstrained():
    """IC='WB2'/'WB2S' must work on unconstrained problems: SO_BO passes
    analytic= to whichever IC the user picked, and WB2/WB2S accept (and
    ignore) it instead of raising TypeError."""
    spec = {"num_layers": 0, "kernels": "rbf"}
    bo = SO_BO(problem=_Offset100(), DoE_size=6, model_Y_dic=spec, seed=0)
    bo.run(1, IC="WB2", train_iterations=80, popsize_DE=15, iterations_DE=15,
           IC_method="DE", verbose=False)
    bo.run(1, IC="WB2S", train_iterations=80, popsize_DE=15, iterations_DE=15,
           IC_method="DE", verbose=False)
    assert bo.X.shape == (8, 1)


def test_so_bo_raw_units_incumbent_when_unnormalized():
    """With normalize_input=False the surrogate trains on raw Y, so the
    incumbent fed to EI must be the raw observed minimum (a normalized
    incumbent against raw-unit predictions flattens the EI surface)."""
    spec = {"num_layers": 0, "kernels": "rbf"}
    bo = SO_BO(problem=_Offset100(), DoE_size=6, model_Y_dic=spec, seed=0,
               normalize_input=False)
    bo.suggest(train_iterations=80, popsize_DE=15, iterations_DE=15,
               IC_method="DE")
    assert float(bo.IC.y_min) == pytest.approx(float(np.min(bo.Y)))


def test_so_bo_pending_points_persist_as_lies():
    """Suggested-but-unobserved points persist in the pending registry: a
    later suggest() conditions on ALL of them as believer lies (the second
    call continues the in-progress batch — 6 real rows + 3 outstanding
    lies), and clear_pending() + a fresh proposal rebinds the surrogate to
    the real archive (fantasy rows are never trained on as observations)."""
    spec = {"num_layers": 0, "kernels": "rbf"}
    kw = dict(train_iterations=80, popsize_DE=15, iterations_DE=15,
              IC_method="DE")
    bo = SO_BO(problem=_Offset100(), DoE_size=6, model_Y_dic=spec, seed=0)
    bo.suggest(batch_size=3, **kw)
    assert bo.pending.shape == (3, 1)
    assert np.asarray(bo.model_Y.data[0]).shape[0] == 8  # 6 + 2 in-batch lies
    bo.suggest(batch_size=1, **kw)
    assert bo.pending.shape == (4, 1)
    # continuation conditioned on the 3rd outstanding point before picking
    assert np.asarray(bo.model_Y.data[0]).shape[0] == 9
    bo.clear_pending()
    assert bo.pending.shape == (0, 1)
    bo.suggest(batch_size=1, **kw)
    # fresh training rebound to the real archive; only the new pick pends
    np.testing.assert_allclose(np.asarray(bo.model_Y.data[0]), bo.X_train,
                               rtol=1e-12)
    assert bo.pending.shape == (1, 1)


class _DoubleWell:
    """Two equal minima at x=0.25 and x=0.75. With a SPARSE DoE (4 points,
    seed 5: one well sampled, the other uncertain) the believer lie at the
    first pick moves the EI mass decisively to the unexplored region — a
    robust spread oracle. Dense DoEs fully resolve this smooth function
    (posterior variance ~0 everywhere), after which any acquisition
    legitimately has nothing left to spread over."""

    constraint = False
    dim = 1

    def fun(self, x):
        return [100.0 * (x - 0.25) ** 2 * (x - 0.75) ** 2]


def test_so_bo_back_to_back_suggests_spread():
    """Two suggest(1) calls without an observe() must propose DIFFERENT
    points: the first pick's believer lie collapses EI there (data row +
    fantasy incumbent), so the second pick moves to the unexplored region
    (the async-lab workflow, VERDICT r4 item 1). Before the pending
    registry the second call re-proposed the same point to DE resolution
    (~2e-9)."""
    spec = {"num_layers": 0, "kernels": "rbf"}
    kw = dict(train_iterations=150, popsize_DE=40, popstd_DE=3.0,
              iterations_DE=60, IC_method="DE")
    bo = SO_BO(problem=_DoubleWell(), DoE_size=4, model_Y_dic=spec, seed=5)
    x1 = bo.suggest(batch_size=1, **kw)
    x2 = bo.suggest(batch_size=1, **kw)
    assert abs(float(x1[0, 0]) - float(x2[0, 0])) > 0.05
    assert bo.pending.shape == (2, 1)


def test_so_bo_async_suggests_match_batch_infill():
    """suggest(1); suggest(1); observe(both) must reproduce the
    batch_size=2 trajectory exactly: the continuation reuses the trained
    surrogate, applies the identical believer lie, and draws the identical
    next key, so resolving all pending recovers the one-call batch."""

    class Unconstrained:
        constraint = False
        dim = 1

        def fun(self, x):
            return [(x - 0.3) ** 2]

    spec = {"num_layers": 0, "kernels": "rbf"}
    kw = dict(IC="EI", train_iterations=100, popsize_DE=25, iterations_DE=30,
              IC_method="DE")

    bo1 = SO_BO(problem=Unconstrained(), DoE_size=6, model_Y_dic=spec, seed=7)
    X_b = bo1.suggest(batch_size=2, **kw)
    bo1.observe(X_b, (X_b - 0.3) ** 2)

    bo2 = SO_BO(problem=Unconstrained(), DoE_size=6, model_Y_dic=spec, seed=7)
    xa = bo2.suggest(batch_size=1, **kw)
    xb = bo2.suggest(batch_size=1, **kw)
    X_a = np.vstack([xa, xb])
    bo2.observe(X_a, (X_a - 0.3) ** 2)

    np.testing.assert_array_equal(X_b, X_a)
    np.testing.assert_array_equal(bo1.X, bo2.X)
    np.testing.assert_array_equal(np.asarray(bo1._run_key),
                                  np.asarray(bo2._run_key))
    assert bo1.pending.shape == bo2.pending.shape == (0, 1)
    assert bo1._iteration == bo2._iteration


def test_so_bo_observe_resolves_only_matching_pending():
    """observe() removes exactly the pending entries it matches; unmatched
    observations are external data and leave the rest outstanding."""
    spec = {"num_layers": 0, "kernels": "rbf"}
    kw = dict(train_iterations=80, popsize_DE=15, iterations_DE=15,
              IC_method="DE")
    bo = SO_BO(problem=_Offset100(), DoE_size=6, model_Y_dic=spec, seed=0)
    X_s = bo.suggest(batch_size=2, **kw)
    # resolve only the second suggestion + inject one external point
    x_ext = np.asarray([[0.123]])
    X_obs = np.vstack([X_s[1:2], x_ext])
    bo.observe(X_obs, 100.0 * (X_obs - 0.3) ** 2 + 100.0)
    assert bo.pending.shape == (1, 1)
    np.testing.assert_allclose(bo.pending, X_s[0:1], atol=1e-12)
    assert bo.X.shape == (8, 1)
    # the still-outstanding point conditions the next proposal
    bo.suggest(batch_size=1, **kw)
    assert np.asarray(bo.model_Y.data[0]).shape[0] == 9  # 8 real + 1 lie


def test_so_bo_pending_roundtrips_save_load(tmp_path):
    """save()/load() must round-trip the pending registry, and the loaded
    loop's next proposal must avoid the outstanding point."""
    spec = {"num_layers": 0, "kernels": "rbf"}
    kw = dict(train_iterations=150, popsize_DE=40, popstd_DE=3.0,
              iterations_DE=60, IC_method="DE")

    bo = SO_BO(problem=_DoubleWell(), DoE_size=4, model_Y_dic=spec, seed=5)
    x1 = bo.suggest(batch_size=1, **kw)
    path = str(tmp_path / "pending.npz")
    bo.save(path)
    bo2 = SO_BO.load(path, _DoubleWell(), spec)
    np.testing.assert_array_equal(bo2.pending, bo.pending)
    np.testing.assert_array_equal(bo2.pending, x1)
    x2 = bo2.suggest(batch_size=1, **kw)
    assert abs(float(x2[0, 0]) - float(x1[0, 0])) > 0.05
    # loaded loop conditioned on the outstanding lie before picking
    assert np.asarray(bo2.model_Y.data[0]).shape[0] == 5


def test_so_bo_from_scratch_zero_means_never():
    """from_scratch=0 is 'never rebuild' (like None), not a modulo-zero
    crash on the second infill."""
    spec = {"num_layers": 0, "kernels": "rbf"}
    bo = SO_BO(problem=_Offset100(), DoE_size=6, model_Y_dic=spec, seed=0)
    bo.run(2, from_scratch=0, train_iterations=80, popsize_DE=15,
           iterations_DE=15, IC_method="DE", verbose=False)
    assert bo.X.shape == (8, 1)


def test_so_bo_batch_dgp_believer_preserves_posterior():
    """Round-4 regression: the in-batch believer refit must NOT re-apply the
    1e-3 inner-q_sqrt shrink (an at-init stabilizer, dgp.py:268-269) — each
    lie used to collapse the trained DGP inner posterior by exactly 1e-3,
    so a q=3 batch computed picks 2 and 3 against a 1e-6x overconfident
    surrogate."""

    class Unconstrained:
        constraint = False
        dim = 1

        def fun(self, x):
            return [(x - 0.3) ** 2]

    spec = {"num_layers": 1, "num_units": 1, "kernels": "rbf",
            "num_samples": 3}
    bo = SO_BO(problem=Unconstrained(), DoE_size=6, model_Y_dic=spec, seed=2)
    bo.model_Y.optimize_nat_adam(iterations1=5, iterations2=0, messages=0)
    n0 = float(jnp.linalg.norm(bo.model_Y.params.layers[0].q_sqrt))
    bo._apply_lie(np.array([[0.5]]), "believer", lie_train_iterations=2)
    n1 = float(jnp.linalg.norm(bo.model_Y.params.layers[0].q_sqrt))
    # a 2-step lr=0.01 refit moves the norm slightly; the old bug left it at
    # exactly 1e-3 * n0
    assert n1 > 0.5 * n0


def test_acquisition_rejects_unknown_surrogate_kind():
    """_model_state fails at the dispatch boundary for wrappers it does not
    support instead of mis-treating their params pytree as a plain DGP's.
    (MF-DGP-EM became a supported kind in round 5 — MF_BO's 'em' surrogate.)"""
    from dgp_tpu.bo.acquisition import _model_state

    class FakeModel:
        name = "frobnicator"
        params = None

    with pytest.raises(ValueError, match="unsupported surrogate kind"):
        _model_state(FakeModel())


def test_so_bo_run_respects_outstanding_pending():
    """run() after a dangling suggest(): the fresh proposal conditions on
    the outstanding believer lie (avoids the in-flight point), evaluates
    only its own pick, and leaves the pending entry outstanding."""
    spec = {"num_layers": 0, "kernels": "rbf"}
    kw = dict(train_iterations=150, popsize_DE=40, popstd_DE=3.0,
              iterations_DE=60, IC_method="DE")
    bo = SO_BO(problem=_DoubleWell(), DoE_size=4, model_Y_dic=spec, seed=5)
    x1 = bo.suggest(batch_size=1, **kw)
    bo.run(1, verbose=False, **kw)
    # archive grew by exactly run's one evaluation; suggest's point is
    # still awaiting its external result
    assert bo.X.shape == (5, 1)
    assert bo.pending.shape == (1, 1)
    np.testing.assert_allclose(bo.pending, x1, atol=1e-12)
    # run's pick avoided the pending point (the lie moved EI away)
    assert abs(float(bo.X[-1, 0]) - float(x1[0, 0])) > 0.05


def test_so_bo_constrained_lie_gates_incumbent():
    """An INFEASIBLE believer lie must not drop the in-batch EI incumbent
    (the incumbent is the best FEASIBLE value); a feasible one does."""
    problem = _ConstrainedProblem()  # feasible iff x <= 0.25
    spec = {"num_layers": 0, "kernels": "rbf"}
    bo = SO_BO(problem=problem, DoE_size=8, model_Y_dic=spec,
               model_C_dic=spec, seed=3)
    bo.suggest(batch_size=1, train_iterations=150, popsize_DE=20,
               iterations_DE=20, IC_method="DE")
    y0 = float(bo.IC.y_min)
    # deep in the infeasible region: objective mean is low there (min at
    # x=0.5) so an ungated update would drop y_min
    bo._apply_lie(bo._normalize_x(np.asarray([[0.5]])), "believer", None)
    assert float(bo.IC.y_min) == pytest.approx(y0)
    # feasible region lie: the gate lets the believed value through
    bo._apply_lie(bo._normalize_x(np.asarray([[0.2]])), "believer", None)
    assert float(bo.IC.y_min) <= y0 + 1e-12
