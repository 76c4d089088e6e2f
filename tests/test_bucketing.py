"""Shape bucketing + compiled-engine caching for growing BO datasets.

The reference's BO loop grows N by one per infill (SO_BO.py:315-350) and
retrains eagerly, so it never faces XLA's static-shape constraint. Here the
surrogate training/prediction programs are compiled, so N must be padded to
buckets (models/training.pad_to_bucket, models/gpr._masked_gram) and the
engines cached (training._ENGINE_CACHE) for a long BO run not to recompile
every iteration (SURVEY.md §7.3 'Dynamic BO loop vs XLA static shapes').
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgp_tpu.models import training
from dgp_tpu.models.dgp import DGP, elbo
from dgp_tpu.models.gpr import GPR, neg_log_marginal_likelihood, predict_f
from dgp_tpu.ops import kernels as kernels_lib
from dgp_tpu.ops.likelihoods import Gaussian

HALF_LOG_2PI = 0.9189385332046727


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(13, 2))
    Y = np.sin(X[:, :1]) + 0.1 * rng.normal(size=(13, 1))
    return X, Y


def _dgp(X, Y, **kw):
    kerns = [kernels_lib.by_name("rbf", X.shape[1]), kernels_lib.by_name("rbf", 1)]
    return DGP(X, Y, X.copy(), kerns, [1], Gaussian.create(1.0), **kw)


def test_pad_to_bucket_shapes(data):
    X, Y = data
    Xp, Yp, w = training.pad_to_bucket(jnp.asarray(X), jnp.asarray(Y), 8)
    assert Xp.shape == (16, 2) and Yp.shape == (16, 1)
    assert float(w.sum()) == 13 and bool((w[:13] == 1).all()) and bool((w[13:] == 0).all())
    # already on a boundary: unchanged
    Xb, _, wb = training.pad_to_bucket(jnp.asarray(X[:8]), jnp.asarray(Y[:8]), 8)
    assert Xb.shape == (8, 2) and float(wb.sum()) == 8


def test_elbo_unit_weights_identity(data):
    X, Y = data
    m = _dgp(X, Y, num_samples=3)
    Xj, Yj = m.data
    key = jax.random.PRNGKey(1)
    e0 = float(elbo(m.params, Xj, Yj, key, 3))
    e1 = float(elbo(m.params, Xj, Yj, key, 3, row_weights=jnp.ones(13)))
    assert abs(e0 - e1) < 1e-10


def test_elbo_padded_rows_contribute_nothing(data):
    X, Y = data
    m = _dgp(X, Y, num_samples=3)
    Xj, Yj = m.data
    Xp, Yp, w = training.pad_to_bucket(Xj, Yj, 8)
    # swap the pad Y values: the weighted data term must not change
    key = jax.random.PRNGKey(2)
    e_a = float(elbo(m.params, Xp, Yp, key, 3, row_weights=w))
    Yp_b = Yp.at[13:].set(123.0)
    e_b = float(elbo(m.params, Xp, Yp_b, key, 3, row_weights=w))
    assert abs(e_a - e_b) < 1e-10


def test_gpr_masked_nmll_exact_decoupling(data):
    X, Y = data
    g = GPR((X, Y), kernels_lib.by_name("rbf", 2), noise_variance=1e-3)
    Xj, Yj = g.data
    Xp, Yp, w = training.pad_to_bucket(Xj, Yj, 8)
    f0 = float(neg_log_marginal_likelihood(g.params, Xj, Yj))
    fp = float(neg_log_marginal_likelihood(g.params, Xp, Yp, w))
    const = (Xp.shape[0] - 13) * Yj.shape[1] * HALF_LOG_2PI
    assert abs((fp - const) - f0) < 1e-8
    g0 = jax.grad(lambda p: neg_log_marginal_likelihood(p, Xj, Yj))(g.params)
    gp = jax.grad(lambda p: neg_log_marginal_likelihood(p, Xp, Yp, w))(g.params)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)


def test_gpr_padded_posterior_exact(data):
    X, Y = data
    g = GPR((X, Y), kernels_lib.by_name("rbf", 2), noise_variance=1e-3)
    Xj, Yj = g.data
    Xp, Yp, w = training.pad_to_bucket(Xj, Yj, 8)
    Xs = np.random.default_rng(3).normal(size=(5, 2))
    m0, v0 = predict_f(g.params, (Xj, Yj), Xs)
    mp, vp = predict_f(g.params, (Xp, Yp, w), Xs)
    np.testing.assert_allclose(np.asarray(m0), np.asarray(mp), atol=1e-10)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(vp), atol=1e-10)


def test_engine_cache_reused_across_retrains(data):
    X, Y = data
    rng = np.random.default_rng(4)
    training.clear_engine_cache()
    m = _dgp(X, Y, num_samples=2, n_bucket=8)
    m.optimize_nat_adam(iterations1=2, iterations2=2, messages=0)
    assert training.engine_cache_size() == 2  # adam + nat_adam engines
    # grow by one point (still inside the 16-row bucket) and retrain:
    X2 = np.vstack([X, rng.normal(size=(1, 2))])
    Y2 = np.vstack([Y, [[0.0]]])
    m.data = (jnp.asarray(X2), jnp.asarray(Y2))
    m.optimize_nat_adam(iterations1=2, iterations2=2, messages=0)
    assert training.engine_cache_size() == 2  # no new engines
    # a *fresh instance* of the same architecture also reuses the engines
    m2 = _dgp(X2, Y2, num_samples=2, n_bucket=8)
    m2.optimize_nat_adam(iterations1=2, iterations2=2, messages=0)
    assert training.engine_cache_size() == 2


def test_bucketed_training_matches_unbucketed_loss_scale(data):
    """Bucketed and unbucketed training minimize the same objective: at
    identical params the two losses agree (the MC keys differ only through
    array shapes, so compare at large S)."""
    X, Y = data
    m = _dgp(X, Y, num_samples=2, n_bucket=8)
    loss_fn, batch = m._loss_spec()
    key = jax.random.PRNGKey(5)
    lb = float(loss_fn(m.params, key, batch))
    m_plain = _dgp(X, Y, num_samples=2)
    loss_fn2, batch2 = m_plain._loss_spec()
    # padded draws differ from unpadded draws sample-by-sample; at init the
    # ELBO is draw-independent to high accuracy (prior-matched layers), so a
    # tight comparison is valid here.
    lp = float(loss_fn2(m_plain.params, key, batch2))
    assert abs(lb - lp) < 1e-6


def test_minibatch_with_traced_n(data):
    X, Y = data
    m = _dgp(X, Y, num_samples=2, minibatch_size=4, n_bucket=8)
    losses = m.optimize_adam(iterations=5, messages=0)
    assert np.isfinite(np.asarray(losses)).all()


def test_so_bo_bucketed_smoke():
    """Constrained SO_BO run with n_bucket: engines stay cached across
    infills and the loop still descends."""
    from dgp_tpu.bo.so_bo import SO_BO

    class Problem:
        dim = 1
        constraint = True

        def fun(self, x):
            return [(x - 0.5) ** 2, np.where(x > 0.25, -1.0, 1.0)]

    spec = {"num_layers": 0, "kernels": "rbf"}
    bo = SO_BO(problem=Problem(), DoE_size=5, model_Y_dic=spec,
               model_C_dic=spec, seed=0, n_bucket=8)
    assert bo.model_Y.n_bucket == 8
    bo.run(3, IC="EI", constraint_handling="EV", train_iterations=60,
           popsize_DE=20, iterations_DE=15, iterations_adam=20,
           IC_method="DE", verbose=False)
    assert len(bo.Ymin) == 4
    assert np.isfinite(bo.Ymin).all()
