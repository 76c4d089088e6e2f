import numpy as np
import jax
import jax.numpy as jnp

from dgp_tpu.bo.doe import lhs
from dgp_tpu.models import mf_dgp
from dgp_tpu.models.mf_dgp import MultiFidelityDeepGP
from dgp_tpu.utils.test_functions import calculate_metrics, park_high, park_low


def park_data(n_low=30, n_high=5, n_test=200, seed=123):
    X = [lhs(4, n_low, seed=seed), lhs(4, n_high, seed=seed + 1)]
    Y = [park_low(X[0]), park_high(X[1])]
    x_test = lhs(4, n_test, seed=seed + 2)
    y_test = park_high(x_test)
    return X, Y, x_test, y_test


def test_construction_and_augmented_shapes():
    X, Y, _, _ = park_data()
    m = MultiFidelityDeepGP(X, Y)
    assert len(m.params.layers) == 2
    l1 = m.params.layers[1]
    assert l1.augmented and l1.z is None
    assert l1.z_left.shape == (5, 4)
    # q_sqrt was initialized from the full (augmented) Kuu
    assert l1.q_sqrt.shape == (1, 5, 5)
    zs = mf_dgp.compute_full_zs(m.params.layers, jax.random.PRNGKey(0))
    assert zs[0].shape == (30, 4)
    assert zs[1].shape == (5, 5)  # [Z_left, Z_right]


def test_elbo_finite_and_z_left_receives_gradients():
    X, Y, _, _ = park_data()
    m = MultiFidelityDeepGP(X, Y)
    Xs, Ys = tuple(m._X), tuple(m._Y)
    key = jax.random.PRNGKey(0)
    val = float(mf_dgp.elbo(m.params, Xs, Ys, key, 5))
    assert np.isfinite(val)
    g = jax.grad(lambda p: mf_dgp.elbo(p, Xs, Ys, key, 5))(m.params)
    gz = np.asarray(g.layers[1].z_left)
    # gradients must flow into Z_left through both the concat and the
    # recomputed Z_right propagation (MF_DGP.py:204-207 semantics)
    assert np.any(gz != 0)
    assert np.all(np.isfinite(gz))


def test_train_upto_fidelity():
    X, Y, _, _ = park_data()
    m = MultiFidelityDeepGP(X, Y)
    Xs, Ys = tuple(m._X), tuple(m._Y)
    key = jax.random.PRNGKey(1)
    only_low = float(mf_dgp.elbo(m.params, Xs, Ys, key, 3, train_upto_fidelity=0))
    full = float(mf_dgp.elbo(m.params, Xs, Ys, key, 3))
    assert np.isfinite(only_low) and np.isfinite(full)
    assert only_low != full


def test_predict_shapes():
    X, Y, x_test, _ = park_data()
    m = MultiFidelityDeepGP(X, Y)
    mean, var = m.predict(x_test[:7])
    assert mean.shape == (7, 1) and var.shape == (7, 1)
    assert np.all(np.isfinite(mean)) and np.all(var > 0)
    # low-fidelity prediction path
    Fm, Fv = m.predict_f(x_test[:7], S=4, fidelity=0)
    assert Fm.shape == (4, 7, 1)


def test_mf_dgp_learns_park():
    """Abbreviated nb_mfdgp_improved: the full schedule (1000/2000/6000)
    reaches r2=0.985 (published); a short schedule must already beat a
    high-fidelity-only baseline soundly."""
    X, Y, x_test, y_test = park_data()
    m = MultiFidelityDeepGP(X, Y, num_samples=5)
    m.optimize_nat_adam(lr_adam=0.005, iterations1=150, iterations2=150,
                        iterations3=400, messages=0)
    mean, var = m.predict(x_test)
    metrics = calculate_metrics(y_test, mean, var)
    assert np.isfinite(metrics["mnll"])
    assert metrics["r2"] > 0.7, metrics


def test_three_fidelity_chain():
    """Three fidelities exercise the deep augmented-Z path (z_right's
    [points, zr] concat branch for j >= 1, MF_DGP.py:42-43) that two-fidelity
    models never reach."""
    rng = np.random.default_rng(7)
    X = [rng.uniform(0, 1, (20, 2)), rng.uniform(0, 1, (10, 2)),
         rng.uniform(0, 1, (5, 2))]
    f = lambda x: np.sin(3 * x[:, :1]) + x[:, 1:]
    Y = [f(X[0]) + 0.3, f(X[1]) + 0.1 * X[1][:, :1], f(X[2])]
    m = MultiFidelityDeepGP(X, Y, num_samples=3)
    assert len(m.params.layers) == 3
    zs = mf_dgp.compute_full_zs(m.params.layers, jax.random.PRNGKey(0))
    assert zs[0].shape == (20, 2)
    assert zs[1].shape == (10, 3)
    assert zs[2].shape == (5, 3)
    Xs, Ys = tuple(m._X), tuple(m._Y)
    key = jax.random.PRNGKey(1)
    val = float(mf_dgp.elbo(m.params, Xs, Ys, key, 3))
    assert np.isfinite(val)
    g = jax.grad(lambda p: mf_dgp.elbo(p, Xs, Ys, key, 3))(m.params)
    for i in (1, 2):
        gz = np.asarray(g.layers[i].z_left)
        assert np.all(np.isfinite(gz)) and np.any(gz != 0)
    # middle-fidelity prediction
    Fm, Fv = m.predict_f(X[2], S=3, fidelity=1)
    assert Fm.shape == (3, 5, 1)
    mean, var = m.predict(X[2])
    assert mean.shape == (5, 1) and np.all(np.isfinite(mean))


def test_full_cov_prediction_path():
    """Model-level full-covariance prediction (the reference's
    predict_y(..., full_cov=True) option, MF_DGP.py:238-240)."""
    X, Y, x_test, _ = park_data(n_low=15, n_high=4)
    m = MultiFidelityDeepGP(X, Y, num_samples=2)
    ym, yv = m.predict_y(x_test[:6], num_samples=2, full_cov=True)
    assert ym.shape == (2, 6, 1)
    assert yv.shape == (2, 6, 6, 1)
    d = np.diagonal(np.asarray(yv)[..., 0], axis1=1, axis2=2)
    assert np.all(np.isfinite(d))


def test_predict_density_and_adam_variant():
    X, Y, x_test, _ = park_data(n_low=12, n_high=4)
    m = MultiFidelityDeepGP(X, Y, num_samples=2)
    dens = np.asarray(m.predict_density(x_test[:5], park_high(x_test[:5]), 8))
    assert dens.shape == (5, 1) and np.all(np.isfinite(dens))
    # plain-Adam 3-phase variant (MF_DGP.py:345-424)
    losses = np.asarray(m.optimize_adam(lr=0.01, iterations1=20, iterations2=20,
                                        iterations3=20, messages=0))
    assert losses.shape == (60,) and np.all(np.isfinite(losses))


def test_mf_weighted_scale_identity():
    """Unit row weights + num_data=N must equal the plain ELBO exactly (the
    per-fidelity N_f/B_f scale of MF_DGP.py:219-220 is 1 at full batch)."""
    X, Y, _, _ = park_data(n_low=12, n_high=4)
    m = MultiFidelityDeepGP(X, Y, num_samples=3)
    Xs, Ys = tuple(m._X), tuple(m._Y)
    key = jax.random.PRNGKey(0)
    e0 = float(mf_dgp.elbo(m.params, Xs, Ys, key, 3))
    ws = tuple(jnp.ones(x.shape[0]) for x in Xs)
    nd = tuple(jnp.asarray(x.shape[0], x.dtype) for x in Xs)
    e1 = float(mf_dgp.elbo(m.params, Xs, Ys, key, 3, row_weights=ws,
                           num_data=nd))
    assert abs(e0 - e1) < 1e-10


def test_mf_padded_rows_contribute_nothing():
    """Bucketed rows with weight 0 are pure shape padding: swapping their Y
    values must not change the weighted ELBO."""
    from dgp_tpu.models import training

    X, Y, _, _ = park_data(n_low=12, n_high=4)
    m = MultiFidelityDeepGP(X, Y, num_samples=3, n_bucket=8)
    loss_fn, batch = m._loss_spec()
    Xs, Ys, ws, nd = batch
    assert Xs[0].shape[0] == 16 and Xs[1].shape[0] == 8
    key = jax.random.PRNGKey(2)
    e_a = float(loss_fn(m.params, key, batch))
    Ys_b = (Ys[0].at[12:].set(321.0), Ys[1].at[4:].set(-77.0))
    e_b = float(loss_fn(m.params, key, (Xs, Ys_b, ws, nd)))
    assert abs(e_a - e_b) < 1e-10


def test_mf_minibatch_training_runs():
    """Live per-fidelity minibatching with the N_f/B_f scale; n growth stays
    compile-stable via traced n_trues."""
    X, Y, _, _ = park_data(n_low=20, n_high=6)
    m = MultiFidelityDeepGP(X, Y, num_samples=2, minibatch_size=[8, 4])
    losses = np.asarray(m.optimize_nat_adam(
        lr_adam=0.01, iterations1=5, iterations2=5, iterations3=5, messages=0))
    assert losses.shape == (15,) and np.all(np.isfinite(losses))


def test_mf_minibatch_scale_unbiased():
    """E_key[minibatch -ELBO] ~= full-batch -ELBO data term: the N_f/B_f
    scale makes the stochastic data term an unbiased estimator (KL is
    deterministic and shared)."""
    X, Y, _, _ = park_data(n_low=12, n_high=4)
    m_full = MultiFidelityDeepGP(X, Y, num_samples=64)
    loss_full, batch_full = m_full._loss_spec()
    vals_full = [float(loss_full(m_full.params, jax.random.PRNGKey(k),
                                 batch_full)) for k in range(6)]
    m_mb = MultiFidelityDeepGP(X, Y, num_samples=64, minibatch_size=[6, 2])
    loss_mb, batch_mb = m_mb._loss_spec()
    vals_mb = [float(loss_mb(m_mb.params, jax.random.PRNGKey(100 + k),
                             batch_mb)) for k in range(40)]
    mu_f, mu_b = np.mean(vals_full), np.mean(vals_mb)
    assert abs(mu_b - mu_f) / abs(mu_f) < 0.05, (mu_f, mu_b)


def test_mf_wrapper_train_upto_fidelity():
    """train_upto_fidelity=0 through the wrapper: only the low-fidelity data
    term trains — layer 1's q must stay at its init."""
    X, Y, _, _ = park_data(n_low=12, n_high=4)
    m = MultiFidelityDeepGP(X, Y, num_samples=2)
    m._init_variational()
    q1_before = np.asarray(m.params.layers[1].q_mu).copy()
    k0_before = np.asarray(
        jax.tree_util.tree_leaves(m.params.layers[0].kernel)[0]).copy()
    m.optimize_adam(lr=0.05, iterations1=10, iterations2=10, iterations3=10,
                    messages=0, train_upto_fidelity=0)
    np.testing.assert_array_equal(np.asarray(m.params.layers[1].q_mu),
                                  q1_before)
    k0_after = np.asarray(
        jax.tree_util.tree_leaves(m.params.layers[0].kernel)[0])
    assert not np.array_equal(k0_before, k0_after)
