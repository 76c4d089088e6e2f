import numpy as np
import jax
import jax.numpy as jnp

from dgp_tpu.bo.doe import lhs
from dgp_tpu.models import mf_dgp_em
from dgp_tpu.models.mf_dgp_em import MultiFidelityDeepGP_EM
from dgp_tpu.utils.test_functions import park_vd_high, park_vd_low


def park_vd_data(n_low=30, n_high=6, seed=0):
    """nb_mfdgpem setup: low fidelity 2-D, high fidelity 4-D; X_red = the
    first two columns of the high-fidelity inputs (cell 8)."""
    X = [lhs(2, n_low, seed=123), lhs(4, n_high, seed=seed)]
    Y = [park_vd_low(X[0]), park_vd_high(X[1])]
    X_red = [X[1][:, :2]]
    return X, Y, X_red


def test_construction_variant_dims():
    X, Y, X_red = park_vd_data()
    m = MultiFidelityDeepGP_EM(X, Y, X_red, num_samples=5)
    assert len(m.params.layers) == 2
    assert len(m.params.layers_red) == 1
    red = m.params.layers_red[0]
    assert red.z.shape == (6, 4)          # W default = X[-1]
    assert red.q_mu.shape == (6, 2)       # maps 4-D -> 2-D
    l1 = m.params.layers[1]
    assert l1.z_left.shape == (6, 4)
    assert l1.q_sqrt.shape == (1, 6, 6)
    zs = mf_dgp_em.compute_full_zs_em(m.params, jax.random.PRNGKey(0))
    assert zs[0].shape == (30, 2)
    assert zs[1].shape == (6, 5)          # [z_left(4), z_right(1)]


def test_propagate_and_project_shapes():
    X, Y, X_red = park_vd_data()
    m = MultiFidelityDeepGP_EM(X, Y, X_red, num_samples=5)
    # high-fidelity prediction consumes 4-D inputs
    Fs, Fms, Fvs = m.propagate(X[1], S=3)
    assert len(Fs) == 2 and Fs[-1].shape == (3, 6, 1)
    # low-fidelity prediction consumes 2-D inputs directly (fidelity_dim=0)
    Fm, Fv = m.predict_f(X[0], S=3, fidelity=0, fidelity_dim=0)
    assert Fm.shape == (3, 30, 1)
    # projection posterior of high-fidelity inputs into the 2-D space
    Hm, Hv = m.project(X[1], S=4, fidelity=0, fidelity_dim=1)
    assert Hm.shape == (4, 6, 2)
    mean, var = m.predict(X[1])
    assert mean.shape == (6, 1) and np.all(np.isfinite(mean))


def test_elbo_finite_with_projection_term_and_gradients():
    X, Y, X_red = park_vd_data()
    m = MultiFidelityDeepGP_EM(X, Y, X_red, num_samples=5)
    Xs, Ys = tuple(m._X), tuple(m._Y)
    Xr = tuple(m._X_red)
    key = jax.random.PRNGKey(0)
    val = float(mf_dgp_em.elbo(m.params, Xs, Ys, Xr, key, 5))
    assert np.isfinite(val)
    g = jax.grad(lambda p: mf_dgp_em.elbo(p, Xs, Ys, Xr, key, 5))(m.params)
    assert np.any(np.asarray(g.layers[1].z_left) != 0)
    assert np.any(np.asarray(g.layers_red[0].q_mu) != 0)
    # projection likelihood variance receives gradient from L_red
    assert np.asarray(g.likelihood_projection.variance_raw) != 0


def test_em_short_training_runs_and_improves():
    X, Y, X_red = park_vd_data()
    m = MultiFidelityDeepGP_EM(X, Y, X_red, num_samples=5)
    m._init_variational()
    before = float(m.objective())
    m.optimize_nat_adam(lr_adam=0.01, lr_gamma=0.01, iterations1=0,
                        iterations2=120, iterations3=80, messages=0)
    after = float(m.objective())
    assert np.isfinite(after)
    assert after > before


def test_three_fidelity_variant_dims():
    """Three fidelities with three different input dims (2 -> 3 -> 5)
    exercise the deep reduction sub-chains (layers_red[L-i:]) and the
    Hs[-(i+1)] skip indexing for i >= 2 that two-fidelity models never touch
    (MF_DGP_EM.py:60-86,123-168)."""
    rng = np.random.default_rng(3)
    X = [lhs(2, 15, seed=0), lhs(3, 8, seed=1), lhs(5, 5, seed=2)]
    f = lambda x: np.sin(3 * x[:, :1]) + x[:, 1:2]
    Y = [f(X[0]), f(X[1]) + 0.1, f(X[2]) - 0.1]
    # reference indexing (MF_DGP_EM.py:287-294 with project -> Hmeans[fidelity]):
    # X_red[f] supervises Hmeans[f] of propagate(X[f+1]) — for f=1 that is the
    # output of the SECOND reduction layer, i.e. the fully-reduced 2-D space
    X_red = [X[1][:, :2], X[2][:, :2]]
    m = MultiFidelityDeepGP_EM(X, Y, X_red, num_samples=3)
    assert len(m.params.layers) == 3 and len(m.params.layers_red) == 2
    # reduction chain: 5 -> 3 (red[0] maps dim(X[-2])=3? check shapes)
    red_out_dims = [l.q_mu.shape[1] for l in m.params.layers_red]
    assert red_out_dims == [3, 2]  # X[-(1+i)].shape[1] for i=1,2
    zs = mf_dgp_em.compute_full_zs_em(m.params, jax.random.PRNGKey(0))
    assert zs[0].shape == (15, 2)
    assert zs[1].shape == (8, 4)   # z_left(3) + z_right(1)
    assert zs[2].shape == (5, 6)   # z_left(5) + z_right(1)
    Xs, Ys = tuple(m._X), tuple(m._Y)
    Xr = tuple(m._X_red)
    key = jax.random.PRNGKey(1)
    val = float(mf_dgp_em.elbo(m.params, Xs, Ys, Xr, key, 3))
    assert np.isfinite(val)
    g = jax.grad(lambda p: mf_dgp_em.elbo(p, Xs, Ys, Xr, key, 3))(m.params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
    mean, var = m.predict(X[2])
    assert mean.shape == (5, 1) and np.all(np.isfinite(mean))


def test_em_weighted_scale_identity():
    """Unit weights + num_data=N equal the plain ELBO exactly, including the
    N_{f+1}/N_f projection-term quirk (MF_DGP_EM.py:292-293)."""
    X, Y, X_red = park_vd_data(n_low=12, n_high=4)
    m = MultiFidelityDeepGP_EM(X, Y, X_red, num_samples=3)
    Xs, Ys, Xr = tuple(m._X), tuple(m._Y), tuple(m._X_red)
    key = jax.random.PRNGKey(0)
    e0 = float(mf_dgp_em.elbo(m.params, Xs, Ys, Xr, key, 3))
    ws = tuple(jnp.ones(x.shape[0]) for x in Xs)
    nd = tuple(jnp.asarray(x.shape[0], x.dtype) for x in Xs)
    e1 = float(mf_dgp_em.elbo(m.params, Xs, Ys, Xr, key, 3, row_weights=ws,
                              num_data=nd))
    assert abs(e0 - e1) < 1e-10


def test_em_padded_rows_contribute_nothing():
    """Bucketed EM: weight-0 rows (and their paired X_red projection rows)
    are pure padding — swapping their values changes nothing."""
    X, Y, X_red = park_vd_data(n_low=12, n_high=4)
    m = MultiFidelityDeepGP_EM(X, Y, X_red, num_samples=3, n_bucket=8)
    loss_fn, batch = m._loss_spec()
    Xs, Ys, Xr, ws, nd = batch
    assert Xs[0].shape[0] == 16 and Xs[1].shape[0] == 8
    assert Xr[0].shape[0] == 8  # padded in lockstep with fidelity 1
    key = jax.random.PRNGKey(2)
    e_a = float(loss_fn(m.params, key, batch))
    Ys_b = (Ys[0].at[12:].set(55.0), Ys[1].at[4:].set(-3.0))
    Xr_b = (Xr[0].at[4:].set(9.0),)
    e_b = float(loss_fn(m.params, key, (Xs, Ys_b, Xr_b, ws, nd)))
    assert abs(e_a - e_b) < 1e-10


def test_em_minibatch_training_runs():
    X, Y, X_red = park_vd_data(n_low=20, n_high=6)
    m = MultiFidelityDeepGP_EM(X, Y, X_red, num_samples=2,
                               minibatch_size=[8, 4])
    losses = np.asarray(m.optimize_nat_adam(
        lr_adam=0.01, iterations1=4, iterations2=4, iterations3=4, messages=0))
    assert losses.shape == (12,) and np.all(np.isfinite(losses))
