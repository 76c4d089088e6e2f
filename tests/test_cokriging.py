"""AR(1) co-kriging surrogate (models/cokriging.py) — exact multi-fidelity
GP regression (Kennedy & O'Hagan 2000), the right-sized MF_BO surrogate at
BO-loop data sizes (beyond reference: the reference's only MF surrogate is
the variational MF-DGP)."""

import numpy as np
import pytest

from dgp_tpu.config import default_jitter
from dgp_tpu.models.cokriging import (AR1CoKriging,
                                      neg_log_marginal_likelihood)
from dgp_tpu.utils.test_functions import forrester_high, forrester_low


def _toy(seed=0, nl=7, nh=4, d=2):
    rng = np.random.default_rng(seed)
    Xl = rng.uniform(0, 1, (nl, d))
    Xh = rng.uniform(0, 1, (nh, d))
    yl = rng.normal(size=(nl, 1))
    yh = rng.normal(size=(nh, 1))
    return Xl, Xh, yl, yh


def _np_joint(m, Xl, Xh):
    """Numpy oracle for the 2-fidelity joint Gram at the model's current
    hyperparameters (shared-init kernels)."""
    ls = np.asarray(m.params.kernels[0].lengthscales)
    v = float(m.params.kernels[0].variance)
    rho = float(np.asarray(m.params.rho)[0])
    noise = float(m.params.likelihoods[0].variance)
    jit = float(default_jitter())

    def rbf(A, B):
        d2 = (((A[:, None, :] - B[None, :, :]) / ls) ** 2).sum(-1)
        return v * np.exp(-0.5 * d2)

    Kll = rbf(Xl, Xl)
    Klh = rho * rbf(Xl, Xh)
    Khh = rho**2 * rbf(Xh, Xh) + rbf(Xh, Xh)
    n = len(Xl) + len(Xh)
    K = np.block([[Kll, Klh], [Klh.T, Khh]]) + (noise + jit) * np.eye(n)
    return K, rho, rbf, v


def test_nll_matches_numpy_oracle():
    Xl, Xh, yl, yh = _toy()
    m = AR1CoKriging(([Xl, Xh], [yl, yh]))
    K, _, _, _ = _np_joint(m, Xl, Xh)
    y = np.vstack([yl, yh])
    L = np.linalg.cholesky(K)
    a = np.linalg.solve(L, y)
    n = len(y)
    nll_np = (0.5 * float((a.T @ a).item()) + np.log(np.diag(L)).sum()
              + 0.5 * n * np.log(2 * np.pi))
    Xs, Ys, ws = m.train_data
    nll = float(neg_log_marginal_likelihood(m.params, Xs, Ys, ws))
    assert nll == pytest.approx(nll_np, rel=1e-10)


def test_posterior_matches_numpy_oracle_both_fidelities():
    Xl, Xh, yl, yh = _toy(seed=1)
    m = AR1CoKriging(([Xl, Xh], [yl, yh]))
    K, rho, rbf, v = _np_joint(m, Xl, Xh)
    y = np.vstack([yl, yh])
    L = np.linalg.cholesky(K)
    rng = np.random.default_rng(2)
    xs = rng.uniform(0, 1, (5, 2))
    # top fidelity
    Ks = np.hstack([rho * rbf(xs, Xl), rho**2 * rbf(xs, Xh) + rbf(xs, Xh)])
    A = np.linalg.solve(L, Ks.T)
    mean_np = A.T @ np.linalg.solve(L, y)
    var_np = (rho**2 * v + v) - (A**2).sum(0)
    mean, var = m.predict_f(xs)
    assert mean.shape == (1, 5, 1) and var.shape == (1, 5, 1)
    np.testing.assert_allclose(np.asarray(mean)[0], mean_np, atol=1e-9)
    np.testing.assert_allclose(np.asarray(var)[0, :, 0], var_np, atol=1e-9)
    # fidelity 0: cov(f_0, f_1) = rho * k0
    Ks0 = np.hstack([rbf(xs, Xl), rho * rbf(xs, Xh)])
    A0 = np.linalg.solve(L, Ks0.T)
    mean0_np = A0.T @ np.linalg.solve(L, y)
    var0_np = v - (A0**2).sum(0)
    mean0, var0 = m.predict_f(xs, fidelity=0)
    np.testing.assert_allclose(np.asarray(mean0)[0], mean0_np, atol=1e-9)
    np.testing.assert_allclose(np.asarray(var0)[0, :, 0], var0_np,
                               atol=1e-9)


def test_bucket_padding_is_exactly_decoupled():
    """Padded rows add a parameter-independent constant to the NLL and
    NOTHING to the posterior (the gpr._masked_gram idiom on the joint
    co-kriging Gram)."""
    Xl, Xh, yl, yh = _toy(seed=3)
    m = AR1CoKriging(([Xl, Xh], [yl, yh]))
    mb = AR1CoKriging(([Xl, Xh], [yl, yh]), n_bucket=8)
    n_rows = len(Xl) + len(Xh)
    n_rows_b = sum(x.shape[0] for x in mb.train_data[0])
    assert n_rows_b == 16 and n_rows == 11
    xs = np.random.default_rng(4).uniform(0, 1, (6, 2))
    mean, var = m.predict_f(xs)
    mean_b, var_b = mb.predict_f(xs)
    np.testing.assert_allclose(np.asarray(mean_b), np.asarray(mean),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(var_b), np.asarray(var),
                               atol=1e-10)
    const = 0.5 * (n_rows_b - n_rows) * np.log(2 * np.pi)
    assert float(mb.training_loss()) == pytest.approx(
        float(m.training_loss()) + const, rel=1e-10)


def test_training_recovers_cross_fidelity_structure():
    """On an exactly-AR(1) pair (y_h = 2 y_l + linear trend) with enough
    data, multi-start MLL training must find a predictive model: held-out
    top-fidelity r2 >= 0.95. (rho itself is only identifiable up to the
    delta-kernel split, so we pin prediction quality, not rho.)"""
    rng = np.random.default_rng(5)
    Xl = rng.uniform(0, 1, (25, 1))
    Xh = rng.uniform(0, 1, (12, 1))

    def low(x):
        return np.sin(6 * x) + 0.3 * np.cos(13 * x)

    def high(x):
        return 2.0 * low(x) - 1.5 * x + 0.7

    yl, yh = low(Xl), high(Xh)
    m = AR1CoKriging(([Xl, Xh], [yl, yh]), n_bucket=8)
    m.optimize(n_starts=6, iterations=1000, lr=0.05, seed=0)
    xs = np.linspace(0, 1, 60)[:, None]
    mean, _ = m.predict_f(xs)
    yt = high(xs)
    ss_res = float(np.sum((np.asarray(mean)[0] - yt) ** 2))
    ss_tot = float(np.sum((yt - yt.mean()) ** 2))
    assert 1.0 - ss_res / ss_tot >= 0.95


def test_three_fidelity_joint_gram_oracle():
    """L=3 recursive structure: cov(f_t, f_s) = sum_k a_tk a_sk k_k with
    a_tk = prod_{j=k}^{t-1} rho_j — pinned against a hand-built numpy
    oracle at the (shared) init hyperparameters."""
    rng = np.random.default_rng(7)
    Xs_np = [rng.uniform(0, 1, (n, 1)) for n in (6, 4, 3)]
    Ys_np = [rng.normal(size=(n, 1)) for n in (6, 4, 3)]
    m = AR1CoKriging((Xs_np, Ys_np))
    ls = np.asarray(m.params.kernels[0].lengthscales)
    v = float(m.params.kernels[0].variance)
    rho = np.asarray(m.params.rho)  # [2], init 1.0
    noise = float(m.params.likelihoods[0].variance)
    jit = float(default_jitter())

    def rbf(A, B):
        d2 = (((A[:, None, :] - B[None, :, :]) / ls) ** 2).sum(-1)
        return v * np.exp(-0.5 * d2)

    # a[t][k] coefficients
    a = np.zeros((3, 3))
    for t in range(3):
        a[t, t] = 1.0
        for k in range(t - 1, -1, -1):
            a[t, k] = a[t, k + 1] * rho[k]
    n_tot = sum(x.shape[0] for x in Xs_np)
    K = np.zeros((n_tot, n_tot))
    offs = np.cumsum([0] + [x.shape[0] for x in Xs_np])
    for t in range(3):
        for s in range(3):
            blk = sum(a[t, k] * a[s, k] * rbf(Xs_np[t], Xs_np[s])
                      for k in range(min(t, s) + 1))
            K[offs[t]:offs[t + 1], offs[s]:offs[s + 1]] = blk
    K += (noise + jit) * np.eye(n_tot)
    y = np.vstack(Ys_np)
    L = np.linalg.cholesky(K)
    alpha = np.linalg.solve(L, y)
    nll_np = (0.5 * float((alpha.T @ alpha).item())
              + np.log(np.diag(L)).sum()
              + 0.5 * n_tot * np.log(2 * np.pi))
    Xs, Ys, ws = m.train_data
    assert float(neg_log_marginal_likelihood(m.params, Xs, Ys, ws)) == \
        pytest.approx(nll_np, rel=1e-10)
    # middle-fidelity posterior stays exact too
    xs = rng.uniform(0, 1, (4, 1))
    Ks = np.hstack([
        sum(a[1, k] * a[s, k] * rbf(xs, Xs_np[s])
            for k in range(min(1, s) + 1)) for s in range(3)])
    A = np.linalg.solve(L, Ks.T)
    mean_np = A.T @ np.linalg.solve(L, y)
    var_np = float((a[1, 0] ** 2 + 1.0) * v) - (A**2).sum(0)
    mean, var = m.predict_f(xs, fidelity=1)
    np.testing.assert_allclose(np.asarray(mean)[0], mean_np, atol=1e-9)
    np.testing.assert_allclose(np.asarray(var)[0, :, 0], var_np, atol=1e-9)


def test_acquisition_dispatch_ar1():
    """The acquisition layer's 'ar1' kind: pure moments equal the wrapper's
    top-fidelity prediction exactly (no MC, no key dependence)."""
    import jax

    from dgp_tpu.bo.acquisition import _f_moments_pure, _model_state

    Xl, Xh, yl, yh = _toy(seed=6, d=1)
    m = AR1CoKriging(([Xl, Xh], [yl, yh]), n_bucket=8)
    m.optimize(n_starts=2, iterations=50, seed=0)
    kind, state = _model_state(m)
    assert kind == "ar1"
    xs = np.linspace(0, 1, 5)[:, None]
    mean, var = _f_moments_pure(kind, state, xs, jax.random.PRNGKey(0), 7)
    mean_w, var_w = m.predict_f(xs)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_w)[0],
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_w)[0],
                               atol=1e-12)


def test_mf_bo_ar1_loop_runs():
    """MF_BO with model_dic={'type': 'ar1'}: the loop runs, accounts, and
    the save/load round-trip keeps the surrogate spec."""
    import os
    import tempfile

    from dgp_tpu.bo.mf_bo import MF_BO

    spec = {"type": "ar1", "n_starts": 3, "iterations": 100}
    bo = MF_BO(fidelities=[forrester_low, forrester_high], DoE_sizes=(6, 3),
               d=1, model_dic=spec, seed=0)
    trace = bo.run(2, popsize_DE=15, iterations_DE=15, num_samples=15,
                   verbose=False)
    assert len(trace) == 3 and len(bo.fidelity_choices) == 2
    assert all(b <= a + 1e-12 for a, b in zip(trace, trace[1:]))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "mf_bo_ar1.npz")
        bo.save(path)
        bo2 = MF_BO.load(path, [forrester_low, forrester_high])
        assert bo2.model_dic == spec
        assert bo2.best_trace == bo.best_trace


def test_validation_errors():
    Xl, Xh, yl, yh = _toy()
    with pytest.raises(ValueError, match="fidelities"):
        AR1CoKriging(([Xl], [yl]))
    from dgp_tpu.bo.mf_bo import MF_BO

    bo = MF_BO(fidelities=[forrester_low, forrester_high], DoE_sizes=(4, 2),
               d=1, model_dic={"type": "nope"})
    with pytest.raises(ValueError, match="unknown surrogate"):
        bo.make_model([y / 1.0 for y in bo.Y], seed=0)
