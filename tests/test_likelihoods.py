import numpy as np
import jax
import jax.numpy as jnp
from scipy.stats import norm as snorm, t as st

from dgp_tpu.ops.likelihoods import Bernoulli, Gaussian, StudentT


def test_gaussian_variational_expectations_closed_form_vs_mc():
    lik = Gaussian.create(0.3)
    Fmu = jnp.asarray([[0.5], [-1.0]])
    Fvar = jnp.asarray([[0.4], [0.9]])
    Y = jnp.asarray([[0.2], [-0.5]])
    got = np.asarray(lik.variational_expectations(Fmu, Fvar, Y))
    rng = np.random.default_rng(0)
    f = np.asarray(Fmu)[None] + np.sqrt(np.asarray(Fvar))[None] * rng.normal(
        size=(400000, 2, 1)
    )
    mc = snorm.logpdf(np.asarray(Y)[None], loc=f, scale=np.sqrt(0.3)).mean(0)
    np.testing.assert_allclose(got, mc, rtol=5e-3)


def test_gaussian_predict_density():
    lik = Gaussian.create(0.2)
    got = float(lik.predict_density(jnp.asarray(0.1), jnp.asarray(0.5),
                                    jnp.asarray(0.4)))
    expected = snorm.logpdf(0.4, loc=0.1, scale=np.sqrt(0.7))
    np.testing.assert_allclose(got, expected, rtol=1e-8)


def test_bernoulli_quadrature_matches_mc():
    lik = Bernoulli(num_gh=30)
    Fmu = jnp.asarray([[0.3], [-0.8]])
    Fvar = jnp.asarray([[0.5], [1.2]])
    Y = jnp.asarray([[1.0], [0.0]])
    got = np.asarray(lik.variational_expectations(Fmu, Fvar, Y))
    rng = np.random.default_rng(1)
    f = np.asarray(Fmu)[None] + np.sqrt(np.asarray(Fvar))[None] * rng.normal(
        size=(400000, 2, 1)
    )
    p = np.clip(snorm.cdf(f), 1e-9, 1 - 1e-9)
    lp = np.asarray(Y)[None] * np.log(p) + (1 - np.asarray(Y)[None]) * np.log1p(-p)
    np.testing.assert_allclose(got, lp.mean(0), rtol=5e-3, atol=1e-3)
    # predictive mean is a probability
    pm, pv = lik.predict_mean_and_var(Fmu, Fvar)
    assert np.all((np.asarray(pm) > 0) & (np.asarray(pm) < 1))


def test_student_t_quadrature():
    lik = StudentT.create(scale=0.5, df=4.0, num_gh=30)
    Fmu = jnp.asarray([[0.0]])
    Fvar = jnp.asarray([[0.3]])
    Y = jnp.asarray([[0.7]])
    got = np.asarray(lik.variational_expectations(Fmu, Fvar, Y))
    rng = np.random.default_rng(2)
    f = 0.0 + np.sqrt(0.3) * rng.normal(size=(400000, 1, 1))
    lp = st.logpdf(0.7, df=4.0, loc=f, scale=0.5)
    np.testing.assert_allclose(got, lp.mean(0), rtol=5e-3)


def test_dgp_with_bernoulli_likelihood_trains():
    """A DGP classification head: the ELBO machinery must accept quadrature
    likelihoods end-to-end (the reference's BroadcastingLikelihood claim)."""
    from dgp_tpu.models.dgp import DGP
    from dgp_tpu.ops import kernels as K

    rng = np.random.default_rng(3)
    X = rng.uniform(0, 1, (40, 1))
    Y = (X > 0.5).astype(float)
    model = DGP(X, Y, X[:10].copy(),
                [K.RBF.create(lengthscales=[0.3])], [],
                likelihood=Bernoulli(num_gh=15), num_samples=3)
    # natural gradients on a NON-conjugate likelihood (quadrature var-exp)
    losses = np.asarray(model.optimize_nat_adam(
        iterations1=50, iterations2=200, lr_adam=0.05, lr_gamma=0.1, messages=0
    ))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < 40 * np.log(2)  # beats the constant-p=0.5 baseline
    pm, pv = model.predict_y(X, num_samples=50)
    probs = np.asarray(pm).mean(axis=0)
    acc = np.mean((probs > 0.5) == (Y > 0.5))
    assert acc > 0.9, acc


def test_bernoulli_dgp_classification_end_to_end():
    """The quadrature Bernoulli head is load-bearing: a 2-layer DGP binary
    classifier trains through the standard APIs and beats chance soundly
    (examples/classification.py is the runnable version)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from examples.classification import main

    acc, mean_logd = main(iterations=1500, seed=0)
    assert acc > 0.88  # measured 0.95 at this deterministic seed
    assert mean_logd > np.log(0.5)  # better than a coin-flip density


def test_student_t_dgp_robust_regression_end_to_end():
    """StudentT head through DGP.from_layers: on data with 10% gross
    outliers the heavy-tailed likelihood must fit the inlier trend better
    than a Gaussian head with the same architecture and schedule (measured
    inlier RMSE 0.350 vs 0.446 at this deterministic seed)."""
    from dgp_tpu.layers.initializations import init_layers_linear
    from dgp_tpu.models.dgp import DGP
    from dgp_tpu.ops import kernels as K
    from dgp_tpu.ops.likelihoods import Gaussian, StudentT

    rng = np.random.default_rng(1)
    X = rng.uniform(0, 1, size=(60, 1))
    Y = np.sin(4 * X) + 0.05 * rng.normal(size=X.shape)
    Y[::10] += rng.choice([-3.0, 3.0], size=Y[::10].shape)  # outliers
    inliers = np.ones(len(X), dtype=bool)
    inliers[::10] = False

    def fit(lik):
        layers = init_layers_linear(X, Y, X[::3].copy(),
                                    [K.RBF.create(lengthscales=[0.3]),
                                     K.RBF.create(lengthscales=[0.3])], [1])
        m = DGP.from_layers(X, Y, layers, likelihood=lik, num_samples=4,
                            seed=0)
        m.optimize_nat_adam(iterations1=300, iterations2=700, lr_adam=0.02,
                            lr_gamma=0.05, ng_all=False, messages=0)
        mean, _ = m.predict(X, 100)
        return float(np.sqrt(np.mean(
            (mean[inliers] - np.asarray(Y)[inliers]) ** 2)))

    rmse_t = fit(StudentT.create(scale=0.1))
    rmse_g = fit(Gaussian.create(0.1))
    assert rmse_t < rmse_g, (rmse_t, rmse_g)
    assert rmse_t < 0.42, rmse_t


def test_bernoulli_log_prob_finite_in_float32():
    """f32 regression (round 5): the clipped-cdf probit log-likelihood
    NaN'd on TPU because 1 - 1e-9 rounds to exactly 1.0 in float32, making
    log1p(-p) = -inf wherever cdf(F) saturates and 0 * -inf = NaN poison
    the ELBO (the first on-chip classification run recorded 800/800
    non-finite steps). The stable log_ndtr form must stay finite for
    saturating logits in BOTH dtypes and keep gradients finite."""
    import jax
    import jax.numpy as jnp

    from dgp_tpu.ops.likelihoods import Bernoulli

    lik = Bernoulli()
    for dtype in (jnp.float32, jnp.float64):
        F = jnp.asarray([-40.0, -8.0, 0.0, 8.0, 40.0], dtype=dtype)
        for y in (0.0, 1.0):
            Y = jnp.full_like(F, y)
            lp = lik.log_prob(F, Y)
            assert bool(jnp.isfinite(lp).all()), (dtype, y, lp)
            g = jax.grad(lambda f: lik.log_prob(f, Y).sum())(F)
            assert bool(jnp.isfinite(g).all()), (dtype, y, g)
        # variational expectations with saturating means stay finite too
        ve = lik.variational_expectations(F, jnp.ones_like(F),
                                         jnp.ones_like(F))
        assert bool(jnp.isfinite(ve).all())
