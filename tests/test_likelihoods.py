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
