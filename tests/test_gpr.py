import numpy as np
import jax.numpy as jnp
from scipy.stats import multivariate_normal

from dgp_tpu.models.gpr import GPR, neg_log_marginal_likelihood
from dgp_tpu.ops import kernels as K
from dgp_tpu import config


def data(N=15, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(0, 1, size=(N, 1))
    Y = np.sin(5 * X) + 0.05 * rng.normal(size=(N, 1))
    return X, Y


def test_nlml_matches_scipy():
    X, Y = data()
    kern = K.RBF.create(variance=1.3, lengthscales=[0.4])
    model = GPR((X, Y), kern, noise_variance=0.01)
    got = -float(model.training_loss())
    Kxx = np.asarray(kern.K(jnp.asarray(X)))
    noise = float(model.params.likelihood.variance) + config.default_jitter()
    expected = multivariate_normal.logpdf(
        Y[:, 0], mean=np.zeros(len(X)), cov=Kxx + noise * np.eye(len(X))
    )
    np.testing.assert_allclose(got, expected, rtol=1e-8)


def test_predict_interpolates_and_training_helps():
    X, Y = data()
    model = GPR((X, Y), K.RBF.create(lengthscales=[1.0]), noise_variance=1e-4)
    before = float(model.training_loss())
    model.optimize_adam(iterations=400, lr=0.05)
    assert float(model.training_loss()) < before
    mean, var = model.predict_f(X)
    np.testing.assert_allclose(np.asarray(mean), Y, atol=0.1)
    assert np.all(np.asarray(var) > 0)
    ym, yv = model.predict_y(X)
    assert np.all(np.asarray(yv) >= np.asarray(var))
