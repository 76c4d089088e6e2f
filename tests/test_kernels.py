import numpy as np
import jax.numpy as jnp
import pytest

from dgp_tpu.ops import kernels as K


def naive_rbf(X, Z, var, ls):
    out = np.zeros((X.shape[0], Z.shape[0]))
    for i in range(X.shape[0]):
        for j in range(Z.shape[0]):
            d = (X[i] - Z[j]) / ls
            out[i, j] = var * np.exp(-0.5 * np.sum(d * d))
    return out


def naive_matern(X, Z, var, ls, nu):
    out = np.zeros((X.shape[0], Z.shape[0]))
    for i in range(X.shape[0]):
        for j in range(Z.shape[0]):
            r = np.sqrt(np.sum(((X[i] - Z[j]) / ls) ** 2))
            if nu == 32:
                out[i, j] = var * (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)
            else:
                out[i, j] = (
                    var
                    * (1 + np.sqrt(5) * r + 5 * r**2 / 3)
                    * np.exp(-np.sqrt(5) * r)
                )
    return out


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(7, 3))
    Z = rng.normal(size=(5, 3))
    return X, Z


def test_rbf_matches_naive(data):
    X, Z = data
    ls = np.array([0.7, 1.3, 2.0])
    k = K.RBF.create(variance=1.7, lengthscales=ls)
    got = np.asarray(k.K(jnp.asarray(X), jnp.asarray(Z)))
    np.testing.assert_allclose(got, naive_rbf(X, Z, 1.7, ls), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(k.K_diag(jnp.asarray(X))), np.diag(naive_rbf(X, X, 1.7, ls)),
        rtol=1e-8,
    )


@pytest.mark.parametrize("nu,cls", [(32, K.Matern32), (52, K.Matern52)])
def test_matern_matches_naive(data, nu, cls):
    X, Z = data
    ls = np.array([0.9, 1.1, 0.5])
    k = cls.create(variance=2.2, lengthscales=ls)
    got = np.asarray(k.K(jnp.asarray(X), jnp.asarray(Z)))
    np.testing.assert_allclose(got, naive_matern(X, Z, 2.2, ls, nu), rtol=1e-8)


def test_linear_and_white(data):
    X, Z = data
    lin = K.Linear.create(variance=0.5)
    np.testing.assert_allclose(
        np.asarray(lin.K(jnp.asarray(X), jnp.asarray(Z))), 0.5 * X @ Z.T, rtol=1e-8
    )
    w = K.White.create(variance=0.3)
    np.testing.assert_allclose(
        np.asarray(w.K(jnp.asarray(X))), 0.3 * np.eye(7), rtol=1e-8
    )
    assert np.all(np.asarray(w.K(jnp.asarray(X), jnp.asarray(Z))) == 0)
    np.testing.assert_allclose(np.asarray(w.K_diag(jnp.asarray(X))), 0.3)


def test_active_dims_and_algebra(data):
    """The MF composite k_corr*(k_prev + Linear) + k_in + White
    (/root/reference/dgp_dace/models/MF_DGP.py:266-290)."""
    rng = np.random.default_rng(1)
    Din = 2
    X = rng.normal(size=(6, Din + 1))  # last column = previous-fidelity output
    Z = rng.normal(size=(4, Din + 1))
    d_in = tuple(range(Din))
    d_prev = (Din,)
    k_corr = K.RBF.create(variance=1.0, lengthscales=1.0, active_dims=d_in)
    k_prev = K.RBF.create(variance=1.0, lengthscales=1.0, active_dims=d_prev)
    k_in = K.RBF.create(variance=1.0, lengthscales=1.0, active_dims=d_in)
    k_lin = K.Linear.create(variance=1.0, active_dims=d_prev)
    k = k_corr * (k_prev + k_lin) + k_in + K.White.create(variance=1e-6)

    a = naive_rbf(X[:, :Din], Z[:, :Din], 1.0, np.ones(Din))
    b = naive_rbf(X[:, Din:], Z[:, Din:], 1.0, np.ones(1)) + X[:, Din:] @ Z[:, Din:].T
    expected = a * b + naive_rbf(X[:, :Din], Z[:, :Din], 1.0, np.ones(Din))
    got = np.asarray(k.K(jnp.asarray(X), jnp.asarray(Z)))
    np.testing.assert_allclose(got, expected, rtol=1e-9)

    # X2=None includes the White diagonal
    got_zz = np.asarray(k.K(jnp.asarray(Z)))
    a_zz = naive_rbf(Z[:, :Din], Z[:, :Din], 1.0, np.ones(Din))
    b_zz = (
        naive_rbf(Z[:, Din:], Z[:, Din:], 1.0, np.ones(1))
        + Z[:, Din:] @ Z[:, Din:].T
    )
    expected_zz = a_zz * b_zz + a_zz + 1e-6 * np.eye(4)
    np.testing.assert_allclose(got_zz, expected_zz, rtol=1e-9)

    a_xx = naive_rbf(X[:, :Din], X[:, :Din], 1.0, np.ones(Din))
    b_xx = (
        naive_rbf(X[:, Din:], X[:, Din:], 1.0, np.ones(1))
        + X[:, Din:] @ X[:, Din:].T
    )
    np.testing.assert_allclose(
        np.asarray(k.K_diag(jnp.asarray(X))),
        np.diag(a_xx * b_xx + a_xx) + 1e-6,
        rtol=1e-9,
    )


def test_by_name():
    k = K.by_name("matern52", 4)
    assert isinstance(k, K.Matern52)
    assert k.lengthscales.shape == (4,)
    with pytest.raises(ValueError):
        K.by_name("nope", 1)


def test_kernel_is_pytree(data):
    import jax

    X, Z = data
    k = K.RBF.create(variance=1.0, lengthscales=[1.0, 1.0, 1.0])

    def f(kern):
        return jnp.sum(kern.K(jnp.asarray(X), jnp.asarray(Z)))

    g = jax.grad(f)(k)
    assert np.isfinite(np.asarray(g.variance_raw))
    assert g.lengthscales_raw.shape == (3,)
