import numpy as np
import jax.numpy as jnp

from dgp_tpu.variational import gauss_kl


def kl_mvn(m0, S0, m1, S1):
    """Closed-form KL(N(m0,S0) || N(m1,S1)) via numpy."""
    k = m0.shape[0]
    S1_inv = np.linalg.inv(S1)
    return 0.5 * (
        np.trace(S1_inv @ S0)
        + (m1 - m0) @ S1_inv @ (m1 - m0)
        - k
        + np.log(np.linalg.det(S1))
        - np.log(np.linalg.det(S0))
    )


def rand_q(rng, M, D):
    q_mu = rng.normal(size=(M, D))
    A = rng.normal(size=(D, M, M)) * 0.2
    q_sqrt = np.tril(A + np.eye(M))
    return q_mu, q_sqrt


def test_kl_whitened_matches_closed_form():
    rng = np.random.default_rng(0)
    M, D = 5, 3
    q_mu, q_sqrt = rand_q(rng, M, D)
    got = float(gauss_kl(jnp.asarray(q_mu), jnp.asarray(q_sqrt)))
    expected = sum(
        kl_mvn(q_mu[:, d], q_sqrt[d] @ q_sqrt[d].T, np.zeros(M), np.eye(M))
        for d in range(D)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_kl_nonwhitened_matches_closed_form():
    rng = np.random.default_rng(1)
    M, D = 6, 2
    q_mu, q_sqrt = rand_q(rng, M, D)
    B = rng.normal(size=(M, M))
    Kuu = B @ B.T + M * np.eye(M)
    Lu = np.linalg.cholesky(Kuu)
    got = float(gauss_kl(jnp.asarray(q_mu), jnp.asarray(q_sqrt), jnp.asarray(Lu)))
    expected = sum(
        kl_mvn(q_mu[:, d], q_sqrt[d] @ q_sqrt[d].T, np.zeros(M), Kuu)
        for d in range(D)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_kl_zero_at_prior():
    rng = np.random.default_rng(2)
    M, D = 4, 2
    B = rng.normal(size=(M, M))
    Kuu = B @ B.T + M * np.eye(M)
    Lu = np.linalg.cholesky(Kuu)
    q_mu = np.zeros((M, D))
    q_sqrt = np.tile(Lu[None], (D, 1, 1))
    got = float(gauss_kl(jnp.asarray(q_mu), jnp.asarray(q_sqrt), jnp.asarray(Lu)))
    np.testing.assert_allclose(got, 0.0, atol=1e-10)


def test_kl_nonnegative():
    rng = np.random.default_rng(3)
    for seed in range(5):
        q_mu, q_sqrt = rand_q(np.random.default_rng(seed), 5, 2)
        assert float(gauss_kl(jnp.asarray(q_mu), jnp.asarray(q_sqrt))) >= 0.0
