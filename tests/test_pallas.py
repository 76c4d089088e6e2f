"""Fused RBF-conditional Pallas kernel vs the XLA solve path.

Runs the kernel through the Pallas interpreter on CPU (the compiled Mosaic
path is exercised on real TPU by bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgp_tpu
from dgp_tpu.ops import kernels as K
from dgp_tpu.ops import conditionals
from dgp_tpu.ops.pallas import rbf_conditional as rc


@pytest.fixture(autouse=True)
def pallas_interpret():
    rc.INTERPRET = True
    dgp_tpu.config.set_use_pallas(True)
    yield
    dgp_tpu.config.set_use_pallas("auto")
    rc.INTERPRET = False


def setup(M=20, n=33, d=3, D=2, seed=0):
    rng = np.random.default_rng(seed)
    Z = rng.normal(size=(M, d))
    X = rng.normal(size=(n, d))
    kern = K.RBF.create(variance=1.6, lengthscales=[0.7, 1.1, 0.9])
    q_mu = rng.normal(size=(M, D))
    q_sqrt = np.tril(rng.normal(size=(D, M, M)) * 0.2 + np.eye(M))
    return kern, jnp.asarray(Z), jnp.asarray(X), jnp.asarray(q_mu), jnp.asarray(q_sqrt)


@pytest.mark.parametrize("white", [False, True])
def test_fused_matches_solve_path(white):
    kern, Z, X, q_mu, q_sqrt = setup()
    mean_f, var_f = conditionals.conditional_diag(
        kern, Z, q_mu, q_sqrt, X, white=white
    )
    dgp_tpu.config.set_use_pallas(False)
    mean_s, var_s = conditionals.conditional_diag(
        kern, Z, q_mu, q_sqrt, X, white=white
    )
    # pallas forward computes in f32
    np.testing.assert_allclose(np.asarray(mean_f), np.asarray(mean_s),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(var_f), np.asarray(var_s),
                               rtol=2e-4, atol=2e-5)


def test_fused_gradients_match_solve_path():
    kern, Z, X, q_mu, q_sqrt = setup(M=12, n=17, D=1)

    def loss(kern, Z, q_mu, q_sqrt, X):
        m, v = conditionals.conditional_diag(kern, Z, q_mu, q_sqrt, X,
                                             white=False)
        return jnp.sum(m**2) + jnp.sum(jnp.log(v))

    g_fused = jax.grad(loss, argnums=(1, 2, 3))(kern, Z, q_mu, q_sqrt, X)
    dgp_tpu.config.set_use_pallas(False)
    g_solve = jax.grad(loss, argnums=(1, 2, 3))(kern, Z, q_mu, q_sqrt, X)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_solve)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_dispatch_gates():
    # composite / active_dims kernels must NOT take the pallas path
    kern = K.RBF.create(variance=1.0, lengthscales=1.0, active_dims=(0,))
    assert not conditionals._pallas_applicable(kern)
    ksum = K.RBF.create(lengthscales=[1.0]) + K.White.create()
    assert not conditionals._pallas_applicable(ksum)
    plain = K.RBF.create(lengthscales=[1.0])
    assert conditionals._pallas_applicable(plain)


def test_ref_impl_matches_direct_formula():
    rng = np.random.default_rng(1)
    M, n, d, D = 9, 14, 2, 3
    Xs = jnp.asarray(rng.normal(size=(n, d)))
    Zs = jnp.asarray(rng.normal(size=(M, d)))
    alpha = jnp.asarray(rng.normal(size=(M, D)))
    E = jnp.asarray(rng.normal(size=(D, M, M)))
    E = 0.5 * (E + jnp.swapaxes(E, -1, -2))
    mean, quad = rc.rbf_conditional_diag_ref(Xs, Zs, alpha, E, 1.3)
    Kmat = 1.3 * np.exp(
        -0.5 * ((np.asarray(Xs)[:, None] - np.asarray(Zs)[None]) ** 2).sum(-1)
    )
    np.testing.assert_allclose(np.asarray(mean), Kmat @ np.asarray(alpha),
                               rtol=1e-8)
    for dd in range(D):
        expected = np.einsum("nm,mk,nk->n", Kmat, np.asarray(E)[dd], Kmat)
        np.testing.assert_allclose(np.asarray(quad)[:, dd], expected, rtol=1e-7)
