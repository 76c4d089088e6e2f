"""Fully fused whitened conditional kernel (ops/conditional_fused.py).

CI drives the Pallas interpreter on CPU; the compiled Mosaic path is
exercised by bench.py and the TPU family runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgp_tpu.ops import conditional_fused as cf


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(cf, "_INTERPRET", True)


def _data(D, M, n, seed=0):
    rng = np.random.default_rng(seed)
    Pinv = jnp.asarray(np.tril(rng.normal(size=(M, M)) * 0.1 + np.eye(M)),
                       jnp.float32)
    Kuf = jnp.asarray(rng.normal(size=(M, n)) ** 2 * 0.5, jnp.float32)
    q_mu = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    Sq = jnp.asarray(rng.normal(size=(D, M, M)) * 0.3, jnp.float32)
    Kff = jnp.asarray(1.0 + rng.uniform(size=(n,)), jnp.float32)
    return Pinv, Kuf, q_mu, Sq, Kff


def _reference(Pinv, Kuf, q_mu, Sq, Kff):
    A = Pinv @ Kuf
    mean = A.T @ q_mu
    t1 = jnp.sum(A * A, axis=0)
    B = Sq @ A[None]
    t2 = jnp.sum(B * B, axis=1)
    var = jnp.maximum((Kff[None, :] - t1[None, :] + t2).T, 0.0)
    return mean, var


@pytest.mark.parametrize("D,M,n", [(3, 64, 700), (1, 128, 1024)])
def test_forward_matches_reference(D, M, n):
    args = _data(D, M, n)
    mr, vr = _reference(*args)
    mg, vg = cf.fused_conditional_white(*args)
    np.testing.assert_allclose(np.asarray(mg), np.asarray(mr),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(vg), np.asarray(vr), rtol=1e-3,
                               atol=1e-3 * float(jnp.max(vr)))


def test_gradients_match_reference():
    D, M, n = 3, 64, 700  # n not a tile multiple: exercises padding
    args = _data(D, M, n)
    rng = np.random.default_rng(1)
    wm = jnp.asarray(rng.normal(size=(n, D)), jnp.float32)
    wv = jnp.asarray(rng.normal(size=(n, D)), jnp.float32)

    def loss(f):
        def g(*a):
            m, v = f(*a)
            return jnp.sum(m * wm) + jnp.sum(v * wv)

        return g

    gr = jax.grad(loss(_reference), argnums=tuple(range(5)))(*args)
    gg = jax.grad(loss(cf.fused_conditional_white),
                  argnums=tuple(range(5)))(*args)
    for a, b in zip(gr, gg):
        scale = float(jnp.max(jnp.abs(a))) or 1.0
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-3 * scale)


def test_conditional_diag_dispatch_equivalence():
    """With use_pallas forced on (interpreter), conditional_diag's whitened
    path through the fused kernel matches the jnp path."""
    from dgp_tpu import config
    from dgp_tpu.ops import kernels as K
    from dgp_tpu.ops.conditionals import conditional_diag

    rng = np.random.default_rng(2)
    M, n, Din, D = 64, 5000, 2, 2
    Z = jnp.asarray(rng.uniform(size=(M, Din)), jnp.float32)
    X = jnp.asarray(rng.uniform(size=(n, Din)), jnp.float32)
    q_mu = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    q_sqrt = jnp.asarray(
        np.tril(rng.normal(size=(D, M, M)) * 0.05 + np.eye(M)), jnp.float32)
    kern = K.RBF.create(variance=1.0, lengthscales=[0.5] * Din,
                        dtype=jnp.float32)
    m0, v0 = conditional_diag(kern, Z, q_mu, q_sqrt, X, white=True)
    config.set_use_pallas(True)
    try:
        m1, v1 = conditional_diag(kern, Z, q_mu, q_sqrt, X, white=True)
    finally:
        config.set_use_pallas("auto")
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-3,
                               atol=1e-3 * float(jnp.max(v0)))
