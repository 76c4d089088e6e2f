"""Mixed-precision matmul (ops/precision.mm): value + cotangent parity with
plain jnp.matmul, including the broadcast-batched shape used by the
conditional's quadform ([D, M, M] @ [1, M, n])."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgp_tpu.ops.precision import mm, resolve_precision

HI = jax.lax.Precision.HIGHEST


def test_mm_matches_matmul_2d():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(5, 7)))
    b = jnp.asarray(rng.normal(size=(7, 3)))

    def f_mm(a, b):
        return jnp.sum(jnp.sin(mm(a, b, HI, HI)))

    def f_ref(a, b):
        return jnp.sum(jnp.sin(jnp.matmul(a, b, precision=HI)))

    np.testing.assert_allclose(f_mm(a, b), f_ref(a, b), rtol=1e-12)
    g_mm = jax.grad(f_mm, argnums=(0, 1))(a, b)
    g_ref = jax.grad(f_ref, argnums=(0, 1))(a, b)
    for gm, gr in zip(g_mm, g_ref):
        np.testing.assert_allclose(gm, gr, rtol=1e-12)


def test_mm_broadcast_batched_cotangents():
    """The quadform shape: Sq [D,M,M] @ A[None] [1,M,n] — the A cotangent
    must sum over the broadcast D axis back to [1, M, n]."""
    rng = np.random.default_rng(1)
    Sq = jnp.asarray(rng.normal(size=(3, 4, 4)))
    A = jnp.asarray(rng.normal(size=(1, 4, 6)))

    def f_mm(Sq, A):
        return jnp.sum(mm(Sq, A, HI, HI) ** 2)

    def f_ref(Sq, A):
        return jnp.sum(jnp.matmul(Sq, A, precision=HI) ** 2)

    np.testing.assert_allclose(f_mm(Sq, A), f_ref(Sq, A), rtol=1e-12)
    g_mm = jax.grad(f_mm, argnums=(0, 1))(Sq, A)
    g_ref = jax.grad(f_ref, argnums=(0, 1))(Sq, A)
    assert g_mm[1].shape == A.shape
    for gm, gr in zip(g_mm, g_ref):
        np.testing.assert_allclose(gm, gr, rtol=1e-12)


def test_conditional_grads_exact_under_x64(monkeypatch):
    """On the f64 CPU test backend the precision knobs are moot: the
    conditional's value and grads are identical whichever way they resolve
    (pins that the custom_vjp rewiring changed no math)."""
    from dgp_tpu import config
    from dgp_tpu.ops import kernels as K
    from dgp_tpu.ops.conditionals import conditional_diag

    rng = np.random.default_rng(2)
    Z = jnp.asarray(rng.normal(size=(6, 2)))
    X = jnp.asarray(rng.normal(size=(9, 2)))
    q_mu = jnp.asarray(rng.normal(size=(6, 2)))
    q_sqrt = jnp.asarray(np.tril(rng.normal(size=(2, 6, 6))))
    k = K.RBF.create(variance=1.1, lengthscales=[0.9, 1.2])

    def f(qm, qs):
        m, v = conditional_diag(k, Z, qm, qs, X, white=True)
        return jnp.sum(m * m) + jnp.sum(v)

    outs = {}
    for setting in ("highest", "high"):
        config.set_quad_precision(setting)
        config.set_bwd_precision(setting)
        try:
            outs[setting] = (f(q_mu, q_sqrt),
                             jax.grad(f, argnums=(0, 1))(q_mu, q_sqrt))
        finally:
            config.set_quad_precision("auto")
            config.set_bwd_precision("auto")
    np.testing.assert_allclose(outs["highest"][0], outs["high"][0], rtol=1e-12)
    for gh, gl in zip(outs["highest"][1], outs["high"][1]):
        np.testing.assert_allclose(gh, gl, rtol=1e-10)


def test_resolve_precision():
    assert resolve_precision("high") == jax.lax.Precision.HIGH
    assert resolve_precision(HI) == HI
    with pytest.raises(KeyError):
        resolve_precision("bogus")
