"""Fused Pallas variational-quadform kernel (ops/quadform_pallas.py).

CI runs the kernels through the Pallas interpreter on CPU (the compiled
Mosaic path is exercised by bench.py / the TPU family runs); assertions
compare against the jnp reference path at f32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgp_tpu.ops import quadform_pallas as qp


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(qp, "_INTERPRET", True)


def _data(D, M, n, seed=0):
    rng = np.random.default_rng(seed)
    Sq = jnp.asarray(rng.normal(size=(D, M, M)), jnp.float32)
    A = jnp.asarray(rng.normal(size=(M, n)), jnp.float32)
    return Sq, A


@pytest.mark.parametrize("D,M,n", [(3, 64, 1500), (1, 128, 1024), (2, 8, 50)])
def test_forward_matches_reference(D, M, n):
    Sq, A = _data(D, M, n)
    ref = qp.quadform_t2_reference(Sq, A)
    got = qp.quadform_t2_pallas(Sq, A)
    # CPU interpreter: reference is exact f32, kernel emulates 3-pass bf16
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4 * float(jnp.max(ref)))


def test_gradients_match_reference():
    D, M, n = 3, 64, 700  # n not a multiple of TILE_N: exercises padding
    Sq, A = _data(D, M, n)
    w = jnp.asarray(np.random.default_rng(1).normal(size=(D, n)), jnp.float32)
    gr = jax.grad(lambda s, a: jnp.sum(qp.quadform_t2_reference(s, a) * w),
                  argnums=(0, 1))(Sq, A)
    gg = jax.grad(lambda s, a: jnp.sum(qp.quadform_t2_pallas(s, a) * w),
                  argnums=(0, 1))(Sq, A)
    for a, b in zip(gr, gg):
        scale = float(jnp.max(jnp.abs(a)))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4 * scale)


def test_padding_is_exact_zero_contribution():
    # padded columns must not leak into the unpadded output region
    D, M = 2, 64
    Sq, A = _data(D, M, qp.TILE_N + 17)
    got = qp.quadform_t2_pallas(Sq, A)
    got_trunc = qp.quadform_t2_pallas(Sq, A[:, : qp.TILE_N + 17])
    assert got.shape == (D, qp.TILE_N + 17)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got_trunc))


def test_dispatch_gates():
    D, M, n = 2, 128, 8 * qp.TILE_N
    Sq, A = _data(D, M, n)
    assert qp._kernel_applicable(Sq, A)
    assert not qp._kernel_applicable(Sq.astype(jnp.float64),
                                     A.astype(jnp.float64))
    assert not qp._kernel_applicable(Sq, A[:, :100])       # tiny n
    assert not qp._kernel_applicable(Sq[:, :60, :60], A[:60])  # sub-MXU M
    # CPU backend: the public dispatcher must take the jnp path regardless
    from dgp_tpu import config

    assert config.use_pallas() in (False,)  # tests force the CPU backend


def test_fused_t2_t1_matches_reference():
    D, M, n = 3, 64, 700
    Sq, A = _data(D, M, n)
    w2 = jnp.asarray(np.random.default_rng(2).normal(size=(D, n)), jnp.float32)
    w1 = jnp.asarray(np.random.default_rng(3).normal(size=(n,)), jnp.float32)

    def f_ref(s, a):
        return (jnp.sum(qp.quadform_t2_reference(s, a) * w2)
                + jnp.sum(jnp.sum(a * a, axis=0) * w1))

    def f_got(s, a):
        t2, t1 = qp.quadform_t2_t1_pallas(s, a)
        return jnp.sum(t2 * w2) + jnp.sum(t1 * w1)

    t2r, t1r = qp.quadform_t2_reference(Sq, A), jnp.sum(A * A, axis=0)
    t2, t1 = qp.quadform_t2_t1_pallas(Sq, A)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t2r), rtol=1e-4,
                               atol=1e-4 * float(jnp.max(t2r)))
    # t1 is a plain VPU sum of squares: exact
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t1r))
    gr = jax.grad(f_ref, argnums=(0, 1))(Sq, A)
    gg = jax.grad(f_got, argnums=(0, 1))(Sq, A)
    for a, b in zip(gr, gg):
        scale = float(jnp.max(jnp.abs(a)))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4 * scale)
