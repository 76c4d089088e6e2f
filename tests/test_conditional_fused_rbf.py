"""Fused whitened RBF conditional (ops/conditional_fused_rbf.py).

CI drives the Pallas interpreter on CPU; the compiled Mosaic path is
exercised by bench.py and the TPU family runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgp_tpu.ops import conditional_fused_rbf as cfr
from dgp_tpu.ops import kernels as K


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(cfr, "_INTERPRET", True)


def _problem(D, M, n, Din, seed=0, cls=K.RBF):
    rng = np.random.default_rng(seed)
    Z = jnp.asarray(rng.uniform(size=(M, Din)), jnp.float32)
    X = jnp.asarray(rng.uniform(size=(n, Din)), jnp.float32)
    q_mu = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    q_sqrt = jnp.asarray(
        np.tril(rng.normal(size=(D, M, M)) * 0.05 + np.eye(M)), jnp.float32)
    kern = cls.create(variance=1.3, lengthscales=[0.5] * Din,
                      dtype=jnp.float32)
    return kern, Z, X, q_mu, q_sqrt


def _paths(kern, Z, X, q_mu, q_sqrt):
    """(jnp reference, fused-rbf) mean/var through conditional_diag."""
    from dgp_tpu import config
    from dgp_tpu.ops.conditionals import conditional_diag

    m0, v0 = conditional_diag(kern, Z, q_mu, q_sqrt, X, white=True)
    config.set_use_pallas(True)
    try:
        m1, v1 = conditional_diag(kern, Z, q_mu, q_sqrt, X, white=True)
    finally:
        config.set_use_pallas("auto")
    return (m0, v0), (m1, v1)


@pytest.mark.parametrize("cls", [K.RBF, K.Matern32, K.Matern52])
@pytest.mark.parametrize("D,M,n,Din", [(2, 64, 4400, 2), (1, 128, 4096, 8)])
def test_forward_matches_jnp_path(D, M, n, Din, cls):
    kern, Z, X, q_mu, q_sqrt = _problem(D, M, n, Din, cls=cls)
    assert cfr.fused_kind(
        kern, jnp.swapaxes(q_sqrt, -1, -2), n) is not None
    (m0, v0), (m1, v1) = _paths(kern, Z, X, q_mu, q_sqrt)
    # magnitude-scaled atol: the kernel's _dot emulates MXU bf16 hi/lo
    # passes even under the CPU interpreter while the jnp path runs true
    # f32 dots, leaving a few-1e-4 absolute drift on near-zero means (the
    # Matern sqrt/exp chain accumulates slightly more than RBF's exp)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), rtol=1e-3,
                               atol=1e-4 * float(jnp.max(jnp.abs(m0))))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-3,
                               atol=1e-3 * float(jnp.max(v0)))


@pytest.mark.parametrize("cls", [K.RBF, K.Matern52])
def test_gradients_match_jnp_path(cls):
    """End-to-end cotangents through conditional_diag — including the
    lengthscale / variance / Z chains the kernel now owns in-tile (and the
    hand-derived smooth Matern d/dsq chain)."""
    from dgp_tpu import config
    from dgp_tpu.ops.conditionals import conditional_diag

    D, M, n, Din = 2, 64, 4400, 3  # n not a tile multiple; odd Din
    kern, Z, X, q_mu, q_sqrt = _problem(D, M, n, Din, seed=3, cls=cls)
    rng = np.random.default_rng(1)
    wm = jnp.asarray(rng.normal(size=(n, D)), jnp.float32)
    wv = jnp.asarray(rng.normal(size=(n, D)), jnp.float32)

    def loss(kern, Z, X, q_mu, q_sqrt):
        m, v = conditional_diag(kern, Z, q_mu, q_sqrt, X, white=True)
        return jnp.sum(m * wm) + jnp.sum(v * wv)

    args = (kern, Z, X, q_mu, q_sqrt)
    g0 = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    config.set_use_pallas(True)
    try:
        g1 = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    finally:
        config.set_use_pallas("auto")
    # tolerance note: under the CPU interpreter the jnp path's backward is
    # exact f32 while the kernel recomputes A with the *real* bf16 3-pass
    # splits it uses on TPU; the Kff - t1 cancellation amplifies that to a
    # measured ~5e-3 uniform relative drift across all leaves. On TPU both
    # paths pay bf16 passes, so this is the recompute budget, not a bug —
    # asserted here at 2e-2 to pin structure/chain-correctness (a wrong
    # cotangent term shows up at O(1), not O(5e-3)).
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        scale = float(jnp.max(jnp.abs(a))) or 1.0
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-2, atol=2e-2 * scale)


@pytest.mark.parametrize("D,M,n,Din", [
    (1, 64, 4100, 1),    # minimal output/input dims, n just over the gate
    (3, 64, 4400, 5),    # odd D and Din
    (8, 128, 4097, 8),   # bench-like dims, n = gate + 1 (max padding)
])
def test_forward_edge_shapes(D, M, n, Din):
    """Padding/tiling edges: non-tile-multiple n, D=1, odd Din (the size
    gate requires n >= 4*TILE_N = 4096, so all shapes sit just above it)."""
    kern, Z, X, q_mu, q_sqrt = _problem(D, M, n, Din, seed=7)
    assert cfr.fused_kind(kern, jnp.swapaxes(q_sqrt, -1, -2), n) is not None
    (m0, v0), (m1, v1) = _paths(kern, Z, X, q_mu, q_sqrt)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), rtol=1e-3,
                               atol=1e-4 * float(jnp.max(jnp.abs(m0))))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-3,
                               atol=1e-3 * float(jnp.max(v0)))


def test_gating():
    Sq = jnp.zeros((2, 64, 64), jnp.float32)
    n = 8192
    rbf = K.RBF.create(lengthscales=[1.0, 1.0], dtype=jnp.float32)
    assert cfr.fused_kind(rbf, Sq, n) == 0
    assert cfr.fused_kind(
        K.Matern32.create(lengthscales=[1.0, 1.0], dtype=jnp.float32),
        Sq, n) == 1
    assert cfr.fused_kind(
        K.Matern52.create(lengthscales=[1.0, 1.0], dtype=jnp.float32),
        Sq, n) == 2
    # active_dims, composite kernels, f64, tiny n: jnp/Kuf-kernel fallback
    sliced = K.RBF.create(lengthscales=[1.0], active_dims=[0],
                          dtype=jnp.float32)
    assert cfr.fused_kind(sliced, Sq, n) is None
    comp = rbf + K.White.create(variance=1e-6, dtype=jnp.float32)
    assert cfr.fused_kind(comp, Sq, n) is None
    assert cfr.fused_kind(rbf, Sq.astype(jnp.float64), n) is None
    assert cfr.fused_kind(rbf, Sq, 100) is None
    # back-compat boolean wrapper
    assert cfr.rbf_fused_applicable(rbf, Sq, n)
    assert not cfr.rbf_fused_applicable(comp, Sq, n)
