"""Sharded batch inference (parallel/serving.py) — the serving path.

Exactness pins use 1-layer stacks, where the predictive moments are
deterministic functions of X (no inter-layer sampling), so the sharded /
chunked result must equal the single-device one to numerical precision.
Multi-layer paths are pinned statistically (moment-matched means agree
within the Monte-Carlo tolerance).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dgp_tpu.models import dgp as dgp_mod
from dgp_tpu.models.dgp import DGP, moment_matched
from dgp_tpu.ops import kernels as K
from dgp_tpu.parallel import make_mesh
from dgp_tpu.parallel.serving import (
    pad_rows,
    predict_in_chunks,
    sharded_predict_f,
    sharded_predict_y,
    sharded_rowwise,
)


def build_1layer(N=40, seed=0, S=3):
    rng = np.random.default_rng(seed)
    X = rng.uniform(0, 1, size=(N, 1))
    Y = np.sin(5 * X)
    model = DGP(X, Y, X[:8].copy(), [K.RBF.create(lengthscales=[1.0])], [],
                num_samples=S)
    return model, jnp.asarray(X)


def build_2layer(N=64, seed=0, S=1):
    rng = np.random.default_rng(seed)
    X = rng.uniform(0, 1, size=(N, 2))
    Y = np.sin(4 * X[:, :1]) + X[:, 1:]
    kernels = [K.RBF.create(lengthscales=[1.0, 1.0]),
               K.RBF.create(lengthscales=[1.0])]
    model = DGP(X, Y, X[:8].copy(), kernels, [1], num_samples=S)
    return model, jnp.asarray(X)


def test_sharded_predict_f_exact_single_layer():
    model, X = build_1layer()
    mesh = make_mesh(8)
    fn = sharded_predict_f(mesh, num_samples=3)
    key = jax.random.PRNGKey(0)
    ms, vs = fn(model.params, X, key)
    m1, v1 = dgp_mod.predict_f(model.params, X, key, 3)
    np.testing.assert_allclose(np.asarray(ms), np.asarray(m1), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(v1), rtol=1e-9)
    assert ms.shape == (3, 40, 1)


def test_sharded_predict_y_statistical_two_layer():
    model, X = build_2layer()
    mesh = make_mesh(8)
    S = 400
    fn = sharded_predict_y(mesh, num_samples=S)
    key = jax.random.PRNGKey(1)
    ms, vs = fn(model.params, X, key)
    assert ms.shape == (S, 64, 1) and np.all(np.isfinite(np.asarray(ms)))
    mean_s, var_s = moment_matched(ms, vs)
    m1, v1 = dgp_mod.predict_y(model.params, X, jax.random.PRNGKey(2), S)
    mean_1, var_1 = moment_matched(m1, v1)
    # independent S=400 MC draws on both sides: agree within MC noise
    scale = np.sqrt(np.asarray(var_1)).mean()
    err = np.abs(np.asarray(mean_s) - np.asarray(mean_1)).max()
    assert err < 0.5 * scale, (err, scale)
    assert np.all(np.asarray(var_s) > 0)


def test_wrapper_sharded_predict_nondivisible_rows():
    model, _ = build_1layer(N=37)
    mesh = make_mesh(8)
    Xnew = jnp.asarray(np.random.default_rng(3).uniform(0, 1, size=(37, 1)))
    ms, vs = model.predict_y_sharded(Xnew, num_samples=2, mesh=mesh)
    assert ms.shape == (2, 37, 1)
    # 1-layer moments are key-independent -> exact vs the plain path
    m1, v1 = dgp_mod.predict_y(model.params, Xnew, jax.random.PRNGKey(9), 2)
    np.testing.assert_allclose(np.asarray(ms), np.asarray(m1), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(v1), rtol=1e-9)


def test_pad_rows_returns_device_multiple():
    mesh = make_mesh(8)
    Xp, n = pad_rows(mesh, np.ones((13, 2)))
    assert n == 13 and Xp.shape == (16, 2)
    np.testing.assert_array_equal(Xp[13:], 0.0)


def test_predict_in_chunks_matches_unchunked():
    model, X = build_1layer(N=40)
    key = jax.random.PRNGKey(4)

    def predict(params, Xc, k):
        return dgp_mod.predict_y(params, Xc, k, 2)

    mc, vc = predict_in_chunks(predict, model.params, X, key, chunk_size=16)
    m1, v1 = dgp_mod.predict_y(model.params, X, key, 2)
    assert mc.shape == m1.shape == (2, 40, 1)
    np.testing.assert_allclose(np.asarray(mc), np.asarray(m1), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(vc), np.asarray(v1), rtol=1e-9)


def test_wrapper_chunked_sharded():
    model, _ = build_1layer(N=50)
    mesh = make_mesh(8)
    Xnew = jnp.asarray(np.random.default_rng(5).uniform(0, 1, size=(50, 1)))
    ms, vs = model.predict_y_sharded(Xnew, num_samples=2, mesh=mesh,
                                     chunk_size=16)
    assert ms.shape == (2, 50, 1)
    m1, v1 = dgp_mod.predict_y(model.params, Xnew, jax.random.PRNGKey(0), 2)
    np.testing.assert_allclose(np.asarray(ms), np.asarray(m1), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(v1), rtol=1e-9)


def test_sharded_rowwise_generalizes_to_mf():
    """The generic wrapper serves any family's pure predict fn — here the
    MF-DGP high-fidelity predictive."""
    from dgp_tpu.bo.doe import lhs
    from dgp_tpu.models import mf_dgp
    from dgp_tpu.models.mf_dgp import MultiFidelityDeepGP
    from dgp_tpu.utils.test_functions import park_high, park_low

    X = [lhs(4, 30, seed=123), lhs(4, 5, seed=124)]
    Y = [park_low(X[0]), park_high(X[1])]
    m = MultiFidelityDeepGP(X, Y)
    mesh = make_mesh(8)

    def fn(params, Xc, key):
        return mf_dgp.predict_y(params, Xc, key, 4)

    engine = jax.jit(sharded_rowwise(mesh, fn))
    Xt = jnp.asarray(lhs(4, 32, seed=7))
    ms, vs = engine(m.params, Xt, jax.random.PRNGKey(0))
    assert ms.shape == (4, 32, 1)
    assert np.all(np.isfinite(np.asarray(ms)))
    assert np.all(np.asarray(vs) > 0)


def test_gpr_sharded_exact_and_chunked():
    """Exact-GP serving: sharded == single-device EXACTLY (deterministic
    predictive, per-column back-substitutions are unchanged by column
    slicing)."""
    from dgp_tpu.models.gpr import GPR

    rng = np.random.default_rng(11)
    X = rng.uniform(0, 1, size=(30, 2))
    Y = np.sin(3 * X[:, :1]) + X[:, 1:] ** 2
    m = GPR((X, Y), K.RBF.create(lengthscales=[1.0, 1.0]),
            noise_variance=1e-4)
    mesh = make_mesh(8)
    Xt = rng.uniform(0, 1, size=(27, 2))  # non-divisible rows
    ms, vs = m.predict_y_sharded(Xt, mesh)
    m1, v1 = m.predict_y(Xt)
    assert ms.shape == m1.shape == (27, 1)
    np.testing.assert_allclose(np.asarray(ms), np.asarray(m1), rtol=1e-12)
    # the kss - sum(A^2) cancellation reassociates under sharded reduction
    # shapes: equal to reduction-order rounding, not bitwise
    np.testing.assert_allclose(np.asarray(vs), np.asarray(v1), rtol=1e-8,
                               atol=1e-12)
    mc, vc = m.predict_y_sharded(Xt[:24], mesh, chunk_size=8)
    np.testing.assert_allclose(np.asarray(mc), np.asarray(m1)[:24], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(vc), np.asarray(v1)[:24], rtol=1e-8,
                               atol=1e-12)


def test_mf_wrapper_sharded_predict():
    from dgp_tpu.bo.doe import lhs
    from dgp_tpu.models.mf_dgp import MultiFidelityDeepGP
    from dgp_tpu.utils.test_functions import park_high, park_low

    X = [lhs(4, 30, seed=123), lhs(4, 5, seed=124)]
    Y = [park_low(X[0]), park_high(X[1])]
    m = MultiFidelityDeepGP(X, Y)
    mesh = make_mesh(8)
    Xt = lhs(4, 19, seed=7)  # non-divisible rows
    ms, vs = m.predict_y_sharded(Xt, num_samples=4, mesh=mesh)
    assert ms.shape == (4, 19, 1)
    assert np.all(np.isfinite(np.asarray(ms))) and np.all(np.asarray(vs) > 0)
    mc, vc = m.predict_y_sharded(Xt[:16], num_samples=4, mesh=mesh,
                                 chunk_size=8)
    assert mc.shape == (4, 16, 1) and np.all(np.isfinite(np.asarray(mc)))


def test_mo_wrapper_sharded_predict():
    from dgp_tpu.bo.doe import lhs
    from dgp_tpu.bo.problems import multi_obj_1D_4
    from dgp_tpu.models.mo_dgp import MultiObjDeepGP

    problem = multi_obj_1D_4()
    X = lhs(problem.dim, 10, seed=5)
    Y0 = np.zeros((10, 1))
    Y1 = np.zeros((10, 1))
    for i in range(10):
        f = problem.fun(X[i])
        Y0[i], Y1[i] = f[0], f[1]
    m = MultiObjDeepGP([X, X.copy()], [Y0, Y1], num_samples=2)
    mesh = make_mesh(8)
    Xt = lhs(problem.dim, 11, seed=9)
    ms, vs = m.predict_y_sharded(Xt, num_samples=3, mesh=mesh)
    assert ms.shape == (3, 11, 1)
    assert np.all(np.isfinite(np.asarray(ms))) and np.all(np.asarray(vs) > 0)


def test_em_wrapper_sharded_predict():
    from dgp_tpu.bo.doe import lhs
    from dgp_tpu.models.mf_dgp_em import MultiFidelityDeepGP_EM
    from dgp_tpu.utils.test_functions import park_vd_high, park_vd_low

    X = [lhs(2, 24, seed=21), lhs(4, 6, seed=22)]
    Y = [park_vd_low(X[0]), park_vd_high(X[1])]
    m = MultiFidelityDeepGP_EM(X, Y, [X[1][:, :2]], num_samples=2)
    mesh = make_mesh(8)
    Xt = lhs(4, 13, seed=23)
    ms, vs = m.predict_y_sharded(Xt, num_samples=2, mesh=mesh)
    assert ms.shape == (2, 13, 1)
    assert np.all(np.isfinite(np.asarray(ms))) and np.all(np.asarray(vs) > 0)


def test_chunk_size_device_multiple_enforced():
    model, _ = build_1layer(N=16)
    mesh = make_mesh(8)
    Xnew = jnp.zeros((16, 1))
    try:
        model.predict_y_sharded(Xnew, num_samples=1, mesh=mesh, chunk_size=12)
    except ValueError as e:
        assert "device multiple" in str(e)
    else:  # pragma: no cover
        raise AssertionError("expected ValueError for chunk_size=12 on 8 devices")
