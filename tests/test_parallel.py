import numpy as np
import jax
import jax.numpy as jnp

from dgp_tpu.models.dgp import DGP, elbo
from dgp_tpu.ops import kernels as K
from dgp_tpu.parallel import make_data_parallel_elbo, make_mesh, shard_batch


def build(N=64, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(0, 1, size=(N, 2))
    Y = np.sin(4 * X[:, :1]) + X[:, 1:]
    kernels = [K.RBF.create(lengthscales=[1.0, 1.0]), K.RBF.create(lengthscales=[1.0])]
    model = DGP(X, Y, X[:8].copy(), kernels, [1], num_samples=1)
    return model, jnp.asarray(X), jnp.asarray(Y)


def test_sharded_elbo_matches_single_device():
    model, X, Y = build()
    mesh = make_mesh(8)
    Xs, Ys = shard_batch(mesh, X, Y)
    pelbo = make_data_parallel_elbo(mesh, num_samples=1)
    key = jax.random.PRNGKey(0)
    sharded = float(jax.jit(pelbo)(model.params, Xs, Ys, key))
    # Single-device value with the same per-shard key folding, for an exact
    # apples-to-apples check we only compare statistically-stable pieces:
    single = float(elbo(model.params, X, Y, key, num_samples=1))
    # one MC draw per scheme -> compare within a few std of the MC noise;
    # with S=1 on a 2-layer model the ELBO varies by O(1) between draws.
    assert abs(sharded - single) / max(1.0, abs(single)) < 0.2

    # Determinism of the sharded value itself
    sharded2 = float(jax.jit(pelbo)(model.params, Xs, Ys, key))
    np.testing.assert_allclose(sharded, sharded2, rtol=1e-12)


def test_sharded_elbo_exact_match_on_single_layer():
    """With one layer the ELBO is sampling-free, so sharded == unsharded
    to numerical precision."""
    rng = np.random.default_rng(1)
    N = 40
    X = rng.uniform(0, 1, size=(N, 1))
    Y = np.sin(5 * X)
    model = DGP(X, Y, X[:8].copy(), [K.RBF.create(lengthscales=[1.0])], [],
                num_samples=3)
    mesh = make_mesh(8)
    Xs, Ys = shard_batch(mesh, jnp.asarray(X), jnp.asarray(Y))
    pelbo = make_data_parallel_elbo(mesh, num_samples=3)
    key = jax.random.PRNGKey(0)
    sharded = float(jax.jit(pelbo)(model.params, Xs, Ys, key))
    single = float(elbo(model.params, jnp.asarray(X), jnp.asarray(Y), key, 3))
    np.testing.assert_allclose(sharded, single, rtol=1e-8)


def test_sharded_gradients_match_single_device():
    rng = np.random.default_rng(2)
    N = 48
    X = rng.uniform(0, 1, size=(N, 1))
    Y = np.sin(5 * X)
    model = DGP(X, Y, X[:6].copy(), [K.RBF.create(lengthscales=[1.0])], [],
                num_samples=2)
    mesh = make_mesh(8)
    Xs, Ys = shard_batch(mesh, jnp.asarray(X), jnp.asarray(Y))
    pelbo = make_data_parallel_elbo(mesh, num_samples=2)
    key = jax.random.PRNGKey(0)

    g_sharded = jax.jit(jax.grad(lambda p: -pelbo(p, Xs, Ys, key)))(model.params)
    g_single = jax.jit(
        jax.grad(lambda p: -elbo(p, jnp.asarray(X), jnp.asarray(Y), key, 2))
    )(model.params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_sharded), jax.tree_util.tree_leaves(g_single)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8)


def test_2d_mesh_data_sample_parallel():
    """(data x sample) mesh: exact match vs single device on a sampling-free
    single-layer model, finite grads through both psum axes."""
    from dgp_tpu.parallel.data_parallel import make_data_sample_parallel_elbo
    from dgp_tpu.parallel.mesh import make_mesh_2d
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(1)
    N = 32
    X = rng.uniform(0, 1, (N, 1))
    Y = np.sin(5 * X)
    model = DGP(X, Y, X[:6].copy(), [K.RBF.create(lengthscales=[1.0])], [],
                num_samples=4)
    mesh = make_mesh_2d(4, 2)
    sh = NamedSharding(mesh, P("data"))
    Xs = jax.device_put(jnp.asarray(X), sh)
    Ys = jax.device_put(jnp.asarray(Y), sh)
    pelbo = make_data_sample_parallel_elbo(mesh, num_samples=4)
    key = jax.random.PRNGKey(0)
    v = float(jax.jit(pelbo)(model.params, Xs, Ys, key))
    single = float(elbo(model.params, jnp.asarray(X), jnp.asarray(Y), key, 4))
    np.testing.assert_allclose(v, single, rtol=1e-8)
    g = jax.jit(jax.grad(lambda p: -pelbo(p, Xs, Ys, key)))(model.params)
    assert all(bool(jnp.all(jnp.isfinite(x)))
               for x in jax.tree_util.tree_leaves(g))

    # sample axis must divide num_samples
    import pytest

    with pytest.raises(ValueError):
        make_data_sample_parallel_elbo(mesh, num_samples=3)


def test_multislice_elbo_exact_match_single_layer():
    """Hybrid 2x4 (slice x data) mesh: hierarchical ICI-then-DCN reduction
    must equal the single-device ELBO exactly on a sampling-free model."""
    from dgp_tpu.parallel import make_mesh_multislice, make_multislice_elbo
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(3)
    N = 40
    X = rng.uniform(0, 1, size=(N, 1))
    Y = np.sin(5 * X)
    model = DGP(X, Y, X[:8].copy(), [K.RBF.create(lengthscales=[1.0])], [],
                num_samples=3)
    mesh = make_mesh_multislice(2, 4)
    assert mesh.shape == {"slice": 2, "data": 4}
    sharding = NamedSharding(mesh, P(("slice", "data")))
    Xs = jax.device_put(jnp.asarray(X), sharding)
    Ys = jax.device_put(jnp.asarray(Y), sharding)
    pelbo = make_multislice_elbo(mesh, num_samples=3)
    key = jax.random.PRNGKey(0)
    sharded = float(jax.jit(pelbo)(model.params, Xs, Ys, key))
    single = float(elbo(model.params, jnp.asarray(X), jnp.asarray(Y), key, 3))
    np.testing.assert_allclose(sharded, single, rtol=1e-8)


def test_multislice_gradients_match_single_device():
    from dgp_tpu.parallel import make_mesh_multislice, make_multislice_elbo
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(4)
    N = 48
    X = rng.uniform(0, 1, size=(N, 1))
    Y = np.sin(5 * X)
    model = DGP(X, Y, X[:8].copy(), [K.RBF.create(lengthscales=[1.0])], [],
                num_samples=2)
    mesh = make_mesh_multislice(2, 4)
    sharding = NamedSharding(mesh, P(("slice", "data")))
    Xs = jax.device_put(jnp.asarray(X), sharding)
    Ys = jax.device_put(jnp.asarray(Y), sharding)
    pelbo = make_multislice_elbo(mesh, num_samples=2)
    key = jax.random.PRNGKey(7)
    g_sharded = jax.jit(jax.grad(lambda p: -pelbo(p, Xs, Ys, key)))(model.params)
    g_single = jax.grad(
        lambda p: -elbo(p, jnp.asarray(X), jnp.asarray(Y), key, 2)
    )(model.params)
    for a, b in zip(jax.tree_util.tree_leaves(g_sharded),
                    jax.tree_util.tree_leaves(g_single)):
        # per-shard trsm blocking reassociates f64 ops; the ill-conditioned
        # Kuu amplifies it (same tolerance as the 1-D mesh grad test above)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)


def test_mesh_trainer_integration_matches_single_device():
    """DGP(mesh=...) trains through the SAME cached scan engines as the
    single-device path; on a sampling-free single-layer model the whole
    multi-step Adam+NatGrad trajectory must match to fp tolerance
    (N=44 is not device-divisible: exercises the weighted row padding)."""
    from dgp_tpu.models import training

    rng = np.random.default_rng(5)
    N = 44
    X = rng.uniform(0, 1, size=(N, 1))
    Y = np.sin(5 * X)
    kerns = lambda: [K.RBF.create(lengthscales=[1.0])]

    m_single = DGP(X, Y, X[:6].copy(), kerns(), [], num_samples=2, seed=7)
    m_single.optimize_nat_adam(iterations1=5, iterations2=5, messages=0)

    mesh = make_mesh(8)
    m_mesh = DGP(X, Y, X[:6].copy(), kerns(), [], num_samples=2, seed=7,
                 mesh=mesh)
    m_mesh.optimize_nat_adam(iterations1=5, iterations2=5, messages=0)

    for a, b in zip(jax.tree_util.tree_leaves(m_single.params),
                    jax.tree_util.tree_leaves(m_mesh.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)

    # the sharded engines live in the same cache and are reused by a fresh
    # instance of the same architecture
    n_engines = training.engine_cache_size()
    m2 = DGP(X, Y, X[:6].copy(), kerns(), [], num_samples=2, seed=3, mesh=mesh)
    m2.optimize_nat_adam(iterations1=5, iterations2=5, messages=0)
    assert training.engine_cache_size() == n_engines


def test_mesh_mf_dgp_training():
    """MF-DGP with a mesh: sharded per-fidelity data terms; padded rows are
    exact no-ops; short training runs finite through the public API."""
    from dgp_tpu.models.mf_dgp import MultiFidelityDeepGP

    rng = np.random.default_rng(0)
    X = [rng.uniform(0, 1, (21, 2)), rng.uniform(0, 1, (6, 2))]
    f = lambda x: np.sin(3 * x[:, :1]) + x[:, 1:]
    Y = [f(X[0]) + 0.3, f(X[1])]
    mesh = make_mesh(8)
    m = MultiFidelityDeepGP(X, Y, num_samples=2, mesh=mesh)
    loss_fn, batch = m._loss_spec()
    Xs, Ys, ws, nds = batch
    assert Xs[0].shape[0] == 24 and Xs[1].shape[0] == 8
    key = jax.random.PRNGKey(0)
    e_a = float(loss_fn(m.params, key, batch))
    assert np.isfinite(e_a)
    # swapping pad-row Y values changes nothing (exact weighted decoupling
    # inside shard_map)
    Ys_b = (Ys[0].at[21:].set(100.0), Ys[1].at[6:].set(-5.0))
    e_b = float(loss_fn(m.params, key, (Xs, Ys_b, ws, nds)))
    np.testing.assert_allclose(e_a, e_b, rtol=1e-12)
    losses = np.asarray(m.optimize_nat_adam(
        lr_adam=0.01, iterations1=3, iterations2=3, iterations3=3,
        messages=0))
    assert losses.shape == (9,) and np.all(np.isfinite(losses))


def test_mesh_mo_and_em_training_smoke():
    from dgp_tpu.bo.doe import lhs
    from dgp_tpu.models.mf_dgp_em import MultiFidelityDeepGP_EM
    from dgp_tpu.models.mo_dgp import MultiObjDeepGP
    from dgp_tpu.utils.test_functions import park_vd_high, park_vd_low

    mesh = make_mesh(8)
    rng = np.random.default_rng(1)
    Xm = rng.uniform(0, 1, (10, 1))
    Ym0 = np.sin(3 * Xm)
    Ym1 = np.cos(2 * Xm)
    mo = MultiObjDeepGP([Xm, Xm.copy()], [Ym0, Ym1], loop=1, num_samples=2,
                        mesh=mesh)
    losses = np.asarray(mo.optimize_adam(
        lr=0.01, iterations1=3, iterations2=3, iterations3=3, messages=0))
    assert np.all(np.isfinite(losses))

    X = [lhs(2, 12, seed=123), lhs(4, 5, seed=0)]
    Y = [park_vd_low(X[0]), park_vd_high(X[1])]
    X_red = [X[1][:, :2]]
    em = MultiFidelityDeepGP_EM(X, Y, X_red, num_samples=2, mesh=mesh)
    loss_fn, batch = em._loss_spec()
    assert batch[0][0].shape[0] == 16 and batch[0][1].shape[0] == 8
    assert batch[2][0].shape[0] == 8  # X_red padded with fidelity 1
    losses = np.asarray(em.optimize_nat_adam(
        lr_adam=0.01, iterations1=3, iterations2=3, iterations3=3,
        messages=0))
    assert np.all(np.isfinite(losses))


# -- sharded minibatch training (mesh x minibatch_size) -------------------------


def _loss_over_keys(loss_fn, params, batch, n_keys, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n_keys)
    vals = jax.jit(
        lambda ks: jax.lax.map(lambda k: loss_fn(params, k, batch), ks)
    )(keys)
    return np.asarray(vals)


def test_sharded_dgp_minibatch_unbiased():
    """Single-layer model: per-row variational expectations are sampling-free,
    so the device-local minibatch draws (n_local/B_local scaling) must average
    to the deterministic full-batch sharded loss. N=44 is not device-divisible
    — the boundary device holds a 2-true-row prefix + 4 pad rows, exercising
    the contiguous-prefix invariant the local draw relies on."""
    rng = np.random.default_rng(11)
    N = 44
    X = rng.uniform(0, 1, size=(N, 1))
    Y = np.sin(5 * X)
    kerns = lambda: [K.RBF.create(lengthscales=[1.0])]
    mesh = make_mesh(8)

    m_full = DGP(X, Y, X[:6].copy(), kerns(), [], num_samples=2, seed=7,
                 mesh=mesh)
    loss_full, batch_full = m_full._loss_spec()
    full_val = float(loss_full(m_full.params, jax.random.PRNGKey(0),
                               batch_full))

    m_mb = DGP(X, Y, X[:6].copy(), kerns(), [], num_samples=2, seed=7,
               minibatch_size=16, mesh=mesh)
    loss_mb, batch_mb = m_mb._loss_spec()
    vals = _loss_over_keys(loss_mb, m_mb.params, batch_mb, 512)
    assert np.all(np.isfinite(vals))
    se = vals.std(ddof=1) / np.sqrt(len(vals))
    assert abs(vals.mean() - full_val) < 5 * se + 1e-9, (
        vals.mean(), full_val, se)


def test_sharded_dgp_minibatch_trains_all_topologies():
    """DGP(mesh=..., minibatch_size=...) trains finitely through the public
    API on 1-D data, 2-D data x sample, and DCN x ICI multislice meshes."""
    from dgp_tpu.parallel.mesh import make_mesh_2d, make_mesh_multislice

    rng = np.random.default_rng(12)
    N = 50
    X = rng.uniform(0, 1, size=(N, 2))
    Y = np.sin(4 * X[:, :1]) + X[:, 1:]
    kerns = lambda: [K.RBF.create(lengthscales=[1.0, 1.0]),
                     K.RBF.create(lengthscales=[1.0])]
    for mesh in (make_mesh(8), make_mesh_2d(4, 2), make_mesh_multislice(2, 4)):
        m = DGP(X, Y, X[:6].copy(), kerns(), [1], num_samples=2, seed=3,
                minibatch_size=16, mesh=mesh)
        losses = np.asarray(m.optimize_nat_adam(
            iterations1=3, iterations2=3, messages=0))
        assert np.all(np.isfinite(losses)), tuple(mesh.axis_names)


def test_mesh_2d_and_multislice_trainer_trajectory_matches_single_device():
    """Full-batch DGP training through 2-D and multislice meshes runs the same
    cached engines; on a sampling-free single-layer model the whole Adam +
    NatGrad trajectory must match the unsharded run to fp tolerance."""
    from dgp_tpu.parallel.mesh import make_mesh_2d, make_mesh_multislice

    rng = np.random.default_rng(13)
    N = 44
    X = rng.uniform(0, 1, size=(N, 1))
    Y = np.sin(5 * X)
    kerns = lambda: [K.RBF.create(lengthscales=[1.0])]

    m_single = DGP(X, Y, X[:6].copy(), kerns(), [], num_samples=2, seed=7)
    m_single.optimize_nat_adam(iterations1=4, iterations2=4, messages=0)

    for mesh in (make_mesh_2d(4, 2), make_mesh_multislice(2, 4)):
        m_mesh = DGP(X, Y, X[:6].copy(), kerns(), [], num_samples=2, seed=7,
                     mesh=mesh)
        m_mesh.optimize_nat_adam(iterations1=4, iterations2=4, messages=0)
        for a, b in zip(jax.tree_util.tree_leaves(m_single.params),
                        jax.tree_util.tree_leaves(m_mesh.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-9)


def test_mesh_row_axes_validation():
    import pytest

    from dgp_tpu.parallel.data_parallel import (
        mesh_row_axes,
        sharded_mf_minibatch_loss,
    )
    from dgp_tpu.parallel.mesh import make_mesh_2d, make_mesh_multislice

    assert mesh_row_axes(make_mesh(8)) == (("data",), None)
    assert mesh_row_axes(make_mesh_2d(4, 2)) == (("data",), "sample")
    assert mesh_row_axes(make_mesh_multislice(2, 4)) == (("slice", "data"),
                                                         None)
    with pytest.raises(ValueError):
        sharded_mf_minibatch_loss(make_mesh_2d(4, 2), 2, (8, 4))


def test_sharded_mf_minibatch_statistical_equivalence():
    """Sharded per-fidelity minibatch MF loss must agree with the sharded
    full-batch MF loss in expectation over (index draw, MC) keys."""
    from dgp_tpu.models.mf_dgp import MultiFidelityDeepGP

    rng = np.random.default_rng(14)
    X = [rng.uniform(0, 1, (21, 2)), rng.uniform(0, 1, (6, 2))]
    f = lambda x: np.sin(3 * x[:, :1]) + x[:, 1:]
    Y = [f(X[0]) + 0.3, f(X[1])]
    mesh = make_mesh(8)

    m_full = MultiFidelityDeepGP(X, Y, num_samples=2, seed=5, mesh=mesh)
    loss_full, batch_full = m_full._loss_spec()
    v_full = _loss_over_keys(loss_full, m_full.params, batch_full, 192)

    m_mb = MultiFidelityDeepGP(X, Y, num_samples=2, seed=5,
                               minibatch_size=[12, 4], mesh=mesh)
    loss_mb, batch_mb = m_mb._loss_spec()
    v_mb = _loss_over_keys(loss_mb, m_mb.params, batch_mb, 192, seed=1)

    assert np.all(np.isfinite(v_mb))
    se = np.sqrt(v_full.var(ddof=1) / len(v_full)
                 + v_mb.var(ddof=1) / len(v_mb))
    assert abs(v_full.mean() - v_mb.mean()) < 5 * se + 1e-9, (
        v_full.mean(), v_mb.mean(), se)


def _grad_proj_over_keys(loss_fn, params, batch, n_keys, seed=0):
    """Scalar projection <grad(loss), v> per MC key, v a fixed random
    direction. The projection touches every parameter leaf, so any sharded
    weighting/scaling bug in any term shifts its mean."""
    rng = np.random.default_rng(99)
    vs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(size=a.shape), a.dtype), params)

    def proj(k):
        g = jax.grad(lambda p: loss_fn(p, k, batch))(params)
        return sum(jnp.vdot(a, b)
                   for a, b in zip(jax.tree_util.tree_leaves(g),
                                   jax.tree_util.tree_leaves(vs)))

    keys = jax.random.split(jax.random.PRNGKey(seed), n_keys)
    return np.asarray(jax.jit(lambda ks: jax.lax.map(proj, ks))(keys))


def _assert_means_close(a, b, n_se=5, label=""):
    assert np.all(np.isfinite(a)) and np.all(np.isfinite(b)), label
    se = np.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
    assert abs(a.mean() - b.mean()) < n_se * se + 1e-9, (
        label, a.mean(), b.mean(), se)


def _em_models(mesh=None, minibatch_size=None):
    from dgp_tpu.bo.doe import lhs
    from dgp_tpu.models.mf_dgp_em import MultiFidelityDeepGP_EM
    from dgp_tpu.utils.test_functions import park_vd_high, park_vd_low

    X = [lhs(2, 12, seed=123), lhs(4, 5, seed=0)]
    Y = [park_vd_low(X[0]), park_vd_high(X[1])]
    X_red = [X[1][:, :2]]
    return MultiFidelityDeepGP_EM(X, Y, X_red, num_samples=2, seed=5,
                                  mesh=mesh, minibatch_size=minibatch_size)


def test_sharded_em_loss_and_grad_statistical_equivalence():
    """MF-DGP-EM sharded full-batch loss AND gradients must be the same
    estimator as the single-device loss: identical params (same seed), means
    over MC keys agree within 5 SE. The EM projection term's
    (N_{f+1}/B_{f+1})*(N_{f+1}/N_f) scale (mf_dgp_em.elbo) is exactly what a
    weighted shard could silently rescale — a mean shift here catches it."""
    em_single = _em_models()
    em_mesh = _em_models(mesh=make_mesh(8))
    for a, b in zip(jax.tree_util.tree_leaves(em_single.params),
                    jax.tree_util.tree_leaves(em_mesh.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ls, bs = em_single._loss_spec()
    lm, bm = em_mesh._loss_spec()
    _assert_means_close(_loss_over_keys(ls, em_single.params, bs, 256),
                        _loss_over_keys(lm, em_mesh.params, bm, 256, seed=1),
                        label="em loss")
    _assert_means_close(
        _grad_proj_over_keys(ls, em_single.params, bs, 192),
        _grad_proj_over_keys(lm, em_mesh.params, bm, 192, seed=1),
        label="em grad")


def test_sharded_mo_loss_and_grad_statistical_equivalence():
    """MO-DGP sharded full-batch loss AND gradients vs single device — the
    per-objective data-term scale is the sharding-sensitive piece."""
    from dgp_tpu.models.mo_dgp import MultiObjDeepGP

    rng = np.random.default_rng(16)
    Xm = rng.uniform(0, 1, (10, 1))
    Ys = [np.sin(3 * Xm), np.cos(2 * Xm)]
    build = lambda **kw: MultiObjDeepGP([Xm, Xm.copy()], Ys, loop=1,
                                        num_samples=2, seed=5, **kw)
    mo_single, mo_mesh = build(), build(mesh=make_mesh(8))
    for a, b in zip(jax.tree_util.tree_leaves(mo_single.params),
                    jax.tree_util.tree_leaves(mo_mesh.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ls, bs = mo_single._loss_spec()
    lm, bm = mo_mesh._loss_spec()
    _assert_means_close(_loss_over_keys(ls, mo_single.params, bs, 256),
                        _loss_over_keys(lm, mo_mesh.params, bm, 256, seed=1),
                        label="mo loss")
    _assert_means_close(
        _grad_proj_over_keys(ls, mo_single.params, bs, 192),
        _grad_proj_over_keys(lm, mo_mesh.params, bm, 192, seed=1),
        label="mo grad")


def test_sharded_em_minibatch_statistical_equivalence():
    """Sharded per-fidelity minibatch EM loss (incl. the lockstep X_red index
    draw) must agree in expectation with the sharded full-batch EM loss."""
    em_full = _em_models(mesh=make_mesh(8))
    em_mb = _em_models(mesh=make_mesh(8), minibatch_size=[8, 4])
    lf, bf = em_full._loss_spec()
    lb, bb = em_mb._loss_spec()
    _assert_means_close(_loss_over_keys(lf, em_full.params, bf, 256),
                        _loss_over_keys(lb, em_mb.params, bb, 256, seed=1),
                        label="em minibatch")


def test_sharded_mo_minibatch_statistical_equivalence():
    """Sharded per-objective minibatch MO loss vs sharded full batch."""
    from dgp_tpu.models.mo_dgp import MultiObjDeepGP

    rng = np.random.default_rng(17)
    Xm = rng.uniform(0, 1, (10, 1))
    Ys = [np.sin(3 * Xm), np.cos(2 * Xm)]
    build = lambda **kw: MultiObjDeepGP([Xm, Xm.copy()], Ys, loop=1,
                                        num_samples=2, seed=5,
                                        mesh=make_mesh(8), **kw)
    mo_full, mo_mb = build(), build(minibatch_size=[6, 6])
    lf, bf = mo_full._loss_spec()
    lb, bb = mo_mb._loss_spec()
    _assert_means_close(_loss_over_keys(lf, mo_full.params, bf, 256),
                        _loss_over_keys(lb, mo_mb.params, bb, 256, seed=1),
                        label="mo minibatch")


def test_sharded_em_and_mo_minibatch_training():
    """MF-DGP-EM and MO-DGP with mesh + minibatch_size: full staged schedules
    run finite through the public API (the EM L_red term reuses fidelity f+1's
    index draw in lockstep)."""
    from dgp_tpu.bo.doe import lhs
    from dgp_tpu.models.mf_dgp_em import MultiFidelityDeepGP_EM
    from dgp_tpu.models.mo_dgp import MultiObjDeepGP
    from dgp_tpu.utils.test_functions import park_vd_high, park_vd_low

    mesh = make_mesh(8)
    X = [lhs(2, 12, seed=123), lhs(4, 5, seed=0)]
    Y = [park_vd_low(X[0]), park_vd_high(X[1])]
    X_red = [X[1][:, :2]]
    em = MultiFidelityDeepGP_EM(X, Y, X_red, num_samples=2,
                                minibatch_size=[8, 4], mesh=mesh)
    losses = np.asarray(em.optimize_nat_adam(
        lr_adam=0.01, iterations1=3, iterations2=3, iterations3=3,
        messages=0))
    assert np.all(np.isfinite(losses))

    rng = np.random.default_rng(15)
    Xm = rng.uniform(0, 1, (10, 1))
    mo = MultiObjDeepGP([Xm, Xm.copy()], [np.sin(3 * Xm), np.cos(2 * Xm)],
                        loop=1, num_samples=2, minibatch_size=[6, 6],
                        mesh=mesh)
    losses = np.asarray(mo.optimize_adam(
        lr=0.01, iterations1=3, iterations2=3, iterations3=3, messages=0))
    assert np.all(np.isfinite(losses))
