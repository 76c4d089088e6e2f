import os

import numpy as np

from dgp_tpu.models.dgp import DGP
from dgp_tpu.ops import kernels as K
from dgp_tpu.utils import checkpoint, monitor


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, (20, 1))
    Y = np.sin(5 * X)
    model = DGP(X, Y, X[:5].copy(), [K.RBF.create(lengthscales=[1.0])], [],
                num_samples=1)
    path = os.path.join(tmp_path, "ckpt.npz")
    checkpoint.save(path, model.params)
    model.optimize_adam(iterations=10, messages=0)
    restored = checkpoint.load(path, model.params)
    import jax

    leaves_a = jax.tree_util.tree_leaves(restored)
    # after restore, the first ELBO matches the pre-training value
    model2 = DGP(X, Y, X[:5].copy(), [K.RBF.create(lengthscales=[1.0])], [],
                 num_samples=1)
    leaves_b = jax.tree_util.tree_leaves(model2.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_summarize_tensor_stats(capsys):
    x = np.array([[1.0, 2.0], [3.0, np.nan]])
    stats = monitor.summarize_tensor(x, "t")
    assert stats["shape"] == (2, 2)
    assert stats["nans"] == 1
    assert abs(stats["mean"] - 2.0) < 1e-12
    out = capsys.readouterr().out
    assert "shape" in out


def test_training_metrics_trace():
    """adam_run with metrics_fn returns per-step structured metrics."""
    import jax
    import jax.numpy as jnp

    from dgp_tpu.layers.svgp import layer_kl
    from dgp_tpu.models import training
    from dgp_tpu.models.dgp import elbo

    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, (20, 1))
    Y = np.sin(5 * X)
    model = DGP(X, Y, X[:5].copy(), [K.RBF.create(lengthscales=[1.0])], [],
                num_samples=1)
    Xj, Yj = model.data

    def metrics(params):
        return {
            "kl_0": layer_kl(params.layers[0], params.layers[0].z),
            "lik_var": params.likelihood.variance,
        }

    mask = training.make_mask(model.params)
    params, trace = training.adam_run(
        lambda p, k: -elbo(p, Xj, Yj, k, 1), model.params, mask,
        jax.random.PRNGKey(0), steps=100, lr=0.01, metrics_fn=metrics,
    )
    assert set(trace) == {"loss", "grad_norm", "kl_0", "lik_var"}
    for v in trace.values():
        assert v.shape == (100,)
        assert np.all(np.isfinite(np.asarray(v)))
    assert np.min(np.asarray(trace["loss"])) < np.asarray(trace["loss"])[0]


def test_chunked_adam_matches_unchunked_and_checkpoints(tmp_path):
    """checkpoint_every chunks the scan with persistent opt state + key
    chain, so the trajectory is bit-identical to the unchunked run and
    intermediate params are saved to disk (SURVEY.md §5: the reference's
    15k-step phases were uninterruptible)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dgp_tpu.models import training
    from dgp_tpu.utils import checkpoint as ckpt

    import functools

    @functools.lru_cache(maxsize=None)
    def loss_factory():
        def loss(params, key, batch):
            X, Y = batch
            return jnp.sum((X @ params - Y) ** 2)

        return loss

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(20, 3)))
    Y = jnp.asarray(rng.normal(size=(20,)))
    p0 = jnp.zeros(3)
    mask = True
    key = jax.random.PRNGKey(0)

    p_plain, l_plain = training.adam_run(
        loss_factory(), p0, mask, key, steps=20, lr=0.05, data=(X, Y))

    seen = []
    path = str(tmp_path / "ck.npz")

    def cb(params, done):
        seen.append(done)
        ckpt.save(path, params)

    p_chunk, l_chunk = training.adam_run(
        loss_factory(), p0, mask, key, steps=20, lr=0.05, data=(X, Y),
        checkpoint_every=7, checkpoint_fn=cb)

    np.testing.assert_array_equal(np.asarray(p_plain), np.asarray(p_chunk))
    np.testing.assert_array_equal(np.asarray(l_plain), np.asarray(l_chunk))
    assert seen == [7, 14]  # no checkpoint after the final chunk
    restored = ckpt.load(path, like=p0)
    assert restored.shape == p0.shape


def test_chunked_nat_adam_matches_unchunked():
    """Same chunking guarantee for the Adam+NatGrad engine on a real
    single-layer SVGP (sampling-free ELBO)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dgp_tpu.models import training
    from dgp_tpu.models.dgp import DGP, _full_batch_loss, _qs_accessors
    from dgp_tpu.ops import kernels as K

    rng = np.random.default_rng(1)
    X = rng.uniform(0, 1, size=(16, 1))
    Y = np.sin(5 * X)
    make = lambda: DGP(X, Y, X[:5].copy(), [K.RBF.create(lengthscales=[1.0])],
                       [], num_samples=2)
    loss_fn = _full_batch_loss(2)
    get_q, set_q = _qs_accessors((0,))
    key = jax.random.PRNGKey(3)

    m1 = make()
    batch = (*m1.data, None, None)
    mask = training.make_mask(m1.params,
                              frozen_layer_fields={0: {"q_mu", "q_sqrt"}})
    pa, la = training.nat_adam_run(loss_fn, m1.params, mask, get_q, set_q,
                                   key, steps=9, data=batch)
    m2 = make()
    pb, lb = training.nat_adam_run(loss_fn, m2.params, mask, get_q, set_q,
                                   key, steps=9, data=batch,
                                   checkpoint_every=4)
    for a, b in zip(jax.tree_util.tree_leaves(pa),
                    jax.tree_util.tree_leaves(pb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_dgp_wrapper_checkpoint_path(tmp_path):
    import numpy as np

    from dgp_tpu.models.dgp import DGP
    from dgp_tpu.ops import kernels as K
    from dgp_tpu.utils import checkpoint as ckpt

    rng = np.random.default_rng(2)
    X = rng.uniform(0, 1, size=(12, 1))
    Y = np.sin(4 * X)
    m = DGP(X, Y, X[:4].copy(), [K.RBF.create(lengthscales=[1.0])], [],
            num_samples=2)
    path = str(tmp_path / "dgp.npz")
    m.optimize_adam(iterations=10, messages=0, checkpoint_path=path,
                    checkpoint_every=4)
    restored = ckpt.load(path, like=m.params)
    assert len(jax.tree_util.tree_leaves(restored)) == \
        len(jax.tree_util.tree_leaves(m.params))


import jax  # noqa: E402  (used by the checkpoint tests above)


def test_summary_parameter_table(capsys):
    """summary() prints a gpflow-print_summary-style table (the notebooks'
    inspection oracle, e.g. the Z_left (6, 4) row of nb_mfdgpem cell 12) and
    works on all four model wrappers + GPR + bare pytrees."""
    import numpy as np

    from dgp_tpu.bo.doe import lhs
    from dgp_tpu.models.dgp import DGP
    from dgp_tpu.models.gpr import GPR
    from dgp_tpu.models.mf_dgp import MultiFidelityDeepGP
    from dgp_tpu.models.mf_dgp_em import MultiFidelityDeepGP_EM
    from dgp_tpu.models.mo_dgp import MultiObjDeepGP
    from dgp_tpu.ops import kernels as K
    from dgp_tpu.utils.test_functions import park_vd_high, park_vd_low

    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, (20, 2))
    Y = np.sin(3 * X[:, :1])
    m = DGP(X, Y, X[:6].copy(),
            [K.RBF.create(lengthscales=[1.0, 1.0]),
             K.RBF.create(lengthscales=[1.0])], [1], num_samples=2)
    rows = monitor.summary(m)
    out = capsys.readouterr().out
    assert "layers[0].kernel.lengthscales" in out
    assert "softplus" in out and "total parameters:" in out
    assert any(r["transform"] == "tril" and r["name"].endswith("q_sqrt")
               for r in rows)
    # every reference-visible parameter group is present
    names = " ".join(r["name"] for r in rows)
    assert "likelihood.variance" in names and ".z" in names

    # silent mode + bare pytree
    assert monitor.summary(m.params, print_fn=None) == \
        monitor.summary(m, print_fn=None)

    g = GPR((X, Y), K.RBF.create(lengthscales=[1.0, 1.0]))
    assert len(monitor.summary(g, print_fn=None)) >= 3

    Xmf = [rng.uniform(0, 1, (12, 2)), rng.uniform(0, 1, (5, 2))]
    Ymf = [np.sin(3 * Xmf[0][:, :1]), np.sin(3 * Xmf[1][:, :1])]
    mf = MultiFidelityDeepGP(Xmf, Ymf, num_samples=2)
    mf_rows = monitor.summary(mf, print_fn=None)
    assert any("z_left" in r["name"] for r in mf_rows)

    Xe = [lhs(2, 12, seed=123), lhs(4, 5, seed=0)]
    Ye = [park_vd_low(Xe[0]), park_vd_high(Xe[1])]
    em = MultiFidelityDeepGP_EM(Xe, Ye, [Xe[1][:, :2]], num_samples=2)
    em_rows = monitor.summary(em, print_fn=None)
    assert any("layers_red" in r["name"] for r in em_rows)

    Xm = rng.uniform(0, 1, (10, 1))
    mo = MultiObjDeepGP([Xm, Xm.copy()], [np.sin(3 * Xm), np.cos(2 * Xm)],
                        loop=1, num_samples=2)
    assert len(monitor.summary(mo, print_fn=None)) > 0


def test_borehole_mf_pair():
    """Borehole high/low fidelity pair (utils/test_functions.py): the high
    fidelity is re-derived inline from the published formula (Harper &
    Gupta 1983 water-flow, unit-box rescaling), the low fidelity is the
    Xiong/Qian/Wu 2013 variant (5/1.5 constants), and the pair is strongly
    rank-correlated over an LHS — the property MF surrogates exploit."""
    import numpy as np
    from dgp_tpu.bo.doe import lhs
    from dgp_tpu.utils.test_functions import borehole_high, borehole_low

    # independent re-derivation at the domain midpoint
    r_w, r, T_u, H_u = 0.1, (100 + 50000) / 2, (63070 + 115600) / 2, 1050.0
    T_l, H_l, L, K_w = (63.1 + 116) / 2, 760.0, 1400.0, (9855 + 12045) / 2
    log_rr = np.log(r / r_w)
    f_mid = (2 * np.pi * T_u * (H_u - H_l)
             / (log_rr * (1 + 2 * L * T_u / (log_rr * r_w**2 * K_w)
                          + T_u / T_l)))
    x_mid = 0.5 * np.ones((1, 8))
    assert borehole_high(x_mid).shape == (1, 1)
    np.testing.assert_allclose(borehole_high(x_mid)[0, 0], f_mid, rtol=1e-12)

    X = lhs(8, 200, seed=0)
    yh, yl = borehole_high(X)[:, 0], borehole_low(X)[:, 0]
    assert yh.shape == (200,) and np.all(yh > 0) and np.all(yl > 0)
    assert np.all(np.isfinite(yh)) and np.all(np.isfinite(yl))
    # near-affine pair (the 2*L*T_u/(log_rr*r_w^2*K_w) term dominates both
    # denominators, so the 1 vs 1.5 constant barely matters) — the classic
    # "easy" MF benchmark; an AR(1) surrogate should nail it
    corr = np.corrcoef(yh, yl)[0, 1]
    assert corr > 0.99, corr


def test_branin_mf_pair():
    """Nonlinear MF branin (Perdikaris et al. 2017 NARGP benchmark):
    f_low = 10*sqrt(f_high) + 2(x1-0.5) - 3(3x2-1) - 1 on the unit box —
    the low fidelity is a NONLINEAR transform of the high one, the case a
    linear AR(1) surrogate cannot represent exactly."""
    import numpy as np
    from dgp_tpu.bo.doe import lhs
    from dgp_tpu.utils.test_functions import branin_high, branin_low

    # independent re-derivation: branin at its known global minimum
    # (-pi, 12.275) -> 0.397887..., unit-box coords ((-pi+5)/15, 12.275/15)
    x_star = np.array([[(-np.pi + 5.0) / 15.0, 12.275 / 15.0]])
    np.testing.assert_allclose(branin_high(x_star)[0, 0], 0.397887,
                               atol=1e-5)
    X = lhs(2, 200, seed=0)
    yh, yl = branin_high(X)[:, 0], branin_low(X)[:, 0]
    assert np.all(yh > 0) and np.all(np.isfinite(yl))
    np.testing.assert_allclose(
        yl, 10.0 * np.sqrt(yh) + 2.0 * (X[:, 0] - 0.5)
        - 3.0 * (3.0 * X[:, 1] - 1.0) - 1.0, rtol=1e-12)
    # nonlinear relation: an affine fit of low on high leaves real residue
    resid = yl - np.polyval(np.polyfit(yh, yl, 1), yh)
    assert np.std(resid) > 0.05 * np.std(yl)
