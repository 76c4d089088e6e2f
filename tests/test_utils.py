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
