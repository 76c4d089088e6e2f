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
