"""Serving a trained DGP: checkpoint, reload, sharded + chunked batch predict.

The production inference recipe (beyond reference — the reference's predict
methods are eager single-process calls, dgp.py:154-172):

1. train a small DGP and save its parameter pytree,
2. reload into a fresh model,
3. run data-parallel batch inference over an 8-device mesh
   (``predict_y_sharded``; rows shard over the data axis, no collectives),
4. bound device memory on a large prediction set with ``chunk_size``.

Runs on CPU with 8 virtual devices: ``python examples/serving.py``.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from dgp_tpu.models.dgp import DGP, moment_matched
from dgp_tpu.ops import kernels as K
from dgp_tpu.parallel import make_mesh
from dgp_tpu.utils.checkpoint import load, save


def main():
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, (200, 2))
    Y = np.sin(4 * X[:, :1]) + 0.5 * X[:, 1:] + 0.02 * rng.normal(size=(200, 1))
    kernels = [K.RBF.create(lengthscales=[1.0, 1.0]),
               K.RBF.create(lengthscales=[1.0])]

    model = DGP(X, Y, X[:16].copy(), kernels, [1], num_samples=5)
    model.optimize(iterations=150, lr=0.02, messages=0)

    # -- checkpoint + reload into a fresh process/model ------------------------
    path = os.path.join(tempfile.mkdtemp(), "dgp.ckpt")
    save(path, model.params)
    served = DGP(X, Y, X[:16].copy(), kernels, [1], num_samples=5)
    served.params = load(path, served.params)

    # -- sharded batch inference over an 8-device mesh -------------------------
    mesh = make_mesh(8)
    Xq = rng.uniform(0, 1, (1003, 2))  # non-divisible rows: auto-padded
    y_m, y_v = served.predict_y_sharded(Xq, num_samples=50, mesh=mesh)
    mean, var = moment_matched(y_m, y_v)
    print(f"sharded predict: {mean.shape[0]} rows, "
          f"rmse vs truth {float(np.sqrt(np.mean((np.asarray(mean)[:, 0] - (np.sin(4 * Xq[:, 0]) + 0.5 * Xq[:, 1]))**2))):.3f}")

    # -- memory-bounded: host loop over fixed-shape device-multiple chunks -----
    y_m2, y_v2 = served.predict_y_sharded(Xq, num_samples=50, mesh=mesh,
                                          chunk_size=256)
    assert y_m2.shape == y_m.shape
    print(f"chunked predict: {y_m2.shape[1]} rows in ceil(1003/256) chunks, "
          f"var range [{float(np.min(np.asarray(y_v2))):.4f}, "
          f"{float(np.max(np.asarray(y_v2))):.4f}]")


if __name__ == "__main__":
    main()
