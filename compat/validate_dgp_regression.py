"""Scripted nb_DGP_regression parity validation.

Reproduces /root/reference/Notebooks_dgp/nb_DGP_regression.ipynb with the
exact data (legacy numpy seed 0) and training schedule, asserting the stored
oracle numbers:

- parameter count 2032 (cell 30)
- initial ELBO -85.98812279560475 (cells 22/26; deterministic at init)
- final ELBO in the +100..+112 band after NatGrad+Adam (cell 26 prints
  104.91 / 107.70 near the end)
- tight fit of the step function (visual oracle, cells 34-41)

Run on CPU (f64): JAX_X64 + jax_platforms=cpu are set below.
Runtime: ~10 min on CPU for the full 500+5000 schedule; pass --fast for a
2000-iteration phase 2 (reaches ELBO ~100).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from dgp_tpu.models.dgp import DGP  # noqa: E402
from dgp_tpu.ops import kernels as K  # noqa: E402


def main(fast: bool = False):
    np.random.seed(0)
    N, M = 50, 25
    X = np.random.uniform(0, 1, N)[:, None]
    Z = np.random.uniform(0, 1, M)[:, None]
    f = lambda x: 0.0 if x < 0.5 else 1.0
    Y = np.reshape([f(x) for x in X], X.shape) + np.random.randn(*X.shape) * 1e-2

    kernels = [K.RBF.create(lengthscales=[1.0], variance=1.0) for _ in range(3)]
    model = DGP(X, Y, Z, kernels, [1, 1], num_samples=10)

    n_params = model.number_parameters()
    print(f"parameter count: {n_params} (oracle 2032)")
    assert n_params == 2032

    e0 = float(model.ELBO())
    print(f"initial ELBO: {e0:.11f} (oracle -85.98812279560475)")
    assert abs(e0 - (-85.98812279560475)) < 1e-6

    its2 = 2000 if fast else 5000
    losses = model.optimize_nat_adam(
        iterations1=500, iterations2=its2, lr_adam=0.01, beta_1=0.8, beta_2=0.9,
        lr_gamma=0.01, ng_all=False, messages=500,
    )
    final = -float(np.asarray(losses)[-1])
    print(f"final ELBO: {final:.2f} (oracle ~104-108 at 5000 iters)")
    assert final > (88.0 if fast else 100.0), final

    mean, var = model.predict(X, num_samples=100)
    rmse = float(np.sqrt(np.mean((mean - Y) ** 2)))
    print(f"train RMSE: {rmse:.4f}")
    assert rmse < 0.05
    print("nb_DGP_regression parity: OK")


if __name__ == "__main__":
    import os

    # default to CPU f64 parity mode; set DGP_TPU_VALIDATE_ON_TPU=1 to run on
    # the attached accelerator instead (must be decided before backend init).
    if not os.environ.get("DGP_TPU_VALIDATE_ON_TPU"):
        jax.config.update("jax_platforms", "cpu")
    main(fast="--fast" in sys.argv)
