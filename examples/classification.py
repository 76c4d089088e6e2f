"""Bernoulli-DGP binary classification end to end.

The reference is regression-only (its BroadcastingLikelihood machinery,
/root/reference/dgp_dace/utils/utils.py:54-117, exists precisely to support
non-Gaussian likelihoods but is never exercised); here the quadrature
Bernoulli head (dgp_tpu.ops.likelihoods.Bernoulli) drives a 2-layer DGP
classifier through the standard training/prediction APIs.

Run: python examples/classification.py
"""

import numpy as np


def make_data(n=120, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(0.0, 1.0, size=(n, 2))
    # two diagonal bands: nonlinear decision boundary
    logits = np.sin(6.0 * X[:, :1]) + 2.0 * (X[:, 1:] - 0.5)
    Y = (logits + 0.1 * rng.normal(size=logits.shape) > 0).astype(float)
    return X, Y


def main(iterations=800, seed=0):
    import jax

    from dgp_tpu.layers.initializations import init_layers_linear
    from dgp_tpu.models.dgp import DGP
    from dgp_tpu.ops import kernels as K
    from dgp_tpu.ops.likelihoods import Bernoulli

    X, Y = make_data(seed=seed)
    Z = X[::4].copy()
    kernels = [
        K.RBF.create(variance=1.0, lengthscales=[0.5, 0.5]),
        K.RBF.create(variance=1.0, lengthscales=[0.5, 0.5]),
    ]
    layers = init_layers_linear(X, Y, Z, kernels, [2])
    model = DGP.from_layers(X, Y, layers, likelihood=Bernoulli(),
                            num_samples=5, seed=seed)

    losses = model.optimize_adam(iterations=iterations, lr=0.02, messages=200)
    p_mean, p_var = model.predict(X, 100)  # moment-matched P(y=1 | x)
    acc = float(np.mean((p_mean > 0.5) == (np.asarray(Y) > 0.5)))
    # average predictive log-density of the held-in labels
    logd = np.asarray(model.predict_density(X, Y, 100))
    print(f"final -ELBO: {float(np.asarray(losses)[-1]):.3f}")
    print(f"train accuracy: {acc:.3f}")
    print(f"mean predictive log-density: {logd.mean():.3f}")
    return acc, logd.mean()


if __name__ == "__main__":
    import jax

    jax.config.update("jax_enable_x64", True)
    import os

    if not os.environ.get("DGP_TPU_ON_TPU"):
        jax.config.update("jax_platforms", "cpu")
    main()
