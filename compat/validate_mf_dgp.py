"""Scripted nb_mfdgp_improved parity validation (MF-DGP on Park).

Full schedule (NatGrad 1000/2000/6000, lr_adam=1e-3) reaches
r2/rmse/mnll = 0.98467 / 0.59607 / 1.06168 in the reference (cell 15; its LHS
DoE comes from a pyDOE fork whose RNG cannot be replayed, so the assertion is
distributional: r2 >= 0.95 on a fresh LHS). Pass --fast for a shortened
schedule asserting r2 >= 0.85.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from dgp_tpu.bo.doe import lhs  # noqa: E402
from dgp_tpu.models.mf_dgp import MultiFidelityDeepGP  # noqa: E402
from dgp_tpu.utils.test_functions import (  # noqa: E402
    calculate_metrics,
    park_high,
    park_low,
)


def main(fast=False):
    X = [lhs(4, 30, seed=123), lhs(4, 5, seed=124)]
    Y = [park_low(X[0]), park_high(X[1])]
    x_test = lhs(4, 1000, seed=125)
    y_test = park_high(x_test)

    model = MultiFidelityDeepGP(X, Y, num_samples=10)
    if fast:
        model.optimize_nat_adam(lr_adam=0.005, iterations1=300,
                                iterations2=400, iterations3=800, messages=500)
        threshold = 0.85
    else:
        model.optimize_nat_adam(lr_adam=0.001, iterations1=1000,
                                iterations2=2000, iterations3=6000,
                                messages=500)
        threshold = 0.95
    mean, var = model.predict(x_test)
    metrics = calculate_metrics(y_test, mean, var)
    print("metrics:", metrics, "(published r2/rmse/mnll: 0.98467/0.59607/1.06168)")
    assert metrics["r2"] > threshold, metrics
    print("nb_mfdgp_improved parity: OK")


if __name__ == "__main__":
    import os

    if not os.environ.get("DGP_TPU_VALIDATE_ON_TPU"):
        jax.config.update("jax_platforms", "cpu")
    main(fast="--fast" in sys.argv)
