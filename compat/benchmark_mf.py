"""Multi-repetition MF-DGP benchmark harness.

Counterpart of nb_mfdgp_improved's ``do_benchmark`` (cell 4): repeat the
Park-function experiment over several DoE seeds and report mean +/- std of
r2 / rmse / mnll (the reference's 20-seed study published rep-1 as
r2/mnll/rmse = 0.98792 / 1.14255 / 0.52562, cell 11).

Usage: python compat/benchmark_mf.py [--reps R] [--fast]
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


def one_rep(seed, fast):
    X = [lhs(4, 30, seed=123), lhs(4, 5, seed=seed)]
    Y = [park_low(X[0]), park_high(X[1])]
    x_test = lhs(4, 1000, seed=seed + 10_000)
    y_test = park_high(x_test)
    model = MultiFidelityDeepGP(X, Y, num_samples=10, seed=seed)
    if fast:
        model.optimize_nat_adam(lr_adam=0.005, iterations1=200,
                                iterations2=300, iterations3=600, messages=0)
    else:
        model.optimize_nat_adam(lr_adam=0.001, iterations1=1000,
                                iterations2=2000, iterations3=6000, messages=0)
    mean, var = model.predict(x_test)
    return calculate_metrics(y_test, mean, var)


def main(reps=5, fast=True):
    rows = []
    for r in range(reps):
        m = one_rep(1000 + r, fast)
        print(f"rep {r}: r2={m['r2']:.5f} rmse={m['rmse']:.5f} "
              f"mnll={m['mnll']:.5f}")
        rows.append(m)
    for k in ("r2", "rmse", "mnll"):
        vals = np.array([m[k] for m in rows])
        print(f"{k}: {vals.mean():.5f} +/- {vals.std():.5f}")
    print("(published rep-1: r2 0.98792, rmse 0.52562, mnll 1.14255)")


if __name__ == "__main__":
    if not os.environ.get("DGP_TPU_VALIDATE_ON_TPU"):
        jax.config.update("jax_platforms", "cpu")
    reps = 5
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    main(reps=reps, fast="--full" not in sys.argv)
