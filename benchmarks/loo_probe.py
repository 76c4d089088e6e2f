"""LOO-calibration probe for the tiny-n MF-DGP degenerate basin (VERDICT r4
item 5).

Round-4 finding (models/cokriging.py docstring, benchmarks/mf_bo_bakeoff):
at BO-loop data sizes (Forrester pair, 4 high-fidelity points) the
variational MF-DGP often collapses to an overconfident near-linear
posterior, and TRAIN-fit scores (r2, train log-density) provably cannot
separate the degenerate basin from the good one — both basins interpolate
the 4 points. The untried principled probe: *leave-one-out predictive
density* at the high-fidelity points scores calibration — exactly the
failure mode — because a collapsed posterior that interpolates 3 points is
confidently WRONG at the held-out 4th.

Protocol, per DoE seed (0/1/2, the bake-off's):

1. Train R candidate MF-DGPs (model-seed jitter, the bake-off schedule
   (200, 200, 400), Z pinned to the DoE so LOO refits keep shapes).
2. Score each candidate by
   (a) train_r2 at the high-fid points      [the r4 selector that fails],
   (b) train log-density at the same points [calibration without holdout],
   (c) LOO log-density: for each high-fid point, WARM-START from the
       candidate's params (basin membership preserved — the staged trainer
       would re-init q and erase it), drop the point, short Adam refit,
       density at the held-out point; sum over the 4 folds.
3. Ground truth per candidate: test RMSE + test log-density on a 200-point
   grid of the true high-fidelity function.
4. Verdict per score: Spearman rank correlation with test log-density
   across candidates, and whether argmax(score) picks a good candidate
   (test_rmse below the per-seed candidate median) where argmax(train_r2)
   does not.

Writes benchmarks/loo_probe.json; the dated conclusion lives in
benchmarks/loo_probe.md.

Usage: python benchmarks/loo_probe.py [--fast] [--seeds 0,1,2]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "loo_probe.json")

SCHEDULE = (200, 200, 400)  # the mf_bo_bakeoff regime
R_CANDIDATES = 5
LOO_REFIT_STEPS = 150


def _enable_cache():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def _doe(seed):
    from dgp_tpu.bo.doe import lhs
    from dgp_tpu.utils import test_functions as tf

    X = [lhs(1, 8, seed=seed), lhs(1, 4, seed=seed + 1)]
    Y = [np.asarray(tf.forrester_low(X[0]), dtype=float).reshape(-1, 1),
         np.asarray(tf.forrester_high(X[1]), dtype=float).reshape(-1, 1)]
    return X, Y


def _pooled_norm(Y):
    pooled = np.vstack(Y)
    mu, sd = float(pooled.mean()), float(pooled.std() or 1.0)
    return [(y - mu) / sd for y in Y], mu, sd


def _train(X, Ys_n, Z, model_seed, schedule):
    from dgp_tpu.models.mf_dgp import MultiFidelityDeepGP

    m = MultiFidelityDeepGP(X, Ys_n, Z=[z.copy() for z in Z],
                            num_samples=5, seed=model_seed)
    m.optimize_nat_adam(iterations1=schedule[0], iterations2=schedule[1],
                        iterations3=schedule[2], messages=0)
    return m


def _logdens(model, Xq, yq, S=200):
    """MC-mixture predictive log-density log mean_s N(y; m_s, v_s) per row
    (the mnll integrand of nb_mfdgp_improved cell 4, normalized units)."""
    m_s, v_s = model.predict_y(Xq, S)
    m_s = np.asarray(m_s)[:, :, 0]  # [S, n]
    v_s = np.maximum(np.asarray(v_s)[:, :, 0], 1e-12)
    y = np.asarray(yq).reshape(1, -1)
    log_n = (-0.5 * np.log(2 * np.pi * v_s)
             - 0.5 * (y - m_s) ** 2 / v_s)  # [S, n]
    mx = log_n.max(axis=0)
    return mx + np.log(np.exp(log_n - mx).mean(axis=0))  # [n]


def _warm_refit(model, X, Ys_n, drop_idx, steps):
    """Clone the trained candidate, drop high-fid row ``drop_idx``, and
    short-Adam-refit ALL params from the candidate's own basin (the staged
    trainer would re-init q — exactly what must not happen here)."""
    import jax.numpy as jnp

    from dgp_tpu.config import default_float
    from dgp_tpu.models import training
    from dgp_tpu.models.mf_dgp import MultiFidelityDeepGP

    keep = [i for i in range(len(Ys_n[-1])) if i != drop_idx]
    X_loo = [X[0], X[1][keep]]
    Y_loo = [Ys_n[0], Ys_n[1][keep]]
    m = MultiFidelityDeepGP(X_loo, Y_loo, Z=[np.asarray(z) for z in model.Z],
                            num_samples=5, seed=0)
    m.params = model.params  # warm start: stay in the candidate's basin
    loss_fn, batch = m._loss_spec()
    mask = training.make_mask(m.params)  # everything (Adam only)
    m.params, _ = training.adam_run(
        loss_fn, m.params, mask, m._next_key(), steps=steps, lr=0.01,
        messages=0, data=batch)
    return m


def probe_seed(seed, fast=False):
    from dgp_tpu.utils import test_functions as tf

    schedule = (30, 20, 40) if fast else SCHEDULE
    refit_steps = 20 if fast else LOO_REFIT_STEPS
    X, Y = _doe(seed)
    Ys_n, mu, sd = _pooled_norm(Y)
    grid = np.linspace(0, 1, 200)[:, None]
    truth_n = (np.asarray(tf.forrester_high(grid), dtype=float)
               .reshape(-1, 1) - mu) / sd

    from dgp_tpu.models.dgp import moment_matched

    cands = []
    for r in range(2 if fast else R_CANDIDATES):
        t0 = time.perf_counter()
        m = _train(X, Ys_n, X, model_seed=r, schedule=schedule)
        y_hi = Ys_n[-1].reshape(-1)

        # (a) train r2 at the high-fid points
        m_s, v_s = m.predict_f(X[1], S=200)
        mm, _ = moment_matched(np.asarray(m_s), np.asarray(v_s))
        mm = np.asarray(mm).reshape(-1)
        ss_res = float(np.sum((mm - y_hi) ** 2))
        ss_tot = float(np.sum((y_hi - y_hi.mean()) ** 2))
        train_r2 = 1.0 - ss_res / ss_tot

        # (b) train log-density (calibration without holdout)
        train_ld = float(_logdens(m, X[1], y_hi).mean())

        # (c) LOO log-density with warm-started refits
        loo = []
        for i in range(len(y_hi)):
            m_i = _warm_refit(m, X, Ys_n, i, refit_steps)
            loo.append(float(_logdens(m_i, X[1][i:i + 1],
                                      y_hi[i:i + 1])[0]))
        loo_ld = float(np.mean(loo))

        # ground truth on the dense grid
        tm_s, tv_s = m.predict_f(grid, S=200)
        tmm, _ = moment_matched(np.asarray(tm_s), np.asarray(tv_s))
        test_rmse = float(np.sqrt(np.mean(
            (np.asarray(tmm).reshape(-1) - truth_n.reshape(-1)) ** 2)))
        test_ld = float(_logdens(m, grid, truth_n.reshape(-1)).mean())

        cands.append({
            "model_seed": r, "train_r2": round(train_r2, 4),
            "train_logdens": round(train_ld, 4),
            "loo_logdens": round(loo_ld, 4),
            "loo_per_fold": [round(v, 3) for v in loo],
            "test_rmse_n": round(test_rmse, 4),
            "test_logdens": round(test_ld, 4),
            "wall_s": round(time.perf_counter() - t0, 1),
        })
        print(json.dumps({"seed": seed, **cands[-1]}), flush=True)

    def _spearman(a, b):
        ra = np.argsort(np.argsort(a)).astype(float)
        rb = np.argsort(np.argsort(b)).astype(float)
        ca = ra - ra.mean()
        cb = rb - rb.mean()
        den = float(np.sqrt((ca ** 2).sum() * (cb ** 2).sum()))
        return float((ca * cb).sum() / den) if den else 0.0

    test_ld = [c["test_logdens"] for c in cands]
    rmse = np.asarray([c["test_rmse_n"] for c in cands])
    good = rmse <= np.median(rmse) + 1e-12
    summary = {"seed": seed, "candidates": cands}
    for score in ("train_r2", "train_logdens", "loo_logdens"):
        vals = [c[score] for c in cands]
        pick = int(np.argmax(vals))
        summary[f"{score}_spearman_vs_test_logdens"] = round(
            _spearman(vals, test_ld), 3)
        summary[f"{score}_argmax_is_good"] = bool(good[pick])
        summary[f"{score}_argmax_test_rmse"] = float(rmse[pick])
    return summary


def main():
    _enable_cache()
    fast = "--fast" in sys.argv
    seeds = [0, 1, 2]
    if "--seeds" in sys.argv:
        seeds = [int(s) for s in
                 sys.argv[sys.argv.index("--seeds") + 1].split(",")]
    results = []
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            results = json.load(f).get("seeds", [])
    for seed in seeds:
        out = probe_seed(seed, fast=fast)
        out["fast"] = fast
        results = [r for r in results
                   if not (r["seed"] == seed and r.get("fast") == fast)]
        results.append(out)
        with open(RESULTS, "w") as f:
            json.dump({"schedule": list(SCHEDULE),
                       "loo_refit_steps": LOO_REFIT_STEPS,
                       "seeds": results}, f, indent=1)
        print(json.dumps({k: v for k, v in out.items()
                          if k != "candidates"}), flush=True)


if __name__ == "__main__":
    main()
