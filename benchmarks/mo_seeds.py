"""MO-DGP multi-seed robustness check (v5e, f32, full notebook schedule).

The MO landscape is chaotic (ulp-level numerics changes reshuffle
trajectories — see CLAUDE.md), so single-seed fit numbers overstate
certainty; this records the train-r2 spread over fresh LHS DoEs with the
natgrad loss guard active. Writes benchmarks/mo_seeds_results.json.

At the short family-run schedule (200/300/800) fits are strongly
seed-dependent (r2 0.24-0.98); at the reference's own schedule
(--full: 2000/5000/7500, whose published trajectory stalls at ELBO
~-1.7e8) with best-of-4 restarts + lengthscale init jitter
(models/mo_dgp.py) all four seeds reach r2_obj0 = 1.0 and
r2_obj1 >= 0.997 (full_restarts4 section of the results file);
stream-only restarts left one bad-DoE seed at obj0 0.65-0.72.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run(seed, full=False, restarts=1):
    from dgp_tpu.bo.doe import lhs
    from dgp_tpu.bo.problems import get
    from dgp_tpu.models.dgp import moment_matched
    from dgp_tpu.models.mo_dgp import MultiObjDeepGP

    problem = get("multi_obj_1D_4")
    n = 10 * problem.dim
    X_ = lhs(problem.dim, n, seed=seed)
    F = np.asarray([problem.fun(x) for x in X_], dtype=float).reshape(n, 2)
    X = (X_ - X_.mean(0)) / X_.std(0)
    Y0 = (F[:, :1] - F[:, :1].mean(0)) / F[:, :1].std(0)
    Y1 = (F[:, 1:2] - F[:, 1:2].mean(0)) / F[:, 1:2].std(0)
    model = MultiObjDeepGP([X, X.copy()], [Y0, Y1], loop=2, num_samples=10,
                           seed=seed)
    sched = (dict(iterations1=2000, iterations2=5000, iterations3=7500)
             if full else
             dict(iterations1=200, iterations2=300, iterations3=800))
    t0 = time.perf_counter()
    losses = model.optimize_nat_adam(messages=0, restarts=restarts, **sched)
    wall = time.perf_counter() - t0
    l = np.asarray(losses)
    out = {"seed": seed,
           "schedule": "/".join(str(v) for v in sched.values()),
           "restarts": restarts,
           "wall_s": round(wall, 1),
           "elbo_end": round(-float(l[-20:].mean()), 1),
           "nonfinite": int(np.sum(~np.isfinite(l)))}
    for obj, Yt in ((0, Y0), (1, Y1)):
        Fm, Fv = model.predict_f(X, S=200, objective=obj)
        m, _ = moment_matched(Fm, Fv)
        m = np.asarray(m)
        out[f"r2_obj{obj}"] = round(
            1 - float(np.sum((m - Yt) ** 2) / np.sum((Yt - Yt.mean()) ** 2)),
            4)
    return out


def main():
    full = "--full" in sys.argv
    restarts = 1
    if "--restarts" in sys.argv:
        v = sys.argv[sys.argv.index("--restarts") + 1]
        restarts = v if v == "auto" else int(v)
    results = []
    for seed in (0, 1, 2, 3):
        out = run(seed, full=full, restarts=restarts)
        print(json.dumps(out), flush=True)
        results.append(out)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "mo_seeds_results.json")
    merged = results
    if os.path.exists(path):
        try:
            with open(path) as f:
                prior = json.load(f)
            if isinstance(prior, dict):
                tag = ("full" if full else "short") + \
                    ("" if restarts == 1 else f"_restarts{restarts}")
                prior[tag] = results
                merged = prior
        except Exception:
            pass
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)


if __name__ == "__main__":
    main()
