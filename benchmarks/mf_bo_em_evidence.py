"""On-chip evidence for the round-5 'em' MF_BO surrogate: a BO loop over a
variant-input-dimension fidelity stack (2-D cheap source, 4-D expensive
one) driven end to end by the embedded-mapping MF-DGP
(models/mf_dgp_em.py; reference MF_DGP_EM.py:383 — the one reference model
family that previously was not reachable from any BO driver).

Problem (Park_VD-flavoured, unit box): the high-fidelity function's first
two coordinates follow the low one; the projection is coordinate dropping
(x[:, :2]), as in nb_mfdgpem.

Records per seed: best-high-fidelity trace, fidelity choices, cost,
wall, simple regret vs the grid optimum. Writes
benchmarks/mf_bo_em_evidence.json.

Usage: python benchmarks/mf_bo_em_evidence.py [--fast] [--seeds 0,1,2]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "mf_bo_em_evidence.json")


def _enable_cache():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def low2d(x):
    x = np.asarray(x, dtype=float)
    return (np.sin(6.0 * x[:, :1]) + 0.6 * x[:, 1:2]).reshape(-1, 1)


def high4d(x):
    x = np.asarray(x, dtype=float)
    return (np.sin(6.0 * x[:, :1]) + 0.6 * x[:, 1:2]
            + 0.4 * (x[:, 2:3] - 0.3) ** 2
            + 0.3 * x[:, 3:4] * x[:, 1:2]).reshape(-1, 1)


def grid_opt(n=40):
    """Grid optimum of the 4-D high-fidelity function (separable enough
    that a 40^2 x 21^2 product grid pins it to ~1e-3)."""
    a = np.linspace(0, 1, n)
    b = np.linspace(0, 1, 21)
    XX = np.stack(np.meshgrid(a, a, b, b, indexing="ij"), axis=-1)
    vals = high4d(XX.reshape(-1, 4))
    return float(vals.min())


def run_seed(seed, fast=False):
    from dgp_tpu.bo.mf_bo import MF_BO

    rng = np.random.default_rng(seed)
    X = [rng.uniform(0, 1, (12, 2)), rng.uniform(0, 1, (6, 4))]
    infills = 2 if fast else 6
    sched = (15, 5, 10) if fast else (150, 100, 250)
    bo = MF_BO(fidelities=[low2d, high4d], X=X,
               Y=[low2d(X[0]), high4d(X[1])],
               model_dic={"type": "em", "num_samples": 3,
                          "schedule": sched},
               projections=[lambda x: np.asarray(x)[:, :2]],
               seed=seed, gamma=0.3, dup_tol=5e-3)
    t0 = time.perf_counter()
    trace = bo.run(infills, popsize_DE=20 if fast else 120,
                   iterations_DE=20 if fast else 150,
                   num_samples=10 if fast else 100, verbose=True)
    wall = time.perf_counter() - t0
    f_opt = grid_opt(10 if fast else 40)
    return {
        "seed": seed, "infills": infills, "schedule": list(sched),
        "best_trace": [float(v) for v in trace],
        "best_doe": float(trace[0]), "best_final": float(trace[-1]),
        "f_opt_grid": round(f_opt, 5),
        "simple_regret": round(float(trace[-1]) - f_opt, 5),
        "fidelity_choices": list(map(int, bo.fidelity_choices)),
        "cost_spent": round(bo.cost_spent, 3),
        "wall_s": round(wall, 1),
    }


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
        out = run_seed(seed, fast=fast)
        out["fast"] = fast
        results = [r for r in results
                   if not (r["seed"] == seed and r.get("fast") == fast)]
        results.append(out)
        with open(RESULTS, "w") as f:
            json.dump({"seeds": results}, f, indent=1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
