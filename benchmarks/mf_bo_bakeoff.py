"""MF-BO surrogate bake-off: MF-DGP vs exact AR(1) co-kriging.

The MF_BO driver refits its surrogate each infill on a handful of points
per fidelity. Measured failure of the variational MF-DGP at that size
(Forrester pair, DoE 8+4): the posterior collapses to a near-linear mean
with ~0.05 std while being wrong by 5-16, EI goes blind, and 2 of 3 seeds
never improve on the DoE in 10 infills — neither longer schedules nor
jittered restarts escape (the marginal likelihood genuinely prefers the
degenerate basin; see models/cokriging.py docstring). This benchmark
measures best-high-fidelity-vs-infill for both surrogate forms
MF_BO.make_model can build:

  mf_dgp   MultiFidelityDeepGP, schedule (200,200,400)
  ar1      exact AR(1) co-kriging, 8-start MLL Adam      (models/cokriging)
  nargp    nonlinear autoregressive GP, 8-start MLL Adam (models/nargp)

across the four same-dimension MF pairs in utils/test_functions
(forrester d=1 with a known optimum -6.0207; park d=4; the NONLINEAR
branin pair d=2 of Perdikaris et al. 2017, f_low = 10*sqrt(f_high)+...,
the canonical stress case a linear AR(1) cannot represent exactly —
deliberately adversarial to the chosen default; borehole d=8, the
near-affine classic) x 3 seeds x 10 infills, recording the best trace,
fidelity choices, cost-weighted budget and wall time — the
quality-per-second comparison that picks MF_BO's default surrogate.

Usage:
  python benchmarks/mf_bo_bakeoff.py [--fast] [--configs a,b] [--out PATH]

--fast shrinks schedules/DE budgets for a CPU smoke run; full runs are
meant for the TPU chip. Each (config, problem, seed) cell appends to the
JSON incrementally so an interrupted run keeps its finished cells.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

RESULTS = os.path.join(os.path.dirname(__file__), "mf_bo_bakeoff.json")

CONFIGS = {
    "mf_dgp": {"num_samples": 5, "schedule": (200, 200, 400)},
    "ar1": {"type": "ar1", "n_starts": 8, "iterations": 2000},
    "nargp": {"type": "nargp", "n_starts": 8, "iterations": 2000},
}

PROBLEMS = {
    "forrester": dict(d=1, DoE=(8, 4), infills=10, f_opt=-6.020740),
    "park": dict(d=4, DoE=(24, 8), infills=10, f_opt=None),
    "branin_mf": dict(d=2, DoE=(16, 6), infills=10, f_opt=0.397887),
    "borehole": dict(d=8, DoE=(40, 10), infills=10, f_opt=None),
}
SEEDS = [0, 1, 2]


def _fidelities(name):
    from dgp_tpu.utils import test_functions as tf

    if name == "forrester":
        return [tf.forrester_low, tf.forrester_high]
    if name == "branin_mf":
        return [tf.branin_low, tf.branin_high]
    if name == "borehole":
        return [tf.borehole_low, tf.borehole_high]
    return [tf.park_low, tf.park_high]


def run_cell(config_name, problem_name, seed, fast=False):
    from dgp_tpu.bo.mf_bo import MF_BO

    cfg = PROBLEMS[problem_name]
    spec = dict(CONFIGS[config_name])
    run_kw = dict(popsize_DE=300, iterations_DE=400, num_samples=500,
                  verbose=False)
    infills = cfg["infills"]
    if fast:
        if spec.get("type") in ("ar1", "nargp"):
            spec.update(n_starts=3, iterations=100)
        else:
            spec.update(num_samples=3, schedule=(20, 10, 10))
        run_kw = dict(popsize_DE=15, iterations_DE=15, num_samples=15,
                      verbose=False)
        infills = 2

    bo = MF_BO(fidelities=_fidelities(problem_name), DoE_sizes=cfg["DoE"],
               d=cfg["d"], model_dic=spec, seed=seed)
    t0 = time.perf_counter()
    trace = bo.run(infills, **run_kw)
    wall = time.perf_counter() - t0
    out = {
        "config": config_name, "problem": problem_name, "seed": seed,
        "infills": infills, "doe_sizes": list(cfg["DoE"]),
        "f_opt": cfg["f_opt"],
        "best_trace": [float(v) for v in trace],
        "best_doe": float(trace[0]), "best_final": float(trace[-1]),
        "x_best": [float(v) for v in np.ravel(bo.x_best)],
        "fidelity_choices": bo.fidelity_choices,
        "cost_spent": float(bo.cost_spent),
        "wall_s": round(wall, 2), "fast": bool(fast),
    }
    if cfg["f_opt"] is not None:
        out["simple_regret"] = float(trace[-1] - cfg["f_opt"])
    return out


def main():
    fast = "--fast" in sys.argv
    out_path = RESULTS
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    config_names = list(CONFIGS)
    if "--configs" in sys.argv:
        config_names = sys.argv[sys.argv.index("--configs") + 1].split(",")
    problem_names = list(PROBLEMS)
    if "--problems" in sys.argv:
        problem_names = sys.argv[sys.argv.index("--problems") + 1].split(",")
    if fast:
        import jax

        jax.config.update("jax_platforms", "cpu")
    cells = []
    if os.path.exists(out_path) and not fast:
        cells = json.load(open(out_path)).get("cells", [])
    done = {(c["config"], c["problem"], c["seed"]) for c in cells}
    for config in config_names:
        for name in problem_names:
            for seed in SEEDS:
                if (config, name, seed) in done:
                    continue
                cell = run_cell(config, name, seed, fast=fast)
                print(json.dumps(cell), flush=True)
                cells.append(cell)
                if not fast:
                    with open(out_path, "w") as f:
                        json.dump({"cells": cells}, f, indent=1)


if __name__ == "__main__":
    main()
