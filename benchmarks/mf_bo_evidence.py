"""MF-BO evidence run (round 4): MF-DGP surrogate + EI + BOCA fidelity rule.

Two standard multi-fidelity pairs (utils/test_functions.py):

* forrester (d=1): known global minimum f(0.75725) = -6.0207 — an exact
  optimization oracle.
* park (d=4): the reference's own MF modeling benchmark
  (nb_mfdgp_improved), here driven as an optimization problem (best
  observed high-fidelity value; the high function is strictly positive and
  decreases toward x2,x3,x4 -> 0 at fixed x1).

Records best-high-fidelity-vs-infill, the fidelity choices, and the
cost-weighted budget. Writes benchmarks/mf_bo_evidence.json.

Usage: python benchmarks/mf_bo_evidence.py [--fast]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "mf_bo_evidence.json")

PROBLEMS = {
    "forrester": dict(d=1, DoE=(8, 4), infills=10, f_opt=-6.020740),
    "park": dict(d=4, DoE=(24, 8), infills=10, f_opt=None),
}


def _fidelities(name):
    from dgp_tpu.utils import test_functions as tf

    if name == "forrester":
        return [tf.forrester_low, tf.forrester_high]
    return [tf.park_low, tf.park_high]


def run_cell(name, seed, fast=False):
    from dgp_tpu.bo.mf_bo import MF_BO

    cfg = PROBLEMS[name]
    spec = None  # the shipped DEFAULT_MODEL_DIC (bake-off winner: 'ar1')
    run_kw = dict(popsize_DE=300, iterations_DE=400, num_samples=500,
                  verbose=False)
    infills = cfg["infills"]
    if fast:
        spec = {"type": "ar1", "n_starts": 3, "iterations": 100}
        run_kw = dict(popsize_DE=15, iterations_DE=15, num_samples=15,
                      verbose=False)
        infills = 2

    bo = MF_BO(fidelities=_fidelities(name), DoE_sizes=cfg["DoE"],
               d=cfg["d"], model_dic=spec, seed=seed)
    t0 = time.perf_counter()
    trace = bo.run(infills, **run_kw)
    wall = time.perf_counter() - t0
    return {
        "problem": name, "seed": seed, "infills": infills,
        "doe_sizes": list(cfg["DoE"]), "f_opt": cfg["f_opt"],
        "best_trace": [float(v) for v in trace],
        "best_doe": float(trace[0]), "best_final": float(trace[-1]),
        "x_best": [float(v) for v in np.ravel(bo.x_best)],
        "fidelity_choices": bo.fidelity_choices,
        "cost_spent": float(bo.cost_spent),
        "wall_s": round(wall, 2), "fast": bool(fast),
    }


def main():
    fast = "--fast" in sys.argv
    if fast:
        import jax

        jax.config.update("jax_platforms", "cpu")
    cells = []
    for name in PROBLEMS:
        for seed in (0, 1, 2):
            cell = run_cell(name, seed, fast=fast)
            print(json.dumps(cell), flush=True)
            cells.append(cell)
    if not fast:
        with open(RESULTS, "w") as f:
            json.dump({"cells": cells}, f, indent=1)


if __name__ == "__main__":
    main()
