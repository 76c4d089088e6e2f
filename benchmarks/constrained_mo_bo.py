"""Constrained MO-BO evidence run (round 4): cEHVI = EHVI * prod PoF.

The reference handles constraints only in its single-objective loop
(SO_BO.py + Infill_criteria.py EV/PoF); ``MO_BO`` extends the same
machinery to the multi-objective loop: one exact-GPR surrogate per
constraint, EHVI weighted by the product of per-constraint feasibility
probabilities, and a PoF-only bootstrap while the archive has no feasible
point (bo/ehvi.py, bo/mo_bo.py).

Runs the two classic constrained bi-objective problems (Binh & Korn 1997,
Srinivas & Deb 1994; bo/problems.py) at the reference DE budget and records
the feasible-front hypervolume trace + the feasibility rate of proposals.
Writes benchmarks/constrained_mo_bo.json.

Usage: python benchmarks/constrained_mo_bo.py [--fast]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESULTS = os.path.join(os.path.dirname(__file__), "constrained_mo_bo.json")


def run_problem(name, seed, infills=8, fast=False):
    from dgp_tpu.bo.mo_bo import MO_BO
    from dgp_tpu.bo.problems import get

    problem = get(name)
    run_kw = (dict(S=50, popsize_DE=20, iterations_DE=20, verbose=False)
              if fast else
              dict(S=1000, popsize_DE=300, iterations_DE=400, verbose=False))
    bo = MO_BO(problem=problem, DoE_size=6 * problem.dim, seed=seed)
    n_feas_doe = int((bo.C.max(axis=1) <= 0).sum())
    t0 = time.perf_counter()
    trace = bo.run(2 if fast else infills, **run_kw)
    wall = time.perf_counter() - t0
    added_C = bo.C[len(bo.C) - len(bo.added_points):]
    return {
        "problem": name, "seed": seed, "doe": len(bo.X) - len(bo.added_points),
        "n_con": bo.n_con, "feasible_in_doe": n_feas_doe,
        "infills": len(bo.added_points),
        "feasible_proposals": int((added_C.max(axis=1) <= 0).sum()),
        "hv_trace": [float(h) for h in trace],
        "hv_doe": float(trace[0]), "hv_final": float(trace[-1]),
        "wall_s": round(wall, 2), "fast": bool(fast),
    }


def main():
    fast = "--fast" in sys.argv
    if fast:
        import jax

        jax.config.update("jax_platforms", "cpu")
    cells = []
    for name in ("bnh", "srn"):
        for seed in (0, 1, 2):
            cell = run_problem(name, seed, fast=fast)
            print(json.dumps(cell), flush=True)
            cells.append(cell)
    if not fast:
        with open(RESULTS, "w") as f:
            json.dump({"cells": cells}, f, indent=1)


if __name__ == "__main__":
    main()
