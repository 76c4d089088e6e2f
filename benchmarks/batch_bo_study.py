"""Batch (q-point) infill study: quality at matched evaluation budget.

The round-4 batch infill (SO_BO/MO_BO ``run(batch_size=q)``, Kriging
Believer / constant liar) trades acquisition rounds for parallel
evaluations: q points per round, q x fewer surrogate retrains and
acquisition solves. This study measures what that costs in sample quality
at a MATCHED total evaluation budget — the honest comparison for a user
whose expensive simulator can run q cases in parallel:

  SO: Branin on [0,1]^2 (min 0.397887), GPR surrogate, DoE 8 + 16 evals
      as q=1 (16 rounds) / q=2 (8) / q=4 (4); metric = simple regret.
  MO: multi_obj_1D_4, default independent-GPR pair, DoE 10 + 8 evals as
      q=1 (8 rounds) / q=2 (4) / q=4 (2); metric = final hypervolume.

Each (loop, q, seed) cell appends to the JSON incrementally so an
interrupted run keeps its finished cells. Wall time per cell is recorded
but engine compiles are shared within the process — regret/HV is the
primary column, the driver-time ratio is structural (q x fewer rounds).

Usage: python benchmarks/batch_bo_study.py [--fast] [--out PATH]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

RESULTS = os.path.join(os.path.dirname(__file__), "batch_bo_study.json")

BRANIN_MIN = 0.397887
SEEDS = [0, 1, 2]
QS = [1, 2, 4]
SO_EVALS = 16
MO_EVALS = 8


class Branin:
    """Branin-Hoo rescaled to the unit square (x1 = 15u1 - 5, x2 = 15u2)."""

    constraint = False
    dim = 2

    def fun(self, u):
        u = np.asarray(u, dtype=float).reshape(-1, 2)
        x1 = 15.0 * u[:, 0] - 5.0
        x2 = 15.0 * u[:, 1]
        a, b, c = 1.0, 5.1 / (4 * np.pi ** 2), 5.0 / np.pi
        r, s, t = 6.0, 10.0, 1.0 / (8 * np.pi)
        f = (a * (x2 - b * x1 ** 2 + c * x1 - r) ** 2
             + s * (1 - t) * np.cos(x1) + s)
        return [f.reshape(-1, 1)]


def run_so_cell(q, seed, fast=False):
    from dgp_tpu.bo.so_bo import SO_BO

    spec = {"num_layers": 0, "kernels": "rbf"}
    bo = SO_BO(problem=Branin(), DoE_size=8, model_Y_dic=spec, seed=seed)
    de_kw = (dict(popsize_DE=30, iterations_DE=40, train_iterations=200)
             if fast else
             dict(popsize_DE=100, iterations_DE=150, train_iterations=1000))
    t0 = time.perf_counter()
    bo.run(SO_EVALS // q, IC="EI", IC_method="DE", batch_size=q,
           verbose=False, **de_kw)
    wall = time.perf_counter() - t0
    assert bo.X.shape[0] == 8 + SO_EVALS
    return {"loop": "so_branin", "q": q, "seed": seed,
            "rounds": SO_EVALS // q, "evals": SO_EVALS,
            "regret": float(bo.Ymin[-1] - BRANIN_MIN),
            "ymin_trace": [float(v) for v in bo.Ymin],
            "wall_s": wall}


def run_mo_cell(q, seed, fast=False):
    from dgp_tpu.bo.mo_bo import MO_BO
    from dgp_tpu.bo.problems import get

    bo = MO_BO(problem=get("multi_obj_1D_4"), DoE_size=10, seed=seed)
    de_kw = (dict(S=50, popsize_DE=20, iterations_DE=20) if fast
             else dict(S=1000, popsize_DE=300, iterations_DE=400))
    t0 = time.perf_counter()
    bo.run(MO_EVALS // q, batch_size=q, verbose=False, **de_kw)
    wall = time.perf_counter() - t0
    assert len(bo.X) == 10 + MO_EVALS
    return {"loop": "mo_1D_4", "q": q, "seed": seed,
            "rounds": MO_EVALS // q, "evals": MO_EVALS,
            "hv_final": float(bo.hv_trace[-1]),
            "hv_initial": float(bo.hv_trace[0]),
            "hv_trace": [float(v) for v in bo.hv_trace],
            "wall_s": wall}


def main():
    fast = "--fast" in sys.argv
    if "--cpu" in sys.argv or (fast and "--tpu" not in sys.argv):
        # sitecustomize pins JAX_PLATFORMS=axon; config.update after import
        # is the documented override (CLAUDE.md)
        import jax

        jax.config.update("jax_platforms", "cpu")
    out = RESULTS
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    results = []
    if os.path.exists(out):
        with open(out) as f:
            results = json.load(f).get("cells", [])
    done = {(c["loop"], c["q"], c["seed"]) for c in results}

    for runner, loop in ((run_so_cell, "so_branin"), (run_mo_cell, "mo_1D_4")):
        for q in QS:
            for seed in SEEDS:
                if (loop, q, seed) in done:
                    continue
                cell = runner(q, seed, fast=fast)
                results.append(cell)
                key = "regret" if "regret" in cell else "hv_final"
                print(f"{loop} q={q} seed={seed}: {key}="
                      f"{cell[key]:.5f} wall={cell['wall_s']:.1f}s",
                      flush=True)
                with open(out, "w") as f:
                    json.dump({"fast": fast, "cells": results}, f, indent=1)

    # summary: per (loop, q) mean over seeds
    print("\nsummary (mean over seeds):")
    for loop, key in (("so_branin", "regret"), ("mo_1D_4", "hv_final")):
        for q in QS:
            vals = [c[key] for c in results
                    if c["loop"] == loop and c["q"] == q]
            walls = [c["wall_s"] for c in results
                     if c["loop"] == loop and c["q"] == q]
            if vals:
                print(f"  {loop} q={q}: {key}={np.mean(vals):.5f} "
                      f"(+-{np.std(vals):.5f})  wall={np.mean(walls):.1f}s")


if __name__ == "__main__":
    main()
