"""MO-BO surrogate bake-off: coupled MO-DGP vs independent per-objective
surrogates (VERDICT r3 item 2).

The round-3 open problem: EHVI proposals on the chaotic coupled MO-DGP
surrogate revisit corners/points — a surrogate-fidelity issue, not a driver
one. bo/ehvi.py has always supported EHVI over a *list* of two independent
models (the reference's own EHVI.py:124-130 branch); this benchmark measures
hypervolume-vs-infill for the surrogate forms MO_BO.make_model can build:

  mo_dgp_fast      coupled MO-DGP, fast schedule (100,0,0)      [old default]
  mo_dgp_published coupled MO-DGP, published (2000,5000,7500), restarts=auto
  indep_gpr        two exact GPRs (analytic EHVI moments)
  indep_dgp        two independent 2-layer DGPs (Adam->NatGrad)

across >=3 problems x >=3 seeds at a fixed infill count, recording the HV
trace, final HV vs the problem's hv_max, and wall time per config — the
quality-per-second comparison that picks MO_BO's defaults.

Usage:
  python benchmarks/mo_bo_bakeoff.py [--fast] [--out PATH]
         [--configs a,b,...] [--problems p1,p2] [--seeds 0,1,2]

--fast shrinks schedules/DE budgets for a CPU smoke run; full runs are meant
for the TPU chip. Each (config, problem, seed) cell appends to the JSON
incrementally so an interrupted run keeps its finished cells.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

RESULTS = os.path.join(os.path.dirname(__file__), "mo_bo_bakeoff.json")

CONFIGS = {
    "mo_dgp_fast": {"loop": 2, "num_samples": 5, "schedule": (100, 0, 0),
                    "restarts": 1},
    "mo_dgp_published": {"loop": 2, "num_samples": 5,
                         "schedule": (2000, 5000, 7500), "restarts": "auto"},
    "indep_gpr": {"type": "independent", "num_layers": 0, "kernels": "rbf",
                  "iterations": 2000},
    "indep_dgp": {"type": "independent", "num_layers": 1, "num_units": 1,
                  "kernels": "rbf", "num_samples": 5,
                  "schedule": (500, 1000, 0)},
    # the SHIPPED DGP-pair schedule default (mo_bo._fresh_batch_state:
    # (100, 0, 0)), measured in round 5: neither it nor indep_dgp's
    # (500, 1000) dominates on the seed-chaotic tiny-n landscape (fast
    # wins 5/9 cells incl. both kursawe jackpots at ~3x less wall), so
    # the cheap default stands
    "indep_dgp_fast": {"type": "independent", "num_layers": 1,
                       "num_units": 1, "kernels": "rbf", "num_samples": 5,
                       "schedule": (100, 0, 0)},
}

PROBLEMS = ["multi_obj_1D_4", "multi_obj_1D_2", "kursawe"]
SEEDS = [0, 1, 2]
INFILLS = 8
DOE = {1: 10, 3: 12, 10: 20, 6: 16}


def run_cell(config_name, problem_name, seed, fast=False):
    from dgp_tpu.bo.mo_bo import MO_BO
    from dgp_tpu.bo.problems import get

    spec = dict(CONFIGS[config_name])
    infills = INFILLS
    run_kw = dict(S=1000, popsize_DE=300, iterations_DE=400, verbose=False)
    if fast:
        infills = 2
        run_kw = dict(S=50, popsize_DE=20, iterations_DE=20, verbose=False)
        if "schedule" in spec:
            spec["schedule"] = tuple(min(s, 30) for s in spec["schedule"])
        if "iterations" in spec:
            spec["iterations"] = 100
        if "type" not in spec:
            spec["restarts"] = 1  # no auto escalation in the smoke run

    problem = get(problem_name)
    bo = MO_BO(problem=problem, DoE_size=DOE.get(problem.dim, 12),
               model_dic=spec, seed=seed)
    t0 = time.perf_counter()
    trace = bo.run(infills, **run_kw)
    wall = time.perf_counter() - t0
    return {
        "config": config_name, "problem": problem_name, "seed": seed,
        "infills": infills, "hv_trace": [float(h) for h in trace],
        "hv_final": float(trace[-1]), "hv_doe": float(trace[0]),
        # NOTE: problem.hv_max is NOT a usable normalizer — the reference
        # copy-pastes 0.47941844 across unrelated problems
        # (problems_MO.py:7,17,28,38,48); compare configs by hv_gain at the
        # same seed (identical DoE -> identical hv_doe)
        "hv_gain": float(trace[-1] - trace[0]),
        "wall_s": round(wall, 2), "fast": bool(fast),
    }


def main():
    fast = "--fast" in sys.argv
    if "--cpu" in sys.argv or (fast and "--tpu" not in sys.argv):
        # sitecustomize pins JAX_PLATFORMS=axon; config.update after import
        # is the documented override (CLAUDE.md)
        import jax

        jax.config.update("jax_platforms", "cpu")

    def _arg(name, default):
        if name in sys.argv:
            return sys.argv[sys.argv.index(name) + 1].split(",")
        return default

    out_path = (_arg("--out", [RESULTS]))[0]
    configs = _arg("--configs", list(CONFIGS))
    problems = _arg("--problems", PROBLEMS)
    seeds = [int(s) for s in _arg("--seeds", SEEDS)]

    results = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f).get("cells", [])
    done = {(r["config"], r["problem"], r["seed"], r["fast"])
            for r in results}

    for cfg in configs:
        for prob in problems:
            for seed in seeds:
                if (cfg, prob, seed, fast) in done:
                    continue
                print(f"== {cfg} / {prob} / seed {seed}", flush=True)
                cell = run_cell(cfg, prob, seed, fast=fast)
                print(f"   HV {cell['hv_doe']:.4f} -> {cell['hv_final']:.4f}"
                      f" (gain {cell['hv_gain']:+.4f}),"
                      f" {cell['wall_s']:.1f}s", flush=True)
                results.append(cell)
                with open(out_path + ".tmp", "w") as f:
                    json.dump({"cells": results}, f, indent=1)
                os.replace(out_path + ".tmp", out_path)

    # summary table: mean final HV + mean HV gain + wall per config
    print("\nconfig              problem            mean_final_hv  "
          "mean_hv_gain  mean_wall_s")
    for cfg in configs:
        for prob in problems:
            cells = [r for r in results
                     if r["config"] == cfg and r["problem"] == prob
                     and r["fast"] == fast]
            if not cells:
                continue
            print(f"{cfg:<19} {prob:<18} "
                  f"{np.mean([c['hv_final'] for c in cells]):>13.4f}  "
                  f"{np.mean([c.get('hv_gain', c['hv_final'] - c['hv_doe']) for c in cells]):>12.4f}  "
                  f"{np.mean([c['wall_s'] for c in cells]):>11.1f}")


if __name__ == "__main__":
    main()
