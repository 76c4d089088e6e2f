"""Multi-objective BO with MO_BO: the nb_modgp workflow as three lines.

The reference runs this loop as loose notebook cells
(/root/reference/Notebooks_dgp/nb_modgp.ipynb cells 19-33); ``MO_BO`` is the
driver class (bo/mo_bo.py). The default surrogate is a pair of independent
per-objective exact GPRs — picked by the round-4 bake-off
(benchmarks/mo_bo_bakeoff.json: >= the published-schedule coupled MO-DGP's
final hypervolume in 8/9 cells at ~18x less wall time). Pass a model_dic
without 'type' to get the notebook's coupled MO-DGP surrogate instead.

Runs in under a minute on CPU: ``python examples/mo_bo.py``
(add DGP_TPU_ON_TPU=1 to use the attached accelerator).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if not os.environ.get("DGP_TPU_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from dgp_tpu.bo.mo_bo import MO_BO  # noqa: E402
from dgp_tpu.bo.problems import get  # noqa: E402


def main(infills=4):
    problem = get("multi_obj_1D_4")  # bi-objective, d=1, HV box in .bounds

    # default surrogate (independent GPR pair) — no model_dic needed
    bo = MO_BO(problem=problem, DoE_size=10, seed=0)
    print(f"DoE hypervolume: {bo.hv_trace[0]:.4f}")

    trace = bo.run(infills, S=200, popsize_DE=60, iterations_DE=60)
    print(f"after {infills} EHVI infills: HV {trace[0]:.4f} -> "
          f"{trace[-1]:.4f}")

    X_nd, F_nd = bo.pareto()
    print(f"non-dominated set: {len(X_nd)} points")
    for x, f in zip(X_nd, F_nd):
        print(f"  x={np.round(x, 4)}  f=({f[0]:+.4f}, {f[1]:+.4f})")

    # checkpoint/resume round-trips the data archive, HV trace, PRNG stream
    # position and the surrogate spec
    bo.save("/tmp/mo_bo_example.npz")
    bo2 = MO_BO.load("/tmp/mo_bo_example.npz", problem)
    assert bo2.hv_trace == list(trace) and bo2.model_dic == bo.model_dic
    print("save/load round-trip OK")

    # the notebook's coupled MO-DGP surrogate is one model_dic away
    coupled = MO_BO(problem=problem, DoE_size=10, seed=0,
                    model_dic={"loop": 2, "num_samples": 5,
                               "schedule": (100, 0, 0)})
    coupled.run(1, S=100, popsize_DE=30, iterations_DE=30)
    print(f"coupled MO-DGP surrogate, 1 infill: HV "
          f"{coupled.hv_trace[0]:.4f} -> {coupled.hv_trace[-1]:.4f}")


if __name__ == "__main__":
    main()
