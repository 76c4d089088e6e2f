"""Multi-fidelity BO with MF_BO: cheap + expensive sources, one loop.

The reference ships the MF-DGP surrogate (dgp_dace/models/MF_DGP.py) and a
single-fidelity BO loop (dgp_dace/BO/SO_BO.py) but never the driver joining
them; ``MF_BO`` (bo/mf_bo.py) is that loop. Per infill it refits an MF-DGP
on the per-fidelity archives, maximizes EI on the highest-fidelity latent
posterior, and picks the evaluation fidelity by the BOCA cost-aware rule —
query the cheap source while it is still informative at the proposal,
escalate to the expensive one once it is resolved (or already archived
there: deterministic sources are never re-queried at the same point).

The demo pair is the canonical Forrester functions (d=1): the low-fidelity
source is a shifted/scaled distortion whose minimum (x~0.092) is far from
the true one (f(0.757) = -6.0207) — exactly the setting where a fidelity
rule must spend cheap evaluations early and expensive ones late.

Runs in a few minutes on CPU: ``python examples/mf_bo.py``
(add DGP_TPU_ON_TPU=1 to use the attached accelerator).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if not os.environ.get("DGP_TPU_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from dgp_tpu.bo.mf_bo import MF_BO  # noqa: E402
from dgp_tpu.utils.test_functions import (  # noqa: E402
    forrester_high, forrester_low)


def main(infills=6):
    # 8 cheap + 4 expensive DoE points; costs default to (0.1, 1.0).
    # The default surrogate is exact AR(1) co-kriging — picked by the
    # measured bake-off (benchmarks/mf_bo_bakeoff.json: Forrester regret
    # <5e-5 on 3/3 seeds vs the MF-DGP's 1/3). Pass a model_dic without
    # 'type' (e.g. {'num_samples': 5, 'schedule': (200, 200, 400)}) for
    # the reference's MF-DGP surrogate.
    bo = MF_BO(fidelities=[forrester_low, forrester_high],
               DoE_sizes=(8, 4), d=1, seed=0)
    print(f"DoE best (high fidelity): {bo.best_trace[0]:.4f} "
          f"(optimum -6.0207 at x=0.7572)")

    trace = bo.run(infills, popsize_DE=60, iterations_DE=60,
                   num_samples=100, verbose=True)
    print(f"after {infills} infills: best {trace[0]:.4f} -> {trace[-1]:.4f}"
          f" at x={np.round(bo.x_best, 4)}; "
          f"fidelities queried {bo.fidelity_choices}, "
          f"cost spent {bo.cost_spent:.2f} "
          f"(vs {float(infills):.2f} if all were high-fidelity)")

    # checkpoint/resume round-trips archives, traces, fidelity choices,
    # the PRNG stream position and the surrogate spec
    bo.save("/tmp/mf_bo_example.npz")
    bo2 = MF_BO.load("/tmp/mf_bo_example.npz",
                     [forrester_low, forrester_high])
    assert bo2.best_trace == list(trace)
    assert bo2.fidelity_choices == bo.fidelity_choices
    print("save/load round-trip OK")


def constrained_demo(infills=3):
    """Round 5: constrained MF-BO — constraints live in the top-fidelity
    input space, get their own exact-GPR surrogates on the pooled archive,
    and the best trace tracks only FEASIBLE top-fidelity values."""

    def g(x):  # feasible iff x >= 0.55 (keeps the optimum x*=0.757)
        return 0.55 - np.asarray(x)[:, 0]

    bo = MF_BO(fidelities=[forrester_low, forrester_high],
               DoE_sizes=(8, 4), d=1, constraints=[g], seed=0)
    trace = bo.run(infills, constraint_handling="PoF", popsize_DE=40,
                   iterations_DE=40, num_samples=50, verbose=True)
    print(f"constrained best (feasible, high fidelity): {trace[-1]:.4f}")


def variant_dims_demo(infills=2):
    """Round 5: the embedded-mapping ('em') surrogate makes fidelity
    stacks with DIFFERENT input dimensions BO-drivable — here a 2-D cheap
    source under a 4-D expensive one, joined by a coordinate projection."""

    def low2d(x):
        x = np.asarray(x, dtype=float)
        return (np.sin(3.0 * x[:, :1]) + 0.5 * x[:, 1:2]).reshape(-1, 1)

    def high4d(x):
        x = np.asarray(x, dtype=float)
        return (np.sin(3.0 * x[:, :1]) + 0.5 * x[:, 1:2]
                + 0.25 * x[:, 2:3] * x[:, 3:4]).reshape(-1, 1)

    rng = np.random.default_rng(0)
    X = [rng.uniform(0, 1, (10, 2)), rng.uniform(0, 1, (5, 4))]
    bo = MF_BO(fidelities=[low2d, high4d], X=X,
               Y=[low2d(X[0]), high4d(X[1])],
               model_dic={"type": "em", "num_samples": 3,
                          "schedule": (50, 20, 50)},
               projections=[lambda x: np.asarray(x)[:, :2]],
               seed=0, gamma=0.05)
    trace = bo.run(infills, popsize_DE=30, iterations_DE=30, num_samples=20,
                   verbose=True)
    print(f"variant-dims best (4-D high fidelity): {trace[-1]:.4f}")


if __name__ == "__main__":
    main()
    constrained_demo()
    variant_dims_demo()
