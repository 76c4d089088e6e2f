"""Scripted nb_dgp_BO validation (constrained BO with GP/DGP surrogates).

Problem (cell 5): min (x-0.5)^2  s.t. step(x-0.25) <= 0; optimum f = 0.0625
at x = 0.25. Published: Ymin 0.17355 -> 0.06256 after 13 infills with a
2-layer-DGP constraint model (cells 62/65); 0.06888 with a GP constraint
(cell 69). The DoE is unreplayable, so the assertion is: starting from a
fresh LHS DoE of 5, 13 infills reach Ymin <= 0.07.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from dgp_tpu.bo.so_bo import SO_BO  # noqa: E402


class ConstrainedProblem:
    constraint = True
    dim = 1

    def fun(self, x):
        return [(x - 0.5) ** 2, np.where(x > 0.25, 1.0, 0.0)]


def main(fast=False, dgp_constraint=False):
    spec_gp = {"num_layers": 0, "kernels": "rbf"}
    spec_dgp = {"num_layers": 2, "num_units": 1, "kernels": "rbf",
                "num_samples": 10}
    bo = SO_BO(
        problem=ConstrainedProblem(), DoE_size=5, model_Y_dic=spec_gp,
        model_C_dic=spec_dgp if dgp_constraint else spec_gp, seed=7,
    )
    print("initial Ymin:", bo.Ymin[-1])
    # the DGP constraint needs substantially more training per refit to learn
    # the step discontinuity (measured: 0.207 -> 0.138 over 8 infills at 1500
    # iterations; the published 0.0626 used 13 infills at 4000)
    iters = (8 if dgp_constraint else 5) if fast else 13
    bo.run(iters, from_scratch=3, IC="EI", constraint_handling="EV",
           train_iterations=(1500 if dgp_constraint else 400) if fast else 4000,
           popsize_DE=120 if fast else 300, popstd_DE=3.0,
           iterations_DE=120 if fast else 400, IC_method="DE+Adam",
           iterations_adam=200 if fast else 1000, verbose=True)
    print("Ymin trace:", np.round(np.asarray(bo.Ymin, dtype=float), 5))
    target = (0.15 if dgp_constraint else 0.12) if fast else 0.07
    assert bo.Ymin[-1] <= target, bo.Ymin
    assert bo.Ymin[-1] >= 0.0625 - 1e-9  # optimum is a hard floor
    print("nb_dgp_BO validation: OK (published 0.06256 / 0.06888)")


if __name__ == "__main__":
    import os

    if not os.environ.get("DGP_TPU_VALIDATE_ON_TPU"):
        jax.config.update("jax_platforms", "cpu")
    main(fast="--fast" in sys.argv, dgp_constraint="--dgp" in sys.argv)
