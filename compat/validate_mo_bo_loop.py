"""Complete multi-objective BO loop (nb_modgp cells 19-33 workflow).

Iterate: train MO-DGP -> compute the non-dominated front + padded YND ->
maximize EHVI -> evaluate the problem at the new point -> append + renormalize
-> retrain. Asserts the dominated hypervolume (vs the problem's reference
box) is non-decreasing and improves over the run.

NOTE: like the notebook (and the reference's hardcoded ``bounds=(0,1)``,
EHVI.py:210), this mirror searches the unit box in *normalized* input
coordinates, which confines proposals to [mean, mean+std] per dimension.
The ``MO_BO`` driver repairs that (search over the domain box mapped
through the normalization) — see PARITY.md deviation 5.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def main(iterations=3, fast=True):
    from dgp_tpu.bo.doe import lhs
    from dgp_tpu.bo.ehvi import HV_calcul, NDC, Y_ND, optimize_EHVI
    from dgp_tpu.bo.problems import multi_obj_1D_4
    from dgp_tpu.models.mo_dgp import MultiObjDeepGP

    problem = multi_obj_1D_4()
    d = problem.dim
    X_ = lhs(d, 10 * d, seed=0)
    F = [np.concatenate([problem.fun(x)[i] for x in X_]).reshape(-1, 1)
         for i in (0, 1)]
    C_ = -np.ones((len(X_), 1))
    hv_trace = []
    its = (100, 0, 0) if fast else (200, 0, 0)

    for it in range(iterations):
        ND = NDC(F, C_)
        hv = HV_calcul(ND, F, problem.bounds)
        hv_trace.append(hv)
        print(f"iter {it}: n={len(X_)} front={ND} HV={hv:.5f}")

        Xn = (X_ - X_.mean(0)) / X_.std(0)
        Yn = [(f - f.mean(0)) / f.std(0) for f in F]
        model = MultiObjDeepGP([Xn, Xn.copy()], Yn, loop=2, num_samples=5,
                               seed=it)
        # restarts=1: this script mirrors the bare notebook cells; the
        # "auto" escalation default is exercised in tests/test_mo_dgp.py
        model.optimize_nat_adam(iterations1=its[0], iterations2=its[1],
                                iterations3=its[2], messages=0, restarts=1)

        NDT = NDC(F, C_, obj1_ascending=False)
        b = problem.bounds
        nadir = (float((b[2] - F[0].mean()) / F[0].std()),
                 float((b[3] - F[1].mean()) / F[1].std()))
        ideal = (float((b[0] - F[0].mean()) / F[0].std()),
                 float((b[1] - F[1].mean()) / F[1].std()))
        YND = Y_ND(Yn, NDT, nadir=nadir, ideal=ideal)
        x_opt_n = optimize_EHVI(model, YND, method="DE",
                                popsize_DE=60 if fast else 300,
                                iterations_DE=60 if fast else 400,
                                S=200 if fast else 1000,
                                key=jax.random.PRNGKey(100 + it))
        x_new = X_.std(0) * x_opt_n + X_.mean(0)
        x_new = np.clip(x_new, 0.0, 1.0)
        f_new = [np.asarray(v).reshape(()) for v in problem.fun(x_new.reshape(-1))]
        print(f"  new point x={float(x_new[0, 0]):.4f} "
              f"f=({float(f_new[0]):.4f}, {float(f_new[1]):.4f})")
        X_ = np.vstack([X_, x_new])
        F = [np.vstack([F[i], np.reshape(f_new[i], (1, 1))]) for i in (0, 1)]
        C_ = np.vstack([C_, [[-1.0]]])

    ND = NDC(F, C_)
    hv_final = HV_calcul(ND, F, problem.bounds)
    hv_trace.append(hv_final)
    print("HV trace:", np.round(hv_trace, 5))
    assert all(b >= a - 1e-12 for a, b in zip(hv_trace, hv_trace[1:])), \
        "hypervolume must be non-decreasing"
    assert hv_final > hv_trace[0], "EHVI iterations should grow the front"
    print("MO-BO loop validation: OK")


if __name__ == "__main__":
    if not os.environ.get("DGP_TPU_VALIDATE_ON_TPU"):
        jax.config.update("jax_platforms", "cpu")
    main(fast="--full" not in sys.argv)
