"""Scripted nb_modgp validation (MO-DGP + EHVI on multi_obj_1D_4).

The notebook's DoE comes from an unreplayable pyDOE fork, so the assertions
are structural/distributional: the Pareto utilities produce a valid
ascending front and positive hypervolume; MO-DGP trains (phase 1, as the
notebook: iterations 200/0/0); exact EHVI at the notebook's candidate points
is finite and nonnegative; optimize_EHVI returns an in-box point.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def main(fast=False):
    from dgp_tpu.bo.doe import lhs
    from dgp_tpu.bo.ehvi import EHVI, HV_calcul, NDC, Y_ND, optimize_EHVI
    from dgp_tpu.bo.problems import multi_obj_1D_4
    from dgp_tpu.models.mo_dgp import MultiObjDeepGP

    problem = multi_obj_1D_4()
    d = problem.dim
    n = 10 * d
    X_ = lhs(d, n, seed=0)
    Y0_ = np.zeros((n, 1))
    Y1_ = np.zeros((n, 1))
    C_ = -np.ones((n, 1))
    for i in range(n):
        f = problem.fun(X_[i])
        Y0_[i], Y1_[i] = f[0], f[1]

    X = (X_ - X_.mean(0)) / X_.std(0)
    Y0 = (Y0_ - Y0_.mean(0)) / Y0_.std(0)
    Y1 = (Y1_ - Y1_.mean(0)) / Y1_.std(0)

    ND = NDC([Y0_, Y1_], C_)
    NDT = NDC([Y0_, Y1_], C_, obj1_ascending=False)
    print("front (ascending):", ND)
    assert ND == NDT[::-1] and len(ND) >= 2
    assert all(Y0_[ND[i]] <= Y0_[ND[i + 1]] for i in range(len(ND) - 1))
    hv = HV_calcul(ND, [Y0_, Y1_], problem.bounds)
    print("hypervolume:", hv, "(published 39.29677 on its own DoE)")
    assert hv > 0

    model = MultiObjDeepGP([X, X.copy()], [Y0, Y1], loop=2, num_samples=10)
    if fast:
        schedule = dict(iterations1=200, iterations2=0, iterations3=0)
    else:
        schedule = dict(iterations1=200, iterations2=300, iterations3=800)
    # restarts=1: this script pins the bare published trajectory (the
    # measured r2 oracles below are for the single run); the default
    # restarts="auto" escalation is validated separately in
    # tests/test_mo_dgp.py and benchmarks/mo_seeds.py
    losses = np.asarray(model.optimize_nat_adam(
        lr_adam=0.01, lr_gamma=0.01, messages=100, restarts=1, **schedule,
    ))
    print(f"ELBO: {-losses[0]:.4g} -> {-np.mean(losses[-20:]):.4g} "
          "(published init -1.744e8 on its own DoE)")
    assert np.all(np.isfinite(losses))
    # single-MC-sample losses are noisy; compare window means
    assert np.mean(losses[-20:]) < np.mean(losses[:20])

    if not fast:
        # quantitative fit oracle: per-objective moment-matched training fit
        # after the full 3-phase schedule (measured r2 0.90 / 0.61 at this
        # deterministic seed; thresholds leave slack for RNG-order changes)
        from dgp_tpu.models.dgp import moment_matched

        for obj, Yt, r2_min in ((0, Y0, 0.7), (1, Y1, 0.4)):
            Fm, Fv = model.predict_f(X, S=200, objective=obj)
            m, _ = moment_matched(Fm, Fv)
            m = np.asarray(m)
            r2 = 1 - np.sum((m - Yt) ** 2) / np.sum((Yt - Yt.mean()) ** 2)
            print(f"objective {obj} train r2: {r2:.4f} (oracle > {r2_min})")
            assert r2 > r2_min

    bounds = problem.bounds
    nadir = (float((bounds[2] - Y0_.mean()) / Y0_.std()),
             float((bounds[3] - Y1_.mean()) / Y1_.std()))
    ideal = (float((bounds[0] - Y0_.mean()) / Y0_.std()),
             float((bounds[1] - Y1_.mean()) / Y1_.std()))
    YND = Y_ND([Y0, Y1], NDT, nadir=nadir, ideal=ideal)
    Xcand = np.array([[0.0], [0.5]])
    vals = np.asarray(EHVI(model, Xcand, YND, corr=False,
                           approximation="None", S=10000 if not fast else 500))
    print("EHVI at [[0],[0.5]]:", vals.ravel(),
          "(published [2.5798, 2.8441] on its own DoE/model)")
    assert np.all(np.isfinite(vals)) and np.all(vals >= 0)

    x_opt = optimize_EHVI(model, YND, method="Adam",
                          iterations_adam=200 if fast else 1000,
                          S=200 if fast else 1000)
    print("x_opt:", x_opt)
    assert 0.0 <= float(x_opt[0, 0]) <= 1.0
    print("nb_modgp validation: OK")


if __name__ == "__main__":
    import os

    if not os.environ.get("DGP_TPU_VALIDATE_ON_TPU"):
        jax.config.update("jax_platforms", "cpu")
    main(fast="--fast" in sys.argv)
