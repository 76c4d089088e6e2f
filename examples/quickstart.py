"""dgp_tpu quickstart: the five reference workflows in one script.

Each section mirrors one of the reference notebooks (Notebooks_dgp/); the
full assertion-bearing versions live in compat/. Runs in a couple of minutes
on CPU: `python examples/quickstart.py` (add DGP_TPU_ON_TPU=1 to use the
attached accelerator).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if not os.environ.get("DGP_TPU_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

import dgp_tpu
from dgp_tpu.bo.doe import lhs
from dgp_tpu.bo.ehvi import EHVI, NDC, Y_ND
from dgp_tpu.ops import kernels as K


def dgp_regression():
    """nb_DGP_regression: 3-layer DGP on the 1-D step function."""
    print("== DGP regression ==")
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, (50, 1))
    Y = (X > 0.5).astype(float) + 0.01 * rng.normal(size=X.shape)
    Z = np.linspace(0, 1, 25)[:, None]
    kernels = [K.RBF.create(lengthscales=[1.0]) for _ in range(3)]
    model = dgp_tpu.DGP(X, Y, Z, kernels, num_units=[1, 1], num_samples=10)
    print(f"initial ELBO: {float(model.ELBO()):.2f}")
    model.optimize_nat_adam(iterations1=200, iterations2=400, lr_adam=0.01,
                            beta_1=0.8, beta_2=0.9, ng_all=False, messages=200)
    mean, var = model.predict(X, num_samples=100)
    print(f"train RMSE: {float(np.sqrt(np.mean((mean - Y) ** 2))):.4f}\n")


def multi_fidelity():
    """nb_mfdgp_improved: MF-DGP on the Park function."""
    print("== Multi-fidelity DGP ==")
    from dgp_tpu.utils.test_functions import calculate_metrics, park_high, park_low

    X = [lhs(4, 30, seed=1), lhs(4, 5, seed=2)]
    Y = [park_low(X[0]), park_high(X[1])]
    model = dgp_tpu.MultiFidelityDeepGP(X, Y, num_samples=5)
    model.optimize_nat_adam(lr_adam=0.005, iterations1=100, iterations2=100,
                            iterations3=200, messages=200)
    x_test = lhs(4, 200, seed=3)
    mean, var = model.predict(x_test)
    print("metrics:", calculate_metrics(park_high(x_test), mean, var), "\n")


def bayesian_optimization():
    """nb_dgp_BO: constrained BO with EI + expected violation."""
    print("== Bayesian optimization ==")

    class Problem:
        constraint = True
        dim = 1

        def fun(self, x):
            return [(x - 0.5) ** 2, np.where(x > 0.25, 1.0, 0.0)]

    spec = {"num_layers": 0, "kernels": "rbf"}
    bo = dgp_tpu.SO_BO(problem=Problem(), DoE_size=6, model_Y_dic=spec,
                       model_C_dic=spec, seed=1)
    bo.run(3, IC="EI", constraint_handling="EV", train_iterations=200,
           popsize_DE=50, iterations_DE=50, IC_method="DE", verbose=False)
    print("Ymin trace:", np.round(np.asarray(bo.Ymin, float), 5),
          "(optimum 0.0625)\n")


def multi_objective():
    """nb_modgp: MO-DGP + EHVI on a bi-objective problem."""
    print("== Multi-objective DGP + EHVI ==")
    from dgp_tpu.bo.problems import multi_obj_1D_4

    problem = multi_obj_1D_4()
    X_ = lhs(1, 10, seed=0)
    F = [np.concatenate([problem.fun(x)[i] for x in X_]).reshape(-1, 1)
         for i in (0, 1)]
    Xn = (X_ - X_.mean(0)) / X_.std(0)
    Yn = [(f - f.mean(0)) / f.std(0) for f in F]
    model = dgp_tpu.MultiObjDeepGP([Xn, Xn.copy()], Yn, loop=2, num_samples=5)
    model.optimize_nat_adam(iterations1=100, iterations2=0, iterations3=0,
                            messages=100)
    nd_desc = NDC(F, -np.ones((10, 1)), obj1_ascending=False)
    ynd = Y_ND(Yn, nd_desc, nadir=(4.0, 4.0), ideal=(-4.0, -4.0))
    vals = EHVI(model, np.array([[0.0], [0.5]]), ynd, corr=False, S=500)
    print("EHVI at [[0], [0.5]]:", np.round(np.asarray(vals).ravel(), 4), "\n")


if __name__ == "__main__":
    dgp_regression()
    multi_fidelity()
    bayesian_optimization()
    multi_objective()
    print("quickstart: all sections completed")
