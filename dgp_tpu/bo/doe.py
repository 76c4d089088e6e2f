"""Design of experiments: Latin hypercube sampling.

Own implementation replacing the reference's dependency on a pyDOE fork with a
nonstandard ``seed=`` kwarg (/root/reference/dgp_dace/BO/SO_BO.py:47-54).
"""

from __future__ import annotations

import numpy as np


def lhs(dim: int, n: int, seed=None) -> np.ndarray:
    """Latin hypercube in [0, 1]^dim: one point per stratum per dimension."""
    rng = np.random.default_rng(seed)
    out = np.empty((n, dim))
    for j in range(dim):
        perm = rng.permutation(n)
        out[:, j] = (perm + rng.uniform(size=n)) / n
    return out


def doe(problem, doe_size: int, seed=None):
    """Sample a problem over an LHS design (SO_BO.py:47-54).

    :return: (X, Y, C) for constrained problems, else (X, Y).
    """
    X = lhs(problem.dim, doe_size, seed=seed)
    if getattr(problem, "constraint", False):
        Y, C = problem.fun(X)
        return X, Y, C
    Y = problem.fun(X)[0]
    return X, Y
