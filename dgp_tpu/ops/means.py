"""Mean functions: Zero / Identity / fixed Linear.

Counterparts of the gpflow mean functions wired by
/root/reference/dgp_dace/utils/layer_initializations.py:41-55 (Identity when
dim_in == dim_out, frozen Linear-PCA projection when stepping down, frozen
identity+zero-padding when stepping up, Zero on the final layer).

The Linear weight is a pytree leaf but every training-phase mask in
``models/training.py`` freezes mean-function parameters, matching the
reference's ``set_trainable(mf, False)``.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


class MeanFunction(struct.PyTreeNode):
    def __call__(self, X):
        raise NotImplementedError


class Zero(MeanFunction):
    num_outputs: int = struct.field(pytree_node=False, default=1)

    def __call__(self, X):
        return jnp.zeros((X.shape[0], self.num_outputs), dtype=X.dtype)


class Identity(MeanFunction):
    def __call__(self, X):
        return X


class LinearMean(MeanFunction):
    """f(X) = X @ W  (no bias; reference never uses one)."""

    W: jnp.ndarray  # [D_in, D_out]

    def __call__(self, X):
        return X @ self.W
