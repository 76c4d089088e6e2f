"""Sparse variational GP layers.

TPU-native counterpart of ``Layer``/``SVGP_Layer``
(/root/reference/dgp_dace/utils/layers.py:47-308). A layer is an immutable
pytree; all math lives in pure functions taking explicit inducing inputs Z so
that "augmented" layers — whose effective Z = [Z_left, Z_right(params, key)]
is recomputed inside the loss (/root/reference/dgp_dace/models/MF_DGP.py:204-207)
— fit naturally: the model computes per-layer Z values and passes them in.

Sampling uses explicit ``jax.random`` keys instead of the reference's global
TF RNG (utils/layers.py:113), fixing its reproducibility weakness.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import default_float, default_jitter
from ..ops import kernels as kernels_lib
from ..ops.conditionals import (
    conditional_diag,
    conditional_full,
    precompute_projection,
    precompute_projections,
    reparameterize,
)
from ..ops.means import MeanFunction, Zero
from ..variational.gaussian import gauss_kl


class SVGPLayer(struct.PyTreeNode):
    kernel: kernels_lib.Kernel
    z: Optional[jnp.ndarray]        # [M, Din]; None for augmented layers
    z_left: Optional[jnp.ndarray]   # [M, D_left]; None for plain layers
    q_mu: jnp.ndarray               # [M, D_out]
    q_sqrt: jnp.ndarray             # [D_out, M, M] lower-triangular
    mean_function: MeanFunction
    num_outputs: int = struct.field(pytree_node=False)
    white: bool = struct.field(pytree_node=False, default=False)
    input_prop_dim: Optional[int] = struct.field(pytree_node=False, default=None)
    augmented: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_inducing(self) -> int:
        base = self.z if self.z is not None else self.z_left
        return base.shape[0]


def make_svgp_layer(
    kernel,
    Z,
    num_outputs,
    mean_function=None,
    *,
    white=False,
    input_prop_dim=None,
    augmented=False,
    Z_full_init=None,
    dtype=None,
) -> SVGPLayer:
    """Construct a layer with the reference's initialization
    (utils/layers.py:201-224): q_mu = 0; q_sqrt = I (whitened) or
    chol(Kuu) at the initial inducing inputs (non-whitened, init-to-prior).

    :param Z: inducing inputs [M, Din] (for augmented layers: the trainable
        left block; pass the full initial [M, Din+aug] through ``Z_full_init``
        for the q_sqrt prior init).
    """
    dtype = dtype or default_float()
    Z = jnp.asarray(Z, dtype=dtype)
    M = Z.shape[0]
    mean_function = mean_function if mean_function is not None else Zero(num_outputs)
    q_mu = jnp.zeros((M, num_outputs), dtype=dtype)
    if white:
        q_sqrt = jnp.tile(jnp.eye(M, dtype=dtype)[None], (num_outputs, 1, 1))
    else:
        Z_init = Z if Z_full_init is None else jnp.asarray(Z_full_init, dtype=dtype)
        Ku = kernel.K(Z_init) + default_jitter() * jnp.eye(M, dtype=dtype)
        Lu = jnp.linalg.cholesky(Ku)
        q_sqrt = jnp.tile(Lu[None], (num_outputs, 1, 1))
    return SVGPLayer(
        kernel=kernel,
        z=None if augmented else Z,
        z_left=Z if augmented else None,
        q_mu=q_mu,
        q_sqrt=q_sqrt,
        mean_function=mean_function,
        num_outputs=num_outputs,
        white=white,
        input_prop_dim=input_prop_dim,
        augmented=augmented,
    )


# -- pure layer math ----------------------------------------------------------

def stack_projections(layers, Zs):
    """Projections for a whole layer stack in one batched precompute
    (ops/conditionals.precompute_projections): the per-layer Cholesky/solve
    batch across layers sharing M instead of running sequentially."""
    return precompute_projections([
        (layer.kernel, Z, layer.q_sqrt, layer.white)
        for layer, Z in zip(layers, Zs)
    ])


def conditional_snd(layer: SVGPLayer, Z, X, full_cov=False, proj=None):
    """Multisample conditional over X [S, N, Din]
    (utils/layers.py:63-85): diag path folds S into the point axis for one
    big Kuf matmul; full-cov path vmaps over S with the Kuu work hoisted.

    :return: mean [S, N, D], var [S, N, D] or [S, N, N, D]
    """
    S, N, Din = X.shape
    if proj is None:
        proj = precompute_projection(layer.kernel, Z, layer.q_sqrt, layer.white)
    if full_cov:
        def one(x):
            return conditional_full(
                layer.kernel, Z, layer.q_mu, layer.q_sqrt, x,
                white=layer.white, proj=proj,
            )
        mean, var = jax.vmap(one)(X)
        mean = mean + jax.vmap(layer.mean_function)(X)
        return mean, var
    X_flat = X.reshape(S * N, Din)
    mean, var = conditional_diag(
        layer.kernel, Z, layer.q_mu, layer.q_sqrt, X_flat,
        white=layer.white, proj=proj,
    )
    mean = mean + layer.mean_function(X_flat)
    D = layer.num_outputs
    return mean.reshape(S, N, D), var.reshape(S, N, D)


def sample_from_conditional(layer: SVGPLayer, Z, X, key, full_cov=False,
                            z=None, proj=None):
    """Conditional + reparameterized sample + input propagation
    (utils/layers.py:87-130).

    :param X: [S, N, Din]; :param z: optional fixed unit normals.
    :param proj: optional precomputed SVGPProjection (stack_projections).
    :return: samples [S, N, D_tot], mean [S, N, D_tot], var
    """
    mean, var = conditional_snd(layer, Z, X, full_cov=full_cov, proj=proj)
    if z is None:
        z = jax.random.normal(key, mean.shape, dtype=mean.dtype)
    samples = reparameterize(mean, var, z, full_cov=full_cov)

    if layer.input_prop_dim:
        X_prop = X[:, :, : layer.input_prop_dim]
        samples = jnp.concatenate([X_prop, samples], axis=2)
        mean = jnp.concatenate([X_prop, mean], axis=2)
        if full_cov:
            zeros = jnp.zeros(
                var.shape[:3] + (layer.input_prop_dim,), dtype=var.dtype
            )
            var = jnp.concatenate([zeros, var], axis=3)
        else:
            var = jnp.concatenate([jnp.zeros_like(X_prop), var], axis=2)
    return samples, mean, var


def layer_kl(layer: SVGPLayer, Z):
    """KL[q(u) || p(u)] (utils/layers.py:280-308)."""
    if layer.white:
        return gauss_kl(layer.q_mu, layer.q_sqrt, Lu=None)
    Kuu = layer.kernel.K(Z) + default_jitter() * jnp.eye(Z.shape[0], dtype=Z.dtype)
    Lu = jnp.linalg.cholesky(Kuu)
    return gauss_kl(layer.q_mu, layer.q_sqrt, Lu=Lu)


def mean_propagated_sample(layer: SVGPLayer, Z, points, key, num_samples=50):
    """Mean over ``num_samples`` reparameterized draws of the layer at
    ``points`` [N, Din] — the building block of augmented-inducing-point
    recomputation (/root/reference/dgp_dace/models/MF_DGP.py:33-35).
    """
    tiled = jnp.tile(points[None], (num_samples, 1, 1))
    samples, _, _ = sample_from_conditional(layer, Z, tiled, key)
    return jnp.mean(samples, axis=0)
