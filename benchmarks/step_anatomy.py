"""Probe round-2d: where does the 4.5 ms training step go?

Ablations of the bench.py step (2-layer DGP, N=10k, M=128, S=10, arch
[8,8,1], f32 whitened, quad=HIGH fwd / DEFAULT bwd):

  full          value_and_grad step (the bench number)
  fwd_only      elbo forward only, no grad
  no_t2         variance = Kff - t1 (variational quadform ablated)
  no_t1         variance = Kff + t2 (projection-norm term ablated)
  detach_t2     t2 under stop_gradient (fwd cost kept, bwd ablated)

The t2 quadform materializes B = q_sqrt^T A as [D, M, S*N] (~400 MB at
D=8): if the step is bandwidth-bound on that intermediate rather than
MXU-bound, ablating t2 should save far more than its pass-FLOP share, and a
fused Pallas t2 (never materializing B) is the next lever. One JSON line
per variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402
import numpy as np  # noqa: E402

_MODE = {"value": "full"}


def _patch(mode):
    """Monkey-patch conditional_diag's variance assembly per ablation mode."""
    import jax
    import jax.numpy as jnp

    from dgp_tpu.config import bwd_precision, quad_precision
    from dgp_tpu.ops import conditionals as C
    from dgp_tpu.ops.precision import mm

    orig = C.conditional_diag.__wrapped__ if hasattr(C.conditional_diag, "__wrapped__") else None

    def conditional_diag(kernel, Z, q_mu, q_sqrt, X, *, white, jitter=None,
                         proj=None):
        if proj is None:
            proj = C.precompute_projection(kernel, Z, q_sqrt, white, jitter)
        hi = jax.lax.Precision.HIGHEST
        bwd = bwd_precision()
        Kuf = kernel.K(Z, X)
        A = mm(proj.Pinv, Kuf, hi, bwd)
        mean = jnp.matmul(A.T, q_mu, precision=hi)
        t1 = jnp.sum(A * A, axis=0) if white else jnp.sum(Kuf * A, axis=0)
        Sq = jnp.swapaxes(jnp.tril(q_sqrt), -1, -2)
        if mode == "no_t2":
            t2 = jnp.zeros((q_sqrt.shape[0], X.shape[0]), dtype=A.dtype)
        else:
            B = mm(Sq, A[None], quad_precision(), bwd)
            t2 = jnp.sum(B * B, axis=1)
            if mode == "detach_t2":
                t2 = jax.lax.stop_gradient(t2)
        if mode == "no_t1":
            t1 = jnp.zeros_like(t1)
        Kff = kernel.K_diag(X)
        var = jnp.maximum((Kff[None, :] - t1[None, :] + t2).T, 0.0)
        return mean, var

    C.conditional_diag = conditional_diag
    from dgp_tpu.layers import svgp

    svgp.conditional_diag = conditional_diag
    return orig


def measure_step(tag):
    sps = bench.bench_dgp_tpu()
    print(json.dumps({"variant": tag, "steps_per_sec": round(sps, 2)}),
          flush=True)


def measure_fwd_only():
    import jax

    from dgp_tpu.models.dgp import DGP, elbo
    from dgp_tpu.ops import kernels as K

    X, Y, Z = bench._data()
    kernels = [
        K.RBF.create(variance=1.0, lengthscales=[1.0] * bench.DIN),
        K.RBF.create(variance=1.0, lengthscales=[1.0] * bench.HIDDEN),
    ]
    model = DGP(X, Y, Z, kernels, [bench.HIDDEN], num_samples=bench.S,
                white=True)
    Xj, Yj = model.data

    @jax.jit
    def fwd(params, key):
        key, sub = jax.random.split(key)
        return -elbo(params, Xj, Yj, sub, bench.S), key

    key = jax.random.PRNGKey(0)
    for _ in range(5):
        loss, key = fwd(model.params, key)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(60):
        loss, key = fwd(model.params, key)
    jax.block_until_ready(loss)
    sps = 60 / (time.perf_counter() - t0)
    print(json.dumps({"variant": "fwd_only", "evals_per_sec": round(sps, 2)}),
          flush=True)


def main():
    import jax

    print("platform:", jax.devices()[0].platform, flush=True)
    measure_step("full")
    measure_fwd_only()
    for mode in ("detach_t2", "no_t2", "no_t1"):
        _patch(mode)
        measure_step(mode)


if __name__ == "__main__":
    main()
