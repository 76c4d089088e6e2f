"""Probe round-2b: rbg PRNG + 1-pass (DEFAULT) precision variants.

Measures bench.py's training step under:
  v0  current defaults (threefry, quad/bwd=HIGH on f32)
  v1  rbg PRNG (hardware RNG instead of threefry arithmetic)
  v2  v1 + quad_precision=DEFAULT (1-pass bf16 quadform forward)
  v3  v2 + bwd_precision=DEFAULT (1-pass cotangents)

and reports the relative gradient drift of v2/v3 numerics vs the all-HIGHEST
f32 step on one fixed batch (drift of v0/v1 numerics was measured in round 2:
3.6e-7). Run on the TPU; one JSON line per variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402  (enables the persistent compile cache)


def measure(tag, *, rbg=False, quad=None, bwd=None):
    import jax

    from dgp_tpu import config

    jax.config.update("jax_default_prng_impl", "rbg" if rbg else "threefry2x32")
    config.set_quad_precision(quad or "auto")
    config.set_bwd_precision(bwd or "auto")
    sps = bench.bench_dgp_tpu()
    print(json.dumps({"variant": tag, "steps_per_sec": round(sps, 2)}),
          flush=True)
    return sps


def grad_drift(quad, bwd):
    """Relative L2 gradient drift of (quad, bwd) vs all-HIGHEST on one batch."""
    import jax
    import numpy as np

    from dgp_tpu import config
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
    key = jax.random.PRNGKey(7)

    def grads_at(q, b):
        config.set_quad_precision(q)
        config.set_bwd_precision(b)
        g = jax.jit(jax.grad(
            lambda p: -elbo(p, Xj, Yj, key, bench.S)))(model.params)
        return jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, g))

    ref = grads_at("highest", "highest")
    got = grads_at(quad, bwd)
    config.set_quad_precision("auto")
    config.set_bwd_precision("auto")
    num = sum(float(np.sum((a - b) ** 2)) for a, b in zip(ref, got))
    den = sum(float(np.sum(a ** 2)) for a in ref)
    return (num / den) ** 0.5


def main():
    import jax

    print("platform:", jax.devices()[0].platform, flush=True)
    t0 = time.time()
    measure("v0_current")
    measure("v1_rbg", rbg=True)
    measure("v2_rbg_quad1pass", rbg=True, quad="default")
    measure("v3_rbg_all1pass", rbg=True, quad="default", bwd="default")
    jax.config.update("jax_default_prng_impl", "threefry2x32")
    for q, b in (("default", "high"), ("default", "default")):
        d = grad_drift(q, b)
        print(json.dumps({"drift_vs_highest": {"quad": q, "bwd": b,
                                               "rel_l2": f"{d:.2e}"}}),
              flush=True)
    print(f"total {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
