"""Measure the mixed-precision knobs (config.quad_precision / bwd_precision)
on the real chip at the bench.py configuration (2-layer DGP, N=10k, M=128,
S=10, whitened f32).

For each (quad, bwd) setting: steps/sec of the jitted Adam ELBO step, the
forward-only ELBO eval rate, and the numeric drift of loss/grads vs the
all-HIGHEST baseline at identical params/key. Prints one JSON line per
variant. Run in background over the TPU tunnel (first compiles are minutes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _enable_cache():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


_enable_cache()

N, M, DIN, HIDDEN, S = 10_000, 128, 8, 8, 10
WARMUP, STEPS = 5, 40


def main():
    import jax
    import optax

    from dgp_tpu import config
    from dgp_tpu.models import training
    from dgp_tpu.models.dgp import DGP, elbo
    from dgp_tpu.ops import kernels as K

    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, size=(N, DIN))
    Y = (np.sin(3 * X[:, :1]) + 0.5 * np.cos(5 * X[:, 1:2])
         + 0.05 * rng.normal(size=(N, 1)))
    Z = X[rng.choice(N, M, replace=False)].copy()

    kernels = [
        K.RBF.create(variance=1.0, lengthscales=[1.0] * DIN),
        K.RBF.create(variance=1.0, lengthscales=[1.0] * HIDDEN),
    ]
    model = DGP(X, Y, Z, kernels, [HIDDEN], num_samples=S, white=True)
    Xj, Yj = model.data
    mask = training.make_mask(model.params)
    opt = training.masked_adam(mask, lr=0.01)
    params0, opt_state0 = model.params, opt.init(model.params)
    key0 = jax.random.PRNGKey(0)

    ref_grads = {}

    def run_variant(quad, bwd):
        config.set_quad_precision(quad)
        config.set_bwd_precision(bwd)

        def loss_fn(p, sub):
            return -elbo(p, Xj, Yj, sub, S)

        @jax.jit
        def step(params, opt_state, key):
            key, sub = jax.random.split(key)
            loss, grads = jax.value_and_grad(loss_fn)(params, sub)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, key, loss

        @jax.jit
        def fwd_only(params, key):
            return loss_fn(params, key)

        @jax.jit
        def val_grad(params, key):
            return jax.value_and_grad(loss_fn)(params, key)

        # numeric drift at fixed params/key
        sub = jax.random.split(key0)[1]
        loss_v, grads_v = val_grad(params0, sub)
        gflat, _ = jax.flatten_util.ravel_pytree(grads_v)
        gflat = np.asarray(gflat, dtype=np.float64)
        if "ref" not in ref_grads:
            ref_grads["ref"] = (float(loss_v), gflat)
        loss_ref, g_ref = ref_grads["ref"]
        gdiff = float(np.linalg.norm(gflat - g_ref)
                      / max(np.linalg.norm(g_ref), 1e-30))

        # timing: training step
        p, o, k = params0, opt_state0, key0
        for _ in range(WARMUP):
            p, o, k, loss = step(p, o, k)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            p, o, k, loss = step(p, o, k)
        jax.block_until_ready(loss)
        sps = STEPS / (time.perf_counter() - t0)

        # timing: forward only (chained via key reuse isn't needed; chain on
        # loss to keep the tunnel pipeline honest)
        lv = fwd_only(params0, sub)
        jax.block_until_ready(lv)
        t0 = time.perf_counter()
        acc = 0.0
        for i in range(STEPS):
            lv = fwd_only(params0, jax.random.fold_in(key0, i))
            acc = acc + lv
        jax.block_until_ready(acc)
        fps = STEPS / (time.perf_counter() - t0)

        print(json.dumps({
            "quad": quad, "bwd": bwd,
            "steps_per_sec": round(sps, 2),
            "fwd_per_sec": round(fps, 2),
            "loss": float(loss_v),
            "loss_vs_ref": float(loss_v) - loss_ref,
            "grad_rel_drift": gdiff,
            "final_train_loss": float(loss),
        }), flush=True)

    import jax.flatten_util  # noqa: F401  (used above)

    for quad, bwd in [("highest", "highest"), ("high", "highest"),
                      ("highest", "high"), ("high", "high")]:
        run_variant(quad, bwd)


if __name__ == "__main__":
    main()
