"""Second-stage step-cost breakdown on the real chip (after the
quad/bwd=HIGH win of precision_probe.py): where do the remaining ~50% of the
step go? Ablations + chained micro-kernels, all at quad=bwd=HIGH.

Variants: full step (reference point), step with fixed unit normals (no RNG),
step without KL, rbg-PRNG step; micro: per-layer Cholesky+solve chain,
threefry vs rbg normal draws.
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


def _timeit(fn, *args):
    import jax

    out = None
    for _ in range(WARMUP):
        out = fn(*args, out)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args, out)
    jax.block_until_ready(out)
    return STEPS / (time.perf_counter() - t0)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from dgp_tpu import config
    from dgp_tpu.layers.svgp import layer_kl
    from dgp_tpu.models import training
    from dgp_tpu.models.dgp import DGP, elbo, propagate
    from dgp_tpu.ops import kernels as K

    config.set_quad_precision("high")
    config.set_bwd_precision("high")

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
    params0, opt0 = model.params, opt.init(model.params)

    def step_factory(loss_fn):
        @jax.jit
        def step(params, opt_state, key, _prev):
            key, sub = jax.random.split(key)
            loss, grads = jax.value_and_grad(loss_fn)(params, sub)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, key, loss

        state = {"p": params0, "o": opt0, "k": jax.random.PRNGKey(0)}

        def run(_=None, prev=None):
            state["p"], state["o"], state["k"], loss = step(
                state["p"], state["o"], state["k"], prev)
            return loss

        return run

    results = {}

    # 1. full step (matches probe1 both=high)
    results["step_full"] = _timeit(step_factory(
        lambda p, k: -elbo(p, Xj, Yj, k, S)))

    # 2. no-RNG step: fixed unit normals, propagate(zs=...)
    zs_fixed = [
        jnp.asarray(rng.standard_normal((S, N, HIDDEN)), jnp.float32),
        jnp.asarray(rng.standard_normal((S, N, 1)), jnp.float32),
    ]

    def elbo_fixed_z(p, k):
        _, Fm, Fv = propagate(p, Xj, k, S, zs=zs_fixed)
        ve = p.likelihood.variational_expectations(Fm[-1], Fv[-1], Yj)
        kl = sum(layer_kl(l, l.z) for l in p.layers)
        return -(jnp.sum(jnp.mean(ve, axis=0)) - kl)

    results["step_fixed_normals"] = _timeit(step_factory(elbo_fixed_z))

    # 3. no-KL step
    def elbo_no_kl(p, k):
        _, Fm, Fv = propagate(p, Xj, k, S)
        ve = p.likelihood.variational_expectations(Fm[-1], Fv[-1], Yj)
        return -jnp.sum(jnp.mean(ve, axis=0))

    results["step_no_kl"] = _timeit(step_factory(elbo_no_kl))

    # 4. rbg PRNG step
    kr = jax.random.key(0, impl="rbg")

    @jax.jit
    def step_rbg(params, opt_state, key, _prev):
        key, sub = jax.random.split(key)
        loss, grads = jax.value_and_grad(
            lambda p, k: -elbo(p, Xj, Yj, k, S))(params, sub)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, key, loss

    st = {"p": params0, "o": opt0, "k": kr}

    def run_rbg(prev=None):
        st["p"], st["o"], st["k"], loss = step_rbg(st["p"], st["o"], st["k"], prev)
        return loss

    results["step_rbg"] = _timeit(run_rbg)

    # (a 5th variant measured the since-deleted pallas forward kernel:
    #  103.51 steps/s vs 181.28 for the XLA path — recorded 2026-08-16)

    # micro: 2x (cholesky(M) + triangular solve for Pinv) chained
    Kuu0 = np.asarray(model.params.layers[0].kernel.K(
        jnp.asarray(Z, jnp.float32))) + 1e-4 * np.eye(M)
    Kj = jnp.asarray(Kuu0, jnp.float32)

    @jax.jit
    def chol_pair(Kin):
        out = Kin
        for _ in range(2):
            L = jnp.linalg.cholesky(out)
            Pinv = jax.scipy.linalg.solve_triangular(
                L, jnp.eye(M, dtype=out.dtype), lower=True)
            out = out + 1e-6 * (Pinv[0, 0] * jnp.eye(M, dtype=out.dtype))
        return out

    def run_chol(prev=None):
        return chol_pair(Kj if prev is None else prev)

    results["micro_2x_chol_solve"] = _timeit(run_chol)

    # micro: per-step normal draws (threefry vs rbg)
    def draws(key):
        k1, k2, k3 = jax.random.split(key, 3)
        a = jax.random.normal(k1, (S, N, HIDDEN), jnp.float32)
        b = jax.random.normal(k2, (S, N, 1), jnp.float32)
        return k3, jnp.sum(a) + jnp.sum(b)

    draws_j = jax.jit(draws)
    for name, k0 in (("micro_normals_threefry", jax.random.PRNGKey(0)),
                     ("micro_normals_rbg", jax.random.key(0, impl="rbg"))):
        st2 = {"k": k0}

        def run_draw(prev=None):
            st2["k"], s = draws_j(st2["k"])
            return s

        results[name] = _timeit(run_draw)

    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
