"""Round-3 step anatomy: where do the remaining ~2.95 ms of the bench step
go now that both conditionals run through the fused stationary kernel?

Every variant runs inside ONE jitted ``lax.scan`` (exactly like bench.py's
engine) so per-call dispatch over the tunnel cancels — a python loop of
jitted micro-programs measured +0.6 ms/step of pure dispatch on the same
ops. Variants:

  full        value_and_grad of the ELBO + Adam update   (the bench step)
  grad_only   value_and_grad of the ELBO (no optimizer update)
  fwd         ELBO forward only
  cond_fwd    the two layer conditionals alone (no sampling/likelihood/KL)
  precompute  Kuu -> Cholesky -> triangular-inverse projections only
  rng         the two [S*N, D] unit-normal draws only

Prints one JSON line per variant; the rung gaps bound what further fusion
can buy.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(steps=200):
    import jax
    import jax.numpy as jnp
    import optax

    from dgp_tpu.config import precision_scope
    from dgp_tpu.models import training
    from dgp_tpu.models.dgp import DGP, elbo
    from dgp_tpu.layers.svgp import stack_projections, conditional_snd
    from dgp_tpu.ops import kernels as K

    N, M, DIN, HIDDEN, S = 10000, 128, 8, 8, 10
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, size=(N, DIN))
    Y = np.sin(3 * X[:, :1]) + 0.05 * rng.normal(size=(N, 1))
    Z = X[rng.choice(N, M, replace=False)].copy()
    kernels = [K.RBF.create(variance=1.0, lengthscales=[1.0] * DIN),
               K.RBF.create(variance=1.0, lengthscales=[1.0] * HIDDEN)]
    model = DGP(X, Y, Z, kernels, [HIDDEN], num_samples=S, white=True)
    Xj, Yj = model.data
    mask = training.make_mask(model.params)
    opt = training.masked_adam(mask, lr=0.01)
    params0, opt_state0 = model.params, opt.init(model.params)
    layers, Zs = params0.layers, [layer.z for layer in params0.layers]

    def scan_engine(body):
        """jit(scan(body)) over a (key, acc) carry; returns steps/ms."""

        @functools.partial(jax.jit, static_argnums=(1,))
        def run(key, n):
            def f(carry, _):
                return body(carry), None

            carry, _ = jax.lax.scan(f, (key, jnp.float32(0.0)), None,
                                    length=n)
            return carry

        return run

    def full_body():
        @functools.partial(jax.jit, static_argnums=(1,))
        def run(key, n):
            def f(carry, _):
                params, opt_state, key, _ = carry
                key, sub = jax.random.split(key)
                loss, grads = jax.value_and_grad(
                    lambda p: -elbo(p, Xj, Yj, sub, S))(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, key, loss), None

            carry, _ = jax.lax.scan(
                f, (params0, opt_state0, key, jnp.float32(0.0)), None,
                length=n)
            return carry[3]

        return run

    def grad_body(carry):
        key, acc = carry
        key, sub = jax.random.split(key)
        loss, grads = jax.value_and_grad(
            lambda p: -elbo(p, Xj, Yj, sub, S))(params0)
        g0 = jnp.ravel(jax.tree_util.tree_leaves(grads)[0])[0]
        return (key, acc + loss + g0)

    def fwd_body(carry):
        key, acc = carry
        key, sub = jax.random.split(key)
        return (key, acc + (-elbo(params0, Xj, Yj, sub, S)))

    def cond_body(carry):
        key, acc = carry
        key, sub = jax.random.split(key)
        projs = stack_projections(layers, Zs)
        # perturb X by a key-dependent epsilon so scan cannot hoist the
        # conditionals out of the loop
        eps = jax.random.uniform(sub, (), dtype=jnp.float32) * 1e-6
        Xs = jnp.tile(Xj[None], (S, 1, 1)) + eps
        m1, v1 = conditional_snd(layers[0], Zs[0], Xs, proj=projs[0])
        m2, v2 = conditional_snd(layers[1], Zs[1], m1, proj=projs[1])
        return (key, acc + jnp.sum(m2) + jnp.sum(v2) + jnp.sum(v1))

    def precompute_body(carry):
        key, acc = carry
        key, sub = jax.random.split(key)
        eps = jax.random.uniform(sub, (), dtype=jnp.float32) * 1e-9
        projs = stack_projections(
            [l.replace(z=z + eps) for l, z in zip(layers, Zs)],
            [z + eps for z in Zs])
        return (key, acc + sum(jnp.sum(p.Pinv) for p in projs))

    def rng_body(carry):
        key, acc = carry
        key, k1, k2 = jax.random.split(key, 3)
        z1 = jax.random.normal(k1, (S, N, HIDDEN), dtype=jnp.float32)
        z2 = jax.random.normal(k2, (S, N, 1), dtype=jnp.float32)
        return (key, acc + jnp.sum(z1) + jnp.sum(z2))

    variants = [
        ("full", full_body()),
        ("grad_only", scan_engine(grad_body)),
        ("fwd", scan_engine(fwd_body)),
        ("cond_fwd", scan_engine(cond_body)),
        ("precompute", scan_engine(precompute_body)),
        ("rng", scan_engine(rng_body)),
    ]
    with precision_scope(bwd="default"):
        for name, run in variants:
            key = jax.random.PRNGKey(0)
            # warm at the SAME static length: scan length is a static arg,
            # a different warm length would put the recompile in the timing
            jax.block_until_ready(run(key, steps))
            t0 = time.perf_counter()
            jax.block_until_ready(run(key, steps))
            dt = (time.perf_counter() - t0) / steps
            print(json.dumps({"variant": name, "ms_per_step":
                              round(dt * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
