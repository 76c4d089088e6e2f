"""Scaling sweep: ELBO training steps/sec across (N, M) on the attached
accelerator (float32, whitened 2-layer DGP, S=10). Writes benchmarks/sweep.json.

Usage: python benchmarks/sweep.py [--quick]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(N, M, DIN=8, HIDDEN=8, S=10, steps=50, warmup=5):
    import jax
    import optax

    from dgp_tpu.config import precision_scope
    from dgp_tpu.models import training
    from dgp_tpu.models.dgp import DGP, elbo
    from dgp_tpu.ops import kernels as K

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

    @jax.jit
    def step(params, opt_state, key):
        key, sub = jax.random.split(key)
        loss, grads = jax.value_and_grad(lambda p: -elbo(p, Xj, Yj, sub, S))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, key, loss

    params, opt_state, key = model.params, opt.init(model.params), jax.random.PRNGKey(0)
    # the DGP trainer's 1-pass-cotangent scope (DGP._train_scope), so the
    # sweep measures the configuration real trainings run at
    with precision_scope(bwd="default"):
        for _ in range(warmup):
            params, opt_state, key, loss = step(params, opt_state, key)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(steps):
            params, opt_state, key, loss = step(params, opt_state, key)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
    assert bool(np.isfinite(float(loss)))
    return steps / dt


def _enable_cache():
    import jax

    try:
        cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def main(quick=False):
    # each config runs in a FRESH subprocess: measuring several configs in
    # one process degrades the later ones ~25% (same-shape 10k/128 measured
    # 224 steps/s run second in-process vs 297 in isolation — accumulated
    # XLA/allocator state; same family of problems as the test-suite
    # compiler-state issue, see tests/conftest.py)
    import subprocess

    configs = ([(1000, 64), (10_000, 128)] if quick else
               [(1000, 64), (10_000, 128), (10_000, 256), (100_000, 128)])
    results = []
    for N, M in configs:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(N),
             str(M)],
            capture_output=True, text=True, check=True,
        )
        sps = float(out.stdout.strip().splitlines()[-1])
        print(f"N={N:>7} M={M:>4}: {sps:8.2f} steps/sec "
              f"({sps * N * 10 / 1e6:9.1f} M point-samples/sec)", flush=True)
        results.append({"N": N, "M": M, "steps_per_sec": round(sps, 3),
                        "point_samples_per_sec": round(sps * N * 10, 0)})
    out = {
        "config": "2-layer DGP, DIN=8, HIDDEN=8, S=10, f32 whitened, Adam ELBO step",
        "results": results,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        _enable_cache()
        print(measure(int(sys.argv[i + 1]), int(sys.argv[i + 2])))
    else:
        main(quick="--quick" in sys.argv)
