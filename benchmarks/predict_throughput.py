"""Serving throughput: batch-inference points/sec on the attached accelerator.

The training side's headline is ELBO steps/sec (bench.py); this measures the
*serving* path — ``predict_y`` on a trained-shape 2-layer DGP (DIN=8,
HIDDEN=8, M=128, f32, whitened), i.e. the same conditional math the Pallas
fused kernels accelerate, without the backward pass.

Methodology matches bench.py: predictions are CHAINED inside one jitted
``lax.scan`` (each call's X carries a zero-valued dependence on the previous
call's mean) so the timing is end-to-end device work, not the ~1.1 ms
tunnel dispatch floor per independent call. Each config runs in a fresh
subprocess (in-process residue degrades later measurements ~25%; see
sweep.py).

Also measures the chunked serving path (parallel.serving.predict_in_chunks)
at N=1M in 125k chunks — the memory-bounded regime where the [S, N, D]
intermediates cannot live on device at once.

The reference has no batch-inference path at all (eager per-call predict,
dgp.py:154-172); these are absolute TPU numbers, not a comparison.

Usage: python benchmarks/predict_throughput.py [--quick]
Writes benchmarks/predict_throughput.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

M, DIN, HIDDEN = 128, 8, 8


def _model(N_train=2_000, S=10):
    from dgp_tpu.models.dgp import DGP
    from dgp_tpu.ops import kernels as K

    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, size=(N_train, DIN))
    Y = np.sin(3 * X[:, :1]) + 0.05 * rng.normal(size=(N_train, 1))
    Z = X[rng.choice(N_train, M, replace=False)].copy()
    kernels = [K.RBF.create(variance=1.0, lengthscales=[1.0] * DIN),
               K.RBF.create(variance=1.0, lengthscales=[1.0] * HIDDEN)]
    return DGP(X, Y, Z, kernels, [HIDDEN], num_samples=S, white=True)


def measure(N_pred, S, calls=30):
    import functools

    import jax
    import jax.numpy as jnp

    from dgp_tpu.models.dgp import predict_y

    model = _model(S=S)
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.uniform(0, 1, size=(N_pred, DIN)), dtype=jnp.float32)

    @functools.partial(jax.jit, static_argnums=(3,))
    def run(params, X0, key, k):
        def body(carry, _):
            Xc, key = carry
            key, sub = jax.random.split(key)
            m, v = predict_y(params, Xc, sub, S)
            # zero-valued chain: serializes the scan without changing X
            Xc = Xc + 0.0 * m[0, :1, :1]
            return (Xc, key), m[0, 0, 0]

        _, out = jax.lax.scan(body, (X0, key), None, length=k)
        return out[-1]

    out = run(model.params, X, jax.random.PRNGKey(0), calls)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(model.params, X, jax.random.PRNGKey(1), calls)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    assert bool(np.isfinite(float(out)))
    return calls * N_pred / dt


def measure_chunked(N_pred=1_000_000, S=10, chunk=125_000, reps=3):
    """Memory-bounded serving: host loop over fixed-shape chunks."""
    import jax
    import jax.numpy as jnp

    from dgp_tpu.models.dgp import predict_y
    from dgp_tpu.parallel.serving import predict_in_chunks

    model = _model(S=S)
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.uniform(0, 1, size=(N_pred, DIN)), dtype=jnp.float32)
    predict = jax.jit(lambda p, Xc, k: predict_y(p, Xc, k, S))

    m, v = predict_in_chunks(predict, model.params, X, jax.random.PRNGKey(0),
                             chunk)  # compile + warm
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for r in range(reps):
        m, v = predict_in_chunks(predict, model.params, X,
                                 jax.random.PRNGKey(r + 1), chunk)
        jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    assert bool(np.all(np.isfinite(np.asarray(m[:, :3, :]))))
    return reps * N_pred / dt


def _enable_cache():
    import jax

    try:
        cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def main(quick=False):
    import subprocess

    configs = ([("scan", 10_000, 10)] if quick else
               [("scan", 10_000, 10), ("scan", 100_000, 10),
                ("scan", 100_000, 1), ("chunked", 1_000_000, 10)])
    results = []
    for mode, N, S in configs:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", mode,
             str(N), str(S)],
            capture_output=True, text=True, check=True,
        )
        pps = float(out.stdout.strip().splitlines()[-1])
        print(f"{mode:>8} N={N:>9,} S={S:>3}: {pps / 1e6:8.2f} M points/sec",
              flush=True)
        results.append({"mode": mode, "N": N, "S": S,
                        "points_per_sec": round(pps, 0)})
    out = {
        "config": f"2-layer DGP predict_y, DIN={DIN}, HIDDEN={HIDDEN}, "
                  f"M={M}, f32 whitened",
        "results": results,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "predict_throughput.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        _enable_cache()
        mode, N, S = sys.argv[i + 1], int(sys.argv[i + 2]), int(sys.argv[i + 3])
        if mode == "chunked":
            print(measure_chunked(N_pred=N, S=S))
        else:
            print(measure(N_pred=N, S=S))
    else:
        main(quick="--quick" in sys.argv)
