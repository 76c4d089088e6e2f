"""Production-scale single-chip evidence: N=1M minibatched DGP training
+ batched serving throughput.

The reference is full-batch only (its ``minibatch_size`` is stored but never
consumed, /root/reference/dgp_dace/models/MF_DGP.py:88) and tops out at
N=a-few-hundred notebook problems. This run demonstrates the rebuild's
large-N story on one v5e chip: 1M rows live in HBM (f32), each step gathers
a uniform 10k-row minibatch inside the jitted scan engine, and the data term
rescales by N/B.

Prints JSON lines: training steps/s, ELBO trajectory endpoints, held-out
RMSE/NLL, and batched predict throughput (points/s).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402  (persistent compile cache)
import numpy as np  # noqa: E402

N, NTEST, DIN, HIDDEN, M, S, B = 1_000_000, 10_000, 8, 8, 256, 10, 10_000
STEPS = 2_000


def _data(n, seed):
    rng = np.random.default_rng(seed)
    X = rng.uniform(0, 1, size=(n, DIN)).astype(np.float32)
    f = (np.sin(3 * X[:, :1]) * np.cos(2 * X[:, 1:2])
         + 0.5 * (X[:, 2:3] - 0.5) ** 2 + 0.3 * np.tanh(4 * X[:, 3:4]))
    Y = f + 0.05 * rng.normal(size=(n, 1)).astype(np.float32)
    return X, Y


def main():
    import jax

    from dgp_tpu.models.dgp import DGP
    from dgp_tpu.ops import kernels as K

    print("platform:", jax.devices()[0].platform, flush=True)
    X, Y = _data(N, 0)
    Xt, Yt = _data(NTEST, 1)
    Z = X[np.random.default_rng(2).choice(N, M, replace=False)].copy()
    kernels = [
        K.RBF.create(variance=1.0, lengthscales=[1.0] * DIN),
        K.RBF.create(variance=1.0, lengthscales=[1.0] * HIDDEN),
    ]
    model = DGP(X, Y, Z, kernels, [HIDDEN], num_samples=S, white=True,
                minibatch_size=B)

    from dgp_tpu.models import training
    from dgp_tpu.models.dgp import shrink_inner_q_sqrt

    # one manual warm phase + one timed phase through the same cached engine
    # (optimize_adam shrinks inner q_sqrt per call, so drive adam_run directly)
    model.params = shrink_inner_q_sqrt(model.params)
    mask = training.make_mask(model.params)
    loss_fn, batch = model._loss_spec()
    t0 = time.time()
    model.params, trace = training.adam_run(
        loss_fn, model.params, mask, model._next_key(), steps=100, lr=0.01,
        messages=0, data=batch)
    t_compile = time.time() - t0
    t0 = time.time()
    model.params, trace2 = training.adam_run(
        loss_fn, model.params, mask, model._next_key(), steps=STEPS, lr=0.01,
        messages=0, data=batch)
    dt = time.time() - t0
    print(json.dumps({
        "train_steps_per_sec": round(STEPS / dt, 1),
        "row_samples_per_sec": round(STEPS / dt * B * S, -3),
        "elbo_first": round(-float(np.asarray(trace[0])), 1),
        "elbo_last": round(-float(np.mean(np.asarray(trace2[-50:]))), 1),
        "compile_plus_warm_s": round(t_compile, 1),
        "config": f"N={N} B={B} M={M} S={S} arch=[{DIN},{HIDDEN},1] f32 whitened",
    }), flush=True)

    mean, var = model.predict(Xt, num_samples=100)
    rmse = float(np.sqrt(np.mean((mean - Yt) ** 2)))
    nll = float(np.mean(0.5 * np.log(2 * np.pi * var)
                        + 0.5 * (Yt - mean) ** 2 / var))
    print(json.dumps({"test_rmse": round(rmse, 4), "test_nll": round(nll, 4)}),
          flush=True)

    # serving throughput: repeated batched predict_y over fresh 100k-row
    # batches (chained end-to-end, the only reliable timing over the tunnel)
    import jax.numpy as jnp

    Xbig, _ = _data(200_000, 3)
    Xj = jnp.asarray(Xbig)
    reps, Spred = 10, 25
    mean, var = model.predict(Xj[:100_000], num_samples=Spred)  # compile
    t0 = time.time()
    out = None
    for r in range(reps):
        out = model.predict(Xj[r % 2 * 100_000:][:100_000],
                            num_samples=Spred)
    jax.block_until_ready(out[0] if isinstance(out, tuple) else out)
    dt = time.time() - t0
    print(json.dumps({
        "predict_points_per_sec": round(reps * 100_000 / dt, -3),
        "predict_samples": Spred,
    }), flush=True)


if __name__ == "__main__":
    main()
