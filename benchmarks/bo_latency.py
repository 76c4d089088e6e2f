"""Per-infill BO latency: compiled-engine caches + shape bucketing.

Runs the constrained GPR(objective)+DGP(constraint) demo problem and times
each infill of `SO_BO.run`. With ``--bucket B`` the surrogate shapes are
padded to multiples of B, so after the first infill (and at bucket-boundary
crossings) every compiled program — training phases, DE, Adam refinement —
is reused from cache and an infill costs only real compute.

Usage:
    python benchmarks/bo_latency.py [--bucket 8] [--infills 6] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    # default: use SO_BO's own default (n_bucket=8); --bucket 0 disables
    ap.add_argument("--bucket", type=int, default=-1)
    ap.add_argument("--infills", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--train-iterations", type=int, default=200)
    ap.add_argument("--popsize", type=int, default=50)
    ap.add_argument("--de-iterations", type=int, default=50)
    ap.add_argument("--cache", action="store_true",
                    help="persist XLA compilations across processes "
                         "(config.enable_compilation_cache). MEASURED "
                         "NEGATIVE on the axon TPU tunnel: a warm-cache "
                         "process's first infill took 173-195 s vs 51-53 s "
                         "cold (3x WORSE — the cache hit/deserialization "
                         "path over the tunnel costs more than the "
                         "recompile), so the flag stays opt-in and is not "
                         "recommended on tunneled backends")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    if args.cache:
        from dgp_tpu.config import enable_compilation_cache

        cache_dir = enable_compilation_cache(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
        print(f"compile cache: {os.path.normpath(cache_dir)}", flush=True)

    import numpy as np

    from dgp_tpu.bo.so_bo import SO_BO

    class Problem:
        dim = 1
        constraint = True

        def fun(self, x):
            return [(x - 0.5) ** 2, np.where(x > 0.25, -1.0, 1.0)]

    gspec = {"num_layers": 0, "kernels": "rbf"}
    dspec = {"num_layers": 1, "num_units": [1], "kernels": "rbf",
             "num_samples": 3}
    kw = {} if args.bucket < 0 else {"n_bucket": args.bucket or None}
    bo = SO_BO(problem=Problem(), DoE_size=5, model_Y_dic=gspec,
               model_C_dic=dspec, seed=0, **kw)

    times = []
    for j in range(args.infills):
        t0 = time.perf_counter()
        bo.run(1, IC="EI", constraint_handling="EV",
               train_iterations=args.train_iterations,
               popsize_DE=args.popsize, iterations_DE=args.de_iterations,
               iterations_adam=args.de_iterations, IC_method="DE+Adam",
               verbose=False)
        times.append(time.perf_counter() - t0)
        print(f"infill {j}: {times[-1]:.2f} s  (Ymin={bo.Ymin[-1]:.5f})",
              flush=True)

    warm = times[1:] or times
    print(f"bucket={bo.n_bucket}  first={times[0]:.2f}s  "
          f"warm median={sorted(warm)[len(warm)//2]:.2f}s  "
          f"platform={jax.devices()[0].platform}")


if __name__ == "__main__":
    main()
