"""Headline benchmark: ELBO training steps/sec, 2-layer DGP, N=10k, M=128.

Matches the driver metric in BASELINE.json. Runs the jitted Adam ELBO step of
dgp_tpu on the available accelerator (float32 on TPU) and compares against a
**torch-eager float64 CPU stand-in** for the reference stack. This is NOT a
measured GPflow/TF2 number — GPflow is not installed in this image and cannot
be (no package installs), so ``vs_baseline`` means "vs the stand-in", and
README/BASELINE.md use the same wording.

Correction-factor argument (the one place it is recorded): the stand-in is an
op-for-op eager f64 torch translation of the reference ELBO. The reference
would differ by (a) ``tf.function`` graph compilation — published TF2
benchmarks put graph-over-eager at ~2-10x for small-op-dominated models like
this one; (b) TF's threaded CPU ops vs torch's — order 1x; (c) f64 vs f64 —
equal. Granting the most generous 10x graph factor, the measured ~7000x
margin vs the stand-in still leaves >400x vs a hypothetical tuned GPflow-CPU,
comfortably above BASELINE.md's >=50x target — but the honest claim is the
measured one: steps/sec on TPU vs the torch-eager stand-in.

The CPU stand-in is measured once and cached in .bench_baseline.json.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# -- transient-backend retry ---------------------------------------------------
# Round 3's driver bench run was lost to a single transient tunnel failure
# ("Unable to initialize backend 'axon': UNAVAILABLE") with no retry. A failed
# backend init can leave poisoned state cached inside jax's backend registry,
# so the retry re-execs a FRESH process (attempt counter carried in the
# environment) rather than looping in-process. Only transient backend/init
# errors are retried — a numerics failure (non-finite loss, shape error)
# must surface immediately.

_ATTEMPT_ENV = "DGP_BENCH_ATTEMPT"
MAX_ATTEMPTS = int(os.environ.get("DGP_BENCH_MAX_ATTEMPTS", "3"))
BACKOFF_S = float(os.environ.get("DGP_BENCH_BACKOFF_S", "60"))

_TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "Unable to initialize backend",
    "DEADLINE_EXCEEDED",
    "Socket closed",
    "failed to connect",
    "Connection reset",
)


def _is_transient_backend_error(exc: BaseException) -> bool:
    """True only for backend-acquisition/tunnel failures worth a fresh-process
    retry; numerics and programming errors are never retried."""
    if isinstance(exc, (AssertionError, ValueError, TypeError, KeyError)):
        return False
    msg = str(exc)
    return any(marker in msg for marker in _TRANSIENT_MARKERS)


def _run_with_retry(fn, *, attempt_env=_ATTEMPT_ENV, max_attempts=None,
                    backoff_s=None, sleep=time.sleep, execv=os.execv,
                    argv=None):
    """Run ``fn``; on a transient backend error below the attempt budget,
    sleep and re-exec this script in a fresh process. The injected ``sleep``/
    ``execv`` hooks exist for the forced-failure unit test."""
    max_attempts = MAX_ATTEMPTS if max_attempts is None else max_attempts
    backoff_s = BACKOFF_S if backoff_s is None else backoff_s
    attempt = int(os.environ.get(attempt_env, "0"))
    try:
        return fn()
    except Exception as exc:
        if attempt + 1 >= max_attempts or not _is_transient_backend_error(exc):
            raise
        sys.stderr.write(
            f"bench: transient backend failure on attempt "
            f"{attempt + 1}/{max_attempts}, retrying in {backoff_s:.0f}s: "
            f"{exc}\n")
        sleep(backoff_s)
        os.environ[attempt_env] = str(attempt + 1)
        argv = argv if argv is not None else [sys.executable,
                                              os.path.abspath(__file__)]
        execv(argv[0], argv)
        return None  # only reachable with an injected no-op execv (tests)


def _enable_compilation_cache():
    """Persistent XLA compilation cache: first compile over the TPU tunnel
    takes minutes; subsequent bench runs hit the cache."""
    try:
        import jax

        cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


_enable_compilation_cache()

N, M, DIN, HIDDEN, S = 10_000, 128, 8, 8, 10
WARMUP, STEPS = 5, 60
BASELINE_CACHE = os.path.join(os.path.dirname(__file__), ".bench_baseline.json")


def _data():
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, size=(N, DIN))
    Y = np.sin(3 * X[:, :1]) + 0.5 * np.cos(5 * X[:, 1:2]) + 0.05 * rng.normal(size=(N, 1))
    Z = X[rng.choice(N, M, replace=False)].copy()
    return X, Y, Z


def bench_dgp_tpu():
    import jax
    import jax.numpy as jnp
    import optax

    from dgp_tpu.models import training
    from dgp_tpu.models.dgp import DGP, elbo
    from dgp_tpu.ops import kernels as K

    from dgp_tpu.config import precision_scope

    X, Y, Z = _data()
    kernels = [
        K.RBF.create(variance=1.0, lengthscales=[1.0] * DIN),
        K.RBF.create(variance=1.0, lengthscales=[1.0] * HIDDEN),
    ]
    # whitened q(u): the numerically-bounded parametrization (no Kuu^{-1}
    # amplification), required for stable f32 training on TPU
    model = DGP(X, Y, Z, kernels, [HIDDEN], num_samples=S, white=True)
    Xj, Yj = model.data
    mask = training.make_mask(model.params)
    opt = training.masked_adam(mask, lr=0.01)

    # same 1-pass-cotangent scope the DGP trainers run under (DGP._train_scope
    # — quality-verified on this model family at full schedules); read at
    # trace time, so the scope must cover the first call below
    scope = precision_scope(bwd="default")
    scope.__enter__()

    def step(carry, _):
        params, opt_state, key = carry
        key, sub = jax.random.split(key)
        loss, grads = jax.value_and_grad(lambda p: -elbo(p, Xj, Yj, sub, S))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, key), loss

    # the trainers run their steps inside one jitted lax.scan engine
    # (models/training.adam_run), so that is the step measured here
    # (measured equivalent to a python loop of per-step jit calls — async
    # dispatch pipelines — but this matches what training actually runs)
    import functools

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(carry, n):
        carry, losses = jax.lax.scan(step, carry, None, length=n)
        return carry, losses[-1]

    carry = (model.params, opt.init(model.params), jax.random.PRNGKey(0))
    # one engine: scan length is static, so warming at STEPS both compiles
    # the timed program and warms the chip (a separate WARMUP-length call
    # would compile a second program for nothing — ~4 min over the tunnel)
    carry, loss = run(carry, STEPS)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    carry, loss = run(carry, STEPS)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    scope.__exit__(None, None, None)
    assert bool(np.isfinite(float(loss))), "benchmark loss went non-finite"
    return STEPS / dt


def bench_torch_cpu_reference():
    """Eager float64 CPU ELBO step equivalent to the reference's per-iteration
    graph (L Choleskys + 2L triangular solves + reparameterized sampling +
    KL; /root/reference/dgp_dace/models/dgp.py:146-152)."""
    import torch

    torch.set_default_dtype(torch.float64)
    torch.manual_seed(0)
    X_np, Y_np, Z_np = _data()
    X, Y = torch.tensor(X_np), torch.tensor(Y_np)

    dims_in = [DIN, HIDDEN]
    dims_out = [HIDDEN, 1]
    Zs0 = [torch.tensor(Z_np), torch.tensor(Z_np[:, :HIDDEN]).clone()]
    params = []
    layers = []
    for din, dout, Z0 in zip(dims_in, dims_out, Zs0):
        log_ls = torch.zeros(din, requires_grad=True)
        log_var = torch.zeros((), requires_grad=True)
        Zp = Z0.clone().requires_grad_(True)
        q_mu = torch.zeros(M, dout, requires_grad=True)
        q_sqrt = torch.eye(M).repeat(dout, 1, 1).requires_grad_(True)
        layers.append((log_ls, log_var, Zp, q_mu, q_sqrt))
        params += [log_ls, log_var, Zp, q_mu, q_sqrt]
    log_noise = torch.zeros((), requires_grad=True)
    params.append(log_noise)
    opt = torch.optim.Adam(params, lr=0.01)

    def rbf(A, B, log_ls, log_var):
        As, Bs = A / log_ls.exp(), B / log_ls.exp()
        d = (As * As).sum(1)[:, None] + (Bs * Bs).sum(1)[None] - 2 * As @ Bs.T
        return log_var.exp() * torch.exp(-0.5 * d.clamp_min(0))

    def step():
        opt.zero_grad()
        F = X.expand(S, N, DIN)
        kl_total = 0.0
        for (log_ls, log_var, Zp, q_mu, q_sqrt) in layers:
            dout = q_mu.shape[1]
            Kuu = rbf(Zp, Zp, log_ls, log_var) + 1e-6 * torch.eye(M)
            Lu = torch.linalg.cholesky(Kuu)
            Xf = F.reshape(S * N, -1)
            Kuf = rbf(Zp, Xf, log_ls, log_var)
            A = torch.linalg.solve_triangular(Lu, Kuf, upper=False)
            A = torch.linalg.solve_triangular(Lu.T, A, upper=True)
            mean = A.T @ q_mu
            L_q = torch.tril(q_sqrt)
            SK = L_q @ L_q.transpose(-1, -2) - Kuu[None]
            B = SK @ A[None]
            var = (log_var.exp() + (A[None] * B).sum(1)).T
            mean = mean.reshape(S, N, dout)
            var = var.reshape(S, N, dout)
            F = mean + torch.randn_like(mean) * (var + 1e-6).clamp_min(0).sqrt()
            # KL
            diag_q = torch.diagonal(L_q, dim1=-2, dim2=-1)
            kl = -0.5 * dout * M - 0.5 * (diag_q**2).log().sum()
            kl += dout * torch.log(torch.diagonal(Lu)).sum()
            kl += 0.5 * (torch.linalg.solve_triangular(
                Lu[None].expand(dout, M, M), L_q, upper=False) ** 2).sum()
            kl += 0.5 * (q_mu * torch.cholesky_solve(q_mu, Lu)).sum()
            kl_total = kl_total + kl
        noise = log_noise.exp()
        ve = (-0.918938533 - 0.5 * noise.log()
              - 0.5 * ((Y[None] - mean) ** 2 + var) / noise)
        loss = -(ve.mean(0).sum() - kl_total)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        step()
    return n / (time.perf_counter() - t0)


def get_baseline():
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["steps_per_sec"]
    # Median of 3 independent reps: single-rep timings on this shared-CPU
    # box spread ~30% (measured 0.0556-0.0745 steps/s across 5 idle reps);
    # steal-time outliers land on individual reps, not on all three. All
    # three rep values + a timestamp are cached alongside the median so a
    # load-contaminated cache can be audited later (a sustained load burst
    # spanning the whole ~8-minute window biases all reps the same way —
    # tightly clustered LOW reps in the cache are the tell).
    try:
        reps = sorted(bench_torch_cpu_reference() for _ in range(3))
        sps = reps[1]
    except Exception:
        reps, sps = [], None
    if sps is not None:
        with open(BASELINE_CACHE, "w") as f:
            json.dump({
                "steps_per_sec": sps,
                "reps": reps,
                "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
                "config": "2-layer DGP N=10k M=128 S=10, eager f64 torch-cpu",
            }, f)
    return sps


def main():
    value = _run_with_retry(bench_dgp_tpu)
    baseline = get_baseline()
    vs = value / baseline if baseline else None
    print(json.dumps({
        "metric": "ELBO steps/sec (2-layer DGP, N=10k, M=128, S=10)",
        "value": round(value, 3),
        "unit": "steps/sec",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
