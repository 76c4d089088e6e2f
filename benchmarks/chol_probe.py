"""Pallas Cholesky probe (VERDICT r3 item 5).

The step anatomy (step_anatomy_r3.py) puts the batched-Cholesky precompute at
0.229 ms of the 2.554 ms bench step (~9%): chol of the [G=2, 128, 128] Kuu
stack + the triangular solve for Pinv = Lu^{-1}. Round 3 parked a Pallas
blocked Cholesky as "~5% bounded, high VJP risk" without a probe; this is
the probe.

Kernel idea: XLA's TPU Cholesky is a generic blocked algorithm with many
kernel launches and HBM round-trips; at M=128 the whole matrix fits in one
VMEM tile, so a single-kernel right-looking factorization (row-of-U variant:
step j extracts row j, scales by rsqrt(A[j,j]), subtracts the K=1-matmul
outer product from the trailing matrix — all full-[M,M] masked VPU/MXU ops,
no dynamic shapes) removes every launch/HBM boundary. The serial chain is
M=128 tiny steps; the question this probe answers is whether Mosaic's
per-iteration overhead (dynamic row slice, lane extraction, K=1 matmul)
beats XLA's per-block overhead.

fwd-only by design: if adopted, the custom VJP reuses the existing
solve-based Cholesky gradient (jnp triangular solves — no kernel needed),
exactly as VERDICT r3 prescribes.

Usage:
  python benchmarks/chol_probe.py            # TPU timing (chained scan)
  python benchmarks/chol_probe.py --interpret  # CPU correctness only

Timing methodology: independent micro-calls over the axon tunnel sit on a
~1.1 ms dispatch floor (CLAUDE.md), so both implementations are timed as a
chained lax.scan of ITERS dependent factorizations inside one jit.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np

M = 128
G = 2
ITERS = 200

_INTERPRET = False


def _chol_kernel(a_ref, u_ref):
    """Right-looking Cholesky of one [M, M] PD matrix, producing U = L^T.

    Step j: row_j = A[j, :] * rsqrt(A[j, j]) masked to lanes >= j, then
    A -= row_j^T row_j (a K=1 matmul outer product; stale entries below/left
    of the trailing block are never read again, so no extra masking).

    Mosaic-TPU does not lower dynamic_slice on values (only ref indexing),
    so row j is extracted by a sublane-masked reduction instead."""
    m = a_ref.shape[0]
    A0 = a_ref[...]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)

    def body(j, carry):
        A, U = carry
        row = jnp.sum(jnp.where(row_iota == j, A, 0.0),
                      axis=0, keepdims=True)  # [1, m]
        ajj = jnp.sum(jnp.where(lane1 == j, row, 0.0))
        u = jnp.where(lane1 >= j, row * jax.lax.rsqrt(ajj), 0.0)
        outer = jax.lax.dot_general(
            u, u, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [m, m] = u^T u
        A = A - outer
        U = jnp.where(row_iota == j, jnp.broadcast_to(u, (m, m)), U)
        return A, U

    _, U = jax.lax.fori_loop(0, m, body, (A0, jnp.zeros_like(A0)))
    u_ref[...] = U


def chol_pallas(Kstack):
    """Batched lower Cholesky of [G, M, M] via the single-tile kernel."""
    g, m, _ = Kstack.shape
    U = pl.pallas_call(
        _chol_kernel,
        grid=(g,),
        in_specs=[pl.BlockSpec((None, m, m), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((None, m, m), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, m, m), Kstack.dtype),
        interpret=_INTERPRET,
    )(Kstack)
    return jnp.swapaxes(U, -1, -2)  # L = U^T


def _chol_inv_kernel(a_ref, u_ref, w_ref):
    """Fused factorize + invert: U = chol(A)^T and W = L^{-1} in one pass.

    The inverse rides the same forward sweep: with L = U^T, forward
    substitution for L W = I gives row j as
    W[j, :] = (e_j - (U[:j, j])^T W[:j, :]) / U[j, j]; the strict column
    U[:j, j] is extracted by a lane mask + reduce, the matvec is a second
    K=1-class dot per step. This is exactly the chol+trsm precompute pair of
    ops/conditionals.precompute_projections (white path) in one kernel."""
    m = a_ref.shape[0]
    A0 = a_ref[...]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)

    def body(j, carry):
        A, U, W = carry
        row = jnp.sum(jnp.where(row_iota == j, A, 0.0),
                      axis=0, keepdims=True)  # [1, m]
        ajj = jnp.sum(jnp.where(lane1 == j, row, 0.0))
        rinv = jax.lax.rsqrt(ajj)
        u = jnp.where(lane1 >= j, row * rinv, 0.0)
        outer = jax.lax.dot_general(
            u, u, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        A = A - outer
        U = jnp.where(row_iota == j, jnp.broadcast_to(u, (m, m)), U)
        # inverse row: col = U[:j, j] (strictly above the pivot)
        col = jnp.sum(
            jnp.where((lane_iota == j) & (row_iota < j), U, 0.0),
            axis=1, keepdims=True)  # [m, 1]
        s = jax.lax.dot_general(
            col, W, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [1, m]
        e_j = jnp.where(lane1 == j, 1.0, 0.0)
        w = (e_j - s) * rinv
        W = jnp.where(row_iota == j, jnp.broadcast_to(w, (m, m)), W)
        return A, U, W

    zero = jnp.zeros_like(A0)
    _, U, W = jax.lax.fori_loop(0, m, body, (A0, zero, zero))
    u_ref[...] = U
    w_ref[...] = W


def chol_inv_pallas(Kstack):
    """(L, L^{-1}) of a [G, M, M] PD stack in one fused kernel."""
    g, m, _ = Kstack.shape
    U, W = pl.pallas_call(
        _chol_inv_kernel,
        grid=(g,),
        in_specs=[pl.BlockSpec((None, m, m), lambda i: (i, 0, 0))],
        out_specs=[pl.BlockSpec((None, m, m), lambda i: (i, 0, 0)),
                   pl.BlockSpec((None, m, m), lambda i: (i, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((g, m, m), Kstack.dtype),
                   jax.ShapeDtypeStruct((g, m, m), Kstack.dtype)],
        interpret=_INTERPRET,
    )(Kstack)
    return jnp.swapaxes(U, -1, -2), W


def _spd_stack(g=G, m=M, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    B = rng.normal(size=(g, m, m))
    K = B @ np.swapaxes(B, -1, -2) / m + 1.0 * np.eye(m)
    return jnp.asarray(K, dtype=dtype)


def check_correctness(strict=True):
    """On TPU the K=1 outer products go through the MXU's bf16 input
    rounding (interpret mode runs f32), so real-chip error lands ~1e-4
    unless the kernel emulates 3-pass via hi/lo splits (as the production
    kernels do). The probe measures speed first — precision work only pays
    if the kernel wins the race — so strict=False records the error instead
    of asserting."""
    K = _spd_stack()
    L_ref = np.asarray(jnp.linalg.cholesky(K.astype(jnp.float64))
                       if jax.config.jax_enable_x64 else
                       jnp.linalg.cholesky(K))
    L = np.asarray(chol_pallas(K))
    err = np.max(np.abs(L - L_ref)) / np.max(np.abs(L_ref))
    print(f"max rel err vs XLA cholesky: {err:.3e}")
    L2, W = chol_inv_pallas(K)
    err2 = np.max(np.abs(np.asarray(L2) - L_ref)) / np.max(np.abs(L_ref))
    eye_err = np.max(np.abs(np.asarray(W @ L2)
                            - np.eye(K.shape[-1])[None]))
    print(f"fused kernel: chol rel err {err2:.3e}, |W@L - I| {eye_err:.3e}")
    if strict:
        assert err < 5e-6, err
        assert err2 < 5e-6 and eye_err < 1e-4, (err2, eye_err)
    return max(err, err2)


def _chain_time(fn, K, iters=ITERS):
    """Chained dependent factorizations inside one jit: K_{i+1} depends on
    L_i through a tiny PD-preserving perturbation, so nothing pipelines
    away and per-call time = total / iters."""
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)

    @jax.jit
    def run(K0):
        def step(Kc, _):
            L = fn(Kc)
            Kc = K + (1e-7 * L[0, 0, 0]) * eye  # data dependency on L
            return Kc, L[0, 0, 0]
        _, outs = jax.lax.scan(step, K0, None, length=iters)
        return outs[-1]

    out = run(K)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(K)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return dt / iters


def main():
    global _INTERPRET
    if "--interpret" in sys.argv:
        _INTERPRET = True
        jax.config.update("jax_platforms", "cpu")
        check_correctness()
        print("interpret-mode correctness OK")
        return

    dev = jax.devices()[0].platform
    print("platform:", dev)
    err = check_correctness(strict=(dev != "tpu"))

    K = _spd_stack()
    t_xla = _chain_time(jnp.linalg.cholesky, K)
    t_pal = _chain_time(chol_pallas, K)

    # the full precompute pair it would have to beat end-to-end: chol + trsm
    import jax.scipy.linalg as jsl

    def chol_trsm(Kc):
        L = jnp.linalg.cholesky(Kc)
        eye = jnp.broadcast_to(jnp.eye(Kc.shape[-1], dtype=Kc.dtype),
                               Kc.shape)
        return jsl.solve_triangular(L, eye, lower=True)

    t_pair = _chain_time(chol_trsm, K)
    t_fused = _chain_time(lambda Kc: chol_inv_pallas(Kc)[0], K)

    result = {
        "shape": [G, M, M], "iters": ITERS, "platform": dev,
        "max_rel_err": float(err),
        "xla_chol_us": round(t_xla * 1e6, 2),
        "pallas_chol_us": round(t_pal * 1e6, 2),
        "xla_chol_plus_trsm_us": round(t_pair * 1e6, 2),
        "pallas_fused_chol_inv_us": round(t_fused * 1e6, 2),
        "speedup_chol": round(t_xla / t_pal, 3),
        "speedup_pair": round(t_pair / t_fused, 3),
    }
    print(json.dumps(result, indent=1))
    out = os.path.join(os.path.dirname(__file__), "chol_probe.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
