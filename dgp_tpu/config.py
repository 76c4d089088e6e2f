"""Global numeric configuration for dgp_tpu.

The reference library (dgp-toolbox) runs everything in float64 through
``gpflow.default_float()`` (e.g. /root/reference/dgp_dace/models/MF_DGP.py:29).
On TPU, float64 is software-emulated and slow, so dgp_tpu makes the working
precision a first-class switch:

* ``default_float()`` — dtype used for all parameters/constants. Defaults to
  float64 *iff* JAX x64 mode is enabled (the CPU-parity configuration used by
  the test-suite), otherwise float32 (the fast TPU configuration).
* ``default_jitter()`` — diagonal jitter added before every Cholesky,
  precision-aware (1e-6 in f64 like gpflow's default, 1e-4 in f32 where a
  smaller jitter would vanish below the unit roundoff of typical kernels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_STATE = {
    "float": None,       # None => infer from x64 mode
    "jitter": None,      # None => infer from default_float
    "quad_precision": "auto",  # forward precision of the t2 quadform matmul
    "bwd_precision": "auto",   # cotangent precision of the hot matmuls
    "use_pallas": "auto",      # fused quadform kernel (ops/quadform_pallas.py)
}


import contextlib


@contextlib.contextmanager
def precision_scope(quad=None, bwd=None):
    """Temporarily pin the MXU precision knobs (trace-time settings; the
    training-engine caches key on them, models/training._precision_signature).

    Used by the DGP trainer (and bench.py) to opt into 1-pass cotangents —
    quality-verified there at full published schedules — while the global
    default stays 3-pass, and by the MO-DGP trainer to pin 3-pass
    defensively (its recurrent landscape collapses under 1-pass: v5e train
    r2 0.985 -> -0.05; MF-DGP also degrades, rmse 0.505 -> 0.878)."""
    old_q, old_b = _STATE["quad_precision"], _STATE["bwd_precision"]
    if quad is not None:
        _STATE["quad_precision"] = quad
    if bwd is not None:
        _STATE["bwd_precision"] = bwd
    try:
        yield
    finally:
        _STATE["quad_precision"], _STATE["bwd_precision"] = old_q, old_b


def set_use_pallas(value) -> None:
    """True | False | "auto" — use the fused Pallas variational-quadform
    kernel where applicable. "auto" = on TPU backends only (the kernel's
    shape gates additionally require f32 and MXU-worthy sizes)."""
    _STATE["use_pallas"] = value


def use_pallas() -> bool:
    v = _STATE["use_pallas"]
    if v == "auto":
        import jax as _jax

        return _jax.default_backend() == "tpu"
    return bool(v)


def set_pallas_max_m(value: int) -> None:
    """Largest inducing-point count M the Pallas kernels dispatch at
    (default 128). Round 2 measured the kernels 0.5-0.8x XLA at M=256
    (compute-bound: the bwd tile-recompute trade stops paying) and the
    fused kernel additionally hit a Mosaic verification bug there; the bug
    is gone on jax 0.9.0 (round-3 retest), so this knob exists to re-measure
    and to let large-M deployments flip the gate if their ratio differs."""
    _STATE["pallas_max_m"] = int(value)


def pallas_max_m() -> int:
    return _STATE.get("pallas_max_m", 128)


def set_default_float(dtype) -> None:
    """Set the working dtype. Enables JAX x64 mode when float64 is requested."""
    dtype = jnp.dtype(dtype)
    if dtype == jnp.dtype("float64"):
        jax.config.update("jax_enable_x64", True)
    _STATE["float"] = dtype


def default_float():
    if _STATE["float"] is not None:
        return _STATE["float"]
    return jnp.dtype("float64") if jax.config.jax_enable_x64 else jnp.dtype("float32")


def set_default_jitter(value: float) -> None:
    _STATE["jitter"] = float(value)


def default_jitter() -> float:
    if _STATE["jitter"] is not None:
        return _STATE["jitter"]
    return 1e-6 if default_float() == jnp.dtype("float64") else 1e-4


def set_quad_precision(value) -> None:
    """"highest" | "high" | "auto" — forward MXU precision of the
    (cancellation-free) variational quadform matmul in the conditional."""
    _STATE["quad_precision"] = value


def set_bwd_precision(value) -> None:
    """"highest" | "high" | "auto" — MXU precision of the backward cotangent
    matmuls of the conditional's two dominant contractions."""
    _STATE["bwd_precision"] = value


def _resolve_auto_precision(value, f32_value):
    from .ops.precision import resolve_precision

    if value == "auto":
        # f64 (CPU parity mode) computes natively and the flags are moot; on
        # f32 accelerators each knob defaults to the cheapest pass count that
        # is accurate where it applies (see ops/precision.py).
        value = ("highest" if default_float() == jnp.dtype("float64")
                 else f32_value)
    return resolve_precision(value)


def quad_precision():
    # 3-pass: the quadform forward enters the posterior variance users see.
    # (1-pass measures speed-neutral once the cotangents are 1-pass: the
    # quadform fwd shares its pass count with the A-projection it consumes.)
    return _resolve_auto_precision(_STATE["quad_precision"], "high")


def bwd_precision():
    # 3-pass by default: 1-pass cotangents (gradient drift ~1e-5 relative,
    # +14% end-to-end) retrain plain DGP to published quality but measurably
    # degrade the stiff staged trainings (v5e, full schedules: MF-DGP rmse
    # 0.505 -> 0.878, MO-DGP train r2 0.985 -> -0.05). The DGP trainer and
    # bench.py opt in via precision_scope(bwd="default") — the fast path
    # lives where it is quality-verified, the safe default everywhere else.
    return _resolve_auto_precision(_STATE["bwd_precision"], "high")


def enable_compilation_cache(cache_dir: str | None = None,
                             min_compile_secs: float = 2.0) -> str:
    """Persist XLA compilations to disk so repeat processes can reuse them.
    Opt-in: measured on the axon TPU *tunnel* the cache-hit path is ~3x
    SLOWER than recompiling (BO first infill 173-195 s warm-cache vs
    51-53 s cold — benchmarks/bo_latency.py --cache), so only enable it on
    backends where retrieval is cheap (local CPU/TPU runtimes). Safe to
    call repeatedly; returns the directory used. Default location:
    ``~/.cache/dgp_tpu_xla``."""
    import os

    if cache_dir is None:
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                                 "dgp_tpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return cache_dir


# NOTE (round 2, superseded in round 3): a first fused-RBF-conditional Pallas
# kernel was built, measured on v5e, and deleted — forward-only it tied XLA
# and its VJP re-evaluated the reference forward (103.5 vs 181.3 steps/s).
# The lesson (the win is in the *backward*: recompute tiles in VMEM instead
# of streaming [M,S*N] residuals through HBM) became round 2's
# ops/quadform_pallas.py + ops/conditional_fused.py (294-305 steps/s) and
# round 3's ops/conditional_fused_rbf.py, which builds the stationary Kuf
# tiles in VMEM with a hand-written chain to the scaled inputs
# (338.5 steps/s). Pass-count control (the precision knobs above) and
# batched Cholesky/solves remain the other two TPU levers.
