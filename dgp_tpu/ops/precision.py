"""Mixed-precision matmul control for the SVGP hot path.

On TPU the MXU is a bf16 systolic array; a float32 matmul is emulated by
bit-splitting each operand (``Precision.HIGH`` = 3 passes, ``HIGHEST`` = 6
passes), so precision is directly a throughput multiplier. The conditional
math (ops/conditionals.py) needs full HIGHEST accuracy in exactly one place:
the ``A = P^{-1} Kuf`` projection whose norm cancels against Kff in the
posterior variance (relative error there is amplified by ~Kff/var, up to
~1e6 near inducing points). The other big contractions are cancellation-free:

* the variational quadform ``B = q_sqrt^T A`` enters the variance as a
  *positive* sum of squares — a relative error of eps in B perturbs the
  variance by ~2*eps of the (added, nonnegative) t2 term only;
* every backward-pass cotangent matmul feeds Adam/NatGrad steps, which are
  robust to relative gradient noise far above even 1-pass accuracy: the
  S=10 Monte-Carlo gradient noise is ~1e-1 relative, the measured 1-pass
  cotangent drift 5.9e-6.

On f32 accelerators ``quad_precision`` therefore defaults to HIGH (3-pass
forward; users see the variance) and the *global* ``bwd_precision`` default
is also HIGH: 1-pass (DEFAULT) cotangents are landscape-dependent — verified
safe for the plain-DGP trainers (which opt in via
``config.precision_scope(bwd="default")``, as does bench.py) but measurably
degrading for the stiff staged MF/EM/MO trainers at full schedules (see
config.bwd_precision). Under x64 both are HIGHEST (the CPU backend computes
native f64 and the flags are moot). Measured on a v5e chip with bench.py (2-layer
DGP, N=10k, M=128, S=10): 150.9 -> 179.3 steps/s for 3-pass quad+bwd,
194.5 -> 222.6 for 1-pass bwd on top of batched factorizations; the
full-schedule DGP training retrains to published quality under both
(benchmarks/precision_probe*.py, benchmarks/tpu_families.py) — see README.

The reference carries no counterpart: TF/GPflow runs everything in f64 on
CPU (/root/reference/dgp_dace/models/MF_DGP.py:29).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_PREC = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def resolve_precision(name) -> jax.lax.Precision:
    if isinstance(name, jax.lax.Precision):
        return name
    return _PREC[str(name).lower()]


def _unbroadcast(x, shape):
    """Sum a cotangent back down to ``shape`` after matmul broadcasting."""
    if x.shape == tuple(shape):
        return x
    extra = x.ndim - len(shape)
    if extra:
        x = jnp.sum(x, axis=tuple(range(extra)))
    axes = tuple(
        i for i, (xs, s) in enumerate(zip(x.shape, shape)) if s == 1 and xs != 1
    )
    if axes:
        x = jnp.sum(x, axis=axes, keepdims=True)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def mm(a, b, fwd_precision, bwd_precision):
    """``a @ b`` computed at ``fwd_precision``, with cotangent matmuls at
    ``bwd_precision``. Last two dims contract; leading dims broadcast
    (the only shapes used here: [M,M]@[M,n] and [D,M,M]@[1,M,n])."""
    return jnp.matmul(a, b, precision=fwd_precision)


def _mm_fwd(a, b, fwd_precision, bwd_precision):
    return mm(a, b, fwd_precision, bwd_precision), (a, b)


def _mm_bwd(fwd_precision, bwd_precision, res, g):
    a, b = res
    da = jnp.matmul(g, jnp.swapaxes(b, -1, -2), precision=bwd_precision)
    db = jnp.matmul(jnp.swapaxes(a, -1, -2), g, precision=bwd_precision)
    return _unbroadcast(da, a.shape), _unbroadcast(db, b.shape)


mm.defvjp(_mm_fwd, _mm_bwd)
