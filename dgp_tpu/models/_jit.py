"""Backend-aware jit for the stateful wrappers' inference methods.

On an accelerator, op-by-op dispatch of a whole DGP propagate per predict
call is disastrous (each op is a round trip); under jit it is one program.
On CPU the opposite holds for the small, ever-changing shapes of tests and
interactive use: eager dispatch is instant while every new (shape, S) combo
would force a full XLA compile. ``maybe_jit`` therefore compiles only when
the default backend is not CPU (overridable via ``dgp_tpu.config``).
"""

from __future__ import annotations

import jax

_STATE = {"mode": "auto"}  # "auto" | True | False


def set_jit_wrappers(mode) -> None:
    """True/False to force, "auto" (default) = jit on non-CPU backends."""
    _STATE["mode"] = mode


def _enabled() -> bool:
    mode = _STATE["mode"]
    if mode == "auto":
        try:
            return jax.default_backend() != "cpu"
        except Exception:  # pragma: no cover
            return False
    return bool(mode)


def maybe_jit(fn, static_argnums=()):
    jitted = jax.jit(fn, static_argnums=static_argnums)

    def wrapper(*args):
        if _enabled():
            return jitted(*args)
        return fn(*args)

    wrapper.__name__ = getattr(fn, "__name__", "wrapped")
    return wrapper
