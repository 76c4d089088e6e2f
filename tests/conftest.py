"""Test configuration: 8 virtual CPU devices + float64 parity mode.

The environment's sitecustomize pins JAX_PLATFORMS to the TPU tunnel, so the
env var alone is not enough — we override the platform through jax.config
after import (XLA_FLAGS must still be set before the first backend init).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
