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


# XLA-CPU's compiler segfaults inside backend_compile_and_load after ~100
# heavy model compiles accumulate in one process (observed repeatedly at
# ~2/3 through the suite, at whatever test sits there; every such test
# passes in a fresh process). Dropping the compiled-executable caches
# between test modules keeps the per-process compiler state bounded so the
# suite can also run as a single pytest invocation (run_tests.sh shards it
# anyway, which is faster).
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_compiler_state():
    yield
    from dgp_tpu.bo import de as _de
    from dgp_tpu.models import training as _training

    _training.clear_engine_cache()
    _de.clear_engine_cache()
    jax.clear_caches()
