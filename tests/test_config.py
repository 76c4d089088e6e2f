import jax
import jax.numpy as jnp
import numpy as np

import dgp_tpu
from dgp_tpu import config
from dgp_tpu.parallel.mesh import pad_to_multiple


def test_default_float_tracks_x64():
    # conftest enables x64, so the default is f64
    assert config.default_float() == jnp.dtype("float64")
    assert config.default_jitter() == 1e-6
    config.set_default_float("float32")
    try:
        assert config.default_float() == jnp.dtype("float32")
        assert config.default_jitter() == 1e-4  # precision-aware default
    finally:
        config._STATE["float"] = None
    assert config.default_float() == jnp.dtype("float64")


def test_jitter_override():
    config.set_default_jitter(3e-5)
    try:
        assert config.default_jitter() == 3e-5
    finally:
        config._STATE["jitter"] = None


def test_precision_knobs():
    # conftest enables x64 -> auto resolves to HIGHEST (native f64 CPU math)
    assert config.quad_precision() == jax.lax.Precision.HIGHEST
    assert config.bwd_precision() == jax.lax.Precision.HIGHEST
    config.set_quad_precision("high")
    config.set_bwd_precision("high")
    try:
        assert config.quad_precision() == jax.lax.Precision.HIGH
        assert config.bwd_precision() == jax.lax.Precision.HIGH
    finally:
        config.set_quad_precision("auto")
        config.set_bwd_precision("auto")
    # on an f32 working dtype, auto resolves to the 3-pass path
    config.set_default_float("float32")
    try:
        assert config.quad_precision() == jax.lax.Precision.HIGH
    finally:
        config._STATE["float"] = None
        jax.config.update("jax_enable_x64", True)


def test_pad_to_multiple():
    x = np.arange(10).reshape(5, 2)
    padded, n = pad_to_multiple(x, 4)
    assert padded.shape == (8, 2) and n == 5
    assert np.all(padded[5:] == 0)
    same, n2 = pad_to_multiple(x, 5)
    assert same.shape == (5, 2) and n2 == 5
