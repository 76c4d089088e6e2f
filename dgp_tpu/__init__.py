"""dgp_tpu — a TPU-native JAX/XLA rebuild of dgp-toolbox (Hebbalali).

Deep Gaussian processes (DGP, MF-DGP, MF-DGP-EM, MO-DGP) and Bayesian
optimization (SO_BO/MO_BO/MF_BO, EI/WB2/WB2S/EV/PoF, EHVI) re-designed for TPU:
functional pytree models, jitted lax.scan training loops, natural gradients
as pure functions, shard_map data parallelism over device meshes, and
MXU-precision-controlled contractions on the hot SVGP-conditional path.
"""

from . import config
from .config import (
    bwd_precision,
    default_float,
    default_jitter,
    quad_precision,
    set_bwd_precision,
    set_default_float,
    set_default_jitter,
    set_quad_precision,
)

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level exports (keeps `import dgp_tpu` light)."""
    _exports = {
        "DGP": ("dgp_tpu.models.dgp", "DGP"),
        "GPR": ("dgp_tpu.models.gpr", "GPR"),
        "MultiFidelityDeepGP": ("dgp_tpu.models.mf_dgp", "MultiFidelityDeepGP"),
        "MultiFidelityDeepGP_EM": (
            "dgp_tpu.models.mf_dgp_em", "MultiFidelityDeepGP_EM"),
        "MultiObjDeepGP": ("dgp_tpu.models.mo_dgp", "MultiObjDeepGP"),
        "AR1CoKriging": ("dgp_tpu.models.cokriging", "AR1CoKriging"),
        "NARGP": ("dgp_tpu.models.nargp", "NARGP"),
        "SO_BO": ("dgp_tpu.bo.so_bo", "SO_BO"),
        "MO_BO": ("dgp_tpu.bo.mo_bo", "MO_BO"),
        "MF_BO": ("dgp_tpu.bo.mf_bo", "MF_BO"),
        "kernels": ("dgp_tpu.ops.kernels", None),
        "likelihoods": ("dgp_tpu.ops.likelihoods", None),
        "summary": ("dgp_tpu.utils.monitor", "summary"),
        "parallel": ("dgp_tpu.parallel", None),
    }
    if name in _exports:
        import importlib

        module, attr = _exports[name]
        mod = importlib.import_module(module)
        return getattr(mod, attr) if attr else mod
    raise AttributeError(f"module 'dgp_tpu' has no attribute {name!r}")
