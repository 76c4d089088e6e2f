"""dgp_tpu — a TPU-native JAX/Pallas rebuild of dgp-toolbox (Hebbalali).

Deep Gaussian processes (DGP, MF-DGP, MF-DGP-EM, MO-DGP) and Bayesian
optimization (SO_BO, EI/WB2/WB2S/EV/PoF, EHVI) re-designed for TPU:
functional pytree models, jitted lax.scan training loops, natural gradients
as pure functions, shard_map data parallelism over device meshes, and Pallas
kernels on the hot SVGP-conditional path.
"""

from . import config
from .config import (
    default_float,
    default_jitter,
    set_default_float,
    set_default_jitter,
    set_use_pallas,
)

__version__ = "0.1.0"
