from .initializations import init_layers_linear
from .svgp import (
    SVGPLayer,
    conditional_snd,
    layer_kl,
    make_svgp_layer,
    mean_propagated_sample,
    sample_from_conditional,
)
