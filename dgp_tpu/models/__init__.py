from . import dgp, training
from .dgp import DGP, DGPParams
