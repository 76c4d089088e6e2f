from . import dgp, gpr, mf_dgp, mf_dgp_em, mo_dgp, training
from .dgp import DGP, DGPParams
from .gpr import GPR, GPRParams
from .mf_dgp import MFDGPParams, MultiFidelityDeepGP
from .mf_dgp_em import MFDGPEMParams, MultiFidelityDeepGP_EM
from .mo_dgp import MODGPParams, MultiObjDeepGP
