from . import acquisition, de, doe, ehvi, problems, so_bo
from .acquisition import EI, EV, WB2, WB2S, EV_one_constraint, PoF
from .doe import doe as DoE, lhs
from .ehvi import (EHVI, HV_calcul, NDC, Y_ND, ehvi_mc, hypervolume,
                   optimize_EHVI, pareto_mask, psi)
from .so_bo import SO_BO, denormalize, denormalize_var, normalize, normalize_C, normalize_X
