from . import acquisition, de, doe, problems, so_bo
from .acquisition import EI, EV, WB2, WB2S, EV_one_constraint, PoF
from .doe import doe as DoE, lhs
from .so_bo import SO_BO, denormalize, denormalize_var, normalize, normalize_C, normalize_X
