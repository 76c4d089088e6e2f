from . import rbf_conditional
