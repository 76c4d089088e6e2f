from .gaussian import gauss_kl
from .natgrad import natgrad_step, natgrad_step_multi
