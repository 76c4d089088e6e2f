from . import conditionals, kernels, likelihoods, linalg, means, transforms
