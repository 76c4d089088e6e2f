from .data_parallel import make_data_parallel_elbo, make_data_parallel_loss
from .mesh import make_mesh, pad_to_multiple, replicate, shard_batch
