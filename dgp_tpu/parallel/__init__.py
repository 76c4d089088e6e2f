from .data_parallel import (
    make_data_parallel_elbo,
    make_data_parallel_loss,
    make_data_sample_parallel_elbo,
    make_multislice_elbo,
)
from .mesh import (
    make_mesh,
    make_mesh_2d,
    make_mesh_multislice,
    pad_to_multiple,
    replicate,
    shard_batch,
)
