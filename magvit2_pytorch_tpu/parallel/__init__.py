from magvit2_pytorch_tpu.parallel.distributed import (
    initialize_distributed,
    process_count,
    process_index,
)
from magvit2_pytorch_tpu.parallel.mesh import (
    batch_axes,
    data_parallel_extent,
    data_sharding,
    is_main_process,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
    shard_params_tensor_parallel,
    tensor_parallel_shardings,
)
