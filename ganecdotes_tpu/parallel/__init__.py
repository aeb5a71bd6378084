from ganecdotes_tpu.parallel.mesh import (
    distributed_init,
    make_mesh,
    shard_batch,
    replicate,
    data_parallel_infer,
)
