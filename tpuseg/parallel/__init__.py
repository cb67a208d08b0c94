from tpuseg.parallel.mesh import (  # noqa: F401
    initialize_distributed,
    make_mesh,
    replicate,
    shard_batch,
    shard_train_step,
    spatial_forward,
)
