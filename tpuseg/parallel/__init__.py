from tpuseg.parallel.mesh import (  # noqa: F401
    configure_backend_from_env,
    data_parallel_size,
    initialize_distributed,
    make_mesh,
    put_global_batch,
    replicate,
    setup_data_parallel,
    shard_batch,
    shard_train_step,
    spatial_forward,
)
