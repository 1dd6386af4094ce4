from .data_parallel import (  # noqa: F401
    make_mesh,
    make_parallel_train_step,
    make_parallel_eval_step,
    replicate,
    shard_batch,
)
