from geobignn_tpu.parallel.api import (  # noqa: F401
    batch_pspecs,
    make_mesh,
    make_sharded_train_step,
    stack_samples,
)
