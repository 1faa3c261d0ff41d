from geobignn_tpu.train.optim import lr_at_epoch, make_optimizer  # noqa: F401
from geobignn_tpu.train.trainer import Trainer, train  # noqa: F401
