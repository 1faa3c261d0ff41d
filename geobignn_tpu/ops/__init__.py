from geobignn_tpu.ops import segment  # noqa: F401
from geobignn_tpu.ops.feastconv import feast_conv, init_feast_params  # noqa: F401
