from geobignn_tpu.models.dual_gnn import DualGNN, FeaStConv, GNNModule  # noqa: F401
from geobignn_tpu.models import losses  # noqa: F401
