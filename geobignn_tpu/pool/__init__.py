from geobignn_tpu.pool.hierarchy import (  # noqa: F401
    PoolLevelSpec,
    build_hierarchy,
    greedy_matching,
    pool_graph_np,
)
