from geobignn_tpu.infer.predict import (  # noqa: F401
    Predictor,
    predict_dir,
    update_positions,
)
