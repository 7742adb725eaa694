from semantic_slam_tpu.models.maskrcnn import (  # noqa: F401
    MaskRCNN, init_params, run_inference, train_step,
)
