from semantic_slam_tpu.semantic.engine import Engine  # noqa: F401
from semantic_slam_tpu.semantic.inventory import Inventory  # noqa: F401
from semantic_slam_tpu.semantic.don import DoN, don_extract  # noqa: F401
from semantic_slam_tpu.semantic.detector import (  # noqa: F401
    Detections, OracleDetector, MaskRCNNDetector, pad_detections,
)
