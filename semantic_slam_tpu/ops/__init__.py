from semantic_slam_tpu.ops.fast import detect_fast_grid, fast_score, nms3x3  # noqa: F401
from semantic_slam_tpu.ops.orb import (  # noqa: F401
    extract_orb, compute_descriptors, build_pyramid, Features, unpack_to_pm1,
)
from semantic_slam_tpu.ops.match import (  # noqa: F401
    hamming_matrix, match_descriptors, window_mask, rotation_consistency,
)
