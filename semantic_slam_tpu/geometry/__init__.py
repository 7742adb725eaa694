from semantic_slam_tpu.geometry.se3 import (  # noqa: F401
    se3_exp, se3_log, so3_exp, so3_log, se3_inverse, se3_compose,
    transform_points, skew, sim3_exp, sim3_log, sim3_inverse, sim3_compose,
    sim3_transform_points, sim3_to_matrix,
)
from semantic_slam_tpu.geometry.camera import (  # noqa: F401
    Intrinsics, project, backproject, distort, undistort_points,
    fundamental_from_poses, point_line_distance,
)
