from semantic_slam_tpu.slam.map import MapArrays, covis_from_observations  # noqa: F401
