from semantic_slam_tpu.utils.timing import Timer, StageTimer  # noqa: F401
