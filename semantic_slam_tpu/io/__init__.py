from semantic_slam_tpu.io import mapio, evaluate  # noqa: F401
