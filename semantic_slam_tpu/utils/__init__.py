from semantic_slam_tpu.utils.timing import Timer, StageTimer  # noqa: F401
from semantic_slam_tpu.utils.roofline import (  # noqa: F401
    KernelSpec, RooflineRow, device_peaks, format_report, measure_all,
    measure_kernel)
