"""Print a roofline report for the framework's hot kernels on the current
device (run on TPU; falls back to CPU peaks elsewhere).

    python examples/roofline.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from semantic_slam_tpu.utils.roofline import (
    device_peaks, format_report, measure_all, standard_kernel_suite)


def main():
    peaks = device_peaks()
    print(f"device={peaks['kind']}  peaks: {peaks['bf16_tflops']} bf16-TF/s, "
          f"{peaks['f32_tflops']} f32-TF/s, {peaks['hbm_gbs']} GB/s")
    rows = measure_all(standard_kernel_suite())
    print(format_report(rows))
    print("""
notes:
- tsdf_dense_200^3 is the reference-parity DENSE integrate: one arbitrary
  depth-image gather per voxel pins it to the TPU gather wall (~150 M elem/s)
  far below HBM bandwidth. The production path is the hierarchically-culled
  blocked kernel (bench.py section_tsdf, ~1.2 Gvox/s effective) whose skipped
  work makes a dense roofline model inapplicable — this row exists to show
  the wall the blocked design is built around.
- hamming/extract_orb at SLAM-frame sizes are latency-bound (small tensors,
  sequential burst): %roof at these shapes is not a schedule-quality metric.
  At map-matching scale (4096x4096) the same bf16 hamming sustains ~19 TF/s.""")


if __name__ == "__main__":
    main()
