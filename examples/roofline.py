"""Print a roofline report for the framework's hot kernels on the current
device (run on TPU; falls back to CPU peaks elsewhere).

    python examples/roofline.py
"""

from semantic_slam_tpu.utils.roofline import (
    device_peaks, format_report, measure_all, standard_kernel_suite)


def main():
    peaks = device_peaks()
    print(f"device={peaks['kind']}  peaks: {peaks['bf16_tflops']} bf16-TF/s, "
          f"{peaks['f32_tflops']} f32-TF/s, {peaks['hbm_gbs']} GB/s")
    rows = measure_all(standard_kernel_suite())
    print(format_report(rows))


if __name__ == "__main__":
    main()
