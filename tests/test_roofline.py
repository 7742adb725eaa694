"""Roofline harness tests (CPU: structure + bound classification)."""

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.utils.roofline import (
    KernelSpec, device_peaks, format_report, measure_kernel)


def test_device_peaks_has_required_fields():
    peaks = device_peaks()
    assert peaks["bf16_tflops"] > 0
    assert peaks["f32_tflops"] > 0
    assert peaks["hbm_gbs"] > 0


def test_measure_kernel_classifies_bounds():
    peaks = device_peaks()
    balance = peaks["f32_tflops"] * 1e12 / (peaks["hbm_gbs"] * 1e9)
    x = jnp.asarray(np.random.RandomState(0).randn(256, 256).astype(np.float32))

    # High-intensity spec (I >> balance) must classify compute-bound,
    # low-intensity (I << balance) memory-bound, regardless of timing.
    hi = measure_kernel(
        KernelSpec("mm", lambda: x @ x, flops=2 * 256 ** 3 * balance,
                   bytes=1.0),
        peaks, warmup=1, iters=3, batches=1)
    lo = measure_kernel(
        KernelSpec("copy", lambda: x + 1.0, flops=1.0,
                   bytes=2.0 * 256 * 256 * 4),
        peaks, warmup=1, iters=3, batches=1)
    assert hi.bound == "compute"
    assert lo.bound == "memory"
    assert hi.seconds > 0 and lo.seconds > 0
    assert 0 <= lo.pct_of_roof  # achieved never negative


def test_format_report_renders_all_rows():
    peaks = device_peaks()
    x = jnp.ones((64, 64))
    rows = [measure_kernel(
        KernelSpec(f"k{i}", lambda: x * 2, flops=4096.0, bytes=32768.0),
        peaks, warmup=1, iters=2, batches=1) for i in range(3)]
    rep = format_report(rows)
    assert rep.count("\n") >= 4
    for i in range(3):
        assert f"k{i}" in rep
