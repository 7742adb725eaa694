"""AsyncDetector: in-order pipelined detection (MaskRCNN.cpp:367-446 mode)."""

import threading
import time

import numpy as np

from semantic_slam_tpu.semantic.detector import AsyncDetector, Detections


class SlowCountingDetector:
    """Returns the submitted frame id in `labels[0]`; records concurrency."""

    def __init__(self, delay=0.02):
        self.delay = delay
        self.calls = []

    def predict(self, frame_id):
        self.calls.append(frame_id)
        time.sleep(self.delay)
        z = np.zeros
        return Detections(boxes=z((1, 4), np.float32),
                          masks=z((1, 4, 4), bool),
                          labels=np.array([frame_id], np.int32),
                          scores=np.array([0.9], np.float32),
                          valid=np.array([True]))


def test_results_in_submission_order():
    det = SlowCountingDetector()
    with AsyncDetector(det, queue_size=3) as adet:
        for i in range(8):
            adet.submit(i)
        got = [int(adet.result().labels[0]) for _ in range(8)]
    assert got == list(range(8))
    assert det.calls == list(range(8))


def test_overlaps_with_consumer_work():
    """Worker must run while the main thread is busy."""
    det = SlowCountingDetector(delay=0.05)
    with AsyncDetector(det, queue_size=2) as adet:
        adet.submit(0)
        t0 = time.perf_counter()
        time.sleep(0.08)                  # consumer-side "engine work"
        r = adet.result()                 # should already be done
        dt = time.perf_counter() - t0
    assert int(r.labels[0]) == 0
    assert dt < 0.12                      # detection overlapped the sleep


def test_error_propagates():
    class Boom:
        def predict(self, x):
            raise ValueError("bad frame")

    with AsyncDetector(Boom()) as adet:
        adet.submit(1)
        try:
            adet.result()
            assert False, "expected ValueError"
        except ValueError:
            pass


def test_close_joins_worker():
    det = SlowCountingDetector()
    adet = AsyncDetector(det)
    adet.submit(5)
    assert int(adet.result().labels[0]) == 5
    adet.close()
    assert not adet._thread.is_alive()
    assert threading.active_count() >= 1
