#!/bin/bash
# Serial TPU artifact generation (run with an otherwise-idle host: the
# tunnel dispatch loops are host-driven and timing-sensitive).
set -x
cd /root/repo
echo "=== roofline ==="
timeout 2400 python examples/roofline.py 2>&1 | grep -v WARNING | tee /tmp/art_roofline.log
echo "=== bench ==="
timeout 1800 python bench.py 2>&1 | tail -3 | tee /tmp/art_bench.log
echo "=== engine fixture ==="
timeout 3600 python tools/engine_fixture_bench.py 194 2>&1 | tail -6 | tee /tmp/art_engine.log
echo "=== detector stress ==="
timeout 2400 python tools/detector_stress.py 2>&1 | tail -25 | tee /tmp/art_detector.log
echo "=== all done ==="
