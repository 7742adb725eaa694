#!/usr/bin/env python
"""coords.txt inspection utility (reference ``examples/readCoords.cpp``).

Prints per-keyframe keypoint counts and optionally dumps one keyframe's
keypoints.

Usage: python examples/read_coords.py result/rgbd/coords.txt [kf_index]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return
    path = sys.argv[1]
    show_kf = int(sys.argv[2]) if len(sys.argv) > 2 else -1
    kf = -1
    counts = []
    rows = []
    with open(path) as f:
        for line in f:
            if line.startswith("#index"):
                kf += 1
                counts.append(0)
                continue
            parts = line.split()
            if len(parts) >= 3 and kf >= 0:
                counts[kf] += 1
                if kf == show_kf:
                    rows.append((int(parts[0]), float(parts[1]),
                                 float(parts[2])))
    print(f"{len(counts)} keyframes")
    for i, c in enumerate(counts):
        print(f"  kf {i}: {c} keypoints")
    if rows:
        print(f"keyframe {show_kf} keypoints:")
        for j, u, v in rows[:20]:
            print(f"  {j}: ({u:.2f}, {v:.2f})")
        if len(rows) > 20:
            print(f"  ... {len(rows) - 20} more")


if __name__ == "__main__":
    main()
