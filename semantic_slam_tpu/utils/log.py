"""Structured logging/metrics.

The reference's observability is `cout` progress lines and debug PNG dumps
(SURVEY.md §5). This module provides leveled logging plus a metrics recorder
that accumulates named scalar series and dumps JSON — the hooks bench.py and
the drivers use for frames/s, Mvoxel/s, per-stage times.
"""

from __future__ import annotations

import json
import logging
import time
from collections import defaultdict
from typing import Dict, List, Optional

_FMT = "%(asctime)s %(levelname).1s %(name)s] %(message)s"


def get_logger(name: str = "semslam", level: str = "INFO") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(_FMT, datefmt="%H:%M:%S"))
        logger.addHandler(h)
        logger.propagate = False
    logger.setLevel(getattr(logging, level.upper(), logging.INFO))
    return logger


class Metrics:
    """Named scalar series with summary stats + JSON export."""

    def __init__(self):
        self.series: Dict[str, List[float]] = defaultdict(list)
        self.t0 = time.time()

    def record(self, name: str, value: float):
        self.series[name].append(float(value))

    def summary(self) -> Dict[str, Dict[str, float]]:
        import numpy as np

        out = {}
        for k, v in self.series.items():
            a = np.asarray(v)
            out[k] = dict(n=len(a), mean=float(a.mean()),
                          median=float(np.median(a)), max=float(a.max()),
                          min=float(a.min()))
        return out

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(dict(elapsed_s=time.time() - self.t0,
                           summary=self.summary(), series=self.series), f,
                      indent=2)
