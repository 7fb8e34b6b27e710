"""Timers and scalar meters.

Parity targets: ``utils.Timer`` (accumulating named wall-time context
manager, ``utils/__init__.py:243-264`` in AaronZ345/StyleSinger) and
``AvgrageMeter`` (``utils/__init__.py:232-247``).  For on-device profiling
use ``jax.profiler`` traces instead (see training docs).
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Dict


class Timer:
    timer_map: Dict[str, float] = defaultdict(float)

    def __init__(self, name: str, enable: bool = True,
                 print_time: bool = False):
        self.name = name
        self.enable = enable
        self.print_time = print_time

    def __enter__(self):
        if self.enable:
            self.t = time.time()
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        if self.enable:
            Timer.timer_map[self.name] += time.time() - self.t
            if self.print_time:
                print(self.name, Timer.timer_map[self.name])


class AvgMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.avg = 0.0
        self.sum = 0.0
        self.cnt = 0

    def update(self, val: float, n: int = 1):
        self.sum += val * n
        self.cnt += n
        self.avg = self.sum / max(self.cnt, 1)
