"""Metric recorder: JSONL event log + windowed smoothing.

Counterpart of reference lib/train/recorder.py:7-105 (tensorboardX
SummaryWriter + SmoothedValue). The environment has no tensorboard writer
baked in, so the primary sink is an append-only JSONL file any dashboard can
tail; a SummaryWriter is attached opportunistically when available.
"""

from __future__ import annotations

import collections
import json
import os
import time
from typing import Mapping


class SmoothedValue:
    """Window-20 median/average smoothing (ref recorder.py:14-38)."""

    def __init__(self, window: int = 20):
        self.values = collections.deque(maxlen=window)
        self.total = 0.0
        self.count = 0

    def update(self, v: float):
        self.values.append(v)
        self.total += v
        self.count += 1

    @property
    def median(self) -> float:
        s = sorted(self.values)
        return s[len(s) // 2] if s else 0.0

    @property
    def avg(self) -> float:
        return sum(self.values) / len(self.values) if self.values else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)


class Recorder:
    def __init__(self, record_dir: str):
        os.makedirs(record_dir, exist_ok=True)
        self.path = os.path.join(record_dir, "events.jsonl")
        self._file = open(self.path, "a")
        self.smoothed = collections.defaultdict(SmoothedValue)
        self._tb = None
        try:  # optional tensorboard sink
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(record_dir)
        except Exception:
            pass

    def record(self, prefix: str, step: int, stats: Mapping[str, float]):
        for k, v in stats.items():
            self.smoothed[f"{prefix}/{k}"].update(float(v))
        event = {
            "t": time.time(),
            "step": step,
            **{f"{prefix}/{k}": float(v) for k, v in stats.items()},
        }
        self._file.write(json.dumps(event) + "\n")
        self._file.flush()
        if self._tb is not None:
            for k, v in stats.items():
                self._tb.add_scalar(f"{prefix}/{k}", float(v), step)

    def state_dict(self) -> dict:
        return {"counts": {k: v.count for k, v in self.smoothed.items()}}

    def close(self):
        self._file.close()
        if self._tb is not None:
            self._tb.close()
