"""Tracing / profiling helpers.

The reference has only ad-hoc wall-clock timing (SmoothedValue batch/data
time, peak-CUDA-memory prints, ref lib/train/trainer.py:33,51-65 and the
synchronize-bracketed timing of run.py:50-56). Here the same console
surface is kept, plus first-class XLA tracing:

  * `trace(path)` — context manager around jax.profiler.trace; the trace
    opens in TensorBoard/Perfetto.
  * `StepTimer` — data-time/step-time split with window medians, and the
    reference-style eta console line.
  * `device_memory_stats()` — per-device live-bytes (the TPU counterpart of
    torch.cuda.max_memory_allocated).
"""

from __future__ import annotations

import contextlib
import time

import jax

from clean_pvnet_tpu.train.recorder import SmoothedValue


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
            }
    return out


class StepTimer:
    """Tracks data-wait vs step time like the reference recorder
    (ref lib/train/recorder.py:48-49, trainer.py:33,51-54)."""

    def __init__(self, window: int = 20):
        self.data_time = SmoothedValue(window)
        self.batch_time = SmoothedValue(window)
        self._t = time.perf_counter()

    def mark_data(self):
        now = time.perf_counter()
        self.data_time.update(now - self._t)
        self._t = now

    def mark_step(self):
        now = time.perf_counter()
        self.batch_time.update(now - self._t)
        self._t = now

    def eta_line(self, step: int, total_steps: int) -> str:
        remaining = (total_steps - step) * self.batch_time.avg
        return (
            f"data {self.data_time.median*1e3:.0f}ms "
            f"step {self.batch_time.median*1e3:.0f}ms "
            f"eta {remaining:.0f}s"
        )
