"""Wall-clock timer with tick/tock averaging.

Rebuild of the reference's ``Timer`` (core/utils.py:744-812). For device work
call ``jax.block_until_ready`` before ``tock()`` — helpers provided.
"""

from __future__ import annotations

import time


class Timer:
    def __init__(self):
        self.start_time: float | None = None
        self.end_time: float | None = None
        self.total_time: float = 0.0
        self.calls: int = 0

    def tick(self) -> None:
        self.start_time = time.perf_counter()

    def tock(self) -> float:
        if self.start_time is None:
            raise RuntimeError("Timer.tock() before tick()")
        self.end_time = time.perf_counter()
        dt = self.end_time - self.start_time
        self.total_time += dt
        self.calls += 1
        return dt

    @property
    def last_time(self) -> float:
        if self.end_time is None or self.start_time is None:
            return 0.0
        return self.end_time - self.start_time

    @property
    def avg_time(self) -> float:
        return self.total_time / self.calls if self.calls else 0.0

    def reset(self) -> None:
        self.__init__()

    def __enter__(self):
        self.tick()
        return self

    def __exit__(self, *exc):
        self.tock()


def time_device_fn(fn, *args, warmup: int = 2, repeats: int = 10) -> float:
    """Average seconds per call of a jitted fn, blocking on device completion."""
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t = Timer()
    for _ in range(repeats):
        t.tick()
        jax.block_until_ready(fn(*args))
        t.tock()
    return t.avg_time
