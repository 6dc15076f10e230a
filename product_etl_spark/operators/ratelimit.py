"""Token-bucket rate limiting for external-call stages (M8).

The reference paces external systems with hard sleeps
(time.sleep(0.5/1/2) at utils/product_collection_img_array_processor
.py:164, utils/details_translator/db_orchestrator.py:209,388). In
Spark the pacing must live inside the task (one bucket per partition)
and the *global* rate is bucket_rate x num_partitions — so the
pipeline controls total pressure by repartitioning the driving frame
to ``ceil(global_rate / per_task_rate)`` partitions before the stage.
"""

from __future__ import annotations

import time
from collections.abc import Callable


class TokenBucket:
    """Minimal blocking token bucket: ``rate`` tokens/s, burst of
    ``burst`` tokens. ``acquire()`` blocks until a token is available.
    Injectable clock/sleeper for deterministic tests."""

    def __init__(
        self,
        rate: float,
        burst: float = 1.0,
        clock: Callable[[], float] = time.monotonic,
        sleeper: Callable[[float], None] = time.sleep,
    ) -> None:
        if rate <= 0:
            raise ValueError("rate must be positive")
        self.rate = rate
        self.burst = burst
        self._clock = clock
        self._sleep = sleeper
        self._tokens = burst
        self._last = clock()

    def _refill(self) -> None:
        now = self._clock()
        self._tokens = min(self.burst, self._tokens + (now - self._last) * self.rate)
        self._last = now

    def acquire(self, n: float = 1.0) -> None:
        while True:
            self._refill()
            if self._tokens >= n:
                self._tokens -= n
                return
            self._sleep((n - self._tokens) / self.rate)
