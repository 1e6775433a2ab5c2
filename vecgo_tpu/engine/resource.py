"""Resource controller: memory accounting, backpressure, IO rate limiting.

Reference: internal/resource (Controller controller.go:32, ErrBackpressure,
IO limiter io.go:10-50; wired with a 1 GB default in engine.go:446-450).
"""

from __future__ import annotations

import threading
import time

from vecgo_tpu.errors import ErrBackpressure


class Controller:
    def __init__(self, memory_limit_bytes: int = 0, observer=None):
        self.memory_limit = memory_limit_bytes
        self._used = 0
        self._lock = threading.Lock()
        self._observer = observer

    @property
    def used(self) -> int:
        return self._used

    def acquire(self, nbytes: int) -> None:
        """Account memory; raises ErrBackpressure over the limit."""
        with self._lock:
            if self.memory_limit and self._used + nbytes > self.memory_limit:
                if self._observer is not None:
                    self._observer.on_backpressure()
                raise ErrBackpressure(
                    f"memory limit {self.memory_limit} exceeded "
                    f"(used {self._used} + {nbytes})"
                )
            self._used += nbytes

    def release(self, nbytes: int) -> None:
        with self._lock:
            self._used = max(0, self._used - nbytes)

    def set_used(self, nbytes: int) -> None:
        with self._lock:
            self._used = nbytes


class RateLimiter:
    """Token-bucket byte/s limiter for flush/compaction writers
    (reference: resource/io.go)."""

    def __init__(self, bytes_per_s: float, burst: float = 0.0):
        self.rate = bytes_per_s
        self.burst = burst or bytes_per_s
        self._tokens = self.burst
        self._last = time.monotonic()
        self._lock = threading.Lock()

    def throttle(self, nbytes: int) -> float:
        """Blocks until nbytes may proceed; returns seconds slept.

        Requests larger than the burst are allowed by letting the bucket go
        negative (debt), so a single oversized write throttles *subsequent*
        writes instead of deadlocking.
        """
        if self.rate <= 0:
            return 0.0
        slept = 0.0
        gate = min(float(nbytes), self.burst)
        while True:
            with self._lock:
                now = time.monotonic()
                self._tokens = min(
                    self.burst, self._tokens + (now - self._last) * self.rate
                )
                self._last = now
                if self._tokens >= gate:
                    self._tokens -= nbytes  # may go negative (debt)
                    return slept
                need = (gate - self._tokens) / self.rate
            step = min(need, 0.1)
            time.sleep(step)
            slept += step
