"""Per-model traffic statistics (reference: controller/traffic_monitor.py).

Tracks request counts, a rolling window of timestamps for windowed request
rates, and idle time — the signal the sleep manager uses to decide which
models to put to sleep.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from dataclasses import dataclass, field


@dataclass
class ModelActivityStats:
    """Rolling activity stats for one model (reference :27-77)."""

    model: str
    max_history: int = 1000
    total_requests: int = 0
    active_requests: int = 0
    total_errors: int = 0
    last_request_time: float | None = None
    _timestamps: deque = field(default_factory=lambda: deque(maxlen=1000))

    def record_start(self, now: float | None = None) -> None:
        now = now if now is not None else time.time()
        self.total_requests += 1
        self.active_requests += 1
        self.last_request_time = now
        self._timestamps.append(now)

    def record_end(self, error: bool = False) -> None:
        self.active_requests = max(0, self.active_requests - 1)
        if error:
            self.total_errors += 1

    def request_rate(self, window_s: float = 60.0, now: float | None = None) -> float:
        now = now if now is not None else time.time()
        cutoff = now - window_s
        n = sum(1 for t in self._timestamps if t >= cutoff)
        return n / window_s

    def idle_time(self, now: float | None = None) -> float:
        now = now if now is not None else time.time()
        if self.active_requests > 0:
            return 0.0
        if self.last_request_time is None:
            return float("inf")
        return now - self.last_request_time

    def cleanup_history(self, keep_s: float = 3600.0, now: float | None = None) -> None:
        now = now if now is not None else time.time()
        cutoff = now - keep_s
        while self._timestamps and self._timestamps[0] < cutoff:
            self._timestamps.popleft()

    def summary(self, now: float | None = None) -> dict:
        return {
            "model": self.model,
            "total_requests": self.total_requests,
            "active_requests": self.active_requests,
            "total_errors": self.total_errors,
            "request_rate_1m": self.request_rate(60.0, now),
            "idle_time_s": self.idle_time(now),
        }


class TrafficMonitor:
    """Registry of per-model stats + idle/active classification
    (reference :111-224)."""

    def __init__(self, idle_threshold_s: float = 300.0):
        self.idle_threshold_s = idle_threshold_s
        self._stats: dict[str, ModelActivityStats] = {}
        self._lock = threading.Lock()

    def _get(self, model: str) -> ModelActivityStats:
        with self._lock:
            if model not in self._stats:
                self._stats[model] = ModelActivityStats(model)
            return self._stats[model]

    def record_request_start(self, model: str) -> None:
        self._get(model).record_start()

    def record_request_end(self, model: str, error: bool = False) -> None:
        self._get(model).record_end(error)

    def idle_models(self, now: float | None = None) -> list[str]:
        with self._lock:
            return [
                m
                for m, s in self._stats.items()
                if s.idle_time(now) >= self.idle_threshold_s
            ]

    def active_models(self, now: float | None = None) -> list[str]:
        with self._lock:
            return [
                m
                for m, s in self._stats.items()
                if s.idle_time(now) < self.idle_threshold_s
            ]

    def summary(self) -> dict:
        now = time.time()
        with self._lock:
            return {m: s.summary(now) for m, s in self._stats.items()}

    def cleanup(self, keep_s: float = 3600.0) -> None:
        with self._lock:
            for s in self._stats.values():
                s.cleanup_history(keep_s)
