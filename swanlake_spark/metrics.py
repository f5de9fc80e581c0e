"""Engine metrics: totals, latency percentiles, slow-query log.

Re-expresses the reference's metrics surface
(``/root/reference/swanlake-core/src/metrics.rs:133-420``): total/error
counters, a bounded ring buffer of latencies with p50/p95/p99, and a
slow-query log with the query text.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from dataclasses import dataclass, field


@dataclass
class Snapshot:
    total_queries: int
    total_errors: int
    in_flight: int
    p50_ms: float
    p95_ms: float
    p99_ms: float
    slow_queries: list[dict]
    recent_errors: int


class Metrics:
    RING_SIZE = 1024
    SLOW_LOG_SIZE = 32

    def __init__(self, slow_threshold_s: float = 1.0) -> None:
        self._lock = threading.Lock()
        self._latencies: deque[float] = deque(maxlen=self.RING_SIZE)
        self._slow: deque[dict] = deque(maxlen=self.SLOW_LOG_SIZE)
        self._total = 0
        self._errors = 0
        self._in_flight = 0
        self.slow_threshold_s = slow_threshold_s

    def record_query(self, elapsed_s: float, sql: str = "") -> None:
        with self._lock:
            self._total += 1
            self._latencies.append(elapsed_s)
            if elapsed_s >= self.slow_threshold_s:
                self._slow.append(
                    {"sql": sql[:500], "elapsed_s": elapsed_s, "at": time.time()}
                )

    def record_error(self) -> None:
        with self._lock:
            self._errors += 1

    def _pct(self, sorted_lat: list[float], q: float) -> float:
        if not sorted_lat:
            return 0.0
        idx = min(len(sorted_lat) - 1, int(q * len(sorted_lat)))
        return sorted_lat[idx] * 1000.0

    def snapshot(self) -> Snapshot:
        with self._lock:
            lat = sorted(self._latencies)
            return Snapshot(
                total_queries=self._total,
                total_errors=self._errors,
                in_flight=self._in_flight,
                p50_ms=self._pct(lat, 0.50),
                p95_ms=self._pct(lat, 0.95),
                p99_ms=self._pct(lat, 0.99),
                slow_queries=list(self._slow),
                recent_errors=self._errors,
            )
