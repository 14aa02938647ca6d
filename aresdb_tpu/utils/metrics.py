"""Metrics registry: counters / gauges / timers with scoped reporters.

Reference: utils/metrics.go (~110-metric tally catalog with per-(table,shard)
scoped reporters, :25-140 and :1113-1251) and common/metrics.go (pluggable
reporter interface). This implementation is dependency-free; the catalog
keeps the reference's metric names so dashboards port over.
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict
from typing import Dict, Optional, Tuple

# Catalog of metric names mirrored from the reference (utils/metrics.go).
QUERY_LATENCY = "query.latency"
QUERY_WAIT_FOR_MEMORY = "query.wait_for_memory.duration"
QUERY_RECEIVED = "query.received"
QUERY_SUCCEEDED = "query.succeeded"
QUERY_FAILED = "query.failed"
QUERY_ROWS_RETURNED = "query.rows_returned"
QUERY_LIVE_RECORDS_PROCESSED = "query.live_records_processed"
QUERY_ARCHIVE_RECORDS_PROCESSED = "query.archive_records_processed"
QUERY_LIVE_BATCH_PROCESSED = "query.live_batch_processed"
QUERY_ARCHIVE_BATCH_PROCESSED = "query.archive_batch_processed"
QUERY_LIVE_BYTES_TRANSFERRED = "query.live_bytes_transferred"
QUERY_ARCHIVE_BYTES_TRANSFERRED = "query.archive_bytes_transferred"
INGESTED_UPSERT_BATCHES = "ingestion.ingested_upsert_batches"
INGESTED_RECORDS = "ingestion.ingested_records"
APPENDED_RECORDS = "ingestion.appended_records"
UPDATED_RECORDS = "ingestion.updated_records"
INGESTION_LAG_PER_COLUMN = "ingestion.lag_per_column"
UPSERT_BATCH_SIZE = "ingestion.upsert_batch_size"
PRIMARY_KEY_MISSING = "ingestion.primary_key_missing"
TIME_COLUMN_MISSING = "ingestion.time_column_missing"
BACKFILL_RECORDS = "ingestion.backfill_records"
BACKFILL_AFFECTED_DAYS = "backfill.affected_days"
BACKFILL_NEW_RECORDS = "backfill.new_records"
BACKFILL_INPLACE_UPDATE_RECORDS = "backfill.inplace_update_records"
ARCHIVING_RECORDS = "archiving.records"
ARCHIVING_HIGH_WATERMARK = "archiving.high_watermark"
ARCHIVING_IGNORED_RECORDS = "archiving.ignored_records"
SNAPSHOT_TIMING_TOTAL = "snapshot.timing.total"
RECOVERY_LATENCY = "recovery.latency"
REDO_LOG_FILE_CORRUPT = "redolog.corrupt"
ALLOCATED_DEVICE_MEMORY = "memory.allocated_device_memory"
ESTIMATED_DEVICE_MEMORY = "memory.estimated_device_memory"
TOTAL_MEMORY_SIZE = "memory.total_size"
MANAGED_MEMORY_SIZE = "memory.managed_size"
UNMANAGED_MEMORY_SIZE = "memory.unmanaged_size"
PRELOADING_ZONE_EVICTED = "memory.preloading_zone_evicted"
HTTP_HANDLER_LATENCY = "http.handler.latency"
HTTP_HANDLER_CALLS = "http.handler.calls"
SCHEMA_FETCH_SUCCESS = "schema_fetch.success"
SCHEMA_FETCH_FAILURE = "schema_fetch.failure"
DATANODE_QUERY_SENT = "datanode.query.sent"
DATANODE_QUERY_FAILED = "datanode.query.failed"


class _Timer:
    def __init__(self, registry: "MetricsRegistry", name: str, tags):
        self.registry = registry
        self.name = name
        self.tags = tags
        self._start = 0.0

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.registry.record_timer(
            self.name, time.perf_counter() - self._start, self.tags)


class MetricsRegistry:
    """Thread-safe in-process metrics store with optional reporter hook."""

    def __init__(self):
        self.lock = threading.Lock()
        self.counters: Dict[Tuple, float] = defaultdict(float)
        self.gauges: Dict[Tuple, float] = {}
        self.timers: Dict[Tuple, list] = defaultdict(
            lambda: [0, 0.0, float("inf"), 0.0])  # count, sum, min, max
        self.reporter = None  # optional callable(kind, name, value, tags)

    @staticmethod
    def _key(name: str, tags: Optional[dict]):
        return (name, tuple(sorted((tags or {}).items())))

    def count(self, name: str, delta: float = 1, tags: Optional[dict] = None):
        with self.lock:
            self.counters[self._key(name, tags)] += delta
        if self.reporter:
            self.reporter("counter", name, delta, tags)

    def gauge(self, name: str, value: float, tags: Optional[dict] = None):
        with self.lock:
            self.gauges[self._key(name, tags)] = value
        if self.reporter:
            self.reporter("gauge", name, value, tags)

    def record_timer(self, name: str, seconds: float,
                     tags: Optional[dict] = None):
        with self.lock:
            t = self.timers[self._key(name, tags)]
            t[0] += 1
            t[1] += seconds
            t[2] = min(t[2], seconds)
            t[3] = max(t[3], seconds)
        if self.reporter:
            self.reporter("timer", name, seconds, tags)

    def timer(self, name: str, tags: Optional[dict] = None) -> _Timer:
        return _Timer(self, name, tags)

    def scoped(self, **tags) -> "ScopedReporter":
        """Per-(table, shard) reporter (reference TableShardReporter)."""
        return ScopedReporter(self, tags)

    def snapshot(self) -> dict:
        with self.lock:
            out = {"counters": {}, "gauges": {}, "timers": {}}
            for (name, tags), v in self.counters.items():
                out["counters"][_fmt(name, tags)] = v
            for (name, tags), v in self.gauges.items():
                out["gauges"][_fmt(name, tags)] = v
            for (name, tags), (cnt, total, mn, mx) in self.timers.items():
                out["timers"][_fmt(name, tags)] = {
                    "count": cnt, "sum": total,
                    "min": mn if cnt else 0, "max": mx,
                    "avg": total / cnt if cnt else 0,
                }
            return out


def _fmt(name, tags):
    if not tags:
        return name
    return name + "{" + ",".join(f"{k}={v}" for k, v in tags) + "}"


class ScopedReporter:
    def __init__(self, registry: MetricsRegistry, tags: dict):
        self.registry = registry
        self.tags = tags

    def count(self, name, delta=1):
        self.registry.count(name, delta, self.tags)

    def gauge(self, name, value):
        self.registry.gauge(name, value, self.tags)

    def timer(self, name):
        return self.registry.timer(name, self.tags)


_ROOT = MetricsRegistry()


def root() -> MetricsRegistry:
    return _ROOT
