"""Host memory budgeting: managed (archive, evictable) vs unmanaged bytes.

Reference: memstore/host_memory_manager.go (HostMemoryManager: eviction by
(priority, preloading-zone, batchID), async preload of configured
preloading-days, unmanaged = live store + PK always resident).

Round-1 scope: tracking + threshold-triggered eviction of least-valuable
archive columns; preloading is on-demand (first query load caches).
"""

from __future__ import annotations

import threading
from typing import Dict, Tuple

from aresdb_tpu.utils import clock


class HostMemoryManager:
    def __init__(self, memstore, total_memory_bytes: int = 0):
        self.memstore = memstore
        self.total_memory_bytes = total_memory_bytes  # 0 = unlimited
        self.unmanaged_bytes = 0
        self.managed_bytes = 0
        # (table, shard, batch_id, column_id) -> bytes
        self._objects: Dict[Tuple[str, int, int, int], int] = {}
        self.lock = threading.RLock()

    def report_unmanaged_space_usage_change(self, delta: int) -> None:
        with self.lock:
            self.unmanaged_bytes += delta

    def report_managed_object(self, table: str, shard: int, batch_id: int,
                              column_id: int, nbytes: int) -> None:
        key = (table, shard, batch_id, column_id)
        with self.lock:
            old = self._objects.get(key, 0)
            self._objects[key] = nbytes
            self.managed_bytes += nbytes - old
            if nbytes == 0:
                self._objects.pop(key, None)
        self._try_evict()

    def get_reserved_memory(self) -> int:
        return self.unmanaged_bytes + self.managed_bytes

    def preload_all(self) -> int:
        """Load archive columns inside their configured preloading windows.

        Reference: host_memory_manager.go preloading goroutines — columns
        with preloadingDays stay resident for batches within that many days.
        Returns the number of columns loaded.
        """
        today = int(clock.now_unix() // 86400)
        loaded = 0
        for table, shard_id in self.memstore.list_shards():
            try:
                shard = self.memstore.get_table_shard(table, shard_id)
                schema = shard.schema
            except KeyError:
                continue
            if not schema.table.is_fact_table:
                continue
            version = shard.archive_store.get_current_version()
            for cid, col in enumerate(schema.table.columns):
                days = col.config.preloading_days
                if col.deleted or days <= 0:
                    continue
                for bid, batch in version.batches.items():
                    if (today - bid) < days:
                        if batch.request_column(cid) is not None:
                            loaded += 1
        return loaded

    def _try_evict(self) -> None:
        """Evict archive columns when over budget.

        Eviction order follows the reference policy shape: lowest column
        priority first, then outside-preloading-zone, then oldest batch.
        """
        if self.total_memory_bytes <= 0:
            return
        with self.lock:
            if self.get_reserved_memory() <= self.total_memory_bytes:
                return
            today = int(clock.now_unix() // 86400)
            candidates = []
            for (table, shard, batch_id, column_id), nbytes in self._objects.items():
                try:
                    schema = self.memstore.get_schema(table)
                    col = schema.table.columns[column_id]
                    priority = col.config.priority
                    in_preload = (today - batch_id) < col.config.preloading_days
                except Exception:
                    priority, in_preload = 0, False
                candidates.append(
                    ((priority, 1 if in_preload else 0, batch_id),
                     (table, shard, batch_id, column_id), nbytes))
            candidates.sort(key=lambda c: c[0])
            for _, key, nbytes in candidates:
                if self.get_reserved_memory() <= self.total_memory_bytes:
                    break
                table, shard, batch_id, column_id = key
                try:
                    ts = self.memstore.get_table_shard(table, shard)
                    version = ts.archive_store.get_current_version()
                    batch = version.batches.get(batch_id)
                    if batch is not None:
                        batch.evict_column(column_id)
                except Exception:
                    pass
                self._objects.pop(key, None)
                self.managed_bytes -= nbytes
