"""Shared memstore primitives: RecordID, batch id conventions.

Reference: memstore/common/primary_key.go:36 (RecordID),
memstore/live_store.go:30 (BaseBatchID), memstore/archive_store.go
(archive batch id = days since epoch).
"""

from __future__ import annotations

from typing import NamedTuple

# Live batch ids count up from the most negative int32, so that all live
# batch ids are strictly smaller than any archive batch id (days since epoch).
BASE_BATCH_ID = -(2**31)

SECONDS_PER_DAY = 86400


class RecordID(NamedTuple):
    batch_id: int
    index: int


def archive_batch_id_for_time(event_time: int) -> int:
    """Archive batch id for an event timestamp: UTC days since epoch."""
    return int(event_time) // SECONDS_PER_DAY


def archive_batch_time_range(batch_id: int) -> tuple[int, int]:
    return batch_id * SECONDS_PER_DAY, (batch_id + 1) * SECONDS_PER_DAY


class BootstrapToken:
    """Per-(table, shard) exclusion between data jobs and peer copies.

    Reference: memstore/common/types.go:23 BootStrapToken (implemented by
    the bootstrap server, datanode/bootstrap/bootstrap_server.go:88) —
    archiving/backfill/snapshot/purge must not run while a peer is
    streaming the shard's files, and vice versa.
    """

    def __init__(self):
        import threading

        self._locks = {}
        self._guard = threading.Lock()

    def _lock(self, table: str, shard: int):
        with self._guard:
            return self._locks.setdefault((table, shard),
                                          __import__("threading").RLock())

    def acquire(self, table: str, shard: int, blocking: bool = True) -> bool:
        return self._lock(table, shard).acquire(blocking=blocking)

    def release(self, table: str, shard: int) -> None:
        self._lock(table, shard).release()


GLOBAL_BOOTSTRAP_TOKEN = BootstrapToken()
