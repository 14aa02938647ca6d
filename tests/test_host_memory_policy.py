"""Host-memory eviction policy parity.

Mirrors memstore/host_memory_manager_test.go "Test BatchPriority" /
"Test globalPriorityQueue" (:163-333) — the exact comparator order — and
"Test HostMemoryManager tryEviction" (:543) — budget semantics where
unmanaged bytes count against the total and eviction stops at budget.

Reference comparator (host_memory_manager.go:525 globalPriorityComparator),
lowest evicted first:
  1. outside preloading zone before inside (dominant key)
  2. lower column priority first
  3. older (smaller) batchID first
  4. LARGER size first on full ties
"""

import threading

from aresdb_tpu.common.schema import Table
from aresdb_tpu.memstore.host_memory import HostMemoryManager
from aresdb_tpu.utils import clock

DAY = 86400


class _RecordingBatch:
    def __init__(self, store, table, shard, batch_id):
        self.store = store
        self.table = table
        self.shard = shard
        self.batch_id = batch_id

    def evict_column(self, column_id):
        self.store.evictions.append(
            (self.table, self.shard, self.batch_id, column_id))
        self.store.hmm.report_managed_object(
            self.table, self.shard, self.batch_id, column_id, 0)
        return True


class _Version:
    def __init__(self, batches):
        self.batches = batches


class _ArchiveStore:
    def __init__(self, version):
        self._version = version

    def get_current_version(self):
        return self._version


class _Shard:
    def __init__(self, archive_store):
        self.archive_store = archive_store


class _FakeStore:
    """Just enough MemStore surface for HostMemoryManager eviction."""

    def __init__(self, tables):
        self.schemas = {t.name: _Schema(t) for t in tables}
        self.evictions = []
        self.shards = {}
        self.hmm = None

    def add_shard(self, table, shard, batch_ids):
        batches = {b: _RecordingBatch(self, table, shard, b)
                   for b in batch_ids}
        self.shards[(table, shard)] = _Shard(_ArchiveStore(_Version(batches)))

    def get_schema(self, table):
        return self.schemas[table]

    def get_table_shard(self, table, shard=0):
        return self.shards[(table, shard)]


class _Schema:
    def __init__(self, table):
        self.table = table


def _table(name, col_configs):
    cols = [{"name": "t", "type": "Uint32"}]
    for i, cfg in enumerate(col_configs):
        cols.append({"name": f"c{i+1}", "type": "Uint32", "config": cfg})
    return Table.from_json({
        "name": name,
        "columns": cols,
        "primaryKeyColumns": [0],
        "isFactTable": True,
        "config": {"batchSize": 10},
    })


def test_eviction_order_matches_global_priority_comparator():
    """bp1..bp5 from the reference suite must evict in the exact order
    bp5, bp4, bp2, bp1, bp3 (global priority bp3>bp1>bp2>bp4>bp5)."""
    today = 20000
    clock.set_current_time(today * DAY + 100)
    try:
        recent, old = today - 1, today - 9
        # c1: preloadingDays 5 (recent batch in zone),  priority 0  -> bp1
        # c2: preloadingDays 0 (never in zone),         priority 50 -> bp2/4/5
        # c3: preloadingDays 5 (recent batch in zone),  priority 50 -> bp3
        t = _table("t", [
            {"preloadingDays": 5, "priority": 0},
            {"preloadingDays": 0, "priority": 50},
            {"preloadingDays": 5, "priority": 50},
        ])
        store = _FakeStore([t])
        store.add_shard("t", 0, [recent, old])
        store.add_shard("t", 1, [old])
        hmm = HostMemoryManager(store, total_memory_bytes=10_000)
        store.hmm = hmm

        bp1 = ("t", 0, recent, 1, 100)   # preloading, pri 0
        bp2 = ("t", 0, recent, 2, 100)   # non-preloading, pri 50
        bp3 = ("t", 0, recent, 3, 100)   # preloading, pri 50
        bp4 = ("t", 0, old, 2, 100)      # non-preloading, pri 50, older
        bp5 = ("t", 1, old, 2, 500)      # same but LARGER -> evicts first
        for table, shard, batch, col, size in (bp1, bp2, bp3, bp4, bp5):
            hmm.report_managed_object(table, shard, batch, col, size)

        hmm.total_memory_bytes = 1   # force full eviction
        hmm.trigger_eviction()       # not started -> synchronous

        assert store.evictions == [k[:4] for k in (bp5, bp4, bp2, bp1, bp3)]
        assert hmm.managed_bytes == 0
    finally:
        clock.set_current_time(None)


def test_eviction_stops_at_budget_and_counts_unmanaged():
    """tryEviction test case 1 (:655): budget 1000, unmanaged 300,
    managed 800 (c0, out-of-zone pri 0) + 400 (c1, in-zone pri 10) —
    exactly the c0 object is evicted, then reserved <= budget."""
    today = 20000
    clock.set_current_time(today * DAY + 100)
    try:
        t = _table("myTable", [
            {"preloadingDays": 0, "priority": 0},
            {"preloadingDays": 5, "priority": 10},
        ])
        store = _FakeStore([t])
        b0, b1 = today - 2, today - 1
        store.add_shard("myTable", 0, [b0, b1])
        hmm = HostMemoryManager(store, total_memory_bytes=0)  # no limit yet
        store.hmm = hmm
        hmm.report_unmanaged_space_usage_change(300)

        hmm.report_managed_object("myTable", 0, b0, 1, 800)
        hmm.report_managed_object("myTable", 0, b1, 2, 400)
        assert hmm.managed_bytes == 1200

        hmm.total_memory_bytes = 1000
        hmm.trigger_eviction()
        assert store.evictions == [("myTable", 0, b0, 1)]
        assert hmm.managed_bytes == 400
        assert hmm.get_reserved_memory() == 700
    finally:
        clock.set_current_time(None)


def test_eviction_worker_level_triggered():
    """Started workers coalesce triggers and still evict to budget."""
    today = 20000
    clock.set_current_time(today * DAY + 100)
    try:
        t = _table("w", [{"preloadingDays": 0, "priority": 0}])
        store = _FakeStore([t])
        b = today - 3
        store.add_shard("w", 0, [b])
        hmm = HostMemoryManager(store, total_memory_bytes=100)
        store.hmm = hmm
        hmm.start()
        try:
            hmm.report_managed_object("w", 0, b, 1, 1000)
            done = threading.Event()
            import time
            deadline = time.time() + 10
            while time.time() < deadline:
                if hmm.managed_bytes == 0:
                    done.set()
                    break
                time.sleep(0.02)
            assert done.is_set()
            assert store.evictions == [("w", 0, b, 1)]
        finally:
            hmm.stop()
    finally:
        clock.set_current_time(None)


# ---------------------------------------------------------------------------
# Preload scenarios (reference "Test Preloading" + "tryPreload and
# triggerPreload", host_memory_manager_test.go:119,392) and usage details
# (:901 GetMemoryUsageDetails)
# ---------------------------------------------------------------------------

class _PreloadBatch:
    def __init__(self, store, table, shard, batch_id):
        self.store = store
        self.table = table
        self.shard = shard
        self.batch_id = batch_id

    def request_column(self, cid):
        self.store.loads.append((self.table, self.shard,
                                 self.batch_id, cid))
        return object()


class _LiveStore:
    def __init__(self, nbytes):
        self._b = nbytes

    def bytes_estimate(self):
        return self._b


class _PreloadShard:
    def __init__(self, archive_store, schema, live_bytes=0):
        self.archive_store = archive_store
        self.schema = schema
        self.live_store = _LiveStore(live_bytes)


class _PreloadStore(_FakeStore):
    def __init__(self, tables):
        super().__init__(tables)
        self.loads = []

    def add_preload_shard(self, table, shard, batch_ids, live_bytes=0):
        batches = {b: _PreloadBatch(self, table, shard, b)
                   for b in batch_ids}
        self.shards[(table, shard)] = _PreloadShard(
            _ArchiveStore(_Version(batches)), self.schemas[table],
            live_bytes)

    def list_shards(self):
        return list(self.shards)


def _preload_setup(preloading_days):
    t = _table("trips", [{"preloadingDays": preloading_days,
                          "priority": 1}])
    store = _PreloadStore([t])
    today = int(clock.now_unix() // DAY)
    # batch ids ARE day numbers: today-1 .. today-6
    store.add_preload_shard("trips", 0,
                            [today - d for d in range(1, 7)])
    hmm = HostMemoryManager(store, total_memory_bytes=1 << 20)
    store.hmm = hmm
    return store, hmm, today


def test_preload_all_loads_only_preloading_window():
    store, hmm, today = _preload_setup(preloading_days=3)
    loaded = hmm.preload_all()
    # only batches with age < 3 days load, and only the configured column
    ages = sorted(today - b for (_, _, b, _) in store.loads)
    assert ages == [1, 2] and loaded == len(store.loads)
    assert {c for (_, _, _, c) in store.loads} == {1}


def test_handle_table_update_preloads_only_new_window_part():
    """Growing preloadingDays loads ONLY the [old, new) slice — the old
    part is already resident or was evicted on purpose
    (host_memory_manager.go:371 handleColumnPreloadingDaysChange)."""
    store, hmm, today = _preload_setup(preloading_days=2)
    old_table = store.schemas["trips"].table
    new_json = {
        "name": "trips",
        "columns": [{"name": "t", "type": "Uint32"},
                    {"name": "c1", "type": "Uint32",
                     "config": {"preloadingDays": 5, "priority": 1}}],
        "primaryKeyColumns": [0], "isFactTable": True,
        "config": {"batchSize": 10},
    }
    new_table = Table.from_json(new_json)
    hmm.handle_table_update(old_table, new_table)
    hmm._drain_preload_queue()
    ages = sorted(today - b for (_, _, b, _) in store.loads)
    assert ages == [2, 3, 4]  # [old_days, new_days) slice only


def test_memory_usage_details_split():
    store, hmm, today = _preload_setup(preloading_days=3)
    # one batch inside the preload zone, one outside, plus live bytes
    hmm.report_managed_object("trips", 0, today - 1, 1, 1000)
    hmm.report_managed_object("trips", 0, today - 5, 1, 300)
    store.shards[("trips", 0)].live_store._b = 77
    usage = hmm.get_archive_memory_usage_by_table_shard()
    cu = usage["trips"]["trips_0"]["c1"]
    assert cu["preloaded"] == 1000 and cu["nonPreloaded"] == 300
    assert usage["trips"]["trips_0"]["__live__"]["live"] == 77
