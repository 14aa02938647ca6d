"""Archiving / backfill / snapshot / purge pipeline tests.

Parity targets: memstore/archiving_test.go, backfill_test.go,
snapshot_test.go, purge_test.go behaviors (table-driven golden merges).
"""

import numpy as np
import pytest

from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common.schema import Table, TableSchema
from aresdb_tpu.common.upsert_batch import UpsertBatch, UpsertBatchBuilder
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.archiving import Archiver
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.memstore.scheduler import Scheduler
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore
from aresdb_tpu.query.service import QueryService
from aresdb_tpu.utils import clock

DAY = 86400

FACT = {
    "name": "trips",
    "columns": [
        {"name": "request_at", "type": "Uint32"},
        {"name": "id", "type": "Uint32"},
        {"name": "city_id", "type": "Uint16"},
        {"name": "fare", "type": "Float32"},
    ],
    "primaryKeyColumns": [1],
    "archivingSortColumns": [2],
    "isFactTable": True,
    "config": {"batchSize": 16, "recordRetentionInDays": 0},
}

DIM = {
    "name": "cities",
    "columns": [
        {"name": "id", "type": "Uint16"},
        {"name": "population", "type": "Uint32"},
    ],
    "primaryKeyColumns": [0],
    "isFactTable": False,
    "config": {"batchSize": 8},
}


def make_memstore(tmp_root):
    ms = MemStore(DiskMetaStore(tmp_root), LocalDiskStore(tmp_root))
    ms.create_table(Table.from_json(FACT))
    ms.create_table(Table.from_json(DIM))
    ms.init_shards()
    return ms


def fact_batch(rows):
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint32)
    b.add_column(1, dt.Uint32)
    b.add_column(2, dt.Uint16)
    b.add_column(3, dt.Float32)
    for i, row in enumerate(rows):
        b.add_row()
        for c, v in enumerate(row):
            if v is not None:
                b.set_value(i, c, v)
    return UpsertBatch(b.to_bytes())


BASE_T = 1_600_000_000 - (1_600_000_000 % DAY)  # day-aligned


def test_archive_moves_rows_and_queries_stay_correct(tmp_root):
    ms = make_memstore(tmp_root)
    shard = ms.get_table_shard("trips")
    rows = [
        (BASE_T + 100, 1, 7, 1.0),
        (BASE_T + 200, 2, 5, 2.0),
        (BASE_T + DAY + 100, 3, 7, 4.0),
        (BASE_T + DAY + 200, 4, 5, 8.0),
        (BASE_T + 2 * DAY + 100, 5, 7, 16.0),
    ]
    shard.save_upsert_batch(fact_batch(rows))

    svc = QueryService(ms)
    q = {"table": "trips",
         "measures": [{"sqlExpression": "sum(fare)"}],
         "dimensions": [{"sqlExpression": "city_id"}],
         "now": BASE_T + 3 * DAY}
    before = svc.handle_aql({"queries": [q]})["results"][0]
    assert before == {"7": 21.0, "5": 10.0}

    # archive the first two days
    arch = Archiver(shard, ms.metastore, ms.diskstore)
    stats = arch.archive(BASE_T + 2 * DAY)
    assert stats.rows_archived == 4
    assert stats.days == 2
    assert shard.live_store.archiving_cutoff_high_watermark == BASE_T + 2 * DAY

    # queries must return identical results (live+archive, no double count)
    after = svc.handle_aql({"queries": [q]})["results"][0]
    assert after == before

    # archived batches are sorted by city and mode-3 compressed
    version = shard.archive_store.get_current_version()
    day0 = version.batches[BASE_T // DAY]
    city_vp = day0.request_column(2)
    assert city_vp.is_compressed
    assert list(city_vp.values) == [5, 7]
    assert list(city_vp.counts) == [0, 1, 2]


def test_archive_persists_and_recovers(tmp_root):
    ms = make_memstore(tmp_root)
    shard = ms.get_table_shard("trips")
    shard.save_upsert_batch(fact_batch([
        (BASE_T + 100, 1, 7, 1.0),
        (BASE_T + DAY + 100, 2, 5, 2.0),
    ]))
    Archiver(shard, ms.metastore, ms.diskstore).archive(BASE_T + 2 * DAY)

    # cold restart from disk
    ms2 = MemStore(DiskMetaStore(tmp_root), LocalDiskStore(tmp_root))
    ms2.fetch_schema()
    ms2.init_shards()
    shard2 = ms2.get_table_shard("trips")
    assert shard2.live_store.archiving_cutoff_high_watermark == BASE_T + 2 * DAY
    svc = QueryService(ms2)
    r = svc.handle_aql({"queries": [{
        "table": "trips",
        "measures": [{"sqlExpression": "sum(fare)"}],
        "dimensions": [{"sqlExpression": "city_id"}],
        "now": BASE_T + 3 * DAY}]})["results"][0]
    assert r == {"7": 1.0, "5": 2.0}


def test_second_archive_merges_into_existing_batch(tmp_root):
    ms = make_memstore(tmp_root)
    shard = ms.get_table_shard("trips")
    shard.save_upsert_batch(fact_batch([(BASE_T + 100, 1, 7, 1.0)]))
    arch = Archiver(shard, ms.metastore, ms.diskstore)
    arch.archive(BASE_T + DAY // 2)
    # second wave, same day, later cutoff
    shard.save_upsert_batch(fact_batch([(BASE_T + DAY // 2 + 10, 2, 5, 2.0)]))
    arch.archive(BASE_T + DAY)
    version = shard.archive_store.get_current_version()
    day0 = version.batches[BASE_T // DAY]
    assert day0.size == 2
    city_vp = day0.request_column(2)
    assert list(city_vp.values) == [5, 7]


def test_backfill_updates_archived_day(tmp_root):
    ms = make_memstore(tmp_root)
    shard = ms.get_table_shard("trips")
    shard.save_upsert_batch(fact_batch([
        (BASE_T + 100, 1, 7, 1.0),
        (BASE_T + 200, 2, 5, 2.0),
    ]))
    arch = Archiver(shard, ms.metastore, ms.diskstore)
    arch.archive(BASE_T + DAY)

    # late rows: one updates id=1 (fare 1.0 -> 10.0), one new id=9
    stats = shard.save_upsert_batch(fact_batch([
        (BASE_T + 150, 1, 7, 10.0),
        (BASE_T + 160, 9, 9, 5.0),
    ]))
    assert stats.backfilled == 2
    applied = arch.backfill()
    assert applied == 2

    svc = QueryService(ms)
    r = svc.handle_aql({"queries": [{
        "table": "trips",
        "measures": [{"sqlExpression": "sum(fare)"}],
        "dimensions": [{"sqlExpression": "city_id"}],
        "now": BASE_T + 2 * DAY}]})["results"][0]
    assert r == {"7": 10.0, "5": 2.0, "9": 5.0}


def test_snapshot_and_recover_dimension_table(tmp_root):
    ms = make_memstore(tmp_root)
    shard = ms.get_table_shard("cities")
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint16)
    b.add_column(1, dt.Uint32)
    for i, (cid, pop) in enumerate([(1, 100), (2, 200), (3, 300)]):
        b.add_row()
        b.set_value(i, 0, cid)
        b.set_value(i, 1, pop)
    shard.save_upsert_batch(UpsertBatch(b.to_bytes()))

    arch = Archiver(shard, ms.metastore, ms.diskstore)
    rows = arch.snapshot()
    assert rows == 3

    # wipe redologs to prove recovery comes from the snapshot
    for f in ms.diskstore.list_logs("cities", 0):
        ms.diskstore.delete_log("cities", 0, f)

    ms2 = MemStore(DiskMetaStore(tmp_root), LocalDiskStore(tmp_root))
    ms2.fetch_schema()
    ms2.init_shards()
    shard2 = ms2.get_table_shard("cities")
    assert shard2.live_store.rows_visible() == 3
    assert len(shard2.live_store.primary_key) == 3


def test_purge_drops_out_of_retention_batches(tmp_root):
    ms = make_memstore(tmp_root)
    shard = ms.get_table_shard("trips")
    now = BASE_T + 10 * DAY
    clock.set_current_time(now)
    try:
        # ingest with retention off so the old row lands, then archive
        shard.save_upsert_batch(fact_batch([
            (BASE_T + 100, 1, 7, 1.0),          # day 0 — beyond retention
            (now - DAY + 100, 2, 5, 2.0),       # recent
        ]))
        arch = Archiver(shard, ms.metastore, ms.diskstore)
        arch.archive(now - DAY // 2)
        shard.schema.table.config.record_retention_in_days = 2
        purged = arch.purge(now)
        assert purged >= 1
        version = shard.archive_store.get_current_version()
        assert BASE_T // DAY not in version.batches
    finally:
        clock.reset_clock()


def test_scheduler_runs_jobs(tmp_root):
    ms = make_memstore(tmp_root)
    shard = ms.get_table_shard("trips")
    now = BASE_T + 3 * DAY
    shard.save_upsert_batch(fact_batch([(BASE_T + 100, 1, 7, 1.0)]))
    sched = Scheduler(ms)
    shard.schema.table.config.archiving_delay_minutes = DAY // 60
    result = sched.run_job("trips", 0, "archiving", now=now)
    assert result["rowsArchived"] == 1
    statuses = sched.job_statuses()
    assert statuses["trips/0/archiving"]["numRuns"] == 1
    ran = sched.run_due_jobs(now=now + 10)
    assert ("trips", 0, "backfill") in ran


def test_prefilter_slicing_on_sorted_archive_batches(tmp_root):
    """Equality prefilter on the archiving sort column binary-search-slices
    sorted archive batches (reference: aql_compiler.go matchPrefilters)."""
    from aresdb_tpu.query.aql import AQLQuery
    from aresdb_tpu.query.compiler import Compiler
    from aresdb_tpu.query.executor import ShardExecutor
    from aresdb_tpu.query.postprocess import build_agg_result

    ms = make_memstore(tmp_root)
    shard = ms.get_table_shard("trips")
    rng = np.random.RandomState(7)
    n = 400
    cities = rng.randint(0, 20, n)
    rows = [(BASE_T + int(i % DAY), 1000 + i, int(cities[i]),
             float(i) if i % 10 else None) for i in range(n)]
    shard.save_upsert_batch(fact_batch(rows))
    Archiver(shard, ms.metastore, ms.diskstore).archive(BASE_T + DAY)

    q = {"table": "trips",
         "measures": [{"sqlExpression": "sum(fare)"}],
         "rowFilters": ["city_id = 7"],
         "now": BASE_T + 2 * DAY}
    compiler = Compiler(ms.get_schemas())
    plan = compiler.compile(AQLQuery.from_json(q))
    assert plan.prefilters == [(2, "=", 7)]
    table, rows_out = ShardExecutor(ms).execute(plan)
    got = build_agg_result(plan, table)[""]

    expected = sum(float(i) for i in range(n)
                   if cities[i] == 7 and i % 10)
    assert got == pytest.approx(expected)
    # the slice actually skipped the non-matching sorted rows
    in_city = int((cities == 7).sum())
    assert plan.stats["prefilterRowsSkipped"] == n - in_city

    # range prefilter parity: no equality, first sort col gets the range
    q2 = {"table": "trips",
          "measures": [{"sqlExpression": "count(*)"}],
          "rowFilters": ["city_id >= 15"],
          "now": BASE_T + 2 * DAY}
    plan2 = compiler.compile(AQLQuery.from_json(q2))
    assert plan2.prefilters == [(2, ">=", 15)]
    table2, _ = ShardExecutor(ms).execute(plan2)
    got2 = build_agg_result(plan2, table2)[""]
    assert got2 == float((cities >= 15).sum())
    assert plan2.stats["prefilterRowsSkipped"] == int((cities < 15).sum())


def test_startup_preloads_archive_columns_in_window(tmp_root):
    """Columns with preloadingDays become host-resident after recovery
    (reference: host_memory_manager.go startup preloading goroutines)."""
    import copy
    import time as _t

    FACT_PRE = copy.deepcopy(FACT)
    FACT_PRE["columns"][3]["config"] = {"preloadingDays": 30}
    ms = MemStore(DiskMetaStore(tmp_root), LocalDiskStore(tmp_root))
    ms.create_table(Table.from_json(FACT_PRE))
    ms.init_shards()
    shard = ms.get_table_shard("trips")
    shard.save_upsert_batch(fact_batch([
        (BASE_T + 100, 1, 7, 1.0),
        (BASE_T + 200, 2, 5, 2.0)]))
    Archiver(shard, ms.metastore, ms.diskstore).archive(BASE_T + DAY)

    clock.set_current_time(BASE_T + 2 * DAY)
    try:
        ms2 = MemStore(DiskMetaStore(tmp_root), LocalDiskStore(tmp_root))
        ms2.fetch_schema()
        ms2.init_shards()
        batch = ms2.get_table_shard("trips").archive_store \
            .get_current_version().batches[BASE_T // DAY]
        deadline = _t.time() + 10
        while 3 not in batch.columns and _t.time() < deadline:
            _t.sleep(0.05)
        assert 3 in batch.columns and batch.columns[3] is not None
        # non-preloading column stays lazy
        assert 2 not in batch.columns
    finally:
        clock.reset_clock()


def test_config_change_triggers_preload(tmp_root):
    """Growing a column's preloadingDays after the fact loads its archive
    batches asynchronously (reference: host_memory_manager.go:245
    TriggerPreload via the schema-change watcher)."""
    import copy
    import time as _t

    ms0 = make_memstore(tmp_root)
    shard0 = ms0.get_table_shard("trips")
    shard0.save_upsert_batch(fact_batch([
        (BASE_T + 100, 1, 7, 1.0),
        (BASE_T + 200, 2, 5, 2.0)]))
    Archiver(shard0, ms0.metastore, ms0.diskstore).archive(BASE_T + DAY)

    clock.set_current_time(BASE_T + 2 * DAY)
    try:
        # fresh memstore: archive columns start lazy (disk-backed)
        ms = MemStore(DiskMetaStore(tmp_root), LocalDiskStore(tmp_root))
        ms.fetch_schema()
        ms.init_shards()
        batch = ms.get_table_shard("trips").archive_store \
            .get_current_version().batches[BASE_T // DAY]
        assert batch.columns.get(3) is None

        updated = copy.deepcopy(FACT)
        updated["columns"][3]["config"] = {"preloadingDays": 30}
        ms.metastore.update_table(Table.from_json(updated))
        ms.fetch_schema()  # diffs configs -> trigger_preload(fare)
        deadline = _t.time() + 10
        while batch.columns.get(3) is None and _t.time() < deadline:
            _t.sleep(0.05)
        assert batch.columns.get(3) is not None
        # city_id's config did not change: still lazy
        assert batch.columns.get(2) is None
    finally:
        clock.reset_clock()


def test_archive_memory_usage_report(tmp_root):
    """get_archive_memory_usage_by_table_shard groups bytes per
    table.shard -> column -> preloaded/nonPreloaded/live (reference:
    host_memory_manager.go:271)."""
    ms = make_memstore(tmp_root)
    shard = ms.get_table_shard("trips")
    shard.save_upsert_batch(fact_batch([
        (BASE_T + 100, 1, 7, 1.0),
        (BASE_T + 200, 2, 5, 2.0),
        (BASE_T + DAY + 50, 3, 9, 3.0)]))  # stays live (within cutoff day)
    Archiver(shard, ms.metastore, ms.diskstore).archive(BASE_T + DAY)
    # force-load an archive column through the query lazy-load path
    batch = shard.archive_store.get_current_version().batches[BASE_T // DAY]
    assert batch.request_column(3) is not None

    usage = ms.host_memory_manager.get_archive_memory_usage_by_table_shard()
    cols = usage["trips"]["trips_0"]
    assert cols["fare"]["nonPreloaded"] > 0
    assert cols["fare"]["preloaded"] == 0
    assert cols["__live__"]["live"] > 0


def test_eviction_respects_budget_and_policy(tmp_root):
    """Over-budget archive columns are evicted lowest-priority /
    outside-preloading-zone / oldest-batch first, and accounting stays
    balanced (reference: host_memory_manager.go:406 globalPriorityComparator
    + eviction goroutine)."""
    import copy
    import time as _t

    FACT_P = copy.deepcopy(FACT)
    FACT_P["columns"][3]["config"] = {"preloadingDays": 30, "priority": 5}
    ms = MemStore(DiskMetaStore(tmp_root), LocalDiskStore(tmp_root))
    ms.create_table(Table.from_json(FACT_P))
    ms.init_shards()
    shard = ms.get_table_shard("trips")
    shard.save_upsert_batch(fact_batch([
        (BASE_T + 100, 1, 7, 1.0),
        (BASE_T + DAY + 100, 2, 5, 2.0),
        (BASE_T + 2 * DAY + 100, 3, 9, 3.0)]))
    clock.set_current_time(BASE_T + 3 * DAY)
    try:
        Archiver(shard, ms.metastore, ms.diskstore).archive(BASE_T + 2 * DAY)
        hmm = ms.host_memory_manager
        batches = shard.archive_store.get_current_version().batches
        assert hmm.managed_bytes > 0  # archiving reported residency

        # accounting matches reality
        total = sum(vp.bytes_estimate()
                    for b in batches.values()
                    for vp in b.columns.values() if vp is not None)
        assert hmm.managed_bytes == total

        # budget below managed: must evict something, oldest batch's
        # low-priority columns first; high-priority preloading 'fare' last
        oldest = batches[BASE_T // DAY]
        target = hmm.unmanaged_bytes + hmm.managed_bytes \
            - oldest.columns[2].bytes_estimate()
        hmm.total_memory_bytes = target
        hmm.trigger_eviction()
        deadline = _t.time() + 10
        while hmm.get_reserved_memory() > target and _t.time() < deadline:
            _t.sleep(0.05)
        assert hmm.get_reserved_memory() <= target
        # fare (priority 5, preloading) survived everywhere
        assert all(3 in b.columns and b.columns[3] is not None
                   for b in batches.values())
        # something from the oldest batch went first
        assert any(cid not in oldest.columns for cid in (0, 1, 2))
        # accounting still balances after eviction
        total = sum(vp.bytes_estimate()
                    for b in batches.values()
                    for vp in b.columns.values() if vp is not None)
        assert hmm.managed_bytes == total
    finally:
        clock.reset_clock()


def test_archive_preserves_array_columns(tmp_root):
    """Regression: archiving used to silently null out array columns (the
    live list VP keeps data in list_values, which _gather_live_columns
    ignored). Reference archives arrays like any column
    (memstore/archiving_test.go asserts the merged array column)."""
    from aresdb_tpu.memstore.memstore import MemStore
    from aresdb_tpu.metastore.disk_metastore import DiskMetaStore
    from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore

    schema = {
        "name": "arr_fact",
        "columns": [
            {"name": "request_at", "type": "Uint32"},
            {"name": "id", "type": "Uint32"},
            {"name": "tags", "type": "Int16[]"},
        ],
        "primaryKeyColumns": [1],
        "archivingSortColumns": [1],
        "isFactTable": True,
        "config": {"batchSize": 16, "recordRetentionInDays": 0},
    }
    ms = MemStore(DiskMetaStore(tmp_root), LocalDiskStore(tmp_root))
    ms.create_table(Table.from_json(schema))
    ms.init_shards()
    shard = ms.get_table_shard("arr_fact")

    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint32)
    b.add_column(1, dt.Uint32)
    b.add_column(2, dt.data_type_from_string("Int16[]"))
    expected = {0: [1, 2, 3], 1: [11], 2: None}
    for i in range(3):
        b.add_row()
        b.set_value(i, 0, 100 + i)
        b.set_value(i, 1, i)
        b.set_value(i, 2, expected[i])
    shard.save_upsert_batch(UpsertBatch(b.to_bytes()))

    Archiver(shard, ms.metastore, ms.diskstore).archive(DAY)
    batch = shard.archive_store.get_current_version().batches[0]
    vp = batch.request_column(2).expanded()
    assert vp.is_list
    ids = np.asarray(batch.request_column(1).expanded().values)
    got = {int(ids[r]): vp.read_value(r) for r in range(3)}
    assert got == expected


def test_snapshot_and_recover_array_columns(tmp_root):
    """Dimension snapshot + recovery preserves array columns (list VPs),
    including null items and whole-null arrays — companion to the archive
    array regression above (reference snapshot_test.go writes every live
    VP through the serializer)."""
    from aresdb_tpu.memstore.memstore import MemStore
    from aresdb_tpu.metastore.disk_metastore import DiskMetaStore
    from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore

    schema = {
        "name": "dims_arr",
        "columns": [
            {"name": "id", "type": "Uint32"},
            {"name": "tags", "type": "Int16[]"},
        ],
        "primaryKeyColumns": [0],
        "isFactTable": False,
        "config": {"batchSize": 16},
    }
    ms = MemStore(DiskMetaStore(tmp_root), LocalDiskStore(tmp_root))
    ms.create_table(Table.from_json(schema))
    ms.init_shards()
    shard = ms.get_table_shard("dims_arr")

    expected = {1: [1, None, 3], 2: None, 3: [30]}
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint32)
    b.add_column(1, dt.data_type_from_string("Int16[]"))
    for i, (rid, tags) in enumerate(expected.items()):
        b.add_row()
        b.set_value(i, 0, rid)
        b.set_value(i, 1, tags)
    shard.save_upsert_batch(UpsertBatch(b.to_bytes()))

    arch = Archiver(shard, ms.metastore, ms.diskstore)
    assert arch.snapshot() == 3
    for f in ms.diskstore.list_logs("dims_arr", 0):
        ms.diskstore.delete_log("dims_arr", 0, f)

    ms2 = MemStore(DiskMetaStore(tmp_root), LocalDiskStore(tmp_root))
    ms2.fetch_schema()
    ms2.init_shards()
    shard2 = ms2.get_table_shard("dims_arr")
    assert shard2.live_store.rows_visible() == 3
    pk = shard2.live_store.primary_key
    for rid, tags in expected.items():
        rec = pk.find(np.array([rid], np.uint32).tobytes())
        assert rec is not None
        got = shard2.read_value(rec, 1)
        assert got == tags, (rid, got, tags)


def test_archive_job_readiness_from_persisted_cutoff(tmp_root):
    """Archive jobs are ready iff now - delay > currentCutoff + interval
    (job_manager.go:66-83 generateJobs) — restart-proof: a freshly archived
    shard is NOT re-archived by a new scheduler until the interval passes."""
    from aresdb_tpu.memstore.scheduler import Scheduler

    ms = MemStore(DiskMetaStore(tmp_root), LocalDiskStore(tmp_root))
    t = Table.from_json(FACT)
    t.config.archiving_delay_minutes = 10       # 600s
    t.config.archiving_interval_minutes = 10    # 600s
    ms.create_table(t)
    ms.init_shards()
    shard = ms.get_table_shard("trips")

    now = BASE_T + 10 * DAY
    clock.set_current_time(now)
    try:
        sched = Scheduler(ms)
        # fresh shard (cutoff 0): ready immediately
        ran = sched.run_due_jobs(now)
        assert ("trips", 0, "archiving") in ran
        cutoff = shard.archive_store.get_current_version().archiving_cutoff
        assert cutoff == now - 600

        # a NEW scheduler (simulating restart) sees the persisted cutoff
        # and waits: now - delay == cutoff < cutoff + interval
        sched2 = Scheduler(ms)
        ran = sched2.run_due_jobs(now)
        assert ("trips", 0, "archiving") not in ran

        # after delay + interval it becomes ready again
        ran = sched2.run_due_jobs(now + 601)
        assert ("trips", 0, "archiving") in ran
    finally:
        clock.set_current_time(None)


def test_unmatched_time_filter_does_not_prune_archive_days(tmp_root):
    """A timeFilter on a NON-event-time column is an 'unmatched' time
    filter (reference processTimeFilter, aql_compiler_test.go:1206): it
    filters rows but must not day-range-prune archive batches. Regression:
    the executor used to skip archive days outside [from, to) regardless
    of which column the time filter targeted."""
    ms = make_memstore(tmp_root)
    shard = ms.get_table_shard("trips")
    # id values are timestamp-scale but ~100 days after the event times,
    # so day-pruning by the id range would skip every archive batch
    idbase = BASE_T + 100 * DAY
    rows = [
        (BASE_T + 100, idbase + 50, 7, 1.0),
        (BASE_T + DAY + 100, idbase + 60, 7, 2.0),
        (BASE_T + 2 * DAY + 100, idbase + 70, 7, 4.0),   # stays live
    ]
    shard.save_upsert_batch(fact_batch(rows))
    Archiver(shard, ms.metastore, ms.diskstore).archive(BASE_T + 2 * DAY)

    svc = QueryService(ms)
    # filter on `id` (column 1) via timeFilter: range [40, 100) covers all
    # ids but, as unix timestamps, NO archive day of this data
    q = {"table": "trips",
         "measures": [{"sqlExpression": "sum(fare)"}],
         "dimensions": [{"sqlExpression": "city_id"}],
         "timeFilter": {"column": "id", "from": str(idbase + 40),
                        "to": str(idbase + 100)},
         "now": BASE_T + 3 * DAY}
    resp = svc.handle_aql({"queries": [q]})
    assert "errors" not in resp, resp.get("errors")
    assert resp["results"][0] == {"7": 7.0}

    # and the id range genuinely filters: [+40, +55) keeps only id +50
    q2 = dict(q)
    q2["timeFilter"] = {"column": "id", "from": str(idbase + 40),
                        "to": str(idbase + 55)}
    resp2 = svc.handle_aql({"queries": [q2]})
    assert resp2["results"][0] == {"7": 1.0}


def test_jobs_skip_while_bootstrap_token_held(tmp_root):
    """Reference parity (purge_test.go "purge should be blocked";
    purge.go:25, archiving.go:319, backfill.go:224): every scheduled job
    acquires the shard's bootstrap token NON-blocking and silently skips
    while a peer-copy session holds it — it must not error and must not
    block the single job-executor thread."""
    from aresdb_tpu.memstore.common import GLOBAL_BOOTSTRAP_TOKEN

    ms = make_memstore(tmp_root)
    shard = ms.get_table_shard("trips")
    now = BASE_T + 3 * DAY
    shard.save_upsert_batch(fact_batch([(BASE_T + 100, 1, 7, 1.0)]))
    sched = Scheduler(ms)
    shard.schema.table.config.archiving_delay_minutes = DAY // 60

    assert GLOBAL_BOOTSTRAP_TOKEN.acquire("trips", 0, blocking=False)
    try:
        result = sched.run_job("trips", 0, "archiving", now=now)
        assert result is None  # skipped, no exception
        st = sched.job_statuses()["trips/0/archiving"]
        assert st["lastResult"] == {"skipped": "bootstrap in progress"}
        assert st["numRuns"] == 0
        # still DUE: run_due_jobs retries it on the next tick
        assert ("trips", 0, "archiving") in sched.run_due_jobs(now=now)
        # other shards are unaffected (token is per (table, shard))
        assert sched.run_job("cities", 0, "snapshot", now=now) is not None
    finally:
        GLOBAL_BOOTSTRAP_TOKEN.release("trips", 0)
    result = sched.run_job("trips", 0, "archiving", now=now)
    assert result["rowsArchived"] == 1
