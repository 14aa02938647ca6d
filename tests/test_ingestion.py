"""Ingestion + live store tests (parity: memstore/ingestion_test.go behaviors)."""

import numpy as np
import pytest

from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common.schema import Table, TableSchema
from aresdb_tpu.common.upsert_batch import (
    UPDATE_FORCE_OVERWRITE,
    UPDATE_WITH_ADDITION,
    UPDATE_WITH_MAX,
    UPDATE_WITH_MIN,
    UpsertBatch,
    UpsertBatchBuilder,
)
from aresdb_tpu.memstore.common import BASE_BATCH_ID, RecordID
from aresdb_tpu.memstore.table_shard import TableShard
from aresdb_tpu.utils import clock

FACT_SCHEMA = {
    "name": "trips",
    "columns": [
        {"name": "request_at", "type": "Uint32"},
        {"name": "id", "type": "Uint32"},
        {"name": "fare", "type": "Float32"},
        {"name": "city_id", "type": "Uint16"},
    ],
    "primaryKeyColumns": [1],
    "isFactTable": True,
    "config": {"batchSize": 16, "recordRetentionInDays": 0},
}

DIM_SCHEMA = {
    "name": "cities",
    "columns": [
        {"name": "id", "type": "Uint16"},
        {"name": "population", "type": "Uint32"},
    ],
    "primaryKeyColumns": [0],
    "isFactTable": False,
    "config": {"batchSize": 8},
}


def make_fact_shard():
    return TableShard(TableSchema(Table.from_json(FACT_SCHEMA)))


def make_dim_shard():
    return TableShard(TableSchema(Table.from_json(DIM_SCHEMA)))


def build_batch(rows, update_modes=None):
    """rows: list of (request_at, id, fare, city_id) with None = null."""
    b = UpsertBatchBuilder()
    modes = update_modes or {}
    b.add_column(0, dt.Uint32, modes.get(0, 0))
    b.add_column(1, dt.Uint32, modes.get(1, 0))
    b.add_column(2, dt.Float32, modes.get(2, 0))
    b.add_column(3, dt.Uint16, modes.get(3, 0))
    for i, row in enumerate(rows):
        b.add_row()
        for c, v in enumerate(row):
            if v is not None:
                b.set_value(i, c, v)
    return UpsertBatch(b.to_bytes())


def test_basic_insert():
    shard = make_fact_shard()
    stats = shard.save_upsert_batch(build_batch([
        (100, 1, 1.5, 7),
        (101, 2, 2.5, 8),
    ]))
    assert stats.inserted == 2
    assert stats.updated == 0
    ls = shard.live_store
    assert ls.last_read_record == RecordID(BASE_BATCH_ID, 2)
    assert len(ls.primary_key) == 2
    assert shard.read_value(RecordID(BASE_BATCH_ID, 0), 2) == pytest.approx(1.5)
    assert shard.read_value(RecordID(BASE_BATCH_ID, 1), 3) == 8


def test_update_overwrite_not_null():
    shard = make_fact_shard()
    shard.save_upsert_batch(build_batch([(100, 1, 1.5, 7)]))
    stats = shard.save_upsert_batch(build_batch([(100, 1, None, 9)]))
    assert stats.updated == 1 and stats.inserted == 0
    # fare untouched (null skipped), city overwritten
    assert shard.read_value(RecordID(BASE_BATCH_ID, 0), 2) == pytest.approx(1.5)
    assert shard.read_value(RecordID(BASE_BATCH_ID, 0), 3) == 9


def test_update_force_overwrite():
    shard = make_fact_shard()
    shard.save_upsert_batch(build_batch([(100, 1, 1.5, 7)]))
    shard.save_upsert_batch(build_batch(
        [(100, 1, None, 9)], update_modes={2: UPDATE_FORCE_OVERWRITE}))
    assert shard.read_value(RecordID(BASE_BATCH_ID, 0), 2) is None


def test_update_addition_min_max():
    shard = make_fact_shard()
    shard.save_upsert_batch(build_batch([(100, 1, 10.0, 5)]))
    shard.save_upsert_batch(build_batch(
        [(100, 1, 2.5, 3)],
        update_modes={2: UPDATE_WITH_ADDITION, 3: UPDATE_WITH_MIN}))
    assert shard.read_value(RecordID(BASE_BATCH_ID, 0), 2) == pytest.approx(12.5)
    assert shard.read_value(RecordID(BASE_BATCH_ID, 0), 3) == 3
    shard.save_upsert_batch(build_batch(
        [(100, 1, None, 4)], update_modes={3: UPDATE_WITH_MAX}))
    assert shard.read_value(RecordID(BASE_BATCH_ID, 0), 3) == 4


def test_dedup_within_batch():
    shard = make_fact_shard()
    stats = shard.save_upsert_batch(build_batch([
        (100, 1, 1.0, 7),
        (101, 1, 2.0, None),  # same PK: update of pending insert
    ]))
    assert stats.inserted == 1
    assert stats.updated == 1
    assert shard.read_value(RecordID(BASE_BATCH_ID, 0), 2) == pytest.approx(2.0)
    assert shard.read_value(RecordID(BASE_BATCH_ID, 0), 3) == 7  # kept


def test_batch_overflow_allocates_new_live_batch():
    shard = make_fact_shard()  # batchSize 16
    rows = [(100 + i, i, float(i), 1) for i in range(20)]
    shard.save_upsert_batch(build_batch(rows))
    ls = shard.live_store
    assert set(ls.batches) == {BASE_BATCH_ID, BASE_BATCH_ID + 1}
    assert ls.visible_rows_in_batch(BASE_BATCH_ID) == 16
    assert ls.visible_rows_in_batch(BASE_BATCH_ID + 1) == 4
    assert ls.rows_visible() == 20


def test_missing_event_time_rejected():
    shard = make_fact_shard()
    b = UpsertBatchBuilder()
    b.add_column(1, dt.Uint32)
    b.add_row()
    b.set_value(0, 0, 5)
    with pytest.raises(ValueError):
        shard.save_upsert_batch(UpsertBatch(b.to_bytes()))


def test_null_pk_skipped():
    shard = make_fact_shard()
    stats = shard.save_upsert_batch(build_batch([
        (100, None, 1.0, 1),
        (100, 2, 2.0, 2),
    ]))
    assert stats.skipped_null_pk == 1
    assert stats.inserted == 1


def test_retention_filter():
    clock.set_current_time(1_000_000_000)
    try:
        schema = Table.from_json(FACT_SCHEMA)
        schema.config.record_retention_in_days = 3
        shard = TableShard(TableSchema(schema))
        old_ts = 1_000_000_000 - 4 * 86400
        stats = shard.save_upsert_batch(build_batch([
            (old_ts, 1, 1.0, 1),
            (1_000_000_000 - 100, 2, 2.0, 2),
        ]))
        assert stats.skipped_retention == 1
        assert stats.inserted == 1
    finally:
        clock.reset_clock()


def test_backfill_queue_on_old_event_time():
    shard = make_fact_shard()
    shard.live_store.archiving_cutoff_high_watermark = 500
    stats = shard.save_upsert_batch(build_batch([
        (100, 1, 1.0, 1),   # older than cutoff -> backfill
        (600, 2, 2.0, 2),   # normal insert
    ]))
    assert stats.backfilled == 1
    assert stats.inserted == 1
    assert shard.backfill_manager.qualifies_for_backfill()
    queued, _, _ = shard.backfill_manager.drain()
    assert len(queued) == 1
    batch, rows = queued[0]
    assert rows.tolist() == [0]


def test_dimension_table_ingestion():
    shard = make_dim_shard()
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint16)
    b.add_column(1, dt.Uint32)
    for i in range(3):
        b.add_row()
        b.set_value(i, 0, i + 1)
        b.set_value(i, 1, (i + 1) * 1000)
    stats = shard.save_upsert_batch(UpsertBatch(b.to_bytes()))
    assert stats.inserted == 3
    assert shard.snapshot_manager.num_mutations == 3
    assert shard.read_value(RecordID(BASE_BATCH_ID, 1), 1) == 2000


def test_type_mismatch_rejected():
    shard = make_fact_shard()
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint32)
    b.add_column(1, dt.Int64)  # schema says Uint32
    b.add_row()
    b.set_value(0, 0, 1)
    b.set_value(0, 1, 2)
    with pytest.raises(ValueError):
        shard.save_upsert_batch(UpsertBatch(b.to_bytes()))

def test_skip_future_records():
    """Fact rows with event time beyond 'now' are skipped
    (ingestion_test.go:128 'skip future records', ingestion.go:254)."""
    clock.set_current_time(1_000_000_000)
    try:
        shard = make_fact_shard()
        stats = shard.save_upsert_batch(build_batch([
            (1_000_000_123, 1, 1.0, 1),    # future
            (1_000_000_000, 2, 2.0, 2),    # exactly now: kept
            (999_999_999, 3, 3.0, 3),      # past: kept
        ]))
        assert stats.skipped_future == 1
        assert stats.inserted == 2
        assert shard.live_store.rows_visible() == 2
    finally:
        clock.reset_clock()


def test_retention_is_day_granular():
    """Retention compares event DAY vs now-day minus retention days
    (ingestion.go:239-249), not a rolling now-minus-seconds window."""
    clock.set_current_time(1_000_000_000)
    try:
        schema = Table.from_json(FACT_SCHEMA)
        schema.config.record_retention_in_days = 3
        shard = TableShard(TableSchema(schema))
        oldest_day = 1_000_000_000 // 86400 - 3
        stats = shard.save_upsert_batch(build_batch([
            (oldest_day * 86400, 1, 1.0, 1),      # first second of the
                                                  # oldest retained day
            (oldest_day * 86400 - 1, 2, 2.0, 2),  # one second earlier: out
        ]))
        assert stats.inserted == 1
        assert stats.skipped_retention == 1
    finally:
        clock.reset_clock()


def test_empty_upsert_batch_ok():
    """A batch with columns but zero rows applies cleanly
    (ingestion_test.go:55)."""
    shard = make_fact_shard()
    stats = shard.save_upsert_batch(build_batch([]))
    assert stats.inserted == 0
    assert shard.live_store.rows_visible() == 0


def test_missing_primary_key_column_rejected():
    """A batch without the PK column errors (ingestion_test.go:45)."""
    shard = make_fact_shard()
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint32)   # event time only; PK is column 1
    b.add_row()
    b.set_value(0, 0, 100)
    with pytest.raises(ValueError):
        shard.save_upsert_batch(UpsertBatch(b.to_bytes()))
