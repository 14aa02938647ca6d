"""Runtime schema-change parity (memstore/schema_test.go applyTableSchema).

The reference's testTable scenario: col1 Bool / col2 SmallEnum (cases
a,b,c) / col3 BigEnum (cases d,e), then a modified schema arrives with
col2 DELETED and col4 BigEnum appended. Expected (:394-434):
- column_ids drops col2, gains col4 at physical id 3
- value_type_by_column keeps the deleted column's type slot
- col2's enum dict is REMOVED; col3 keeps its cases; col4 gets a fresh one
- the deleted column's shard data is purged
"""

import numpy as np

from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common.schema import Table
from aresdb_tpu.common.upsert_batch import UpsertBatch, UpsertBatchBuilder
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore

BASE = {
    "name": "testTable",
    "columns": [
        {"name": "col1", "type": "Uint32"},
        {"name": "col2", "type": "SmallEnum"},
        {"name": "col3", "type": "BigEnum"},
    ],
    "primaryKeyColumns": [0],
    "isFactTable": False,
    "config": {"batchSize": 16},
}

MODIFIED = {
    "name": "testTable",
    "columns": [
        {"name": "col1", "type": "Uint32"},
        {"name": "col2", "type": "SmallEnum", "deleted": True},
        {"name": "col3", "type": "BigEnum"},
        {"name": "col4", "type": "BigEnum"},
    ],
    "primaryKeyColumns": [0],
    "isFactTable": False,
    "config": {"batchSize": 16},
}


def _build(tmp_path):
    ms = MemStore(DiskMetaStore(str(tmp_path)), LocalDiskStore(str(tmp_path)))
    ms.create_table(Table.from_json(BASE))
    ms.init_shards()
    ms.metastore.extend_enum_cases("testTable", "col2", ["a", "b", "c"])
    ms.metastore.extend_enum_cases("testTable", "col3", ["d", "e"])
    ms.fetch_schema()
    return ms


def test_apply_modified_schema_deletes_column(tmp_path):
    ms = _build(tmp_path)
    ts = ms.get_schema("testTable")
    assert ts.enum_dicts["col2"].rank_to_str == ["a", "b", "c"]

    # ingest one row so col2 has live data to purge
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint32)
    b.add_column(1, dt.SmallEnum)
    b.add_column(2, dt.BigEnum)
    b.add_row()
    b.set_value(0, 0, 7)
    b.set_value(0, 1, 1)
    b.set_value(0, 2, 0)
    ms.get_table_shard("testTable").save_upsert_batch(
        UpsertBatch(b.to_bytes()))
    shard = ms.get_table_shard("testTable")
    assert any(1 in lb.columns for lb in shard.live_store.batches.values())

    # the modified schema arrives via the metastore (watch/fetch path)
    t = Table.from_json(MODIFIED)
    t.version = ts.table.version + 1
    ms.metastore.update_table(t)
    ms.fetch_schema()

    ts = ms.get_schema("testTable")
    assert ts.column_ids == {"col1": 0, "col3": 2, "col4": 3}
    assert [c.type for c in ts.table.columns] == [
        "Uint32", "SmallEnum", "BigEnum", "BigEnum"]
    assert "col2" not in ts.enum_dicts          # dict removed
    assert ts.enum_dicts["col3"].rank_to_str == ["d", "e"]
    assert ts.enum_dicts["col4"].rank_to_str == []  # fresh dict
    # shard data for the deleted column is gone
    assert not any(1 in lb.columns
                   for lb in shard.live_store.batches.values())


def test_refetch_is_idempotent(tmp_path):
    ms = _build(tmp_path)
    t = Table.from_json(MODIFIED)
    t.version = ms.get_schema("testTable").table.version + 1
    ms.metastore.update_table(t)
    ms.fetch_schema()
    ms.fetch_schema()  # second apply: col2 is no longer NEWLY deleted
    ts = ms.get_schema("testTable")
    assert "col2" not in ts.enum_dicts
    assert ts.enum_dicts["col3"].rank_to_str == ["d", "e"]  # not doubled


def test_enum_default_value_seeds_enum_file(tmp_path):
    """Creating (or adding) an enum column with a default value writes the
    default case into the enum FILE, so file ranks and runtime dicts agree
    (reference disk_metastore.go:490,557,1044). Before this, a client
    extending enums through the metastore got rank 0 for a case the
    runtime dict held at rank 1."""
    ms = MemStore(DiskMetaStore(str(tmp_path)), LocalDiskStore(str(tmp_path)))
    ms.create_table(Table.from_json({
        "name": "t",
        "columns": [
            {"name": "id", "type": "Uint32"},
            {"name": "status", "type": "SmallEnum",
             "defaultValue": "unknown"},
        ],
        "primaryKeyColumns": [0],
        "isFactTable": False,
        "config": {"batchSize": 16},
    }))
    assert ms.metastore.get_enum_cases("t", "status") == ["unknown"]
    assert ms.get_schema("t").enum_dicts["status"].rank_to_str == ["unknown"]
    ranks = ms.metastore.extend_enum_cases("t", "status", ["active"])
    assert ranks == [1]
    ms.fetch_schema()
    assert ms.get_schema("t").enum_dicts["status"].rank_to_str == \
        ["unknown", "active"]
