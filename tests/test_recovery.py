"""Redolog + recovery tests (parity: memstore/recovery_test.go behaviors)."""

import os
import struct

import pytest

from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common.schema import Table
from aresdb_tpu.common.upsert_batch import UpsertBatch, UpsertBatchBuilder
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.common import BASE_BATCH_ID, RecordID
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore

FACT_SCHEMA = {
    "name": "trips",
    "columns": [
        {"name": "request_at", "type": "Uint32"},
        {"name": "id", "type": "Uint32"},
        {"name": "fare", "type": "Float32"},
    ],
    "primaryKeyColumns": [1],
    "isFactTable": True,
    "config": {"batchSize": 64, "recordRetentionInDays": 0},
}


def make_store(root):
    ms = MemStore(DiskMetaStore(root), LocalDiskStore(root))
    return ms


def ingest(ms, rows):
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint32)
    b.add_column(1, dt.Uint32)
    b.add_column(2, dt.Float32)
    for i, (t, rid, fare) in enumerate(rows):
        b.add_row()
        b.set_value(i, 0, t)
        b.set_value(i, 1, rid)
        b.set_value(i, 2, fare)
    return ms.handle_ingestion("trips", 0, UpsertBatch(b.to_bytes()))


def test_ingest_restart_recover(tmp_root):
    ms = make_store(tmp_root)
    ms.create_table(Table.from_json(FACT_SCHEMA))
    ms.init_shards()
    ingest(ms, [(100, 1, 1.5), (101, 2, 2.5)])
    ingest(ms, [(102, 3, 3.5), (100, 1, 9.0)])  # second batch updates id=1

    # "restart": brand new memstore over the same root
    ms2 = make_store(tmp_root)
    ms2.fetch_schema()
    assert "trips" in ms2.schemas
    ms2.init_shards()
    shard = ms2.get_table_shard("trips", 0)
    assert shard.live_store.rows_visible() == 3
    assert len(shard.live_store.primary_key) == 3
    # the update must have been replayed
    assert shard.read_value(RecordID(BASE_BATCH_ID, 0), 2) == pytest.approx(9.0)
    assert shard.read_value(RecordID(BASE_BATCH_ID, 2), 2) == pytest.approx(3.5)


def test_corrupt_redolog_tail_truncated(tmp_root):
    ms = make_store(tmp_root)
    ms.create_table(Table.from_json(FACT_SCHEMA))
    ms.init_shards()
    ingest(ms, [(100, 1, 1.5)])
    shard = ms.get_table_shard("trips", 0)
    redo_file = shard.redolog_manager.current_file
    path = ms.diskstore.redolog_path("trips", 0, redo_file)
    # append garbage: size prefix promising more bytes than exist
    with open(path, "ab") as f:
        f.write(struct.pack("<I", 99999))
        f.write(b"\x01\x02\x03")

    ms2 = make_store(tmp_root)
    ms2.fetch_schema()
    ms2.init_shards()
    shard2 = ms2.get_table_shard("trips", 0)
    assert shard2.live_store.rows_visible() == 1
    # file was truncated to the last good batch
    good_size = os.path.getsize(path)
    ms3 = make_store(tmp_root)
    ms3.fetch_schema()
    ms3.init_shards()
    assert os.path.getsize(path) == good_size


def test_metastore_schema_round_trip(tmp_root):
    meta = DiskMetaStore(tmp_root)
    t = Table.from_json(FACT_SCHEMA)
    meta.create_table(t)
    assert meta.list_tables() == ["trips"]
    got = meta.get_table("trips")
    assert got.name == "trips"
    assert [c.name for c in got.columns] == ["request_at", "id", "fare"]
    with pytest.raises(ValueError):
        meta.create_table(t)
    t.version = 1
    meta.update_table(t)
    assert meta.get_table("trips").version == 1


def test_metastore_enums_and_watermarks(tmp_root):
    meta = DiskMetaStore(tmp_root)
    ranks = meta.extend_enum_cases("trips", "status", ["completed", "canceled"])
    assert ranks == [0, 1]
    ranks = meta.extend_enum_cases("trips", "status", ["rejected"])
    assert ranks == [2]
    assert meta.get_enum_cases("trips", "status") == [
        "completed", "canceled", "rejected"]

    meta.update_archiving_cutoff("trips", 0, 12345)
    assert meta.get_archiving_cutoff("trips", 0) == 12345
    meta.update_redolog_checkpoint("trips", 0, 111, 22)
    assert meta.get_redolog_checkpoint("trips", 0) == (111, 22)
    meta.update_snapshot_progress("cities", 0, 5, 6, -2147483648, 7)
    assert meta.get_snapshot_progress("cities", 0) == (5, 6, -2147483648, 7)

    meta.add_archive_batch_version("trips", 0, 18000, 100, 0, 500)
    meta.add_archive_batch_version("trips", 0, 18000, 200, 0, 600)
    batches = meta.get_archive_batches("trips", 0)
    assert batches[18000] == (200, 0, 600)
    # cutoff filter keeps only versions <= cutoff
    batches = meta.get_archive_batches("trips", 0, cutoff=150)
    assert batches[18000] == (100, 0, 500)


def test_vector_party_serialization_round_trip():
    import numpy as np

    from aresdb_tpu.memstore.vector_party import ArchiveVectorParty

    vp = ArchiveVectorParty(
        dt.Float32,
        values=np.array([1.5, 2.5, 0.0], dtype=np.float32),
        validity=np.array([True, True, False]),
    )
    vp2 = ArchiveVectorParty.from_bytes(vp.to_bytes())
    np.testing.assert_array_equal(vp2.values, vp.values)
    np.testing.assert_array_equal(vp2.validity, vp.validity)
    assert vp2.mode == vp.mode
    assert vp2.num_rows == 3

    # compressed (mode 3)
    vpc = ArchiveVectorParty(
        dt.Uint16,
        values=np.array([7, 9], dtype=np.uint16),
        validity=np.array([True, True]),
        counts=np.array([0, 3, 5], dtype=np.uint32),
    )
    vpc2 = ArchiveVectorParty.from_bytes(vpc.to_bytes())
    assert vpc2.is_compressed and vpc2.num_rows == 5
    exp = vpc2.expanded()
    np.testing.assert_array_equal(exp.values, [7, 7, 7, 9, 9])

    # list VP
    vpl = ArchiveVectorParty(
        dt.ArrayInt32, values=None,
        validity=np.array([True, False, True]),
        list_values=[[1, 2], None, [3, None]],
    )
    vpl2 = ArchiveVectorParty.from_bytes(vpl.to_bytes())
    assert vpl2.list_values == [[1, 2], None, [3, None]]
