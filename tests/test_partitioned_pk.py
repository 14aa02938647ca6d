"""Partitioned primary-key differential tests.

The hash-partitioned cuckoo index (native/cuckoo_index.cpp
PartitionedCuckoo, the default at 2 partitions; 4/8 supported) claims
BYTE-IDENTICAL classify_batch output vs the serial table (same actions,
record ids, counts — reference semantics: memstore/ingestion.go:172
insertPrimaryKeys). These tests fuzz that claim across mixed batches
(dups, null keys, retention, future, TTL expiry) at every partition
count and drive a real TableShard ingest with ARES_PK_PARTS=2.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not __import__("aresdb_tpu.native", fromlist=["available"]).available(),
    reason="native library unavailable")


def _mk(parts, kb=12, et=True):
    from aresdb_tpu.memstore.native_primary_key import NativePrimaryKey
    return NativePrimaryKey(kb, has_event_time=et, parts=parts)


@pytest.mark.parametrize("parts", [2, 4, 8])
def test_classify_differential_fuzz(parts):
    rng = np.random.default_rng(7)
    kb = 12
    pool = rng.integers(0, 256, (4000, kb), dtype=np.uint8)
    p1, p2 = _mk(1, kb), _mk(parts, kb)
    nb = [-1, -1]
    ni = [0, 0]
    for step in range(25):
        n = int(rng.integers(1, 3000))
        keys = pool[rng.integers(0, len(pool), n)]
        valid = (rng.random(n) > 0.05).astype(np.uint8)
        et = rng.integers(900, 2000, n).astype(np.int64)
        cutoff = 1000 if step > 4 else 0
        retention = 950 if step > 9 else 0
        future = 1990 if step > 14 else 0
        if cutoff:
            p1.update_event_time_cutoff(cutoff)
            p2.update_event_time_cutoff(cutoff)
        r1 = p1.classify_batch(keys, valid, et, cutoff, retention, future,
                               nb[0], ni[0], 700)
        r2 = p2.classify_batch(keys, valid, et, cutoff, retention, future,
                               nb[1], ni[1], 700)
        for name, x, y in zip(("actions", "batch", "index", "counts"),
                              r1, r2):
            assert np.array_equal(x, y), (step, name)
        nb[0], ni[0] = int(r1[3][5]), int(r1[3][6])
        nb[1], ni[1] = int(r2[3][5]), int(r2[3][6])
    assert len(p1) == len(p2)
    assert dict(p1.items()) == dict(p2.items())


def test_classify_differential_heavy_dups():
    """Tiny key pool -> heavy same-batch duplicates; the partitioned path's
    provisional-id rewrite must still match serial exactly."""
    rng = np.random.default_rng(11)
    kb = 8
    pool = rng.integers(0, 256, (50, kb), dtype=np.uint8)
    p1, p2 = _mk(1, kb), _mk(2, kb)
    nb = [-1, -1]
    ni = [0, 0]
    for step in range(10):
        n = 2000
        keys = pool[rng.integers(0, len(pool), n)]
        valid = np.ones(n, np.uint8)
        et = rng.integers(1000, 2000, n).astype(np.int64)
        r1 = p1.classify_batch(keys, valid, et, 0, 0, 0, nb[0], ni[0], 64)
        r2 = p2.classify_batch(keys, valid, et, 0, 0, 0, nb[1], ni[1], 64)
        for x, y in zip(r1, r2):
            assert np.array_equal(x, y)
        nb[0], ni[0] = int(r1[3][5]), int(r1[3][6])
        nb[1], ni[1] = int(r2[3][5]), int(r2[3][6])


def test_point_ops_route_consistently():
    from aresdb_tpu.memstore.common import RecordID
    pk = _mk(2, 6)
    keys = [bytes([i, i ^ 7, 3, 0, i % 5, 1]) for i in range(200)]
    for i, k in enumerate(keys):
        found, rec = pk.find_or_insert(k, RecordID(-1, i), event_time=10)
        assert not found and rec == RecordID(-1, i)
    assert len(pk) == 200
    for i, k in enumerate(keys):
        assert pk.find(k) == RecordID(-1, i)
        assert pk.update(k, RecordID(-2, i))
        assert pk.find(k) == RecordID(-2, i)
    for k in keys[:50]:
        pk.delete(k)
    assert len(pk) == 150
    assert pk.find(keys[0]) is None
    items = dict(pk.items())
    assert len(items) == 150
    assert items[keys[60]] == RecordID(-2, 60)


def test_shard_ingest_with_partitioned_pk(tmp_path):
    """End-to-end save_upsert_batch under ARES_PK_PARTS=2: upserts (second
    batch overwrites half the rows) must land exactly as with the default
    index."""
    from aresdb_tpu.common import data_types as dt
    from aresdb_tpu.common.schema import Table
    from aresdb_tpu.common.upsert_batch import (UpsertBatch,
                                                build_columnar_upsert)
    from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
    from aresdb_tpu.memstore.memstore import MemStore
    from aresdb_tpu.metastore.disk_metastore import DiskMetaStore
    from aresdb_tpu.query.service import QueryService

    if os.environ.get("ARES_NATIVE", "1") == "0":
        pytest.skip("shard uses the python PK under ARES_NATIVE=0")
    old = os.environ.get("ARES_PK_PARTS")
    os.environ["ARES_PK_PARTS"] = "2"
    try:
        ms = MemStore(DiskMetaStore(str(tmp_path)),
                      LocalDiskStore(str(tmp_path)))
        ms.create_table(Table.from_json({
            "name": "t", "columns": [
                {"name": "request_at", "type": "Uint32"},
                {"name": "id", "type": "Uint32"},
                {"name": "v", "type": "Float32"}],
            "primaryKeyColumns": [1], "isFactTable": True,
            "config": {"batchSize": 4096,
                       "recordRetentionInDays": 0}}))
        ms.init_shards()
        shard = ms.get_table_shard("t")
        assert shard.live_store.primary_key.parts == 2
        n = 10_000
        now = 1_600_000_000
        ids = np.arange(n, dtype=np.uint32)
        ts = np.full(n, now - 100, np.uint32)
        blob = build_columnar_upsert([
            (0, dt.Uint32, ts, None, 0),
            (1, dt.Uint32, ids, None, 0),
            (2, dt.Float32, np.full(n, 1.0, np.float32), None, 0)], n)
        shard.save_upsert_batch(UpsertBatch(blob))
        # second batch: update even ids to v=3, insert n..n+999
        ids2 = np.concatenate([ids[::2],
                               np.arange(n, n + 1000, dtype=np.uint32)])
        m = len(ids2)
        blob2 = build_columnar_upsert([
            (0, dt.Uint32, np.full(m, now - 90, np.uint32), None, 0),
            (1, dt.Uint32, ids2, None, 0),
            (2, dt.Float32, np.full(m, 3.0, np.float32), None, 0)], m)
        shard.save_upsert_batch(UpsertBatch(blob2))
        svc = QueryService(ms)
        out = svc.handle_aql({"queries": [{
            "table": "t", "dimensions": [],
            "measures": [{"sqlExpression": "sum(v)"}],
            "timeFilter": {"column": "request_at", "from": "-1d"},
            "now": now}]})
        assert not out.get("errors")
        got = float(out["results"][0][""])
        # evens updated to 3 (5000*3), odds still 1 (5000), new 1000*3
        assert got == 5000 * 3.0 + 5000 * 1.0 + 1000 * 3.0
    finally:
        if old is None:
            os.environ.pop("ARES_PK_PARTS", None)
        else:
            os.environ["ARES_PK_PARTS"] = old
