"""Run-length (mode-3) archive aggregation: correctness + engagement.

The runlen path (query/runlen.py + kernels.make_runlen_agg_kernel) must
produce results identical to the expand-on-stage path (ARES_RUNLEN=0) for
every eligible shape, and the verbose stats must prove it actually ran
(runlenBatches > 0) — a silently-ineligible path would pass any
differential test. Reference semantics: query/iterator.hpp:214-240
(compressed iteration), memstore/merge.go (mode-3 layout).
"""

import os

import numpy as np
import pytest

from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common.schema import Table
from aresdb_tpu.common.upsert_batch import UpsertBatch, UpsertBatchBuilder
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.archiving import Archiver
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore
from aresdb_tpu.query.service import QueryService

DAY = 86400
BASE_T = 1_600_000_000 - (1_600_000_000 % DAY)
NOW = BASE_T + 2 * DAY

FACT = {
    "name": "trips",
    "columns": [
        {"name": "request_at", "type": "Uint32"},
        {"name": "id", "type": "Uint32"},
        {"name": "city_id", "type": "Uint16"},
        {"name": "status", "type": "SmallEnum"},
        {"name": "fare", "type": "Float32"},
        {"name": "tip", "type": "Int64"},
    ],
    "primaryKeyColumns": [1],
    "archivingSortColumns": [2, 3],
    "isFactTable": True,
    "config": {"batchSize": 16384, "recordRetentionInDays": 0},
}


def _build(tmp_path, n=6000, n_cities=12, seed=0):
    ms = MemStore(DiskMetaStore(str(tmp_path)), LocalDiskStore(str(tmp_path)))
    ms.create_table(Table.from_json(FACT))
    ms.init_shards()
    trips = ms.get_schemas()["trips"]
    trips.extend_enum("status", ["completed", "canceled", "rejected"])
    shard = ms.get_table_shard("trips")
    rng = np.random.RandomState(seed)
    ts = (BASE_T + rng.randint(0, DAY, n)).astype(np.uint32)
    city = rng.randint(0, n_cities, n).astype(np.uint16)
    status = rng.randint(0, 3, n).astype(np.uint8)
    fare = (rng.rand(n) * 50).astype(np.float32)
    fare_valid = rng.rand(n) > 0.1
    tip = rng.randint(0, 100, n).astype(np.int64)

    b = UpsertBatchBuilder()
    for cid, t in ((0, dt.Uint32), (1, dt.Uint32), (2, dt.Uint16),
                   (3, dt.SmallEnum), (4, dt.Float32), (5, dt.Int64)):
        b.add_column(cid, t)
    for i in range(n):
        b.add_row()
        b.set_value(i, 0, int(ts[i]))
        b.set_value(i, 1, i)
        b.set_value(i, 2, int(city[i]))
        b.set_value(i, 3, int(status[i]))
        if fare_valid[i]:
            b.set_value(i, 4, float(fare[i]))
        b.set_value(i, 5, int(tip[i]))
    shard.save_upsert_batch(UpsertBatch(b.to_bytes()))
    # archive the whole day into a sorted mode-3 batch
    Archiver(shard, ms.metastore, ms.diskstore).archive(BASE_T + DAY)
    assert any(
        vp is not None and vp.is_compressed
        for vp in [shard.archive_store.get_current_version()
                   .request_batch(BASE_T // DAY).request_column(2)])
    return ms, dict(ts=ts, city=city, status=status, fare=fare,
                    fare_valid=fare_valid, tip=tip)


def _run(svc, q):
    out = svc.handle_aql({"queries": [q], "verbose": True})
    assert not out.get("errors"), out.get("errors")
    return out["results"][0], out["context"][0]


CASES = [
    ("sum by sort col",
     {"measures": [{"sqlExpression": "sum(fare)"}],
      "dimensions": [{"sqlExpression": "city_id"}]}),
    ("count by two sort cols",
     {"measures": [{"sqlExpression": "count(*)"}],
      "dimensions": [{"sqlExpression": "city_id"},
                     {"sqlExpression": "status"}]}),
    ("run filter + row filter",
     {"measures": [{"sqlExpression": "sum(fare)",
                    "rowFilters": ["status='completed'", "fare > 10"]}],
      "dimensions": [{"sqlExpression": "city_id"}]}),
    ("avg with row-level measure",
     {"measures": [{"sqlExpression": "avg(fare)"}],
      "dimensions": [{"sqlExpression": "status"}]}),
    ("int64 sum (scatter lane)",
     {"measures": [{"sqlExpression": "sum(tip)"}],
      "dimensions": [{"sqlExpression": "city_id"}]}),
    ("run-level count measure",
     {"measures": [{"sqlExpression": "count(city_id)"}],
      "dimensions": [{"sqlExpression": "status"}]}),
    ("expr dim on sort col",
     {"measures": [{"sqlExpression": "sum(fare)"}],
      "dimensions": [{"sqlExpression": "city_id % 5"}]}),
    ("time filter (row level) + sort dim",
     {"measures": [{"sqlExpression": "sum(fare)"}],
      "dimensions": [{"sqlExpression": "city_id"}],
      "timeFilter": {"column": "request_at",
                     "from": f"{BASE_T + 3000}", "to": f"{BASE_T + DAY}"}}),
]


@pytest.mark.parametrize("name,query", CASES)
def test_runlen_matches_expanded(tmp_path, name, query):
    ms, _ = _build(tmp_path)
    q = dict(query)
    q["table"] = "trips"
    q["now"] = NOW
    # runlen is OPT-IN (priced slower warm than the fused expand path;
    # see executor._stage_archive_slice) — force it for the differential
    os.environ["ARES_RUNLEN"] = "1"
    try:
        res_rl, ctx_rl = _run(QueryService(ms), q)
        assert ctx_rl.get("runlenBatches", 0) > 0, \
            f"runlen path did not engage for {name!r}: {ctx_rl}"
    finally:
        del os.environ["ARES_RUNLEN"]
    res_exp, ctx_exp = _run(QueryService(ms), q)
    assert not ctx_exp.get("runlenBatches")
    _assert_close(res_rl, res_exp, name)


def _assert_close(a, b, name, rel=1e-5):
    """Nested-result comparison: identical keys, measures equal to within
    f32 accumulation-order tolerance (the runlen path sums value*count
    products where the expand path sums per-row — same math, different
    rounding order)."""
    assert type(a) is type(b), (name, a, b)
    if isinstance(a, dict):
        assert set(a) == set(b), (name, set(a) ^ set(b))
        for k in a:
            _assert_close(a[k], b[k], f"{name}/{k}", rel)
        return
    if a is None or b is None:
        assert a == b, (name, a, b)
        return
    fa, fb = float(a), float(b)
    assert abs(fa - fb) <= max(abs(fb) * rel, 1e-6), (name, fa, fb)


def test_runlen_oracle_weighted_sum(tmp_path, monkeypatch):
    monkeypatch.setenv("ARES_RUNLEN", "1")
    ms, d = _build(tmp_path)
    svc = QueryService(ms)
    q = {"table": "trips", "now": NOW,
         "measures": [{"sqlExpression": "sum(fare)",
                       "rowFilters": ["status='completed'"]}],
         "dimensions": [{"sqlExpression": "city_id"}]}
    res, ctx = _run(svc, q)
    assert ctx.get("runlenBatches", 0) > 0
    sel = d["fare_valid"] & (d["status"] == 0)
    for c in np.unique(d["city"][sel]):
        want = float(d["fare"][sel & (d["city"] == c)]
                     .astype(np.float64).sum())
        got = float(res[str(int(c))])
        assert abs(got - want) < max(1e-3, abs(want) * 1e-5), (c, got, want)


def test_runlen_prefilter_compressed_entry_search(tmp_path, monkeypatch):
    monkeypatch.setenv("ARES_RUNLEN", "1")
    """Equality prefilter on the first sort column must narrow the row
    range by searching the ENTRY space (no expansion), and still match."""
    ms, d = _build(tmp_path)
    svc = QueryService(ms)
    q = {"table": "trips", "now": NOW,
         "measures": [{"sqlExpression": "sum(fare)",
                       "rowFilters": ["city_id = 7"]}],
         "dimensions": [{"sqlExpression": "status"}]}
    res, ctx = _run(svc, q)
    assert ctx.get("prefilterRowsSkipped", 0) > 0, ctx
    sel = d["fare_valid"] & (d["city"] == 7)
    for s, name in enumerate(["completed", "canceled", "rejected"]):
        want = float(d["fare"][sel & (d["status"] == s)]
                     .astype(np.float64).sum())
        got = float(res[name])
        assert abs(got - want) < max(1e-3, abs(want) * 1e-5)


def test_runlen_null_measure_group_still_exists(tmp_path, monkeypatch):
    monkeypatch.setenv("ARES_RUNLEN", "1")
    """A group whose measures are ALL null must still appear (agg=0,
    matching the expand path's identity semantics)."""
    ms = MemStore(DiskMetaStore(str(tmp_path)), LocalDiskStore(str(tmp_path)))
    ms.create_table(Table.from_json({
        "name": "t", "columns": [
            {"name": "ts", "type": "Uint32"},
            {"name": "k", "type": "Uint32"},
            {"name": "g", "type": "Uint16"},
            {"name": "v", "type": "Float32"}],
        "primaryKeyColumns": [1], "archivingSortColumns": [2],
        "isFactTable": True,
        "config": {"batchSize": 4096, "recordRetentionInDays": 0}}))
    ms.init_shards()
    shard = ms.get_table_shard("t")
    n = 512
    rng = np.random.RandomState(1)
    g = np.repeat(np.arange(8, dtype=np.uint16), n // 8)
    v = rng.rand(n).astype(np.float32)
    valid = g != 3
    b = UpsertBatchBuilder()
    for cid, t in ((0, dt.Uint32), (1, dt.Uint32), (2, dt.Uint16),
                   (3, dt.Float32)):
        b.add_column(cid, t)
    for i in range(n):
        b.add_row()
        b.set_value(i, 0, BASE_T + 100)
        b.set_value(i, 1, i)
        b.set_value(i, 2, int(g[i]))
        if valid[i]:
            b.set_value(i, 3, float(v[i]))
    shard.save_upsert_batch(UpsertBatch(b.to_bytes()))
    Archiver(shard, ms.metastore, ms.diskstore).archive(BASE_T + DAY)
    svc = QueryService(ms)
    q = {"table": "t", "now": NOW,
         "measures": [{"sqlExpression": "sum(v)"}],
         "dimensions": [{"sqlExpression": "g"}]}
    res, ctx = _run(svc, q)
    assert ctx.get("runlenBatches", 0) > 0, ctx
    assert res["3"] == 0.0
    assert len(res) == 8
