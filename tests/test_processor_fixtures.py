"""ProcessQuery parity vs the reference's processor fixture scenarios.

Replays query/aql_processor_test.go's ProcessQuery cases through OUR public
MemStore + QueryService path using the reference's own YAML fixtures
(testing/data/batches + vps): live batches -110/-101/-99 with
LastReadRecord (-101, 3) and a capacity-5 truncation of batch-110, archive
batch 0 at cutoff 100 — then asserts the reference's exact JSON goldens:

- "ProcessQuery should work" (:1047): minute buckets in milliseconds →
  {"0": 5, "60000": 4, "120000": 3}
- "ProcessQuery for non-aggregation query should work" (:2138): 12 rows,
  exact order (live batches ascending, then archive), bools as "0"/"1",
  floats Go-formatted, NULL spelled "NULL"
- "ProcessQuery should work for query without regular filters" (:2327):
  {"0": 12}
- "ProcessQuery should work for timezone column queries" (:1126):
  timezone(city_id) lookup via a timezone table → {"0": 4, "3600": 1}
- "evaluateGeoIntersect should work" (:1343): NOT-IN geo filter where one
  point sits in a polygon HOLE and a null point must not count → {"0": 1}
- "evaluateGeoIntersectJoin should work" (:1610): geo_uuid dimension →
  each shape matches exactly one point
"""

import os

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/testing/data"),
    reason="reference fixtures not available")

from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common.schema import Table
from aresdb_tpu.common.upsert_batch import UpsertBatch, UpsertBatchBuilder
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.archive_store import ArchiveBatch
from aresdb_tpu.memstore.common import RecordID
from aresdb_tpu.memstore.live_store import LiveBatch
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.memstore.vector_party import ArchiveVectorParty
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore
from aresdb_tpu.query.service import QueryService

VPS = "/root/reference/testing/data/vps"

SCHEMA3 = {
    "name": "table1",
    "columns": [
        {"name": "c0", "type": "Uint32"},
        {"name": "c1", "type": "Bool"},
        {"name": "c2", "type": "Float32"},
    ],
    "primaryKeyColumns": [0],
    "isFactTable": True,
    "archivingSortColumns": [1, 2],
    "config": {"batchSize": 16, "recordRetentionInDays": 0},
}
TYPES3 = [dt.Uint32, dt.Bool, dt.Float32]


def _load_vp(name, data_type):
    """YAML vp fixture -> (expanded row values, None for null cells)."""
    with open(f"{VPS}/{name}") as f:
        doc = yaml.safe_load(f)
    rows = []
    prev = 0
    for cell in doc["values"]:
        count = 1
        if doc.get("has_counts"):
            s = str(cell)
            body, _, end = s.rpartition(",")
            count = int(end) - prev
            prev = int(end)
            cell = None if body == "null" else body
        if cell is None:
            v = None
        elif data_type == dt.Bool:
            v = cell if isinstance(cell, bool) else str(cell) == "true"
        elif data_type == dt.Float32:
            v = float(np.float32(float(cell)))
        else:
            v = int(float(cell))
        rows.extend([v] * count)
    return rows


def _fill_live(batch, cols, limit=None):
    n = len(cols[0]) if limit is None else limit
    idx = np.arange(n)
    for cid, rows in enumerate(cols):
        rows = rows[:n]
        vp = batch.get_or_create_column(cid)
        valid = np.array([r is not None for r in rows])
        vals = np.array([0 if r is None else r for r in rows],
                        dt.numpy_dtype(TYPES3[cid]))
        vp.write_rows(idx, vals, valid)
    return n


def _archive_batch(shard, vp_names):
    version = shard.archive_store.get_current_version()
    version.archiving_cutoff = 100
    cols = [_load_vp(name, TYPES3[cid]) for cid, name in enumerate(vp_names)]
    ab = ArchiveBatch(0, 0, 0, len(cols[0]), shard.archive_store)
    for cid, rows in enumerate(cols):
        valid = np.array([r is not None for r in rows])
        vals = np.array([0 if r is None else r for r in rows],
                        dt.numpy_dtype(TYPES3[cid]))
        ab.set_column(cid, ArchiveVectorParty(TYPES3[cid], values=vals,
                                              validity=valid))
    version.batches[0] = ab
    return ab


def _build(tmp_path, archive):
    """The processor suite's BeforeEach state (aql_processor_test.go:83-228).

    batch-110 is allocated with capacity 5 in the reference even though its
    vp fixtures hold 6 values — only 5 rows are live. LastReadRecord at
    (-101, 3) leaves -101 visible through row 2 and -99 invisible.
    """
    ms = MemStore(DiskMetaStore(str(tmp_path)), LocalDiskStore(str(tmp_path)))
    ms.create_table(Table.from_json(SCHEMA3))
    ms.init_shards()
    shard = ms.get_table_shard("table1")
    live = shard.live_store

    _archive_batch(shard, archive)
    live.archiving_cutoff_high_watermark = 100

    b110 = LiveBatch(-110, 16, shard.schema)
    _fill_live(b110, [_load_vp("archiving/vp10", dt.Uint32),
                      _load_vp("archiving/vp11", dt.Bool),
                      _load_vp("archiving/vp12", dt.Float32)], limit=5)
    live.batches[-110] = b110

    b101 = LiveBatch(-101, 16, shard.schema)
    _fill_live(b101, [_load_vp("archiving/vp00", dt.Uint32),
                      _load_vp("archiving/vp01", dt.Bool),
                      _load_vp("archiving/vp02", dt.Float32)])
    live.batches[-101] = b101

    live.batches[-99] = LiveBatch(-99, 16, shard.schema)
    live.last_read_record = RecordID(-101, 3)
    live.next_write_record = RecordID(-99, 0)
    return ms


ARCHIVE0 = ["archiving/sortedVP0", "archiving/sortedVP1",
            "archiving/sortedVP2"]
ARCHIVE1 = ["archiving/sortedVP00", "archiving/sortedVP1",
            "archiving/sortedVP2"]


def _run(svc, query):
    resp = svc.handle_aql({"queries": [query]})
    assert "errors" not in resp or not any(resp["errors"]), resp.get("errors")
    return resp["results"][0]


def test_process_query_minute_buckets_in_milliseconds(tmp_path):
    svc = QueryService(_build(tmp_path, ARCHIVE0))
    r = _run(svc, {
        "table": "table1",
        "dimensions": [{"sqlExpression": "c0", "timeBucketizer": "m",
                        "timeUnit": "millisecond"}],
        "measures": [{"sqlExpression": "count(c1)"}],
        "timeFilter": {"column": "c0", "from": "1970-01-01",
                       "to": "1970-01-02"},
    })
    assert r == {"0": 5, "60000": 4, "120000": 3}


def test_process_query_non_aggregation_exact_rows(tmp_path):
    svc = QueryService(_build(tmp_path, ARCHIVE1))
    r = _run(svc, {
        "table": "table1",
        "dimensions": [{"sqlExpression": "c0"}, {"sqlExpression": "c1"},
                       {"sqlExpression": "c2"}],
        "measures": [{"sqlExpression": "1"}],
        "timeFilter": {"column": "c0", "from": "1970-01-01",
                       "to": "1970-01-02"},
        "limit": 20,
    })
    assert r["headers"] == ["c0", "c1", "c2"]
    assert r["matrixData"] == [
        ["100", "0", "1"],
        ["110", "1", "NULL"],
        ["120", "NULL", "1.2"],
        ["130", "0", "1.3"],
        ["100", "0", "NULL"],
        ["110", "1", "1.1"],
        ["120", "0", "1.2"],
        ["0", "NULL", "NULL"],
        ["10", "NULL", "1.1"],
        ["20", "NULL", "1.2"],
        ["30", "0", "1.3"],
        ["40", "1", "NULL"],
    ]


def test_process_query_without_regular_filters(tmp_path):
    svc = QueryService(_build(tmp_path, ARCHIVE1))
    r = _run(svc, {
        "table": "table1",
        "dimensions": [{"sqlExpression": "0"}],
        "measures": [{"sqlExpression": "count(*)"}],
        "timeFilter": {"column": "c0", "from": "1970-01-01",
                       "to": "1970-01-02"},
    })
    assert r == {"0": 12}


def test_process_query_timezone_column(tmp_path):
    """Main rows (t, city): (90,100)..(130,140); timezone table maps city
    100 → "Africa/Algiers" (UTC+1 in 1970) and everything else to
    empty/out-of-dict timezones (offset 0). 3-minute buckets in seconds."""
    ms = MemStore(DiskMetaStore(str(tmp_path)), LocalDiskStore(str(tmp_path)))
    ms.create_table(Table.from_json({
        "name": "table1",
        "columns": [
            {"name": "c0", "type": "Uint32"},
            {"name": "city_id", "type": "Uint32"},
        ],
        "primaryKeyColumns": [0],
        "isFactTable": True,
        "config": {"batchSize": 16, "recordRetentionInDays": 0},
    }))
    ms.create_table(Table.from_json({
        "name": "table2",
        "columns": [
            {"name": "id", "type": "Uint32"},
            {"name": "timezone", "type": "SmallEnum"},
        ],
        "primaryKeyColumns": [0],
        "isFactTable": False,
        "config": {"batchSize": 16},
    }))
    ms.init_shards()
    ms.metastore.extend_enum_cases("table2", "timezone",
                                   ["Africa/Algiers", ""])
    ms.fetch_schema()
    tz_shard = ms.get_table_shard("table2")

    # timezone table rows: ids 100..140, ranks 0,1,2,3,1 — rank 2 and the
    # out-of-dict rank 3 must resolve like the empty timezone (offset 0)
    tb = UpsertBatchBuilder()
    tb.add_column(0, dt.Uint32)
    tb.add_column(1, dt.SmallEnum)
    for i, (cid, rank) in enumerate(
            [(100, 0), (110, 1), (120, 2), (130, 3), (140, 1)]):
        tb.add_row()
        tb.set_value(i, 0, cid)
        tb.set_value(i, 1, rank)
    tz_shard.save_upsert_batch(UpsertBatch(tb.to_bytes()))

    main = ms.get_table_shard("table1")
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint32)
    b.add_column(1, dt.Uint32)
    for i, (t, cid) in enumerate(
            [(90, 100), (100, 110), (110, 120), (120, 130), (130, 140)]):
        b.add_row()
        b.set_value(i, 0, t)
        b.set_value(i, 1, cid)
    main.save_upsert_batch(UpsertBatch(b.to_bytes()))

    svc = QueryService(ms, timezone_table="table2")
    r = _run(svc, {
        "table": "table1",
        "dimensions": [{"sqlExpression": "c0", "timeBucketizer": "3m",
                        "timeUnit": "second"}],
        "measures": [{"sqlExpression": "count(*)"}],
        "timeFilter": {"column": "c0", "from": "1970-01-01",
                       "to": "1970-01-02"},
        "timezone": "timezone(city_id)",
    })
    assert r == {"0": 4, "3600": 1}


GEO_UUIDS = ["00000192F23D460DBE60400C32EA0667",
             "00001A3F088047D79343894698F221AB",
             "0000334BB6B0420986175F20F3FBF90D"]
# reference shapes are (lat, lng) pairs; WKT is (lng lat)
GEO_WKTS = [
    "POLYGON ((1 1, -1 1, -1 -1, 1 -1, 1 1))",
    "POLYGON ((3 3, 2 2, 2 4, 3 3))",
    "POLYGON ((6 0, 6 3, 3 3, 3 0, 6 0), (5 1, 5 2, 4 2, 4 1, 5 1))",
]


def _geo_build(tmp_path):
    ms = MemStore(DiskMetaStore(str(tmp_path)), LocalDiskStore(str(tmp_path)))
    ms.create_table(Table.from_json({
        "name": "trips",
        "columns": [
            {"name": "request_at", "type": "Uint32"},
            {"name": "request_point", "type": "GeoPoint"},
        ],
        "primaryKeyColumns": [0],
        "isFactTable": True,
        "config": {"batchSize": 16, "recordRetentionInDays": 0},
    }))
    ms.create_table(Table.from_json({
        "name": "geofence",
        "columns": [
            {"name": "geofence_uuid", "type": "UUID"},
            {"name": "shape", "type": "GeoShape"},
        ],
        "primaryKeyColumns": [0],
        "isFactTable": False,
        "config": {"batchSize": 16},
    }))
    ms.init_shards()

    zb = UpsertBatchBuilder()
    zb.add_column(0, dt.UUID)
    zb.add_column(1, dt.GeoShape)
    for i, (uid, wkt) in enumerate(zip(GEO_UUIDS, GEO_WKTS)):
        zb.add_row()
        zb.set_value(i, 0, dt.parse_value(uid, dt.UUID))
        zb.set_value(i, 1, dt.parse_geoshape(wkt))
    ms.get_table_shard("geofence").save_upsert_batch(
        UpsertBatch(zb.to_bytes()))

    # 5 trips at t=0: points in shape 1 / 2 / 3 / in shape 3's HOLE / null.
    # direct batch fill: all rows share t=0 so PK-based ingest would dedup.
    shard = ms.get_table_shard("trips")
    batch = LiveBatch(-2147483648, 8, shard.schema)
    n = 5
    idx = np.arange(n)
    vp0 = batch.get_or_create_column(0)
    vp0.write_rows(idx, np.zeros(n, np.uint32), np.ones(n, bool))
    vp1 = batch.get_or_create_column(1)
    pts = np.zeros((n, 2), np.float32)
    pts[0] = (0, 0)
    pts[1] = (3, 2.5)
    pts[2] = (1.5, 3.5)
    pts[3] = (1.5, 4.5)
    valid = np.array([True, True, True, True, False])
    vp1.write_rows(idx, pts, valid)
    shard.live_store.batches[-2147483648] = batch
    shard.live_store.last_read_record = RecordID(-2147483648, 5)
    return QueryService(ms)


def test_geo_intersect_not_in_with_hole_and_null_point(tmp_path):
    svc = _geo_build(tmp_path)
    uuid_list = ", ".join(f"'{u}'" for u in GEO_UUIDS)
    r = _run(svc, {
        "table": "trips",
        "dimensions": [{"sqlExpression": "request_at"}],
        "measures": [{"sqlExpression": "count(1)",
                      "rowFilters":
                          [f"g.geofence_uuid NOT IN ({uuid_list})"]}],
        "joins": [{"table": "geofence", "alias": "g",
                   "conditions":
                       ["geography_intersects(g.shape, request_point)"]}],
        "timeFilter": {"column": "request_at", "from": "1970-01-01",
                       "to": "1970-01-02"},
    })
    # only the point inside shape 3's hole is outside ALL shapes; the null
    # point must not count
    assert r == {"0": 1}


def test_geo_intersect_join_shape_dimension(tmp_path):
    svc = _geo_build(tmp_path)
    uuid_list = ", ".join(f"'{u}'" for u in GEO_UUIDS)
    r = _run(svc, {
        "table": "trips",
        "dimensions": [{"sqlExpression": "request_at"},
                       {"sqlExpression": "g.geofence_uuid"}],
        "measures": [{"sqlExpression": "count(1)",
                      "rowFilters": [f"g.geofence_uuid IN ({uuid_list})"]}],
        "joins": [{"table": "geofence", "alias": "g",
                   "conditions":
                       ["geography_intersects(g.shape, request_point)"]}],
        "timeFilter": {"column": "request_at", "from": "1970-01-01",
                       "to": "1970-01-02"},
    })
    assert r == {"0": {GEO_UUIDS[0]: 1, GEO_UUIDS[1]: 1, GEO_UUIDS[2]: 1}}
