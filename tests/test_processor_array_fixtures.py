"""Array-query ProcessQuery parity vs query/aql_processor_array_test.go.

Replays the reference's array processor scenarios through OUR public
MemStore + QueryService path using the reference's own YAML fixtures:
live batches archiving/batch-110 (capacity 6, row 0 below cutoff) and
batch-101 (visible through LastReadRecord (-101, 3)), plus archive batch
archiving/archiveBatch0 (5 rows incl. Int16[]/UUID[] columns) at cutoff
100, then asserts the reference's exact JSON goldens:

- "array element_at should work 1" (:177): element_at(c3, -1)=143
  -> {"120": 2}
- "array element_at should work for uuid" (:219) -> {"120": 2}
- "array contains should work" (:261): contains(c3, 143) -> {"120": 2}
- "array length should work" (:302): length(c3) = 2 -> {"0": 3, "60": 2}
- "array length should work for UUID" (:344) -> {"0": 3, "60": 2}
- "array query for non-aggregation query should work" (:386): array dims
  element_at/length for both item types over live + archive rows.

The non-agg expectation differs from the reference golden BY DESIGN: the
reference's ArrayVectorPartyIterator binds without the filter index vector
(query/binder.hpp:385-394 passes only base pointer + length), so after the
live cutoff filter compacts batch-110's index vector from [1..5] to
positions [0..4], array dimensions read rows 0..4 while scalar dimensions
read rows 1..5 — the golden's array values are shifted one row off their
own time column.  (Its aggregation goldens are consistent with correct
alignment only because user filters run before the cutoff filter, i.e. on
an identity index vector.)  Our mask-carrying executor never compacts, so
arrays stay row-aligned; the non-agg test asserts the CORRECT pairing and
documents the delta inline.
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
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.archive_store import ArchiveBatch
from aresdb_tpu.memstore.common import RecordID
from aresdb_tpu.memstore.live_store import LiveBatch
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.memstore.vector_party import ArchiveVectorParty
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore
from aresdb_tpu.query.service import QueryService

VPS = "/root/reference/testing/data/vps"
BATCHES = "/root/reference/testing/data/batches"

SCHEMA = {
    "name": "table1",
    "columns": [
        {"name": "c0", "type": "Uint32"},
        {"name": "c1", "type": "Bool"},
        {"name": "c2", "type": "Float32"},
        {"name": "c3", "type": "Int16[]"},
        {"name": "c4", "type": "UUID[]"},
    ],
    "primaryKeyColumns": [0],
    "isFactTable": True,
    "archivingSortColumns": [1, 2],
    "config": {"batchSize": 16, "recordRetentionInDays": 0},
}

TYPES = [dt.Uint32, dt.Bool, dt.Float32,
         dt.data_type_from_string("Int16[]"),
         dt.data_type_from_string("UUID[]")]


def _parse_item(tok, item_dt):
    tok = tok.strip()
    if tok == "null":
        return None
    if item_dt == dt.UUID:
        return dt.parse_value(tok, dt.UUID)
    return int(tok)


def _load_vp(name, data_type):
    with open(f"{VPS}/{name}") as f:
        doc = yaml.safe_load(f)
    is_arr = dt.is_array_type(data_type)
    item_dt = dt.item_type(data_type) if is_arr else None
    out, ends = [], []
    for cell in doc["values"]:
        if doc.get("has_counts"):
            s = str(cell)
            body, _, end = s.rpartition(",")
            ends.append(int(end))
            cell = None if body == "null" else body
        if cell is None:
            out.append(None)
        elif is_arr:
            out.append([_parse_item(t, item_dt) for t in str(cell).split(",")])
        elif data_type == dt.Bool:
            out.append(cell if isinstance(cell, bool) else str(cell) == "true")
        elif data_type == dt.Float32:
            out.append(float(np.float32(float(cell))))
        else:
            out.append(int(float(cell)))
    return out, (ends if doc.get("has_counts") else None)


def _expand(rows, ends):
    if not ends:
        return rows
    expanded, prev = [], 0
    for v, e in zip(rows, ends):
        expanded.extend([v] * (e - prev))
        prev = e
    return expanded


def _fill_live_batch(batch, manifest):
    with open(f"{BATCHES}/archiving/{manifest}") as f:
        doc = yaml.safe_load(f)
    cols = [_expand(*_load_vp(name, TYPES[cid]))
            for cid, name in enumerate(doc.get("columns") or [])]
    n = len(cols[0])
    idx = np.arange(n)
    for cid, rows in enumerate(cols):
        vp = batch.get_or_create_column(cid)
        valid = np.array([r is not None for r in rows])
        if dt.is_array_type(TYPES[cid]):
            vp.write_rows(idx, None, valid, rows)
        else:
            npdt = dt.numpy_dtype(TYPES[cid])
            vals = np.array([0 if r is None else r for r in rows], npdt)
            vp.write_rows(idx, vals, valid)
    return n


def _archive_batch0(shard):
    version = shard.archive_store.get_current_version()
    version.archiving_cutoff = 100
    with open(f"{BATCHES}/archiving/archiveBatch0") as f:
        doc = yaml.safe_load(f)
    ab = ArchiveBatch(0, 0, 0, 5, shard.archive_store)
    for cid, vp_name in enumerate(doc["columns"]):
        rows, ends = _load_vp(vp_name, TYPES[cid])
        valid = np.array([r is not None for r in rows])
        if dt.is_array_type(TYPES[cid]):
            vp = ArchiveVectorParty(TYPES[cid], values=None, validity=valid,
                                    list_values=list(rows))
        else:
            npdt = dt.numpy_dtype(TYPES[cid])
            vals = np.array([0 if r is None else r for r in rows], npdt)
            counts = None
            if ends:
                counts = np.zeros(len(ends) + 1, np.uint32)
                counts[1:] = ends
            vp = ArchiveVectorParty(TYPES[cid], values=vals, validity=valid,
                                    counts=counts)
        ab.set_column(cid, vp)
    version.batches[0] = ab


@pytest.fixture
def service(tmp_path):
    ms = MemStore(DiskMetaStore(str(tmp_path)), LocalDiskStore(str(tmp_path)))
    ms.create_table(Table.from_json(SCHEMA))
    ms.init_shards()
    shard = ms.get_table_shard("table1")
    live = shard.live_store

    _archive_batch0(shard)
    live.archiving_cutoff_high_watermark = 100

    b110 = LiveBatch(-110, 16, shard.schema)
    _fill_live_batch(b110, "batch-110")
    live.batches[-110] = b110

    b101 = LiveBatch(-101, 16, shard.schema)
    _fill_live_batch(b101, "batch-101")
    live.batches[-101] = b101

    live.batches[-99] = LiveBatch(-99, 16, shard.schema)
    live.last_read_record = RecordID(-101, 3)
    live.next_write_record = RecordID(-99, 0)
    return QueryService(ms)


def _run(svc, filters=None, dims=None, measure="count(c1)"):
    q = {
        "table": "table1",
        "dimensions": dims or [{"sqlExpression": "c0", "timeBucketizer": "m",
                                "timeUnit": "second"}],
        "measures": [{"sqlExpression": measure}],
        "timeFilter": {"column": "c0", "from": "1970-01-01",
                       "to": "1970-01-02"},
    }
    if filters:
        q["rowFilters"] = filters
    resp = svc.handle_aql({"queries": [q]})
    assert "errors" not in resp or not any(resp["errors"]), resp.get("errors")
    return resp["results"][0]


def test_array_element_at_negative_index(service):
    r = _run(service, filters=["element_at(c3, -1)=143"])
    assert r == {"120": 2}


def test_array_element_at_uuid(service):
    r = _run(service, filters=[
        "element_at(c4, -1)='14000000-0000-0000-0300-000000000000'"])
    assert r == {"120": 2}


def test_array_contains(service):
    r = _run(service, filters=["contains(c3, 143)"])
    assert r == {"120": 2}


def test_array_length(service):
    r = _run(service, filters=["length(c3) = 2"])
    assert r == {"0": 3, "60": 2}


def test_array_length_uuid(service):
    r = _run(service, filters=["length(c4) = 2"])
    assert r == {"0": 3, "60": 2}


def test_array_non_aggregation_dimensions(service):
    r = _run(service, dims=[
        {"sqlExpression": "c0"},
        {"sqlExpression": "element_at(c3, 1)"},
        {"sqlExpression": "length(c3)"},
        {"sqlExpression": "element_at(c4, 1)"},
        {"sqlExpression": "length(c4)"},
    ], measure="1")
    assert r["headers"] == ["c0", "element_at(c3, 1)", "length(c3)",
                            "element_at(c4, 1)", "length(c4)"]
    # Live batch-110 rows 1..5 (row 0 is below cutoff 100), batch-101 rows
    # 0..2, then archive rows — arrays row-aligned with c0 (the reference
    # golden shifts batch-110's arrays one row; see module docstring).
    assert r["matrixData"] == [
        ["100", "121", "2", "12000000-0000-0000-0100-000000000000", "2"],
        ["110", "NULL", "NULL", "NULL", "NULL"],
        ["120", "132", "3", "13000000-0000-0000-0200-000000000000", "3"],
        ["130", "142", "3", "14000000-0000-0000-0200-000000000000", "3"],
        ["140", "NULL", "1", "NULL", "1"],
        ["100", "12", "3", "01000000-0000-0000-0200-000000000000", "3"],
        ["110", "NULL", "2", "NULL", "2"],
        ["120", "NULL", "NULL", "NULL", "NULL"],
        ["0", "312", "2", "03000000-0000-0000-0200-000000000000", "2"],
        ["10", "NULL", "2", "NULL", "2"],
        ["20", "NULL", "1", "NULL", "1"],
        ["30", "541", "2", "06000000-0000-0000-0100-000000000000", "2"],
        ["40", "NULL", "NULL", "NULL", "NULL"],
    ]
