"""Archiving job parity vs the reference's fixture scenario.

Replays memstore/archiving_test.go "archiving should work": base archive
batch archiving/archiveBatch0 (5 rows, cutoff 100), live batches -110 /
-101 / -99 with LastReadRecord at (-101, 3) — so batch -110 is fully
visible, -101 is visible up to row 3, -99 is invisible — and cutoff
advanced to 140. Exactly 7 live records (event time in [100, 140)) must
merge with the base into a 12-row day-0 batch, compared column-by-column
(including Int16[] and UUID[] arrays with NULL ITEMS inside lists)
against a python oracle implementing the archive sort order (null first,
then value; ties keep base rows before patch rows).
"""

import numpy as np
import pytest
import yaml
import os

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/testing/data"),
    reason="reference fixtures not available")

from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common.schema import Table
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.archive_store import ArchiveBatch
from aresdb_tpu.memstore.archiving import Archiver
from aresdb_tpu.memstore.live_store import LiveBatch
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.memstore.common import RecordID
from aresdb_tpu.memstore.vector_party import ArchiveVectorParty
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore

VPS = "/root/reference/testing/data/vps"
BATCHES = "/root/reference/testing/data/batches"

SCHEMA = {
    "name": "table1",
    "columns": [
        {"name": "request_at", "type": "Uint32"},
        {"name": "c1", "type": "Bool"},
        {"name": "c2", "type": "Float32"},
        {"name": "a16", "type": "Int16[]"},
        {"name": "auuid", "type": "UUID[]"},
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
    """-> (rows as list of python values; None = null cell, counts or None).

    Array cells: 'a,b' = items (null = null ITEM); bare null = null array.
    """
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


def _load_batch_rows(manifest):
    """Batch manifest -> per-column row lists (expanded)."""
    with open(f"{BATCHES}/archiving/{manifest}") as f:
        doc = yaml.safe_load(f)
    cols = []
    for cid, vp_name in enumerate(doc.get("columns") or []):
        rows, ends = _load_vp(vp_name, TYPES[cid])
        if ends:
            expanded = []
            prev = 0
            for v, e in zip(rows, ends):
                expanded.extend([v] * (e - prev))
                prev = e
            rows = expanded
        cols.append(rows)
    return cols


def _fill_live_batch(batch, cols):
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


def _base_archive_batch(store_version, shard):
    with open(f"{BATCHES}/archiving/archiveBatch0") as f:
        doc = yaml.safe_load(f)
    ab = ArchiveBatch(0, 100, 0, 5, shard.archive_store)
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
    store_version.batches[0] = ab
    return ab


def _sort_key(row):
    """Archive order over sort columns [1, 2]: null first, then value."""
    def col_key(v, as_float=False):
        if v is None:
            return (0, 0)
        return (1, float(v) if as_float else int(v))
    return (col_key(row[1]), col_key(row[2], as_float=True))


def test_archiving_fixture_scenario(tmp_path):
    ms = MemStore(DiskMetaStore(str(tmp_path)), LocalDiskStore(str(tmp_path)))
    ms.create_table(Table.from_json(SCHEMA))
    ms.init_shards()
    shard = ms.get_table_shard("table1")
    live = shard.live_store

    version = shard.archive_store.get_current_version()
    version.archiving_cutoff = 100
    _base_archive_batch(version, shard)
    live.archiving_cutoff_high_watermark = 100

    batch_rows = {}
    for bid, manifest in ((-110, "batch-110"), (-101, "batch-101"),
                          (-99, "batch-99")):
        cols = _load_batch_rows(manifest)
        batch_rows[bid] = cols
        if not cols:
            live.batches[bid] = LiveBatch(bid, 16, shard.schema)
            continue
        b = LiveBatch(bid, max(16, len(cols[0])), shard.schema)
        _fill_live_batch(b, cols)
        live.batches[bid] = b
    # reference setup: LastReadRecord = (-101, 3): -110 fully visible,
    # -101 visible up to row 3, -99 invisible
    live.last_read_record = RecordID(-101, 3)
    live.next_write_record = RecordID(-99, 0)

    arch = Archiver(shard, ms.metastore, ms.diskstore)
    stats = arch.archive(140)
    assert stats.rows_archived == 7
    assert stats.days == 1

    merged = shard.archive_store.get_current_version().batches[0]
    assert merged.size == 12

    # oracle: base rows (archive order preserved) + the 7 visible live
    # records with t in [100, 140), merged by null-first sort on [1, 2]
    base_rows = list(zip(*_load_batch_rows("archiveBatch0")))
    patch = []
    for bid, upto in ((-110, 5), (-101, 3)):
        cols = batch_rows[bid]
        for r in range(upto):
            row = tuple(c[r] for c in cols)
            if row[0] is not None and 100 <= row[0] < 140:
                patch.append(row)
    assert len(patch) == 7
    patch.sort(key=_sort_key)          # stable: patch order kept on ties
    all_rows = sorted(base_rows + patch, key=lambda r: (_sort_key(r),))
    # python sort is stable and base rows precede patch in the input list,
    # matching the merge's base-before-patch tie rule
    assert len(all_rows) == 12

    got = []
    for cid in range(5):
        vp = merged.request_column(cid).expanded()
        col = []
        for r in range(12):
            col.append(vp.read_value(r))
        got.append(col)
    got_rows = list(zip(*got))

    for r, (g, e) in enumerate(zip(got_rows, all_rows)):
        for cid in range(5):
            gv, ev = g[cid], e[cid]
            if cid == 2 and gv is not None and ev is not None:
                assert gv == pytest.approx(ev), (r, cid)
            elif dt.is_array_type(TYPES[cid]) and gv is not None:
                assert list(gv) == list(ev), (r, cid, gv, ev)
            else:
                assert gv == ev, (r, cid, gv, ev)

    # time column: all values present (archiving_test.go asserts mode 1)
    tvp = merged.request_column(0)
    assert np.asarray(tvp.expanded().validity).all()
    # sort columns are mode-3 compressed
    assert merged.request_column(1).is_compressed
    assert merged.request_column(2).is_compressed
