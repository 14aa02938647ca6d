"""Backfill behavioral parity vs the reference's fixture scenario.

Drives OUR full ingest -> archive -> backfill pipeline with the exact
inputs of /root/reference/memstore/backfill_test.go — the 10-row base
archive batch (testing/data/vps/backfill/backfillBase*) and the 13 patch
rows (testing/data/upsert-batches/backfill/upsertBatch0-3) — and asserts
the final day-0 archive content equals the upsert-semantics oracle
(per-PK latest wins, PARTIAL upserts preserve unspecified columns, the
deleted column is skipped, array columns update). The reference spreads
these asserts across in-place/fork/temp-live-store internals; the
end-state rows are the architecture-independent contract.
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
from aresdb_tpu.common.upsert_batch import UpsertBatch, UpsertBatchBuilder
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.archiving import Archiver
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore

UPS = "/root/reference/testing/data/upsert-batches/backfill"
DAY = 86400

SCHEMA = {
    "name": "bf",
    "columns": [
        {"name": "request_at", "type": "Uint32"},   # 0 time
        {"name": "c1", "type": "Uint32"},           # 1 sort, pk
        {"name": "c2", "type": "Uint32"},           # 2 pk
        {"name": "c3", "type": "Uint32"},           # 3 deleted
        {"name": "c4", "type": "Uint32"},           # 4 unsort
        {"name": "c5", "type": "Uint32"},           # 5 sort
        {"name": "c6", "type": "Int16[]"},          # 6 array
    ],
    "primaryKeyColumns": [1, 2],
    "isFactTable": True,
    "archivingSortColumns": [1, 5],
    "config": {"batchSize": 64, "recordRetentionInDays": 0},
}

# backfillBase0-6 expanded (c3 omitted: all-null deleted column)
BASE_ROWS = [
    # c0, c1, c2, c4, c5, c6
    (0, 0, 0, 0, 0, [1, 2, 3]),
    (1, 0, 1, 1, 0, [11, 12]),
    (2, 1, 2, 2, 1, [21]),
    (3, 1, 3, 3, 1, [31, 32]),
    (4, 2, 4, 4, 2, [41, 42, 43]),
    (5, 3, 5, 5, 3, [51, 52]),
    (6, 3, 6, 6, 3, [61, 62]),
    (7, 3, 7, 7, 3, [71, 72]),
    (8, 4, 8, 8, 4, [81, 82]),
    (9, 4, 9, 9, 4, [91, 92]),
]

def _load_upsert_fixture(name):
    """upsert-batch yaml -> (columns [(cid, type_str)], rows [[cell,..]])."""
    with open(f"{UPS}/{name}") as f:
        doc = yaml.safe_load(f)
    cols = [(c["column_id"], c["data_type"]) for c in doc["columns"]]
    rows = []
    for line in doc["rows"]:
        cells = str(line).split(";")
        row = []
        for (cid, tstr), cell in zip(cols, cells):
            cell = cell.strip()
            if tstr.endswith("[]"):
                row.append([int(x) for x in cell.split(",")])
            else:
                row.append(int(cell))
        rows.append(row)
    return cols, rows


def _build_batch(cols, rows):
    b = UpsertBatchBuilder()
    for cid, tstr in cols:
        b.add_column(cid, dt.data_type_from_string(tstr))
    for i, row in enumerate(rows):
        b.add_row()
        for pos, cell in enumerate(row):
            b.set_value(i, pos, cell)
    return UpsertBatch(b.to_bytes())


def _base_batch():
    cols = [(0, "Uint32"), (1, "Uint32"), (2, "Uint32"), (4, "Uint32"),
            (5, "Uint32"), (6, "Int16[]")]
    rows = [[r[0], r[1], r[2], r[3], r[4], r[5]] for r in BASE_ROWS]
    return _build_batch(cols, rows)


def _oracle():
    """Replay reference upsert semantics over the base rows."""
    table = {}
    for c0, c1, c2, c4, c5, c6 in BASE_ROWS:
        table[(c1, c2)] = {0: c0, 1: c1, 2: c2, 4: c4, 5: c5, 6: c6}
    for name in ("upsertBatch0", "upsertBatch1", "upsertBatch2",
                 "upsertBatch3"):
        cols, rows = _load_upsert_fixture(name)
        for row in rows:
            vals = dict(zip((cid for cid, _ in cols), row))
            pk = (vals[1], vals[2])
            rec = table.setdefault(pk, {1: vals[1], 2: vals[2]})
            for cid, v in vals.items():
                if cid == 3:        # deleted column: skipped
                    continue
                rec[cid] = v
    return table


def test_backfill_fixture_scenario(tmp_path):
    ms = MemStore(DiskMetaStore(str(tmp_path)), LocalDiskStore(str(tmp_path)))
    ms.create_table(Table.from_json(SCHEMA))
    ms.init_shards()
    shard = ms.get_table_shard("bf")

    st = shard.save_upsert_batch(_base_batch())
    assert st.inserted == 10

    arch = Archiver(shard, ms.metastore, ms.diskstore)
    arch.archive(DAY)   # all 10 rows -> day-0 archive batch

    # column 3 is deleted AFTER the base is archived (backfill_test.go
    # marks it Deleted in the schema; patches still carry its data)
    ms.get_schema("bf").table.columns[3].deleted = True

    backfilled = 0
    for name in ("upsertBatch0", "upsertBatch1", "upsertBatch2",
                 "upsertBatch3"):
        cols, rows = _load_upsert_fixture(name)
        st = shard.save_upsert_batch(_build_batch(cols, rows))
        backfilled += st.backfilled
    assert backfilled == 13

    applied = arch.backfill()
    assert applied == 13

    # read back the merged day-0 batch through the expanded columns
    version = shard.archive_store.get_current_version()
    batch = version.batches[0]
    got = {}
    cols = {}
    n = batch.size
    for cid in (0, 1, 2, 4, 5, 6):
        vp = batch.request_column(cid)
        assert vp is not None, f"column {cid} missing from day batch"
        vp = vp.expanded()
        if vp.is_list:
            cols[cid] = (vp.list_values, np.asarray(vp.validity))
        else:
            cols[cid] = (np.asarray(vp.values), np.asarray(vp.validity))
    for r in range(n):
        pk = (int(cols[1][0][r]), int(cols[2][0][r]))
        rec = {}
        for cid in (0, 1, 2, 4, 5, 6):
            v, b = cols[cid]
            if not b[r]:
                continue
            rec[cid] = (list(np.asarray(v[r]).ravel()) if cid == 6
                        else int(v[r]))
        got[pk] = rec

    expected = _oracle()
    assert sorted(got) == sorted(expected), (
        f"pk sets differ: extra={set(got) - set(expected)}, "
        f"missing={set(expected) - set(got)}")
    for pk in expected:
        exp = {cid: v for cid, v in expected[pk].items()}
        assert got[pk] == exp, f"row {pk}: {got[pk]} != {exp}"
