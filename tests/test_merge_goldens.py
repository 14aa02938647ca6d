"""Archive merge vs the reference's golden fixtures.

Loads the reference's own YAML vector-party fixtures
(/root/reference/testing/data/vps, batches) — the exact inputs and golden
outputs of memstore/merge_test.go — and asserts our streaming day merge
(_StreamingDayMerge) produces the same merged batch: same row order, same
values/nulls, and the same mode-3 run boundaries on every sort column.

Scenarios covered (merge_test.go):
  - "merge": base archiveBatch (5 rows) + 8-row live patch -> mergedBatch (13)
  - "merge with nil base": patch only -> merge-nil-base goldens
  - "no sort columns": plain concat -> no-sort-columns/mergedBatch
(The deleted-rows/deleted-columns variants exercise reference backfill
machinery our merge expresses differently; they are covered behaviorally by
tests/test_archiving.py and tests/test_streaming_merge.py.)
"""

import numpy as np
import pytest
import yaml
import os

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/testing/data"),
    reason="reference fixtures not available")

from aresdb_tpu.common import data_types as mdt
from aresdb_tpu.common.schema import Table, TableSchema
from aresdb_tpu.memstore.archiving import _StreamingDayMerge
from aresdb_tpu.memstore.vector_party import ArchiveVectorParty

VPS = "/root/reference/testing/data/vps"
BATCHES = "/root/reference/testing/data/batches"

_DT = {"Bool": mdt.Bool, "Int8": mdt.Int8, "Uint8": mdt.Uint8,
       "Int16": mdt.Int16, "Uint16": mdt.Uint16,
       "Uint32": mdt.Uint32, "Int32": mdt.Int32, "Int64": mdt.Int64,
       "Float32": mdt.Float32, "SmallEnum": mdt.SmallEnum,
       "BigEnum": mdt.BigEnum}


def _parse_cell(cell, npdt):
    """One yaml cell -> (value, valid). Cells: 100 / null / false / '0.0,3'."""
    if cell is None:
        return npdt.type(0), False
    if isinstance(cell, bool):
        return npdt.type(cell), True
    if isinstance(cell, str):
        s = cell.strip()
        if s == "null":
            return npdt.type(0), False
        if s in ("true", "false"):
            return npdt.type(s == "true"), True
        return npdt.type(float(s) if npdt.kind == "f" else int(float(s))), True
    return npdt.type(cell), True


def load_vp(name):
    """Reference VP yaml -> (data_type, values, validity, counts|None).

    has_counts entries are 'value,cum_end' pairs (the reference test
    factory's count column, memstore/tests/test_factory_base.go).
    """
    with open(f"{VPS}/{name}") as f:
        doc = yaml.safe_load(f)
    dt = _DT[doc["data_type"]]
    npdt = np.dtype(mdt.numpy_dtype(dt))
    cells = doc["values"]
    if doc.get("has_counts"):
        vals, valid, ends = [], [], []
        for cell in cells:
            s = str(cell)
            body, _, end = s.rpartition(",")
            v, ok = _parse_cell(body, npdt)
            vals.append(v)
            valid.append(ok)
            ends.append(int(end))
        counts = np.zeros(len(ends) + 1, np.uint32)
        counts[1:] = ends
        return dt, np.asarray(vals, npdt), np.asarray(valid, bool), counts
    vals, valid = [], []
    for cell in cells:
        v, ok = _parse_cell(cell, npdt)
        vals.append(v)
        valid.append(ok)
    return dt, np.asarray(vals, npdt), np.asarray(valid, bool), None


def load_batch(name):
    """Batch manifest -> {cid: (dt, values, validity, counts)}."""
    with open(f"{BATCHES}/{name}") as f:
        doc = yaml.safe_load(f)
    return {cid: load_vp(vp) for cid, vp in enumerate(doc["columns"])}


def expand(values, validity, counts):
    if counts is None:
        return values, validity
    reps = np.diff(counts.astype(np.int64))
    return np.repeat(values, reps), np.repeat(validity, reps)


class _StubBatch:
    """Duck-typed archive day batch: request_column + size."""

    def __init__(self, cols, size):
        self._cols = cols
        self.size = size

    def request_column(self, cid):
        return self._cols.get(cid)


def _schema(col_types, sort_cols):
    cols = [{"name": f"c{i}", "type": t} for i, t in enumerate(col_types)]
    cols[0]["name"] = "request_at"
    return TableSchema(Table.from_json({
        "name": "merge_fixture",
        "columns": cols,
        "primaryKeyColumns": [0],
        "isFactTable": True,
        "archivingSortColumns": sort_cols,
        "config": {"batchSize": 16},
    }))


# merge_test.go:360 newMergeContext column types (the yaml files spell
# column 4 Uint32; the test passes Int32 — values are identical either way)
COL_TYPES = ["Uint32", "Bool", "Float32", "Bool", "Int32", "Bool"]
SORT_COLS = [1, 2, 3, 4]


def _to_archive_batch(fix, schema):
    cols = {}
    size = 0
    for cid, (dt, vals, valid, counts) in fix.items():
        npdt = np.dtype(mdt.numpy_dtype(schema.table.columns[cid].data_type))
        vp = ArchiveVectorParty(schema.table.columns[cid].data_type,
                                values=vals.astype(npdt),
                                validity=valid, counts=counts)
        cols[cid] = vp
        size = max(size, vp.num_rows)
    return _StubBatch(cols, size)


def _patch_from(*batch_names):
    """Concat live-batch fixtures row-wise -> {cid: (values, validity)}."""
    fixes = [load_batch(n) for n in batch_names]
    out = {}
    for cid in fixes[0]:
        vs, bs = [], []
        for fix in fixes:
            dt, vals, valid, counts = fix[cid]
            assert counts is None, "live patches are uncompressed"
            vs.append(vals)
            bs.append(valid)
        out[cid] = (np.concatenate(vs), np.concatenate(bs))
    return out


def _cast_patch(patch, schema):
    return {cid: (v.astype(mdt.numpy_dtype(
        schema.table.columns[cid].data_type)), b)
        for cid, (v, b) in patch.items()}


def _run_merge(base_fix, patch, schema, sort_cols):
    dtypes = {i: c.data_type for i, c in enumerate(schema.table.columns)}
    base = _to_archive_batch(base_fix, schema) if base_fix else None
    n_patch = len(next(iter(patch.values()))[0])
    m = _StreamingDayMerge(base, patch, n_patch, sort_cols, schema, dtypes)
    return {cid: m.merged_column(cid) for cid in patch}, m.n_total


def _assert_golden(merged, golden_fix, sort_cols):
    for cid, vp in merged.items():
        gdt, gvals, gvalid, gcounts = golden_fix[cid]
        if cid in sort_cols:
            # run-level comparison: golden sort columns are stored as runs;
            # all-null ones are mode-pruned (no counts, just the run count —
            # merge_test.go asserts values/nulls/counts nil + length)
            assert vp.counts is not None, f"column {cid} not compressed"
            np.testing.assert_array_equal(
                vp.validity, gvalid, err_msg=f"column {cid} run validity")
            np.testing.assert_array_equal(
                np.where(gvalid, vp.values.astype(np.float64), 0),
                np.where(gvalid, gvals.astype(np.float64), 0),
                err_msg=f"column {cid} run values")
            if gcounts is not None:
                np.testing.assert_array_equal(
                    vp.counts, gcounts,
                    err_msg=f"column {cid} mode-3 run boundaries")
        else:
            ev, eb = expand(vp.values, vp.validity, vp.counts)
            gv, gb = expand(gvals, gvalid, gcounts)
            np.testing.assert_array_equal(
                eb, gb, err_msg=f"column {cid} validity")
            np.testing.assert_array_equal(
                np.where(eb, ev.astype(np.float64), 0),
                np.where(gb, gv.astype(np.float64), 0),
                err_msg=f"column {cid} values")


def test_merge_golden():
    """merge_test.go "merge": 5-row base + 8-row patch -> 13-row golden."""
    base = load_batch("archiveBatch")
    patch = _cast_patch(_patch_from("patchBatch0", "patchBatch1"),
                        _schema(COL_TYPES, SORT_COLS))
    schema = _schema(COL_TYPES, SORT_COLS)
    merged, n_total = _run_merge(base, patch, schema, SORT_COLS)
    assert n_total == 13
    _assert_golden(merged, load_batch("mergedBatch"), SORT_COLS)


def test_merge_nil_base_golden():
    """merge_test.go "merge with nil base": patch only -> golden."""
    schema = _schema(COL_TYPES, SORT_COLS)
    patch = _cast_patch(_patch_from("patchBatch0", "patchBatch1"), schema)
    merged, n_total = _run_merge(None, patch, schema, SORT_COLS)
    assert n_total == 8
    _assert_golden(merged, load_batch("merge-nil-base"), SORT_COLS)


def test_merge_no_sort_columns_golden():
    """merge_test.go "no sort columns": base and patch concatenate."""
    base = load_batch("no-sort-columns/baseBatch")
    raw_patch = _patch_from("no-sort-columns/patchBatch")
    # column 1 was added AFTER the base batch was archived — the schema
    # comes from the patch; the base stub simply lacks the new column's VP
    inv = {v: k for k, v in _DT.items()}
    fixes = load_batch("no-sort-columns/patchBatch")
    types = [inv[fixes[i][0]] for i in range(len(fixes))]
    schema = _schema(types, [])
    patch = _cast_patch(raw_patch, schema)
    merged, n_total = _run_merge(base, patch, schema, [])
    golden = load_batch("no-sort-columns/mergedBatch")
    g_rows = max(expand(*golden[c][1:])[0].shape[0] for c in golden)
    assert n_total == g_rows
    _assert_golden(merged, golden, [])


def test_serializer_fixture_roundtrip():
    """The reference's serializer fixtures (vps/serializer, the mode 0-3
    representative VPs of memstore/vector_party_serializer_test.go)
    round-trip through OUR VP serializer with logical content and
    storage mode preserved."""
    from aresdb_tpu.memstore.vector_party import (
        ArchiveVectorParty, MODE_ALL_DEFAULT, MODE_ALL_PRESENT,
        MODE_HAS_NULLS, MODE_COMPRESSED)

    expect_mode = {
        "serializer/mode0_int8": MODE_ALL_DEFAULT,
        "serializer/mode1_bool": MODE_ALL_PRESENT,
        "serializer/mode2_int8": MODE_HAS_NULLS,
        "serializer/mode3_int8": MODE_COMPRESSED,
    }
    for name, mode in expect_mode.items():
        dt_, vals, valid, counts = load_vp(name)
        vp = ArchiveVectorParty(dt_, values=vals, validity=valid,
                                counts=counts)
        assert vp.mode == mode, name
        back = ArchiveVectorParty.from_bytes(vp.to_bytes())
        assert back.mode == mode, name
        ev, eb = expand(np.asarray(back.values), np.asarray(back.validity),
                        back.counts)
        gv, gb = expand(vals, valid, counts)
        np.testing.assert_array_equal(eb, gb, err_msg=name)
        np.testing.assert_array_equal(np.where(eb, ev, 0),
                                      np.where(gb, gv, 0), err_msg=name)
