"""Iterator behavior matrix — port of /root/reference/query/iterator_unittest.cu.

The reference's iterator layer resolves (row -> value, null) across VP
modes, widths, compression, and defaults at kernel-read time; this
engine's analogue is the STAGING layer (executor._stage_live_batch /
_stage_archive_batch / _stage_runlen + vector_party.expanded), which
materializes the same logical lanes for the TPU kernels. Each test builds
the reference fixture's storage layout and asserts the staged lanes (or
the run-length mapping) reproduce the reference's expected per-row
(value, null) sequences.
"""

import numpy as np
import pytest

from aresdb_tpu.common import data_types as dt
from aresdb_tpu.memstore.vector_party import (ArchiveVectorParty,
                                              LiveVectorParty)
from aresdb_tpu.query import runlen as RL


# ---------------------------------------------------------------------------
# VectorPartyIteratorTest: width upcasts preserve exact values incl. signs
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("data_type,vals", [
    (dt.Uint32, [1000000000, 10000, 0, 10000, 1000000000]),
    (dt.Uint16, [1000, 10, 0, 10, 1000]),
    (dt.Uint8, [10, 1, 0, 1, 10]),
    (dt.Int32, [-1000000000, -10000, 0, 10000, 1000000000]),
    (dt.Int16, [-1000, -10, 0, 10, 1000]),
    (dt.Int8, [-10, -1, 0, 1, 10]),
    (dt.Float32, [-1000.5, -10.25, 0.0, 10.25, 1000.5]),
    (dt.Bool, [True, False, True, False, True]),
])
def test_width_upcast_preserves_values(data_type, vals):
    """CheckUintIterator / CheckIntIterator / CheckFloatIterator: every
    storage width reads back exact (upcast to the compute lane)."""
    from aresdb_tpu.query.kernels import _EvalCtx, _emit
    from aresdb_tpu.query import expr as E
    import jax.numpy as jnp

    vp = LiveVectorParty(8, data_type)
    arr = np.asarray(vals, dt.numpy_dtype(data_type))
    vp.write_rows(np.arange(5), arr, np.ones(5, bool))
    staged_v = jnp.asarray(vp.values[:5])
    staged_b = jnp.asarray(vp.validity[:5])
    node = E.VarRef(val="c", type=E.UNKNOWN_TYPE, table_id=0, column_id=0,
                    data_type=data_type)
    out = _emit(node, _EvalCtx({(0, 0): (staged_v, staged_b)}, (), 5), None)
    got = np.asarray(out.value)
    if data_type == dt.Float32:
        assert got.dtype == np.float32
        np.testing.assert_array_equal(got, np.asarray(vals, np.float32))
    elif data_type == dt.Bool:
        assert got.dtype == np.bool_
        assert got.tolist() == vals
    else:
        assert got.dtype == np.int32
        assert got.tolist() == vals
    assert np.asarray(out.valid).all()


def test_null_lane_reads_invalid():
    """CheckNullOffset: rows whose validity bit is clear read as null."""
    vp = LiveVectorParty(8, dt.Uint32)
    vp.write_rows(np.arange(4), np.arange(4, dtype=np.uint32),
                  np.array([True, False, True, False]))
    assert vp.read_value(0) == 0
    assert vp.read_value(1) is None
    assert vp.read_value(2) == 2
    assert vp.read_value(3) is None


# ---------------------------------------------------------------------------
# Mode-0 (all default) columns: ConstantIterator analogue
# ---------------------------------------------------------------------------

def test_default_column_with_default_value():
    from aresdb_tpu.query.executor import _default_column
    from aresdb_tpu.common.schema import Column

    col = Column.from_json({"name": "c", "type": "Uint16",
                            "defaultValue": "7"})
    v, b = _default_column(col, 4)
    assert np.asarray(v).tolist() == [7, 7, 7, 7]
    assert np.asarray(b).all()


def test_default_column_without_default_is_null():
    from aresdb_tpu.query.executor import _default_column
    from aresdb_tpu.common.schema import Column

    col = Column.from_json({"name": "c", "type": "Uint16"})
    v, b = _default_column(col, 4)
    assert not np.asarray(b).any()


# ---------------------------------------------------------------------------
# CompressedColumnTest: mode-3 iteration via counts
# ---------------------------------------------------------------------------

def _mode3(values, counts, valid=None):
    values = np.asarray(values, np.int32)
    if valid is None:
        valid = np.ones(len(values), bool)
    return ArchiveVectorParty(dt.Int32, values=values,
                              validity=np.asarray(valid, bool),
                              counts=np.asarray(counts, np.uint32))


def test_compressed_expand_check_count_pointer():
    """CheckCountPointer: counts {0,4,8} values {2,3} -> uncompressed
    2 2 2 2 3 3 3 3, all valid."""
    vp = _mode3([2, 3], [0, 4, 8])
    ex = vp.expanded()
    assert ex.values.tolist() == [2, 2, 2, 2, 3, 3, 3, 3]
    assert ex.validity.all()
    assert vp.num_rows == 8


def test_compressed_runlen_boundaries_and_values():
    """The run-length staging's composite boundaries + per-run values must
    reproduce the count-pointer mapping WITHOUT expansion."""
    vp = _mode3([2, 3], [0, 4, 8])
    b = RL.composite_boundaries({0: vp}, (0,), 0, 8)
    assert b.tolist() == [0, 4, 8]
    vals, valid = RL.run_values_at(vp, b[:-1], None)
    assert vals.tolist() == [2, 3]
    assert valid.tolist() == [True, True]


def test_compressed_runlen_start_count_slice():
    """CheckStartCount: a row slice [4, 8) into runs {2:[0,4), 3:[4,8)}
    maps to the second run only; a mid-run slice [2, 6) straddles both."""
    vp = _mode3([2, 3], [0, 4, 8])
    b = RL.composite_boundaries({0: vp}, (0,), 4, 8)
    assert b.tolist() == [4, 8]
    vals, _ = RL.run_values_at(vp, b[:-1], None)
    assert vals.tolist() == [3]

    b = RL.composite_boundaries({0: vp}, (0,), 2, 6)
    assert b.tolist() == [2, 4, 6]
    vals, _ = RL.run_values_at(vp, b[:-1], None)
    assert vals.tolist() == [2, 3]


def test_compressed_null_run():
    """A null run (validity bit clear) expands to null rows and stages a
    per-run invalid lane."""
    vp = _mode3([5, 0, 7], [0, 2, 5, 6], valid=[True, False, True])
    ex = vp.expanded()
    assert ex.values.tolist() == [5, 5, 0, 0, 0, 7]
    assert ex.validity.tolist() == [True, True, False, False, False, True]
    b = RL.composite_boundaries({0: vp}, (0,), 0, 6)
    vals, valid = RL.run_values_at(vp, b[:-1], None)
    assert vals.tolist() == [5, 0, 7]
    assert valid.tolist() == [True, False, True]


def test_composite_boundaries_union_of_two_columns():
    """Two compressed columns with different run structure: composite
    boundaries are the union; each column is constant within every
    composite run."""
    a = _mode3([1, 2], [0, 4, 8])
    b = _mode3([10, 20, 30], [0, 2, 5, 8])
    bounds = RL.composite_boundaries({0: a, 1: b}, (0, 1), 0, 8)
    assert bounds.tolist() == [0, 2, 4, 5, 8]
    va, _ = RL.run_values_at(a, bounds[:-1], None)
    vb, _ = RL.run_values_at(b, bounds[:-1], None)
    assert va.tolist() == [1, 1, 2, 2]
    assert vb.tolist() == [10, 20, 20, 30]


# ---------------------------------------------------------------------------
# ArrayVectorPartyIteratorTest: padded ragged staging lanes
# ---------------------------------------------------------------------------

def test_array_staging_lanes():
    from aresdb_tpu.query.executor import _pad_array_column

    rows = [[1, 2], [1], [1, 2, 3], None, [], [5, None, 7]]
    validity = np.array([True, True, True, False, True, True])
    items, item_valid, lengths, row_valid = _pad_array_column(
        rows, validity, 8, dt.ArrayInt32)
    items = np.asarray(items)
    item_valid = np.asarray(item_valid)
    assert np.asarray(lengths).tolist()[:6] == [2, 1, 3, 0, 0, 3]
    assert np.asarray(row_valid).tolist()[:6] == [
        True, True, True, False, True, True]
    assert items[0, :2].tolist() == [1, 2]
    assert items[2, :3].tolist() == [1, 2, 3]
    # null ELEMENT: value slot invalid, row stays valid
    assert item_valid[5].tolist()[:3] == [True, False, True]
    assert items[5, 2] == 7


# ---------------------------------------------------------------------------
# IndexCountIterator / prefilter slicing over compressed entries
# ---------------------------------------------------------------------------

def test_prefilter_compressed_equality_rows():
    """Equality prefilter over a mode-3 sorted column narrows to the run's
    exact ROW range via entry search + base counts (iterator.hpp:214)."""
    from aresdb_tpu.query.executor import ShardExecutor

    vp = _mode3([2, 3, 5], [0, 4, 6, 9])
    stats = {}
    lo, hi = ShardExecutor._prefilter_slice(
        [(0, "=", 3)], {0: vp}, 9, stats)
    assert (lo, hi) == (4, 6)
    lo, hi = ShardExecutor._prefilter_slice(
        [(0, ">=", 3)], {0: vp}, 9, stats)
    assert (lo, hi) == (4, 9)
    lo, hi = ShardExecutor._prefilter_slice(
        [(0, "<", 5)], {0: vp}, 9, stats)
    assert (lo, hi) == (0, 6)
    lo, hi = ShardExecutor._prefilter_slice(
        [(0, "=", 4)], {0: vp}, 9, stats)
    assert hi <= lo  # no matching run -> empty slice
