"""Column update-mode matrix — reference ingestion parity.

Table-driven over every ColumnUpdateMode x (old null?/value) x (new
null?/value) combination, matching the reference's documented semantics
(memstore/common/upsert_batch_builder.go:31-40 and ingestion_test.go):

  OVERWRITE_NOT_NULL  new null -> keep old; else overwrite
  FORCE_OVERWRITE     always write (null nulls the cell out)
  WITH_ADDITION       new null -> skip; old null counts as 0
  WITH_MIN            new null -> skip; old null counts as +inf/MAX_INT
  WITH_MAX            new null -> skip; old null counts as -inf/MIN_INT

Runs through the PUBLIC ingestion surface (save_upsert_batch) so both the
python and native classify paths (ARES_NATIVE suite variants) cover it,
for scalar Int32, Float32, and array columns where applicable.
"""

import numpy as np
import pytest

from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common import upsert_batch as ub
from aresdb_tpu.common.schema import Table
from aresdb_tpu.common.upsert_batch import UpsertBatch, UpsertBatchBuilder
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore

SCHEMA = {
    "name": "modes",
    "columns": [
        {"name": "id", "type": "Uint32"},
        {"name": "i", "type": "Int32"},
        {"name": "f", "type": "Float32"},
        {"name": "arr", "type": "Int16[]"},
    ],
    "primaryKeyColumns": [0],
    "isFactTable": False,
    "config": {"batchSize": 64},
}


@pytest.fixture()
def shard(tmp_path):
    ms = MemStore(DiskMetaStore(str(tmp_path)), LocalDiskStore(str(tmp_path)))
    ms.create_table(Table.from_json(SCHEMA))
    ms.init_shards()
    return ms.get_table_shard("modes")


def _ingest(shard, rows, mode=ub.UPDATE_OVERWRITE_NOT_NULL,
            with_array=False):
    """rows: [(id, i, f)] or [(id, i, f, arr)]; None = null cell."""
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint32)
    b.add_column(1, dt.Int32, update_mode=mode)
    b.add_column(2, dt.Float32, update_mode=mode)
    if with_array:
        b.add_column(3, dt.data_type_from_string("Int16[]"),
                     update_mode=mode)
    for r, row in enumerate(rows):
        b.add_row()
        for c, v in enumerate(row):
            if v is not None:
                b.set_value(r, c, v)
    return shard.save_upsert_batch(UpsertBatch(b.to_bytes()))


def _cell(shard, rid, cid):
    rec = shard.live_store.primary_key.find(
        np.array([rid], np.uint32).tobytes())
    assert rec is not None
    return shard.read_value(rec, cid)


# (mode, old, new, expected) for the scalar Int32 column
CASES = [
    (ub.UPDATE_OVERWRITE_NOT_NULL, 5, 7, 7),
    (ub.UPDATE_OVERWRITE_NOT_NULL, 5, None, 5),       # null skipped
    (ub.UPDATE_OVERWRITE_NOT_NULL, None, 7, 7),
    (ub.UPDATE_FORCE_OVERWRITE, 5, 7, 7),
    (ub.UPDATE_FORCE_OVERWRITE, 5, None, None),       # null nulls out
    (ub.UPDATE_FORCE_OVERWRITE, None, 7, 7),
    (ub.UPDATE_WITH_ADDITION, 5, 7, 12),
    (ub.UPDATE_WITH_ADDITION, 5, None, 5),            # null skipped
    (ub.UPDATE_WITH_ADDITION, None, 7, 7),            # old null == 0
    (ub.UPDATE_WITH_ADDITION, -5, 7, 2),
    (ub.UPDATE_WITH_MIN, 5, 7, 5),
    (ub.UPDATE_WITH_MIN, 7, 5, 5),
    (ub.UPDATE_WITH_MIN, 5, None, 5),
    (ub.UPDATE_WITH_MIN, None, 7, 7),                 # old null == MAX_INT
    (ub.UPDATE_WITH_MIN, -3, -9, -9),
    (ub.UPDATE_WITH_MAX, 5, 7, 7),
    (ub.UPDATE_WITH_MAX, 7, 5, 7),
    (ub.UPDATE_WITH_MAX, 5, None, 5),
    (ub.UPDATE_WITH_MAX, None, 5, 5),                 # old null == MIN_INT
    (ub.UPDATE_WITH_MAX, -9, -3, -3),
]


@pytest.mark.parametrize("mode,old,new,expected", CASES)
def test_scalar_update_mode(shard, mode, old, new, expected):
    _ingest(shard, [(1, old, float(old) if old is not None else None)])
    st = _ingest(shard, [(1, new, float(new) if new is not None else None)],
                 mode=mode)
    assert st.updated == 1
    assert _cell(shard, 1, 1) == expected
    f = _cell(shard, 1, 2)
    assert f == (None if expected is None else pytest.approx(float(expected)))


def test_array_update_modes(shard):
    _ingest(shard, [(1, 0, 0.0, [1, 2])], with_array=True)
    # OVERWRITE_NOT_NULL: null array skipped, value overwrites
    _ingest(shard, [(1, 0, 0.0, None)], with_array=True)
    assert _cell(shard, 1, 3) == [1, 2]
    _ingest(shard, [(1, 0, 0.0, [3])], with_array=True)
    assert _cell(shard, 1, 3) == [3]
    # FORCE_OVERWRITE: null array nulls the cell
    _ingest(shard, [(1, 0, 0.0, None)], mode=ub.UPDATE_FORCE_OVERWRITE,
            with_array=True)
    assert _cell(shard, 1, 3) is None


def test_duplicate_dests_in_one_batch_apply_in_order(shard):
    """Rows hitting the same PK within one batch apply sequentially —
    the LAST row wins for overwrite, and additions accumulate."""
    _ingest(shard, [(1, 10, 10.0)])
    _ingest(shard, [(1, 1, 1.0), (1, 2, 2.0), (1, 3, 3.0)],
            mode=ub.UPDATE_WITH_ADDITION)
    assert _cell(shard, 1, 1) == 16
    _ingest(shard, [(2, 1, 1.0), (2, 9, 9.0)])
    assert _cell(shard, 2, 1) == 9


def test_primary_key_immutable_on_update(shard):
    _ingest(shard, [(1, 5, 5.0)])
    st = _ingest(shard, [(1, 6, 6.0)])
    assert st.updated == 1 and st.inserted == 0
    assert _cell(shard, 1, 0) == 1


def test_invalid_update_mode_rejected():
    b = UpsertBatchBuilder()
    with pytest.raises(ValueError):
        b.add_column(1, dt.Int32, update_mode=ub.MAX_COLUMN_UPDATE_MODE)


def test_mixed_modes_per_column(shard):
    """Different columns in ONE batch carry different update modes."""
    _ingest(shard, [(1, 10, 10.0)])
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint32)
    b.add_column(1, dt.Int32, update_mode=ub.UPDATE_WITH_ADDITION)
    b.add_column(2, dt.Float32, update_mode=ub.UPDATE_WITH_MIN)
    b.add_row()
    b.set_value(0, 0, 1)
    b.set_value(0, 1, 5)
    b.set_value(0, 2, 4.0)
    shard.save_upsert_batch(UpsertBatch(b.to_bytes()))
    assert _cell(shard, 1, 1) == 15
    assert _cell(shard, 1, 2) == pytest.approx(4.0)
