"""UpsertBatch wire format round-trip tests.

Parity target: memstore/common/upsert_batch_test.go /
upsert_batch_builder_test.go behaviors (modes 0/1/2, bit-packed bools,
alignment, arrays).
"""

import struct

import numpy as np
import pytest

from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common.upsert_batch import (
    ALL_VALUES_DEFAULT,
    ALL_VALUES_PRESENT,
    HAS_NULL_VECTOR,
    UPDATE_FORCE_OVERWRITE,
    UPDATE_WITH_ADDITION,
    V1,
    UpsertBatch,
    UpsertBatchBuilder,
)


def test_empty_batch():
    b = UpsertBatchBuilder()
    data = b.to_bytes()
    batch = UpsertBatch(data)
    assert batch.num_rows == 0
    assert batch.num_columns == 0
    # version magic in header
    assert struct.unpack_from("<I", data, 0)[0] == V1


def test_single_column_all_present():
    b = UpsertBatchBuilder()
    b.add_column(3, dt.Uint32)
    for i in range(5):
        b.add_row()
        b.set_value(i, 0, i * 10)
    batch = UpsertBatch(b.to_bytes())
    assert batch.num_rows == 5
    col = batch.columns[0]
    assert col.column_id == 3
    assert col.data_type == dt.Uint32
    assert col.mode == ALL_VALUES_PRESENT
    np.testing.assert_array_equal(col.values, [0, 10, 20, 30, 40])
    assert col.validity.all()


def test_null_vector_mode():
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Int16)
    for i in range(4):
        b.add_row()
    b.set_value(0, 0, -5)
    b.set_value(2, 0, 7)
    batch = UpsertBatch(b.to_bytes())
    col = batch.columns[0]
    assert col.mode == HAS_NULL_VECTOR
    np.testing.assert_array_equal(col.validity, [True, False, True, False])
    assert col.get_value(0) == -5
    assert col.get_value(1) is None
    assert col.get_value(2) == 7


def test_all_default_mode():
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint8)
    b.add_column(1, dt.Uint32)
    b.add_row()
    b.add_row()
    b.set_value(0, 1, 42)
    b.set_value(1, 1, 43)
    batch = UpsertBatch(b.to_bytes())
    assert batch.columns[0].mode == ALL_VALUES_DEFAULT
    assert batch.columns[0].get_value(0) is None
    assert batch.columns[1].mode == ALL_VALUES_PRESENT


def test_bool_bit_packing():
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Bool)
    vals = [True, False, True, True, False, False, True, False, True]
    for i, v in enumerate(vals):
        b.add_row()
        b.set_value(i, 0, v)
    batch = UpsertBatch(b.to_bytes())
    np.testing.assert_array_equal(batch.columns[0].values, vals)


def test_uuid_and_geopoint():
    b = UpsertBatchBuilder()
    b.add_column(0, dt.UUID)
    b.add_column(1, dt.GeoPoint)
    b.add_row()
    b.set_value(0, 0, "d585cc25-5ca9-4655-855d-dcb94a0b9f04")
    b.set_value(0, 1, "Point(11.1 22.2)")
    batch = UpsertBatch(b.to_bytes())
    hi, lo = batch.get_value(0, 0)
    assert dt.uuid_to_string(hi, lo) == "d585cc25-5ca9-4655-855d-dcb94a0b9f04"
    lat, lng = batch.get_value(0, 1)
    # WKT order is Point(lng lat); internal storage is (lat, lng)
    assert abs(lat - 22.2) < 1e-5 and abs(lng - 11.1) < 1e-5


def test_multi_column_mixed_modes():
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint32)   # time col, all present
    b.add_column(1, dt.SmallEnum)
    b.add_column(2, dt.Float32)  # with nulls
    b.add_column(5, dt.Int64)    # all null
    for i in range(3):
        b.add_row()
        b.set_value(i, 0, 1000 + i)
        b.set_value(i, 1, i % 2)
    b.set_value(1, 2, 3.5)
    batch = UpsertBatch(b.to_bytes())
    assert batch.column_ids() == [0, 1, 2, 5]
    assert batch.get_value(2, 0) == 1002
    assert batch.get_value(0, 2) is None
    assert batch.get_value(1, 2) == pytest.approx(3.5)
    assert batch.get_value(2, 3) is None


def test_update_modes_preserved():
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint32, UPDATE_FORCE_OVERWRITE)
    b.add_column(1, dt.Float32, UPDATE_WITH_ADDITION)
    b.add_row()
    b.set_value(0, 0, 1)
    b.set_value(0, 1, 2.0)
    batch = UpsertBatch(b.to_bytes())
    assert batch.columns[0].update_mode == UPDATE_FORCE_OVERWRITE
    assert batch.columns[1].update_mode == UPDATE_WITH_ADDITION


def test_array_column_round_trip():
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint32)
    b.add_column(1, dt.ArrayInt32)
    for i in range(3):
        b.add_row()
        b.set_value(i, 0, i)
    b.set_value(0, 1, [1, 2, 3])
    b.set_value(2, 1, [7, None, 9])
    batch = UpsertBatch(b.to_bytes())
    col = batch.columns[1]
    assert col.get_value(0) == [1, 2, 3]
    assert col.get_value(1) is None
    assert col.get_value(2) == [7, None, 9]


def test_empty_array_value():
    b = UpsertBatchBuilder()
    b.add_column(0, dt.ArrayUint8)
    b.add_row()
    b.set_value(0, 0, [])
    batch = UpsertBatch(b.to_bytes())
    assert batch.get_value(0, 0) == []


def test_remove_row():
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint32)
    b.add_row()
    b.set_value(0, 0, 1)
    b.add_row()
    b.set_value(1, 0, 2)
    b.remove_row()
    batch = UpsertBatch(b.to_bytes())
    assert batch.num_rows == 1
    assert batch.get_value(0, 0) == 1


def test_eight_byte_final_alignment():
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint8)
    b.add_row()
    b.set_value(0, 0, 1)
    assert len(b.to_bytes()) % 8 == 0


def test_bad_version_rejected():
    with pytest.raises(ValueError):
        UpsertBatch(b"\x00\x00\x00\x00" + b"\x00" * 28)
