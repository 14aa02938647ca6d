"""Tests for the data type system (parity: memstore/common/data_type_test.go)."""

import numpy as np
import pytest

from aresdb_tpu.common import data_types as dt


def test_type_encoding_matches_reference():
    # exact 32-bit codes from reference data_type.go:44-72
    assert dt.Bool == 0x00000001
    assert dt.Int8 == 0x00010008
    assert dt.Uint8 == 0x00020008
    assert dt.Int16 == 0x00030010
    assert dt.Uint16 == 0x00040010
    assert dt.Int32 == 0x00050020
    assert dt.Uint32 == 0x00060020
    assert dt.Float32 == 0x00070020
    assert dt.SmallEnum == 0x00080008
    assert dt.BigEnum == 0x00090010
    assert dt.UUID == 0x000A0080
    assert dt.GeoPoint == 0x000B0040
    assert dt.GeoShape == 0x000C0000
    assert dt.Int64 == 0x000D0040
    assert dt.ArrayInt32 == 0x01050020


def test_width_and_bytes():
    assert dt.data_type_bits(dt.Bool) == 1
    assert dt.data_type_bytes(dt.Bool) == 1
    assert dt.data_type_bytes(dt.Uint32) == 4
    assert dt.data_type_bytes(dt.UUID) == 16
    assert dt.data_type_bytes(dt.GeoPoint) == 8
    assert dt.data_type_bytes(dt.Int64) == 8
    assert dt.data_type_bits(dt.ArrayInt16) == 16


def test_array_flags():
    assert dt.is_array_type(dt.ArrayUint32)
    assert not dt.is_array_type(dt.Uint32)
    assert dt.item_type(dt.ArrayUint32) == dt.Uint32


def test_name_round_trip():
    for name in ("Bool", "Uint32", "SmallEnum", "UUID", "GeoPoint", "ArrayInt64"):
        assert dt.DATA_TYPE_NAME[dt.data_type_from_string(name)] == name
    with pytest.raises(ValueError):
        dt.data_type_from_string("NotAType")


def test_new_data_type_validation():
    assert dt.new_data_type(0x00060020) == dt.Uint32
    with pytest.raises(ValueError):
        dt.new_data_type(0x00FF0000)


def test_parse_bool():
    assert dt.parse_value("true", dt.Bool) is True
    assert dt.parse_value("0", dt.Bool) is False
    assert dt.parse_value(1, dt.Bool) is True
    with pytest.raises(ValueError):
        dt.parse_value("yes", dt.Bool)
    with pytest.raises(ValueError):
        dt.parse_value(2, dt.Bool)


def test_parse_int_bounds():
    assert dt.parse_value("255", dt.Uint8) == 255
    with pytest.raises(ValueError):
        dt.parse_value(256, dt.Uint8)
    with pytest.raises(ValueError):
        dt.parse_value(-1, dt.Uint8)
    assert dt.parse_value(-128, dt.Int8) == -128
    assert dt.parse_value("0x10", dt.Uint16) == 16


def test_parse_uuid_round_trip():
    s = "d585cc25-5ca9-4655-855d-dcb94a0b9f04"
    hi, lo = dt.parse_value(s, dt.UUID)
    assert dt.uuid_to_string(hi, lo) == s


def test_parse_geopoint():
    # WKT is Point(lng lat); storage is (lat, lng) — data_type.go:443
    lat, lng = dt.parse_value("Point(11.1 22.2)", dt.GeoPoint)
    assert abs(lat - 22.2) < 1e-6 and abs(lng - 11.1) < 1e-6
    lat, lng = dt.parse_value("Point(11.1,22.2)", dt.GeoPoint)
    assert abs(lat - 22.2) < 1e-6 and abs(lng - 11.1) < 1e-6
    assert dt.parse_value((1.5, -2.5), dt.GeoPoint) == (1.5, -2.5)
    with pytest.raises(ValueError):
        dt.parse_value("11.1,22.2", dt.GeoPoint)
    with pytest.raises(ValueError):
        dt.parse_value("Point(181.0 0.0)", dt.GeoPoint)   # lng out of range
    with pytest.raises(ValueError):
        dt.parse_value("Point(0.0 90.5)", dt.GeoPoint)    # lat out of range
    # human-readable round trip is Point(lng,lat) with 4 decimals
    # (data_value.go:298)
    assert dt.geopoint_to_string(22.2, 11.1) == "Point(11.1000,22.2000)"


def test_parse_array():
    assert dt.parse_value([1, None, 3], dt.ArrayInt32) == [1, None, 3]
    assert dt.parse_value("[1,2,3]", dt.ArrayUint8) == [1, 2, 3]


def test_null_passthrough():
    assert dt.parse_value(None, dt.Uint32) is None


def test_numpy_dtype_mapping():
    assert dt.numpy_dtype(dt.Uint32) == np.uint32
    assert dt.numpy_dtype(dt.SmallEnum) == np.uint8
    assert dt.numpy_dtype(dt.BigEnum) == np.uint16
    assert dt.numpy_dtype(dt.UUID) == np.uint64
    assert dt.lanes(dt.UUID) == 2
    assert dt.lanes(dt.GeoPoint) == 2
    assert dt.lanes(dt.Float32) == 1


def test_agg_identity():
    assert dt.agg_identity(np.dtype(np.float32), "sum") == 0
    assert dt.agg_identity(np.dtype(np.float32), "min") == np.inf
    assert dt.agg_identity(np.dtype(np.int32), "max") == np.iinfo(np.int32).min


def test_value_from_string_matrix():
    """Port of the reference's ValueFromString matrix
    (memstore/common/data_value_test.go:104 "test value from string"):
    per-type bound rejections at exactly one past the max, acceptance at
    the max, the "null" literal, malformed floats, and both UUID string
    forms."""
    # "null" parses as null for any type
    assert dt.parse_value("null", dt.Bool) is None
    assert dt.parse_value("null", dt.Uint32) is None
    with pytest.raises(ValueError):
        dt.parse_value("invalid bool", dt.Bool)
    assert dt.parse_value("true", dt.Bool) is True

    cases = [
        # (max-accepted, one-past, type)
        ("127", "128", dt.Int8),
        ("255", "256", dt.Uint8),
        ("255", "256", dt.SmallEnum),
        ("32767", "32768", dt.Int16),
        ("65535", "65536", dt.Uint16),
        ("65535", "65536", dt.BigEnum),
        ("2147483647", "2147483648", dt.Int32),
        ("4294967295", "4294967296", dt.Uint32),
    ]
    for ok, bad, ty in cases:
        assert dt.parse_value(ok, ty) == int(ok), dt.data_type_name(ty)
        with pytest.raises(ValueError):
            dt.parse_value(bad, ty)
    # int64 takes what uint32 rejects
    assert dt.parse_value("4294967296", dt.Int64) == 4294967296

    # float32: malformed rejected, plain parse accepted
    with pytest.raises(ValueError):
        dt.parse_value("0.10.1", dt.Float32)
    assert abs(dt.parse_value("0.1", dt.Float32) - 0.1) < 1e-7

    # UUID: 32-hex (no dashes) and dash-grouped forms both read as raw
    # little-endian u64 halves (data_value_test.go:188-196)
    assert dt.parse_value("01000000000000000100000000000000",
                          dt.UUID) == (1, 1)
    assert dt.parse_value("01000000-00000000-01000000-00000000",
                          dt.UUID) == (1, 1)
    with pytest.raises(ValueError):
        dt.parse_value("01000000000000000100000000000", dt.UUID)

    # GeoPoint: bare "Point" rejected, full WKT accepted as (lat, lng)
    with pytest.raises(ValueError):
        dt.parse_value("Point", dt.GeoPoint)
    assert dt.parse_value("Point(1.0 1.0)", dt.GeoPoint) == (1.0, 1.0)


def test_value_to_human_matrix():
    """Port of ConvertToHumanReadable (data_value_test.go:267): scalars
    pass through, geo points format as Point(lng,lat) with 4 decimals,
    UUIDs render dashed."""
    assert dt.value_to_human(True, dt.Bool) is True
    assert dt.value_to_human(False, dt.Bool) is False
    for ty in (dt.Uint8, dt.Uint16, dt.Uint32, dt.Int16, dt.Int32,
               dt.Int64):
        assert dt.value_to_human(1, ty) == 1
    assert dt.value_to_human(1.0, dt.Float32) == 1.0
    assert dt.value_to_human((1.0, 1.0), dt.GeoPoint) == \
        "Point(1.0000,1.0000)"
    hi, lo = dt.parse_value("d585cc25-5ca9-4655-855d-dcb94a0b9f04", dt.UUID)
    assert dt.value_to_human((hi, lo), dt.UUID) == \
        "d585cc25-5ca9-4655-855d-dcb94a0b9f04"
    # arrays keep per-item rendering with nulls preserved
    assert dt.value_to_human([11, None, 13], dt.ArrayInt16) == \
        [11, None, 13]
