"""Schema model tests (parity: metastore/common/model + validator behaviors)."""

import json

import pytest

from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common.schema import Column, EnumDict, Table, TableSchema

TRIPS_JSON = {
    "name": "trips",
    "columns": [
        {"name": "request_at", "type": "Uint32"},
        {"name": "uuid", "type": "UUID"},
        {"name": "city_id", "type": "Uint16"},
        {"name": "status", "type": "SmallEnum"},
        {"name": "fare", "type": "Float32"},
    ],
    "primaryKeyColumns": [1],
    "archivingSortColumns": [2, 3],
    "isFactTable": True,
    "config": {"batchSize": 2097152, "recordRetentionInDays": 3},
}


def test_from_json_round_trip():
    t = Table.from_json(TRIPS_JSON)
    assert t.name == "trips"
    assert len(t.columns) == 5
    assert t.is_fact_table
    assert t.primary_key_columns == [1]
    assert t.archiving_sort_columns == [2, 3]
    assert t.config.batch_size == 2097152
    assert t.config.record_retention_in_days == 3
    # round trip
    t2 = Table.from_json(t.to_json())
    assert t2.name == t.name
    assert [c.name for c in t2.columns] == [c.name for c in t.columns]
    t.validate()


def test_validation_rejects_bad_schema():
    t = Table.from_json(TRIPS_JSON)
    t.primary_key_columns = []
    with pytest.raises(ValueError):
        t.validate()

    t = Table.from_json(TRIPS_JSON)
    t.columns[0].type = "Int64"  # fact table time column must be Uint32
    with pytest.raises(ValueError):
        t.validate()

    t = Table.from_json(TRIPS_JSON)
    t.columns.append(Column(name="request_at", type="Uint32"))
    with pytest.raises(ValueError):
        t.validate()


def test_enum_dict():
    ed = EnumDict()
    assert ed.get_or_add("completed") == 0
    assert ed.get_or_add("canceled") == 1
    assert ed.get_or_add("completed") == 0
    assert ed.get("missing") is None
    assert ed.rank_to_str == ["completed", "canceled"]


def test_enum_dict_case_insensitive():
    ed = EnumDict(case_insensitive=True)
    assert ed.get_or_add("ABC") == 0
    assert ed.get_or_add("abc") == 0
    assert ed.rank_to_str == ["ABC"]


def test_table_schema_lookups():
    ts = TableSchema(Table.from_json(TRIPS_JSON))
    assert ts.column_id("city_id") == 2
    with pytest.raises(KeyError):
        ts.column_id("nope")
    assert "status" in ts.enum_dicts
    ranks = ts.extend_enum("status", ["completed", "canceled", "completed"])
    assert ranks == [0, 1, 0]
    assert ts.translate_enum("status", "canceled") == 1
    assert ts.enum_reverse_dict("status") == ["completed", "canceled"]
    assert ts.primary_key_bytes == 16  # one UUID


def test_json_str_parse():
    ts = Table.from_json_str(json.dumps(TRIPS_JSON))
    assert ts.columns[3].data_type == dt.SmallEnum
