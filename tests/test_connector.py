"""Client connector parity (client/connector_test.go Insert behaviors).

Includes the reference's 120-byte wire GOLDEN for an HLL insert with the
clock frozen at t=10 — byte-for-byte builder parity covering the header
(version, rows, cols, arrival time), column descriptors (the HLL column
travels as Uint32), null vectors and value vectors.
"""

import pytest

from aresdb_tpu.client.connector import Connector, ConnectorError
from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common.schema import Table
from aresdb_tpu.common.upsert_batch import (UPDATE_WITH_ADDITION,
                                            UpsertBatch)

SCHEMA_A = {
    "name": "a",
    "columns": [
        {"name": "col0", "type": "Int32"},
        {"name": "col1", "type": "Int32"},
        {"name": "col1_hll", "type": "UUID",
         "hllConfig": {"isHLLColumn": True}},
        {"name": "col2", "type": "BigEnum"},
        {"name": "col3", "type": "Bool"},
    ],
    "primaryKeyColumns": [1],
    "isFactTable": True,
    "config": {"batchSize": 16},
}

# client/connector_test.go:206 — Insert("a", [col0, col1, col1_hll],
# [{100, 1, bytes 0..15}]) with utils.SetClockImplementation(t=10)
REFERENCE_GOLDEN = bytes([
    1, 0, 237, 254, 1, 0, 0, 0, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 10, 0, 0, 0, 89, 0, 0, 0, 100, 0, 0, 0, 108, 0, 0, 0, 116, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 32, 0, 5, 0, 32, 0, 5, 0, 32, 0, 6, 0, 0, 0, 1, 0, 2, 0, 1, 1,
    1, 0, 0, 0, 0, 0, 0, 0, 100, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0,
    0, 8, 8, 5, 0, 0, 0, 0, 0])


class _FakeSchemaCache:
    def __init__(self, table_json, enums=None):
        self._table = Table.from_json(table_json)
        self._enums = dict(enums or {})

    def table(self, name):
        return self._table

    def enum_dict(self, table_name, column):
        return dict(self._enums.get(column, {}))

    def extend_enum(self, table_name, column, cases):
        d = self._enums.setdefault(column, {})
        for c in cases:
            d.setdefault(c, len(d))


def _connector(enums=None):
    c = Connector.__new__(Connector)
    c.host, c.port, c.session = "x", 0, None
    c.schema = _FakeSchemaCache(SCHEMA_A, enums)
    return c


def test_hll_insert_wire_golden(monkeypatch):
    import aresdb_tpu.common.upsert_batch as ub
    monkeypatch.setattr(ub.time, "time", lambda: 10)
    c = _connector()
    payload = c.build_batch("a", ["col0", "col1", "col1_hll"],
                            [[100, 1, bytes(range(16))]])
    assert len(payload) == 120
    assert payload == REFERENCE_GOLDEN


def test_update_mode_on_primary_key_rejected():
    c = _connector()
    with pytest.raises(ConnectorError, match="only supports overwrite"):
        c.build_batch("a", ["col0", "col1"], [[100, 1]],
                      update_modes=[0, UPDATE_WITH_ADDITION])


def test_nil_primary_key_row_abandoned():
    c = _connector()
    payload = c.build_batch("a", ["col0", "col1"], [[100, None], [200, 2]])
    assert UpsertBatch(payload).num_rows == 1


def test_nil_time_column_row_abandoned():
    c = _connector()
    payload = c.build_batch("a", ["col0", "col1"], [[None, 1], [200, 2]])
    assert UpsertBatch(payload).num_rows == 1


def test_non_string_enum_row_abandoned():
    c = _connector(enums={"col2": {"1": 0}})
    payload = c.build_batch("a", ["col0", "col1", "col2"],
                            [[100, 1, 7], [200, 2, "1"]])
    assert UpsertBatch(payload).num_rows == 1


def test_missing_primary_key_column_rejected():
    c = _connector()
    with pytest.raises(ConnectorError, match="primary key"):
        c.build_batch("a", ["col0"], [[100]])


def test_missing_time_column_rejected():
    c = _connector()
    with pytest.raises(ConnectorError, match="time column"):
        c.build_batch("a", ["col1"], [[1]])


def test_empty_columns_rejected():
    c = _connector()
    with pytest.raises(ConnectorError, match="no columns"):
        c.build_batch("a", [], [])


def test_empty_rows_ok():
    c = _connector()
    payload = c.build_batch("a", ["col0", "col1"], [])
    assert UpsertBatch(payload).num_rows == 0
