"""Array column query tests (parity: reference array operators,
integration/integration_test.go:60-85 array query coverage)."""

import pytest

from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common.upsert_batch import UpsertBatch, UpsertBatchBuilder
from aresdb_tpu.query.service import QueryService
from tests.test_query_e2e import FakeMemStore

NOW = 1_600_000_000

SCHEMA = {
    "name": "events",
    "columns": [
        {"name": "ts", "type": "Uint32"},
        {"name": "id", "type": "Uint32"},
        {"name": "tags", "type": "ArrayInt32"},
        {"name": "score", "type": "Float32"},
    ],
    "primaryKeyColumns": [1],
    "isFactTable": True,
    "config": {"batchSize": 64, "recordRetentionInDays": 0},
}


@pytest.fixture(scope="module")
def service():
    store = FakeMemStore()
    store.create(SCHEMA)
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint32)
    b.add_column(1, dt.Uint32)
    b.add_column(2, dt.ArrayInt32)
    b.add_column(3, dt.Float32)
    rows = [
        ([1, 2, 3], 1.0),
        ([2, 4], 2.0),
        ([], 4.0),
        (None, 8.0),           # null array
        ([5, None, 7], 16.0),  # null element
    ]
    for i, (tags, score) in enumerate(rows):
        b.add_row()
        b.set_value(i, 0, NOW - 100 - i)
        b.set_value(i, 1, i)
        if tags is not None:
            b.set_value(i, 2, tags)
        b.set_value(i, 3, score)
    store.get_table_shard("events").save_upsert_batch(UpsertBatch(b.to_bytes()))
    return QueryService(store)


def run(service, query):
    query.setdefault("now", NOW)
    resp = service.handle_aql({"queries": [query]})
    assert "errors" not in resp, resp.get("errors")
    return resp["results"][0]


def test_length(service):
    r = run(service, {
        "table": "events",
        "measures": [{"sqlExpression": "count(*)"}],
        "dimensions": [{"sqlExpression": "length(tags)"}],
    })
    # lengths: 3, 2, 0, NULL, 3
    assert r == {"3": 2.0, "2": 1.0, "0": 1.0, "NULL": 1.0}


def test_contains_filter(service):
    r = run(service, {
        "table": "events",
        "measures": [{"sqlExpression": "sum(score)",
                      "rowFilters": ["contains(tags, 2)"]}],
    })
    assert r[""] == pytest.approx(3.0)  # rows 0 and 1


def test_element_at(service):
    r = run(service, {
        "table": "events",
        "measures": [{"sqlExpression": "count(*)"}],
        "dimensions": [{"sqlExpression": "element_at(tags, 0)"}],
    })
    # first elems: 1, 2, NULL(empty), NULL(null array), 5
    assert r == {"1": 1.0, "2": 1.0, "5": 1.0, "NULL": 2.0}


def test_element_at_negative_index(service):
    r = run(service, {
        "table": "events",
        "measures": [{"sqlExpression": "count(*)"}],
        "dimensions": [{"sqlExpression": "element_at(tags, -1)"}],
    })
    # last elems: 3, 4, NULL, NULL, 7
    assert r == {"3": 1.0, "4": 1.0, "7": 1.0, "NULL": 2.0}


def test_subscript_sugar(service):
    r = run(service, {
        "table": "events",
        "measures": [{"sqlExpression": "count(*)",
                      "rowFilters": ["tags[1] = 4"]}],
    })
    assert r[""] == 1.0


def test_null_element_is_null(service):
    r = run(service, {
        "table": "events",
        "measures": [{"sqlExpression": "count(*)",
                      "rowFilters": ["element_at(tags, 1) IS NULL"]}],
    })
    # rows with null/missing index-1 element: row2 (empty), row3 (null),
    # row4 (explicit null element)
    assert r[""] == 3.0


def test_bare_array_column_rejected(service):
    resp = service.handle_aql({"queries": [{
        "table": "events",
        "measures": [{"sqlExpression": "sum(tags)"}],
        "now": NOW}]})
    assert resp["errors"][0]


def test_reference_integration_array_queries():
    """The reference's integration array queries (integration/test-data)
    run verbatim against generator-rule data and match a host oracle.
    Also covers 'Type[]' schema spellings and array-of-enum ingestion."""
    import json
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "tools/drive_arraytest.py"],
        capture_output=True, text=True, timeout=500,
        cwd=__import__("os").path.dirname(__import__("os").path.dirname(
            __import__("os").path.abspath(__file__))))
    out = r.stdout + r.stderr
    assert r.returncode == 0, out[-800:]
    assert out.count("match=True") == 3, out[-800:]
