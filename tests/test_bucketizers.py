"""Time bucketizer + expression function coverage.

Parity targets: query/time_bucketizer_test.go, functor_unittest.cu calendar
cases.
"""

import datetime as dt

import pytest

from aresdb_tpu.common import data_types as mdt
from aresdb_tpu.common.upsert_batch import UpsertBatch, UpsertBatchBuilder
from aresdb_tpu.query.service import QueryService
from tests.test_query_e2e import FakeMemStore

UTC = dt.timezone.utc

SCHEMA = {
    "name": "events",
    "columns": [
        {"name": "ts", "type": "Uint32"},
        {"name": "id", "type": "Uint32"},
        {"name": "v", "type": "Float32"},
    ],
    "primaryKeyColumns": [1],
    "isFactTable": True,
    "config": {"batchSize": 64, "recordRetentionInDays": 0},
}


def ts(*args):
    return int(dt.datetime(*args, tzinfo=UTC).timestamp())


TIMES = [
    ts(2020, 1, 15, 10, 30),   # Wed, Jan, Q1
    ts(2020, 2, 29, 23, 59),   # leap day, Sat
    ts(2020, 4, 1, 0, 0),      # Q2 start, Wed
    ts(2020, 12, 31, 12, 0),   # Thu, Q4
    ts(2021, 1, 1, 0, 0),      # Fri, new year
]
NOW = ts(2021, 6, 1)


@pytest.fixture(scope="module")
def service():
    store = FakeMemStore()
    store.create(SCHEMA)
    b = UpsertBatchBuilder()
    b.add_column(0, mdt.Uint32)
    b.add_column(1, mdt.Uint32)
    b.add_column(2, mdt.Float32)
    for i, t in enumerate(TIMES):
        b.add_row()
        b.set_value(i, 0, t)
        b.set_value(i, 1, i)
        b.set_value(i, 2, float(i + 1))
    store.get_table_shard("events").save_upsert_batch(UpsertBatch(b.to_bytes()))
    return QueryService(store)


def run(service, dims, filters=None):
    q = {"table": "events",
         "measures": [{"sqlExpression": "count(*)"}],
         "dimensions": dims, "now": NOW}
    if filters:
        q["rowFilters"] = filters
    resp = service.handle_aql({"queries": [q]})
    assert "errors" not in resp, resp.get("errors")
    return resp["results"][0]


def test_month_bucketizer(service):
    r = run(service, [{"sqlExpression": "ts", "timeBucketizer": "month"}])
    # month starts as unix timestamps (reference GetMonthStartFunctor)
    assert r[str(ts(2020, 1, 1))] == 1.0
    assert r[str(ts(2020, 2, 1))] == 1.0
    assert r[str(ts(2020, 4, 1))] == 1.0
    assert r[str(ts(2020, 12, 1))] == 1.0
    assert r[str(ts(2021, 1, 1))] == 1.0


def test_quarter_and_year_bucketizers(service):
    r = run(service, [{"sqlExpression": "ts", "timeBucketizer": "quarter"}])
    assert r[str(ts(2020, 1, 1))] == 2.0   # Jan + Feb events
    assert r[str(ts(2020, 4, 1))] == 1.0
    assert r[str(ts(2020, 10, 1))] == 1.0
    assert r[str(ts(2021, 1, 1))] == 1.0

    r = run(service, [{"sqlExpression": "ts", "timeBucketizer": "year"}])
    assert r[str(ts(2020, 1, 1))] == 4.0
    assert r[str(ts(2021, 1, 1))] == 1.0


def test_week_bucketizer(service):
    r = run(service, [{"sqlExpression": "ts", "timeBucketizer": "week"}])
    # 2020-01-15 is a Wednesday → week starts Monday 2020-01-13
    assert r[str(ts(2020, 1, 13))] == 1.0
    # 2021-01-01 is a Friday → week starts Monday 2020-12-28; the
    # 2020-12-31 event shares that week
    assert r[str(ts(2020, 12, 28))] == 2.0


def test_day_of_week_bucketizer(service):
    r = run(service, [{"sqlExpression": "ts",
                       "timeBucketizer": "day of week"}])
    assert r["Wednesday"] == 2.0
    assert r["Saturday"] == 1.0
    assert r["Thursday"] == 1.0
    assert r["Friday"] == 1.0


def test_hour_of_day_bucketizer(service):
    r = run(service, [{"sqlExpression": "ts",
                       "timeBucketizer": "hour of day"}])
    assert r["10:00"] == 1.0
    assert r["23:00"] == 1.0
    assert r["00:00"] == 2.0
    assert r["12:00"] == 1.0


def test_month_of_year_and_day_of_month(service):
    r = run(service, [{"sqlExpression": "ts",
                       "timeBucketizer": "month of year"}])
    # reference GetMonthOfYearFunctor returns 0-based month index
    assert r["0"] == 2.0   # two January events
    assert r["1"] == 1.0   # February
    r = run(service, [{"sqlExpression": "ts",
                       "timeBucketizer": "day of month"}])
    assert r["14"] == 1.0  # 0-based day-of-month for the 15th
    assert r["28"] == 1.0  # Feb 29 → index 28


def test_hour_and_dayofweek_functions(service):
    r = run(service, [{"sqlExpression": "hour(ts)"}])
    assert r["10"] == 1.0 and r["23"] == 1.0 and r["0"] == 2.0
    r = run(service, [{"sqlExpression": "dayofweek(ts)"}])
    # reference: Monday=1..Sunday=7
    assert r["3"] == 2.0   # Wednesdays
    assert r["6"] == 1.0   # Saturday


def test_case_when(service):
    r = run(service, [{
        "sqlExpression": "CASE WHEN v > 3 THEN 1 ELSE 0 END"}])
    assert r["1"] == 2.0 and r["0"] == 3.0


def test_from_unixtime_millis_unwrap(service):
    """from_unixtime accepts ONLY `time_col / 1000` and unwraps to the
    column (reference query_context_helper.go:437); a bare column is an
    error."""
    r = run(service, [],
            filters=[f"from_unixtime(ts / 1000) >= {ts(2021, 1, 1)}"])
    assert r[""] == 1.0


def test_timezone_shifts_hour_bucket(service):
    q = {"table": "events",
         "measures": [{"sqlExpression": "count(*)"}],
         "dimensions": [{"sqlExpression": "ts", "timeBucketizer": "hour"}],
         "timeFilter": {"column": "ts", "from": "2020-01-01",
                        "to": "2020-02-01"},
         "timezone": "-5:00",
         "now": NOW}
    resp = service.handle_aql({"queries": [q]})
    assert "errors" not in resp, resp.get("errors")
    r = resp["results"][0]
    # 2020-01-15 10:30 UTC = 05:30 at -5:00
    assert "2020-01-15 05:00" in r


def test_time_dimension_formatting_parity():
    """Exact output strings of query/aql_postprocessor_test.go:194
    'time Unit formatting works' (plus day-of-week values 1, 2)."""
    from aresdb_tpu.query.time_util import format_time_dimension as F

    assert F(0, "h") == "1970-01-01 00:00"
    assert F(190, "time of day") == "00:03"
    assert F(250, "time of day") == "00:04"
    assert F(0, "hour of day") == "00:00"
    assert F(190, "hour of week") == "Monday 00:03"
    assert F(250, "hour of week") == "Monday 00:04"
    assert F(190, "minute") == "1970-01-01 00:03"
    assert F(250, "minute") == "1970-01-01 00:04"
    assert F(0, "hour") == "1970-01-01 00:00"
    assert F(190, "some invalid bucketizer") == "190"
    assert F(1, "day of week") == "Tuesday"
    assert F(2, "day of week") == "Wednesday"
    assert F(0, "day of week") == "Monday"
    # time_unit branch: raw numeric division
    assert F(7200, "", time_unit="hour") == "2"
    assert F(86400, "", time_unit="day") == "1"
