"""SQL frontend tests (parity: query/sql/sql_parser_test.go behaviors)."""

import pytest

from aresdb_tpu.query.sql import SQLParseError, parse_sql


def test_reference_example_query():
    # the exact SQL document from examples/1k_trips/queries/total_trips.sql
    q = parse_sql(
        'SELECT count(*) AS value FROM trips WHERE status=\'completed\' AND '
        'aql_time_filter(request_at, "24 hours ago", "this quarter-hour", '
        'America/New_York) GROUP BY aql_time_bucket_hour(request_at, "", '
        'America/New_York)')
    assert q.table == "trips"
    assert q.measures[0].expr == "count(*)"
    assert q.measures[0].alias == "value"
    assert q.filters == ["status='completed'"]
    assert q.time_filter.column == "request_at"
    assert q.time_filter.from_ == "24 hours ago"
    assert q.time_filter.to == "this quarter-hour"
    assert q.timezone == "America/New_York"
    assert len(q.dimensions) == 1
    assert q.dimensions[0].expr == "request_at"
    assert q.dimensions[0].time_bucketizer == "hour"


def test_join():
    q = parse_sql(
        "SELECT sum(fare) FROM trips "
        "JOIN cities AS c ON c.id = city_id "
        "GROUP BY c.name")
    assert q.joins[0].table == "cities"
    assert q.joins[0].alias == "c"
    assert q.joins[0].conditions == ["c.id = city_id"]
    assert q.dimensions[0].expr == "c.name"


def test_non_agg_select():
    q = parse_sql("SELECT city_id, fare FROM trips WHERE fare > 10 LIMIT 5")
    assert q.measures[0].expr == "1"
    assert [d.expr for d in q.dimensions] == ["city_id", "fare"]
    assert q.limit == 5
    assert q.filters == ["fare > 10"]


def test_order_by_and_aliases():
    q = parse_sql(
        "SELECT status AS s, count(*) AS cnt FROM trips GROUP BY status "
        "ORDER BY cnt DESC LIMIT 10")
    assert q.dimensions[0].expr == "status"
    assert q.dimensions[0].alias == "s"
    assert q.sorts[0].name == "cnt" and q.sorts[0].order == "desc"
    assert q.limit == 10


def test_numeric_bucket():
    q = parse_sql(
        "SELECT count(*) FROM trips "
        "GROUP BY aql_numeric_bucket_bucket_width(fare, 5.0)")
    assert q.dimensions[0].expr == "fare"
    assert q.dimensions[0].numeric_bucketizer.bucket_width == 5.0


def test_aql_now():
    q = parse_sql(
        "SELECT count(*) FROM trips WHERE aql_now(request_at, 1600000000)")
    assert q.now == 1600000000


def test_parse_errors():
    with pytest.raises(SQLParseError):
        parse_sql("DELETE FROM trips")
    with pytest.raises(SQLParseError):
        parse_sql("SELECT count(*), sum(fare) FROM t GROUP BY x "
                  "GROUP BY y")


def test_sql_end_to_end():
    from tests.test_query_e2e import make_store, NOW
    from aresdb_tpu.query.service import QueryService

    svc = QueryService(make_store())
    resp = svc.handle_sql({"queries": [
        "SELECT count(*) FROM trips WHERE status='completed' AND "
        f"aql_now(request_at, {NOW})"]})
    assert "errors" not in resp, resp.get("errors")
    assert resp["results"][0][""] == 8.0

    resp = svc.handle_sql({"queries": [
        "SELECT sum(fare) FROM trips JOIN cities AS c ON c.id = city_id "
        f"GROUP BY c.name"]})
    assert "errors" not in resp, resp.get("errors")
    assert "San Francisco" in resp["results"][0]


def test_unsupported_sql_constructs_rejected():
    """Reference parity: HAVING errors (sql_parser.go 'having not yet
    supported'); WITH/subqueries and DISTINCT have no AQL mapping."""
    import pytest as _pt

    from aresdb_tpu.query.sql import SQLParseError, parse_sql

    for stmt, msg in [
            ("SELECT count(*) FROM t GROUP BY c HAVING count(*) > 5",
             "HAVING"),
            ("WITH x AS (SELECT 1) SELECT count(*) FROM t", "WITH"),
            ("SELECT DISTINCT c FROM t", "DISTINCT")]:
        with _pt.raises(SQLParseError, match=msg):
            parse_sql(stmt)
    # the words remain fine inside string literals
    q = parse_sql("SELECT count(*) FROM t WHERE name = 'with distinct'")
    assert q.filters == ["name = 'with distinct'"]
