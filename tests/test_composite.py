"""Composite (multi-measure) SQL queries: parse parity + EXECUTION.

Parse parity: query/sql/sql_parser_test.go "parse composite measures" /
"parse supporting measures" — WITH column-alias lists, NATURAL LEFT JOIN
of same-shape subqueries, per-measure filters from each inner WHERE, and
derived expressions over measure aliases.

Execution goes BEYOND the reference: it parses these shapes but refuses
to run them ("sub query not supported yet", sql_parser.go:2018); our
engine decomposes into one run per aggregate measure and joins +
evaluates derived expressions host-side (query/composite.py).
"""

import pytest

from aresdb_tpu.query.composite import (CompositeError, combine,
                                        execute_composite, split_query)
from aresdb_tpu.query.service import QueryService
from aresdb_tpu.query.sql import SQLParseError, parse_sql

from tests.test_query_e2e import NOW, make_store


@pytest.fixture(scope="module")
def service():
    return QueryService(make_store())


# ---------------------------------------------------------------------------
# parse parity (sql_parser_test.go:257 "parse composite measures")
# ---------------------------------------------------------------------------

COMPOSITE_WITH = """
WITH m1 (Requested) AS (SELECT count(*) AS Requested FROM trips
    LEFT JOIN api_cities AS cities ON cities.id=city_id
    WHERE aql_time_filter(request_at, "96 quarter-hours ago",
                          "1 quarter-hours ago", America/New_York)
      AND marketplace="agora"
    GROUP BY aql_time_bucket_day(request_at, "minute", America/New_York)),
m2 (Completed) AS (SELECT count(*) AS Completed FROM trips
    LEFT JOIN api_cities AS cities ON cities.id=city_id
    WHERE aql_time_filter(request_at, "96 quarter-hours ago",
                          "1 quarter-hours ago", America/New_York)
      AND marketplace="agora" AND status='completed'
    GROUP BY aql_time_bucket_day(request_at, "minute", America/New_York))
SELECT Completed, Requested, Completed/Requested
FROM m1 NATURAL LEFT JOIN m2;
"""

COMPOSITE_SUBQUERY = """
SELECT Completed, Requested, Completed/Requested
FROM
(SELECT count(*) AS Requested FROM trips
    LEFT JOIN api_cities AS cities ON cities.id=city_id
    WHERE aql_time_filter(request_at, "96 quarter-hours ago",
                          "1 quarter-hours ago", America/New_York)
      AND marketplace="agora"
    GROUP BY aql_time_bucket_day(request_at, "minute", America/New_York)) AS m1
NATURAL LEFT JOIN
(SELECT count(*) AS Completed FROM trips
    LEFT JOIN api_cities AS cities ON cities.id=city_id
    WHERE aql_time_filter(request_at, "96 quarter-hours ago",
                          "1 quarter-hours ago", America/New_York)
      AND marketplace="agora" AND status='completed'
    GROUP BY aql_time_bucket_day(request_at, "minute", America/New_York)) AS m2;
"""


@pytest.mark.parametrize("sql", [COMPOSITE_WITH, COMPOSITE_SUBQUERY],
                         ids=["with", "subquery"])
def test_parse_composite_measures(sql):
    q = parse_sql(sql)
    assert [(m.alias, m.expr, m.filters) for m in q.measures] == [
        ("Completed", "count(*)", ['marketplace="agora"',
                                   "status='completed'"]),
        ("Requested", "count(*)", ['marketplace="agora"']),
        ("", "Completed/Requested", []),
    ]
    assert [(d.expr, d.time_bucketizer, d.time_unit)
            for d in q.dimensions] == [("request_at", "day", "minute")]
    assert q.timezone == "America/New_York"
    assert (q.time_filter.from_, q.time_filter.to) == (
        "96 quarter-hours ago", "1 quarter-hours ago")
    assert [(j.table, j.alias) for j in q.joins] == [("api_cities", "cities")]


def test_with_column_alias_count_mismatch():
    with pytest.raises(SQLParseError, match="column aliases"):
        parse_sql("WITH m1 (A, B, C) AS (SELECT count(*) FROM t "
                  "GROUP BY s) SELECT A FROM m1")


def test_different_groupby_rejected():
    # sql_parser_test.go:454 "FROM, GROUP BY and ORDER BY clause are
    # required to be same"
    with pytest.raises(SQLParseError, match="group by clauses"):
        parse_sql("WITH m1 (A) AS (SELECT count(*) FROM t GROUP BY s), "
                  "m2 (B) AS (SELECT count(*) FROM t GROUP BY c) "
                  "SELECT A, B FROM m1 NATURAL LEFT JOIN m2")


def test_mixed_table_and_subquery_rejected():
    # sql_parser_test.go:437 — both join sides must be the same kind
    with pytest.raises(SQLParseError, match="mix tables"):
        parse_sql("SELECT A FROM (SELECT count(*) AS A FROM t GROUP BY s) "
                  "AS m1 NATURAL LEFT JOIN t2")


def test_unknown_output_column_rejected():
    # sql_parser_test.go:501 — identifiers not naming subquery outputs
    with pytest.raises(SQLParseError, match="output column"):
        parse_sql("WITH m1 (A) AS (SELECT count(*) FROM t GROUP BY s) "
                  "SELECT bogus FROM m1")


# ---------------------------------------------------------------------------
# decomposition unit behavior
# ---------------------------------------------------------------------------

def _qd():
    return {
        "table": "trips",
        "dimensions": [{"sqlExpression": "city_id"}],
        "measures": [
            {"sqlExpression": "count(*)", "alias": "Total"},
            {"sqlExpression": "count(*)", "alias": "Completed",
             "rowFilters": ["status='completed'"]},
            {"sqlExpression": "Completed/Total", "alias": "rate"},
        ],
    }


def test_split_query():
    bases, aliases, derived, visible = split_query(_qd())
    assert aliases == ["Total", "Completed"]
    assert visible == [True, True]
    assert [b["measures"][0].get("rowFilters") for b in bases] == [
        None, ["status='completed'"]]
    assert [a for a, _ in derived] == ["rate"]


def test_split_query_supporting_measures():
    # derived-only SELECT: bases ride in supportingMeasures and are
    # hidden from the output leaf (reference "parse supporting measures")
    qd = {
        "table": "trips",
        "dimensions": [{"sqlExpression": "city_id"}],
        "measures": [{"sqlExpression": "Completed/Total", "alias": ""}],
        "supportingMeasures": [
            {"sqlExpression": "count(*)", "alias": "Total"},
            {"sqlExpression": "count(*)", "alias": "Completed",
             "rowFilters": ["status='completed'"]},
        ],
    }
    bases, aliases, derived, visible = split_query(qd)
    assert aliases == ["Total", "Completed"]
    assert visible == [False, False]
    r = combine(qd, aliases, derived, [{"1": 6.0}, {"1": 4.0}], visible)
    # single visible output → scalar leaf
    assert r == {"1": 4.0 / 6.0}


def test_derived_unknown_alias_rejected():
    qd = _qd()
    qd["measures"][2]["sqlExpression"] = "Completed/Nope"
    with pytest.raises(CompositeError, match="not an aggregate measure"):
        split_query(qd)


def test_no_aggregate_rejected():
    with pytest.raises(CompositeError, match="at least one"):
        split_query({"table": "t", "dimensions": [],
                     "measures": [{"sqlExpression": "a/b"},
                                  {"sqlExpression": "a*2"}]})


def test_combine_joins_and_derives():
    qd = _qd()
    bases, aliases, derived, _ = split_query(qd)
    r = combine(qd, aliases, derived, [
        {"1": 6.0, "2": 3.0, "NULL": 1.0},
        {"1": 4.0, "2": 1.0},  # no NULL group in the filtered run
    ])
    assert r["1"] == {"Total": 6.0, "Completed": 4.0, "rate": 4.0 / 6.0}
    assert r["2"] == {"Total": 3.0, "Completed": 1.0, "rate": 1.0 / 3.0}
    # missing group in one tree → None, derived propagates NULL
    assert r["NULL"] == {"Total": 1.0, "Completed": None, "rate": None}


def test_combine_zero_division_is_null():
    qd = _qd()
    bases, aliases, derived, _ = split_query(qd)
    r = combine(qd, aliases, derived, [{"1": 0.0}, {"1": 2.0}])
    assert r["1"]["rate"] is None


# ---------------------------------------------------------------------------
# end-to-end execution (the reference cannot run these)
# ---------------------------------------------------------------------------

def test_execute_composite_aql(service):
    resp = service.handle_aql({"queries": [dict(_qd(), now=NOW, timeFilter={
        "column": "request_at", "from": "72 hours ago", "to": "now"})]})
    assert "errors" not in resp, resp.get("errors")
    r = resp["results"][0]
    # data from test_query_e2e.make_store: per-city totals and completed
    assert r["1"] == {"Total": 6.0, "Completed": 4.0, "rate": 4.0 / 6.0}
    assert r["2"] == {"Total": 3.0, "Completed": 1.0, "rate": 1.0 / 3.0}
    assert r["3"] == {"Total": 1.0, "Completed": 1.0, "rate": 1.0}
    assert r["9"] == {"Total": 1.0, "Completed": 1.0, "rate": 1.0}
    assert r["NULL"] == {"Total": 1.0, "Completed": 1.0, "rate": 1.0}


def test_execute_composite_sql(service):
    sql = f"""
    WITH m1 (Total) AS (SELECT count(*) AS Total FROM trips
        WHERE aql_time_filter(request_at, "72 hours ago", "now", NULL)
          AND aql_now(request_at, {NOW})
        GROUP BY city_id),
    m2 (Done) AS (SELECT count(*) AS Done FROM trips
        WHERE aql_time_filter(request_at, "72 hours ago", "now", NULL)
          AND aql_now(request_at, {NOW}) AND status='completed'
        GROUP BY city_id)
    SELECT Done, Total, Done/Total AS rate FROM m1 NATURAL LEFT JOIN m2
    """
    resp = service.handle_sql({"queries": [sql]})
    assert "errors" not in resp, resp.get("errors")
    r = resp["results"][0]
    assert r["1"] == {"Done": 4.0, "Total": 6.0, "rate": 4.0 / 6.0}
    assert r["NULL"] == {"Done": 1.0, "Total": 1.0, "rate": 1.0}


def test_execute_supporting_measures_sql(service):
    """Derived-only SELECT (reference 'parse supporting measures'):
    hidden bases execute, only the ratio is output — scalar leaves."""
    sql = f"""
    WITH m1 (Total) AS (SELECT count(*) AS Total FROM trips
        WHERE aql_time_filter(request_at, "72 hours ago", "now", NULL)
          AND aql_now(request_at, {NOW}) GROUP BY city_id),
    m2 (Done) AS (SELECT count(*) AS Done FROM trips
        WHERE aql_time_filter(request_at, "72 hours ago", "now", NULL)
          AND aql_now(request_at, {NOW}) AND status='completed'
        GROUP BY city_id)
    SELECT Done/Total FROM m1 NATURAL LEFT JOIN m2
    """
    resp = service.handle_sql({"queries": [sql]})
    assert "errors" not in resp, resp.get("errors")
    assert resp["results"][0] == {
        "1": 4.0 / 6.0, "2": 1.0 / 3.0, "3": 1.0, "9": 1.0, "NULL": 1.0}


def test_execute_composite_via_broker():
    """The broker endpoint decomposes a composite query, scatters once
    per base measure, and recombines — verified over real HTTP with a
    stubbed scatter executor."""
    import requests

    from aresdb_tpu.broker.server import BrokerServer
    from aresdb_tpu.cluster.topology import StaticTopology

    srv = BrokerServer(StaticTopology([]))
    calls = []

    def fake_execute(q, ctx=None):
        calls.append(q["measures"][0]["alias"])
        return {"1": 6.0} if q["measures"][0]["alias"] == "Total" \
            else {"1": 4.0}

    srv.executor.execute = fake_execute
    port = srv.start_background()
    try:
        r = requests.post(f"http://localhost:{port}/query/aql",
                          json={"queries": [_qd()]}).json()
        assert "errors" not in r, r
        assert calls == ["Total", "Completed"]
        assert r["results"][0]["1"] == {
            "Total": 6.0, "Completed": 4.0, "rate": 4.0 / 6.0}
    finally:
        srv.stop()


# ---------------------------------------------------------------------------
# merger fuzz: nested alias shadowing (VERDICT r4 #9)
# ---------------------------------------------------------------------------

def test_alias_shadowing_fuzz(service):
    """Randomized WITH statements whose output aliases shadow BASE COLUMN
    names, other aliases, and the named-query identifiers themselves. The
    flattened composite result must equal an oracle computed from the
    equivalent plain queries — a misbinding (outer identifier resolving to
    the base column instead of the subquery output) would silently corrupt
    the derived measure. Reference: sql_parser.go mergeWithOrSubQueries
    output-column binding."""
    import numpy as np

    rng = np.random.RandomState(11)
    # alias pools deliberately collide with trips column names and the
    # named-query identifiers
    alias_pool = ["fare", "city_id", "Total", "m1", "m2", "X", "status"]
    for trial in range(12):
        a1, a2 = rng.choice(alias_pool, 2, replace=False)
        f2 = "status='completed'"
        w = (
            f"WITH m1 ({a1}) AS (SELECT count(*) AS {a1} FROM trips "
            f"WHERE aql_now(request_at, {NOW}) GROUP BY status), "
            f"m2 ({a2}) AS (SELECT count(*) AS {a2} FROM trips "
            f"WHERE aql_now(request_at, {NOW}) AND {f2} GROUP BY status) "
            f"SELECT {a1}, {a2}, {a2}/{a1} AS rate "
            f"FROM m1 NATURAL LEFT JOIN m2"
        )
        out = service.handle_sql({"queries": [w]})
        assert not out.get("errors"), (w, out.get("errors"))
        res = out["results"][0]

        base = service.handle_sql({"queries": [
            f"SELECT count(*) FROM trips WHERE aql_now(request_at, {NOW}) "
            f"GROUP BY status",
            f"SELECT count(*) FROM trips WHERE aql_now(request_at, {NOW}) "
            f"AND {f2} GROUP BY status"]})
        r1, r2 = base["results"]
        assert not base.get("errors"), base.get("errors")
        for grp, v1 in r1.items():
            got = res[grp]
            assert got[a1] == v1, (w, grp)
            v2 = r2.get(grp, None)
            if v2 is not None:
                assert got[a2] == v2, (w, grp)
                want_rate = float(np.float32(v2 / v1)) if v1 else None
                rate = got["rate"]
                assert (rate == want_rate
                        or (rate is not None and want_rate is not None
                            and abs(rate - want_rate) < 1e-6)), (w, grp)
