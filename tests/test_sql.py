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
    supported'); RECURSIVE and DISTINCT likewise."""
    import pytest as _pt

    from aresdb_tpu.query.sql import SQLParseError, parse_sql

    for stmt, msg in [
            ("SELECT count(*) FROM t GROUP BY c HAVING count(*) > 5",
             "having not yet supported"),
            ("WITH RECURSIVE x AS (SELECT count(*) FROM t) SELECT c FROM x",
             "RECURSIVE"),
            ("SELECT DISTINCT c FROM t", "DISTINCT")]:
        with _pt.raises(SQLParseError, match=msg):
            parse_sql(stmt)
    # the words remain fine inside string literals
    q = parse_sql("SELECT count(*) FROM t WHERE name = 'with distinct'")
    assert q.filters == ["name = 'with distinct'"]


# ---------------------------------------------------------------------------
# one-level WITH / FROM-subquery flattening
# (reference: sql_parser.go mergeWithOrSubQueries + isValidWithOrSubQuery)
# ---------------------------------------------------------------------------

def test_with_query_flattens():
    q = parse_sql(
        "WITH t1 AS (SELECT count(*) AS c, city_id FROM trips "
        "WHERE status='completed' GROUP BY city_id) "
        "SELECT city_id, c FROM t1")
    assert q.table == "trips"
    assert len(q.measures) == 1
    assert q.measures[0].expr == "count(*)"
    # inner WHERE becomes a measure-level rowFilter
    assert q.measures[0].filters == ["status='completed'"]
    assert [d.expr for d in q.dimensions] == ["city_id"]
    assert q.filters == []


def test_from_subquery_flattens():
    q = parse_sql(
        "SELECT s FROM (SELECT sum(fare) AS s, status FROM trips "
        "WHERE fare > 2 GROUP BY status) LIMIT 10")
    assert q.table == "trips"
    assert q.measures[0].expr == "sum(fare)"
    assert q.measures[0].filters == ["fare > 2"]
    assert [d.expr for d in q.dimensions] == ["status"]
    assert q.limit == 10


def test_subquery_star_adopts_inner():
    q = parse_sql("SELECT * FROM (SELECT avg(fare) AS a, city_id "
                  "FROM trips GROUP BY city_id)")
    assert q.measures[0].expr == "avg(fare)"
    assert [d.expr for d in q.dimensions] == ["city_id"]


def test_subquery_outer_where_and_orderby():
    q = parse_sql(
        "SELECT c FROM (SELECT count(*) AS c, status FROM trips "
        "GROUP BY status ORDER BY status) WHERE aql_now(request_at, '99') "
        "ORDER BY c DESC")
    assert q.now == 99
    assert q.sorts[0].name == "c" and q.sorts[0].order == "desc"


def test_with_inherits_inner_time_filter_and_sorts():
    q = parse_sql(
        "WITH t1 AS (SELECT count(*) AS c, status FROM trips WHERE "
        'aql_time_filter(request_at, "-1d", "now", null) '
        "GROUP BY status ORDER BY status) SELECT c FROM t1")
    assert q.time_filter.column == "request_at"
    assert q.sorts[0].name == "status"


def test_subquery_unselected_measure_becomes_supporting():
    q = parse_sql(
        "WITH t1 AS (SELECT count(*) AS c, sum(fare) AS s, status "
        "FROM trips GROUP BY status) SELECT status, c FROM t1")
    assert q.measures[0].expr == "count(*)"
    assert [m.expr for m in q.supporting_measures] == ["sum(fare)"]


def test_subquery_validation_errors():
    from aresdb_tpu.query.sql import SQLParseError

    cases = [
        # two inner queries must share FROM
        ("WITH a AS (SELECT count(*) AS c, x FROM t GROUP BY x), "
         "b AS (SELECT count(*) AS d, x FROM u GROUP BY x) "
         "SELECT c, d FROM a, b", "from clauses must be the same"),
        # ... and GROUP BY
        ("WITH a AS (SELECT count(*) AS c, x FROM t GROUP BY x), "
         "b AS (SELECT count(*) AS d, y FROM t GROUP BY y) "
         "SELECT c, d FROM a, b", "group by clauses must be the same"),
        # outer GROUP BY on an aggregated inner
        ("WITH a AS (SELECT count(*) AS c, x FROM t GROUP BY x) "
         "SELECT c FROM a GROUP BY x", "group by is not allowed"),
        # unknown with identifier
        ("WITH a AS (SELECT count(*) AS c FROM t) SELECT c FROM zz",
         "cannot find withQuery identifier"),
        # duplicate identifier
        ("WITH a AS (SELECT count(*) AS c FROM t), a AS "
         "(SELECT count(*) AS c FROM t) SELECT c FROM a", "already exist"),
        # nesting beyond one level
        ("SELECT c FROM (SELECT c FROM (SELECT count(*) AS c FROM t))",
         "1 level"),
        # inner LIMIT
        ("SELECT c FROM (SELECT count(*) AS c FROM t LIMIT 5)",
         "limit on query level"),
        # unresolved outer column
        ("SELECT zz FROM (SELECT count(*) AS c FROM t)",
         "does not name an output column"),
    ]
    for stmt, msg in cases:
        with pytest.raises(SQLParseError, match=msg):
            parse_sql(stmt)


def test_subquery_end_to_end():
    """The flattened query must execute like its hand-flattened twin."""
    from tests.test_query_e2e import make_store, NOW
    from aresdb_tpu.query.service import QueryService

    svc = QueryService(make_store())
    resp = svc.handle_sql({"queries": [
        "WITH t1 AS (SELECT count(*) AS c, status FROM trips "
        f"WHERE aql_now(request_at, {NOW}) GROUP BY status) "
        "SELECT status, c FROM t1"]})
    assert "errors" not in resp, resp.get("errors")
    flat = svc.handle_sql({"queries": [
        "SELECT count(*), status FROM trips "
        f"WHERE aql_now(request_at, {NOW}) GROUP BY status"]})
    assert resp["results"][0] == flat["results"][0]



def test_subquery_groupby_of_aliased_select_no_duplicate_dim():
    """Regression: GROUP BY naming an inner column that the SELECT list
    also carried under an alias used to append the dimension twice (dict
    equality compared against the alias-mutated copy)."""
    q = parse_sql(
        "SELECT city_id AS c, fare FROM (SELECT city_id, fare FROM trips) "
        "GROUP BY city_id")
    assert [d.expr for d in q.dimensions] == ["city_id", "fare"]
    assert q.dimensions[0].alias == "c"


def test_where_top_level_or_stays_single_filter():
    """`a AND NOT b OR c` must remain ONE filter: AND binds tighter than
    OR, and splitting on AND would regroup it (sql_parser_test.go:38)."""
    q = parse_sql(
        "SELECT count(*) AS completed_trips FROM trips "
        "WHERE status='completed' AND NOT status = 'cancelled' "
        "OR marketplace='agora' GROUP BY status")
    assert q.filters == [
        "status='completed' AND NOT status = 'cancelled' "
        "OR marketplace='agora'"]
    assert q.measures[0].alias == "completed_trips"
    assert [d.expr for d in q.dimensions] == ["status"]


def test_wildcard_select_keeps_star_dimension():
    """SELECT field1, * keeps the `*` dim (sql_parser_test.go:87); the
    compiler expands it to all usable columns (aql_compiler.go:412)."""
    q = parse_sql("SELECT field1, * FROM trips LIMIT 10")
    assert [d.expr for d in q.dimensions] == ["field1", "*"]
    assert q.measures[0].expr == "1"
    assert q.limit == 10


def test_reference_parser_error_matrix():
    """Ported from /root/reference/query/sql/sql_parser_test.go's error
    cases — per-construct messages match the reference's phrasing (line/col
    positions are ANTLR artifacts the clause parser doesn't carry)."""
    import pytest as _pt

    from aresdb_tpu.query.sql import SQLParseError, parse_sql

    cases = [
        # WITH RECURSIVE (sql_parser_test.go:399)
        ("""WITH RECURSIVE t(n) AS (SELECT n+1 FROM t WHERE n < 100)
            SELECT sum(n) FROM t;""",
         "RECURSIVE not yet supported"),
        # nested WITH inside a namedQuery (:416)
        ("""WITH m1 (Requested) AS
              (With m (Requested) AS (SELECT count(*) AS Requested FROM trips)
               SELECT Requested FROM m)
            SELECT Requested FROM m1;""",
         "only support 1 level with query"),
        # nested subquery inside a subquery (:216)
        ("""SELECT c FROM (SELECT c FROM (SELECT c FROM t) GROUP BY c)""",
         "only support 1 level subquery"),
        # NATURAL JOIN inside a withQuery body (:432)
        ("""WITH m1 (Requested) AS (SELECT count(*) AS Requested FROM trips),
            m2 (Completed) AS (SELECT count(*) AS Completed FROM trips
                NATURAL LEFT JOIN m1)
            SELECT Completed, Requested FROM m1 NATURAL LEFT JOIN m2;""",
         "natural join not supported at subquery/withQuery"),
        # with-identifier used in an expression (:511)
        ("""WITH m1 (avg_fare) AS (SELECT avg(fare) AS avg_fare FROM trips)
            SELECT fare FROM trips WHERE fare > m1.avg_fare;""",
         "subquery/withQuery identifier in expression not supported yet."),
        # empty query (:523)
        ("", "missing queryNoWith body"),
        ("   ;  ", "missing queryNoWith body"),
        # duplicate identifier (sql_parser.go:1901)
        ("""WITH m1 AS (SELECT count(*) FROM trips),
            m1 AS (SELECT count(*) FROM trips)
            SELECT 1 FROM m1;""",
         "subquery/withQuery identifier: m1 already exist"),
        # unknown identifier (sql_parser.go:1758)
        ("""WITH m1 AS (SELECT count(*) FROM trips)
            SELECT c FROM nope;""",
         "cannot find withQuery identifier: nope"),
        # HAVING (sql_parser.go:496)
        ("SELECT count(*) FROM t GROUP BY c HAVING count(*) > 1",
         "having not yet supported"),
        # inner LIMIT (sql_parser.go:390)
        ("""SELECT c FROM (SELECT c FROM t LIMIT 5)""",
         "limit on query level > 0 not supported"),
    ]
    for stmt, msg in cases:
        with _pt.raises(SQLParseError) as ei:
            parse_sql(stmt)
        assert msg in str(ei.value), (stmt, str(ei.value), msg)
