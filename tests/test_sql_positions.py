"""SQL parser hardening (round-4): reference-exact error positions,
the success-side port of sql_parser_test.go, and adversarial fuzz of the
clause/conjunct splitters.

Position cases use the reference test file's VERBATIM statements
(tabs included) and assert full-string equality of the error including
`(line:L, col:C)` — /root/reference/query/sql/sql_parser_test.go:388-526.
"""

from __future__ import annotations

import random

import pytest

from aresdb_tpu.query.sql import (SQLParseError, _find_clauses,
                                  _split_top_level, parse_sql)


def _err(stmt: str) -> str:
    with pytest.raises(SQLParseError) as ei:
        parse_sql(stmt)
    return str(ei.value)


# ---------------------------------------------------------------------------
# reference-exact (line, col) anchors — verbatim statements
# ---------------------------------------------------------------------------

def test_pos_recursive_at_statement_start():
    # sql_parser_test.go:388-401
    stmt = ("WITH RECURSIVE t(n) AS (\n"
            "\t\t\t\tVALUES (1)\n"
            "\t\t\tUNION ALL\n"
            "    \t\t\tSELECT n+1 FROM t WHERE n < 100\n"
            "\t\t\t)\n"
            "\t\t\tSELECT sum(n) FROM t;")
    assert _err(stmt) == "RECURSIVE not yet supported at (line:1, col:0)"


def test_pos_nested_with_at_inner_with_token():
    # sql_parser_test.go:405-417
    stmt = ("WITH m1 (Requested) AS\n"
            "\t\t\t\t(With m (Requested) AS \n"
            "\t\t\t\t\tSELECT count(*) AS Requested FROM trips\n"
            "\t\t\t\tSELECT Requested FROM m)\n"
            "\t\t\tSELECT Requested FROM m1;")
    assert _err(stmt) == ("only support 1 level with query "
                          "at (line:2, col:5)")


def test_pos_missing_with_query_body():
    # sql_parser_test.go:437-450 (both variants anchor at line:2 col:3)
    for stmt in (
        ("WITH m1 (f) AS (SELECT fare AS f FROM trips),\n"
         "\t\t\tSELECT f, driverUuid, riderUuid\n"
         "\t\t\tFROM m1 NATURAL LEFT JOIN trips;"),
        ("WITH m2 (f) AS (SELECT fare AS f FROM trips),\n"
         "\t\t\tSELECT driverUuid, riderUuid, f\n"
         "\t\t\tFROM trips NATURAL LEFT JOIN m2;"),
    ):
        assert _err(stmt) == "missing with query body at (line:2, col:3)"


def test_pos_identifier_in_expression():
    # sql_parser_test.go:501-512 — message ends in '.', so the reference
    # formats the position WITHOUT 'at'
    stmt = ("WITH m1 (avg_fare) AS \n"
            "\t\t\t\t(SELECT avg(fare) AS avg_fare FROM trips)\n"
            "\t\t\tSELECT fare FROM trips \n"
            "\t\t\tWHERE fare > m1.avg_fare;")
    assert _err(stmt) == ("subquery/withQuery identifier in expression "
                          "not supported yet. (line:4, col:16)")


def test_pos_empty_query():
    # sql_parser_test.go:516-524
    assert _err("") == "missing queryNoWith body at (line:1, col:0)"


def test_pos_natural_join_in_with_body():
    # sql_parser_test.go:421-433. The reference's ANTLR anchors this at
    # the join RELATION start ("trips", line:2 col:56); the clause parser
    # anchors at the NATURAL keyword itself (line:3 col:4) — same
    # construct, one token later. Message text is reference-exact.
    stmt = ("WITH m1 (Requested) AS (SELECT count(*) AS Requested "
            "FROM trips),\n"
            "\t\t\tm2 (Completed) AS (SELECT count(*) AS Completed\t"
            "FROM trips \n"
            "\t\t\t\tNATURAL LEFT JOIN m1)\n"
            "\t\t\tSELECT Completed, Requested, Completed/Requested\n"
            "\t\t\tFROM m1 NATURAL LEFT JOIN m2;")
    assert _err(stmt) == ("natural join not supported at "
                          "subquery/withQuery at (line:3, col:4)")


def test_pos_clause_level_anchors():
    """Clause-parser-native errors carry positions too."""
    e = _err("SELECT count(*) FROM t\nGROUP BY c\nHAVING count(*) > 1")
    assert e.endswith("at (line:3, col:0)"), e
    e = _err("SELECT c FROM (SELECT c FROM t LIMIT 5)")
    assert "limit on query level > 0 not supported at (line:1, col:15)" == e
    e = _err("SELECT c FROM (SELECT c FROM (SELECT c FROM t) GROUP BY c)")
    assert e == "only support 1 level subquery at (line:1, col:29)"
    e = _err("SELECT DISTINCT c FROM t")
    assert e.endswith("at (line:1, col:7)"), e
    e = _err("SELECT count(*) FROM t WHERE aql_now(ts)")
    assert e == "aql_now requires 2 arguments at (line:1, col:29)"
    e = _err("SELECT count(*) FROM t LIMIT banana")
    assert e.endswith("at (line:1, col:29)"), e


# ---------------------------------------------------------------------------
# success-side port of sql_parser_test.go:28-386, 528-599
# ---------------------------------------------------------------------------

def test_success_row_filters_multi_measure():
    """:38 'parse row filters should work' — two aggregates PARSE fine
    (non-composite execution later rejects with the compiler's 'exactly 1
    measure is required'); a top-level OR keeps WHERE as ONE filter."""
    q = parse_sql(
        "SELECT count(*) AS completed_trips, sum(fare)\n"
        "\t\t\tFROM trips\n"
        "\t\t\tWHERE status='completed' AND NOT status = 'cancelled' "
        "OR marketplace='agora'\n"
        "\t\t\tGROUP BY status")
    assert q.table == "trips"
    assert [(m.expr, m.alias) for m in q.measures] == [
        ("count(*)", "completed_trips"), ("sum(fare)", "")]
    assert q.filters == ["status='completed' AND NOT status = 'cancelled' "
                         "OR marketplace='agora'"]
    assert [d.expr for d in q.dimensions] == ["status"]


def test_success_geography_intersects():
    """:54 — geo join conditions pass through; IN-list with a hex UUID
    literal survives the OR-keeps-one-filter rule."""
    q = parse_sql(
        "SELECT count(*) AS completed_trips\n"
        "\t\t\tFROM trips LEFT JOIN geo_table g "
        "ON geography_intersects(g.shape, request_location)\n"
        "\t\t\tWHERE status='completed' AND NOT status = 'cancelled' "
        "OR marketplace='agora' AND g.geofence_uuid IN "
        "(0x9EAE9256C1F547449E9BD3A2B64826B9)\n"
        "\t\t\tGROUP BY status, hex(g.geofence_uuid)")
    assert q.table == "trips"
    assert [(j.table, j.alias, j.conditions) for j in q.joins] == [
        ("geo_table", "g",
         ["geography_intersects(g.shape, request_location)"])]
    assert q.filters == [
        "status='completed' AND NOT status = 'cancelled' OR "
        "marketplace='agora' AND g.geofence_uuid IN "
        "(0x9EAE9256C1F547449E9BD3A2B64826B9)"]
    assert [d.expr for d in q.dimensions] == ["status",
                                              "hex(g.geofence_uuid)"]


def test_success_dimension_alias_in_group_by():
    """:73 'parse dimensions should work' — GROUP BY references the
    select alias; the dim resolves to the real expression."""
    q = parse_sql("SELECT status AS trip_status, count(*) \n"
                  "\t\t\tFROM trips \n"
                  "\t\t\tGROUP BY trip_status;")
    assert q.measures[0].expr == "count(*)"
    assert [(d.expr, d.alias) for d in q.dimensions] == [
        ("status", "trip_status")]


def test_success_non_agg_wildcard():
    """:87 — select items become dims with measure literal 1."""
    q = parse_sql("SELECT field1, *\n\t\t\tFROM trips LIMIT 10;")
    assert q.measures[0].expr == "1"
    assert [d.expr for d in q.dimensions] == ["field1", "*"]
    assert q.limit == 10


def test_success_sort_by():
    """:101 — bare ORDER BY defaults ascending."""
    q = parse_sql("SELECT field1\n\t\t\tFROM trips\n"
                  "\t\t\tORDER BY field1;")
    assert [d.expr for d in q.dimensions] == ["field1"]
    assert [(s.name, s.order.lower()) for s in q.sorts] == [
        ("field1", "asc")]


def test_success_all_time_bucket_udfs():
    """:118 'parse time UDFs should work' — all 16 bucketizers."""
    tbs = ["minute", "hour", "day", "week", "month", "quarter", "year",
           "time of day", "minutes of day", "hour of day", "hour of week",
           "day of week", "day of month", "day of year", "month of year",
           "quarter of year"]
    udfs = ["minute", "hour", "day", "week", "month", "quarter", "year",
            "time_of_day", "minutes_of_day", "hour_of_day", "hour_of_week",
            "day_of_week", "day_of_month", "day_of_year", "month_of_year",
            "quarter_of_year"]
    for udf, tb in zip(udfs, tbs):
        q = parse_sql(
            f"SELECT count(*) FROM trips\n\t\t\tGROUP BY "
            f'aql_time_bucket_{udf}("request_at", "minute", '
            f'"America/New_York");')
        d = q.dimensions[0]
        assert (d.expr, d.time_bucketizer, d.time_unit) == (
            "request_at", tb, "minute"), udf
        assert q.timezone == "America/New_York"


def test_success_time_filter_dim_timezone_and_row_filter():
    """:177/:195 — aql_time_filter + bucketizer + extra conjunct."""
    q = parse_sql(
        "SELECT  count(*)\n"
        "\t\t\tFROM trips \n"
        '\t\t\tWHERE aql_time_filter(request_at, "96 quarter-hours ago", '
        '"1 quarter-hours ago", America/New_York) AND marketplace="agora"\n'
        "\t\t\tGROUP BY aql_time_bucket_minutes(request_at, \"minute\", "
        "America/New_York);")
    assert (q.time_filter.column, q.time_filter.from_, q.time_filter.to) \
        == ("request_at", "96 quarter-hours ago", "1 quarter-hours ago")
    assert q.filters == ['marketplace="agora"']
    d = q.dimensions[0]
    assert (d.expr, d.time_bucketizer, d.time_unit) == (
        "request_at", "minutes", "minute")
    assert q.timezone == "America/New_York"


def test_success_numeric_bucketizer_alias_resolution():
    """:213 — GROUP BY buckets the select ALIAS ('pop'); the dim must
    resolve to the aliased expression ('population')."""
    q = parse_sql(
        "SELECT  population AS pop, count(*)\n"
        "\t\t\tFROM trips\n"
        '\t\t\tWHERE aql_time_filter(request_at, "96 quarter-hours ago", '
        '"1 quarter-hours ago", America/New_York) AND marketplace="agora"\n'
        "\t\t\tGROUP BY aql_time_bucket_hour(request_at, \"minute\", "
        "America/New_York), aql_numeric_bucket_logbase(pop, 2);")
    assert q.measures[0].expr == "count(*)"
    assert len(q.dimensions) == 2
    td, nd = q.dimensions
    assert (td.expr, td.time_bucketizer) == ("request_at", "hour")
    assert (nd.expr, nd.alias) == ("population", "pop")
    assert nd.numeric_bucketizer.log_base == 2.0


def test_success_multi_join_and_split_conditions():
    """:231 'parse join should work' — two LEFT JOINs, AND-split ON."""
    q = parse_sql(
        "SELECT  population AS pop, count(*)\n"
        "\t\t\tFROM trips\n"
        "\t\t\t\tLEFT JOIN trips AS rush_leg\n"
        "\t\t\t\t\tON trips.workflow_uuid=rush_leg.workflow_uuid "
        "AND status='completed'\n"
        "  \t\t\t\tLEFT JOIN api_cities AS cities\n"
        "\t\t\t\t\tON cities.id=city_id\n"
        '\t\t\tWHERE aql_time_filter(request_at, "96 quarter-hours ago", '
        '"1 quarter-hours ago", America/New_York) AND marketplace="agora"\n'
        "\t\t\tGROUP BY aql_time_bucket_hours(request_at, \"minute\", "
        "America/New_York), aql_numeric_bucket_logbase(pop, 2);")
    assert [(j.table, j.alias, j.conditions) for j in q.joins] == [
        ("trips", "rush_leg",
         ["trips.workflow_uuid=rush_leg.workflow_uuid",
          "status='completed'"]),
        ("api_cities", "cities", ["cities.id=city_id"]),
    ]
    assert q.filters == ['marketplace="agora"']


def test_success_in_operator():
    """:528 — IN-list stays one filter (sane form, without the
    reference's trailing-garbage ANTLR quirk)."""
    q = parse_sql("SELECT fare FROM trips \n"
                  "\t\t\tWHERE city_id in (1,2,3);")
    assert q.filters == ["city_id in (1,2,3)"]
    assert [d.expr for d in q.dimensions] == ["fare"]
    assert q.measures[0].expr == "1"


def test_success_array_functions():
    """:548 — length/element_at/contains pass through verbatim."""
    cases = [
        ("SELECT length(array_field2) FROM table1\n"
         "\t\t\tWHERE length(array_field1) > 1;",
         "length(array_field2)", "length(array_field1) > 1"),
        ("SELECT element_at(array_field2, 1) FROM table1\n"
         "\t\t\tWHERE element_at(array_field1, 0) > 4;",
         "element_at(array_field2, 1)", "element_at(array_field1, 0) > 4"),
        ("SELECT contains(array_field2, 'bar') FROM table1\n"
         "\t\t\tWHERE contains(array_field1, 'foo');",
         "contains(array_field2, 'bar')", "contains(array_field1, 'foo')"),
    ]
    for stmt, dim, filt in cases:
        q = parse_sql(stmt)
        assert q.table == "table1"
        assert [d.expr for d in q.dimensions] == [dim]
        assert q.filters == [filt]
        assert q.measures[0].expr == "1"


# ---------------------------------------------------------------------------
# splitter fuzz: keyword-bearing identifiers + adversarial string literals
# ---------------------------------------------------------------------------

# identifiers CONTAINING clause keywords as substrings — must never split
_IDS = ["fromage", "selector", "grouporder", "andover", "order_by_col",
        "join_count", "on_time", "whereabouts", "in_flight", "ascent",
        "descent", "limit_val", "having_fun", "bypass", "natural_gas",
        "left_leg", "innermost", "crossing", "asset", "orchid",
        "selection", "by_group", "fromto"]

# literals containing keywords/structural chars — quotes shield them
_LITS = ["from (select, where) and", "group by 'x'", "it''s from where",
         "LIMIT 5; DROP", "a and b or c", ") order by (", "as as as",
         "left join t on", ",,,((", "select * from t"]


def test_fuzz_splitters_keyword_identifiers_and_literals():
    rng = random.Random(20260820)
    for _ in range(150):
        tbl = rng.choice(_IDS)
        mcol = rng.choice(_IDS)
        f1c, f2c = rng.sample(_IDS, 2)
        l1, l2, l3 = (rng.choice(_LITS) for _ in range(3))
        d1, d2 = rng.sample(_IDS, 2)
        lim = rng.randint(1, 9999)
        stmt = (f"SELECT sum({mcol}) FROM {tbl} "
                f"WHERE {f1c}='{l1}' AND {f2c} in ('{l2}', '{l3}') "
                f"GROUP BY {d1}, {d2} "
                f"ORDER BY {d1} desc LIMIT {lim}")
        q = parse_sql(stmt)
        assert q.table == tbl
        assert q.measures[0].expr == f"sum({mcol})"
        assert q.filters == [f"{f1c}='{l1}'",
                             f"{f2c} in ('{l2}', '{l3}')"]
        assert [d.expr for d in q.dimensions] == [d1, d2]
        assert [(s.name, s.order) for s in q.sorts] == [(d1, "desc")]
        assert q.limit == lim


def test_fuzz_doubled_quote_escapes_stay_one_filter():
    """SQL-standard '' escapes inside literals must not leak conjunct
    splits or clause keywords."""
    q = parse_sql("SELECT count(*) FROM t "
                  "WHERE note='it''s AND that''s from x' AND ok=1")
    assert q.filters == ["note='it''s AND that''s from x'", "ok=1"]


def test_fuzz_quoted_identifiers_with_structure():
    q = parse_sql('SELECT count(*) FROM "weird table" '
                  'WHERE "col, (name)"=3 GROUP BY "group by"')
    assert q.table == "weird table"
    assert q.filters == ['"col, (name)"=3']
    assert [d.expr for d in q.dimensions] == ['"group by"']


def test_fuzz_split_top_level_unit():
    assert _split_top_level("a, f(b, c), 'x,y', d", r",") == [
        "a", " f(b, c)", " 'x,y'", " d"]
    assert _split_top_level("a and b AND 'c and d' and (e and f)",
                            r"\band\b") == [
        "a ", " b ", " 'c and d' ", " (e and f)"]
    # keyword-bearing identifiers don't split (word boundaries)
    assert _split_top_level("andover and mandate", r"\band\b") == [
        "andover ", " mandate"]


def test_fuzz_find_clauses_positions_are_stable():
    stmt = ("SELECT a FROM t WHERE x='group by from where' "
            "GROUP BY a LIMIT 5")
    clauses, offs = _find_clauses(stmt)
    assert set(clauses) == {"select", "from", "where", "group by", "limit"}
    for kw, (kw_off, body_off) in offs.items():
        assert stmt.lower().startswith(kw, kw_off), kw
        body = clauses[kw]
        if body:
            assert stmt[body_off:body_off + len(body)] == body, kw
