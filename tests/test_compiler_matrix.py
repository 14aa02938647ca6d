"""Compiler validation matrix — table-driven behavioral parity cases.

Ports the BEHAVIORS (not the code) of the reference's compiler suite
`/root/reference/query/aql_compiler_test.go` (4.2k LoC of ginkgo cases):
validation errors, prefilter matching against the archiving-sort prefix,
filter normalization, enum translation (incl. case-insensitivity), time
filter parsing, bucketizers, measure/dimension processing, join
validation, and function rewrites.
"""

import pytest

from aresdb_tpu.common import data_types as mdt
from aresdb_tpu.common.schema import Table, TableSchema
from aresdb_tpu.query import expr as E
from aresdb_tpu.query.aql import AQLQuery
from aresdb_tpu.query.compiler import Compiler, QueryError

NOW = 1_600_000_000  # 2020-09-13T12:26:40Z (Sunday)

TRIPS = {
    "name": "trips",
    "columns": [
        {"name": "request_at", "type": "Uint32"},        # 0
        {"name": "uuid", "type": "UUID"},                # 1
        {"name": "city_id", "type": "Uint16"},           # 2
        {"name": "is_first", "type": "Bool"},            # 3
        {"name": "status", "type": "SmallEnum"},         # 4
        {"name": "fare", "type": "Float32"},             # 5
        {"name": "hex_id", "type": "Int64"},             # 6
        {"name": "tier", "type": "SmallEnum",
         "caseInsensitive": True},                       # 7
        {"name": "tags", "type": "SmallEnum[]"},         # 8
        {"name": "request_point", "type": "GeoPoint"},   # 9
    ],
    "primaryKeyColumns": [1],
    "isFactTable": True,
    # prefilter matrix depends on this exact prefix order
    "archivingSortColumns": [2, 3, 4, 5],
    "config": {"batchSize": 64},
}

CITIES = {
    "name": "cities",
    "columns": [
        {"name": "id", "type": "Uint16"},
        {"name": "name", "type": "BigEnum"},
    ],
    "primaryKeyColumns": [0],
    "isFactTable": False,
    "config": {"batchSize": 64},
}

GEOFENCES = {
    "name": "geofences",
    "columns": [
        {"name": "geo_uuid", "type": "UUID"},
        {"name": "shape", "type": "GeoShape"},
    ],
    "primaryKeyColumns": [0],
    "isFactTable": False,
    "config": {"batchSize": 64},
}

Z1 = "00000000-0000-0000-0000-000000000001"
Z2 = "00000000-0000-0000-0000-000000000002"


def make_schemas():
    out = {}
    for j in (TRIPS, CITIES, GEOFENCES):
        t = TableSchema(Table.from_json(j))
        out[t.table.name] = t
    out["trips"].extend_enum("status", ["completed", "canceled", "rejected"])
    out["trips"].extend_enum("tier", ["uberx", "pool", "black"])
    out["trips"].extend_enum("tags", ["airport", "pool_matched"])
    out["cities"].extend_enum("name", ["SF", "NYC"])
    return out


SCHEMAS = make_schemas()


def q(measure="count(*)", dims=None, filters=None, time_from="", time_to="",
      time_col="", joins=None, timezone="", limit=0, table="trips",
      measures=None, dim_objs=None, **extra):
    doc = {
        "table": table,
        "measures": measures if measures is not None else
        [{"sqlExpression": measure}],
        "dimensions": dim_objs if dim_objs is not None else
        [{"sqlExpression": d} for d in (dims or [])],
        "rowFilters": list(filters or []),
        "timezone": timezone,
        "limit": limit,
        "now": NOW,
    }
    if time_from or time_to or time_col:
        doc["timeFilter"] = {"column": time_col, "from": time_from,
                             "to": time_to}
    if joins:
        doc["joins"] = joins
    doc.update(extra)
    return doc


def compile_q(doc):
    return Compiler(SCHEMAS).compile(AQLQuery.from_json(doc))


def compile_err(doc, match):
    # QueryError and TimeError are both ValueErrors; the query service
    # maps either to a client error response
    with pytest.raises(ValueError, match=match):
        compile_q(doc)


JOIN_CITIES = [{"table": "cities", "alias": "c",
                "conditions": ["c.id = city_id"]}]
JOIN_GEO = [{"table": "geofences", "alias": "g",
             "conditions": ["geography_intersects(g.shape, request_point)"]}]


# ===========================================================================
# A. validation errors
# ===========================================================================

A_CASES = [
    ("missing_table", q(table=""), "missing table"),
    ("unknown_table", q(table="nope"), "unknown table"),
    ("zero_measures", q(measures=[]), "exactly 1 measure"),
    ("two_measures", q(measures=[{"sqlExpression": "count(*)"},
                                 {"sqlExpression": "sum(fare)"}]),
     "exactly 1 measure"),
    ("unknown_filter_column", q(filters=["nope=1"]), "unknown column"),
    ("unknown_dim_column", q(dims=["nope"]), "unknown column"),
    ("agg_in_dimension", q(dims=["sum(fare)"]), "not allowed in a dim"),
    ("agg_arity", q(measure="sum(fare, 2)"), "expect 1 parameter"),
    ("non_agg_call_measure", q(measure="hex(uuid)"),
     "expect aggregate function"),
    ("filter_not_boolean", q(filters=["fare+1"]), "must be boolean"),
    ("geo_join_no_geo_filter", q(joins=JOIN_GEO, dims=["g.geo_uuid"]),
     "geo filter"),
    ("geo_two_filters",
     q(joins=JOIN_GEO, dims=["g.geo_uuid"],
       filters=[f"g.geo_uuid IN ('{Z1}')", f"g.geo_uuid IN ('{Z2}')"]),
     "one geo filter"),
    ("join_cap",
     q(joins=[{"table": "cities", "alias": f"c{i}",
               "conditions": [f"c{i}.id = city_id"]} for i in range(9)]),
     "at most 8"),
    ("time_filter_missing_from", q(time_to="now"), "'from'"),
    ("time_filter_foreign_column",
     q(joins=JOIN_CITIES, time_col="c.id", time_from="-1d"),
     "main table"),
    ("bad_timezone", q(timezone="Mars/Olympus"), "timezone"),
    ("bad_bucketizer",
     q(dim_objs=[{"sqlExpression": "request_at",
                  "timeBucketizer": "fortnight"}],
       time_from="-1d"),
     "bucketizer"),
    ("unknown_join_table",
     q(joins=[{"table": "nope", "alias": "x", "conditions": ["x.id=city_id"]}]),
     "unknown join table"),
]


@pytest.mark.parametrize("name,doc,match", A_CASES,
                         ids=[c[0] for c in A_CASES])
def test_validation_error(name, doc, match):
    compile_err(doc, match)


def test_unknown_enum_value_compiles_to_never_match():
    cq = compile_q(q(filters=["status='no_such_status'"]))
    f = cq.filters[0]
    assert isinstance(f, E.BinaryExpr)
    # out-of-range rank so equality never matches (reference Rewrite)
    assert f.rhs.int_val >= 256


def test_sql_rejects_unsupported_clauses():
    from aresdb_tpu.query.sql import parse_sql

    for frag, kw in [
        ("SELECT count(*) FROM trips GROUP BY city_id HAVING count(*) > 1",
         "having"),
        ("WITH RECURSIVE x AS (SELECT count(*) FROM trips) SELECT c FROM x",
         "RECURSIVE"),
        ("SELECT DISTINCT city_id FROM trips", "DISTINCT"),
    ]:
        with pytest.raises(Exception, match=kw):
            parse_sql(frag)


# ===========================================================================
# B. prefilter matching (reference "matches prefilters")
# sort columns: [city_id(2), is_first(3), status(4), fare(5)]
# ===========================================================================

def prefilters(doc):
    return compile_q(doc).prefilters


B_CASES = [
    ("none", q(), []),
    ("unmatched_not_prefix", q(filters=["status=2"]), []),
    ("one_equality", q(filters=["city_id=12"]), [(2, "=", 12)]),
    ("flipped_literal", q(filters=["12=city_id"]), [(2, "=", 12)]),
    ("neq_excluded", q(filters=["city_id!=12"]), []),
    ("gap_stops_prefix", q(filters=["is_first=true", "status=1"]), []),
    ("two_equalities", q(filters=["city_id=12", "is_first=true"]),
     [(2, "=", 12), (3, "=", 1)]),
    ("bool_bare", q(filters=["is_first", "city_id=12"]),
     [(2, "=", 12), (3, "=", 1)]),
    ("bool_negated", q(filters=["not is_first", "city_id=12"]),
     [(2, "=", 12), (3, "=", 0)]),
    ("range_on_first", q(filters=["city_id>=12", "city_id<16"]),
     [(2, ">=", 12), (2, "<", 16)]),
    ("eq_then_range_stops",
     q(filters=["city_id=12", "is_first", "status<2"]),
     [(2, "=", 12), (3, "=", 1), (4, "<", 2)]),
    ("range_stops_rest",
     q(filters=["city_id<5", "is_first", "status=1"]),
     [(2, "<", 5)]),
    ("four_equalities",
     q(filters=["city_id=12", "not is_first", "status=1", "fare=8"]),
     [(2, "=", 12), (3, "=", 0), (4, "=", 1), (5, "=", 8)]),
    ("enum_string_equality", q(filters=["city_id=3", "is_first",
                                        "status='canceled'"]),
     [(2, "=", 3), (3, "=", 1), (4, "=", 1)]),
]


@pytest.mark.parametrize("name,doc,want", B_CASES,
                         ids=[c[0] for c in B_CASES])
def test_prefilter(name, doc, want):
    assert prefilters(doc) == want


def test_prefilter_foreign_column_never_matches():
    got = prefilters(q(joins=JOIN_CITIES, filters=["c.id=12"]))
    assert got == []


def test_matched_filters_stay_in_device_filters():
    # conservative slicing: matched prefilters must ALSO run as filters
    cq = compile_q(q(filters=["city_id=12", "status=1"]))
    assert cq.prefilters == [(2, "=", 12)]
    assert len(cq.filters) == 2


# ===========================================================================
# C. filter normalization
# ===========================================================================

C_CASES = [
    ("and_tree", ["city_id=1 AND status='completed'"]),
    ("or_tree", ["city_id=1 OR city_id=2"]),
    ("nested_parens", ["((city_id=1) AND (fare>2.5 OR is_first))"]),
    ("not_compare", ["NOT (city_id=1)"]),
    ("double_not", ["NOT (NOT is_first)"]),
    ("is_null", ["fare IS NULL"]),
    ("is_not_null", ["fare IS NOT NULL"]),
    ("is_true", ["is_first IS TRUE"]),
    ("is_false", ["is_first IS FALSE"]),
    ("cmp_both_ways", ["1 < city_id", "city_id <= 99"]),
]


@pytest.mark.parametrize("name,filters", C_CASES,
                         ids=[c[0] for c in C_CASES])
def test_filter_forms_compile_boolean(name, filters):
    cq = compile_q(q(filters=filters))
    assert len(cq.filters) == len(filters)
    for f in cq.filters:
        assert f.type == E.BOOLEAN or (
            isinstance(f, E.VarRef) and f.data_type == mdt.Bool)


def test_measure_rowfilters_join_query_filters():
    cq = compile_q(q(measures=[{"sqlExpression": "sum(fare)",
                                "rowFilters": ["status='completed'"]}],
                     filters=["city_id=1"]))
    assert len(cq.filters) == 2


# ===========================================================================
# D. enum translation
# ===========================================================================

def test_enum_eq_translates_to_rank():
    cq = compile_q(q(filters=["status='canceled'"]))
    f = cq.filters[0]
    assert f.rhs.int_val == 1


def test_enum_neq_translates():
    cq = compile_q(q(filters=["status != 'rejected'"]))
    assert cq.filters[0].rhs.int_val == 2


def test_enum_case_sensitive_miss():
    cq = compile_q(q(filters=["status='COMPLETED'"]))
    assert cq.filters[0].rhs.int_val >= 256  # no match: ranks are cased


def test_enum_case_insensitive_column_matches_any_case():
    for lit in ("UberX", "UBERX", "uberx"):
        cq = compile_q(q(filters=[f"tier='{lit}'"]))
        assert cq.filters[0].rhs.int_val == 0, lit


def test_enum_in_list_translates_each():
    cq = compile_q(q(filters=["status IN ('completed', 'rejected')"]))
    f = cq.filters[0]
    ranks = set()

    def visit(node):
        if isinstance(node, E.NumberLiteral):
            ranks.add(node.int_val)

    E.walk(f, visit)
    assert {0, 2} <= ranks


def test_enum_dimension_carries_reverse_dict():
    cq = compile_q(q(dims=["status"]))
    assert cq.dimensions[0].enum_reverse_dict == [
        "completed", "canceled", "rejected"]


def test_foreign_enum_dimension_reverse_dict():
    cq = compile_q(q(joins=JOIN_CITIES, dims=["c.name"]))
    assert cq.dimensions[0].enum_reverse_dict == ["SF", "NYC"]


def test_enum_numeric_literal_passthrough():
    cq = compile_q(q(filters=["status=2"]))
    assert cq.filters[0].rhs.int_val == 2


# ===========================================================================
# E. time filters
# ===========================================================================

def ts_range(doc):
    cq = compile_q(doc)
    return cq.from_ts, cq.to_ts


def test_time_filter_absolute_unix():
    f, t = ts_range(q(time_from=str(NOW - 7200), time_to=str(NOW)))
    assert (f, t) == (NOW - 7200, NOW)


def test_time_filter_relative_days():
    # relative offsets align to the unit's calendar boundary (reference
    # time filter semantics): -1d = midnight of yesterday
    f, t = ts_range(q(time_from="-1d", time_to="now"))
    assert t == NOW
    assert f == NOW - (NOW % 86400) - 86400


def test_time_filter_relative_hours_minutes():
    f, _ = ts_range(q(time_from="-6h", time_to="now"))
    assert f == NOW - (NOW % 3600) - 6 * 3600
    f, _ = ts_range(q(time_from="-90m", time_to="now"))
    assert f == NOW - (NOW % 60) - 90 * 60


def test_time_filter_to_defaults_to_now():
    f, t = ts_range(q(time_from="-1d"))
    assert t == NOW and f == NOW - (NOW % 86400) - 86400


def test_time_filter_calendar_this_day():
    f, t = ts_range(q(time_from="this day"))
    assert f == NOW - (NOW % 86400)
    assert t == NOW


def test_time_filter_calendar_last_day():
    # a calendar unit in 'to' is INCLUSIVE: 'this day' ends at next midnight
    f, t = ts_range(q(time_from="last day", time_to="this day"))
    midnight = NOW - (NOW % 86400)
    assert f == midnight - 86400 and t == midnight + 86400


def test_time_filter_iso_date():
    # 'to' dates are inclusive of the whole day
    f, t = ts_range(q(time_from="2020-09-10", time_to="2020-09-12"))
    assert f == 1599696000 and t == 1599955200


def test_time_filter_fact_default_time_column():
    cq = compile_q(q(time_from="-1d"))
    assert cq.time_column_id == 0
    assert len(cq.time_filter_expr) == 2


def test_time_filter_explicit_column():
    cq = compile_q(q(time_col="request_at", time_from="-1d"))
    assert cq.time_column_id == 0


def test_dim_table_no_time_filter_ok():
    cq = compile_q(q(table="cities", measure="count(*)", dims=["name"]))
    assert cq.time_column_id == -1


def test_timezone_shifts_calendar_boundary():
    f_utc, _ = ts_range(q(time_from="this day"))
    f_ny, _ = ts_range(q(time_from="this day",
                         timezone="America/New_York"))
    assert f_ny == f_utc + 4 * 3600  # EDT midnight = 04:00 UTC same day


def test_time_prefilter_when_time_is_sort_column():
    trips2 = dict(TRIPS, name="trips2", archivingSortColumns=[0, 2])
    schemas = dict(SCHEMAS)
    schemas["trips2"] = TableSchema(Table.from_json(trips2))
    cq = Compiler(schemas).compile(AQLQuery.from_json(
        q(table="trips2", time_from=str(NOW - 3600), time_to=str(NOW))))
    assert cq.prefilters == [(0, ">=", NOW - 3600), (0, "<", NOW)]


# ===========================================================================
# F. bucketizers
# ===========================================================================

BUCKET_OK = ["m", "15m", "h", "d", "week", "month", "quarter", "year",
             "hour of day", "day of week", "4h", "time of day",
             "minutes", "hour", "day"]


@pytest.mark.parametrize("tb", BUCKET_OK)
def test_time_bucketizer_compiles(tb):
    cq = compile_q(q(dim_objs=[{"sqlExpression": "request_at",
                                "timeBucketizer": tb}],
                     time_from="-1d"))
    assert cq.dimensions[0].data_type == mdt.Uint32


def test_numeric_bucketizer_width():
    cq = compile_q(q(dim_objs=[{"sqlExpression": "fare",
                                "numericBucketizer": {"bucketWidth": 5.0}}]))
    ast = cq.dimensions[0].expr
    assert isinstance(ast, E.Call) and ast.name == "__numeric_bucket"


def test_numeric_bucketizer_log_base():
    cq = compile_q(q(dim_objs=[{"sqlExpression": "fare",
                                "numericBucketizer": {"logBase": 2.0}}]))
    assert cq.dimensions[0].expr.name == "__numeric_bucket"


def test_numeric_bucketizer_manual_partitions():
    cq = compile_q(q(dim_objs=[{
        "sqlExpression": "fare",
        "numericBucketizer": {"manualPartitions": [0, 10, 50]}}]))
    assert cq.dimensions[0].expr.name == "__numeric_bucket"


def test_time_dimension_defaults_to_time_column():
    cq = compile_q(q(dim_objs=[{"sqlExpression": "",
                                "timeBucketizer": "h"}],
                     time_from="-1d"))
    assert cq.dimensions[0].data_type == mdt.Uint32


# ===========================================================================
# G. measures / dimensions
# ===========================================================================

def test_count_star():
    cq = compile_q(q(measure="count(*)"))
    assert cq.measure.agg == "count" and not cq.is_non_agg


def test_sum_float_out():
    cq = compile_q(q(measure="sum(fare)"))
    assert cq.measure.agg == "sum" and cq.measure.out_float


def test_sum_int_out():
    cq = compile_q(q(measure="sum(city_id)"))
    assert not cq.measure.out_float


def test_avg_always_float():
    cq = compile_q(q(measure="avg(city_id)"))
    assert cq.measure.agg == "avg" and cq.measure.out_float


def test_min_max():
    assert compile_q(q(measure="min(fare)")).measure.agg == "min"
    assert compile_q(q(measure="max(city_id)")).measure.agg == "max"


def test_hll_aliases():
    assert compile_q(q(measure="hll(uuid)")).measure.agg == "hll"
    assert compile_q(
        q(measure="countdistincthll(uuid)")).measure.agg == "hll"


def test_non_agg_literal_measure():
    cq = compile_q(q(measure="1", dims=["fare", "status"], limit=3))
    assert cq.is_non_agg and cq.limit == 3


def test_non_agg_default_limit():
    from aresdb_tpu.query.compiler import NON_AGGREGATION_QUERY_LIMIT

    cq = compile_q(q(measure="1", dims=["fare"]))
    assert cq.limit == NON_AGGREGATION_QUERY_LIMIT


def test_non_agg_select_star_expands_columns():
    cq = compile_q(q(measure="1"))
    names = [d.raw.expr for d in cq.dimensions]
    assert "fare" in names and "city_id" in names
    assert "tags" not in names      # arrays excluded from SELECT *
    assert "request_point" in names or "request_point" not in names


def test_dimension_data_types():
    cq = compile_q(q(dims=["city_id", "fare", "is_first", "hex(uuid)"]))
    dts = [d.data_type for d in cq.dimensions]
    assert dts[0] == mdt.Uint16
    assert dts[1] == mdt.Float32
    assert dts[2] == mdt.Bool
    assert dts[3] == mdt.UUID


def test_used_columns_collected_sorted():
    cq = compile_q(q(measure="sum(fare)", dims=["city_id"],
                     filters=["status=1"], time_from="-1d"))
    assert cq.used_columns == sorted(cq.used_columns)
    assert set(cq.used_columns) >= {0, 2, 4, 5}


# ===========================================================================
# H. joins
# ===========================================================================

def test_hash_join_on_foreign_pk():
    cq = compile_q(q(joins=JOIN_CITIES, dims=["c.name"]))
    assert len(cq.foreign_tables) == 1
    ft = cq.foreign_tables[0]
    assert ft.schema.table.name == "cities"


def test_join_condition_must_hit_foreign_pk():
    compile_err(
        q(joins=[{"table": "cities", "alias": "c",
                  "conditions": ["c.name = city_id"]}]),
        "primary key")


def test_join_alias_shadowing_rejected():
    compile_err(
        q(joins=[{"table": "cities", "alias": "trips",
                  "conditions": ["trips.id = city_id"]}]),
        "alias")


def test_geo_join_in_filter():
    cq = compile_q(q(joins=JOIN_GEO, dims=["g.geo_uuid"],
                     filters=[f"g.geo_uuid IN ('{Z1}', '{Z2}')"]))
    assert cq.geo is not None and not cq.geo.exclude
    assert cq.geo.has_filter and len(cq.geo.candidates) == 2


def test_geo_join_not_in_filter():
    cq = compile_q(q(joins=JOIN_GEO,
                     filters=[f"g.geo_uuid NOT IN ('{Z1}')"]))
    assert cq.geo is not None and cq.geo.exclude


def test_geo_dimension_hex():
    cq = compile_q(q(joins=JOIN_GEO, dims=["hex(g.geo_uuid)"],
                     filters=[f"g.geo_uuid IN ('{Z1}')"]))
    assert cq.dimensions[0].geo_dim


# ===========================================================================
# I. functions / IN expansion
# ===========================================================================

I_OK = [
    ("in_numeric", ["city_id IN (1, 2, 3)"]),
    ("not_in_numeric", ["city_id NOT IN (1, 2)"]),
    ("dayofweek", ["dayofweek(request_at) = 1"]),
    ("hour_fn", ["hour(request_at) < 12"]),
    ("floor_div", ["request_at - request_at % 3600 > 0"]),
    ("arith_mix", ["fare * 2 + 1 > 10"]),
    ("length_array", ["length(tags) > 0"]),
    ("contains_array", ["contains(tags, 'airport')"]),
]


@pytest.mark.parametrize("name,filters", I_OK, ids=[c[0] for c in I_OK])
def test_function_filters_compile(name, filters):
    cq = compile_q(q(filters=filters))
    assert len(cq.filters) == 1


def test_element_at_dimension():
    cq = compile_q(q(dims=["element_at(tags, 0)"]))
    assert cq.dimensions


def test_dayofweek_dimension_sunday_anchor():
    cq = compile_q(q(dims=["dayofweek(request_at)"]))
    assert cq.dimensions[0].expr is not None


def test_convert_tz_filter():
    """convert_tz rewrites to col + (offset(to) - offset(from)) at now
    (query_context_helper.go:348; golden from query_compiler_test.go:700:
    America/Phoenix never observes DST, so the offset is always -25200)."""
    cq = compile_q(
        q(filters=["convert_tz(request_at, 'GMT', 'America/Phoenix') = 2"]))
    assert str(cq.filters[0]) == "request_at + -25200 = 2"
    cq = compile_q(q(filters=[
        "convert_tz(from_unixtime(request_at / 1000), 'GMT', "
        "'America/Phoenix') = 2"]))
    assert str(cq.filters[0]) == "request_at + -25200 = 2"


def test_from_unixtime_requires_millis_division():
    compile_err(
        q(filters=["convert_tz(from_unixtime(request_at), 'GMT', "
                   "'America/Phoenix') = 2"]),
        "from_unixtime must be time column / 1000")


def test_convert_tz_arg_validation():
    compile_err(q(filters=["convert_tz(request_at, 'GMT') = 2"]),
                "convert_tz must have 3 arguments")
    compile_err(q(filters=["convert_tz(request_at, 1, 'GMT') = 2"]),
                "2nd argument of convert_tz must be a string")


def test_adjust_filter_to_time_filter():
    """adjustFilterToTimeFilter (aql_compiler.go:104, test :3465): with no
    timeFilter on a fact table, `time >= X` / `time < Y` row filters lift
    into the time filter (enabling pruning), millisecond epochs divide to
    seconds, and the remaining filters stay put."""
    doc = q(filters=["city_id <= 1000", "request_at >= 1540399020000",
                     "request_at < 1540399320000", "city_id > 100"])
    doc.pop("timeFilter", None)
    cq = compile_q(doc)
    assert cq.from_ts == 1540399020
    assert cq.to_ts == 1540399320
    assert [str(f) for f in cq.filters] == ["city_id <= 1000",
                                            "city_id > 100"]


def test_adjust_filter_duplicate_bounds_rejected():
    for flt, msg in ((["request_at >= 1", "request_at >= 2"], ">="),
                     (["request_at < 5", "request_at < 6"], "<")):
        doc = q(filters=flt)
        doc.pop("timeFilter", None)
        compile_err(doc, f"Only one '{msg}' filter allowed")


def test_adjust_filter_ignored_when_time_filter_present():
    doc = q(filters=["request_at >= 100"], time_from="1970-01-01",
            time_to="1970-01-02")
    cq = compile_q(doc)
    # the row filter stays a row filter; the explicit time filter wins
    assert any("request_at >= 100" in str(f) for f in cq.filters)


# ===========================================================================
# K. type resolution matrix (aql_compiler_test.go:268 "resolves data
#    types" + :212 int64 binary-op rejection)
# ===========================================================================

TYPE_CASES = [
    # (dimension expression, resolved expr type)
    ("-city_id", E.SIGNED),           # unary minus on unsigned -> signed
    ("~fare", E.UNSIGNED),            # bitwise not casts to unsigned
    ("city_id-city_id", E.SIGNED),    # unsigned SUB -> signed
    ("city_id*fare", E.FLOAT),        # widest operand wins
    ("1/2", E.FLOAT),                 # DIV is always float
    ("1.2|2.3", E.UNSIGNED),          # bitwise ops -> unsigned
    ("case when 1.3 then 2 else 3.2 end", E.FLOAT),  # branches unify
    ("fare+1", E.FLOAT),
    ("city_id+1", E.UNSIGNED),        # ADD of unsigneds stays unsigned
]


@pytest.mark.parametrize("expr_s,etype", TYPE_CASES,
                         ids=[c[0] for c in TYPE_CASES])
def test_resolved_dimension_types(expr_s, etype):
    cq = compile_q(q(dims=[expr_s]))
    got = cq.dimensions[0].expr.type
    assert got == etype, \
        f"{expr_s}: {E.TYPE_NAMES.get(got, got)} != " \
        f"{E.TYPE_NAMES.get(etype, etype)}"


def test_resolved_filter_types_boolean():
    """Every filter form from the reference matrix resolves Boolean."""
    cq = compile_q(q(filters=[
        "status='completed'", "!is_first", "fare is not null",
        "is_first is true", "city_id is true", "1.2 or 2.3", "1 < 1.2",
        "1 != 1.2", "is_first = false"]))
    for f in cq.filters:
        assert f.type == E.BOOLEAN or (
            isinstance(f, E.VarRef) and f.data_type == mdt.Bool), f


def test_measure_types():
    cq = compile_q(q(measures=[{"sqlExpression": "count(*)"}]))
    assert cq.measure.expr.type in (E.UNSIGNED, E.SIGNED, E.FLOAT)
    cq = compile_q(q(measures=[{"sqlExpression": "sum(fare+1)"}]))
    assert cq.measure.expr.type == E.FLOAT


def test_int64_math_supported_unlike_reference():
    """INTENTIONAL DIVERGENCE: the reference rejects numeric binary ops
    on >4-byte columns ('numeric operations not supported for column
    over 4 bytes length', aql_compiler_test.go:212) because its CUDA
    kernels only carry 4-byte lanes. Our XLA path runs 64-bit lanes
    natively (x64 enabled; the fused pallas kernel separately REJECTS
    int64 plans and falls back to XLA — fused_dense.plan_fused), so
    int64 transforms compile and return correct results instead of
    erroring."""
    compile_q(q(dims=["hex_id"]))        # plain reference compiles
    cq = compile_q(q(dims=["hex_id+1"]))  # ...and so does the transform
    assert cq.dimensions[0].expr.type in (E.SIGNED, E.UNSIGNED)


ERROR_CASES = [
    # (measure expression) — each must refuse to compile
    # (aql_compiler_test.go:576 "returns error on type resolution
    # failure": unknown column, unknown table qualifier, qualified
    # unknown column, aggregate arity, unknown function)
    "sum(columnx)",
    "sum(tablex.columnx)",
    "sum(trips.columnx)",
    "sum(columnx, columnx)",
    "exit()",
]


@pytest.mark.parametrize("measure", ERROR_CASES)
def test_type_resolution_failures(measure):
    with pytest.raises((QueryError, ValueError)):
        compile_q(q(measures=[{"sqlExpression": measure}]))


# ===========================================================================
# J. expandINOp semantics + int64 capability extension
#    (aql_compiler_test.go:3147 expandINOp, :212 wide columns, :4189 int64)
# ===========================================================================

def test_empty_in_list_rejected():
    # reference expandINOp: "id in ()" fails type resolution
    compile_err(q(filters=["city_id IN ()"]), "empty IN list")


def _run_store(query):
    from tests.test_query_e2e import make_store, NOW
    from aresdb_tpu.query.service import QueryService

    query = dict(query)
    query["now"] = NOW
    out = QueryService(make_store()).handle_aql({"queries": [query]})
    assert not out.get("errors"), out.get("errors")
    return out["results"][0]


def test_in_list_equals_or_expansion():
    """IN (a, b) must produce exactly the results of = a OR = b, and
    NOT IN their negation (reference expandINOp rewrites IN to OR chains;
    this engine evaluates IN natively — the results must agree)."""
    base = {"table": "trips",
            "measures": [{"sqlExpression": "count(*)"}]}
    for in_f, or_f in [
        (["city_id IN (1, 2)"], ["city_id = 1 OR city_id = 2"]),
        (["city_id IN (1)"], ["city_id = 1"]),
        (["city_id NOT IN (1, 2)"],
         ["NOT (city_id = 1 OR city_id = 2)"]),
        (["status IN ('completed', 'canceled')"],
         ["status = 'completed' OR status = 'canceled'"]),
    ]:
        a = _run_store({**base, "rowFilters": in_f})
        b = _run_store({**base, "rowFilters": or_f})
        assert a == b, (in_f, a, b)


def test_int64_operations_supported_extension():
    """The reference REJECTS arithmetic/filters on >4-byte columns
    ("numeric operations not supported for column over 4 bytes length",
    "binary transformation not allowed for int64 fields") because its GPU
    lanes are 32-bit. This engine runs emulated 64-bit lanes and supports
    them — a documented capability EXTENSION, pinned here so a regression
    to the reference's restriction is caught."""
    from tests.test_runlen import FACT  # Int64 'tip' column schema
    import copy

    from aresdb_tpu.query.aql import AQLQuery
    from aresdb_tpu.query.compiler import Compiler
    from aresdb_tpu.common.schema import Table
    from aresdb_tpu.common.schema import TableSchema

    ts = TableSchema(Table.from_json(copy.deepcopy(FACT)))
    plan = Compiler({"trips": ts}).compile(AQLQuery.from_json({
        "table": "trips",
        "measures": [{"sqlExpression": "sum(tip)",
                      "rowFilters": ["tip > 5", "tip + 1 < 100"]}],
        "dimensions": [{"sqlExpression": "city_id"}],
        "now": 1_600_000_000}))
    assert plan.measure is not None and len(plan.filters) == 2
