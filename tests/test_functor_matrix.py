"""Functor behavior matrix — port of /root/reference/query/functor_unittest.cu.

Drives the engine's functor layer (kernels._emit — the per-AST-node tracer
replacing the reference's thrust functors) with the reference's exact input
lanes and expectations: null propagation, three-valued AND/OR, truthiness,
comparisons with mixed-width casts, arithmetic (including C TRUNCATION
semantics for % and FLOOR on negatives — ModFunctor/FloorFunctor,
query/functor.hpp:260/338), bitwise ops, unary ops, calendar bucketizers
(resolveTimeBucketizer vectors), week starts, and the array functor
fixtures (ArrayLength/Contains/ElementAt) through the public query API.

Documented deviation: the reference's DivideFunctor/ModFunctor are
UNGUARDED on zero divisors (C UB / GPU wrap); this engine nulls the result
— encoded below as our contract.
"""

import calendar as _cal

import numpy as np
import pytest

from aresdb_tpu.common import data_types as mdt
from aresdb_tpu.query import expr as E
from aresdb_tpu.query import kernels as K


def _col(cid, data_type, typ):
    return E.VarRef(val=f"c{cid}", type=typ, table_id=0, column_id=cid,
                    data_type=data_type)


def _lit(v, float_=False):
    if float_:
        return E.NumberLiteral(val=float(v), int_val=int(v), expr=str(v),
                               type=E.FLOAT)
    return E.NumberLiteral(val=float(v), int_val=int(v), expr=str(v),
                           type=E.SIGNED)


def _ev(node, cols):
    """Evaluate one AST node over numpy column lanes via kernels._emit."""
    import jax.numpy as jnp

    columns = {}
    n = None
    for cid, (vals, valid) in cols.items():
        vals = np.asarray(vals)
        valid = np.asarray(valid, bool)
        n = len(valid)
        columns[(0, cid)] = (jnp.asarray(vals), jnp.asarray(valid))
    ctx = K._EvalCtx(columns, (), n)
    out = K._emit(node, ctx, None)
    return np.asarray(out.value), np.asarray(out.valid)


# ---------------------------------------------------------------------------
# LogicalFunctorTest.TestBool / TestInt / TestOrFunctor
# ---------------------------------------------------------------------------

B1 = ([False, False, False, True, True], [False, True, True, True, True])
B2 = ([False, False, True, False, True], [False, True, True, True, True])
I1 = ([0, 10, 0, 0, 10], [False, True, True, True, True])
I2 = ([0, 0, 10, 0, 10], [False, True, True, True, True])


def test_logical_bool():
    a = _col(0, mdt.Bool, E.BOOLEAN)
    b = _col(1, mdt.Bool, E.BOOLEAN)
    cols = {0: (np.array(B1[0]), B1[1]), 1: (np.array(B2[0]), B2[1])}
    v, ok = _ev(E.BinaryExpr(op="AND", lhs=a, rhs=b, type=E.BOOLEAN), cols)
    assert v.tolist() == [False, False, False, False, True]
    assert ok.tolist() == [False, True, True, True, True]
    v, ok = _ev(E.BinaryExpr(op="OR", lhs=a, rhs=b, type=E.BOOLEAN), cols)
    assert v.tolist() == [False, False, True, True, True]
    assert ok.tolist() == [False, True, True, True, True]
    v, ok = _ev(E.UnaryExpr(op="NOT", expr=a, type=E.BOOLEAN), cols)
    assert v.tolist() == [True, True, True, False, False]
    assert ok.tolist() == [False, True, True, True, True]


def test_logical_int_truthiness():
    a = _col(0, mdt.Int32, E.SIGNED)
    b = _col(1, mdt.Int32, E.SIGNED)
    cols = {0: (np.array(I1[0], np.int32), I1[1]),
            1: (np.array(I2[0], np.int32), I2[1])}
    v, ok = _ev(E.BinaryExpr(op="AND", lhs=a, rhs=b, type=E.BOOLEAN), cols)
    assert v.tolist() == [False, False, False, False, True]
    assert ok.tolist() == [False, True, True, True, True]
    v, ok = _ev(E.BinaryExpr(op="OR", lhs=a, rhs=b, type=E.BOOLEAN), cols)
    assert v.tolist() == [False, True, True, False, True]
    assert ok.tolist() == [False, True, True, True, True]
    v, ok = _ev(E.UnaryExpr(op="NOT", expr=a, type=E.BOOLEAN), cols)
    assert v.tolist()[1:] == [False, True, True, False]
    assert ok.tolist() == [False, True, True, True, True]


def test_or_three_valued():
    """OrFunctor's Kleene rows (functor_unittest.cu:185): a valid TRUE
    beats a null; FALSE with a null stays null; FALSE/FALSE valid."""
    a = _col(0, mdt.Bool, E.BOOLEAN)
    b = _col(1, mdt.Bool, E.BOOLEAN)
    node = E.BinaryExpr(op="OR", lhs=a, rhs=b, type=E.BOOLEAN)
    cols = {0: (np.array([True, False, False]), [True, True, True]),
            1: (np.array([True, True, False]), [False, False, True])}
    v, ok = _ev(node, cols)
    assert v.tolist() == [True, False, False]
    assert ok.tolist() == [True, False, True]


# ---------------------------------------------------------------------------
# ComparisonFunctorTest (incl. TestUpperCast's mixed widths)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("op,expected", [
    ("=", [False, False, False, True, True]),
    ("!=", [True, True, True, False, False]),
    ("<", [False, False, True, False, False]),
    ("<=", [False, False, True, True, True]),
    (">", [True, True, False, False, False]),
    (">=", [True, True, False, True, True]),
])
def test_comparisons_int(op, expected):
    a = _col(0, mdt.Int32, E.SIGNED)
    b = _col(1, mdt.Int32, E.SIGNED)
    cols = {0: (np.array([5, 10, 0, 0, 10], np.int32),
                [False, True, True, True, True]),
            1: (np.array([0, 0, 10, 0, 10], np.int32),
                [False, True, True, True, True])}
    v, ok = _ev(E.BinaryExpr(op=op, lhs=a, rhs=b, type=E.BOOLEAN), cols)
    assert ok.tolist() == [False, True, True, True, True]
    assert v.tolist()[1:] == expected[1:]


def test_comparison_upper_cast():
    """int32 vs int16 comparison upcasts (TestUpperCast)."""
    a = _col(0, mdt.Int32, E.SIGNED)
    b = _col(1, mdt.Int16, E.SIGNED)
    cols = {0: (np.array([0, 10, 0, 0x10, 10], np.int32),
                [False, True, True, True, True]),
            1: (np.array([0, 0, 10, 0, 10], np.int16),
                [False, True, True, True, True])}
    v, ok = _ev(E.BinaryExpr(op=">", lhs=a, rhs=b, type=E.BOOLEAN), cols)
    assert v.tolist()[1:] == [True, False, True, False]
    assert ok.tolist() == [False, True, True, True, True]


# ---------------------------------------------------------------------------
# ArithmeticFunctorTest
# ---------------------------------------------------------------------------

def _arith_cols():
    return {0: (np.array([0, 10, 0, 0, 10], np.int32),
                [False, True, True, True, True]),
            1: (np.array([0, 1, 10, 1, 10], np.int32),
                [False, True, True, True, True])}


@pytest.mark.parametrize("op,typ,expected", [
    ("+", E.SIGNED, [0, 11, 10, 1, 20]),
    ("-", E.SIGNED, [0, 9, -10, -1, 0]),
    ("*", E.SIGNED, [0, 10, 0, 0, 100]),
    ("%", E.SIGNED, [0, 0, 0, 0, 0]),
    ("FLOOR", E.SIGNED, [0, 10, 0, 0, 10]),
])
def test_arithmetic_int(op, typ, expected):
    a = _col(0, mdt.Int32, E.SIGNED)
    b = _col(1, mdt.Int32, E.SIGNED)
    v, ok = _ev(E.BinaryExpr(op=op, lhs=a, rhs=b, type=typ), _arith_cols())
    assert ok.tolist() == [False, True, True, True, True]
    assert v.tolist()[1:] == expected[1:]


def test_divide_is_float_and_null_on_zero():
    """Query-level division is ALWAYS float (compiler types '/' as Float,
    mirroring the reference compiler) and — our documented deviation from
    the reference's unguarded C division — zero divisors null out."""
    a = _col(0, mdt.Int32, E.SIGNED)
    b = _col(1, mdt.Int32, E.SIGNED)
    cols = {0: (np.array([10, 7, 5], np.int32), [True, True, True]),
            1: (np.array([4, 2, 0], np.int32), [True, True, True])}
    v, ok = _ev(E.BinaryExpr(op="/", lhs=a, rhs=b, type=E.FLOAT), cols)
    assert v.dtype == np.float32
    assert v.tolist()[:2] == [2.5, 3.5]
    assert ok.tolist() == [True, True, False]


def test_mod_floor_trunc_semantics():
    """C truncation (sign of dividend) for % and FLOOR = a - a % b —
    ModFunctor/FloorFunctor parity on NEGATIVE operands. numpy's floored
    mod gives (-7) % 3 == 2; the reference (and now this engine) -1."""
    a = _col(0, mdt.Int32, E.SIGNED)
    b = _col(1, mdt.Int32, E.SIGNED)
    cols = {0: (np.array([-7, 7, -7, 7], np.int32), [True] * 4),
            1: (np.array([3, -3, -3, 3], np.int32), [True] * 4)}
    v, ok = _ev(E.BinaryExpr(op="%", lhs=a, rhs=b, type=E.SIGNED), cols)
    assert v.tolist() == [-1, 1, -1, 1]
    assert ok.tolist() == [True] * 4
    v, ok = _ev(E.BinaryExpr(op="FLOOR", lhs=a, rhs=b, type=E.SIGNED), cols)
    assert v.tolist() == [-6, 6, -6, 6]


def test_negate():
    a = _col(0, mdt.Int32, E.SIGNED)
    cols = {0: (np.array([0, 10, 0, 0, 10], np.int32),
                [False, True, True, True, True])}
    v, ok = _ev(E.UnaryExpr(op="-", expr=a, type=E.SIGNED), cols)
    assert v.tolist()[1:] == [-10, 0, 0, -10]
    assert ok.tolist() == [False, True, True, True, True]


# ---------------------------------------------------------------------------
# BitwiseFunctorTest
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("op,expected", [
    ("&", [0, 0x00, 0x0F, 0x00, 0x00]),
    ("|", [0, 0xF0, 0x0F, 0xF0, 0x00]),
    ("^", [0, 0xF0, 0x00, 0xF0, 0x00]),
])
def test_bitwise_int(op, expected):
    a = _col(0, mdt.Int32, E.SIGNED)
    b = _col(1, mdt.Int32, E.SIGNED)
    cols = {0: (np.array([0, 0xF0, 0x0F, 0x00, 0x00], np.int32),
                [False, True, True, True, True]),
            1: (np.array([0, 0x00, 0x0F, 0xF0, 0x00], np.int32),
                [False, True, True, True, True])}
    v, ok = _ev(E.BinaryExpr(op=op, lhs=a, rhs=b, type=E.UNSIGNED), cols)
    assert ok.tolist() == [False, True, True, True, True]
    assert v.tolist()[1:] == expected[1:]


def test_shifts():
    a = _col(0, mdt.Int32, E.SIGNED)
    cols = {0: (np.array([1, 2, 16], np.int32), [True] * 3)}
    v, _ = _ev(E.BinaryExpr(op="<<", lhs=a, rhs=_lit(4), type=E.UNSIGNED),
               cols)
    assert v.tolist() == [16, 32, 256]
    v, _ = _ev(E.BinaryExpr(op=">>", lhs=a, rhs=_lit(1), type=E.UNSIGNED),
               cols)
    assert v.tolist() == [0, 1, 8]


# ---------------------------------------------------------------------------
# MiscFunctorTest: IsNull / IsNotNull (always-valid outputs)
# ---------------------------------------------------------------------------

def test_is_null_functors():
    a = _col(0, mdt.Int32, E.SIGNED)
    cols = {0: (np.zeros(5, np.int32), [True, True, True, True, False])}
    v, ok = _ev(E.UnaryExpr(op="IS_NULL", expr=a, type=E.BOOLEAN), cols)
    assert v.tolist() == [False, False, False, False, True]
    assert ok.tolist() == [True] * 5
    v, ok = _ev(E.UnaryExpr(op="IS_NOT_NULL", expr=a, type=E.BOOLEAN), cols)
    assert v.tolist() == [True, True, True, True, False]
    assert ok.tolist() == [True] * 5


def test_is_true_false():
    a = _col(0, mdt.Bool, E.BOOLEAN)
    cols = {0: (np.array([True, False, True]), [True, True, False])}
    v, ok = _ev(E.UnaryExpr(op="IS_TRUE", expr=a, type=E.BOOLEAN), cols)
    assert v.tolist() == [True, False, False]
    assert ok.tolist() == [True] * 3
    v, ok = _ev(E.UnaryExpr(op="IS_FALSE", expr=a, type=E.BOOLEAN), cols)
    assert v.tolist() == [False, True, False]
    assert ok.tolist() == [True] * 3


# ---------------------------------------------------------------------------
# ResolveTimeBucketizerTest vectors (calendar starts + recurring extracts)
# ---------------------------------------------------------------------------

def _ts(y, m, d):
    return int(_cal.timegm((y, m, d, 0, 0, 0)))


_CAL_START_VECTORS = [
    # (ts, year_start, quarter_start, month_start)
    (_ts(1970, 1, 1), _ts(1970, 1, 1), _ts(1970, 1, 1), _ts(1970, 1, 1)),
    (_ts(1970, 1, 31), _ts(1970, 1, 1), _ts(1970, 1, 1), _ts(1970, 1, 1)),
    (_ts(1970, 2, 1), _ts(1970, 1, 1), _ts(1970, 1, 1), _ts(1970, 2, 1)),
    (_ts(1970, 2, 28), _ts(1970, 1, 1), _ts(1970, 1, 1), _ts(1970, 2, 1)),
    (_ts(1970, 3, 1), _ts(1970, 1, 1), _ts(1970, 1, 1), _ts(1970, 3, 1)),
    (_ts(1972, 2, 29), _ts(1972, 1, 1), _ts(1972, 1, 1), _ts(1972, 2, 1)),
    (_ts(2000, 2, 29), _ts(2000, 1, 1), _ts(2000, 1, 1), _ts(2000, 2, 1)),
    (_ts(2018, 6, 11), _ts(2018, 1, 1), _ts(2018, 4, 1), _ts(2018, 6, 1)),
    # (timestamps past 2^31 ride int32 compute lanes — out of the engine's
    # supported uint32-seconds range, same as the reference's 2106 bound)
]


def test_calendar_start_vectors():
    a = _col(0, mdt.Uint32, E.UNSIGNED)
    ts = np.array([v[0] for v in _CAL_START_VECTORS], np.uint32)
    cols = {0: (ts, [True] * len(ts))}
    for op, idx in (("GET_YEAR_START", 1), ("GET_QUARTER_START", 2),
                    ("GET_MONTH_START", 3)):
        v, ok = _ev(E.UnaryExpr(op=op, expr=a, type=E.UNSIGNED), cols)
        assert v.tolist() == [x[idx] for x in _CAL_START_VECTORS], op
        assert all(ok)


_CAL_RECUR_VECTORS = [
    # (ts, day_of_year, day_of_month, month_of_year, quarter_of_year)
    # 0-based raw functor values (resolveTimeBucketizer parity)
    (_ts(1970, 1, 1), 0, 0, 0, 0),
    (_ts(1972, 2, 29), 59, 28, 1, 0),
    (_ts(1972, 3, 1), 60, 0, 2, 0),
    (_ts(2018, 6, 11), 161, 10, 5, 1),
]


def test_calendar_recurring_vectors():
    a = _col(0, mdt.Uint32, E.UNSIGNED)
    ts = np.array([v[0] for v in _CAL_RECUR_VECTORS], np.uint32)
    cols = {0: (ts, [True] * len(ts))}
    for op, idx in (("GET_DAY_OF_YEAR", 1), ("GET_DAY_OF_MONTH", 2),
                    ("GET_MONTH_OF_YEAR", 3), ("GET_QUARTER_OF_YEAR", 4)):
        v, ok = _ev(E.UnaryExpr(op=op, expr=a, type=E.UNSIGNED), cols)
        assert v.tolist() == [x[idx] for x in _CAL_RECUR_VECTORS], op
        assert all(ok)


def test_week_start_vectors():
    """getWeekStartTimestamp exact vectors (functor_unittest.cu:1121)."""
    a = _col(0, mdt.Uint32, E.UNSIGNED)
    vec = [(_ts(1970, 1, 3), 0), (_ts(1970, 1, 6), 345600),
           (1533081655, 1532908800), (1534520171, 1534118400),
           (1528675200, 1528675200)]
    cols = {0: (np.array([v[0] for v in vec], np.uint32),
                [True] * len(vec))}
    v, ok = _ev(E.UnaryExpr(op="GET_WEEK_START", expr=a, type=E.UNSIGNED),
                cols)
    assert v.tolist() == [x[1] for x in vec]
    assert all(ok)


# ---------------------------------------------------------------------------
# Array functor fixtures (ArrayLength/Contains/ElementAt) through the API
# ---------------------------------------------------------------------------

def _array_service():
    """The exact six arrays of the reference array functor fixtures:
    [1,2], [1], [1,2,3], NULL, [] (valid empty), [1]."""
    from tests.test_query_e2e import FakeMemStore
    from tests.test_array_queries import SCHEMA, NOW
    from aresdb_tpu.common.upsert_batch import (UpsertBatch,
                                                UpsertBatchBuilder)
    from aresdb_tpu.common import data_types as dt
    from aresdb_tpu.query.service import QueryService

    store = FakeMemStore()
    store.create(SCHEMA)
    rows = [[1, 2], [1], [1, 2, 3], None, [], [1]]
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint32)
    b.add_column(1, dt.Uint32)
    b.add_column(2, dt.ArrayInt32)
    b.add_column(3, dt.Float32)
    for i, tags in enumerate(rows):
        b.add_row()
        b.set_value(i, 0, NOW - 100 - i)
        b.set_value(i, 1, i)
        if tags is not None:
            b.set_value(i, 2, tags)
        b.set_value(i, 3, float(2 ** i))
    store.get_table_shard("events").save_upsert_batch(
        UpsertBatch(b.to_bytes()))
    return QueryService(store), NOW


def test_array_length_fixture():
    svc, now = _array_service()
    r = svc.handle_aql({"queries": [{
        "table": "events", "now": now,
        "measures": [{"sqlExpression": "sum(score)"}],
        "dimensions": [{"sqlExpression": "length(tags)"}]}]})["results"][0]
    # lengths: 2,1,3,NULL,0,1 -> groups by length with score sums
    assert r == {"2": 1.0, "1": 2.0 + 32.0, "3": 4.0, "NULL": 8.0,
                 "0": 16.0}


def test_array_contains_fixture():
    svc, now = _array_service()
    r = svc.handle_aql({"queries": [{
        "table": "events", "now": now,
        "measures": [{"sqlExpression": "sum(score)",
                      "rowFilters": ["contains(tags, 2)"]}]}]})["results"][0]
    # contains(2): rows 0 and 2 only -> 1 + 4
    assert r[""] == 5.0


def test_array_element_at_fixture():
    svc, now = _array_service()
    r = svc.handle_aql({"queries": [{
        "table": "events", "now": now,
        "measures": [{"sqlExpression": "sum(score)"}],
        "dimensions": [{"sqlExpression": "element_at(tags, 1)"}]}]})[
        "results"][0]
    # element_at(idx 1): row0 -> 2; row2 -> 2; others NULL
    assert r == {"2": 1.0 + 4.0, "NULL": 2.0 + 8.0 + 16.0 + 32.0}
