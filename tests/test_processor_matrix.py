"""Processor behavioral matrix: the per-stage scenario classes of the
reference's query/aql_processor_test.go (2,385 LoC: evaluateFilterExpression,
evaluate*DimensionExpression, evaluateMeasureExpression, foreign-table
columns, sort/reduce behaviors, batch skipping) table-driven through OUR
public API against an independent numpy oracle with Kleene 3-valued logic.

Where the reference unit-tests each CUDA stage against hand-built device
vectors, the equivalent seam here is the fused trace: every case runs
compiler → kernels → postprocess end to end, so the same matrix exercises
the XLA kernels on CPU, the factored reduction under ARES_FACTORED=1, the
mesh path under ARES_MESH=1, and the TPU-default fused pallas kernel under
ARES_FUSED=interp.

Oracle semantics encoded (reference functor rules, query/functor.hpp):
- NULL propagates through arithmetic/comparisons; AND/OR are Kleene
  (NULL OR TRUE = TRUE, NULL AND FALSE = FALSE, else NULL)
- a filter keeps a row only when the predicate is TRUE (valid & nonzero)
- count(*) counts passing rows; sum/avg/min/max skip NULL measures
- NULL dimension values key as "NULL"; boolean dims as "0"/"1"
"""

from __future__ import annotations

import numpy as np
import pytest

from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common.schema import Table, TableSchema
from aresdb_tpu.common.upsert_batch import UpsertBatch, UpsertBatchBuilder
from aresdb_tpu.memstore.table_shard import TableShard
from aresdb_tpu.query.service import QueryService

NOW = 1_600_000_000
N = 512
SEED = 7

T_SCHEMA = {
    "name": "t",
    "columns": [
        {"name": "ts", "type": "Uint32"},
        {"name": "rid", "type": "Uint32"},
        {"name": "i8", "type": "Int8"},
        {"name": "i16", "type": "Int16"},
        {"name": "i32", "type": "Int32"},
        {"name": "u16", "type": "Uint16"},
        {"name": "u32", "type": "Uint32"},
        {"name": "f32", "type": "Float32"},
        {"name": "b", "type": "Bool"},
        {"name": "e", "type": "SmallEnum"},
    ],
    "primaryKeyColumns": [1],
    "isFactTable": True,
    "config": {"batchSize": 128, "recordRetentionInDays": 0},
}

D_SCHEMA = {
    "name": "dimt",
    "columns": [
        {"name": "id", "type": "Uint16"},
        {"name": "val", "type": "Int32"},
        {"name": "name", "type": "BigEnum"},
    ],
    "primaryKeyColumns": [0],
    "isFactTable": False,
    "config": {"batchSize": 128},
}

ENUMS = ["alpha", "beta", "gamma"]
DIM_NAMES = ["north", "south", "east"]


class Col:
    """A nullable column: values + validity, with Kleene-logic helpers."""

    def __init__(self, vals, valid=None):
        self.v = np.asarray(vals)
        self.ok = (np.ones(len(self.v), bool) if valid is None
                   else np.asarray(valid, bool))


def _mk_data():
    rng = np.random.RandomState(SEED)

    def nulls(p=0.15):
        return rng.rand(N) > p

    data = {
        "ts": Col((NOW - rng.randint(0, 6 * 3600, N)).astype(np.uint32)),
        "rid": Col(np.arange(N, dtype=np.uint32)),
        "i8": Col(rng.randint(-8, 9, N).astype(np.int8), nulls()),
        "i16": Col(rng.randint(-300, 301, N).astype(np.int16), nulls()),
        "i32": Col(rng.randint(-100000, 100000, N).astype(np.int32),
                   nulls()),
        "u16": Col(rng.randint(0, 40, N).astype(np.uint16)),
        "u32": Col(rng.randint(0, 1000, N).astype(np.uint32)),
        "f32": Col((rng.rand(N) * 50 - 10).astype(np.float32), nulls()),
        "b": Col(rng.randint(0, 2, N).astype(bool), nulls()),
        "e": Col(rng.randint(0, 3, N).astype(np.uint8), nulls()),
    }
    # dim table: ids 0..29 (u16 goes to 39, so 25% of rows miss the join);
    # val null for every 7th id
    dim = {
        "id": np.arange(30, dtype=np.uint16),
        "val": (np.arange(30, dtype=np.int32) * 11 - 60),
        "val_ok": (np.arange(30) % 7 != 0),
        "name": np.arange(30, dtype=np.uint16) % 3,
    }
    return data, dim


DATA, DIM = _mk_data()


def _build_store():
    class Store:
        def __init__(self):
            self.schemas = {}
            self.shards = {}

        def create(self, sj):
            table = Table.from_json(sj)
            ts = TableSchema(table)
            self.schemas[table.name] = ts
            self.shards[(table.name, 0)] = TableShard(ts)
            return ts

        def get_schemas(self):
            return dict(self.schemas)

        def get_table_shard(self, table, shard_id=0):
            return self.shards[(table, shard_id)]

    store = Store()
    t = store.create(T_SCHEMA)
    d = store.create(D_SCHEMA)
    t.extend_enum("e", ENUMS)
    d.extend_enum("name", DIM_NAMES)

    b = UpsertBatchBuilder()
    types = [dt.Uint32, dt.Uint32, dt.Int8, dt.Int16, dt.Int32, dt.Uint16,
             dt.Uint32, dt.Float32, dt.Bool, dt.SmallEnum]
    names = ["ts", "rid", "i8", "i16", "i32", "u16", "u32", "f32", "b", "e"]
    for cid, ct in enumerate(types):
        b.add_column(cid, ct)
    for i in range(N):
        b.add_row()
        for cid, nm in enumerate(names):
            col = DATA[nm]
            if col.ok[i]:
                v = col.v[i]
                b.set_value(i, cid, bool(v) if nm == "b" else
                            float(v) if nm == "f32" else int(v))
    store.get_table_shard("t").save_upsert_batch(UpsertBatch(b.to_bytes()))

    db = UpsertBatchBuilder()
    for cid, ct in enumerate([dt.Uint16, dt.Int32, dt.BigEnum]):
        db.add_column(cid, ct)
    for i in range(30):
        db.add_row()
        db.set_value(i, 0, int(DIM["id"][i]))
        if DIM["val_ok"][i]:
            db.set_value(i, 1, int(DIM["val"][i]))
        db.set_value(i, 2, int(DIM["name"][i]))
    store.get_table_shard("dimt").save_upsert_batch(
        UpsertBatch(db.to_bytes()))
    return store


@pytest.fixture(scope="module")
def service():
    return QueryService(_build_store())


# ---------------------------------------------------------------------------
# oracle: Kleene logic over (value, valid) pairs
# ---------------------------------------------------------------------------

def V(name):
    c = DATA[name]
    return c.v.astype(np.float64), c.ok.copy()


def LIT(x):
    return np.full(N, x, np.float64), np.ones(N, bool)


def k_and(a, b):
    (av, ao), (bv, bo) = a, b
    at, bt = ao & (av != 0), bo & (bv != 0)
    af, bf = ao & (av == 0), bo & (bv == 0)
    out_false = af | bf
    out_true = at & bt
    return out_true.astype(np.float64), out_true | out_false


def k_or(a, b):
    (av, ao), (bv, bo) = a, b
    at, bt = ao & (av != 0), bo & (bv != 0)
    af, bf = ao & (av == 0), bo & (bv == 0)
    out_true = at | bt
    out_false = af & bf
    return out_true.astype(np.float64), out_true | out_false


def k_not(a):
    av, ao = a
    return (av == 0).astype(np.float64), ao


def op(f, a, b):
    (av, ao), (bv, bo) = a, b
    with np.errstate(all="ignore"):
        v = f(av, bv)
    return np.nan_to_num(v.astype(np.float64)), ao & bo


def keep(pred):
    v, ok = pred
    return ok & (v != 0)


def joined(field):
    """Foreign column via u16 = dimt.id (missing ids -> NULL)."""
    u16 = DATA["u16"].v.astype(np.int64)
    hit = u16 < 30
    idx = np.where(hit, u16, 0)
    if field == "val":
        v = DIM["val"][idx].astype(np.float64)
        ok = hit & DIM["val_ok"][idx]
    else:  # name rank
        v = DIM["name"][idx].astype(np.float64)
        ok = hit.copy()
    return v, ok


def agg_oracle(mask, measure, agg, key_of=None, fmt=None):
    """Expected result dict for rows where mask & measure-validity rules."""
    mv, mok = (measure if measure is not None else
               (np.ones(N), np.ones(N, bool)))
    out = {}
    rows = np.nonzero(mask)[0]
    for i in rows:
        k = "" if key_of is None else key_of(i)
        out.setdefault(k, []).append((float(mv[i]), bool(mok[i])))
    res = {}
    for k, pairs in out.items():
        vals = [v for v, ok in pairs if ok]
        if agg == "count":
            res[k] = float(len(pairs))
        elif agg == "sum":
            res[k] = float(np.float32(sum(np.float32(v) for v in vals)))
        elif agg == "avg":
            res[k] = (float(np.float32(sum(vals) / len(vals)))
                      if vals else None)
        elif agg == "min":
            res[k] = float(min(vals)) if vals else None
        elif agg == "max":
            res[k] = float(max(vals)) if vals else None
    return {k: v for k, v in res.items() if v is not None}


def run(service, query, tol=2e-3):
    query.setdefault("now", NOW)
    resp = service.handle_aql({"queries": [query]})
    assert "errors" not in resp, resp.get("errors")
    return resp["results"][0]


def check(service, query, expected, tol=2e-3):
    got = run(service, query)
    assert set(got) == set(expected), (query, got, expected)
    for k, v in expected.items():
        assert got[k] == pytest.approx(v, rel=tol, abs=tol), (query, k,
                                                              got[k], v)


# ---------------------------------------------------------------------------
# 1. filter expressions (evaluateFilterExpression :472; functor semantics)
# ---------------------------------------------------------------------------

FILTER_CASES = [
    # (name, filter SQL, oracle predicate)
    ("eq_i16", "i16 = 7", lambda: op(np.equal, V("i16"), LIT(7))),
    ("neq_i16", "i16 != 7", lambda: op(np.not_equal, V("i16"), LIT(7))),
    ("lt_neg", "i16 < -100", lambda: op(np.less, V("i16"), LIT(-100))),
    ("lte", "i16 <= 0", lambda: op(np.less_equal, V("i16"), LIT(0))),
    ("gt_u32", "u32 > 500", lambda: op(np.greater, V("u32"), LIT(500))),
    ("gte_f32", "f32 >= 2.5",
     lambda: op(np.greater_equal, V("f32"), LIT(np.float32(2.5)))),
    # unary minus both sides (reference :508 '-vp1 == -2')
    ("unary_minus_eq", "-i8 = -2",
     lambda: op(np.equal, op(np.subtract, LIT(0), V("i8")), LIT(-2))),
    # division ALWAYS upgrades to float (reference
    # query_context_helper.go:257 'case expr.DIV: cast to float') — int
    # operands do NOT truncate
    ("float_div_eq", "u16 / 2 = 3",
     lambda: op(np.equal, op(np.divide, V("u16"), LIT(2)), LIT(3))),
    ("float_div_neg", "i16 / 10 = -5",
     lambda: op(np.equal, op(np.divide, V("i16"), LIT(10)), LIT(-5))),
    ("mod_int", "u16 % 7 = 3",
     lambda: op(np.equal, op(np.mod, V("u16"), LIT(7)), LIT(3))),
    ("mul_cmp", "i8 * 3 > 12",
     lambda: op(np.greater, op(np.multiply, V("i8"), LIT(3)), LIT(12))),
    ("add_cmp", "i16 + 300 < 100",
     lambda: op(np.less, op(np.add, V("i16"), LIT(300)), LIT(100))),
    ("sub_cols", "i16 - i8 > 200",
     lambda: op(np.greater, op(np.subtract, V("i16"), V("i8")),
                LIT(200))),
    ("two_col_cmp", "u16 > i8",
     lambda: op(np.greater, V("u16"), V("i8"))),
    # Kleene OR: null-left OR true-right keeps the row (reference :508)
    ("or_null_true", "i16 = 9999 or u16 < 100",
     lambda: k_or(op(np.equal, V("i16"), LIT(9999)),
                  op(np.less, V("u16"), LIT(100)))),
    ("or_both", "-i8 = -2 or u16 >= 20",
     lambda: k_or(op(np.equal, op(np.subtract, LIT(0), V("i8")), LIT(2 * -1)),
                  op(np.greater_equal, V("u16"), LIT(20)))),
    ("and_null_false", "i16 > 0 and u16 = 99999",
     lambda: k_and(op(np.greater, V("i16"), LIT(0)),
                   op(np.equal, V("u16"), LIT(99999)))),
    ("and_mixed", "f32 > 0 and b",
     lambda: k_and(op(np.greater, V("f32"), LIT(0)), V("b"))),
    ("not_pred", "not (u16 < 20)",
     lambda: k_not(op(np.less, V("u16"), LIT(20)))),
    ("not_null_col", "not b", lambda: k_not(V("b"))),
    ("bool_bare", "b", lambda: V("b")),
    ("is_null", "i16 is null",
     lambda: ((~DATA["i16"].ok).astype(np.float64), np.ones(N, bool))),
    ("is_not_null", "f32 is not null",
     lambda: (DATA["f32"].ok.astype(np.float64), np.ones(N, bool))),
    ("in_ints", "u16 in (3, 5, 8, 13)",
     lambda: (np.isin(DATA["u16"].v, [3, 5, 8, 13]).astype(np.float64),
              np.ones(N, bool))),
    ("not_in_ints", "u16 not in (3, 5, 8, 13)",
     lambda: ((~np.isin(DATA["u16"].v, [3, 5, 8, 13])).astype(np.float64),
              np.ones(N, bool))),
    ("enum_eq", "e = 'beta'",
     lambda: op(np.equal, V("e"), LIT(1))),
    ("enum_neq", "e != 'beta'",
     lambda: op(np.not_equal, V("e"), LIT(1))),
    ("enum_in", "e in ('alpha', 'gamma')",
     lambda: (np.isin(DATA["e"].v, [0, 2]).astype(np.float64),
              DATA["e"].ok)),
    # unknown enum value: always-false predicate, never an error
    # (reference Rewrite gives the literal an out-of-range rank)
    ("enum_unknown", "e = 'nosuch'",
     lambda: (np.zeros(N), DATA["e"].ok)),
    ("float_band", "f32 > -2.5 and f32 < 2.5",
     lambda: k_and(op(np.greater, V("f32"), LIT(np.float32(-2.5))),
                   op(np.less, V("f32"), LIT(np.float32(2.5))))),
    ("paren_mix", "(i8 > 0 or i8 < -5) and u16 < 30",
     lambda: k_and(k_or(op(np.greater, V("i8"), LIT(0)),
                        op(np.less, V("i8"), LIT(-5))),
                   op(np.less, V("u16"), LIT(30)))),
]


@pytest.mark.parametrize("name,filt,oracle",
                         FILTER_CASES, ids=[c[0] for c in FILTER_CASES])
def test_filter_matrix(service, name, filt, oracle):
    mask = keep(oracle())
    check(service,
          {"table": "t",
           "measures": [{"sqlExpression": "count(*)",
                         "rowFilters": [filt]}]},
          {"": float(mask.sum())} if mask.sum() else {})


# every comparison op × (signed col, float col) sweep
_OPS = [("=", np.equal), ("!=", np.not_equal), ("<", np.less),
        ("<=", np.less_equal), (">", np.greater), (">=", np.greater_equal)]


@pytest.mark.parametrize("sym,f", _OPS, ids=[o[0] for o in _OPS])
@pytest.mark.parametrize("col,lit", [("i16", 42), ("f32", 7.5),
                                     ("i8", -3)])
def test_filter_every_comparison_op(service, sym, f, col, lit):
    litf = np.float32(lit) if col == "f32" else lit
    mask = keep(op(f, V(col), LIT(litf)))
    check(service,
          {"table": "t", "measures": [{"sqlExpression": "count(*)",
                                       "rowFilters": [f"{col} {sym} {lit}"]}]},
          {"": float(mask.sum())} if mask.sum() else {})


# ---------------------------------------------------------------------------
# 2. dimension expressions (:596-:776) — var refs, booleans, arithmetic,
#    NULL keys, enum translation
# ---------------------------------------------------------------------------

def _dim_keys(vals, ok, fmt=str):
    return lambda i: fmt(vals[i]) if ok[i] else "NULL"


DIM_CASES = [
    ("varref_u16", "u16",
     _dim_keys(DATA["u16"].v, np.ones(N, bool), lambda v: str(int(v)))),
    ("varref_nullable_i8", "i8",
     _dim_keys(DATA["i8"].v, DATA["i8"].ok, lambda v: str(int(v)))),
    ("bool_col_dim", "b",
     _dim_keys(DATA["b"].v, DATA["b"].ok, lambda v: str(int(v)))),
    ("bool_expr_dim", "u16 > 20",
     _dim_keys((DATA["u16"].v > 20).astype(int), np.ones(N, bool),
               lambda v: str(int(v)))),
    ("bool_expr_nullable", "i16 > 0",
     _dim_keys((DATA["i16"].v > 0).astype(int), DATA["i16"].ok,
               lambda v: str(int(v)))),
    ("arith_dim", "u16 - 20",
     _dim_keys(DATA["u16"].v.astype(int) - 20, np.ones(N, bool),
               lambda v: str(int(v)))),
    ("mod_dim", "u16 % 4",
     _dim_keys(DATA["u16"].v % 4, np.ones(N, bool),
               lambda v: str(int(v)))),
    ("signed_arith_dim", "i8 * 2",
     _dim_keys(DATA["i8"].v.astype(int) * 2, DATA["i8"].ok,
               lambda v: str(int(v)))),
    ("enum_dim", "e",
     _dim_keys(DATA["e"].v, DATA["e"].ok, lambda v: ENUMS[int(v)])),
]


@pytest.mark.parametrize("name,dim,key_of",
                         DIM_CASES, ids=[c[0] for c in DIM_CASES])
def test_dimension_matrix(service, name, dim, key_of):
    expected = agg_oracle(np.ones(N, bool), None, "count", key_of)
    check(service,
          {"table": "t", "measures": [{"sqlExpression": "count(*)"}],
           "dimensions": [{"sqlExpression": dim}]},
          expected)


def test_numeric_bucket_dim(service):
    w = 10.0
    f = DATA["f32"]
    key_of = (lambda i: (str(int(np.floor(f.v[i] / w) * w))
                         if f.ok[i] else "NULL"))
    expected = agg_oracle(np.ones(N, bool), None, "count", key_of)
    check(service,
          {"table": "t", "measures": [{"sqlExpression": "count(*)"}],
           "dimensions": [{"sqlExpression": "f32",
                           "numericBucketizer": {"bucketWidth": w}}]},
          expected)


def test_time_bucket_dims(service):
    import datetime as _dt

    for bucket, secs, fmt in [
            ("hour", 3600, "%Y-%m-%d %H:00"),
            ("day", 86400, "%Y-%m-%d")]:
        ts = DATA["ts"].v.astype(np.int64)
        bts = ts - ts % secs
        key_of = (lambda i, b=bts, f=fmt: _dt.datetime.fromtimestamp(
            int(b[i]), _dt.timezone.utc).strftime(f))
        expected = agg_oracle(np.ones(N, bool), None, "count", key_of)
        check(service,
              {"table": "t", "measures": [{"sqlExpression": "count(*)"}],
               "dimensions": [{"sqlExpression": "ts",
                               "timeBucketizer": bucket}]},
              expected)


# ---------------------------------------------------------------------------
# 3. measure expressions (:776) — aggs × null propagation × arithmetic
# ---------------------------------------------------------------------------

MEASURE_CASES = [
    ("sum_f32", "sum(f32)", "sum", lambda: V("f32")),
    ("avg_f32", "avg(f32)", "avg", lambda: V("f32")),
    ("min_f32", "min(f32)", "min", lambda: V("f32")),
    ("max_f32", "max(f32)", "max", lambda: V("f32")),
    ("sum_arith", "sum(f32 * 2 + 1)", "sum",
     lambda: op(np.add, op(np.multiply, V("f32"), LIT(2)), LIT(1))),
    ("sum_two_nullable", "sum(i16 + i8)", "sum",
     lambda: op(np.add, V("i16"), V("i8"))),
    ("sum_int_col", "sum(u16)", "sum", lambda: V("u16")),
    ("avg_div", "avg(i32 / 100)", "avg",
     lambda: op(np.divide, V("i32"), LIT(100))),
    ("min_signed", "min(i32)", "min", lambda: V("i32")),
    ("max_expr", "max(i16 - i8)", "max",
     lambda: op(np.subtract, V("i16"), V("i8"))),
]


@pytest.mark.parametrize("name,mexpr,agg,oracle",
                         MEASURE_CASES, ids=[c[0] for c in MEASURE_CASES])
def test_measure_matrix(service, name, mexpr, agg, oracle):
    expected = agg_oracle(np.ones(N, bool), oracle(), agg)
    check(service,
          {"table": "t", "measures": [{"sqlExpression": mexpr}]},
          expected)


@pytest.mark.parametrize("name,mexpr,agg,oracle",
                         MEASURE_CASES[:6], ids=[c[0]
                                                 for c in MEASURE_CASES[:6]])
def test_measure_matrix_grouped_and_filtered(service, name, mexpr, agg,
                                             oracle):
    """agg × dim × filter combinations — the full ProcessQuery shape."""
    mask = keep(op(np.greater, V("u16"), LIT(10)))
    e = DATA["e"]
    key_of = lambda i: ENUMS[int(e.v[i])] if e.ok[i] else "NULL"
    expected = agg_oracle(mask, oracle(), agg, key_of)
    check(service,
          {"table": "t",
           "measures": [{"sqlExpression": mexpr,
                         "rowFilters": ["u16 > 10"]}],
           "dimensions": [{"sqlExpression": "e"}]},
          expected)


# ---------------------------------------------------------------------------
# 4. foreign-table behaviors (makeForeignColumnVectorInput :357; join nulls)
# ---------------------------------------------------------------------------

JOIN = [{"table": "dimt", "alias": "d", "conditions": ["d.id = u16"]}]


def test_join_filter_on_foreign_column(service):
    mask = keep(op(np.greater, joined("val"), LIT(100)))
    check(service,
          {"table": "t", "joins": JOIN,
           "measures": [{"sqlExpression": "count(*)",
                         "rowFilters": ["d.val > 100"]}]},
          {"": float(mask.sum())})


def test_join_miss_is_null_not_zero(service):
    """Rows whose u16 has no dimt.id must behave as NULL (dropped by
    comparisons both ways), not as 0."""
    v, ok = joined("val")
    m_gt = keep((v > -10**9, ok))
    check(service,
          {"table": "t", "joins": JOIN,
           "measures": [{"sqlExpression": "count(*)",
                         "rowFilters": ["d.val > -1000000000"]}]},
          {"": float(m_gt.sum())})
    m_null = ~ok
    check(service,
          {"table": "t", "joins": JOIN,
           "measures": [{"sqlExpression": "count(*)",
                         "rowFilters": ["d.val is null"]}]},
          {"": float(m_null.sum())})


def test_join_foreign_enum_dimension(service):
    v, ok = joined("name")
    key_of = lambda i: DIM_NAMES[int(v[i])] if ok[i] else "NULL"
    expected = agg_oracle(np.ones(N, bool), None, "count", key_of)
    check(service,
          {"table": "t", "joins": JOIN,
           "measures": [{"sqlExpression": "count(*)"}],
           "dimensions": [{"sqlExpression": "d.name"}]},
          expected)


def test_join_measure_on_foreign_column(service):
    expected = agg_oracle(np.ones(N, bool), joined("val"), "sum")
    check(service,
          {"table": "t", "joins": JOIN,
           "measures": [{"sqlExpression": "sum(d.val)"}]},
          expected)


def test_join_mixed_main_foreign_expression(service):
    pred = k_and(op(np.greater, joined("val"), V("i16")),
                 op(np.less, V("u16"), LIT(25)))
    mask = keep(pred)
    q = {"table": "t", "joins": JOIN,
         "measures": [{"sqlExpression": "count(*)",
                       "rowFilters": ["d.val > i16", "u16 < 25"]}]}
    check(service, q, {"": float(mask.sum())} if mask.sum() else {})


# ---------------------------------------------------------------------------
# 5. batch/time behaviors (shouldSkipLiveBatch :1889, prefilter ranges)
# ---------------------------------------------------------------------------

def test_time_filter_excludes_everything(service):
    got = run(service, {
        "table": "t",
        "measures": [{"sqlExpression": "count(*)"}],
        "timeFilter": {"column": "ts", "from": "100 days ago",
                       "to": "99 days ago"}})
    assert got == {}


@pytest.mark.parametrize("hours", [1, 2, 4])
def test_time_filter_partial_window(service, hours):
    # '{N} hours ago' is CALENDAR-ALIGNED (floored to the hour), like the
    # reference's time-expression parser
    lo = (NOW - hours * 3600) // 3600 * 3600
    mask = DATA["ts"].v.astype(np.int64) >= lo
    got = run(service, {
        "table": "t",
        "measures": [{"sqlExpression": "count(*)"}],
        "timeFilter": {"column": "ts", "from": f"{hours} hours ago",
                       "to": "now"}})
    assert got == ({"": float(mask.sum())} if mask.sum() else {})


def test_combined_time_and_row_filter_with_dims(service):
    lo = (NOW - 3 * 3600) // 3600 * 3600
    mask = (DATA["ts"].v.astype(np.int64) >= lo) & keep(V("b"))
    key_of = _dim_keys(DATA["u16"].v % 10, np.ones(N, bool),
                       lambda v: str(int(v)))
    expected = agg_oracle(mask, V("f32"), "sum", key_of)
    check(service, {
        "table": "t",
        "measures": [{"sqlExpression": "sum(f32)", "rowFilters": ["b"]}],
        "dimensions": [{"sqlExpression": "u16 % 10"}],
        "timeFilter": {"column": "ts", "from": "3 hours ago", "to": "now"}},
        expected)


# ---------------------------------------------------------------------------
# 6. non-aggregation behaviors (:2138 exact row order, limits)
# ---------------------------------------------------------------------------

def test_nonagg_limit_and_headers(service):
    got = run(service, {
        "table": "t",
        "measures": [{"sqlExpression": "1"}],
        "dimensions": [{"sqlExpression": "rid"}, {"sqlExpression": "i8"}],
        "rowFilters": ["u16 < 5"],
        "limit": 7})
    assert got["headers"] == ["rid", "i8"]
    rows = got["matrixData"]
    mask = DATA["u16"].v < 5
    assert len(rows) == min(7, int(mask.sum()))
    wanted = np.nonzero(mask)[0]
    for got_row, i in zip(rows, wanted):
        assert got_row[0] == str(int(DATA["rid"].v[i]))
        expect_i8 = (str(int(DATA["i8"].v[i]))
                     if DATA["i8"].ok[i] else "NULL")
        assert got_row[1] == expect_i8


def test_nonagg_expression_columns(service):
    got = run(service, {
        "table": "t",
        "measures": [{"sqlExpression": "1"}],
        "dimensions": [{"sqlExpression": "u16 * 2"},
                       {"sqlExpression": "b"}],
        "rowFilters": ["rid < 10"],
        "limit": 10})
    for got_row, i in zip(got["matrixData"], range(10)):
        assert got_row[0] == str(int(DATA["u16"].v[i]) * 2)
        assert got_row[1] == (str(int(DATA["b"].v[i]))
                              if DATA["b"].ok[i] else "NULL")
