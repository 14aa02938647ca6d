"""Randomized differential testing: engine results vs a pure-numpy oracle.

Generates random tables and random queries (filters × dims × aggs), computes
the expected result with straightforward numpy, and requires exact (int) or
tolerance (float) agreement. Catches cross-path bugs the targeted tests
miss (dense vs sort path selection, null propagation, packing).
"""

import datetime as dt

import numpy as np
import pytest

from aresdb_tpu.common import data_types as mdt
from aresdb_tpu.common.upsert_batch import UpsertBatch, UpsertBatchBuilder
from aresdb_tpu.query.service import QueryService
from tests.test_query_e2e import FakeMemStore

NOW = 1_600_000_000
N_ROWS = 800

SCHEMA = {
    "name": "t",
    "columns": [
        {"name": "ts", "type": "Uint32"},
        {"name": "id", "type": "Uint32"},
        {"name": "c8", "type": "Uint8"},
        {"name": "c16", "type": "Uint16"},
        {"name": "i32", "type": "Int32"},
        {"name": "f", "type": "Float32"},
        {"name": "b", "type": "Bool"},
        {"name": "e", "type": "SmallEnum"},
    ],
    "primaryKeyColumns": [1],
    "isFactTable": True,
    "config": {"batchSize": 256, "recordRetentionInDays": 0},
}

ENUMS = ["red", "green", "blue", "black"]


def build(seed):
    rng = np.random.RandomState(seed)
    store = FakeMemStore()
    schema = store.create(SCHEMA)
    schema.extend_enum("e", ENUMS)

    cols = {
        "ts": NOW - rng.randint(0, 4 * 3600, N_ROWS),
        "id": np.arange(N_ROWS),
        "c8": rng.randint(0, 6, N_ROWS),
        "c16": rng.randint(0, 50, N_ROWS),
        "i32": rng.randint(-100, 100, N_ROWS),
        "f": np.round(rng.randn(N_ROWS) * 10, 3),
        "b": rng.randint(0, 2, N_ROWS).astype(bool),
        "e": rng.randint(0, len(ENUMS), N_ROWS),
    }
    # ~10% nulls on nullable cols
    null_masks = {}
    for name in ("c8", "c16", "i32", "f", "b", "e"):
        null_masks[name] = rng.rand(N_ROWS) < 0.1

    b = UpsertBatchBuilder()
    types = [mdt.Uint32, mdt.Uint32, mdt.Uint8, mdt.Uint16, mdt.Int32,
             mdt.Float32, mdt.Bool, mdt.SmallEnum]
    names = ["ts", "id", "c8", "c16", "i32", "f", "b", "e"]
    for ci, tp in enumerate(types):
        b.add_column(ci, tp)
    for r in range(N_ROWS):
        b.add_row()
        for ci, name in enumerate(names):
            if name in null_masks and null_masks[name][r]:
                continue
            v = cols[name][r]
            b.set_value(r, ci, bool(v) if name == "b" else
                        float(v) if name == "f" else int(v))
    store.get_table_shard("t").save_upsert_batch(UpsertBatch(b.to_bytes()))

    valid = {n: ~null_masks.get(n, np.zeros(N_ROWS, bool)) for n in names}
    return store, cols, valid


FILTER_CHOICES = [
    (None, lambda c, v: np.ones(N_ROWS, bool)),
    ("c8 > 2", lambda c, v: v["c8"] & (c["c8"] > 2)),
    ("i32 <= 0", lambda c, v: v["i32"] & (c["i32"] <= 0)),
    ("f IS NOT NULL", lambda c, v: v["f"]),
    ("e = 'green'", lambda c, v: v["e"] & (c["e"] == 1)),
    ("e != 'red'", lambda c, v: v["e"] & (c["e"] != 0)),
    ("b IS TRUE", lambda c, v: v["b"] & c["b"]),
    ("c16 IN (1, 2, 3)", lambda c, v: v["c16"] & np.isin(c["c16"], [1, 2, 3])),
    ("c8 + 1 > 3", lambda c, v: v["c8"] & (c["c8"] + 1 > 3)),
    ("NOT (c8 = 1)", lambda c, v: v["c8"] & (c["c8"] != 1)),
    # 3-valued logic: a row passes only when the predicate is TRUE
    ("c8 > 2 AND f < 0",
     lambda c, v: (v["c8"] & (c["c8"] > 2)) & (v["f"] & (c["f"] < 0))),
    ("c8 > 4 OR i32 > 50",
     lambda c, v: (v["c8"] & (c["c8"] > 4)) | (v["i32"] & (c["i32"] > 50))),
    ("f * 2 >= 5", lambda c, v: v["f"] & (c["f"] * 2 >= 5)),
    ("c16 % 10 = 3", lambda c, v: v["c16"] & (c["c16"] % 10 == 3)),
    ("c16 - c16 % 10 = 20",
     lambda c, v: v["c16"] & (c["c16"] - c["c16"] % 10 == 20)),
]


def _col_dim(name, kind):
    return (name, kind,
            lambda c, v, r, name=name: (c[name][r], v[name][r]))


DIM_CHOICES = [
    [],
    [_col_dim("c8", "u")],
    [_col_dim("c16", "u")],
    [_col_dim("e", "enum")],
    [_col_dim("b", "bool")],
    [_col_dim("c8", "u"), _col_dim("e", "enum")],
    [_col_dim("c16", "u"), _col_dim("b", "bool")],
    [_col_dim("i32", "i")],
    # expression dims (all-int arithmetic: unambiguous semantics)
    [("c16 - c16 % 10", "u",
      lambda c, v, r: (c["c16"][r] - c["c16"][r] % 10, v["c16"][r]))],
    [("c8 * 2 + 1", "u",
      lambda c, v, r: (c["c8"][r] * 2 + 1, v["c8"][r]))],
    # CASE: null/false condition -> ELSE branch (always valid)
    [("case when b then 1 else 0 end", "i",
      lambda c, v, r: (1 if (v["b"][r] and c["b"][r]) else 0, True))],
    [("case when c8 > 2 then c8 else i32 end", "i",
      lambda c, v, r: (c["c8"][r], v["c8"][r])
      if (v["c8"][r] and c["c8"][r] > 2) else (c["i32"][r], v["i32"][r]))],
]

AGG_CHOICES = ["count(*)", "sum(f)", "min(f)", "max(f)", "sum(c16)",
               "avg(f)", "sum(f * 2)", "max(i32)"]


def dim_value_str(kind, val, valid):
    if not valid:
        return "NULL"
    if kind == "enum":
        return ENUMS[int(val)]
    if kind == "bool":
        return str(int(bool(val)))
    return str(int(val))


def _measure_values(cols, valid, rows, agg):
    """Valid measure values for one group (expression-aware)."""
    expr = agg[agg.index("(") + 1:-1].strip()
    if expr == "f * 2":
        return [cols["f"][r] * 2 for r in rows if valid["f"][r]]
    return [cols[expr][r] for r in rows if valid[expr][r]]


def oracle(cols, valid, mask, dims, agg):
    groups = {}
    for r in range(N_ROWS):
        if not mask[r]:
            continue
        key = tuple(dim_value_str(kind, *getter(cols, valid, r))
                    for _, kind, getter in dims)
        g = groups.setdefault(key, [])
        g.append(r)
    out = {}
    for key, rows in groups.items():
        if agg == "count(*)":
            val = float(len(rows))
        else:
            vals = _measure_values(cols, valid, rows, agg)
            if agg.startswith("sum"):
                val = float(np.sum(np.asarray(vals, np.float64))) if vals else 0.0
            elif agg.startswith("min"):
                val = float(min(vals)) if vals else None
            elif agg.startswith("max"):
                val = float(max(vals)) if vals else None
            else:  # avg
                val = float(np.float32(np.sum(np.asarray(vals, np.float64))
                                       / len(vals))) if vals else None
        out[key] = val
    return out


def clean(d, agg):
    """Drop all-null-group identity leaves so engine (identity value) and
    oracle (None) agree: float +-3.4e38 and int32 min/max identities."""
    out = {}
    for k, v in d.items():
        if v is None or abs(v) >= 1e30:
            continue
        if agg.startswith(("min", "max")) and v in (2147483647.0,
                                                    -2147483648.0):
            continue
        out[k] = v
    return out


def flatten(result, n_dims, prefix=()):
    if n_dims == 0:
        return {(): result.get("", None)} if result else {}
    out = {}
    for k, v in result.items():
        if n_dims == 1:
            out[prefix + (k,)] = v
        else:
            out.update(flatten(v, n_dims - 1, prefix + (k,)))
    return out


@pytest.mark.parametrize("seed", range(6))
def test_differential(seed):
    rng = np.random.RandomState(1000 + seed)
    store, cols, valid = build(seed)
    svc = QueryService(store)

    for trial in range(12):
        fsql, foracle = FILTER_CHOICES[rng.randint(len(FILTER_CHOICES))]
        dims = DIM_CHOICES[rng.randint(len(DIM_CHOICES))]
        agg = AGG_CHOICES[rng.randint(len(AGG_CHOICES))]

        q = {"table": "t",
             "measures": [{"sqlExpression": agg}],
             "dimensions": [{"sqlExpression": sql} for sql, _, _ in dims],
             "now": NOW}
        if fsql:
            q["rowFilters"] = [fsql]
        resp = svc.handle_aql({"queries": [q]})
        assert "errors" not in resp, (resp.get("errors"), q)
        got = flatten(resp["results"][0], len(dims))

        mask = foracle(cols, valid)
        expected = oracle(cols, valid, mask, dims, agg)

        got_c, exp_c = clean(got, agg), clean(expected, agg)
        assert set(got_c) == set(exp_c), (q, set(got_c) ^ set(exp_c))
        for k in exp_c:
            assert got_c[k] == pytest.approx(exp_c[k], rel=1e-4, abs=1e-3), \
                (q, k, got_c[k], exp_c[k])


@pytest.mark.parametrize("seed", range(2))
def test_differential_factored_reduction(seed, monkeypatch):
    """Same differential harness with the factored MXU reduction forced on
    (the default TPU path; interpretable on CPU since it is pure XLA)."""
    monkeypatch.setenv("ARES_FACTORED", "1")
    from aresdb_tpu.query.kernels import GLOBAL_KERNEL_CACHE
    GLOBAL_KERNEL_CACHE._cache.clear()   # drop kernels traced without it
    try:
        rng = np.random.RandomState(2000 + seed)
        store, cols, valid = build(seed + 50)
        svc = QueryService(store)
        for trial in range(4):
            fsql, foracle = FILTER_CHOICES[rng.randint(len(FILTER_CHOICES))]
            dims = DIM_CHOICES[rng.randint(len(DIM_CHOICES))]
            agg = AGG_CHOICES[rng.randint(len(AGG_CHOICES))]
            q = {"table": "t",
                 "measures": [{"sqlExpression": agg}],
                 "dimensions": [{"sqlExpression": sql} for sql, _, _ in dims],
                 "now": NOW}
            if fsql:
                q["rowFilters"] = [fsql]
            resp = svc.handle_aql({"queries": [q]})
            assert "errors" not in resp, (resp.get("errors"), q)
            got = flatten(resp["results"][0], len(dims))
            mask = foracle(cols, valid)
            expected = oracle(cols, valid, mask, dims, agg)

            got_c, exp_c = clean(got, agg), clean(expected, agg)
            assert set(got_c) == set(exp_c), (q, set(got_c) ^ set(exp_c))
            for k in exp_c:
                assert got_c[k] == pytest.approx(exp_c[k], rel=1e-4,
                                                 abs=1e-3), \
                    (q, k, got_c[k], exp_c[k])
    finally:
        GLOBAL_KERNEL_CACHE._cache.clear()


@pytest.mark.parametrize("seed", range(3))
def test_differential_measure_rowfilters(seed):
    """Measure-level rowFilters AND into the row mask (reference: measure
    filters merge with query filters at compile, aql_compiler.go)."""
    rng = np.random.RandomState(3000 + seed)
    store, cols, valid = build(seed + 100)
    svc = QueryService(store)
    for trial in range(6):
        f1sql, f1 = FILTER_CHOICES[rng.randint(1, len(FILTER_CHOICES))]
        f2sql, f2 = FILTER_CHOICES[rng.randint(1, len(FILTER_CHOICES))]
        dims = DIM_CHOICES[rng.randint(len(DIM_CHOICES))]
        agg = AGG_CHOICES[rng.randint(len(AGG_CHOICES))]
        q = {"table": "t",
             "measures": [{"sqlExpression": agg, "rowFilters": [f2sql]}],
             "dimensions": [{"sqlExpression": sql} for sql, _, _ in dims],
             "rowFilters": [f1sql],
             "now": NOW}
        resp = svc.handle_aql({"queries": [q]})
        assert "errors" not in resp, (resp.get("errors"), q)
        got = flatten(resp["results"][0], len(dims))
        mask = f1(cols, valid) & f2(cols, valid)
        expected = oracle(cols, valid, mask, dims, agg)
        got_c, exp_c = clean(got, agg), clean(expected, agg)
        assert set(got_c) == set(exp_c), (q, set(got_c) ^ set(exp_c))
        for k in exp_c:
            assert got_c[k] == pytest.approx(exp_c[k], rel=1e-4, abs=1e-3), \
                (q, k, got_c[k], exp_c[k])


@pytest.mark.parametrize("seed", range(2))
def test_differential_composite_measures(seed):
    """Composite (multi-measure) queries vs the oracle: two random base
    aggregates with independent measure filters + a derived ratio, joined
    per dim group (query/composite.py). The reference cannot execute
    these; the oracle defines correctness."""
    rng = np.random.RandomState(7000 + seed)
    store, cols, valid = build(seed + 300)
    svc = QueryService(store)
    for trial in range(6):
        f1sql, f1 = FILTER_CHOICES[rng.randint(1, len(FILTER_CHOICES))]
        f2sql, f2 = FILTER_CHOICES[rng.randint(1, len(FILTER_CHOICES))]
        dims = DIM_CHOICES[rng.randint(len(DIM_CHOICES))]
        agg1 = AGG_CHOICES[rng.randint(len(AGG_CHOICES))]
        agg2 = AGG_CHOICES[rng.randint(len(AGG_CHOICES))]
        q = {"table": "t",
             "measures": [
                 {"sqlExpression": agg1, "alias": "A",
                  "rowFilters": [f1sql]},
                 {"sqlExpression": agg2, "alias": "B",
                  "rowFilters": [f2sql]},
                 {"sqlExpression": "A / B", "alias": "R"},
             ],
             "dimensions": [{"sqlExpression": sql} for sql, _, _ in dims],
             "now": NOW}
        resp = svc.handle_aql({"queries": [q]})
        assert "errors" not in resp, (resp.get("errors"), q)

        exp_a = clean(oracle(cols, valid, f1(cols, valid), dims, agg1), agg1)
        exp_b = clean(oracle(cols, valid, f2(cols, valid), dims, agg2), agg2)
        got = flatten(resp["results"][0], len(dims))
        keys = set(exp_a) | set(exp_b)
        assert set(got) == keys, (q, set(got) ^ keys)
        for k, leaf in got.items():
            a, b = exp_a.get(k), exp_b.get(k)
            assert leaf["A"] == (pytest.approx(a, rel=1e-4, abs=1e-3)
                                 if a is not None else None), (q, k)
            assert leaf["B"] == (pytest.approx(b, rel=1e-4, abs=1e-3)
                                 if b is not None else None), (q, k)
            exp_r = (None if a is None or b is None or b == 0 else a / b)
            assert leaf["R"] == (pytest.approx(exp_r, rel=1e-4, abs=1e-3)
                                 if exp_r is not None else None), (q, k)
