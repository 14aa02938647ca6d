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
]

DIM_CHOICES = [
    ([], lambda c, v: []),
    ([("c8", "u")], None),
    ([("c16", "u")], None),
    ([("e", "enum")], None),
    ([("b", "bool")], None),
    ([("c8", "u"), ("e", "enum")], None),
    ([("c16", "u"), ("b", "bool")], None),
    ([("i32", "i")], None),
]

AGG_CHOICES = ["count(*)", "sum(f)", "min(f)", "max(f)", "sum(c16)",
               "avg(f)"]


def dim_value_str(kind, val, valid):
    if not valid:
        return "NULL"
    if kind == "enum":
        return ENUMS[int(val)]
    if kind == "bool":
        return str(int(bool(val)))
    return str(int(val))


def oracle(cols, valid, mask, dims, agg):
    groups = {}
    for r in range(N_ROWS):
        if not mask[r]:
            continue
        key = tuple(dim_value_str(kind, cols[name][r], valid[name][r])
                    for name, kind in dims)
        g = groups.setdefault(key, [])
        g.append(r)
    out = {}
    for key, rows in groups.items():
        if agg == "count(*)":
            val = float(len(rows))
        else:
            col = agg[agg.index("(") + 1:-1]
            vals = [cols[col][r] for r in rows if valid[col][r]]
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

    for trial in range(8):
        fsql, foracle = FILTER_CHOICES[rng.randint(len(FILTER_CHOICES))]
        dims, _ = DIM_CHOICES[rng.randint(len(DIM_CHOICES))]
        agg = AGG_CHOICES[rng.randint(len(AGG_CHOICES))]

        q = {"table": "t",
             "measures": [{"sqlExpression": agg}],
             "dimensions": [{"sqlExpression": name} for name, _ in dims],
             "now": NOW}
        if fsql:
            q["rowFilters"] = [fsql]
        resp = svc.handle_aql({"queries": [q]})
        assert "errors" not in resp, (resp.get("errors"), q)
        got = flatten(resp["results"][0], len(dims))

        mask = foracle(cols, valid)
        expected = oracle(cols, valid, mask, dims, agg)

        # min/max identity leaves for all-null groups: engine reports the
        # identity value; oracle reports None — align by dropping both
        def clean(d):
            return {k: v for k, v in d.items()
                    if v is not None and abs(v) < 1e30}

        got_c, exp_c = clean(got), clean(expected)
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
            dims, _ = DIM_CHOICES[rng.randint(len(DIM_CHOICES))]
            agg = AGG_CHOICES[rng.randint(len(AGG_CHOICES))]
            q = {"table": "t",
                 "measures": [{"sqlExpression": agg}],
                 "dimensions": [{"sqlExpression": name} for name, _ in dims],
                 "now": NOW}
            if fsql:
                q["rowFilters"] = [fsql]
            resp = svc.handle_aql({"queries": [q]})
            assert "errors" not in resp, (resp.get("errors"), q)
            got = flatten(resp["results"][0], len(dims))
            mask = foracle(cols, valid)
            expected = oracle(cols, valid, mask, dims, agg)

            def clean(d):
                return {k: v for k, v in d.items()
                        if v is not None and abs(v) < 1e30}

            got_c, exp_c = clean(got), clean(expected)
            assert set(got_c) == set(exp_c), (q, set(got_c) ^ set(exp_c))
            for k in exp_c:
                assert got_c[k] == pytest.approx(exp_c[k], rel=1e-4,
                                                 abs=1e-3), \
                    (q, k, got_c[k], exp_c[k])
    finally:
        GLOBAL_KERNEL_CACHE._cache.clear()
