"""Lifecycle-metamorphic differential fuzz: storage state must be invisible.

The same logical data answers the same queries identically no matter where
the rows physically live. This suite drives one random fact table through
the full storage lifecycle and asserts result equality at every transition:

  A  all rows live (multiple live batches)        -> verified vs numpy oracle
  B  partially archived (day 0 + half of day 1)   -> equal to A
  C  more live ingest above the cutoff            -> verified vs oracle
  D  second archive: streaming merge into the
     EXISTING day-1 base + a fresh day-2 batch    -> equal to C
  E  backfill of late updates + late inserts      -> verified vs updated oracle
  F  cold recovery from disk                      -> equal to E

This is the metamorphic generalization of the targeted archiving tests
(tests/test_archiving.py) and the reference's archiving/backfill fixtures
(memstore/archiving_test.go, backfill_test.go): random data + random
queries instead of hand-picked batches, so it sweeps null-first sort
order, mode-3 compression boundaries, live/archive double-count seams,
and backfill merge semantics across many shapes per run.

Time-bucketized dimensions are additionally checked by aggregation
marginalization: summing a day-bucketed result's leaves must reproduce
the bucket-free total (sum/count are marginalizable).
"""

import os

import numpy as np
import pytest

from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common.upsert_batch import UpsertBatch, UpsertBatchBuilder
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.archiving import Archiver
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore
from aresdb_tpu.query.service import QueryService
from tests.test_differential import clean, flatten

DAY = 86400
BASE_T = 1_600_000_000 - (1_600_000_000 % DAY)  # day-aligned
NOW = BASE_T + 3 * DAY + 1000

ENUMS = ["completed", "canceled", "rejected"]

CITIES = {
    "name": "cities",
    "columns": [
        {"name": "id", "type": "Uint16"},
        {"name": "population", "type": "Uint32"},
    ],
    "primaryKeyColumns": [0],
    "isFactTable": False,
    "config": {"batchSize": 8},
}

SCHEMA = {
    "name": "trips",
    "columns": [
        {"name": "ts", "type": "Uint32"},
        {"name": "id", "type": "Uint32"},
        {"name": "city_id", "type": "Uint16"},
        {"name": "fare", "type": "Float32"},
        {"name": "status", "type": "SmallEnum"},
        {"name": "flag", "type": "Bool"},
        {"name": "i32", "type": "Int32"},
        # round-4 column classes: the ones where round-2 fixture replay
        # found silent data loss (arrays nulled by archiving, backfill
        # refusing array updates) now sweep the whole lifecycle too
        {"name": "tags", "type": "ArrayInt32"},
        {"name": "pt", "type": "GeoPoint"},
    ],
    "primaryKeyColumns": [1],
    "archivingSortColumns": [2, 4, 5],
    "isFactTable": True,
    "config": {"batchSize": 64, "recordRetentionInDays": 0},
}

ZONES = {
    "name": "zones",
    "columns": [
        {"name": "geo_uuid", "type": "UUID"},
        {"name": "shape", "type": "GeoShape"},
    ],
    "primaryKeyColumns": [0],
    "isFactTable": False,
    "config": {"batchSize": 16},
}

COL_NAMES = ["ts", "id", "city_id", "fare", "status", "flag", "i32",
             "tags", "pt"]
COL_TYPES = [dt.Uint32, dt.Uint32, dt.Uint16, dt.Float32, dt.SmallEnum,
             dt.Bool, dt.Int32, dt.ArrayInt32, dt.GeoPoint]
NULLABLE = ("city_id", "fare", "status", "flag", "i32", "tags", "pt")


def _batch(rows_by_col, valid_by_col, n):
    b = UpsertBatchBuilder()
    for ci, tp in enumerate(COL_TYPES):
        b.add_column(ci, tp)
    for r in range(n):
        b.add_row()
        for ci, name in enumerate(COL_NAMES):
            if not valid_by_col[name][r]:
                continue
            v = rows_by_col[name][r]
            if name == "tags":
                b.set_value(r, ci, list(v))
            elif name == "pt":
                b.set_value(r, ci, (float(v[0]), float(v[1])))
            else:
                b.set_value(r, ci, bool(v) if name == "flag" else
                            float(v) if name == "fare" else int(v))
    return UpsertBatch(b.to_bytes())


def _gen_tags(rng, n, allow_null_elem=True):
    out = np.empty(n, object)
    for i in range(n):
        ln = rng.randint(0, 4)
        tags = [int(x) for x in rng.randint(0, 10, ln)]
        if allow_null_elem and ln and rng.rand() < 0.15:
            tags[rng.randint(ln)] = None
        out[i] = tags
    return out


def _gen_pts(rng, n):
    """Points: ~60% inside zone A ([0,1]^2), 20% zone B ([10,11]^2),
    20% outside everything (interior sampling, away from edges)."""
    out = np.empty(n, object)
    pick = rng.rand(n)
    for i in range(n):
        u, v = rng.uniform(0.05, 0.95, 2)
        if pick[i] < 0.6:
            out[i] = (u, v)
        elif pick[i] < 0.8:
            out[i] = (10 + u, 10 + v)
        else:
            out[i] = (50 + u, 50 + v)
    return out


def gen_rows(rng, n, id_start, ts_lo, ts_hi, all_valid=False):
    cols = {
        "ts": rng.randint(ts_lo, ts_hi, n).astype(np.int64),
        "id": np.arange(id_start, id_start + n, dtype=np.int64),
        "city_id": rng.randint(0, 20, n).astype(np.int64),
        "fare": np.round(rng.randn(n) * 10, 3),
        "status": rng.randint(0, len(ENUMS), n).astype(np.int64),
        "flag": rng.randint(0, 2, n).astype(bool),
        "i32": rng.randint(-100, 100, n).astype(np.int64),
        "tags": _gen_tags(rng, n, allow_null_elem=not all_valid),
        "pt": _gen_pts(rng, n),
    }
    valid = {name: np.ones(n, bool) for name in COL_NAMES}
    if not all_valid:
        for name in NULLABLE:
            valid[name] = rng.rand(n) >= 0.1
    return cols, valid


# ---------------------------------------------------------------------------
# numpy oracle (row-store semantics over the logical table state)
# ---------------------------------------------------------------------------

FILTERS = [
    (None, lambda c, v: np.ones(len(c["ts"]), bool)),
    ("city_id > 10", lambda c, v: v["city_id"] & (c["city_id"] > 10)),
    ("i32 <= 0", lambda c, v: v["i32"] & (c["i32"] <= 0)),
    ("fare IS NOT NULL", lambda c, v: v["fare"]),
    ("status = 'completed'", lambda c, v: v["status"] & (c["status"] == 0)),
    ("status != 'canceled'", lambda c, v: v["status"] & (c["status"] != 1)),
    ("flag IS TRUE", lambda c, v: v["flag"] & c["flag"]),
    ("city_id IN (1, 2, 3, 4, 5)",
     lambda c, v: v["city_id"] & np.isin(c["city_id"], [1, 2, 3, 4, 5])),
    ("NOT (city_id = 7)", lambda c, v: v["city_id"] & (c["city_id"] != 7)),
    ("city_id > 5 AND fare < 0",
     lambda c, v: (v["city_id"] & (c["city_id"] > 5)) & (v["fare"] &
                                                         (c["fare"] < 0))),
]

DIMS = [
    [],
    [("city_id", "u")],
    [("status", "enum")],
    [("flag", "bool")],
    [("i32", "i")],
    [("city_id", "u"), ("status", "enum")],
    [("city_id + 1", "expr")],
]

AGGS = ["count(*)", "sum(fare)", "min(fare)", "max(fare)", "avg(fare)",
        "sum(i32)"]


def _dim_key(cols, valid, r, name, kind):
    if kind == "expr":  # city_id + 1
        return (str(int(cols["city_id"][r] + 1)) if valid["city_id"][r]
                else "NULL")
    if not valid[name][r]:
        return "NULL"
    if kind == "enum":
        return ENUMS[int(cols[name][r])]
    if kind == "bool":
        return str(int(bool(cols[name][r])))
    return str(int(cols[name][r]))


def oracle(cols, valid, mask, dims, agg):
    n = len(mask)
    groups = {}
    for r in range(n):
        if not mask[r]:
            continue
        key = tuple(_dim_key(cols, valid, r, name, kind)
                    for name, kind in dims)
        groups.setdefault(key, []).append(r)
    out = {}
    for key, rows in groups.items():
        if agg == "count(*)":
            out[key] = float(len(rows))
            continue
        col = agg[agg.index("(") + 1:-1].strip()
        vals = [cols[col][r] for r in rows if valid[col][r]]
        if agg.startswith("sum"):
            out[key] = float(np.sum(np.asarray(vals, np.float64))) if vals \
                else 0.0
        elif agg.startswith("min"):
            out[key] = float(min(vals)) if vals else None
        elif agg.startswith("max"):
            out[key] = float(max(vals)) if vals else None
        else:  # avg
            out[key] = float(np.float32(
                np.sum(np.asarray(vals, np.float64)) / len(vals))) \
                if vals else None
    return out


def _concat_state(*states):
    """Concatenate (cols, valid) states into one logical table."""
    cols = {name: np.concatenate([s[0][name] for s in states])
            for name in COL_NAMES}
    valid = {name: np.concatenate([s[1][name] for s in states])
             for name in COL_NAMES}
    return cols, valid


def _apply_backfill(state, upd_ids, upd_state, new_state):
    """Oracle for backfill: rows with a matching PK are replaced in full
    (the update batches carry every column non-null), new PKs append."""
    cols, valid = _concat_state(state, new_state)
    idx_by_id = {int(i): r for r, i in enumerate(cols["id"])}
    ucols, uvalid = upd_state
    for ur, uid in enumerate(ucols["id"]):
        r = idx_by_id[int(uid)]
        for name in COL_NAMES:
            cols[name][r] = ucols[name][ur]
            valid[name][r] = uvalid[name][ur]
    return cols, valid


# ---------------------------------------------------------------------------


def join_queries():
    """Two foreign-table joins: a joined-column dimension and a joined-
    column row filter. The fact side crosses live/archive states; the
    cities dim table stays live (snapshot-managed) — the join seam is the
    thing under test."""
    j = [{"table": "cities", "alias": "c", "conditions": ["c.id = city_id"]}]
    q1 = {"table": "trips", "joins": j, "now": NOW,
          "measures": [{"sqlExpression": "count(*)"}],
          "dimensions": [{"sqlExpression": "c.population"}]}
    q2 = {"table": "trips", "joins": j, "now": NOW,
          "rowFilters": ["c.population > 500"],
          "measures": [{"sqlExpression": "sum(fare)"}],
          "dimensions": [{"sqlExpression": "city_id"}]}
    return [(q1, [("c.population", "join")]), (q2, [("city_id", "u")])]


def check_join_oracle(res_pair, cols, valid, pop, pop_valid):
    n = len(cols["ts"])
    # q1: count(*) grouped by joined population (unmatched/null -> NULL)
    expected = {}
    for r in range(n):
        cid = int(cols["city_id"][r]) if valid["city_id"][r] else None
        if cid is not None and cid in pop and pop_valid[cid]:
            key = (str(pop[cid]),)
        else:
            key = ("NULL",)
        expected[key] = expected.get(key, 0.0) + 1.0
    got = clean(res_pair[0], "count(*)")
    assert got == {k: pytest.approx(v) for k, v in expected.items()}, \
        (got, expected)
    # q2: sum(fare) by city where joined population > 500 is TRUE
    mask = np.zeros(n, bool)
    for r in range(n):
        cid = int(cols["city_id"][r]) if valid["city_id"][r] else None
        mask[r] = (cid is not None and cid in pop and pop_valid[cid]
                   and pop[cid] > 500)
    expected = oracle(cols, valid, mask, [("city_id", "u")], "sum(fare)")
    got = clean(res_pair[1], "sum(fare)")
    exp_c = clean(expected, "sum(fare)")
    assert set(got) == set(exp_c), (set(got) ^ set(exp_c))
    for k in exp_c:
        assert got[k] == pytest.approx(exp_c[k], rel=1e-4, abs=1e-3), \
            (k, got[k], exp_c[k])


Z_UUIDS = [(1, 0), (2, 0)]  # zone uuid raw (hi, lo) pairs


def _in_zone(p, z):
    lat, lng = p
    if z == 0:
        return 0 <= lat <= 1 and 0 <= lng <= 1
    return 10 <= lat <= 11 and 10 <= lng <= 11


def special_queries():
    """Array / HLL / geo query classes (round-4: the column classes where
    round-2 fixture replay found silent lifecycle data loss)."""
    znames = [dt.uuid_to_string(*u) for u in Z_UUIDS]
    gj = [{"table": "zones", "alias": "g",
           "conditions": ["geography_intersects(g.shape, pt)"]}]
    return {
        "arr_len": {"table": "trips", "now": NOW,
                    "measures": [{"sqlExpression": "count(*)"}],
                    "dimensions": [{"sqlExpression": "length(tags)"}]},
        "arr_contains": {
            "table": "trips", "now": NOW,
            "measures": [{"sqlExpression": "sum(fare)",
                          "rowFilters": ["contains(tags, 3)"]}]},
        "hll_total": {
            "table": "trips", "now": NOW,
            "measures": [{"sqlExpression": "countdistincthll(id)"}]},
        "hll_by_status": {
            "table": "trips", "now": NOW,
            "measures": [{"sqlExpression": "countdistincthll(id)"}],
            "dimensions": [{"sqlExpression": "status"}]},
        "geo_dim": {
            "table": "trips", "joins": gj, "now": NOW,
            "measures": [{"sqlExpression": "count(*)"}],
            "dimensions": [{"sqlExpression": "g.geo_uuid"}],
            "rowFilters": [
                f"g.geo_uuid IN ('{znames[0]}', '{znames[1]}')"]},
        "geo_filter": {
            "table": "trips", "joins": gj, "now": NOW,
            "measures": [{"sqlExpression": "sum(fare)",
                          "rowFilters": [f"g.geo_uuid IN ('{znames[0]}')"]}]},
    }


def run_specials(svc, qs):
    out = {}
    for k, q in qs.items():
        resp = svc.handle_aql({"queries": [q]})
        assert "errors" not in resp, (k, resp.get("errors"))
        out[k] = resp["results"][0]
    return out


def check_specials(got, cols, valid):
    n = len(cols["ts"])
    # arrays: length() counts elements INCLUDING null elements; a null
    # array keys as NULL (test_array_queries.py::test_length semantics)
    exp = {}
    for r in range(n):
        key = str(len(cols["tags"][r])) if valid["tags"][r] else "NULL"
        exp[key] = exp.get(key, 0.0) + 1.0
    assert got["arr_len"] == {k: pytest.approx(v) for k, v in exp.items()}
    # contains: any VALID element equals the literal
    s, any_hit = 0.0, False
    for r in range(n):
        if valid["tags"][r] and any(
                e == 3 for e in cols["tags"][r] if e is not None):
            any_hit = True
            if valid["fare"][r]:
                s += float(cols["fare"][r])
    if any_hit or got["arr_contains"]:
        assert got["arr_contains"].get("", 0.0) == pytest.approx(
            s, rel=1e-4, abs=1e-3)
    # hll: estimates within 5% of exact distinct counts (ids are unique)
    distinct = len({int(i) for i in cols["id"]})
    assert got["hll_total"][""] == pytest.approx(distinct, rel=0.05)
    per = {}
    for r in range(n):
        key = ENUMS[int(cols["status"][r])] if valid["status"][r] else "NULL"
        per.setdefault(key, set()).add(int(cols["id"][r]))
    assert set(got["hll_by_status"]) == set(per)
    for k, ids in per.items():
        assert got["hll_by_status"][k] == pytest.approx(
            len(ids), rel=0.07), k
    # geo: exact point-in-zone counts/sums; unmatched points drop
    def norm(u):
        return u.replace("-", "").upper()

    zc = {0: 0.0, 1: 0.0}
    s1 = 0.0
    for r in range(n):
        if not valid["pt"][r]:
            continue
        for z in (0, 1):
            if _in_zone(cols["pt"][r], z):
                zc[z] += 1.0
                if z == 0 and valid["fare"][r]:
                    s1 += float(cols["fare"][r])
    exp_dim = {norm(dt.uuid_to_string(*Z_UUIDS[z])): zc[z]
               for z in (0, 1) if zc[z]}
    assert got["geo_dim"] == {k: pytest.approx(v)
                              for k, v in exp_dim.items()}
    if s1 or got["geo_filter"]:
        assert got["geo_filter"].get("", 0.0) == pytest.approx(
            s1, rel=1e-4, abs=1e-3)


def check_specials_equal(a, b, state):
    assert set(a) == set(b)
    for k in a:
        ra, rb = a[k], b[k]
        assert set(ra) == set(rb), (state, k, set(ra) ^ set(rb))
        for kk in ra:
            va, vb = ra[kk], rb[kk]
            if va is None or vb is None:
                assert va == vb, (state, k, kk)
            else:
                assert vb == pytest.approx(va, rel=1e-4, abs=1e-3), \
                    (state, k, kk)


def run_queries(svc, queries):
    out = []
    for q, dims in queries:
        resp = svc.handle_aql({"queries": [q]})
        assert "errors" not in resp, (resp.get("errors"), q)
        out.append(flatten(resp["results"][0], len(dims)))
    return out


def check_vs_oracle(results, queries, cols, valid):
    for got, (q, dims) in zip(results, queries):
        if "joins" in q:
            continue  # join queries verify via check_join_oracle
        fsql = (q.get("rowFilters") or [None])[0]
        f = dict((s, fn) for s, fn in FILTERS)[fsql]
        agg = q["measures"][0]["sqlExpression"]
        expected = oracle(cols, valid, f(cols, valid), dims, agg)
        got_c, exp_c = clean(got, agg), clean(expected, agg)
        assert set(got_c) == set(exp_c), (q, set(got_c) ^ set(exp_c))
        for k in exp_c:
            assert got_c[k] == pytest.approx(exp_c[k], rel=1e-4, abs=1e-3), \
                (q, k, got_c[k], exp_c[k])


def check_equal(a_results, b_results, queries, state):
    for a, b, (q, _dims) in zip(a_results, b_results, queries):
        agg = q["measures"][0]["sqlExpression"]
        a_c, b_c = clean(a, agg), clean(b, agg)
        assert set(a_c) == set(b_c), (state, q, set(a_c) ^ set(b_c))
        for k in a_c:
            assert b_c[k] == pytest.approx(a_c[k], rel=1e-4, abs=1e-3), \
                (state, q, k, a_c[k], b_c[k])


def check_time_marginal(svc, agg, total_result):
    """Day-bucketed leaves must marginalize to the bucket-free total."""
    q = {"table": "trips",
         "measures": [{"sqlExpression": agg}],
         "dimensions": [{"sqlExpression": "ts", "timeBucketizer": "day"}],
         "now": NOW}
    resp = svc.handle_aql({"queries": [q]})
    assert "errors" not in resp, (resp.get("errors"), q)
    leaves = [v for v in resp["results"][0].values() if v is not None]
    total = total_result.get((), 0.0) or 0.0
    assert sum(leaves) == pytest.approx(total, rel=1e-4, abs=1e-3), \
        (agg, resp["results"][0], total)


# the mesh variant recompiles every (plan, shape) over the virtual device
# mesh (~170s/seed vs ~7s default). Round-3 capped it to ONE seed; round-4
# instead runs ALL seeds with a reduced per-seed filter-case count (the
# VERDICT-r3 ask: cap per-seed cases, not seeds — the mesh path is where a
# cross-path disagreement is costliest)
_MESH = os.environ.get("ARES_MESH") == "1"
_N_SEEDS = 3
_N_FILTERS_PER_SEED = 4 if _MESH else len(FILTERS)


@pytest.mark.parametrize("seed", range(_N_SEEDS))
def test_lifecycle_differential(seed, tmp_path):
    rng = np.random.RandomState(4200 + seed)
    root = str(tmp_path)
    ms = MemStore(DiskMetaStore(root), LocalDiskStore(root))
    from aresdb_tpu.common.schema import Table
    ms.create_table(Table.from_json(SCHEMA))
    ms.create_table(Table.from_json(CITIES))
    ms.create_table(Table.from_json(ZONES))
    ms.init_shards()
    # extend the enum through both the runtime schema and the metastore,
    # like the enum API handler does (api/server.py EnumHandler.post) —
    # only the metastore copy survives cold recovery
    ms.get_schemas()["trips"].extend_enum("status", ENUMS)
    ms.metastore.extend_enum_cases("trips", "status", ENUMS)
    shard = ms.get_table_shard("trips")
    svc = QueryService(ms)

    # random query set: one per filter (subsampled under ARES_MESH),
    # random dims/agg each
    queries = []
    if _N_FILTERS_PER_SEED < len(FILTERS):
        picks = sorted(rng.choice(len(FILTERS), _N_FILTERS_PER_SEED,
                                  replace=False))
        filter_set = [FILTERS[i] for i in picks]
    else:
        filter_set = FILTERS
    n_f = len(filter_set)
    for fsql, _fn in filter_set:
        dims = DIMS[rng.randint(len(DIMS))]
        agg = AGGS[rng.randint(len(AGGS))]
        q = {"table": "trips",
             "measures": [{"sqlExpression": agg}],
             "dimensions": [{"sqlExpression": name} for name, _ in dims],
             "now": NOW}
        if fsql:
            q["rowFilters"] = [fsql]
        queries.append((q, dims))
    # plus marginalizable totals for the time-bucket check
    total_q = [({"table": "trips", "now": NOW,
                 "measures": [{"sqlExpression": agg}], "dimensions": []}, [])
               for agg in ("count(*)", "sum(fare)")]
    queries += total_q
    jq = join_queries()
    queries += jq
    n_jq = len(jq)
    specials = special_queries()

    # zones dim table: the two squares the pt generator targets
    zb = UpsertBatchBuilder()
    zb.add_column(0, dt.UUID)
    zb.add_column(1, dt.GeoShape)
    for i, (uid, wkt) in enumerate([
            (Z_UUIDS[0], "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
            (Z_UUIDS[1], "POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))")]):
        zb.add_row()
        zb.set_value(i, 0, uid)
        zb.set_value(i, 1, dt.parse_geoshape(wkt))
    ms.get_table_shard("zones").save_upsert_batch(
        UpsertBatch(zb.to_bytes()))

    # cities dim table: ids 0..14 present (15..19 unmatched on purpose),
    # population null for two of them
    pop, pop_valid = {}, {}
    cb = UpsertBatchBuilder()
    cb.add_column(0, dt.Uint16)
    cb.add_column(1, dt.Uint32)
    for i in range(15):
        pop[i] = int(rng.randint(100, 1000))
        pop_valid[i] = i not in (3, 11)
        cb.add_row()
        cb.set_value(i, 0, i)
        if pop_valid[i]:
            cb.set_value(i, 1, pop[i])
    ms.get_table_shard("cities").save_upsert_batch(UpsertBatch(cb.to_bytes()))

    # ---- state A: all live
    base = gen_rows(rng, 500, 0, BASE_T, BASE_T + 3 * DAY)
    shard.save_upsert_batch(_batch(*base, 500))
    res_a = run_queries(svc, queries)
    check_vs_oracle(res_a, queries, *base)
    check_join_oracle(res_a[-n_jq:], *base, pop, pop_valid)
    sp_a = run_specials(svc, specials)
    check_specials(sp_a, *base)
    for i, agg in enumerate(("count(*)", "sum(fare)")):
        check_time_marginal(svc, agg, res_a[n_f + i])

    # ---- state B: archive day 0 + the first half of day 1
    arch = Archiver(shard, ms.metastore, ms.diskstore)
    stats = arch.archive(BASE_T + DAY + DAY // 2)
    assert stats.rows_archived > 0
    res_b = run_queries(svc, queries)
    check_equal(res_a, res_b, queries, "B:partial-archive")
    check_specials_equal(sp_a, run_specials(svc, specials),
                         "B:partial-archive")

    # ---- state C: more live rows above the cutoff
    extra = gen_rows(rng, 100, 5000, BASE_T + DAY + DAY // 2,
                     BASE_T + 3 * DAY)
    st = shard.save_upsert_batch(_batch(*extra, 100))
    assert st.backfilled == 0
    logical = _concat_state(base, extra)
    res_c = run_queries(svc, queries)
    check_vs_oracle(res_c, queries, *logical)
    check_join_oracle(res_c[-n_jq:], *logical, pop, pop_valid)
    sp_c = run_specials(svc, specials)
    check_specials(sp_c, *logical)

    # ---- state D: second archive — streaming merge into the existing
    # day-1 base + a fresh day-2 batch
    stats = arch.archive(BASE_T + 3 * DAY)
    assert stats.rows_archived > 0
    res_d = run_queries(svc, queries)
    check_equal(res_c, res_d, queries, "D:merged-archive")
    check_specials_equal(sp_c, run_specials(svc, specials),
                         "D:merged-archive")
    for i, agg in enumerate(("count(*)", "sum(fare)")):
        check_time_marginal(svc, agg, res_d[n_f + i])

    # ---- state E: backfill — late updates of archived PKs (same event
    # day, every column re-set non-null) + late inserts of new PKs
    upd_idx = rng.choice(500, 20, replace=False)
    upd = gen_rows(rng, 20, 0, BASE_T, BASE_T + 1, all_valid=True)
    upd[0]["id"] = base[0]["id"][upd_idx].copy()
    upd[0]["ts"] = base[0]["ts"][upd_idx].copy()  # keep the original day
    late = gen_rows(rng, 20, 10000, BASE_T, BASE_T + 3 * DAY)
    st1 = shard.save_upsert_batch(_batch(*upd, 20))
    st2 = shard.save_upsert_batch(_batch(*late, 20))
    assert st1.backfilled == 20 and st2.backfilled == 20
    applied = arch.backfill()
    assert applied == 40
    logical = _apply_backfill(logical, upd[0]["id"], upd, late)
    res_e = run_queries(svc, queries)
    check_vs_oracle(res_e, queries, *logical)
    check_join_oracle(res_e[-n_jq:], *logical, pop, pop_valid)
    sp_e = run_specials(svc, specials)
    check_specials(sp_e, *logical)

    # ---- state F: cold recovery from disk
    ms2 = MemStore(DiskMetaStore(root), LocalDiskStore(root))
    ms2.fetch_schema()
    ms2.init_shards()
    res_f = run_queries(QueryService(ms2), queries)
    check_equal(res_e, res_f, queries, "F:recovery")
    check_specials_equal(sp_e, run_specials(QueryService(ms2), specials),
                         "F:recovery")
    for i, agg in enumerate(("count(*)", "sum(fare)")):
        check_time_marginal(QueryService(ms2), agg, res_f[n_f + i])

    # ---- state G: purge — retention drops whole archive days (the oracle
    # drops the same rows by event day), and the purge survives recovery
    retention = 2
    schema = ms.get_schemas()["trips"]
    schema.table.config.record_retention_in_days = retention
    arch = Archiver(ms.get_table_shard("trips"), ms.metastore, ms.diskstore)
    purged = arch.purge(NOW)
    assert purged > 0
    cutoff_day = NOW // DAY - retention
    keep = (logical[0]["ts"] // DAY) >= cutoff_day
    logical = ({n: logical[0][n][keep] for n in COL_NAMES},
               {n: logical[1][n][keep] for n in COL_NAMES})
    res_g = run_queries(svc, queries)
    check_vs_oracle(res_g, queries, *logical)
    check_join_oracle(res_g[-n_jq:], *logical, pop, pop_valid)
    sp_g = run_specials(svc, specials)
    check_specials(sp_g, *logical)

    ms3 = MemStore(DiskMetaStore(root), LocalDiskStore(root))
    ms3.fetch_schema()
    ms3.init_shards()
    res_h = run_queries(QueryService(ms3), queries)
    check_equal(res_g, res_h, queries, "H:recovery-after-purge")
    check_specials_equal(sp_g, run_specials(QueryService(ms3), specials),
                         "H:recovery-after-purge")
