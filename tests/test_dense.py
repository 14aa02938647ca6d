"""Dense slot group-by: planning, equivalence with the sort path, fallback."""

import numpy as np
import pytest

from aresdb_tpu import demo
from aresdb_tpu.query import expr as E
from aresdb_tpu.query.dense import DENSE_MAX_SLOTS, plan_dense


def test_demo_plan_qualifies_with_stats():
    plan = demo.demo_plan()
    city_key = (0, plan.main_schema.column_id("city_id"))
    dp = plan_dense(plan, {city_key: 300})
    assert dp is not None
    # hour bucket domain ~25-26 slots, city pow2(301)=512
    assert dp.domains[0].step == 3600
    assert dp.domains[1].size == 512
    assert dp.n_slots <= DENSE_MAX_SLOTS


def test_no_stats_no_dense():
    plan = demo.demo_plan()
    assert plan_dense(plan, {}) is None  # uint16 city unbounded without stats


def test_dense_matches_sort_path():
    import jax
    import jax.numpy as jnp

    from aresdb_tpu.query import kernels as K

    n_rows = 2048
    plan = demo.demo_plan()
    cols_np, _ = demo.demo_columns(plan, n_rows, seed=11, n_cities=50)
    columns = {k: (jnp.asarray(v), jnp.asarray(b))
               for k, (v, b) in cols_np.items()}

    city_key = (0, plan.main_schema.column_id("city_id"))
    dp = plan_dense(plan, {city_key: int(cols_np[city_key][0].max())})
    assert dp is not None

    dense_fn = K.make_dense_agg_kernel(plan, n_rows, dp)
    aggv, cnt, rows, overflow = K.run_dense_kernel(
        dense_fn, plan, dp.n_slots, columns, (), np.int32(n_rows),
        np.int64(0))
    assert int(overflow) == 0
    rows = np.asarray(rows)
    used = np.nonzero(rows > 0)[0]
    decoded = dp.decode_slots(used)
    dense_groups = {}
    for i, slot in enumerate(used):
        key = tuple((bool(b[i]), int(v[i]) if b[i] else None)
                    for v, b in decoded)
        dense_groups[key] = float(np.asarray(aggv)[slot])

    sort_fn = jax.jit(
        lambda c, n: K.agg_batch_body(plan, n_rows, 4096, c, (), n))
    out = sort_fn(columns, np.int32(n_rows))
    s_used = np.asarray(out[2])
    s_agg = np.asarray(out[3])
    dim_values = [np.asarray(d) for d in out[6]]
    dim_valids = [np.asarray(d) for d in out[7]]
    sort_groups = {}
    for slot in np.nonzero(s_used)[0]:
        key = tuple(
            (bool(dv[slot]), int(val[slot]) if dv[slot] else None)
            for val, dv in zip(dim_values, dim_valids))
        sort_groups[key] = float(s_agg[slot])

    assert set(dense_groups) == set(sort_groups)
    for k in sort_groups:
        assert dense_groups[k] == pytest.approx(sort_groups[k], rel=1e-6)


def test_dense_overflow_detected():
    """Rows outside the planned domain must be flagged, not aliased."""
    import jax.numpy as jnp

    from aresdb_tpu.query import kernels as K

    n_rows = 1024
    plan = demo.demo_plan()
    cols_np, _ = demo.demo_columns(plan, n_rows, seed=5, n_cities=50)
    city_key = (0, plan.main_schema.column_id("city_id"))
    # plan with understated max so some cities are out of range
    dp = plan_dense(plan, {city_key: 7})
    assert dp is not None and dp.domains[1].size == 8
    columns = {k: (jnp.asarray(v), jnp.asarray(b))
               for k, (v, b) in cols_np.items()}
    dense_fn = K.make_dense_agg_kernel(plan, n_rows, dp)
    _, _, _, overflow = K.run_dense_kernel(
        dense_fn, plan, dp.n_slots, columns, (), np.int32(n_rows),
        np.int64(0))
    assert int(overflow) > 0


def test_enum_dim_domain():
    plan = demo.demo_plan({
        "table": "trips",
        "measures": [{"sqlExpression": "count(*)"}],
        "dimensions": [{"sqlExpression": "status"}],
        "now": demo.DEMO_NOW,
    })
    dp = plan_dense(plan, {})
    assert dp is not None
    assert dp.domains[0].size == 3  # completed/canceled/rejected


def test_time_bucket_domain_from_batch_stats():
    """Dense mode without a timeFilter: the FLOOR time-bucket domain comes
    from the batch's observed time-column (min, max) stats."""
    from aresdb_tpu import demo
    from aresdb_tpu.query.dense import plan_dense

    q = dict(demo.DEMO_QUERY)
    q = {k: v for k, v in q.items() if k != "timeFilter"}
    plan = demo.demo_plan(q)
    assert plan.from_ts is None or plan.to_ts is None
    tkey = (0, plan.main_schema.column_id("request_at"))
    ckey = (0, plan.main_schema.column_id("city_id"))
    base = demo.DEMO_NOW - 20 * 3600
    dp = plan_dense(plan, {tkey: (base, demo.DEMO_NOW), ckey: (1, 300)})
    assert dp is not None
    hours = dp.domains[0]
    assert hours.step == 3600
    assert hours.base == (base // 3600) * 3600
    assert hours.size == (demo.DEMO_NOW // 3600) - (base // 3600) + 1
    # no stats for the time column -> not densely plannable
    assert plan_dense(plan, {ckey: (1, 300)}) is None
