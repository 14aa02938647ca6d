"""Fused dense pallas kernel (fused_dense.py) vs the XLA dense kernel.

Runs the fused eval+slot+reduce kernel in interpreter mode on CPU (the
HOST-mode strategy of SURVEY.md §4) against make_dense_agg_kernel's XLA
path over a matrix of plan shapes, asserting agg/cnt/rows/overflow parity.
"""

from __future__ import annotations

import numpy as np
import pytest

from aresdb_tpu import demo
from aresdb_tpu.query import fused_dense as FD
from aresdb_tpu.query import kernels as K
from aresdb_tpu.query.dense import plan_dense

N_ROWS = 4096


def _columns(plan, seed=3, n_cities=40):
    cols_np, _ = demo.demo_columns(plan, N_ROWS, seed=seed,
                                   n_cities=n_cities)
    import jax.numpy as jnp

    return cols_np, {k: (jnp.asarray(v), jnp.asarray(b))
                     for k, (v, b) in cols_np.items()}


def _run_both(query, n_valid=None, cutoff=0, seed=3, n_cities=40):
    import jax.numpy as jnp

    plan = demo.demo_plan(query)
    cols_np, columns = _columns(plan, seed=seed, n_cities=n_cities)
    city_key = (0, plan.main_schema.column_id("city_id"))
    stats = {}
    if city_key in cols_np:
        stats[city_key] = (0, int(cols_np[city_key][0].max()))
    fare_key = (0, plan.main_schema.column_id("fare"))
    if fare_key in cols_np:
        fv = cols_np[fare_key][0]
        stats[fare_key] = (float(fv.min()), float(fv.max()))
    dp = plan_dense(plan, stats)
    assert dp is not None, "plan must qualify for dense mode"
    spec = FD.plan_fused(plan, dp)
    assert spec is not None, "plan must qualify for the fused kernel"

    nv = np.int32(N_ROWS if n_valid is None else n_valid)
    co = np.int64(cutoff)
    fused = FD.make_fused_dense_kernel(plan, N_ROWS, dp, spec,
                                       interpret=True)
    ref = K.make_dense_agg_kernel(plan, N_ROWS, dp)
    fa, fc, fr, fo = [np.asarray(x) for x in K.run_dense_kernel(
        fused, plan, dp.n_slots, columns, (), nv, co)]
    ra, rc, rr, ro = [np.asarray(x) for x in K.run_dense_kernel(
        ref, plan, dp.n_slots, columns, (), nv, co)]
    np.testing.assert_allclose(fa, ra, rtol=2e-4, atol=1e-3)
    np.testing.assert_array_equal(fc, rc)
    np.testing.assert_array_equal(fr, rr)
    assert int(fo) == int(ro)
    return fa, fc, fr, fo


def test_headline_sum():
    _run_both(demo.DEMO_QUERY)


def test_headline_avg_null_measures():
    q = dict(demo.DEMO_QUERY)
    q["measures"] = [{"sqlExpression": "avg(fare)"}]
    _run_both(q, seed=11)


def test_count_no_filters():
    q = dict(demo.DEMO_QUERY)
    q["measures"] = [{"sqlExpression": "count(*)"}]
    _run_both(q)


def test_partial_n_valid_and_cutoff():
    _run_both(demo.DEMO_QUERY, n_valid=N_ROWS - 777,
              cutoff=demo.DEMO_NOW - 5 * 3600)


def test_case_and_in_filter():
    q = dict(demo.DEMO_QUERY)
    q["measures"] = [{
        "sqlExpression":
            "sum(case when status='completed' then fare else 0 end)",
        "rowFilters": ["status in ('completed', 'canceled')"],
    }]
    _run_both(q)


def test_single_dim_city():
    q = dict(demo.DEMO_QUERY)
    q["dimensions"] = [{"sqlExpression": "city_id"}]
    _run_both(q)


def test_numeric_bucket_dim():
    q = dict(demo.DEMO_QUERY)
    q["dimensions"] = [{"sqlExpression": "fare", "numericBucketizer":
                        {"bucketWidth": 5.0}}]
    _run_both(q)


def test_overflow_rows_counted():
    # cities beyond the planned max(batch_stat) domain should land in
    # overflow identically: shrink the stat by hand
    import jax.numpy as jnp

    plan = demo.demo_plan(demo.DEMO_QUERY)
    cols_np, columns = _columns(plan, n_cities=60)
    dp = plan_dense(plan, {(0, plan.main_schema.column_id("city_id")): (0, 20)})
    assert dp is not None
    spec = FD.plan_fused(plan, dp)
    fused = FD.make_fused_dense_kernel(plan, N_ROWS, dp, spec,
                                       interpret=True)
    ref = K.make_dense_agg_kernel(plan, N_ROWS, dp)
    args = (columns, (), np.int32(N_ROWS), np.int64(0))
    fo = int(K.run_dense_kernel(fused, plan, dp.n_slots, *args)[3])
    ro = int(K.run_dense_kernel(ref, plan, dp.n_slots, *args)[3])
    assert fo == ro and fo > 0


def test_ineligible_plans_fall_back():
    # HLL / joins / calendar ops must not plan fused
    plan = demo.demo_plan(demo.DEMO_QUERY)
    q = dict(demo.DEMO_QUERY)
    q["dimensions"] = [
        {"sqlExpression": "request_at", "timeBucketizer": "month"},
        {"sqlExpression": "city_id"},
    ]
    mplan = demo.demo_plan(q)
    dp = plan_dense(mplan, {(0, plan.main_schema.column_id("city_id")):
                            (0, 40)})
    if dp is not None:  # month buckets plan as calendar lookups
        assert FD.plan_fused(mplan, dp) is None


def test_uses_fused_on_tpu_only(monkeypatch):
    monkeypatch.setenv("ARES_FUSED", "0")
    assert not FD.use_fused()


def test_split_dot_variant_parity(monkeypatch):
    """ARES_FD_SPLITDOT swaps the stacked 4-channel dot for four
    channel-scaled dots (priced on-chip: ~4% slower, kept as a documented
    alternative — docs/PERFORMANCE.md round 4). Results must be identical
    to the default formulation."""
    monkeypatch.setattr(FD, "_SPLIT_DOT", True)
    _run_both({**demo.DEMO_QUERY})
    monkeypatch.setattr(FD, "_SPLIT_DOT", False)
