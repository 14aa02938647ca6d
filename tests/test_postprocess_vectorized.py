"""Differential tests for the vectorized columnar postprocess path.

The vectorized formatters (postprocess.format_float32_column /
format_dim_column / measure_column) must be byte-identical to the
per-value parity surface (format_dimension / format_float32, which mirror
the reference's ReadDimension + strconv.FormatFloat 'g' semantics —
query/common/dimval.go). These tests sweep random + adversarial values
through both paths.
"""

import numpy as np
import pytest

from aresdb_tpu.query.postprocess import (format_float32, format_float32_column)


def _edge_floats():
    return np.array([
        0.0, -0.0, 1.0, -1.0, 0.1, -2.25, 0.5, 1.5,
        1e-4, 9.99e-5, 1e-5, 1.17549435e-38, 1.4e-45, -1.4e-45,
        1e15, 1e16 - 1, 1e16, 1.5e16, 1e17, 1e20, 9.99e20, 1e21, 1.23e21,
        3.4028235e38, -3.4028235e38,
        np.nan, np.inf, -np.inf,
        123456.78, -99999.984, 7.0, 100.0, 1024.0, 12345670.0,
    ], dtype=np.float32)


def test_format_float32_column_edges():
    vals = _edge_floats()
    got = format_float32_column(vals)
    want = [format_float32(v) for v in vals]
    assert list(got) == want


def test_format_float32_column_random():
    rng = np.random.RandomState(7)
    # mixed magnitudes including the numpy/Go style-divergence bands
    parts = [
        rng.rand(2000).astype(np.float32) * 1000,
        (rng.rand(500) * 1e21).astype(np.float32),
        (rng.rand(500) * 1e-3).astype(np.float32),
        rng.randint(-10**6, 10**6, 1000).astype(np.float32),
        np.float32(10) ** rng.uniform(-44, 38, 1000).astype(np.float32),
    ]
    vals = np.concatenate(parts)
    got = format_float32_column(vals)
    want = [format_float32(v) for v in vals]
    assert list(got) == want


def test_format_dim_column_hicard_float_matches_unique_path():
    """The >4096-group vectorized branch must agree with the per-unique
    format_dimension branch."""
    from aresdb_tpu.query.compiler import DimensionPlan
    from aresdb_tpu.query import postprocess as PP
    from aresdb_tpu.common import data_types as mdt

    class _Plan:
        geo = None
        data_only = False

    rng = np.random.RandomState(3)
    values = (rng.rand(6000).astype(np.float32) * 1e6).astype(np.float32)
    valids = rng.rand(6000) > 0.1
    dim = DimensionPlan(expr=None, raw=None, data_type=mdt.Float32)
    plan = _Plan()
    plan.dimensions = [dim]
    fast = PP.format_dim_column(plan, 0, values, valids)
    slow = [PP.format_dimension(v, bool(b), dim, None)
            for v, b in zip(values.tolist(), valids)]
    assert fast == slow


def test_measure_column_matches_scalar():
    from aresdb_tpu.query import postprocess as PP

    class _M:
        pass

    class _Plan:
        pass

    for agg in ("sum", "avg", "min", "max", "count"):
        m = _M()
        m.agg = agg
        plan = _Plan()
        plan.measure = m
        aggs = np.array([0.0, 1.5, -3.25, 1e12, 7.0], np.float64)
        cnts = np.array([0, 3, 1, 7, 2], np.int64)
        got = PP.measure_column(plan, aggs, cnts)
        want = [PP._measure_value(plan, a, c)
                for a, c in zip(aggs, cnts.tolist())]
        assert got == want
