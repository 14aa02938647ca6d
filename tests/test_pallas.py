"""Pallas kernel tests (interpreter mode on CPU — HOST-mode parity)."""

import numpy as np
import pytest


def test_dense_segment_sum_matches_reference():
    import jax.numpy as jnp

    from aresdb_tpu.query.pallas_ops import dense_segment_sum

    rng = np.random.RandomState(1)
    for n, k, c in [(100, 10, 1), (5000, 700, 3), (2048, 513, 2)]:
        slots = rng.randint(-1, k, n).astype(np.int32)
        values = rng.rand(n, c).astype(np.float32)
        out = np.asarray(dense_segment_sum(
            jnp.asarray(slots), jnp.asarray(values), k, interpret=True))
        exp = np.zeros((k, c), np.float32)
        for s, v in zip(slots, values):
            if 0 <= s < k:
                exp[s] += v
        np.testing.assert_allclose(out, exp, atol=1e-3)


def test_dense_kernel_pallas_path_equivalence(monkeypatch):
    """The full dense agg kernel produces identical results via pallas."""
    import jax.numpy as jnp

    from aresdb_tpu import demo
    from aresdb_tpu.query import kernels as K
    from aresdb_tpu.query.dense import plan_dense

    n_rows = 2048
    plan = demo.demo_plan()
    cols_np, _ = demo.demo_columns(plan, n_rows, seed=4, n_cities=40)
    columns = {k: (jnp.asarray(v), jnp.asarray(b))
               for k, (v, b) in cols_np.items()}
    city_key = (0, plan.main_schema.column_id("city_id"))
    dp = plan_dense(plan, {city_key: int(cols_np[city_key][0].max())})

    monkeypatch.setenv("ARES_PALLAS", "0")
    base = K.run_dense_kernel(
        K.make_dense_agg_kernel(plan, n_rows, dp), plan, dp.n_slots,
        columns, (), np.int32(n_rows), np.int64(0))

    monkeypatch.setenv("ARES_PALLAS", "1")
    fast = K.run_dense_kernel(
        K.make_dense_agg_kernel(plan, n_rows, dp), plan, dp.n_slots,
        columns, (), np.int32(n_rows), np.int64(0))

    for a, b in zip(base[:3], fast[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


def test_factored_segment_sum_matches_reference():
    import jax.numpy as jnp

    from aresdb_tpu.query.pallas_ops import factored_segment_sum

    rng = np.random.RandomState(2)
    for n, k, c in [(100, 10, 1), (5000, 700, 3), (2048, 513, 2),
                    (40000, 8192, 3), (1024, 65536, 3)]:
        slots = rng.randint(-1, k, n).astype(np.int32)
        values = rng.rand(n, c).astype(np.float32)
        out = np.asarray(factored_segment_sum(
            jnp.asarray(slots), jnp.asarray(values), k))
        exp = np.zeros((k, c), np.float32)
        for s, v in zip(slots, values):
            if 0 <= s < k:
                exp[s] += v
        np.testing.assert_allclose(out, exp, atol=1e-3)


def test_factored_segment_sum_pallas_matches_reference():
    """Fused VMEM factored reduction (interpret mode) vs host oracle.

    Matches the engine contract: channel 0 is the measure (f32-exact
    HIGHEST passes), channels 1+ carry 0/1 count/presence indicators
    (bf16-exact single-pass)."""
    import jax.numpy as jnp

    from aresdb_tpu.query.pallas_ops import factored_segment_sum_pallas

    rng = np.random.RandomState(3)
    for n, k in [(100, 10), (5000, 700), (4096, 8448), (1500, 130)]:
        slots = rng.randint(-1, k, n).astype(np.int32)
        measure = rng.rand(n).astype(np.float32) * 100.0
        ones = np.ones(n, np.float32)
        present = (rng.rand(n) < 0.8).astype(np.float32)
        values = np.stack([measure, ones, present], axis=1)
        out = np.asarray(factored_segment_sum_pallas(
            jnp.asarray(slots), jnp.asarray(values), k, interpret=True))
        exp = np.zeros((k, 3), np.float32)
        for s, v in zip(slots, values):
            if 0 <= s < k:
                exp[s] += v
        np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-3)


def test_dense_kernel_factored_path_equivalence(monkeypatch):
    """The full dense agg kernel produces identical results via the
    factored MXU reduction."""
    import jax.numpy as jnp

    from aresdb_tpu import demo
    from aresdb_tpu.query import kernels as K
    from aresdb_tpu.query.dense import plan_dense

    n_rows = 2048
    plan = demo.demo_plan()
    cols_np, _ = demo.demo_columns(plan, n_rows, seed=4, n_cities=40)
    columns = {k: (jnp.asarray(v), jnp.asarray(b))
               for k, (v, b) in cols_np.items()}
    city_key = (0, plan.main_schema.column_id("city_id"))
    dp = plan_dense(plan, {city_key: int(cols_np[city_key][0].max())})

    monkeypatch.setenv("ARES_FACTORED", "0")
    monkeypatch.setenv("ARES_PALLAS", "0")
    base = K.run_dense_kernel(
        K.make_dense_agg_kernel(plan, n_rows, dp), plan, dp.n_slots,
        columns, (), np.int32(n_rows), np.int64(0))

    monkeypatch.setenv("ARES_FACTORED", "1")
    fast = K.run_dense_kernel(
        K.make_dense_agg_kernel(plan, n_rows, dp), plan, dp.n_slots,
        columns, (), np.int32(n_rows), np.int64(0))

    for a, b in zip(base[:3], fast[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
