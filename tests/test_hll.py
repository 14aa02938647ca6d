"""HLL distinct count tests (parity: utils/hll.go, query/common/hll.go)."""

import numpy as np
import pytest

from aresdb_tpu.query import hll as H


def go_compute_hll_value(h):
    """Scalar port of utils.ComputeHLLValue for cross-checking."""
    group = h & ((1 << 14) - 1)
    rho = 0
    while True:
        bit = h & (1 << (rho + 14))
        if rho + 14 < 64 and bit == 0:
            rho += 1
        else:
            break
    return rho << 16 | group


def test_hll_value_parity():
    rng = np.random.RandomState(0)
    hashes = rng.randint(0, 2**63, 2000, dtype=np.uint64)
    hashes = np.concatenate([hashes, np.asarray(
        [0, 1, 1 << 14, (1 << 14) - 1, 2**64 - 1], dtype=np.uint64)])
    ours = H.hll_value_from_hash(hashes)
    ref = np.asarray([go_compute_hll_value(int(h)) for h in hashes],
                     np.uint32)
    assert (ours == ref).all()


def test_estimate_small_exact():
    """Linear-counting regime: small cardinalities are near exact."""
    rng = np.random.RandomState(1)
    values = rng.randint(0, 2**31, 500, dtype=np.uint32)
    distinct = len(set(values.tolist()))
    hv = H.hll_value_from_hash(H.murmur3_64(values, 4))
    registers = np.zeros(H.HLL_M, np.uint8)
    np.maximum.at(registers, hv & (H.HLL_M - 1),
                  ((hv >> 16) + 1).astype(np.uint8))
    est = H.compute_estimate(registers)
    assert est == pytest.approx(distinct, rel=0.02)


def go_compute(sparse, m=H.HLL_M):
    """Scalar port of the reference HLL.Compute (query/common/hll.go:735)
    over sparse (index, rho) registers, for cross-checking estimates."""
    import math
    non_zero = len(sparse)
    s = sum(1.0 / (1 << rho) for _, rho in sparse) + (m - non_zero)
    alpha = 0.7213 / (1 + 1.079 / m)
    estimate = alpha * m * m / s
    if estimate <= 5.0 * m:
        estimate -= H._estimate_bias(estimate)
    estimate_h = estimate
    if non_zero < m:
        estimate_h = m * math.log(m / (m - non_zero))
    if estimate_h <= H.HLL_THRESHOLD:
        estimate = estimate_h
    return float(int(estimate))


def test_estimate_matches_reference_compute():
    """Estimates must match the reference's own Compute over the STORED
    registers. The write functor adds 1 to the raw trailing-zero count
    ("rho must plus 1", functor.hpp:1364) before HLL.Compute consumes the
    value, so stored rho is the standard 1-based HLL rank — and estimates
    are accurate at every cardinality (~0.5% at 1M)."""
    rng = np.random.RandomState(2)
    n = 200_000
    values = rng.randint(0, 2**60, n, dtype=np.uint64)
    hv = H.hll_value_from_hash(H.murmur3_64(values, 8))
    registers = np.zeros(H.HLL_M, np.uint8)
    np.maximum.at(registers, hv & (H.HLL_M - 1),
                  ((hv >> 16) + 1).astype(np.uint8))
    est = H.compute_estimate(registers)
    sparse = [(int(i), int(registers[i]))
              for i in np.nonzero(registers)[0]]
    assert est == go_compute(sparse)
    distinct = len(np.unique(values))
    assert abs(est - distinct) / distinct < 0.02


def test_sparse_dense_roundtrip():
    rng = np.random.RandomState(3)
    registers = np.zeros(H.HLL_M, np.uint8)
    idx = rng.choice(H.HLL_M, 100, replace=False)
    registers[idx] = rng.randint(1, 40, 100)
    # both forms round-trip the stored registers exactly: stored rho is
    # always >= 1 for a present register (the +1 at write time), so 0
    # unambiguously means empty in the dense form too
    assert (H.decode_registers(H.encode_sparse(registers)) == registers).all()
    assert (H.decode_registers(H.encode_dense(registers)) == registers).all()


def test_merge():
    a = np.zeros(H.HLL_M, np.uint8)
    b = np.zeros(H.HLL_M, np.uint8)
    a[5] = 3
    b[5] = 7
    b[9] = 2
    m = H.merge_registers(a, b)
    assert m[5] == 7 and m[9] == 2


def test_countdistincthll_query():
    """End-to-end countdistincthll through the query service."""
    from tests.test_query_e2e import FakeMemStore, TRIPS_SCHEMA, NOW
    from aresdb_tpu.common import data_types as dt
    from aresdb_tpu.common.upsert_batch import UpsertBatch, UpsertBatchBuilder
    from aresdb_tpu.query.service import QueryService

    store = FakeMemStore()
    trips = store.create(TRIPS_SCHEMA)
    trips.extend_enum("status", ["completed", "canceled"])

    rng = np.random.RandomState(7)
    n = 600
    cities = rng.randint(1, 3, n)  # 2 cities
    uuids = rng.randint(0, 50, n)  # ~50 distinct drivers per city
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint32)
    b.add_column(1, dt.UUID)
    b.add_column(2, dt.Uint16)
    for i in range(n):
        b.add_row()
        b.set_value(i, 0, NOW - 100 - i)
        b.set_value(i, 1, (int(uuids[i]) + (int(cities[i]) << 32), 12345))
        b.set_value(i, 2, int(cities[i]))
    store.get_table_shard("trips").save_upsert_batch(UpsertBatch(b.to_bytes()))

    svc = QueryService(store)
    resp = svc.handle_aql({"queries": [{
        "table": "trips",
        "measures": [{"sqlExpression": "countdistincthll(uuid)"}],
        "dimensions": [{"sqlExpression": "city_id"}],
        "now": NOW,
    }]})
    assert "errors" not in resp, resp.get("errors")
    result = resp["results"][0]
    expected = {}
    for c in (1, 2):
        expected[str(c)] = len({(int(u) + (c << 32), 12345)
                                for u, cc in zip(uuids, cities) if cc == c})
    for c in ("1", "2"):
        assert result[c] == pytest.approx(expected[c], rel=0.03)


def test_client_hll_value_goldens():
    """Exact hash parity with reference client/connector_test.go:312
    computeHLLValue goldens (murmur3 -> reg_id | rho<<16 encoding)."""
    from aresdb_tpu.client.connector import _compute_hll_value
    from aresdb_tpu.common import data_types as dt

    uuid_bytes = bytes(range(16))
    lo = int.from_bytes(uuid_bytes[:8], "little")
    hi = int.from_bytes(uuid_bytes[8:], "little")
    assert _compute_hll_value(dt.UUID, (lo, hi)) == 329736
    assert _compute_hll_value(dt.Uint32, 67305985) == 266211


def test_hll_sort_variants_agree(monkeypatch):
    """ARES_HLL_SORT=packed (single-operand u64 sort with the HLL state
    packed under a rebased key) must match the default 4-operand co-sort
    bit-for-bit. Priced on-chip (docs/PERFORMANCE.md round 4): packed is
    22% SLOWER — the u64 network outweighs the lane savings because the
    HLL batch cost is dominated by the emulated-u64 murmur hash, not the
    sort — so it stays an env-gated documented alternative."""
    import numpy as np

    from aresdb_tpu import demo
    from aresdb_tpu.query import kernels as K

    n = 4096
    q = dict(demo.DEMO_QUERY)
    q["measures"] = [{"sqlExpression": "countdistincthll(uuid)"}]
    plan = demo.demo_plan(q)
    cols_np, _ = demo.demo_columns(plan, n, seed=11)
    import jax.numpy as jnp
    columns = {k: (jnp.asarray(v), jnp.asarray(b))
               for k, (v, b) in cols_np.items()}

    outs = {}
    for variant in ("ops", "packed"):
        monkeypatch.setenv("ARES_HLL_SORT", variant)
        fn = K.make_hll_kernel(plan, n, 512)
        outs[variant] = [np.asarray(x) for x in
                         fn(columns, (), np.int32(n), np.int64(0))[:5]]
    for a, b in zip(outs["ops"], outs["packed"]):
        np.testing.assert_array_equal(a, b)
