"""Query-level multi-device placement (admission.DevicePool).

Reference: query/device_manager.go — FindDevice picks the device with the
most free estimated memory, waits on a condvar otherwise, and the whole
query runs on the chosen device. These tests run on the virtual 8-device
CPU backend (conftest forces JAX_PLATFORMS=cpu with
xla_force_host_platform_device_count=8).
"""

from __future__ import annotations

import threading
import time

import pytest

from aresdb_tpu.query.admission import AdmissionError, DevicePool


def _pool(n=4, budget=1000):
    import jax

    devs = jax.local_devices()[:n]
    assert len(devs) == n, "conftest must provide an 8-device CPU backend"
    return DevicePool(devices=devs, total_bytes=budget, utilization=1.0)


def test_acquire_spreads_under_load():
    pool = _pool(4)
    leases = [pool.acquire(100) for _ in range(4)]
    assert sorted(lease.index for lease in leases) == [0, 1, 2, 3]
    st = pool.stats()
    assert all(d["running"] == 1 for d in st["devices"])
    for lease in leases:
        pool.release(lease.index, lease.nbytes)
    assert all(d["running"] == 0 for d in pool.stats()["devices"])


def test_over_budget_rejected_immediately():
    pool = _pool(2, budget=100)
    with pytest.raises(AdmissionError):
        pool.acquire(101)


def test_waits_for_release_then_proceeds():
    pool = _pool(2, budget=100)
    l1 = pool.acquire(100)
    l2 = pool.acquire(100)  # second device
    got = {}

    def waiter():
        lease = pool.acquire(100, timeout=5)
        got["index"] = lease.index
        pool.release(lease.index, lease.nbytes)

    th = threading.Thread(target=waiter)
    th.start()
    time.sleep(0.05)
    assert pool.stats()["waiting"] == 1
    pool.release(l1.index, l1.nbytes)
    th.join(timeout=5)
    assert got["index"] == l1.index
    pool.release(l2.index, l2.nbytes)


def test_timeout_raises():
    pool = _pool(1, budget=100)
    lease = pool.acquire(100)
    with pytest.raises(AdmissionError):
        pool.acquire(100, timeout=0.1)
    pool.release(lease.index, lease.nbytes)


def test_lease_pins_jax_default_device():
    import jax
    import jax.numpy as jnp

    pool = _pool(3)
    l0 = pool.acquire(10)
    with pool.acquire(10) as lease:  # second-least-loaded => device 1
        x = jnp.asarray([1.0, 2.0])
        assert x.devices() == {lease.device}
        assert lease.device != jax.local_devices()[0] or lease.index == 0
    pool.release(l0.index, l0.nbytes)
    assert all(d["running"] == 0 for d in pool.stats()["devices"])


def test_query_service_places_concurrent_queries_on_distinct_devices(tmp_root):
    """N concurrent queries through QueryService each get a pinned device."""
    from aresdb_tpu.query.service import QueryService
    from tests.test_admission import COUNT_Q, make_store

    ms = make_store(tmp_root, n=500)
    pool = _pool(4, budget=1 << 30)
    svc = QueryService(ms, device_pool=pool, admission_timeout=10)

    n_threads = 4
    barrier = threading.Barrier(n_threads)
    seen = []
    errs = []

    def run_one():
        try:
            barrier.wait(timeout=10)
            resp = svc.handle_aql({"queries": [dict(COUNT_Q)]})
            assert "errors" not in resp, resp
            seen.append(resp)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=run_one) for _ in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errs, errs
    assert len(seen) == n_threads
    for resp in seen:
        assert sum(resp["results"][0].values()) == 500
    st = pool.stats()
    assert st["waiting"] == 0
    assert all(d["running"] == 0 for d in st["devices"])
    assert sum(d["served"] for d in st["devices"]) == n_threads


def test_preferred_device_honored_and_falls_back():
    """?device=N semantics (device_manager.go:193): the preferred chip is
    used when its budget fits, otherwise placement falls back to
    most-free-first instead of failing."""
    pool = _pool(4, budget=1000)
    lease = pool.acquire(100, preferred=2)
    assert lease.index == 2
    # fill device 2 completely; preferring it now falls back elsewhere
    filler = pool.acquire(900, preferred=2)
    assert filler.index == 2
    spill = pool.acquire(100, preferred=2)
    assert spill.index != 2
    # out-of-range preference is ignored, not an error
    wild = pool.acquire(100, preferred=99)
    assert 0 <= wild.index < 4
