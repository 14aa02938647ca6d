"""Race-detection harness (SURVEY §5: the `-race` equivalent).

Two halves, mirroring what Go's detector gives the reference:
- lock-order analysis (utils/racetool.LockGraph): every acquisition made
  with other locks held records an order edge; cycles = potential
  deadlocks, flagged even when the run didn't interleave into one.
- schedule chaos: a concurrent ingest/archive/backfill/query/snapshot
  storm under a 10^3x smaller switch interval + seeded preemption at lock
  acquisition, with exact-result invariants. Races surface as wrong
  counts, lost rows, or exceptions.

Reference CI parity: memstore/archiving_test.go & co run under
`go test -race`; this suite is the rebuild's analogue.
"""

from __future__ import annotations

import threading
import time

import numpy as np
import pytest

from aresdb_tpu.utils import racetool

DAY = 86400
BASE_T = 1_600_000_000 - (1_600_000_000 % DAY)
NOW = BASE_T + 3 * DAY


# ---------------------------------------------------------------------------
# detector self-tests
# ---------------------------------------------------------------------------

def test_lock_order_inversion_detected():
    racetool.reset()
    with racetool.instrument():
        a = threading.Lock()
        b = threading.Lock()

    def t1():
        with a:
            with b:
                pass

    def t2():
        with b:
            with a:
                pass

    # run sequentially — the detector works on ORDER EDGES, not on an
    # actual interleaved deadlock (that's the point: one pass learns it)
    th1 = threading.Thread(target=t1)
    th1.start()
    th1.join()
    th2 = threading.Thread(target=t2)
    th2.start()
    th2.join()
    with pytest.raises(AssertionError, match="potential deadlock"):
        racetool.check()
    racetool.reset()


def test_consistent_order_passes():
    racetool.reset()
    with racetool.instrument():
        a = threading.Lock()
        b = threading.Lock()
    for _ in range(3):
        with a:
            with b:
                pass
    racetool.check()  # no cycle
    racetool.reset()


def test_condition_compatible_with_instrumented_lock():
    racetool.reset()
    with racetool.instrument():
        lk = threading.RLock()
    cond = threading.Condition(lk)
    hit = []

    def waiter():
        with cond:
            cond.wait(timeout=5)
            hit.append(1)

    t = threading.Thread(target=waiter)
    t.start()
    time.sleep(0.1)
    with cond:
        cond.notify_all()
    t.join(timeout=5)
    assert hit == [1]
    racetool.reset()


# ---------------------------------------------------------------------------
# the storm: full storage lifecycle under adversarial scheduling, with the
# lock graph recording every acquisition order the system exhibits
# ---------------------------------------------------------------------------

SCHEMA = {
    "name": "trips",
    "columns": [
        {"name": "ts", "type": "Uint32"},
        {"name": "id", "type": "Uint32"},
        {"name": "fare", "type": "Float32"},
    ],
    "primaryKeyColumns": [1],
    "archivingSortColumns": [0],
    "isFactTable": True,
    "config": {"batchSize": 256, "recordRetentionInDays": 0},
}


def _mk_batch(ids, ts, fares):
    from aresdb_tpu.common import data_types as dt
    from aresdb_tpu.common.upsert_batch import (UpsertBatch,
                                                build_columnar_upsert)

    n = len(ids)
    buf = build_columnar_upsert([
        (0, dt.Uint32, np.asarray(ts, np.uint32), None, 0),
        (1, dt.Uint32, np.asarray(ids, np.uint32), None, 0),
        (2, dt.Float32, np.asarray(fares, np.float32), None, 0),
    ], n)
    return UpsertBatch(buf)


@pytest.mark.parametrize("seed", [0, 1])
def test_lifecycle_storm_under_chaos(seed, tmp_path):
    """Ingest / archive / backfill / snapshot-read / query storm: exact
    final count, monotone reader counts, zero exceptions, and no
    lock-order cycles anywhere in the storage engine."""
    racetool.reset()
    with racetool.instrument():
        from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
        from aresdb_tpu.memstore.archiving import Archiver
        from aresdb_tpu.memstore.memstore import MemStore
        from aresdb_tpu.metastore.disk_metastore import DiskMetaStore
        from aresdb_tpu.common.schema import Table
        from aresdb_tpu.query.service import QueryService

        ms = MemStore(DiskMetaStore(str(tmp_path)),
                      LocalDiskStore(str(tmp_path)))
        ms.create_table(Table.from_json(SCHEMA))
        ms.init_shards()
    shard = ms.get_table_shard("trips")
    svc = QueryService(ms)
    arch = Archiver(shard, ms.metastore, ms.diskstore)

    rng = np.random.RandomState(100 + seed)
    stop = threading.Event()
    errors: list = []
    counts: list = []
    N_ROUNDS, CHUNK = 12, 200
    total_rows = N_ROUNDS * CHUNK

    def ingester():
        try:
            for r in range(N_ROUNDS):
                ids = np.arange(r * CHUNK, (r + 1) * CHUNK)
                ts = BASE_T + rng.randint(0, 2 * DAY, CHUNK)
                shard.save_upsert_batch(
                    _mk_batch(ids, ts, rng.rand(CHUNK)))
        except Exception as e:  # noqa: BLE001
            errors.append(("ingest", e))

    def archiver():
        try:
            for i in range(4):
                arch.archive(BASE_T + DAY // 2 * (i + 1))
                time.sleep(0.01)
            arch.backfill()
        except Exception as e:  # noqa: BLE001
            errors.append(("archive", e))

    def reader():
        try:
            while not stop.is_set():
                resp = svc.handle_aql({"queries": [{
                    "table": "trips",
                    "measures": [{"sqlExpression": "count(*)"}],
                    "now": NOW}]})
                if "errors" in resp:
                    errors.append(("query", resp["errors"]))
                    return
                counts.append(sum(resp["results"][0].values() or [0.0]))
        except Exception as e:  # noqa: BLE001
            errors.append(("reader", e))

    with racetool.chaos(seed=seed, p_sleep=0.02, max_sleep=5e-5):
        threads = [threading.Thread(target=f, name=n)
                   for n, f in [("ingest", ingester), ("arch", archiver),
                                ("read", reader)]]
        for t in threads:
            t.start()
        threads[0].join(timeout=120)
        threads[1].join(timeout=120)
        stop.set()
        threads[2].join(timeout=120)

    assert not errors, errors
    # reader counts never exceed the true total and end exact
    assert all(c <= total_rows for c in counts), max(counts)
    # rows ingested below the moving cutoff after the archiver's last
    # round wait in the backfill queue — apply them before the exactness
    # check (the scheduler's backfill job does this in serving)
    arch.backfill()
    final = svc.handle_aql({"queries": [{
        "table": "trips", "measures": [{"sqlExpression": "count(*)"}],
        "now": NOW}]})
    assert sum(final["results"][0].values()) == total_rows
    # no lock-order inversion anywhere the storm touched
    racetool.check()
    racetool.reset()
