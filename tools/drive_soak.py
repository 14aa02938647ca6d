"""Soak drive: concurrent ingest+upserts, queries, and lifecycle jobs.

Runs a full ApiServer and hammers it from four directions at once for
--seconds (default 45): a writer inserting new rows AND re-upserting old
ids with fresh fares, two query threads (count must never regress below
acked-unique-floor; join+filter shapes must never error), and a job
thread cycling archiving/backfill/snapshot through the debug triggers so
rows keep migrating live→archive WHILE updates target both sides.
Ends with exact oracle checks: count(*) == unique acked ids, sum(fare)
== the host-side last-write-wins oracle, and a join-by-city sum.

This is the in-process regression net for the class of bug round 4's
race harness found (archiving losing concurrently-ingested rows —
memstore/archiving.py lost-rows fix) and for backfill upsert routing:
the reference's equivalent coverage is Go -race over
memstore/ingestion_test.go + archiving_test.go; here the invariants are
checked end-to-end through the public HTTP surface.

Usage: python tools/drive_soak.py [--seconds N] [--seed S]
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import argparse  # noqa: E402
import sys  # noqa: E402
import tempfile  # noqa: E402
import threading  # noqa: E402
import time  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np  # noqa: E402
import requests  # noqa: E402

from aresdb_tpu.api.server import ApiServer  # noqa: E402
from aresdb_tpu.client import Connector  # noqa: E402
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore  # noqa: E402
from aresdb_tpu.memstore.memstore import MemStore  # noqa: E402
from aresdb_tpu.memstore.scheduler import Scheduler  # noqa: E402
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("--seconds", type=float, default=45.0)
ap.add_argument("--seed", type=int, default=7)
args = ap.parse_args()

NOW = 1_600_000_000
CHUNK = 4096
STATUSES = ["completed", "canceled", "rejected"]

root = tempfile.mkdtemp()
ms = MemStore(DiskMetaStore(root), LocalDiskStore(root))
ms.fetch_schema()
srv = ApiServer(ms, Scheduler(ms), port=0)
port = srv.start_background()
base = f"http://localhost:{port}"
conn = Connector("localhost", port)
conn.create_table({
    "name": "trips", "columns": [
        {"name": "request_at", "type": "Uint32"},
        {"name": "id", "type": "Uint32"},
        {"name": "city_id", "type": "Uint16"},
        {"name": "status", "type": "SmallEnum"},
        {"name": "fare", "type": "Float32"}],
    "primaryKeyColumns": [1], "isFactTable": True,
    # small batches + short cutoff so archiving has real work every cycle
    "config": {"batchSize": 1 << 12, "recordRetentionInDays": 0,
               "archivingDelayMinutes": 1,
               "archivingIntervalMinutes": 1}})
conn.create_table({
    "name": "cities", "columns": [
        {"name": "id", "type": "Uint16"},
        {"name": "name", "type": "BigEnum"}],
    "primaryKeyColumns": [0], "isFactTable": False})
conn.insert("cities", ["id", "name"],
            [(c, f"city{c}") for c in range(8)])

stop = threading.Event()
errors = []
# last-write-wins oracle under the ack lock: id -> (ts, city, status, fare)
oracle = {}
olock = threading.Lock()
acked_unique = [0]


def writer():
    w = Connector("localhost", port)
    rng = np.random.RandomState(args.seed)
    next_id = 0
    try:
        while not stop.is_set():
            n_new = CHUNK * 3 // 4
            new_ids = np.arange(next_id, next_id + n_new, dtype=np.uint32)
            # re-upsert a random slice of already-acked ids (targets rows
            # that may have been archived mid-soak -> backfill path)
            n_old = CHUNK - n_new
            hi = max(1, next_id)
            old_ids = rng.randint(0, hi, n_old).astype(np.uint32)
            ids = np.concatenate([new_ids, old_ids])
            # each id's event time is a pure function of the id, half
            # recent (stays live) and half 1-2 days old (archives at the
            # next cycle). A fact table identifies an EVENT by (pk, event
            # time): re-upserting an id with a different ts after its
            # original archived is legitimately a second row (the
            # reference behaves identically — the PK only covers
            # unarchived data), so the oracle can only be exact when
            # updates reuse the original ts.
            mix = (ids.astype(np.uint64) * 2654435761) % (1 << 32)
            recent = NOW - (mix % 1800)
            old = NOW - 86_400 - (mix % 86_400)
            ts = np.where(mix % 2 == 0, recent, old).astype(np.uint32)
            city = rng.randint(0, 8, CHUNK).astype(np.uint16)
            status = [STATUSES[i] for i in rng.randint(0, 3, CHUNK)]
            fare = rng.rand(CHUNK).astype(np.float32).round(2)
            rows = list(zip(ts.tolist(), ids.tolist(), city.tolist(),
                            status, fare.tolist()))
            w.insert("trips",
                     ["request_at", "id", "city_id", "status", "fare"],
                     rows)
            with olock:
                # batch-internal order: later rows win (dict update order)
                for r in rows:
                    oracle[r[1]] = r
                acked_unique[0] = len(oracle)
            next_id += n_new
            time.sleep(0.01)
    except Exception as e:  # noqa: BLE001
        errors.append(f"writer: {e!r}")


def querier(name, shape):
    q = Connector("localhost", port)
    last = -1.0
    try:
        while not stop.is_set():
            floor = acked_unique[0]
            resp = q.query_aql(shape)
            if resp.get("errors") and any(resp["errors"]):
                errors.append(f"{name}: {resp['errors']}")
                return
            if name == "count":
                cnt = float(resp["results"][0].get("", 0.0) or 0.0)
                if cnt < last:
                    errors.append(
                        f"count regressed {last} -> {cnt}")
                    return
                # visibility may trail acks by a few live batches while
                # staging catches up (same slack drive_rw.py allows);
                # the END-state check below is exact
                if cnt < floor - 8 * CHUNK:
                    errors.append(
                        f"count {cnt} far below acked floor {floor}")
                    return
                last = max(last, cnt)
            time.sleep(0.002)
    except Exception as e:  # noqa: BLE001
        errors.append(f"{name}: {e!r}")


def jobs():
    cycle = ["archiving", "backfill", "snapshot"]
    i = 0
    try:
        while not stop.is_set():
            job = cycle[i % len(cycle)]
            r = requests.post(f"{base}/dbg/trips/0/{job}", data="{}",
                              timeout=30)
            if r.status_code != 200:
                errors.append(f"job {job}: {r.status_code} {r.text}")
                return
            i += 1
            time.sleep(0.25)
    except Exception as e:  # noqa: BLE001
        errors.append(f"jobs: {e!r}")


WINDOW = {"column": "request_at",
          "from": f"{NOW - 3 * 86_400}", "to": f"{NOW + 60}"}
count_q = {"table": "trips", "now": NOW, "timeFilter": WINDOW,
           "measures": [{"sqlExpression": "count(*)"}]}
join_q = {"table": "trips", "now": NOW, "timeFilter": WINDOW,
          "joins": [{"table": "cities", "alias": "c",
                     "conditions": ["c.id = city_id"]}],
          "dimensions": [{"sqlExpression": "c.name"}],
          "measures": [{"sqlExpression": "sum(fare)",
                        "rowFilters": ["status='completed'"]}]}

threads = [threading.Thread(target=writer),
           threading.Thread(target=querier, args=("count", count_q)),
           threading.Thread(target=querier, args=("join", join_q)),
           threading.Thread(target=jobs)]
t0 = time.time()
for t in threads:
    t.start()
while time.time() - t0 < args.seconds and not errors:
    time.sleep(0.5)
stop.set()
for t in threads:
    t.join(timeout=60)
assert not errors, errors

# drain in-flight lifecycle work, then final exact parity vs the oracle
for job in ("archiving", "backfill", "archiving"):
    requests.post(f"{base}/dbg/trips/0/{job}", data="{}", timeout=120)

final_count = conn.query_aql(count_q)["results"][0][""]
with olock:
    want_count = float(len(oracle))
    want_sum = float(np.float32(sum(np.float32(v[4]) for v in
                                    oracle.values())))
    city_sums = {}
    for v in oracle.values():
        if v[3] == "completed":
            city_sums[f"city{v[2]}"] = float(
                np.float32(city_sums.get(f"city{v[2]}", 0.0)
                           + np.float32(v[4])))
sum_q = {"table": "trips", "now": NOW, "timeFilter": WINDOW,
         "measures": [{"sqlExpression": "sum(fare)"}]}
final_sum = conn.query_aql(sum_q)["results"][0][""]
join_res = conn.query_aql(join_q)["results"][0]

print(f"soak {args.seconds:.0f}s: rows={int(want_count)} "
      f"count={final_count} sum={final_sum:.2f}/{want_sum:.2f}")
assert final_count == want_count, (final_count, want_count)
assert abs(final_sum - want_sum) < max(1.0, 1e-4 * abs(want_sum)), \
    (final_sum, want_sum)
for k, v in city_sums.items():
    got = join_res.get(k, 0.0)
    assert abs(got - v) < max(1.0, 1e-3 * abs(v)), (k, got, v)
print("SOAK OK — count exact, sums within float tolerance, "
      "join-by-city parity")
srv.stop()
