import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import sys, tempfile, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from concurrent.futures import ThreadPoolExecutor
import numpy as np, requests
from aresdb_tpu.client import Connector
from aresdb_tpu.api.server import ApiServer
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.scheduler import Scheduler

NOW = 1_600_000_000
root = tempfile.mkdtemp()
ms = MemStore(DiskMetaStore(root), LocalDiskStore(root))
ms.fetch_schema()
srv = ApiServer(ms, Scheduler(ms), port=0)
port = srv.start_background()
conn = Connector("localhost", port)
conn.create_table({
    "name": "trips", "columns": [
        {"name": "ts", "type": "Uint32"}, {"name": "id", "type": "Uint32"},
        {"name": "city_id", "type": "Uint16"}, {"name": "fare", "type": "Float32"}],
    "primaryKeyColumns": [1], "isFactTable": True,
    "config": {"batchSize": 1 << 19, "recordRetentionInDays": 0}})
conn.create_table({
    "name": "cities", "columns": [
        {"name": "id", "type": "Uint16"}, {"name": "population", "type": "Uint32"}],
    "primaryKeyColumns": [0], "isFactTable": False, "config": {"batchSize": 512}})
n = 1 << 21
rng = np.random.RandomState(7)
city = rng.randint(0, 100, n).astype(np.uint16)
fare = (rng.rand(n) * 20).astype(np.float32)
conn.insert_columns("trips", {
    "ts": (NOW - rng.randint(0, 3600, n)).astype(np.uint32),
    "id": np.arange(n, dtype=np.uint32), "city_id": city, "fare": fare})
conn.insert("cities", ["id", "population"],
            [(i, (i + 1) * 1000) for i in range(100)])

exp_sum = {str(c): float(np.float32(fare[city == c].astype(np.float64).sum()))
           for c in range(100)}
exp_count = float(n)
exp_join = float((city >= 50).sum())

QUERIES = [
    ({"table": "trips", "measures": [{"sqlExpression": "sum(fare)"}],
      "dimensions": [{"sqlExpression": "city_id"}], "now": NOW},
     lambda r: all(abs(r[str(c)] - exp_sum[str(c)]) < max(0.05, 2e-5 * abs(exp_sum[str(c)]))
                   for c in range(100))),
    ({"table": "trips", "measures": [{"sqlExpression": "count(*)"}], "now": NOW},
     lambda r: r[""] == exp_count),
    ({"table": "trips",
      "joins": [{"table": "cities", "alias": "c", "conditions": ["c.id = city_id"]}],
      "measures": [{"sqlExpression": "count(*)", "rowFilters": ["c.population > 50000"]}],
      "now": NOW},
     lambda r: r[""] == exp_join),
    ({"table": "trips", "measures": [{"sqlExpression": "1"}],
      "dimensions": [{"sqlExpression": "fare"}], "limit": 10, "now": NOW},
     lambda r: len(r["matrixData"]) == 10),
    ({"table": "trips", "measures": [{"sqlExpression": "countdistincthll(id)"}],
      "now": NOW},
     lambda r: abs(r[""] - n) / n < 0.02),
]

# warm each shape once
for q, check in QUERIES:
    r = conn.query_aql(q)["results"][0]
    assert check(r), ("WARM FAIL", q, str(r)[:200])

errors = []
def worker(wid):
    local = Connector("localhost", port)
    rng2 = np.random.RandomState(wid)
    for i in range(20):
        q, check = QUERIES[rng2.randint(len(QUERIES))]
        try:
            r = local.query_aql(q)
            if r.get("errors") and r["errors"][0]:
                errors.append((wid, i, r["errors"]))
            elif not check(r["results"][0]):
                errors.append((wid, i, "wrong result", str(r["results"][0])[:150]))
        except Exception as e:
            errors.append((wid, i, repr(e)))

t0 = time.perf_counter()
with ThreadPoolExecutor(max_workers=8) as pool:
    list(pool.map(worker, range(8)))
el = time.perf_counter() - t0
print(f"160 concurrent queries in {el:.1f}s ({160/el:.0f} qps), errors: {len(errors)}")
for e in errors[:5]:
    print("ERR:", e)
assert not errors
print("concurrency drive OK")
srv.stop()
