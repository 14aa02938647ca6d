import sys, time, tempfile
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np, requests
from aresdb_tpu.client import Connector
from aresdb_tpu.api.server import ApiServer
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.scheduler import Scheduler

DAY = 86400
BASE = 1_600_000_000 - (1_600_000_000 % DAY)
root = tempfile.mkdtemp()
ms = MemStore(DiskMetaStore(root), LocalDiskStore(root))
ms.fetch_schema()
srv = ApiServer(ms, Scheduler(ms), port=0)
port = srv.start_background()
conn = Connector("localhost", port)
conn.create_table({
    "name": "trips", "columns": [
        {"name": "request_at", "type": "Uint32"},
        {"name": "id", "type": "Uint32"},
        {"name": "city_id", "type": "Uint16"},
        {"name": "fare", "type": "Float32"},
        {"name": "pickup", "type": "GeoPoint"}],
    "primaryKeyColumns": [1], "archivingSortColumns": [2],
    "isFactTable": True,
    "config": {"batchSize": 1 << 20, "recordRetentionInDays": 0}})
conn.create_table({
    "name": "zones", "columns": [
        {"name": "id", "type": "Uint16"}, {"name": "shape", "type": "GeoShape"}],
    "primaryKeyColumns": [0], "isFactTable": False,
    "config": {"batchSize": 64}})
# two square geo zones
conn.insert("zones", ["id", "shape"], [
    (1, "POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))"),
    (2, "POLYGON((20 20, 20 30, 30 30, 30 20, 20 20))")])
n = 1 << 21
rng = np.random.RandomState(4)
lat = (rng.rand(n) * 50).astype(np.float32)
lng = (rng.rand(n) * 50).astype(np.float32)
city = rng.randint(0, 50, n).astype(np.uint16)
fare = (rng.rand(n) * 10).astype(np.float32)
ts = (BASE + rng.randint(0, DAY, n)).astype(np.uint32)
pickup = np.stack([lat, lng], axis=1).astype(np.float32)
conn.insert_columns("trips", {
    "request_at": ts, "id": np.arange(n, dtype=np.uint32),
    "city_id": city, "fare": fare, "pickup": pickup})
r = requests.post(f"http://localhost:{port}/dbg/trips/0/archiving", data=b"{}")
print("archived:", r.json()["result"]["rowsArchived"], flush=True)

# prefiltered archive query
q = {"table": "trips", "measures": [{"sqlExpression": "sum(fare)"}],
     "rowFilters": ["city_id = 7"], "now": BASE + 2 * DAY}
for it in range(2):
    t0 = time.perf_counter()
    r = requests.post(f"http://localhost:{port}/query/aql",
                      json={"queries": [q], "verbose": True}).json()
    dt = (time.perf_counter() - t0) * 1e3
got = r["results"][0][""]
exp = float(fare[city == 7].astype(np.float64).sum())
skipped = r["context"][0].get("prefilterRowsSkipped")
print(f"archive prefilter query: {dt:.0f}ms warm, match={abs(got-exp)<0.5} "
      f"skipped={skipped}/{n}", flush=True)

# geo intersect query against the archived geo column
qg = {"table": "trips",
      "joins": [{"table": "zones", "alias": "z",
                 "conditions": ["geography_intersects(z.shape, pickup)"]}],
      "measures": [{"sqlExpression": "count(*)"}],
      "dimensions": [{"sqlExpression": "z.id"}],
      "rowFilters": ["z.id IN (1, 2)"],
      "now": BASE + 2 * DAY}
for it in range(2):
    t0 = time.perf_counter()
    rg = requests.post(f"http://localhost:{port}/query/aql",
                       json={"queries": [qg]}).json()
    dtg = (time.perf_counter() - t0) * 1e3
res = rg["results"][0]
in1 = int(((lat > 0) & (lat < 10) & (lng > 0) & (lng < 10)).sum())
in2 = int(((lat > 20) & (lat < 30) & (lng > 20) & (lng < 30)).sum())
print(f"geo query: {dtg:.0f}ms warm, zones={res} expected~({in1},{in2})", flush=True)
ok1 = abs(res.get("1", 0) - in1) <= in1 * 0.001 + 5
ok2 = abs(res.get("2", 0) - in2) <= in2 * 0.001 + 5
assert "NULL" not in res, "geo filter must drop unmatched rows"
print("geo parity:", ok1 and ok2, flush=True)
srv.stop()
