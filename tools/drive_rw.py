import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import sys, tempfile, time, threading
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np
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
    "name": "t", "columns": [
        {"name": "ts", "type": "Uint32"}, {"name": "id", "type": "Uint32"},
        {"name": "v", "type": "Float32"}],
    "primaryKeyColumns": [1], "isFactTable": True,
    "config": {"batchSize": 1 << 16, "recordRetentionInDays": 0}})
CHUNK = 1 << 15
stop = threading.Event()
written = [0]
def writer():
    w = Connector("localhost", port)
    rng = np.random.RandomState(1)
    off = 0
    while not stop.is_set() and off < (1 << 21):
        w.insert_columns("t", {
            "ts": (NOW - rng.randint(0, 600, CHUNK)).astype(np.uint32),
            "id": np.arange(off, off + CHUNK, dtype=np.uint32),
            "v": np.ones(CHUNK, np.float32)})
        off += CHUNK
        written[0] = off
wt = threading.Thread(target=writer)
wt.start()
last = -1.0
checks = 0
anomalies = []
q = {"table": "t", "measures": [{"sqlExpression": "count(*)"}], "now": NOW}
while wt.is_alive():
    floor = written[0]          # rows fully acked BEFORE the query
    r = conn.query_aql(q)["results"][0].get("", 0.0)
    cnt = float(r or 0.0)
    if cnt < last or cnt < 0.999 * floor - CHUNK:
        anomalies.append((last, cnt, floor))
    last = max(last, cnt)
    checks += 1
wt.join()
final = conn.query_aql(q)["results"][0][""]
print(f"checks={checks} final_count={final} expected={written[0]} anomalies={anomalies[:3]}")
assert final == float(written[0]) and not anomalies
print("reader/writer consistency OK")
srv.stop()
