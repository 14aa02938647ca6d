import os, signal, subprocess, sys, tempfile, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np, requests

root = tempfile.mkdtemp()
SERVER = f'''
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, "/root/repo")
from aresdb_tpu.api.server import ApiServer
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.scheduler import Scheduler
ms = MemStore(DiskMetaStore({root!r}), LocalDiskStore({root!r}))
ms.fetch_schema()
ms.init_shards()
srv = ApiServer(ms, Scheduler(ms), port=9431)
srv.start_background()
print("READY", flush=True)
import threading; threading.Event().wait()
'''
def start():
    p = subprocess.Popen([sys.executable, "-c", SERVER],
                         stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                         text=True)
    while "READY" not in p.stdout.readline():
        pass
    return p

p = start()
from aresdb_tpu.client import Connector
conn = Connector("localhost", 9431)
conn.create_table({"name": "t", "columns": [
    {"name": "ts", "type": "Uint32"}, {"name": "id", "type": "Uint32"},
    {"name": "v", "type": "Float32"}],
    "primaryKeyColumns": [1], "isFactTable": True,
    "config": {"batchSize": 4096, "recordRetentionInDays": 0}})
NOW = 1_600_000_000
n = 200_000
rng = np.random.RandomState(0)
acked = 0
for off in range(0, n, 20_000):
    conn.insert_columns("t", {
        "ts": (NOW - rng.randint(0, 3600, 20_000)).astype(np.uint32),
        "id": np.arange(off, off + 20_000, dtype=np.uint32),
        "v": np.ones(20_000, np.float32)})
    acked = off + 20_000
# SIGKILL mid-flight (hard crash, no flush hooks)
os.kill(p.pid, signal.SIGKILL)
p.wait()
print(f"killed server after acking {acked} rows")

p2 = start()
r = conn.query_aql({"table": "t", "measures": [{"sqlExpression": "count(*)"}],
                    "now": NOW})
cnt = r["results"][0][""]
print(f"count after crash-recovery: {cnt} (acked {acked})")
assert cnt == float(acked), "LOST ACKED ROWS"
# ingestion continues cleanly after recovery
conn.insert_columns("t", {
    "ts": np.full(1000, NOW - 5, np.uint32),
    "id": np.arange(n, n + 1000, dtype=np.uint32),
    "v": np.ones(1000, np.float32)})
r = conn.query_aql({"table": "t", "measures": [{"sqlExpression": "count(*)"}],
                    "now": NOW})
print("count after post-recovery ingest:", r["results"][0][""])
assert r["results"][0][""] == float(acked + 1000)
os.kill(p2.pid, signal.SIGKILL); p2.wait()
print("crash durability OK")
