"""Query-level multi-device placement drive (VERDICT-r2 #4 acceptance).

N concurrent single-chip queries through the full API server must be
served on N distinct devices concurrently and reach a multiple of the
serial aggregate throughput, with per-device admission stats visible on
/dbg/devices.

Reference model: query/device_manager.go:56 — each admitted query pins to
ONE device (most-free-first) so independent queries run concurrently on
different chips; this is the opposite of mesh sharding (one query over
ALL chips, parallel/sharded.py, ARES_MESH=1).

Runs on the virtual multi-device CPU backend. XLA CPU executables share
the host's cores, so the measurable ceiling here is min(n_devices,
host_cores) minus GIL-side staging/postprocess overhead — the drive
asserts >=1.5x and prints the observed speedup; on real multi-chip TPU
hosts each device is its own silicon and the same placement logic scales
linearly.
"""

import os

N_DEV = 4
os.environ["JAX_PLATFORMS"] = "cpu"
# single-threaded executables: one query must not saturate all host cores,
# otherwise concurrency across virtual devices has nothing left to use
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={N_DEV} "
    "--xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1 "
    + os.environ.get("XLA_FLAGS", ""))

import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import tempfile
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import requests

from aresdb_tpu.api.server import ApiServer
from aresdb_tpu.client import Connector
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.memstore.scheduler import Scheduler
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore

NOW = 1_600_000_000
N_ROWS = 1 << 23
N_QUERIES = 16


def main():
    assert len(jax.local_devices()) == N_DEV, jax.local_devices()
    root = tempfile.mkdtemp()
    ms = MemStore(DiskMetaStore(root), LocalDiskStore(root))
    ms.fetch_schema()
    srv = ApiServer(ms, Scheduler(ms), port=0)
    port = srv.start_background()
    pool = srv.ctx.device_pool
    assert pool is not None and len(pool.devices) == N_DEV, \
        "ServerContext must build a DevicePool on a multi-device host"
    conn = Connector("localhost", port)
    conn.create_table({
        "name": "trips", "columns": [
            {"name": "ts", "type": "Uint32"}, {"name": "id", "type": "Uint32"},
            {"name": "city_id", "type": "Uint16"},
            {"name": "fare", "type": "Float32"}],
        "primaryKeyColumns": [1], "isFactTable": True,
        "config": {"batchSize": 1 << 21, "recordRetentionInDays": 0}})
    rng = np.random.RandomState(7)
    city = rng.randint(0, 300, N_ROWS).astype(np.uint16)
    fare = (rng.rand(N_ROWS) * 20).astype(np.float32)
    ts = (NOW - rng.randint(0, 3600, N_ROWS)).astype(np.uint32)
    ids = np.arange(N_ROWS, dtype=np.uint32)
    step = 1 << 21  # stay under the HTTP body limit
    for lo in range(0, N_ROWS, step):
        sl = slice(lo, lo + step)
        conn.insert_columns("trips", {"ts": ts[sl], "id": ids[sl],
                                      "city_id": city[sl], "fare": fare[sl]})
    exp = {str(c): float(np.float32(fare[city == c].astype(np.float64).sum()))
           for c in range(300)}

    q = {"table": "trips", "measures": [{"sqlExpression": "sum(fare)"}],
         "dimensions": [{"sqlExpression": "city_id"}], "now": NOW}

    def run_one(_i):
        r = conn.query_aql(q)
        assert not r.get("errors"), r
        res = r["results"][0]
        for c in ("0", "123", "299"):
            assert abs(res[c] - exp[c]) < max(0.05, 2e-5 * abs(exp[c])), \
                (c, res[c], exp[c])
        return r

    # warm every device: compile + stage the batch once per placement
    with ThreadPoolExecutor(max_workers=N_DEV) as ex:
        list(ex.map(run_one, range(2 * N_DEV)))
    served_warm = [d["served"] for d in pool.stats()["devices"]]
    assert all(s > 0 for s in served_warm), served_warm

    t0 = time.perf_counter()
    for i in range(N_QUERIES):
        run_one(i)
    serial_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=N_DEV) as ex:
        list(ex.map(run_one, range(N_QUERIES)))
    conc_s = time.perf_counter() - t0

    dbg = requests.get(f"http://localhost:{port}/dbg/devices",
                       timeout=10).json()
    assert "pool" in dbg, dbg
    st = dbg["pool"]
    assert all(d["running"] == 0 for d in st["devices"]), st
    assert all(d["served"] > 0 for d in st["devices"]), st

    speedup = serial_s / conc_s
    print(f"serial:     {N_QUERIES} queries in {serial_s:.2f}s "
          f"({N_QUERIES / serial_s:.1f} qps)")
    print(f"concurrent: {N_QUERIES} queries in {conc_s:.2f}s "
          f"({N_QUERIES / conc_s:.1f} qps) over {N_DEV} devices")
    print(f"speedup: {speedup:.2f}x (host cores: {os.cpu_count()})")
    print("per-device stats (/dbg/devices pool):")
    for d in st["devices"]:
        print(f"  device {d['id']}: served={d['served']} "
              f"inUse={d['inUseBytes']}")
    assert speedup >= 1.5, f"expected >=1.5x concurrent speedup, got {speedup:.2f}"
    print("DEVICE POOL DRIVE PASS")
    srv.stop()


if __name__ == "__main__":
    main()
