"""Per-stage pricing of the archive query path: run-length vs expand, on
one real chip, quiet box. 8M rows, 2 day batches, sorted by [city,status].

Prints warm stage timings for: runlen sum (row measure), runlen count
(pure runs), expand equivalents (ARES_RUNLEN=0), and the prefilter shape.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common.schema import Table
from aresdb_tpu.common.upsert_batch import UpsertBatch, build_columnar_upsert
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.archiving import Archiver
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore
from aresdb_tpu.query.service import QueryService

DAY = 86400
NOW = 1_600_000_000
BASE = NOW - (NOW % DAY) - 2 * DAY
N = 1 << 23

root = tempfile.mkdtemp()
ms = MemStore(DiskMetaStore(root), LocalDiskStore(root))
ms.create_table(Table.from_json({
    "name": "trips", "columns": [
        {"name": "request_at", "type": "Uint32"},
        {"name": "id", "type": "Uint32"},
        {"name": "city_id", "type": "Uint16"},
        {"name": "status", "type": "SmallEnum"},
        {"name": "fare", "type": "Float32"}],
    "primaryKeyColumns": [1], "archivingSortColumns": [2, 3],
    "isFactTable": True,
    "config": {"batchSize": 1 << 22, "recordRetentionInDays": 0}}))
ms.init_shards()
ms.get_schemas()["trips"].extend_enum(
    "status", ["completed", "canceled", "rejected"])
shard = ms.get_table_shard("trips")
rng = np.random.RandomState(7)
ts = (BASE + rng.randint(0, 2 * DAY, N)).astype(np.uint32)
city = rng.randint(0, 300, N).astype(np.uint16)
status = rng.randint(0, 3, N).astype(np.uint8)
fare = (rng.rand(N) * 50).astype(np.float32)
for off in range(0, N, 1 << 22):
    sl = slice(off, off + (1 << 22))
    shard.save_upsert_batch(UpsertBatch(build_columnar_upsert([
        (0, dt.Uint32, ts[sl], None, 0),
        (1, dt.Uint32, np.arange(sl.start, sl.stop, dtype=np.uint32),
         None, 0),
        (2, dt.Uint16, city[sl], None, 0),
        (3, dt.SmallEnum, status[sl], None, 0),
        (4, dt.Float32, fare[sl], None, 0)], 1 << 22)))
Archiver(shard, ms.metastore, ms.diskstore).archive(BASE + 2 * DAY)
svc = QueryService(ms)

QUERIES = {
    "sum_by_city": {"table": "trips",
                    "measures": [{"sqlExpression": "sum(fare)"}],
                    "dimensions": [{"sqlExpression": "city_id"}]},
    "count_cxs": {"table": "trips",
                  "measures": [{"sqlExpression": "count(*)"}],
                  "dimensions": [{"sqlExpression": "city_id"},
                                 {"sqlExpression": "status"}]},
    "sum_200k": {"table": "trips",
                 "measures": [{"sqlExpression": "sum(fare)"}],
                 "dimensions": [{"sqlExpression": "id % 200000"}]},
}


def prof(tag, name, runs=4):
    q = dict(QUERIES[name])
    q["now"] = NOW
    for i in range(runs):
        t0 = time.perf_counter()
        out = svc.handle_aql({"queries": [q], "verbose": True})
        total = (time.perf_counter() - t0) * 1e3
        assert not out.get("errors"), out.get("errors")
    ctx = out["context"][0]
    stages = {k: round(v * 1e3, 1) for k, v in ctx.items()
              if isinstance(v, float)}
    extra = {k: ctx[k] for k in ("runlenBatches", "runlenRuns") if k in ctx}
    print(f"{tag:28s} warm={total:7.1f}ms {stages} {extra}", flush=True)


for name in QUERIES:
    prof(f"runlen {name}", name)
os.environ["ARES_RUNLEN"] = "0"
for name in QUERIES:
    prof(f"expand {name}", name)
del os.environ["ARES_RUNLEN"]
