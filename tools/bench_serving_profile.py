"""Per-stage profile of the serving-path stress shapes on the real chip:
the 200k-group sort-path query and the join filter count (VERDICT r4 #1/#4
targets). Prints verbose stage timings + host-side result/JSON cost."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common.schema import Table
from aresdb_tpu.common.upsert_batch import UpsertBatch, build_columnar_upsert
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore
from aresdb_tpu.query.service import QueryService

NOW = 1_600_000_000
import tempfile

root = tempfile.mkdtemp()
ms = MemStore(DiskMetaStore(root), LocalDiskStore(root))
ms.create_table(Table.from_json({
    "name": "trips", "columns": [
        {"name": "request_at", "type": "Uint32"},
        {"name": "id", "type": "Uint32"},
        {"name": "city_id", "type": "Uint16"},
        {"name": "status", "type": "SmallEnum"},
        {"name": "fare", "type": "Float32"}],
    "primaryKeyColumns": [1], "archivingSortColumns": [2],
    "isFactTable": True,
    "config": {"batchSize": 1 << 21, "recordRetentionInDays": 0}}))
ms.create_table(Table.from_json({
    "name": "cities", "columns": [
        {"name": "id", "type": "Uint16"},
        {"name": "population", "type": "Uint32"}],
    "primaryKeyColumns": [0], "isFactTable": False,
    "config": {"batchSize": 1024}}))
ms.init_shards()
ms.get_schemas()["trips"].extend_enum(
    "status", ["completed", "canceled", "rejected"])

n = 1 << 23
rng = np.random.RandomState(1)
ts = (NOW - rng.randint(0, 20 * 3600, n)).astype(np.uint32)
city = rng.randint(0, 300, n).astype(np.uint16)
status = rng.randint(0, 3, n).astype(np.uint8)
fare = (rng.rand(n) * 50).astype(np.float32)
shard = ms.get_table_shard("trips")
t0 = time.perf_counter()
for off in range(0, n, 1 << 21):
    sl = slice(off, off + (1 << 21))
    m = sl.stop - sl.start
    shard.save_upsert_batch(UpsertBatch(build_columnar_upsert([
        (0, dt.Uint32, ts[sl], None, 0),
        (1, dt.Uint32, np.arange(sl.start, sl.stop, dtype=np.uint32), None, 0),
        (2, dt.Uint16, city[sl], None, 0),
        (3, dt.SmallEnum, status[sl], None, 0),
        (4, dt.Float32, fare[sl], None, 0)], m)))
print(f"ingest: {time.perf_counter()-t0:.1f}s", flush=True)
ms.get_table_shard("cities").save_upsert_batch(UpsertBatch(
    build_columnar_upsert([
        (0, dt.Uint16, np.arange(300, dtype=np.uint16), None, 0),
        (1, dt.Uint32, ((np.arange(300) + 1) * 1000).astype(np.uint32),
         None, 0)], 300)))

svc = QueryService(ms)


def prof(name, q, runs=3):
    q = dict(q)
    q["now"] = NOW
    for i in range(runs):
        t0 = time.perf_counter()
        out = svc.handle_aql({"queries": [q], "verbose": True})
        total = (time.perf_counter() - t0) * 1e3
        assert not out.get("errors"), out.get("errors")
        r = out["results"][0]
        t0 = time.perf_counter()
        js = json.dumps({"results": [r]})
        json_ms = (time.perf_counter() - t0) * 1e3
        ctx = out["context"][0]
        stages = {k: round(v * 1e3, 1) for k, v in ctx.items()
                  if isinstance(v, float)}
        print(f"{name} run{i}: total={total:.0f}ms json={json_ms:.0f}ms "
              f"len={len(js)} stages={stages}", flush=True)


prof("200k-group", {
    "table": "trips", "measures": [{"sqlExpression": "sum(fare)"}],
    "dimensions": [{"sqlExpression": "id % 200000"}]})
prof("join-count", {
    "table": "trips",
    "joins": [{"table": "cities", "alias": "c",
               "conditions": ["c.id = city_id"]}],
    "measures": [{"sqlExpression": "count(*)",
                  "rowFilters": ["c.population > 200000"]}]})
prof("join-dim-sum", {
    "table": "trips",
    "joins": [{"table": "cities", "alias": "c",
               "conditions": ["c.id = city_id"]}],
    "measures": [{"sqlExpression": "sum(fare)"}],
    "dimensions": [{"sqlExpression": "city_id"}],
    "rowFilters": ["c.population > 200000"]})
prof("hour-city", {
    "table": "trips", "measures": [{"sqlExpression": "sum(fare)",
                                    "rowFilters": ["status='completed'"]}],
    "dimensions": [{"sqlExpression": "request_at", "timeBucketizer": "hour"},
                   {"sqlExpression": "city_id"}]})
