"""Drive the framework as a user would: reference 1k_trips dataset + queries.

Loads the reference's own schema JSON, CSV data, and AQL query documents,
pushes them through the public API (MemStore ingestion -> QueryService),
and prints the JSON results. Runs on whatever JAX platform the env selects
(real TPU under axon).
"""
import sys, json, csv, random, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np
from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common.schema import Table, TableSchema
from aresdb_tpu.common.upsert_batch import UpsertBatch, UpsertBatchBuilder
from aresdb_tpu.memstore.table_shard import TableShard
from aresdb_tpu.query.service import QueryService

REF = "/root/reference/examples/1k_trips"
NOW = int(time.time())
random.seed(42)


class Store:
    def __init__(self):
        self.schemas, self.shards = {}, {}

    def create(self, schema_json):
        t = Table.from_json(schema_json)
        ts = TableSchema(t)
        self.schemas[t.name] = ts
        self.shards[(t.name, 0)] = TableShard(ts)
        return ts

    def get_schemas(self):
        return dict(self.schemas)

    def get_table_shard(self, name, sid=0):
        return self.shards[(name, sid)]


def parse_time_placeholder(s):
    # "{1d}" -> random ts in [now-1d, now) (reference examples/utils)
    s = s.strip("{}")
    n, unit = int(s[:-1]), s[-1]
    secs = n * {"d": 86400, "h": 3600, "m": 60}[unit]
    return NOW - secs + random.randint(0, secs - 1)


store = Store()
for name in ("trips", "cities"):
    schema_json = json.load(open(f"{REF}/schema/{name}.json"))
    store.create(schema_json)

# ingest cities
cities = store.schemas["cities"]
rows = list(csv.DictReader(open(f"{REF}/data/cities.csv")))
b = UpsertBatchBuilder()
b.add_column(0, dt.Uint16)
b.add_column(1, dt.BigEnum)
for i, r in enumerate(rows):
    b.add_row()
    b.set_value(i, 0, int(r["id"]))
    b.set_value(i, 1, cities.enum_dicts["name"].get_or_add(r["name"]))
store.get_table_shard("cities").save_upsert_batch(UpsertBatch(b.to_bytes()))
print(f"ingested {len(rows)} cities")

# ingest trips
trips = store.schemas["trips"]
rows = list(csv.DictReader(open(f"{REF}/data/trips.csv")))
b = UpsertBatchBuilder()
col_types = [dt.Uint32, dt.UUID, dt.Uint16, dt.SmallEnum, dt.Float32,
             dt.UUID, dt.Uint32, dt.GeoPoint]
for cid, ct in enumerate(col_types):
    b.add_column(cid, ct)
status_dict = trips.enum_dicts["status"]
for i, r in enumerate(rows):
    b.add_row()
    b.set_value(i, 0, parse_time_placeholder(r["request_at"]))
    b.set_value(i, 1, dt.parse_uuid(r["uuid"]))
    b.set_value(i, 2, int(r["city_id"]))
    b.set_value(i, 3, status_dict.get_or_add(r["status"]))
    b.set_value(i, 4, float(r["fare"]))
    b.set_value(i, 5, dt.parse_uuid(r["driver_uuid"]))
    b.set_value(i, 6, int(r["driver_uuid_hll"]))
    b.set_value(i, 7, dt.parse_geopoint(r["request_point"]))
stats = store.get_table_shard("trips").save_upsert_batch(UpsertBatch(b.to_bytes()))
print(f"ingested trips: inserted={stats.inserted} updated={stats.updated}")

svc = QueryService(store)

# run the reference's own AQL documents
for qfile in ("total_trips.aql", "total_fare.aql"):
    doc = json.load(open(f"{REF}/queries/{qfile}"))
    t0 = time.time()
    resp = svc.handle_aql(doc)
    el = time.time() - t0
    print(f"\n=== {qfile} ({el:.2f}s) ===")
    print(json.dumps(resp, indent=1, default=str)[:900])

# cross-check count vs raw csv
total_completed = sum(1 for r in rows if r["status"] == "completed")
resp = svc.handle_aql({"queries": [{
    "table": "trips",
    "measures": [{"sqlExpression": "count(*)",
                  "rowFilters": ["status='completed'"]}]}]})
got = resp["results"][0][""]
print(f"\ncompleted trips: query={got} csv={total_completed} "
      f"match={got == float(total_completed)}")

# join to cities
resp = svc.handle_aql({"queries": [{
    "table": "trips",
    "joins": [{"table": "cities", "alias": "c", "conditions": ["c.id = city_id"]}],
    "measures": [{"sqlExpression": "sum(fare)"}],
    "dimensions": [{"sqlExpression": "c.name"}]}]})
print("\nsum(fare) by city name:", json.dumps(resp["results"][0])[:400])

# probes
print("\n--- probes ---")
r = svc.handle_aql({"queries": [{"table": "trips",
    "measures": [{"sqlExpression": "sum(nope)"}]}]})
print("unknown column ->", r["errors"][0][:80])
r = svc.handle_aql({"queries": [{"table": "trips",
    "measures": [{"sqlExpression": "count(*)",
                  "rowFilters": ["status='no-such-status'"]}]}]})
print("unknown enum value ->", r["results"][0])
r = svc.handle_aql({"queries": [{"table": "trips",
    "measures": [{"sqlExpression": "count(*)"}],
    "timeFilter": {"column": "request_at", "from": "2001-01-01", "to": "2001-01-02"}}]})
print("empty time range ->", r["results"][0])
r = svc.handle_aql({"queries": [{"table": "trips",
    "measures": [{"sqlExpression": "1"}],
    "dimensions": [{"sqlExpression": "fare"}, {"sqlExpression": "status"}],
    "limit": 3}]})
print("non-agg limit=3 ->", json.dumps(r["results"][0]))
r = svc.handle_aql({"queries": [{"table": "trips", "measures": []}]})
print("no measures ->", r.get("errors"))
