import sys, time, tempfile, json
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np, requests
from aresdb_tpu.api.server import ApiServer
from aresdb_tpu.client import Connector
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.memstore.scheduler import Scheduler
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore

NOW = 1_600_000_000
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
        {"name": "status", "type": "SmallEnum"},
        {"name": "fare", "type": "Float32"}],
    "primaryKeyColumns": [1], "archivingSortColumns": [2],
    "isFactTable": True,
    "config": {"batchSize": 1 << 21, "recordRetentionInDays": 0}})
conn.create_table({
    "name": "cities", "columns": [
        {"name": "id", "type": "Uint16"}, {"name": "population", "type": "Uint32"}],
    "primaryKeyColumns": [0], "isFactTable": False,
    "config": {"batchSize": 1024}})

requests.post(
    f"http://localhost:{port}/schema/tables/trips/columns/status/enum-cases",
    json={"enumCases": ["completed", "canceled", "rejected"]})
n = 1 << 23
rng = np.random.RandomState(1)
ts = (NOW - rng.randint(0, 20 * 3600, n)).astype(np.uint32)
city = rng.randint(0, 300, n).astype(np.uint16)
status = rng.randint(0, 3, n).astype(np.uint8)
fare = (rng.rand(n) * 50).astype(np.float32)
fare_valid = rng.rand(n) > 0.05
t0 = time.perf_counter()


def _send(off):
    sl = slice(off, off + (1 << 21))
    conn.insert_columns("trips", {
        "request_at": ts[sl],
        "id": np.arange(off, off + (1 << 21), dtype=np.uint32),
        "city_id": city[sl], "status": status[sl], "fare": fare[sl]},
        validity={"fare": fare_valid[sl]})


# two concurrent producers: client wire-build + HTTP transfer of batch
# i+1 overlap the server's WAL+classify+write of batch i (the shard
# writer lock serializes applies; the pipeline hides everything else)
from concurrent.futures import ThreadPoolExecutor

with ThreadPoolExecutor(2) as _ex:
    list(_ex.map(_send, range(0, n, 1 << 21)))
ingest_rows_per_sec = round(n / (time.perf_counter() - t0))
print(f"ingest {n} rows: {time.perf_counter()-t0:.1f}s "
      f"({ingest_rows_per_sec/1e6:.2f}M rows/s over HTTP, "
      f"2 producers)", flush=True)
conn.insert("cities", ["id", "population"],
            [(i, (i + 1) * 1000) for i in range(300)])

status_names = np.array(["completed", "canceled", "rejected"])[status]
ok = fare_valid & (status == 0)
def timed(q, sql=False):
    t0 = time.perf_counter()
    r = (conn.query_sql(q) if sql else conn.query_aql(q))
    dt = (time.perf_counter() - t0) * 1e3
    return r["results"][0], dt

# warm + timed runs of a battery
battery = []
q1 = {"table": "trips", "measures": [{"sqlExpression": "sum(fare)",
      "rowFilters": ["status='completed'"]}],
      "dimensions": [{"sqlExpression": "request_at", "timeBucketizer": "hour"},
                     {"sqlExpression": "city_id"}], "now": NOW}
exp1 = float(fare[ok].astype(np.float64).sum())
r, cold = timed(q1); r, warm = timed(q1)
got1 = sum(float(v) for d in r.values() for v in d.values())
battery.append(("sum hour×city (14.4k groups)", cold, warm,
                abs(got1 - exp1) / exp1 < 1e-4))

q2 = {"table": "trips", "measures": [{"sqlExpression": "avg(fare)"}],
      "dimensions": [{"sqlExpression": "status"}], "now": NOW}
r, cold = timed(q2); r, warm = timed(q2)
exp_avg = float(fare[fare_valid & (status == 1)].mean())
battery.append(("avg by status", cold, warm,
                abs(r["canceled"] - exp_avg) < 1e-2))

q3 = {"table": "trips", "measures": [{"sqlExpression": "countdistincthll(id)"}],
      "now": NOW}
r, cold = timed(q3); r, warm = timed(q3)
battery.append(("hll distinct ids (8.4M)", cold, warm,
                abs(r[""] - n) / n < 0.05))

q3b = {"table": "trips",
       "measures": [{"sqlExpression": "countdistincthll(id)"}],
       "dimensions": [{"sqlExpression": "city_id"}], "now": NOW}
r, cold = timed(q3b); r, warm = timed(q3b)
exp_per_city = np.bincount(city, minlength=300)
ok3b = (len(r) >= 290 and all(
    abs(v - exp_per_city[int(c)]) / max(exp_per_city[int(c)], 1) < 0.1
    for c, v in list(r.items())[:50]))
battery.append(("hll by city (300 groups)", cold, warm, ok3b))

q4 = {"table": "trips",
      "joins": [{"table": "cities", "alias": "c",
                 "conditions": ["c.id = city_id"]}],
      "measures": [{"sqlExpression": "count(*)",
                    "rowFilters": ["c.population > 200000"]}], "now": NOW}
r, cold = timed(q4); r, warm = timed(q4)
exp4 = int((city >= 200).sum())
battery.append(("join filter count", cold, warm, r[""] == float(exp4)))

q5 = {"table": "trips", "measures": [{"sqlExpression": "1"}],
      "dimensions": [{"sqlExpression": "fare"}, {"sqlExpression": "city_id"}],
      "rowFilters": ["status='rejected'"], "limit": 50, "now": NOW}
r, cold = timed(q5); r, warm = timed(q5)
battery.append(("non-agg limit 50", cold, warm,
                len(r["matrixData"]) == 50))

r, cold = timed("SELECT count(*) FROM trips WHERE fare > 25 AND "
                f"aql_now(request_at, {NOW})", sql=True)
r, warm = timed("SELECT count(*) FROM trips WHERE fare > 25 AND "
                f"aql_now(request_at, {NOW})", sql=True)
exp6 = int((fare_valid & (fare > 25)).sum())
battery.append(("sql count fare>25", cold, warm, r[""] == float(exp6)))

# --- the round-3 outage class: NO-DIMS aggregates (plan_fused returns None,
# the XLA dense kernel must serve them on the chip). Both AQL and SQL forms.
q7 = {"table": "trips", "measures": [{"sqlExpression": "sum(fare)",
      "rowFilters": ["status='completed'"]}], "now": NOW}
r, cold = timed(q7); r, warm = timed(q7)
battery.append(("no-dims sum (XLA fallback)", cold, warm,
                abs(float(r[""]) - exp1) / exp1 < 1e-4))
r, cold = timed("SELECT sum(fare) FROM trips WHERE "
                f"aql_now(request_at, {NOW})", sql=True)
r, warm = timed("SELECT sum(fare) FROM trips WHERE "
                f"aql_now(request_at, {NOW})", sql=True)
exp7b = float(fare[fare_valid].astype(np.float64).sum())
battery.append(("no-dims sql sum", cold, warm,
                abs(float(r[""]) - exp7b) / exp7b < 1e-4))

# --- one query per fused-eligibility branch (plan_fused frontier):
# count(*) accumulator branch
q8 = {"table": "trips", "measures": [{"sqlExpression": "count(*)"}],
      "dimensions": [{"sqlExpression": "city_id"}], "now": NOW}
r, cold = timed(q8); r, warm = timed(q8)
exp8 = np.bincount(city, minlength=300)
battery.append(("fused count by city", cold, warm,
                all(float(r[str(c)]) == float(exp8[c])
                    for c in range(0, 300, 37))))
# numeric bucketizer branch (__numeric_bucket with bucket_width)
q9 = {"table": "trips", "measures": [{"sqlExpression": "sum(fare)"}],
      "dimensions": [{"sqlExpression": "fare",
                      "numericBucketizer": {"bucketWidth": 5.0}}], "now": NOW}
r, cold = timed(q9); r, warm = timed(q9)
exp9 = float(fare[fare_valid & (fare >= 25) & (fare < 30)]
             .astype(np.float64).sum())
def _fkey(d, want):
    for k in d:
        try:
            if abs(float(k) - want) < 1e-6:
                return k
        except (TypeError, ValueError):
            pass
    raise KeyError(want)
battery.append(("fused numeric-bucket sum", cold, warm,
                abs(float(r[_fkey(r, 25.0)]) - exp9) / exp9 < 1e-3))
# case-when + IN-list eval branch
q10 = {"table": "trips", "measures": [{
       "sqlExpression": "sum(case when status='completed' then fare else 0 end)",
       "rowFilters": ["status in ('completed', 'canceled')"]}],
       "dimensions": [{"sqlExpression": "city_id"}], "now": NOW}
r, cold = timed(q10); r, warm = timed(q10)
got10 = sum(float(v) for v in r.values())
battery.append(("fused case+in sum by city", cold, warm,
                abs(got10 - exp1) / exp1 < 1e-4))
# calendar bucketizer -> ineligible, XLA dense path WITH dims on chip
q11 = {"table": "trips", "measures": [{"sqlExpression": "sum(fare)"}],
       "dimensions": [{"sqlExpression": "request_at",
                       "timeBucketizer": "month"},
                      {"sqlExpression": "city_id"}], "now": NOW}
r, cold = timed(q11); r, warm = timed(q11)
got11 = sum(float(v) for d in r.values() for v in d.values())
battery.append(("calendar dims (XLA path)", cold, warm,
                abs(got11 - exp7b) / exp7b < 1e-4))

# --- the serving-path stress shape: 200k-group sort-path aggregation.
# Round 4 served this in ~3.8s (host merge of 4x200k partial groups +
# python JSON); the device-resident merge + columnar postprocess target
# is <=1s warm (VERDICT r4 #1).
q12 = {"table": "trips", "measures": [{"sqlExpression": "sum(fare)"}],
       "dimensions": [{"sqlExpression": "id % 200000"}], "now": NOW}
r, cold = timed(q12); r, warm = timed(q12)
key_mod = np.arange(n, dtype=np.int64) % 200000
exp12 = np.zeros(200000, np.float64)
np.add.at(exp12, key_mod[fare_valid], fare[fare_valid].astype(np.float64))
ok12 = len(r) == 200000 and all(
    abs(float(r[str(k)]) - exp12[k]) / max(exp12[k], 1e-9) < 1e-4
    for k in range(0, 200000, 9973))
battery.append(("200k-group sum (sort path)", cold, warm, ok12))

# --- storage leg (VERDICT r4 #7): archived mode-3 scans (run-length
# aggregation + prefilter entry search), the geo join, and an array query
# run on the SAME real chip and land in the same battery JSON.
import os as _os

conn.create_table({
    "name": "atrips", "columns": [
        {"name": "request_at", "type": "Uint32"},
        {"name": "id", "type": "Uint32"},
        {"name": "city_id", "type": "Uint16"},
        {"name": "status", "type": "SmallEnum"},
        {"name": "fare", "type": "Float32"},
        {"name": "pickup", "type": "GeoPoint"}],
    "primaryKeyColumns": [1], "archivingSortColumns": [2, 3],
    "isFactTable": True,
    "config": {"batchSize": 1 << 21, "recordRetentionInDays": 0}})
requests.post(
    f"http://localhost:{port}/schema/tables/atrips/columns/status/enum-cases",
    json={"enumCases": ["completed", "canceled", "rejected"]})
conn.create_table({
    "name": "zones", "columns": [
        {"name": "id", "type": "Uint16"},
        {"name": "shape", "type": "GeoShape"}],
    "primaryKeyColumns": [0], "isFactTable": False,
    "config": {"batchSize": 64}})
conn.insert("zones", ["id", "shape"], [
    (1, "POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))"),
    (2, "POLYGON((20 20, 20 30, 30 30, 30 20, 20 20))")])

DAY = 86400
BASE = NOW - (NOW % DAY) - DAY
n2 = 1 << 22
rng2 = np.random.RandomState(9)
ats = (BASE + rng2.randint(0, DAY, n2)).astype(np.uint32)
acity = rng2.randint(0, 300, n2).astype(np.uint16)
astatus = rng2.randint(0, 3, n2).astype(np.uint8)
afare = (rng2.rand(n2) * 50).astype(np.float32)
alat = (rng2.rand(n2) * 50).astype(np.float32)
alng = (rng2.rand(n2) * 50).astype(np.float32)
for off in range(0, n2, 1 << 21):
    sl = slice(off, off + (1 << 21))
    conn.insert_columns("atrips", {
        "request_at": ats[sl],
        "id": np.arange(sl.start, sl.stop, dtype=np.uint32),
        "city_id": acity[sl], "status": astatus[sl], "fare": afare[sl],
        "pickup": np.stack([alat[sl], alng[sl]], axis=1)})
r = requests.post(f"http://localhost:{port}/dbg/atrips/0/archiving",
                  data=b"{}")
print("archived:", r.json()["result"]["rowsArchived"], flush=True)

qa = {"table": "atrips", "measures": [{"sqlExpression": "sum(fare)"}],
      "dimensions": [{"sqlExpression": "city_id"}], "now": NOW}
expa = np.zeros(300, np.float64)
np.add.at(expa, acity, afare.astype(np.float64))
r, cold = timed(qa); r, warm_exp = timed(qa)
oka = all(abs(float(r[str(c)]) - expa[c]) < max(1e-3, expa[c] * 1e-5)
          for c in range(0, 300, 17))
battery.append(("archive sum by sort col (expand)", cold, warm_exp, oka))
# the opt-in run-length path, priced against the default every round
_os.environ["ARES_RUNLEN"] = "1"
try:
    r, cold_rl = timed(qa); r, warm_rl = timed(qa)
finally:
    del _os.environ["ARES_RUNLEN"]
okr = all(abs(float(r[str(c)]) - expa[c]) < max(1e-3, expa[c] * 1e-5)
          for c in range(0, 300, 17))
runlen_speedup = warm_exp / max(warm_rl, 1e-9)
battery.append(("archive sum RUNLEN (opt-in)", cold_rl, warm_rl, okr))
print(f"runlen vs expand (warm): {runlen_speedup:.2f}x "
      f"({warm_exp:.0f}ms default-expand vs {warm_rl:.0f}ms runlen)",
      flush=True)

qb = {"table": "atrips", "measures": [{"sqlExpression": "count(*)"}],
      "dimensions": [{"sqlExpression": "city_id"},
                     {"sqlExpression": "status"}], "now": NOW}
r, cold = timed(qb); r, warm = timed(qb)
expb = np.zeros((300, 3), np.int64)
np.add.at(expb, (acity, astatus), 1)
names = ["completed", "canceled", "rejected"]
okb = all(float(r[str(c)][names[s]]) == float(expb[c, s])
          for c in range(0, 300, 23) for s in range(3))
battery.append(("archive count city-status", cold, warm, okb))

qc = {"table": "atrips", "measures": [{"sqlExpression": "sum(fare)"}],
      "rowFilters": ["city_id = 7"], "now": NOW}
r, cold = timed(qc); r, warm = timed(qc)
expc = float(afare[acity == 7].astype(np.float64).sum())
battery.append(("archive prefilter city=7", cold, warm,
                abs(float(r[""]) - expc) < max(1e-3, expc * 1e-5)))

qg = {"table": "atrips",
      "joins": [{"table": "zones", "alias": "z",
                 "conditions": ["geography_intersects(z.shape, pickup)"]}],
      "measures": [{"sqlExpression": "count(*)"}],
      "dimensions": [{"sqlExpression": "z.id"}],
      "rowFilters": ["z.id IN (1, 2)"], "now": NOW}
r, cold = timed(qg); r, warm = timed(qg)
in1 = int(((alat > 0) & (alat < 10) & (alng > 0) & (alng < 10)).sum())
in2 = int(((alat > 20) & (alat < 30) & (alng > 20) & (alng < 30)).sum())
okg = (abs(float(r.get("1", 0)) - in1) <= in1 * 0.001 + 5
       and abs(float(r.get("2", 0)) - in2) <= in2 * 0.001 + 5
       and "NULL" not in r)
battery.append(("geo join archived points", cold, warm, okg))

conn.create_table({
    "name": "events", "columns": [
        {"name": "ts", "type": "Uint32"},
        {"name": "id", "type": "Uint32"},
        {"name": "tags", "type": "ArrayInt32"},
        {"name": "score", "type": "Float32"}],
    "primaryKeyColumns": [1], "isFactTable": True,
    "config": {"batchSize": 1 << 16, "recordRetentionInDays": 0}})
ne = 1 << 16
rng3 = np.random.RandomState(5)
tag_rows = [rng3.randint(0, 20, rng3.randint(0, 5)).tolist()
            for _ in range(ne)]
escore = (rng3.rand(ne) * 10).astype(np.float32)
conn.insert("events", ["ts", "id", "tags", "score"],
            [(NOW - 100, i, tag_rows[i], float(escore[i]))
             for i in range(ne)])
qe = {"table": "events", "measures": [{"sqlExpression": "sum(score)",
      "rowFilters": ["contains(tags, 7)"]}],
      "dimensions": [{"sqlExpression": "length(tags)"}], "now": NOW}
r, cold = timed(qe); r, warm = timed(qe)
expe = {}
for i, tr in enumerate(tag_rows):
    if 7 in tr:
        expe[str(len(tr))] = expe.get(str(len(tr)), 0.0) + float(escore[i])
oke = (set(r) == set(expe)
       and all(abs(float(r[k]) - expe[k]) < max(1e-3, expe[k] * 1e-4)
               for k in expe))
battery.append(("array contains by length", cold, warm, oke))

print(f"{'query':36s} {'cold':>9s} {'warm':>8s}  correct")
for name, cold, warm, okk in battery:
    print(f"{name:36s} {cold:8.0f}ms {warm:7.0f}ms  {okk}")
out_path = sys.argv[1] if len(sys.argv) > 1 else None
if out_path:
    with open(out_path, "w") as f:
        json.dump({
            "n_rows": n,
            "platform": __import__("jax").devices()[0].platform,
            "queries": [{"name": b[0], "cold_ms": round(b[1], 1),
                         "warm_ms": round(b[2], 1), "correct": bool(b[3])}
                        for b in battery],
            "runlen_speedup_vs_expand": round(runlen_speedup, 2),
            "ingest_rows_per_sec_http": ingest_rows_per_sec,
            "all_correct": bool(all(b[3] for b in battery)),
        }, f, indent=1)
assert all(b[3] for b in battery), "CORRECTNESS FAILURE"
print("all correct on", __import__("jax").devices()[0].platform)
srv.stop()
