import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import sys, json, tempfile
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np
from aresdb_tpu.api.server import ApiServer
from aresdb_tpu.client import Connector
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.memstore.scheduler import Scheduler
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore
from aresdb_tpu.utils import clock

TESTDATA = "/root/reference/integration/test-data"
NOW = 1560049867  # reference integration clock (utils.SetCurrentTime)
clock.set_current_time(NOW)
root = tempfile.mkdtemp()
ms = MemStore(DiskMetaStore(root), LocalDiskStore(root))
ms.fetch_schema()
srv = ApiServer(ms, Scheduler(ms), port=0)
port = srv.start_background()
conn = Connector("localhost", port)
schema = json.load(open(f"{TESTDATA}/schema/arraytest.json"))
conn.create_table(schema)

# data per the reference generator's deterministic rules
# (examples/utils/example_utils.go generateArrayTableColValue): for each of
# the 2 csv records (time-1d, time-2d), 2 batches x 1000 rows, arraySize =
# j % 5; arrays have arraySize-1 items, item i value i*10 (enums
# enum_value_i / _i*10; bool alternating; item 3 is null); scalar cols carry
# arraySize itself. Timestamps are random in the window (our own rng).
rng = np.random.RandomState(0)
import uuid as _uuid
def arr(valtype, size):
    if size == 0:
        return None
    items = []
    for i in range(1, size):
        if i == 3:
            items.append(None)
        elif valtype == "bool":
            items.append("true" if i % 2 == 0 else "false")
        elif valtype in ("int8", "int16", "int32", "uint8", "uint16", "uint32"):
            items.append(str(i * 10))
        elif valtype == "smallenum":
            items.append(f"enum_value_{i}")
        elif valtype == "bigenum":
            items.append(f"enum_value_{i * 10}")
        elif valtype == "uuid":
            items.append("12000000-0000-0000-0100-%012d" % (i * 10))
        elif valtype == "geopoint":
            items.append("point(-%.6f %.6f)" % (i * 10, i * 10))
    return items

colnames = [c["name"] for c in schema["columns"]]
rows = []
times = []
for rec, dur in ((1, 86400), (2, 172800)):
    for b in range(2):
        for j in range(1000):
            size = j % 5
            t = NOW - dur + int(rng.randint(0, dur))
            times.append((t, size))
            row = [t, str(_uuid.UUID(int=len(rows) + 1)), size,
                   f"status_{size}", 1.01 * size,
                   arr("bool", size), arr("int8", size), arr("uint8", size),
                   arr("int16", size), arr("uint16", size),
                   arr("int32", size), arr("uint32", size),
                   arr("smallenum", size), arr("bigenum", size),
                   arr("uuid", size), arr("geopoint", size)]
            rows.append(row)
for off in range(0, len(rows), 500):
    conn.insert("arraytest", colnames, rows[off:off + 500])
print(f"ingested {len(rows)} rows", flush=True)

# reference window: from "24 hours ago" to "this quarter-hour"
qh = (NOW - NOW % 900) + 900        # 'this quarter-hour' as TO = bucket end
lo = ((NOW - 86400) // 3600) * 3600  # '24 hours ago' floors to the hour
def day(ts):
    import datetime as dt
    return dt.datetime.fromtimestamp(ts, dt.timezone.utc).strftime("%Y-%m-%d")

for qfile, oracle_fn in [
    ("array_query_length.aql",
     lambda t, size: (day(t), "NULL" if size == 0 else str(max(size - 1, 0)))),
    ("array_query_contains.aql",     # contains(array_int16, 20): needs >= 3 items? item values 10,20 -> size >= 3
     lambda t, size: (day(t),) if size >= 3 else None),
    ("array_query_elementat.aql", None),  # handled below
]:
    q = json.load(open(f"{TESTDATA}/queries/{qfile}"))
    q["queries"][0]["now"] = NOW
    import requests
    r = requests.post(f"http://localhost:{port}/query/aql", json=q).json()
    if r.get("errors") and r["errors"][0]:
        print(f"{qfile}: ERRORS {r['errors']}")
        continue
    got = r["results"][0]
    if qfile == "array_query_length.aql":
        exp = {}
        for t, size in times:
            if lo <= t < qh:
                d, l = oracle_fn(t, size)
                exp.setdefault(d, {})[l] = exp.get(d, {}).get(l, 0) + 1
        ok = {d: {k: float(v) for k, v in m.items()} for d, m in exp.items()} == got
        print(f"{qfile}: match={ok} got={got}")
    elif qfile == "array_query_contains.aql":
        exp = {}
        for t, size in times:
            if lo <= t < qh and size >= 3:
                d = day(t)
                exp[d] = exp.get(d, 0) + 1
        ok = {d: float(v) for d, v in exp.items()} == got
        print(f"{qfile}: match={ok} got={got}")
    else:
        # element_at(array_int16, 0)=10 selects sizes >= 2
        exp = {}
        for t, size in times:
            if lo <= t < qh and size >= 2:
                d = day(t)
                exp[d] = exp.get(d, 0) + 1
        ok = {d: float(v) for d, v in exp.items()} == got
        print(f"{qfile}: match={ok} got={got}")
clock.reset_clock()
srv.stop()
