"""HTTP API + client SDK integration tests.

Parity targets: api/query_handler_test.go, data_handler_test.go,
schema_handler_test.go, enum_handler_test.go behaviors — run against a real
in-process server like the reference integration test boots a full AresD
(integration/integration_test.go).
"""

import json

import pytest
import requests

from aresdb_tpu.api.server import ApiServer
from aresdb_tpu.client import Connector
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.memstore.scheduler import Scheduler
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore

NOW = 1_600_000_000

TRIPS = {
    "name": "trips",
    "columns": [
        {"name": "request_at", "type": "Uint32"},
        {"name": "id", "type": "Uint32"},
        {"name": "status", "type": "SmallEnum"},
        {"name": "fare", "type": "Float32"},
    ],
    "primaryKeyColumns": [1],
    "isFactTable": True,
    "config": {"batchSize": 64, "recordRetentionInDays": 0},
}


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ares"))
    ms = MemStore(DiskMetaStore(root), LocalDiskStore(root))
    ms.fetch_schema()
    sched = Scheduler(ms)
    srv = ApiServer(ms, sched, port=0)
    port = srv.start_background()
    yield srv, port
    srv.stop()


@pytest.fixture(scope="module")
def base(server):
    return f"http://localhost:{server[1]}"


def test_health(base):
    r = requests.get(f"{base}/health")
    assert r.status_code == 200 and r.text == "OK"


def test_create_table_and_ingest_and_query(base, server):
    _, port = server
    conn = Connector("localhost", port)
    conn.create_table(TRIPS)

    r = requests.get(f"{base}/schema/tables")
    assert "trips" in r.json()
    r = requests.get(f"{base}/schema/tables/trips")
    assert r.json()["name"] == "trips"

    stats = conn.insert(
        "trips", ["request_at", "id", "status", "fare"],
        [
            (NOW - 100, 1, "completed", 10.0),
            (NOW - 200, 2, "completed", 5.0),
            (NOW - 300, 3, "canceled", 2.0),
            (NOW - 400, 4, None, None),
        ])
    assert stats["inserted"] == 4

    resp = conn.query_aql({
        "table": "trips",
        "measures": [{"sqlExpression": "sum(fare)",
                      "rowFilters": ["status='completed'"]}],
        "now": NOW,
    })
    assert resp["results"][0][""] == pytest.approx(15.0)

    resp = conn.query_sql(
        f"SELECT count(*) FROM trips WHERE aql_now(request_at, {NOW})")
    assert resp["results"][0][""] == 4.0


def test_enum_endpoints(base):
    r = requests.get(f"{base}/schema/tables/trips/columns/status/enum-cases")
    cases = r.json()
    assert "completed" in cases and "canceled" in cases

    r = requests.post(
        f"{base}/schema/tables/trips/columns/status/enum-cases",
        json={"enumCases": ["rejected"]})
    assert r.status_code == 200
    r = requests.get(f"{base}/schema/tables/trips/columns/status/enum-cases")
    assert "rejected" in r.json()


def test_debug_endpoints(base):
    r = requests.get(f"{base}/dbg/shards")
    shards = r.json()
    assert shards and shards[0]["table"] == "trips"
    assert shards[0]["rowsVisible"] == 4

    r = requests.get(f"{base}/dbg/trips/0")
    info = r.json()
    assert info["liveStore"]["primaryKeys"] == 4

    r = requests.post(f"{base}/dbg/trips/0/backfill")
    assert r.status_code == 200

    r = requests.get(f"{base}/dbg/jobs")
    assert "trips/0/backfill" in r.json()

    r = requests.get(f"{base}/metrics")
    snap = r.json()
    # reference scope name (utils/metrics.go scopeNameQueryReceived)
    assert any(k.startswith("query_received") for k in snap["counters"])


def test_bad_requests(base):
    r = requests.post(f"{base}/data/nope/0", data=b"garbage")
    assert r.status_code == 400
    r = requests.post(f"{base}/query/aql", data=b"{not json")
    assert r.status_code == 400
    r = requests.get(f"{base}/schema/tables/missing")
    assert r.status_code == 404


def test_ingestion_error_unknown_table(base):
    from aresdb_tpu.common.upsert_batch import UpsertBatchBuilder
    from aresdb_tpu.common import data_types as dt

    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint32)
    b.add_row()
    b.set_value(0, 0, 1)
    r = requests.post(f"{base}/data/missing/0", data=b.to_bytes())
    assert r.status_code == 404


def test_bulk_columnar_insert(base, server):
    import numpy as np
    from aresdb_tpu.client import Connector

    _, port = server
    conn = Connector("localhost", port)
    n = 5000
    rng = np.random.RandomState(3)
    stats = conn.insert_columns("trips", {
        "request_at": (NOW - rng.randint(0, 3600, n)).astype(np.uint32),
        "id": np.arange(10_000, 10_000 + n).astype(np.uint32),
        "fare": rng.rand(n).astype(np.float32),
    }, validity={"fare": rng.rand(n) > 0.1})
    assert stats["inserted"] == n
    resp = conn.query_aql({
        "table": "trips",
        "measures": [{"sqlExpression": "count(*)",
                      "rowFilters": ["id >= 10000"]}],
        "now": NOW})
    assert resp["results"][0][""] == float(n)


def test_delete_column(base):
    import requests as rq

    r = rq.delete(f"{base}/schema/tables/trips/columns/status")
    assert r.status_code == 200, r.text
    r = rq.get(f"{base}/schema/tables/trips")
    cols = {c["name"]: c for c in r.json()["columns"]}
    assert cols["status"]["deleted"] is True
    # deleted column gone from queries
    r = rq.post(f"{base}/query/aql", json={"queries": [{
        "table": "trips",
        "measures": [{"sqlExpression": "count(*)",
                      "rowFilters": ["status='completed'"]}]}]})
    assert r.json()["errors"][0]
    # pk cannot be deleted
    r = rq.delete(f"{base}/schema/tables/trips/columns/id")
    assert r.status_code == 400


def test_primary_key_lookup(base):
    r = requests.get(f"{base}/dbg/trips/0/primary-keys", params={"key": "1"})
    body = r.json()
    assert body["found"] is True and "batchID" in body and "index" in body
    r = requests.get(f"{base}/dbg/trips/0/primary-keys",
                     params={"key": "999999999"})
    assert r.json() == {"found": False}
    r = requests.get(f"{base}/dbg/trips/0/primary-keys",
                     params={"key": "1,2"})
    assert r.status_code == 400
    r = requests.get(f"{base}/dbg/missing/0/primary-keys", params={"key": "1"})
    assert r.status_code == 404


def test_openapi_spec(base):
    r = requests.get(f"{base}/swagger.json")
    spec = r.json()
    assert spec["openapi"].startswith("3.")
    assert "/query/aql" in spec["paths"]
    assert "post" in spec["paths"]["/data/{table}/{shard}"]


def test_batch_inspection_and_health_switch(base):
    r = requests.get(f"{base}/dbg/shards")
    # live batch ids are negative
    r = requests.get(f"{base}/dbg/trips/0/batches/-2147483648")
    body = r.json()
    assert r.status_code == 200 and body["rows"] > 0 and body["columns"]
    col = next(iter(body["columns"]))
    r = requests.get(
        f"{base}/dbg/trips/0/batches/-2147483648/vector-parties/{col}")
    assert r.status_code == 200 and len(r.json()["sample"]) > 0

    # paged sampling: offset/rows windows agree with the full sample
    full = requests.get(
        f"{base}/dbg/trips/0/batches/-2147483648/vector-parties/{col}",
        params={"rows": "1000"}).json()
    page = requests.get(
        f"{base}/dbg/trips/0/batches/-2147483648/vector-parties/{col}",
        params={"offset": "1", "rows": "2"}).json()
    assert page["offset"] == 1
    assert page["sample"] == full["sample"][1:3]
    past_end = requests.get(
        f"{base}/dbg/trips/0/batches/-2147483648/vector-parties/{col}",
        params={"offset": str(full["rows"] + 5)}).json()
    assert past_end["sample"] == []

    # the debug UI page carries the storage/node tooling tabs
    ui = requests.get(f"{base}/dbg").text
    for marker in ("Storage", "Batch inspector", "Primary-key lookup",
                   "Backfill queue", "healthSwitch", "bootstrapRetry"):
        assert marker in ui, marker
    r = requests.get(f"{base}/dbg/trips/0/batches/999")
    assert r.status_code == 404

    # backfill queue peek (empty)
    r = requests.get(f"{base}/dbg/trips/0/backfill-queue/0")
    assert r.status_code == 404

    # health switch drains the probe
    assert requests.get(f"{base}/health").status_code == 200
    requests.post(f"{base}/health/off")
    assert requests.get(f"{base}/health").status_code == 503
    requests.post(f"{base}/health/on")
    assert requests.get(f"{base}/health").status_code == 200


def test_bootstrap_retry_requires_datanode_mode(base):
    """Single-node servers reject /dbg/bootstrap/retry with 404."""
    r = requests.post(f"{base}/dbg/bootstrap/retry", timeout=5)
    assert r.status_code == 404


def test_add_column_and_update_column_config(base, server):
    """AddColumn + UpdateColumn parity (api/schema_handler_test.go:185,217):
    a column appends at the next id (optionally extending the archiving
    sort order), its config can be updated in place, and invalid adds are
    rejected by the shared validator."""
    _, port = server
    schema = {
        "name": "evolve",
        "columns": [
            {"name": "t", "type": "Uint32"},
            {"name": "id", "type": "Uint32"},
        ],
        "primaryKeyColumns": [1],
        "isFactTable": True,
        "config": {"batchSize": 16, "recordRetentionInDays": 0},
    }
    r = requests.post(f"{base}/schema/tables", json=schema)
    assert r.status_code == 200

    # add a column
    r = requests.post(f"{base}/schema/tables/evolve/columns",
                      json={"column": {"name": "fare", "type": "Float32"}})
    assert r.status_code == 200, r.text
    t = requests.get(f"{base}/schema/tables/evolve").json()
    assert [c["name"] for c in t["columns"]] == ["t", "id", "fare"]

    # duplicate name rejected by the validator
    r = requests.post(f"{base}/schema/tables/evolve/columns",
                      json={"column": {"name": "fare", "type": "Float32"}})
    assert r.status_code == 400 and "duplicate" in r.text

    # update the column's config
    r = requests.put(f"{base}/schema/tables/evolve/columns/fare",
                     json={"preloadingDays": 3, "priority": 7})
    assert r.status_code == 200, r.text
    t = requests.get(f"{base}/schema/tables/evolve").json()
    fare = [c for c in t["columns"] if c["name"] == "fare"][0]
    assert fare["config"]["preloadingDays"] == 3
    assert fare["config"]["priority"] == 7

    # unknown column 404
    r = requests.put(f"{base}/schema/tables/evolve/columns/nope",
                     json={"priority": 1})
    assert r.status_code == 404

    # ingest into the added column end-to-end
    from aresdb_tpu.client import Connector

    conn = Connector("localhost", port)
    stats = conn.insert("evolve", ["t", "id", "fare"],
                        [[100, 1, 1.5], [100, 2, 2.5]])
    assert stats["inserted"] == 2
    resp = conn.query_aql({
        "table": "evolve",
        "dimensions": [],
        "measures": [{"sqlExpression": "sum(fare)"}],
        "timeFilter": {"column": "t", "from": "1970-01-01",
                       "to": "1970-01-02"},
    })
    vals = list(resp["results"][0].values())
    assert vals and abs(vals[0] - 4.0) < 1e-6


def test_update_table_config_only(base):
    """UpdateTableConfig parity (api/schema_handler_test.go:142): a PUT
    body without 'columns' updates only the table config."""
    schema = {
        "name": "cfgonly",
        "columns": [{"name": "t", "type": "Uint32"},
                    {"name": "id", "type": "Uint32"}],
        "primaryKeyColumns": [1],
        "isFactTable": True,
        "config": {"batchSize": 16, "recordRetentionInDays": 2},
    }
    assert requests.post(f"{base}/schema/tables", json=schema).status_code == 200
    r = requests.put(f"{base}/schema/tables/cfgonly",
                     json={"batchSize": 32, "recordRetentionInDays": 5})
    assert r.status_code == 200, r.text
    t = requests.get(f"{base}/schema/tables/cfgonly").json()
    assert t["config"]["batchSize"] == 32
    assert t["config"]["recordRetentionInDays"] == 5
    assert [c["name"] for c in t["columns"]] == ["t", "id"]


def test_dataonly_query_param(base, server):
    """/query/aql?dataonly=1 returns enum dims as untranslated ranks
    (reference api/common/query_request.go:48). Uses its own table — the
    module fixture's trips.status is tombstoned by test_delete_column."""
    _, port = server
    conn = Connector("localhost", port)
    conn.create_table({
        "name": "dq_trips",
        "columns": [
            {"name": "request_at", "type": "Uint32"},
            {"name": "id", "type": "Uint32"},
            {"name": "color", "type": "SmallEnum"},
        ],
        "primaryKeyColumns": [1],
        "isFactTable": True,
        "config": {"batchSize": 64, "recordRetentionInDays": 0},
    })
    conn.insert("dq_trips", ["request_at", "id", "color"],
                [(NOW - 100, 1, "red"), (NOW - 200, 2, "red"),
                 (NOW - 300, 3, "blue"), (NOW - 400, 4, None)])
    q = {"queries": [{
        "table": "dq_trips",
        "measures": [{"sqlExpression": "count(*)"}],
        "dimensions": [{"sqlExpression": "color"}],
        "now": NOW,
    }]}
    translated = requests.post(f"{base}/query/aql", json=q).json()
    assert translated["results"][0] == {
        "red": 2.0, "blue": 1.0, "NULL": 1.0}
    cases = requests.get(
        f"{base}/schema/tables/dq_trips/columns/color/enum-cases").json()
    ranks = requests.post(f"{base}/query/aql?dataonly=1", json=q).json()
    assert ranks["results"][0] == {
        str(cases.index("red")): 2.0, str(cases.index("blue")): 1.0,
        "NULL": 1.0}


def test_reference_route_shapes(base):
    """Reference-exact route/param forms a drop-in user would hit:
    GET /query/{aql,sql}?q= (query_handler.go:67,136), per-type job
    status (/dbg/jobs/{jobType}, debug_handler.go:77), the
    backfill-manager upsertbatches path (debug_handler.go:96), and
    redolog browsing via .../redologs/{t}/upsertbatches
    (debug_handler.go:92)."""
    q = json.dumps({"queries": [{
        "table": "dq_trips",
        "measures": [{"sqlExpression": "count(*)"}],
        "now": NOW}]})
    r = requests.get(f"{base}/query/aql", params={"q": q})
    assert r.status_code == 200 and r.json()["results"][0][""] == 4.0

    sq = json.dumps({"queries": [
        f"SELECT count(*) FROM dq_trips WHERE aql_now(request_at, {NOW})"]})
    r = requests.get(f"{base}/query/sql", params={"q": sq})
    assert r.status_code == 200 and r.json()["results"][0][""] == 4.0

    # malformed q is a 400, not a silent empty run
    assert requests.get(f"{base}/query/aql",
                        params={"q": "{not json"}).status_code == 400

    # per-type job status filters the full map
    requests.post(f"{base}/dbg/trips/0/backfill")
    allj = requests.get(f"{base}/dbg/jobs").json()
    bf = requests.get(f"{base}/dbg/jobs/backfill").json()
    assert bf and all(k.endswith("/backfill") for k in bf)
    assert set(bf) == {k for k in allj if k.endswith("/backfill")}
    assert requests.get(f"{base}/dbg/jobs/archiving").json() == {
        k: v for k, v in allj.items() if k.endswith("/archiving")}

    # reference backfill-manager path answers like the short alias
    ref = requests.get(
        f"{base}/dbg/trips/0/backfill-manager/upsertbatches/0")
    alias = requests.get(f"{base}/dbg/trips/0/backfill-queue/0")
    assert ref.status_code == alias.status_code

    # redolog browsing accepts the reference's /upsertbatches shape
    files = requests.get(f"{base}/dbg/trips/0/redologs").json()
    if files:
        t0 = files[0] if isinstance(files[0], int) else files[0].get(
            "creationTime", files[0])
        short = requests.get(f"{base}/dbg/trips/0/redologs/{t0}")
        refp = requests.get(
            f"{base}/dbg/trips/0/redologs/{t0}/upsertbatches")
        assert refp.status_code == short.status_code
        if short.status_code == 200:
            assert refp.json() == short.json()


def test_query_request_params(base):
    """?verbose / ?debug / ?profiling force per-stage stats; ?device and
    ?timeout parse and pass through (single-device server: out-of-range
    device falls back, generous timeout is a no-op) — reference
    api/common/query_request.go:36-52."""
    q = json.dumps({"queries": [{
        "table": "dq_trips",
        "measures": [{"sqlExpression": "count(*)"}],
        "now": NOW}]})
    r = requests.get(f"{base}/query/aql",
                     params={"q": q, "verbose": "1"}).json()
    assert r["results"][0][""] == 4.0 and "context" in r
    r = requests.get(f"{base}/query/aql",
                     params={"q": q, "profiling": "eval"}).json()
    assert "context" in r
    r = requests.get(f"{base}/query/aql",
                     params={"q": q, "device": "3", "timeout": "30"})
    assert r.status_code == 200 and r.json()["results"][0][""] == 4.0
    assert requests.get(f"{base}/query/aql",
                        params={"q": q, "device": "x"}).status_code == 400


def test_sql_verbose_context(base):
    """/query/sql?verbose=1 (or body verbose) returns per-stage stats like
    the AQL form — the reference's SQL handler shares handleAQLInternal."""
    sq = {"queries": [
        f"SELECT count(*) FROM dq_trips WHERE aql_now(request_at, {NOW})"]}
    plain = requests.post(f"{base}/query/sql", json=sq).json()
    assert "context" not in plain
    v = requests.post(f"{base}/query/sql?verbose=1", json=sq).json()
    assert v["results"][0][""] == 4.0
    assert v["context"][0] and "compile" in v["context"][0]
    v2 = requests.post(f"{base}/query/sql",
                       json={**sq, "verbose": 1}).json()
    assert v2["context"][0]
