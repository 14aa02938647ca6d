"""Distributed cluster integration: controller + datanodes + broker.

Parity targets: the reference's multi-node flow (datanode/datanode_test.go,
broker/query_plan_agg_test.go merge behaviors, bootstrap_server_test.go
in-process client+server) — here with real in-process HTTP services.
"""

import time

import numpy as np
import pytest
import requests

from aresdb_tpu.broker.executor import (
    BrokerExecutor,
    calculate_shard_assignment,
    merge_results,
)
from aresdb_tpu.broker.server import BrokerServer
from aresdb_tpu.cluster.topology import (
    DynamicTopology,
    HostInstance,
    SHARD_AVAILABLE,
    TopologyView,
)
from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common.upsert_batch import UpsertBatch, UpsertBatchBuilder
from aresdb_tpu.controller.server import ControllerServer
from aresdb_tpu.controller.state import ControllerState
from aresdb_tpu.datanode.datanode import DataNode
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore

NOW = 1_600_000_000

TRIPS = {
    "name": "trips",
    "columns": [
        {"name": "request_at", "type": "Uint32"},
        {"name": "id", "type": "Uint32"},
        {"name": "city_id", "type": "Uint16"},
        {"name": "fare", "type": "Float32"},
    ],
    "primaryKeyColumns": [1],
    "isFactTable": True,
    "config": {"batchSize": 64, "recordRetentionInDays": 0},
}

NS = "test"


def make_datanode(tmp_path, name, controller_port):
    root = str(tmp_path / name)
    ms = MemStore(DiskMetaStore(root), LocalDiskStore(root))
    node = DataNode(ms, None, controller_address=f"localhost:{controller_port}",
                    namespace=NS, instance_name=name,
                    heartbeat_seconds=0.5, poll_seconds=0.3)
    return node


@pytest.fixture()
def cluster(tmp_path):
    ctrl = ControllerServer(ControllerState())
    cport = ctrl.start_background()
    base = f"http://localhost:{cport}"
    requests.post(f"{base}/namespaces", json={"namespace": NS})
    requests.post(f"{base}/schema/{NS}/tables", json=TRIPS)

    nodes = [make_datanode(tmp_path, f"dn{i}", cport) for i in range(2)]
    for n in nodes:
        n.open()
        n.serve()

    # 4 shards, replica factor 1, spread over the two nodes
    r = requests.post(f"{base}/placement/{NS}/datanode",
                      json={"numShards": 4, "replicaFactor": 1,
                            "instances": [n.instance_name for n in nodes]})
    assert r.status_code == 200

    # wait until both nodes own their shards and marked them available
    deadline = time.time() + 15
    while time.time() < deadline:
        p = requests.get(f"{base}/placement/{NS}/datanode").json()
        states = [st for sd in p["shards"] for st in sd["instances"].values()]
        if states and all(s == "Available" for s in states):
            break
        time.sleep(0.2)
    else:
        raise AssertionError("shards never became available")

    yield ctrl, cport, nodes
    for n in nodes:
        n.close()
    ctrl.stop()


def batch_for(rows):
    b = UpsertBatchBuilder()
    for cid, ct in enumerate([dt.Uint32, dt.Uint32, dt.Uint16, dt.Float32]):
        b.add_column(cid, ct)
    for i, row in enumerate(rows):
        b.add_row()
        for c, v in enumerate(row):
            b.set_value(i, c, v)
    return UpsertBatch(b.to_bytes())


def test_cluster_scatter_gather(cluster):
    ctrl, cport, nodes = cluster

    # ingest rows across all 4 shards on their owning nodes
    rows_by_shard = {
        0: [(NOW - 10, 1, 1, 1.0), (NOW - 20, 2, 2, 2.0)],
        1: [(NOW - 30, 3, 1, 4.0)],
        2: [(NOW - 40, 4, 2, 8.0), (NOW - 50, 5, 1, 16.0)],
        3: [(NOW - 60, 6, 2, 32.0)],
    }
    topo = DynamicTopology(f"localhost:{cport}", NS)
    view = topo.refresh()
    for sid, rows in rows_by_shard.items():
        hosts = view.available_hosts(sid)
        assert hosts, f"no host for shard {sid}"
        r = requests.post(
            f"http://{hosts[0].address}/data/trips/{sid}",
            data=batch_for(rows).buffer)
        assert r.status_code == 200, r.text

    broker = BrokerServer(topo)
    bport = broker.start_background()
    try:
        resp = requests.post(
            f"http://localhost:{bport}/query/aql",
            json={"queries": [{
                "table": "trips",
                "measures": [{"sqlExpression": "sum(fare)"}],
                "dimensions": [{"sqlExpression": "city_id"}],
                "now": NOW,
            }]}).json()
        assert "errors" not in resp, resp.get("errors")
        assert resp["results"][0] == {"1": 21.0, "2": 42.0}

        # count (verbose: per-datanode stage stats pass through the broker)
        resp = requests.post(
            f"http://localhost:{bport}/query/aql",
            json={"verbose": True, "queries": [{
                "table": "trips",
                "measures": [{"sqlExpression": "count(*)"}],
                "now": NOW,
            }]}).json()
        assert resp["results"][0] == {"": 6.0}
        ctx = resp["context"][0]
        assert {s for e in ctx for s in e["shards"]} == {0, 1, 2, 3}
        assert all("batchExec" in e["stats"] for e in ctx)

        # avg split (sum/count across shards)
        resp = requests.post(
            f"http://localhost:{bport}/query/aql",
            json={"queries": [{
                "table": "trips",
                "measures": [{"sqlExpression": "avg(fare)"}],
                "now": NOW,
            }]}).json()
        assert resp["results"][0][""] == pytest.approx(63.0 / 6, rel=1e-5)

        # SQL through the broker
        resp = requests.post(
            f"http://localhost:{bport}/query/sql",
            json={"queries": [
                "SELECT count(*) FROM trips WHERE city_id = 1"]}).json()
        assert resp["results"][0] == {"": 3.0}

        # broker metric emission (utils/metrics.go broker rows)
        from aresdb_tpu.utils import metrics as M
        assert M.root().find("AQLQueryReceivedBroker")
        assert M.root().find("QueryLatencyBroker")

        # non-agg with limit across shards
        resp = requests.post(
            f"http://localhost:{bport}/query/aql",
            json={"queries": [{
                "table": "trips",
                "measures": [{"sqlExpression": "1"}],
                "dimensions": [{"sqlExpression": "id"}],
                "limit": 4,
            }]}).json()
        assert len(resp["results"][0]["matrixData"]) == 4
    finally:
        broker.stop()


def test_schema_sync_to_datanodes(cluster):
    ctrl, cport, nodes = cluster
    for n in nodes:
        assert "trips" in n.memstore.get_schemas()


def test_shard_assignment_balance():
    h1 = HostInstance("a", "h1", 1)
    h2 = HostInstance("b", "h2", 2)
    view = TopologyView(num_shards=4, shards={
        0: [(h1, SHARD_AVAILABLE), (h2, SHARD_AVAILABLE)],
        1: [(h1, SHARD_AVAILABLE), (h2, SHARD_AVAILABLE)],
        2: [(h1, SHARD_AVAILABLE)],
        3: [(h2, SHARD_AVAILABLE)],
    })
    asg = calculate_shard_assignment(view)
    counts = {name: len(shards) for name, (_, shards) in asg.items()}
    assert counts == {"a": 2, "b": 2}


def test_merge_lattice():
    a = {"x": {"m": 1.0}, "y": {"m": 2.0}}
    b = {"x": {"m": 3.0}, "z": {"n": 5.0}}
    assert merge_results("sum", [a, b]) == {
        "x": {"m": 4.0}, "y": {"m": 2.0}, "z": {"n": 5.0}}
    assert merge_results("min", [a, b])["x"]["m"] == 1.0
    assert merge_results("max", [a, b])["x"]["m"] == 3.0


def test_shard_migration_peer_bootstrap(cluster, tmp_path):
    """Elastic recovery: replace an instance; the joiner peer-copies state.

    Reference: §3.5 shard migration (datanode/datanode.go assignShardSet →
    memstore/bootstrap.go → peer streaming → redolog catch-up).
    """
    ctrl, cport, nodes = cluster
    base = f"http://localhost:{cport}"
    topo = DynamicTopology(f"localhost:{cport}", NS)
    view = topo.refresh()

    # ingest into every shard owned by dn0
    dn0 = nodes[0]
    dn0_shards = sorted(dn0.owned_shards)
    assert dn0_shards
    total_rows = 0
    for sid in dn0_shards:
        rows = [(NOW - 10 * (i + 1), 100 + sid * 10 + i, 1, float(sid + 1))
                for i in range(3)]
        r = requests.post(
            f"http://localhost:{dn0.port}/data/trips/{sid}",
            data=batch_for(rows).buffer)
        assert r.status_code == 200, r.text
        total_rows += 3

    # bring up a third node and replace dn0
    dn2 = make_datanode(tmp_path, "dn2", cport)
    dn2.open()
    dn2.serve()
    try:
        r = requests.post(
            f"{base}/membership/{NS}/instances",
            json={"name": "dn2", "host": "localhost", "port": dn2.port})
        requests.post(f"{base}/placement/{NS}/datanode")  # no-op GET-ish
        # replace dn0 with dn2 in the placement (over the API)
        r = requests.post(f"{base}/placement/{NS}/datanode/replace",
                          json={"leaving": "dn0", "joining": "dn2"})
        assert r.status_code == 200, r.text

        deadline = time.time() + 20
        while time.time() < deadline:
            if set(dn2.owned_shards) >= set(dn0_shards):
                break
            time.sleep(0.2)
        else:
            raise AssertionError("dn2 never took over dn0's shards")

        # dn2 must now serve the data dn0 had (peer-copied redolog replay)
        got = 0
        for sid in dn0_shards:
            resp = requests.post(
                f"http://localhost:{dn2.port}/query/aql",
                json={"queries": [{
                    "table": "trips", "shards": [sid],
                    "measures": [{"sqlExpression": "count(*)"}],
                    "now": NOW}]}).json()
            assert "errors" not in resp, resp.get("errors")
            got += resp["results"][0].get("", 0)
        assert got == total_rows
    finally:
        dn2.close()


def test_broker_hll_merge(cluster):
    """countdistincthll across shards: registers merge at the broker."""
    ctrl, cport, nodes = cluster
    topo = DynamicTopology(f"localhost:{cport}", NS)
    view = topo.refresh()
    # the same driver ids appear on multiple shards: the merged distinct
    # count must not double count across datanodes
    driver_ids = list(range(40))
    rid = 0
    for sid in view.shard_ids():
        hosts = view.available_hosts(sid)
        rows = []
        for d in driver_ids[sid % 2::2]:  # overlapping subsets per shard
            rows.append((NOW - 10 - d, 10_000 + rid, d, 1.0))
            rid += 1
        r = requests.post(
            f"http://{hosts[0].address}/data/trips/{sid}",
            data=batch_for(rows).buffer)
        assert r.status_code == 200, r.text

    broker = BrokerServer(topo)
    bport = broker.start_background()
    try:
        resp = requests.post(
            f"http://localhost:{bport}/query/aql",
            json={"queries": [{
                "table": "trips",
                "measures": [{"sqlExpression": "countdistincthll(city_id)"}],
                "now": NOW}]}).json()
        assert "errors" not in resp, resp.get("errors")
        # 40 distinct city ids ingested across 4 shards (overlapping)
        assert resp["results"][0][""] == pytest.approx(40, abs=2)

        # binary pass-through: Accept: application/hll on the broker returns
        # a merged HLLData block byte-parseable by the client
        from aresdb_tpu.client.query import QueryClient
        qc = QueryClient(f"localhost:{bport}")
        q = {"table": "trips",
             "measures": [{"sqlExpression": "countdistincthll(city_id)"}],
             "now": NOW}
        raw, errs = qc.query_hll([q], compute=False)
        assert errs == [None]
        from aresdb_tpu.query import hll_wire as W
        assert isinstance(raw[0][""], W.HLL)
        est, errs = qc.query_hll([q])
        assert est[0][""] == resp["results"][0][""]

        # non-hll query under application/hll must error per query
        bad = dict(q, measures=[{"sqlExpression": "count(*)"}])
        res2, errs2 = qc.query_hll([bad, q])
        assert errs2[0] and "hll" in errs2[0]
        assert res2[0] is None and res2[1][""] == est[0][""]

        # datanode-direct binary response parses too
        view2 = topo.refresh()
        host = view2.available_hosts(view2.shard_ids()[0])[0]
        dq = QueryClient(host.address)
        dres, derrs = dq.query_hll([dict(q, shards=[view2.shard_ids()[0]])],
                                   compute=False)
        assert derrs == [None] and isinstance(dres[0][""], W.HLL)
    finally:
        broker.stop()


def test_job_config_crud(cluster):
    """Reference controller config handler parity:
    /config/{ns}/jobs CRUD (controller/handlers/config.go)."""
    _, cport, _ = cluster
    base = f"http://localhost:{cport}"
    r = requests.post(f"{base}/config/{NS}/jobs", json={
        "name": "etl1", "table": "trips", "topic": "trips-events"})
    assert r.status_code == 200
    r = requests.get(f"{base}/config/{NS}/jobs")
    assert any(j["name"] == "etl1" for j in r.json())
    r = requests.get(f"{base}/config/{NS}/jobs/etl1")
    assert r.json()["topic"] == "trips-events"
    r = requests.put(f"{base}/config/{NS}/jobs/etl1", json={
        "table": "trips", "topic": "trips-v2"})
    assert r.status_code == 200
    assert requests.get(
        f"{base}/config/{NS}/jobs/etl1").json()["topic"] == "trips-v2"
    r = requests.delete(f"{base}/config/{NS}/jobs/etl1")
    assert r.status_code == 200
    assert requests.get(f"{base}/config/{NS}/jobs/etl1").status_code == 404


def test_skew_aware_rebalance():
    """Heavy shards spread across nodes by heartbeat-reported row counts."""
    from aresdb_tpu.controller.state import Instance

    st = ControllerState()
    st.create_namespace("ns")
    for name in ("a", "b"):
        st.join("ns", Instance(name=name, host="h", port=1))
    # both shards land on 'a' initially
    st.init_placement("ns", "datanode", 4, 1, ["a"])
    for s in range(4):
        st.mark_available("ns", "datanode", "a", s)
    # heartbeats report heavy skew: shard 0 dwarfs the rest
    st.heartbeat("ns", "a", {0: 1_000_000, 1: 1000, 2: 1000, 3: 1000})
    st.heartbeat("ns", "b", {})

    out = st.rebalance("ns", "datanode")
    p = st.get_placement("ns", "datanode")
    owners = {sa.shard_id: [o for o, s2 in sa.instances.items()
                            if s2 != "Leaving"] for sa in p.shards}
    # the heavy shard moves alone; the three light shards balance the rest
    loads = {"a": 0, "b": 0}
    for sid, named in owners.items():
        assert len(named) == 1
        loads[named[0]] += {0: 1_000_000, 1: 1000, 2: 1000, 3: 1000}[sid]
    heavy_owner = owners[0][0]
    other = "b" if heavy_owner == "a" else "a"
    assert loads[heavy_owner] == 1_000_000  # nothing else stacked on it
    assert loads[other] == 3000
    assert out["moves"] >= 1
    # displaced replicas stay as Leaving bootstrap sources until the
    # joiner marks Available (m3 lifecycle)
    leaving = [(sa.shard_id, o) for sa in p.shards
               for o, s2 in sa.instances.items() if s2 == "Leaving"]
    assert leaving
    for sid, _ in leaving:
        joiner = owners[sid][0]
        st.mark_available("ns", "datanode", joiner, sid)
    p = st.get_placement("ns", "datanode")
    assert not any(s2 == "Leaving" for sa in p.shards
                   for s2 in sa.instances.values())


def test_rebalance_sticky_when_balanced():
    """A balanced placement does not churn shards on rebalance."""
    from aresdb_tpu.controller.state import Instance

    st = ControllerState()
    st.create_namespace("ns")
    for name in ("a", "b"):
        st.join("ns", Instance(name=name, host="h", port=1))
    st.init_placement("ns", "datanode", 4, 1, ["a", "b"])
    for sa in st.get_placement("ns", "datanode").shards:
        for o in sa.instances:
            st.mark_available("ns", "datanode", o, sa.shard_id)
    st.heartbeat("ns", "a", {0: 5000, 2: 5000})
    st.heartbeat("ns", "b", {1: 5000, 3: 5000})
    out = st.rebalance("ns", "datanode")
    assert out["moves"] == 0


def test_bootstrap_retry_endpoint(cluster):
    """POST /dbg/bootstrap/retry re-runs bootstrap for pending shards
    (reference api/debug_handler.go:97). With everything owned it's a
    no-op returning an empty list."""
    _, _, nodes = cluster
    r = requests.post(
        f"http://localhost:{nodes[0].port}/dbg/bootstrap/retry", timeout=5)
    assert r.status_code == 200
    assert r.json()["retried"] == []


def test_scan_retry_and_health_marking():
    """BlockingScanNode parity (broker/query_plan_agg_test.go:346-423):
    a failing datanode is retried up to 3 times and marked unhealthy; a
    recovery within the retry budget succeeds and re-marks healthy."""
    import requests as _requests

    from aresdb_tpu.broker.executor import (RETRIES, BrokerError,
                                            BrokerExecutor)
    from aresdb_tpu.cluster.topology import HealthTrackingTopology

    from aresdb_tpu.cluster.topology import StaticTopology

    h1 = HostInstance("n1", "127.0.0.1:59999", 0)
    view = TopologyView(num_shards=1, shards={0: [(h1, SHARD_AVAILABLE)]})
    topo = HealthTrackingTopology(StaticTopology(view))

    class FakeResponse:
        status_code = 200

        def raise_for_status(self):
            pass

        def json(self):
            return {"results": [{"x": 1.0}]}

    class FlakySession:
        def __init__(self, failures):
            self.failures = failures
            self.calls = 0

        def post(self, *a, **kw):
            self.calls += 1
            if self.calls <= self.failures:
                raise _requests.ConnectionError("refused")
            return FakeResponse()

    # fails once, succeeds on retry; host ends healthy
    ex = BrokerExecutor(topo, session=FlakySession(1))
    q = {"table": "t", "dimensions": [{"sqlExpression": "a"}],
         "measures": [{"sqlExpression": "count(*)"}]}
    assert ex.execute(q) == {"x": 1.0}
    assert "n1" not in topo._unhealthy

    # fails every time: BrokerError after RETRIES tries, host unhealthy
    ex2 = BrokerExecutor(topo, session=FlakySession(99))
    with pytest.raises(BrokerError, match="failed after"):
        ex2.execute(q)
    assert ex2.session.calls == RETRIES
    assert "n1" in topo._unhealthy


def test_controller_ui_and_helpers(cluster):
    """The controller serves its web UI and the two UI helper endpoints
    (reference: controller/ui React app; rebuilt as a dependency-free
    page at /ui)."""
    ctrl, cport, nodes = cluster
    base = f"http://localhost:{cport}"

    r = requests.get(f"{base}/ui")
    assert r.status_code == 200
    assert "text/html" in r.headers["Content-Type"]
    for marker in ("aresdb controller", "/namespaces", "placement",
                   "Initializing", "rebalance"):
        assert marker in r.text, marker

    # placement-kinds helper lists the datanode placement the fixture made
    assert requests.get(f"{base}/placements/{NS}").json() == ["datanode"]

    # membership ?all=1 carries liveness + load for the instances tab
    m = requests.get(f"{base}/membership/{NS}/instances",
                     params={"all": "1"}).json()
    assert set(m) == {n.instance_name for n in nodes}
    for v in m.values():
        assert v["alive"] is True
        assert v["lastHeartbeatAgoSec"] is not None
        assert "rows" in v and "host" in v and "port" in v
