"""Controller HA: leader election + client failover.

Parity target: controller/tasks/etcd/leader_elector.go:105 (lease-based
election, resign-on-close, observe changes) with the shared state
directory standing in for the etcd keyspace, and m3-style client failover
via FailoverSession.
"""

import time

import pytest
import requests

from aresdb_tpu.cluster.failover import FailoverSession, parse_addresses
from aresdb_tpu.controller.election import LeaderElector
from aresdb_tpu.controller.server import ControllerServer
from aresdb_tpu.controller.state import ControllerState

TTL = 0.6


def wait_for(pred, timeout=5.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(0.02)
    return False


# ---------------------------------------------------------------------------
# elector semantics
# ---------------------------------------------------------------------------

def test_single_elector_becomes_leader(tmp_path):
    e = LeaderElector(str(tmp_path), "a", "localhost:1", ttl=TTL)
    e.start()
    assert wait_for(lambda: e.is_leader)
    assert e.current_leader()["name"] == "a"
    e.stop()
    assert not e.is_leader


def test_exactly_one_leader(tmp_path):
    es = [LeaderElector(str(tmp_path), n, f"localhost:{i}", ttl=TTL)
          for i, n in enumerate("abc")]
    for e in es:
        e.start()
    assert wait_for(lambda: sum(e.is_leader for e in es) == 1)
    time.sleep(TTL * 2)  # stays single-leader across renewals
    assert sum(e.is_leader for e in es) == 1
    for e in es:
        e.stop()


def test_failover_on_resign_and_epoch_bumps(tmp_path):
    a = LeaderElector(str(tmp_path), "a", "localhost:1", ttl=TTL)
    b = LeaderElector(str(tmp_path), "b", "localhost:2", ttl=TTL)
    a.start()
    assert wait_for(lambda: a.is_leader)
    epoch0 = a.epoch
    b.start()
    time.sleep(TTL)
    assert not b.is_leader  # a holds the lease
    a.stop()  # resign drops the lease immediately
    assert wait_for(lambda: b.is_leader, timeout=TTL * 6)
    assert b.epoch > epoch0  # fencing token advanced
    b.stop()


def test_failover_on_crash_lease_expiry(tmp_path):
    a = LeaderElector(str(tmp_path), "a", "localhost:1", ttl=TTL)
    b = LeaderElector(str(tmp_path), "b", "localhost:2", ttl=TTL)
    a.start()
    assert wait_for(lambda: a.is_leader)
    # "crash": kill the thread without resigning — lease must expire
    a._stop.set()
    a._thread.join()
    b.start()
    assert wait_for(lambda: b.is_leader, timeout=TTL * 6)
    b.stop()


def test_callbacks_fire(tmp_path):
    events = []
    a = LeaderElector(str(tmp_path), "a", "localhost:1", ttl=TTL,
                      on_elected=lambda: events.append("up"),
                      on_revoked=lambda: events.append("down"))
    a.start()
    assert wait_for(lambda: events == ["up"])
    a.stop()
    assert events == ["up", "down"]


# ---------------------------------------------------------------------------
# HA controller servers + failover session
# ---------------------------------------------------------------------------

@pytest.fixture
def ha_pair(tmp_path):
    root = str(tmp_path)
    servers = []
    for name in ("c1", "c2"):
        s = ControllerServer(ControllerState(root), instance_name=name,
                             elect=True, lease_ttl=TTL)
        s.start_background()
        servers.append(s)
    assert wait_for(lambda: sum(s.elector.is_leader for s in servers) == 1)
    yield servers
    for s in servers:
        s.stop()


def leader_of(servers):
    return next(s for s in servers if s.elector.is_leader)


def follower_of(servers):
    return next(s for s in servers if not s.elector.is_leader)


def test_follower_rejects_with_leader_hint(ha_pair):
    lead, foll = leader_of(ha_pair), follower_of(ha_pair)
    r = requests.post(f"http://localhost:{foll.port}/namespaces",
                      json={"namespace": "ns1"})
    assert r.status_code == 503
    assert r.json()["leader"] == f"localhost:{lead.port}"
    # /leader endpoint is served by everyone
    r = requests.get(f"http://localhost:{foll.port}/leader")
    assert r.status_code == 200 and r.json()["isLeader"] is False


def test_failover_session_routes_to_leader(ha_pair):
    lead = leader_of(ha_pair)
    addrs = [f"localhost:{s.port}" for s in ha_pair]
    # deliberately prefer the follower first
    addrs.sort(key=lambda a: a == f"localhost:{lead.port}")
    fs = FailoverSession(addrs)
    r = fs.post(f"http://{addrs[0]}/namespaces", json={"namespace": "ns1"})
    assert r.status_code == 200
    r = fs.get(f"http://{addrs[0]}/namespaces")
    assert r.status_code == 200 and r.json() == ["ns1"]


def test_leader_kill_promotes_follower_with_state(ha_pair):
    lead, foll = leader_of(ha_pair), follower_of(ha_pair)
    addrs = f"localhost:{lead.port},localhost:{foll.port}"
    fs = FailoverSession(addrs)
    base = f"http://localhost:{lead.port}"
    assert fs.post(f"{base}/namespaces", json={"namespace": "ns1"}).status_code \
        == 200
    assert fs.post(f"{base}/schema/ns1/tables", json={
        "name": "trips",
        "columns": [{"name": "request_at", "type": "Uint32"},
                    {"name": "id", "type": "Uint32"}],
        "primaryKeyColumns": [1], "isFactTable": True,
        "config": {"batchSize": 64},
    }).status_code == 200

    lead.stop()  # kill the leader
    assert wait_for(lambda: foll.elector.is_leader, timeout=TTL * 8)
    # same session keeps working and the promoted leader reloaded the
    # previous leader's persisted mutations
    r = fs.get(f"{base}/schema/ns1/tables")
    assert r.status_code == 200
    assert [t["name"] for t in r.json()] == ["trips"]


def test_parse_addresses():
    assert parse_addresses("a:1") == ["a:1"]
    assert parse_addresses("a:1, b:2 ,c:3") == ["a:1", "b:2", "c:3"]


def test_failover_session_passthrough_unknown_host(ha_pair):
    c1, c2 = ha_pair
    # session only knows c1; a URL at c2 is outside the controller list
    # and must pass through to c2 untouched (no rewrite, no rotation)
    fs = FailoverSession([f"localhost:{c1.port}"])
    r = fs.get(f"http://localhost:{c2.port}/leader")
    assert r.status_code == 200
    assert r.json()["name"] == c2.elector.name


def test_stale_leader_steps_down_instead_of_blind_renew(tmp_path):
    """Regression: a leader that paused past its ttl must not overwrite a
    successor's (or soon-to-be successor's) lease on wake — renewal
    re-checks ownership AND expiry under the claim lock."""
    import json
    import time as _time

    e = LeaderElector(str(tmp_path), "a", "localhost:1", ttl=TTL)
    e.start()
    try:
        assert wait_for(lambda: e.is_leader)
        # simulate a long pause: force the stored lease to be expired
        from aresdb_tpu.controller.election import LEASE_KEY
        lease = json.loads(e.kv.get(LEASE_KEY))
        lease["expires"] = _time.time() - 1
        e.kv.put(LEASE_KEY, json.dumps(lease))
        e._renew()
        assert not e.is_leader
    finally:
        e.stop()


# ---------------------------------------------------------------------------
# KV seam: the same election semantics against the in-memory fake
# (cluster/kvstore.py — an etcd client is one adapter of this interface)
# ---------------------------------------------------------------------------

def test_election_on_memory_kvstore():
    from aresdb_tpu.cluster.kvstore import MemoryKVStore

    kv = MemoryKVStore()
    a = LeaderElector(name="a", address="localhost:1", ttl=TTL, kv=kv)
    b = LeaderElector(name="b", address="localhost:2", ttl=TTL, kv=kv)
    a.start()
    b.start()
    try:
        assert wait_for(lambda: a.is_leader or b.is_leader)
        time.sleep(TTL)
        assert sum([a.is_leader, b.is_leader]) == 1
        leader, other = (a, b) if a.is_leader else (b, a)
        epoch0 = leader.epoch
        leader.stop()  # resign -> failover
        assert wait_for(lambda: other.is_leader, timeout=TTL * 6)
        assert other.epoch > epoch0  # fencing token advanced
    finally:
        a.stop()
        b.stop()


def test_memory_kvstore_cas_semantics():
    from aresdb_tpu.cluster.kvstore import MemoryKVStore

    kv = MemoryKVStore()
    assert kv.cas("k", None, "v1")        # create-if-absent
    assert not kv.cas("k", None, "v2")    # exists now
    assert not kv.cas("k", "wrong", "v2")
    assert kv.cas("k", "v1", "v2")
    assert kv.get("k") == "v2"
    kv.delete("k")
    assert kv.get("k") is None


def test_file_kvstore_cas_matches_fake(tmp_path):
    from aresdb_tpu.cluster.kvstore import FileKVStore, MemoryKVStore

    for kv in (FileKVStore(str(tmp_path)), MemoryKVStore()):
        assert kv.cas("x", None, "a")
        assert not kv.cas("x", None, "b")
        assert kv.cas("x", "a", "b")
        assert kv.get("x") == "b"
        kv.put("x", "c")
        assert kv.get("x") == "c"
        kv.delete("x")
        assert kv.get("x") is None
