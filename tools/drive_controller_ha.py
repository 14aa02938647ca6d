"""Controller HA drive: 2 controller replicas (lease election over a
shared root), datanodes + broker configured with the controller LIST.
SIGKILL the leader mid-run; everything must keep working after the lease
TTL with no lost rows.

Parity: controller/tasks/etcd/leader_elector.go failover story, driven as
real OS processes like tools/drive_cluster_procs.py.
"""
import os, signal, subprocess, sys, tempfile, time
os.environ["JAX_PLATFORMS"] = "cpu"
import requests, numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
procs = {}
def spawn(name, mod, *args):
    p = subprocess.Popen([sys.executable, "-m", mod, *args], env=env,
                         cwd=sys.path[0], stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    procs[name] = p
    return p

def wait_http(url, timeout=90):
    for _ in range(timeout * 2):
        try:
            requests.get(url, timeout=1)
            return
        except Exception:
            time.sleep(0.5)
    raise RuntimeError(f"no server at {url}")

CTL = "localhost:9571,localhost:9572"
TTL = "1.5"

try:
    ctrl_root = tempfile.mkdtemp()
    for i, port in enumerate((9571, 9572)):
        spawn(f"ctl{i}", "aresdb_tpu.cmd.controller", "--port", str(port),
              "--root-path", ctrl_root, "--elect", "--lease-ttl", TTL,
              "--instance", f"ctl{i}")
        wait_http(f"http://localhost:{port}/leader")

    def leader_port(timeout=15):
        deadline = time.time() + timeout
        while time.time() < deadline:
            for port in (9571, 9572):
                try:
                    d = requests.get(f"http://localhost:{port}/leader",
                                     timeout=1).json()
                    if d.get("isLeader"):
                        return port
                except Exception:
                    pass
            time.sleep(0.2)
        raise RuntimeError("no leader elected")

    lp = leader_port()
    print("leader:", lp, flush=True)

    from aresdb_tpu.cluster.failover import FailoverSession
    fs = FailoverSession(CTL)
    base = f"http://localhost:9571"
    assert fs.post(f"{base}/namespaces",
                   json={"namespace": "prod"}).status_code == 200
    assert fs.post(f"{base}/schema/prod/tables", json={
        "name": "trips", "columns": [
            {"name": "ts", "type": "Uint32"}, {"name": "id", "type": "Uint32"},
            {"name": "v", "type": "Float32"}],
        "primaryKeyColumns": [1], "isFactTable": True,
        "config": {"batchSize": 4096, "recordRetentionInDays": 0}}
        ).status_code == 200

    for i in (0, 1):
        spawn(f"dn{i}", "aresdb_tpu.cmd.aresd", "--port", str(9581 + i),
              "--root-path", tempfile.mkdtemp(), "--controller", CTL,
              "--namespace", "prod", "--instance", f"dn{i}")
        wait_http(f"http://localhost:{9581 + i}/health")
    assert fs.post(f"{base}/placement/prod/datanode", json={
        "numShards": 2, "replicaFactor": 1,
        "instances": ["dn0", "dn1"]}).status_code == 200
    deadline = time.time() + 40
    while time.time() < deadline:
        p = fs.get(f"{base}/placement/prod/datanode").json()
        states = [st for sd in p["shards"] for st in sd["instances"].values()]
        if states and all(s == "Available" for s in states):
            break
        time.sleep(0.5)
    else:
        raise RuntimeError(f"placement never converged: {p}")

    spawn("broker", "aresdb_tpu.cmd.broker", "--port", "9591",
          "--controller", CTL, "--namespace", "prod")
    wait_http("http://localhost:9591/health")

    NOW = int(time.time())
    from aresdb_tpu.client import Connector
    total = 0
    for sid in range(2):
        owner = next(sd["instances"] for sd in p["shards"]
                     if sd["shardId"] == sid)
        port = 9581 + int(next(iter(owner))[-1])
        n = 3000
        Connector("localhost", port).insert_columns("trips", {
            "ts": np.full(n, NOW - 60, np.uint32),
            "id": np.arange(total, total + n, dtype=np.uint32),
            "v": np.ones(n, np.float32)}, shard_id=sid)
        total += n

    def broker_count():
        r = requests.post("http://localhost:9591/query/aql",
                          json={"queries": [{
            "table": "trips", "measures": [{"sqlExpression": "count(*)"}],
            "now": NOW}]}, timeout=10).json()
        assert not r.get("errors"), r
        return r["results"][0][""]

    assert broker_count() == float(total)
    print("pre-kill broker count OK:", total, flush=True)

    # --- SIGKILL the leader controller ---
    victim = "ctl0" if lp == 9571 else "ctl1"
    procs[victim].send_signal(signal.SIGKILL)
    procs[victim].wait()
    print("killed leader", victim, flush=True)

    t0 = time.time()
    new_lp = leader_port(timeout=30)
    took = time.time() - t0
    assert new_lp != lp, "survivor must take leadership"
    print(f"failover to {new_lp} in {took:.1f}s (ttl {TTL}s)", flush=True)

    # queries keep working throughout
    assert broker_count() == float(total)

    # schema ops keep working via the same failover session
    assert fs.post(f"{base}/schema/prod/tables", json={
        "name": "cities", "columns": [
            {"name": "id", "type": "Uint16"}],
        "primaryKeyColumns": [0], "isFactTable": False,
        "config": {"batchSize": 64}}).status_code == 200
    tables = [t["name"] for t in fs.get(f"{base}/schema/prod/tables").json()]
    assert sorted(tables) == ["cities", "trips"], tables

    # datanodes keep heartbeating to the survivor; ingest + query again
    n = 1000
    Connector("localhost", 9581).insert_columns("trips", {
        "ts": np.full(n, NOW - 30, np.uint32),
        "id": np.arange(total, total + n, dtype=np.uint32),
        "v": np.ones(n, np.float32)}, shard_id=0)
    total += n
    deadline = time.time() + 15
    while time.time() < deadline and broker_count() != float(total):
        time.sleep(0.5)
    assert broker_count() == float(total)
    print("post-failover ingest+query OK:", total, flush=True)
    print("controller HA drive OK", flush=True)
finally:
    for p in procs.values():
        if p.poll() is None:
            p.send_signal(signal.SIGKILL)
            p.wait()
