import os, signal, subprocess, sys, tempfile, time
os.environ["JAX_PLATFORMS"] = "cpu"
import requests, numpy as np
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
procs = []
def spawn(mod, *args):
    p = subprocess.Popen([sys.executable, "-m", mod, *args], env=env,
                         cwd=sys.path[0], stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    procs.append(p)
    return p

def wait_http(url, timeout=90):
    for _ in range(timeout * 2):
        try:
            requests.get(url, timeout=1)
            return
        except Exception:
            time.sleep(0.5)
    raise RuntimeError(f"no server at {url}")

try:
    spawn("aresdb_tpu.cmd.controller", "--port", "9471",
          "--root-path", tempfile.mkdtemp())
    wait_http("http://localhost:9471/namespaces")
    base = "http://localhost:9471"
    requests.post(f"{base}/namespaces", json={"namespace": "prod"})
    requests.post(f"{base}/schema/prod/tables", json={
        "name": "trips", "columns": [
            {"name": "ts", "type": "Uint32"}, {"name": "id", "type": "Uint32"},
            {"name": "city", "type": "Uint16"}, {"name": "v", "type": "Float32"}],
        "primaryKeyColumns": [1], "isFactTable": True,
        "config": {"batchSize": 4096, "recordRetentionInDays": 0}})

    roots = [tempfile.mkdtemp(), tempfile.mkdtemp()]
    for i in (0, 1):
        spawn("aresdb_tpu.cmd.aresd", "--port", str(9481 + i),
              "--root-path", roots[i], "--controller", "localhost:9471",
              "--namespace", "prod", "--instance", f"dn{i}")
        wait_http(f"http://localhost:{9481 + i}/health")
    requests.post(f"{base}/placement/prod/datanode", json={
        "numShards": 4, "replicaFactor": 1, "instances": ["dn0", "dn1"]})
    deadline = time.time() + 40
    while time.time() < deadline:
        p = requests.get(f"{base}/placement/prod/datanode").json()
        states = [st for sd in p["shards"] for st in sd["instances"].values()]
        if states and all(s == "Available" for s in states):
            break
        time.sleep(0.5)
    else:
        raise RuntimeError(f"placement never converged: {p}")
    print("placement converged:", [(sd["shardId"], sd["instances"])
                                   for sd in p["shards"]], flush=True)

    spawn("aresdb_tpu.cmd.broker", "--port", "9491",
          "--controller", "localhost:9471", "--namespace", "prod")
    wait_http("http://localhost:9491/health")

    # ingest to each shard's owner
    NOW = int(time.time())
    from aresdb_tpu.client import Connector
    total = 0
    rng = np.random.RandomState(0)
    exp_sum = 0.0
    for sid in range(4):
        owner = next(sd["instances"] for sd in p["shards"]
                     if sd["shardId"] == sid)
        inst = next(iter(owner))
        port = 9481 + int(inst[-1])
        conn = Connector("localhost", port)
        n = 5000
        v = rng.rand(n).astype(np.float32)
        conn.insert_columns("trips", {
            "ts": np.full(n, NOW - 60, np.uint32),
            "id": np.arange(total, total + n, dtype=np.uint32),
            "city": rng.randint(0, 10, n).astype(np.uint16),
            "v": v}, shard_id=sid)
        exp_sum += float(v.astype(np.float64).sum())
        total += n
    # direct datanode checks first
    for port, shards in ((9481, [0, 2]), (9482, [1, 3])):
        rr = requests.post(f"http://localhost:{port}/query/aql",
                           json={"queries": [{
            "table": "trips", "shards": shards,
            "measures": [{"sqlExpression": "count(*)"}], "now": NOW}]}).json()
        print(f"dn@{port} shards={shards}:", rr.get("errors") or rr["results"][0], flush=True)
        print("  dbg:", requests.get(f"http://localhost:{port}/dbg/shards").json(), flush=True)
    r = requests.post("http://localhost:9491/query/aql", json={"queries": [{
        "table": "trips", "measures": [{"sqlExpression": "count(*)"}],
        "now": NOW}]}).json()
    print("broker count:", r["results"][0], "expect", float(total), flush=True)
    assert r["results"][0][""] == float(total)
    r = requests.post("http://localhost:9491/query/sql", json={"queries": [
        f"SELECT sum(v) FROM trips WHERE aql_now(ts, {NOW})"]}).json()
    got = r["results"][0][""]
    print("broker sum:", got, "expect", round(exp_sum, 2),
          "ok:", abs(got - exp_sum) < 0.5, flush=True)
    assert abs(got - exp_sum) < 0.5

    # elastic replacement: dn2 joins, peer-copies dn1's shards, dn1 leaves
    spawn("aresdb_tpu.cmd.aresd", "--port", "9483",
          "--root-path", tempfile.mkdtemp(), "--controller", "localhost:9471",
          "--namespace", "prod", "--instance", "dn2")
    wait_http("http://localhost:9483/health")
    rr = requests.post(f"{base}/placement/prod/datanode/replace",
                       json={"leaving": "dn1", "joining": "dn2"})
    assert rr.status_code == 200, rr.text
    deadline = time.time() + 60
    while time.time() < deadline:
        p2 = requests.get(f"{base}/placement/prod/datanode").json()
        dn2_states = [sd["instances"].get("dn2") for sd in p2["shards"]
                      if "dn2" in sd["instances"]]
        if len(dn2_states) == 2 and all(s == "Available" for s in dn2_states):
            break
        time.sleep(0.5)
    else:
        raise RuntimeError(f"dn2 never became available: {p2}")
    print("dn2 available; placement:",
          [(sd["shardId"], sd["instances"]) for sd in p2["shards"]], flush=True)
    # dn1 should be dropped from the placement once dn2 is Available
    assert not any("dn1" in sd["instances"] for sd in p2["shards"]), p2
    procs[2].send_signal(signal.SIGKILL); procs[2].wait()   # dn1 process
    time.sleep(6)
    r = requests.post("http://localhost:9491/query/aql", json={"queries": [{
        "table": "trips", "measures": [{"sqlExpression": "count(*)"}],
        "now": NOW}]}).json()
    print("after migration + dn1 kill:", r.get("errors") or r["results"][0],
          "expect", float(total), flush=True)
    assert r["results"][0][""] == float(total)
    print("real-process cluster drive OK (incl. elastic replacement)", flush=True)
finally:
    for p in procs:
        if p.poll() is None:
            p.send_signal(signal.SIGKILL)
            p.wait()
