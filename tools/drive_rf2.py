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
    procs.append(p); return p
def wait_http(url, timeout=90):
    for _ in range(timeout * 2):
        try:
            requests.get(url, timeout=1); return
        except Exception:
            time.sleep(0.5)
    raise RuntimeError(url)
try:
    spawn("aresdb_tpu.cmd.controller", "--port", "9472",
          "--root-path", tempfile.mkdtemp())
    wait_http("http://localhost:9472/namespaces")
    base = "http://localhost:9472"
    requests.post(f"{base}/namespaces", json={"namespace": "prod"})
    requests.post(f"{base}/schema/prod/tables", json={
        "name": "t", "columns": [
            {"name": "ts", "type": "Uint32"}, {"name": "id", "type": "Uint32"},
            {"name": "v", "type": "Float32"}],
        "primaryKeyColumns": [1], "isFactTable": True,
        "config": {"batchSize": 4096, "recordRetentionInDays": 0}})
    for i in (0, 1):
        spawn("aresdb_tpu.cmd.aresd", "--port", str(9485 + i),
              "--root-path", tempfile.mkdtemp(), "--controller",
              "localhost:9472", "--namespace", "prod", "--instance", f"dn{i}")
        wait_http(f"http://localhost:{9485 + i}/health")
    requests.post(f"{base}/placement/prod/datanode", json={
        "numShards": 2, "replicaFactor": 2, "instances": ["dn0", "dn1"]})
    deadline = time.time() + 40
    while time.time() < deadline:
        p = requests.get(f"{base}/placement/prod/datanode").json()
        states = [st for sd in p["shards"] for st in sd["instances"].values()]
        if len(states) == 4 and all(s == "Available" for s in states):
            break
        time.sleep(0.5)
    else:
        raise RuntimeError(p)
    print("RF2 placement:", [(sd["shardId"], sd["instances"])
                             for sd in p["shards"]], flush=True)
    spawn("aresdb_tpu.cmd.broker", "--port", "9492",
          "--controller", "localhost:9472", "--namespace", "prod")
    wait_http("http://localhost:9492/health")
    NOW = int(time.time())
    from aresdb_tpu.client import Connector
    rng = np.random.RandomState(0)
    total = 0
    for sid in range(2):
        n = 4000
        cols = {"ts": np.full(n, NOW - 30, np.uint32),
                "id": np.arange(total, total + n, dtype=np.uint32),
                "v": np.ones(n, np.float32)}
        # write to BOTH replicas (redolog-topic stand-in)
        for port in (9485, 9486):
            Connector("localhost", port).insert_columns("t", dict(cols),
                                                        shard_id=sid)
        total += n
    q = {"queries": [{"table": "t",
                      "measures": [{"sqlExpression": "count(*)"}],
                      "now": NOW}]}
    r = requests.post("http://localhost:9492/query/aql", json=q).json()
    print("count RF2:", r["results"][0], "expect", float(total), flush=True)
    assert r["results"][0][""] == float(total)
    # kill dn0: the broker must fail over to dn1's replicas
    procs[1].send_signal(signal.SIGKILL); procs[1].wait()
    ok = False
    for attempt in range(30):
        r = requests.post("http://localhost:9492/query/aql", json=q).json()
        if not r.get("errors") and r["results"][0].get("") == float(total):
            ok = True
            break
        time.sleep(1)
    print(f"after dn0 kill (attempt {attempt}):",
          r.get("errors") or r["results"][0], flush=True)
    assert ok, "broker never failed over"
    print("RF2 failover drive OK", flush=True)
finally:
    for p in procs:
        if p.poll() is None:
            p.send_signal(signal.SIGKILL); p.wait()
