"""Scaling-efficiency drive: 1 chip -> 1 host (mesh) -> N hosts (broker).

Measures the BASELINE.md config-5 curve on the virtual CPU backend:

  tier 1  one device        fused kernel, single chip
  tier 2  8-device mesh     same kernel row-sharded over ICI (shard_map),
                            partial group tables merged with all_gather
  tier 3  2-node cluster    broker scatter-gather over datanode processes,
                            4 hash shards, THEN a skew-aware rebalance
                            (controller weighs shards by heartbeat-reported
                            row counts) with exact-result checks before and
                            after the move.

On this CPU host all virtual devices share the same cores, so tier-2
"efficiency" is compute-contended and understates real ICI scaling; the
drive's job is to prove the paths execute and stay EXACT, and to report the
curve shape. Reference: broker/query_plan_agg.go scatter-gather.
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import requests

N_ROWS = 1 << 21  # 2M rows
ITERS = 4


def tier_kernels():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from aresdb_tpu import demo
    from aresdb_tpu.parallel import sharded
    from aresdb_tpu.query import kernels as K

    plan = demo.demo_plan()
    cols_np, _ = demo.demo_columns(plan, N_ROWS)

    # tier 1: single device
    columns = {k: (jnp.asarray(v), jnp.asarray(b))
               for k, (v, b) in cols_np.items()}
    fn1 = K.make_agg_kernel(plan, N_ROWS, 1 << 13)
    out = fn1(columns, (), np.int32(N_ROWS), np.int64(0))
    oracle_n = int(out[5])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(jnp.sum(fn1(columns, (), np.int32(N_ROWS), np.int64(0))[3]))
    rps1 = N_ROWS * ITERS / (time.perf_counter() - t0)

    # tier 2: 8-device mesh
    mesh = sharded.make_mesh(8)
    n_dev = mesh.devices.size
    rows_per_dev = N_ROWS // n_dev
    row_sharding = NamedSharding(mesh, P(sharded.SHARD_AXIS))
    cols_sh = {k: (jax.device_put(jnp.asarray(v), row_sharding),
                   jax.device_put(jnp.asarray(b), row_sharding))
               for k, (v, b) in cols_np.items()}
    n_valid = jax.device_put(
        jnp.asarray(sharded.per_shard_valid(N_ROWS, n_dev, rows_per_dev)),
        row_sharding)
    fn8 = sharded.make_sharded_agg_kernel(plan, rows_per_dev, 1 << 13, mesh)
    out8 = fn8(cols_sh, (), n_valid, jnp.int64(0))
    mesh_n = int(out8[4])
    assert mesh_n == oracle_n, f"mesh groups {mesh_n} != oracle {oracle_n}"
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(jnp.sum(fn8(cols_sh, (), n_valid, jnp.int64(0))[2]))
    rps8 = N_ROWS * ITERS / (time.perf_counter() - t0)

    eff = rps8 / (rps1 * n_dev)
    print(f"tier1 single-device: {rps1/1e6:.1f}M rows/s")
    print(f"tier2 {n_dev}-device mesh: {rps8/1e6:.1f}M rows/s "
          f"(speedup {rps8/rps1:.2f}x, per-device efficiency {eff:.2f} — "
          f"virtual devices share host cores)")
    print(f"tier2 exactness: {mesh_n} groups == oracle", flush=True)
    return rps1, rps8


def tier_cluster(tmp_path):
    from aresdb_tpu.broker.server import BrokerServer
    from aresdb_tpu.cluster.topology import DynamicTopology
    from aresdb_tpu.common import data_types as dt
    from aresdb_tpu.common.upsert_batch import build_columnar_upsert
    from aresdb_tpu.controller.server import ControllerServer
    from aresdb_tpu.controller.state import ControllerState
    from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
    from aresdb_tpu.datanode.datanode import DataNode
    from aresdb_tpu.memstore.memstore import MemStore
    from aresdb_tpu.metastore.disk_metastore import DiskMetaStore

    NOW = 1_600_000_000
    NS = "scale"
    ctrl = ControllerServer(ControllerState())
    cport = ctrl.start_background()
    base = f"http://localhost:{cport}"
    requests.post(f"{base}/namespaces", json={"namespace": NS})
    requests.post(f"{base}/schema/{NS}/tables", json={
        "name": "trips",
        "columns": [
            {"name": "request_at", "type": "Uint32"},
            {"name": "id", "type": "Uint32"},
            {"name": "city_id", "type": "Uint16"},
            {"name": "fare", "type": "Float32"}],
        "primaryKeyColumns": [1], "isFactTable": True,
        "config": {"batchSize": 1 << 19, "recordRetentionInDays": 0}})

    nodes = []
    for i in range(2):
        root = os.path.join(tmp_path, f"dn{i}")
        ms = MemStore(DiskMetaStore(root), LocalDiskStore(root))
        node = DataNode(ms, None, controller_address=f"localhost:{cport}",
                        namespace=NS, instance_name=f"dn{i}",
                        heartbeat_seconds=0.5, poll_seconds=0.3)
        node.open()
        node.serve()
        nodes.append(node)

    requests.post(f"{base}/placement/{NS}/datanode",
                  json={"numShards": 4, "replicaFactor": 1,
                        "instances": ["dn0", "dn1"]})
    deadline = time.time() + 20
    while time.time() < deadline:
        p = requests.get(f"{base}/placement/{NS}/datanode").json()
        states = [s for sd in p["shards"] for s in sd["instances"].values()]
        if states and all(s == "Available" for s in states):
            break
        time.sleep(0.2)
    else:
        raise RuntimeError("placement never converged")

    # skewed ingest: shard 0 gets 10x the rows of shards 1-3
    topo = DynamicTopology(f"localhost:{cport}", NS)
    view = topo.refresh()
    rng = np.random.RandomState(5)
    total_rows = 0
    next_id = 1
    per_shard = {0: 500_000, 1: 50_000, 2: 50_000, 3: 50_000}
    t_ing = time.perf_counter()
    for sid, n in per_shard.items():
        host = view.available_hosts(sid)[0]
        for off in range(0, n, 1 << 18):
            m = min(1 << 18, n - off)
            payload = build_columnar_upsert([
                (0, dt.Uint32,
                 NOW - rng.randint(0, 3600, m).astype(np.uint32), None, 0),
                (1, dt.Uint32,
                 np.arange(next_id, next_id + m, dtype=np.uint32), None, 0),
                (2, dt.Uint16,
                 rng.randint(1, 30, m).astype(np.uint16), None, 0),
                (3, dt.Float32, rng.rand(m).astype(np.float32), None, 0),
            ], m)
            next_id += m
            r = requests.post(f"http://{host.address}/data/trips/{sid}",
                              data=payload)
            assert r.status_code == 200, r.text
            total_rows += m
    print(f"tier3 ingest: {total_rows} rows (shard0 skewed 10x) in "
          f"{time.perf_counter()-t_ing:.1f}s", flush=True)

    broker = BrokerServer(topo)
    bport = broker.start_background()
    q = {"table": "trips", "measures": [{"sqlExpression": "count(*)"}],
         "dimensions": [{"sqlExpression": "city_id"}], "now": NOW}

    def broker_count():
        resp = requests.post(f"http://localhost:{bport}/query/aql",
                             json={"queries": [q]}).json()
        assert "errors" not in resp or not any(resp["errors"]), resp
        return sum(resp["results"][0].values())

    assert broker_count() == total_rows  # warm + exactness
    t0 = time.perf_counter()
    for _ in range(ITERS):
        assert broker_count() == total_rows
    rps_cluster = total_rows * ITERS / (time.perf_counter() - t0)
    print(f"tier3 broker over 2 nodes: {rps_cluster/1e6:.1f}M rows/s "
          f"(scatter-gather, exact count {total_rows})", flush=True)

    # -- skew-aware rebalance: controller sees shard 0's weight via
    # heartbeats; rebalance must isolate it and keep results exact
    time.sleep(1.5)  # let a heartbeat carry shard row counts
    r = requests.post(f"{base}/placement/{NS}/datanode/rebalance").json()
    print(f"rebalance: moves={r['moves']} load={r['load']}")
    deadline = time.time() + 60
    while time.time() < deadline:
        p = requests.get(f"{base}/placement/{NS}/datanode").json()
        states = [s for sd in p["shards"] for s in sd["instances"].values()]
        if states and all(s == "Available" for s in states):
            break
        time.sleep(0.3)
    else:
        raise RuntimeError(f"rebalance never converged: {p}")
    owners = {sd["shardId"]: list(sd["instances"]) for sd in p["shards"]}
    heavy_owner = owners[0][0]
    light = [o for sid, os_ in owners.items() if sid != 0 for o in os_]
    print(f"post-rebalance owners: {owners}")
    assert all(o != heavy_owner for o in light), \
        "skew-aware rebalance should isolate the heavy shard"
    topo.refresh()
    assert broker_count() == total_rows, "row loss after rebalance"
    print("post-rebalance count exact:", total_rows, flush=True)

    broker.stop()
    for n in nodes:
        n.close()
    ctrl.stop()
    return rps_cluster


def main():
    import tempfile

    rps1, rps8 = tier_kernels()
    rps_cluster = tier_cluster(tempfile.mkdtemp())
    print("\nscaling curve (virtual CPU devices, compute-contended):")
    print(f"  1 device : {rps1/1e6:9.1f}M rows/s")
    print(f"  8 devices: {rps8/1e6:9.1f}M rows/s")
    print(f"  2 nodes  : {rps_cluster/1e6:9.1f}M rows/s (HTTP broker path)")
    print("OK")


if __name__ == "__main__":
    main()
