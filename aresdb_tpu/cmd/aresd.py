"""aresd: the single-node (or datanode) daemon.

Reference: cmd/aresd/cmd/cmd.go:129-371 — metastore + diskstore + redolog +
memstore construction, schema fetch, shard recovery, scheduler start, HTTP
serving.

    python -m aresdb_tpu.cmd.aresd --port 9374 --root-path /tmp/ares-root
"""

from __future__ import annotations

import argparse
import sys


def build_server(cfg):
    from aresdb_tpu.api.server import ApiServer
    from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
    from aresdb_tpu.memstore.memstore import MemStore
    from aresdb_tpu.memstore.scheduler import Scheduler
    from aresdb_tpu.metastore.disk_metastore import DiskMetaStore

    metastore = DiskMetaStore(cfg.root_path)
    diskstore = LocalDiskStore(cfg.root_path)
    memstore = MemStore(metastore, diskstore,
                        total_memory_bytes=cfg.total_memory_size)
    memstore.fetch_schema()
    memstore.init_shards()

    scheduler = Scheduler(memstore)
    if not cfg.scheduler_off:
        scheduler.start()
        scheduler.enable()

    from aresdb_tpu.memstore.batchstats import BatchStatsReporter

    stats_reporter = BatchStatsReporter(memstore)
    stats_reporter.start()

    server = ApiServer(memstore, scheduler, port=cfg.port,
                       timezone_table=cfg.query.timezone_table.table_name,
                       query_config=cfg.query)
    return server, memstore, scheduler


def run_datanode(cfg) -> int:
    """Distributed mode (reference: cmd/aresd cluster flow — etcd advertise
    + topology watch replaced by the HTTP controller): the node registers
    with the controller, polls placement for its shard set, bootstraps
    shards from peers, and serves queries for its shards."""
    from aresdb_tpu.datanode.datanode import DataNode
    from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
    from aresdb_tpu.memstore.memstore import MemStore
    from aresdb_tpu.memstore.scheduler import Scheduler
    from aresdb_tpu.metastore.disk_metastore import DiskMetaStore

    memstore = MemStore(DiskMetaStore(cfg.root_path),
                        LocalDiskStore(cfg.root_path),
                        total_memory_bytes=cfg.total_memory_size)
    scheduler = Scheduler(memstore)
    if not cfg.scheduler_off:
        scheduler.start()
        scheduler.enable()
    node = DataNode(
        memstore, scheduler,
        controller_address=cfg.cluster.controller_address,
        namespace=cfg.cluster.namespace,
        instance_name=cfg.cluster.instance_name,
        port=cfg.port,
        heartbeat_seconds=cfg.cluster.heartbeat_interval_seconds)
    port = node.open()
    node.serve()
    print(f"aresd datanode {cfg.cluster.instance_name!r} serving on :{port} "
          f"(namespace={cfg.cluster.namespace}, "
          f"controller={cfg.cluster.controller_address})", file=sys.stderr)
    import threading
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        node.close()
        scheduler.stop()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="aresd", description=__doc__)
    p.add_argument("--config", help="YAML config file")
    p.add_argument("--port", type=int, help="HTTP port")
    p.add_argument("--root-path", dest="root_path", help="data root directory")
    p.add_argument("--scheduler-off", action="store_true", default=None)
    p.add_argument("--controller", help="controller host:port "
                   "(enables distributed datanode mode)")
    p.add_argument("--namespace", help="cluster namespace")
    p.add_argument("--instance", help="instance name in the placement")
    args = p.parse_args(argv)

    from aresdb_tpu.common.config import AresServerConfig

    overrides = {}
    if args.port is not None:
        overrides["port"] = args.port
    if args.root_path is not None:
        overrides["root_path"] = args.root_path
    if args.scheduler_off:
        overrides["scheduler_off"] = True
    if args.controller:
        overrides["cluster.enable"] = True
        overrides["cluster.distributed"] = True
        overrides["cluster.controller_address"] = args.controller
        overrides["cluster.namespace"] = args.namespace or "default"
        overrides["cluster.instance_name"] = args.instance or "datanode0"
    cfg = AresServerConfig.load(args.config, overrides)

    if cfg.cluster.enable and cfg.cluster.distributed:
        return run_datanode(cfg)

    server, memstore, scheduler = build_server(cfg)
    print(f"aresd serving on :{cfg.port} (root={cfg.root_path})",
          file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        scheduler.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
