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
                       timezone_table=cfg.query.timezone_table.table_name)
    return server, memstore, scheduler


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="aresd", description=__doc__)
    p.add_argument("--config", help="YAML config file")
    p.add_argument("--port", type=int, help="HTTP port")
    p.add_argument("--root-path", dest="root_path", help="data root directory")
    p.add_argument("--scheduler-off", action="store_true", default=None)
    args = p.parse_args(argv)

    from aresdb_tpu.common.config import AresServerConfig

    overrides = {}
    if args.port is not None:
        overrides["port"] = args.port
    if args.root_path is not None:
        overrides["root_path"] = args.root_path
    if args.scheduler_off:
        overrides["scheduler_off"] = True
    cfg = AresServerConfig.load(args.config, overrides)

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
