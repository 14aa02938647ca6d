"""REST API server: query, data, schema, enum, health, debug endpoints.

Reference: api/ (query_handler.go /query/aql + /query/sql with a bounded
worker pool :95, data_handler.go /data/{table}/{shard}, schema_handler.go,
enum_handler.go, health, debug_handler.go's inspection + manual-job
endpoints) wired by cmd/aresd/cmd/cmd.go:270-283.
"""

from __future__ import annotations

import json
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Optional

import tornado.ioloop
import tornado.web

from aresdb_tpu.common.schema import Table
from aresdb_tpu.common.upsert_batch import UpsertBatch
from aresdb_tpu.query.service import QueryService
from aresdb_tpu.utils import metrics as M

QUERY_WORKERS = 8


class _Base(tornado.web.RequestHandler):
    def initialize(self, ctx):
        self.ctx = ctx

    def write_json(self, obj, status: int = 200):
        self.set_status(status)
        self.set_header("Content-Type", "application/json")
        self.finish(json.dumps(obj, default=str))

    def write_error_json(self, status: int, message: str):
        self.write_json({"message": message}, status=status)

    def json_body(self) -> Dict[str, Any]:
        try:
            return json.loads(self.request.body or b"{}")
        except json.JSONDecodeError as e:
            raise tornado.web.HTTPError(400, reason=f"invalid json: {e}")


class ServerContext:
    def __init__(self, memstore, scheduler=None, timezone_table: str = ""):
        self.memstore = memstore
        self.scheduler = scheduler
        self.query_service = QueryService(memstore,
                                          timezone_table=timezone_table)
        self.query_pool = ThreadPoolExecutor(max_workers=QUERY_WORKERS)
        self.metrics = M.root()


class HealthHandler(_Base):
    def get(self):
        self.finish("OK")

    def head(self):
        self.finish()


class AQLHandler(_Base):
    async def post(self):
        self.ctx.metrics.count(M.QUERY_RECEIVED)
        body = self.json_body()
        loop = tornado.ioloop.IOLoop.current()
        with self.ctx.metrics.timer(M.QUERY_LATENCY):
            resp = await loop.run_in_executor(
                self.ctx.query_pool,
                self.ctx.query_service.handle_aql, body)
        if resp.get("errors"):
            self.ctx.metrics.count(M.QUERY_FAILED)
        else:
            self.ctx.metrics.count(M.QUERY_SUCCEEDED)
        self.write_json(resp)


class SQLHandler(_Base):
    async def post(self):
        self.ctx.metrics.count(M.QUERY_RECEIVED)
        body = self.json_body()
        loop = tornado.ioloop.IOLoop.current()
        with self.ctx.metrics.timer(M.QUERY_LATENCY):
            resp = await loop.run_in_executor(
                self.ctx.query_pool,
                self.ctx.query_service.handle_sql, body)
        self.write_json(resp)


class DataHandler(_Base):
    def post(self, table: str, shard: str):
        """Binary upsert batch ingestion (reference api/data_handler.go:47)."""
        try:
            batch = UpsertBatch(self.request.body)
        except Exception as e:
            return self.write_error_json(400, f"bad upsert batch: {e}")
        try:
            stats = self.ctx.memstore.handle_ingestion(
                table, int(shard), batch)
        except KeyError as e:
            return self.write_error_json(404, str(e))
        except ValueError as e:
            return self.write_error_json(400, str(e))
        self.ctx.metrics.count(M.INGESTED_UPSERT_BATCHES,
                               tags={"table": table, "shard": shard})
        self.ctx.metrics.count(M.INGESTED_RECORDS, batch.num_rows,
                               tags={"table": table, "shard": shard})
        self.write_json({
            "inserted": stats.inserted,
            "updated": stats.updated,
            "backfilled": stats.backfilled,
        })


class TablesHandler(_Base):
    def get(self):
        self.write_json(sorted(self.ctx.memstore.get_schemas()))

    def post(self):
        body = self.json_body()
        try:
            table = Table.from_json(body)
            self.ctx.memstore.create_table(table)
            self.ctx.memstore.add_table_shard(table.name, 0)
        except ValueError as e:
            return self.write_error_json(400, str(e))
        self.write_json({"message": "table created"}, status=200)


class TableHandler(_Base):
    def get(self, name: str):
        try:
            schema = self.ctx.memstore.get_schema(name)
        except KeyError as e:
            return self.write_error_json(404, str(e))
        self.write_json(schema.table.to_json())

    def put(self, name: str):
        body = self.json_body()
        try:
            table = Table.from_json(body)
            if table.name != name:
                return self.write_error_json(400, "table name mismatch")
            self.ctx.memstore.metastore.update_table(table)
            self.ctx.memstore.get_schema(name).set_table(table)
        except (KeyError, ValueError) as e:
            return self.write_error_json(400, str(e))
        self.write_json({"message": "table updated"})

    def delete(self, name: str):
        try:
            self.ctx.memstore.get_schema(name)
        except KeyError as e:
            return self.write_error_json(404, str(e))
        self.ctx.memstore.remove_table_shard(name, 0)
        self.ctx.memstore.metastore.delete_table(name)
        self.ctx.memstore.schemas.pop(name, None)
        self.write_json({"message": "table deleted"})


class ColumnHandler(_Base):
    def delete(self, table: str, column: str):
        """Delete (tombstone) a column (reference api/schema_handler.go
        DeleteColumn + memstore TableShard.DeleteColumn)."""
        ms = self.ctx.memstore
        try:
            schema = ms.get_schema(table)
        except KeyError as e:
            return self.write_error_json(404, str(e))
        cid = schema.column_ids.get(column)
        if cid is None:
            return self.write_error_json(404, f"unknown column {column!r}")
        if not schema.get_column_deletable(cid):
            return self.write_error_json(
                400, f"column {column!r} cannot be deleted (primary key or "
                     f"time column)")
        t = schema.table
        t.columns[cid].deleted = True
        t.version += 1
        if ms.metastore is not None:
            ms.metastore.update_table(t)
        schema.set_table(t)
        # drop in-memory + on-disk data
        for (tname, sid) in list(ms.shards):
            if tname != table:
                continue
            shard = ms.get_table_shard(tname, sid)
            for b in shard.live_store.batches.values():
                b.columns.pop(cid, None)
            version = shard.archive_store.get_current_version()
            for ab in version.batches.values():
                ab.evict_column(cid)
            if ms.diskstore is not None:
                ms.diskstore.delete_column(tname, sid, cid)
        self.write_json({"message": f"column {column} deleted"})


class EnumHandler(_Base):
    def get(self, table: str, column: str):
        try:
            schema = self.ctx.memstore.get_schema(table)
        except KeyError as e:
            return self.write_error_json(404, str(e))
        self.write_json(schema.enum_reverse_dict(column))

    def post(self, table: str, column: str):
        body = self.json_body()
        cases = body.get("enumCases", [])
        try:
            schema = self.ctx.memstore.get_schema(table)
            ranks = schema.extend_enum(column, cases)
            if self.ctx.memstore.metastore is not None:
                self.ctx.memstore.metastore.extend_enum_cases(
                    table, column, cases)
        except KeyError as e:
            return self.write_error_json(404, str(e))
        self.write_json(ranks)


class ShardsDebugHandler(_Base):
    def get(self):
        out = []
        for table, shard_id in self.ctx.memstore.list_shards():
            shard = self.ctx.memstore.get_table_shard(table, shard_id)
            ls = shard.live_store
            out.append({
                "table": table,
                "shard": shard_id,
                "rowsVisible": ls.rows_visible(),
                "liveBatches": len(ls.batches),
                "primaryKeys": len(ls.primary_key),
                "archivingCutoff": ls.archiving_cutoff_high_watermark,
                "archiveBatches": len(
                    shard.archive_store.get_current_version().batches),
                "bytesEstimate": ls.bytes_estimate(),
            })
        self.write_json(out)


class ShardDebugHandler(_Base):
    def get(self, table: str, shard: str):
        try:
            s = self.ctx.memstore.get_table_shard(table, int(shard))
        except KeyError as e:
            return self.write_error_json(404, str(e))
        ls = s.live_store
        version = s.archive_store.get_current_version()
        self.write_json({
            "liveStore": {
                "batchSize": ls.batch_size,
                "batches": {str(b): ls.visible_rows_in_batch(b)
                            for b in ls.get_batch_ids()},
                "lastReadRecord": [ls.last_read_record.batch_id,
                                   ls.last_read_record.index],
                "primaryKeys": len(ls.primary_key),
                "archivingCutoff": ls.archiving_cutoff_high_watermark,
            },
            "archiveStore": {
                "cutoff": version.archiving_cutoff,
                "batches": {str(b): {"size": ab.size, "version": ab.version,
                                     "seq": ab.seq}
                            for b, ab in version.batches.items()},
            },
        })


class JobsDebugHandler(_Base):
    def get(self):
        if self.ctx.scheduler is None:
            return self.write_json({})
        self.write_json(self.ctx.scheduler.job_statuses())


class JobTriggerHandler(_Base):
    def post(self, table: str, shard: str, job: str):
        if self.ctx.scheduler is None:
            return self.write_error_json(400, "scheduler not running")
        try:
            result = self.ctx.scheduler.run_job(table, int(shard), job)
        except (KeyError, ValueError) as e:
            return self.write_error_json(400, str(e))
        self.write_json({"job": job, "result": result})


class DevicesDebugHandler(_Base):
    def get(self):
        from aresdb_tpu.utils import jax_env
        try:
            devices = [
                {"id": d.id, "platform": d.platform, "kind": d.device_kind}
                for d in jax_env.devices()
            ]
        except Exception as e:
            devices = [{"error": str(e)}]
        self.write_json(devices)


class HostMemoryDebugHandler(_Base):
    def get(self):
        hmm = self.ctx.memstore.host_memory_manager
        self.write_json({
            "reserved": hmm.get_reserved_memory(),
        })


class MetricsHandler(_Base):
    def get(self):
        self.write_json(self.ctx.metrics.snapshot())


class RedologBrowserHandler(_Base):
    """Debug browsing of redolog files / upsert batches.

    Reference: memstore/redo_log_browser.go:28 exposed through
    api/debug_handler.go (ListRedoLogs / ListUpsertBatches / ReadUpsertBatch).
    """

    def get(self, table: str, shard: str, rest: str = ""):
        from aresdb_tpu.common.upsert_batch import UpsertBatch

        ms = self.ctx.memstore
        sid = int(shard)
        try:
            sh = ms.get_table_shard(table, sid)
        except KeyError as e:
            return self.write_error_json(404, str(e))
        rm = sh.redolog_manager
        if rm is None:
            return self.write_json([])
        parts = [p for p in rest.split("/") if p]
        if not parts:
            # list redolog files
            return self.write_json(ms.diskstore.list_logs(table, sid))
        creation = int(parts[0])
        batches = []
        for rf, off, payload in rm.iterate(creation, 0):
            if rf != creation:
                continue
            if len(parts) >= 2 and off == int(parts[1]):
                b = UpsertBatch(payload)
                rows = []
                for r in range(min(b.num_rows, 100)):
                    rows.append([c.read_value(r) for c in b.columns])
                return self.write_json({
                    "numRows": b.num_rows,
                    "columns": [c.column_id for c in b.columns],
                    "rows": rows,
                })
            batches.append({"offset": off, "bytes": len(payload)})
        if len(parts) >= 2:
            return self.write_error_json(404, "no such batch offset")
        self.write_json(batches)


class DeviceCacheDebugHandler(_Base):
    def get(self):
        from aresdb_tpu.query.executor import GLOBAL_DEVICE_CACHE
        self.write_json(GLOBAL_DEVICE_CACHE.stats())


class ProfilerHandler(_Base):
    """XLA profiler capture (parity: cudaProfilerStart/Stop via
    /dbg/profiler, reference cgoutils/memory.go:160 + debug_handler)."""

    def post(self, action: str):
        import jax

        if action == "start":
            d = self.json_body().get("dir", "/tmp/ares-profile")
            try:
                jax.profiler.start_trace(d)
            except Exception as e:
                return self.write_error_json(400, str(e))
            self.write_json({"message": f"tracing to {d}"})
        else:
            try:
                jax.profiler.stop_trace()
            except Exception as e:
                return self.write_error_json(400, str(e))
            self.write_json({"message": "trace stopped"})


_DEBUG_HTML = """<!doctype html><html><head><title>aresdb_tpu debug</title>
<style>body{font-family:monospace;margin:2em}table{border-collapse:collapse}
td,th{border:1px solid #999;padding:4px 8px}h2{margin-top:1.2em}</style>
</head><body><h1>aresdb_tpu debug</h1>
<div id=out>loading...</div>
<script>
async function j(u){return await (await fetch(u)).json()}
async function main(){
  const shards = await j('/dbg/shards');
  const jobs = await j('/dbg/jobs');
  const cache = await j('/dbg/device-cache');
  const devices = await j('/dbg/devices');
  let h = '<h2>Shards</h2><table><tr><th>table</th><th>shard</th>'
    + '<th>rows</th><th>batches</th><th>pks</th><th>cutoff</th>'
    + '<th>archive batches</th></tr>';
  for (const s of shards) h += `<tr><td>${s.table}</td><td>${s.shard}</td>`
    + `<td>${s.rowsVisible}</td><td>${s.liveBatches}</td>`
    + `<td>${s.primaryKeys}</td><td>${s.archivingCutoff}</td>`
    + `<td>${s.archiveBatches}</td></tr>`;
  h += '</table><h2>Jobs</h2><pre>' + JSON.stringify(jobs, null, 1)
    + '</pre><h2>Device cache</h2><pre>' + JSON.stringify(cache, null, 1)
    + '</pre><h2>Devices</h2><pre>' + JSON.stringify(devices, null, 1)
    + '</pre>';
  document.getElementById('out').innerHTML = h;
}
main(); setInterval(main, 5000);
</script></body></html>"""


class DebugUIHandler(_Base):
    def get(self):
        self.set_header("Content-Type", "text/html")
        self.finish(_DEBUG_HTML)


# -- peer data copy (reference: datanode/bootstrap/bootstrap_server.go
# FetchTableShardMetaData + FetchVectorPartyRawData gRPC streaming; here the
# same roles over HTTP chunked transfer) --

class PeerMetadataHandler(_Base):
    def get(self, table: str, shard: str):
        from aresdb_tpu.memstore.common import GLOBAL_BOOTSTRAP_TOKEN

        ms = self.ctx.memstore
        sid = int(shard)
        try:
            ms.get_table_shard(table, sid)
        except KeyError as e:
            return self.write_error_json(404, str(e))
        # hold off data jobs while a peer snapshots this shard's metadata
        GLOBAL_BOOTSTRAP_TOKEN.acquire(table, sid)
        GLOBAL_BOOTSTRAP_TOKEN.release(table, sid)
        meta = ms.metastore
        ds = ms.diskstore
        cutoff = meta.get_archiving_cutoff(table, sid)
        batches = meta.get_archive_batches(table, sid, cutoff)
        rf, off = meta.get_backfill_progress(table, sid)
        srf, soff, sbid, sidx = meta.get_snapshot_progress(table, sid)
        self.write_json({
            "archivingCutoff": cutoff,
            "batches": {str(b): list(v) for b, v in batches.items()},
            "backfillProgress": [rf, off],
            "snapshotProgress": [srf, soff, sbid, sidx],
            "redologs": ds.list_logs(table, sid),
            "archiveColumns": {
                f"{b}_{v[0]}_{v[1]}": ds.list_archive_batch_columns(
                    table, sid, b, v[0], v[1])
                for b, v in batches.items()
            },
            "snapshotBatches": {
                str(b): ds.list_snapshot_batch_columns(
                    table, sid, srf, soff, b)
                for b in ds.list_snapshot_batches(table, sid, srf, soff)
            },
        })


class PeerArchiveFileHandler(_Base):
    def get(self, table, shard, batch, version, seq, col):
        data = self.ctx.memstore.diskstore.read_archive_column(
            table, int(shard), int(batch), int(version), int(seq), int(col))
        if data is None:
            return self.write_error_json(404, "no such archive column")
        self.set_header("Content-Type", "application/octet-stream")
        self.finish(data)


class PeerSnapshotFileHandler(_Base):
    def get(self, table, shard, rf, off, batch, col):
        data = self.ctx.memstore.diskstore.read_snapshot_column(
            table, int(shard), int(rf), int(off), int(batch), int(col))
        if data is None:
            return self.write_error_json(404, "no such snapshot column")
        self.set_header("Content-Type", "application/octet-stream")
        self.finish(data)


class PeerRedologHandler(_Base):
    def get(self, table, shard, creation_time):
        import os
        p = self.ctx.memstore.diskstore.redolog_path(
            table, int(shard), int(creation_time))
        if not os.path.exists(p):
            return self.write_error_json(404, "no such redolog")
        self.set_header("Content-Type", "application/octet-stream")
        with open(p, "rb") as f:
            while True:
                chunk = f.read(1 << 20)
                if not chunk:
                    break
                self.write(chunk)
        self.finish()


def make_app(ctx: ServerContext) -> tornado.web.Application:
    a = {"ctx": ctx}
    return tornado.web.Application([
        (r"/health", HealthHandler, a),
        (r"/query/aql", AQLHandler, a),
        (r"/query/sql", SQLHandler, a),
        (r"/data/([^/]+)/(\d+)", DataHandler, a),
        (r"/schema/tables", TablesHandler, a),
        (r"/schema/tables/([^/]+)", TableHandler, a),
        (r"/schema/tables/([^/]+)/columns/([^/]+)/enum-cases", EnumHandler, a),
        (r"/schema/tables/([^/]+)/columns/([^/]+)", ColumnHandler, a),
        (r"/dbg/shards", ShardsDebugHandler, a),
        (r"/dbg/jobs", JobsDebugHandler, a),
        (r"/dbg/devices", DevicesDebugHandler, a),
        (r"/dbg/host-memory", HostMemoryDebugHandler, a),
        (r"/dbg/([^/]+)/(\d+)/(archiving|backfill|snapshot|purge)",
         JobTriggerHandler, a),
        (r"/dbg/([^/]+)/(\d+)/redologs/?(.*)", RedologBrowserHandler, a),
        (r"/dbg/device-cache", DeviceCacheDebugHandler, a),
        (r"/dbg/profiler/(start|stop)", ProfilerHandler, a),
        (r"/dbg/?", DebugUIHandler, a),
        (r"/dbg/([^/]+)/(\d+)", ShardDebugHandler, a),
        (r"/metrics", MetricsHandler, a),
        (r"/peer/([^/]+)/(\d+)/metadata", PeerMetadataHandler, a),
        (r"/peer/([^/]+)/(\d+)/archive/(-?\d+)/(\d+)/(\d+)/(\d+)",
         PeerArchiveFileHandler, a),
        (r"/peer/([^/]+)/(\d+)/snapshot/(\d+)/(\d+)/(-?\d+)/(\d+)",
         PeerSnapshotFileHandler, a),
        (r"/peer/([^/]+)/(\d+)/redolog/(\d+)", PeerRedologHandler, a),
    ])


class ApiServer:
    """Embeddable server: used by cmd/aresd and by in-process tests."""

    def __init__(self, memstore, scheduler=None, port: int = 0,
                 timezone_table: str = ""):
        self.ctx = ServerContext(memstore, scheduler, timezone_table)
        self.app = make_app(self.ctx)
        self.port = port
        self._loop: Optional[tornado.ioloop.IOLoop] = None
        self._thread: Optional[threading.Thread] = None
        self._started = threading.Event()

    def start_background(self) -> int:
        """Start serving on a background thread; returns the bound port."""
        def run():
            import asyncio

            asyncio.set_event_loop(asyncio.new_event_loop())
            self._loop = tornado.ioloop.IOLoop.current()
            sockets = tornado.netutil.bind_sockets(self.port)
            self.port = sockets[0].getsockname()[1]
            server = tornado.httpserver.HTTPServer(self.app)
            server.add_sockets(sockets)
            self._started.set()
            self._loop.start()

        import tornado.httpserver
        import tornado.netutil

        self._thread = threading.Thread(target=run, daemon=True,
                                        name="ares-http")
        self._thread.start()
        self._started.wait(timeout=10)
        return self.port

    def stop(self):
        if self._loop is not None:
            self._loop.add_callback(self._loop.stop)
        if self._thread is not None:
            self._thread.join(timeout=5)

    def serve_forever(self):
        import tornado.httpserver
        import tornado.netutil

        sockets = tornado.netutil.bind_sockets(self.port)
        self.port = sockets[0].getsockname()[1]
        server = tornado.httpserver.HTTPServer(self.app)
        server.add_sockets(sockets)
        tornado.ioloop.IOLoop.current().start()
