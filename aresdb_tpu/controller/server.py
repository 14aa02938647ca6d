"""Controller HTTP service.

Reference: controller/handlers/{namespace,schema,membership,placement,
assignment}.go route surface. Clients: datanodes (schema fetch + heartbeat +
placement watch), brokers (schema + placement), subscribers (assignment).
"""

from __future__ import annotations

import json
import threading
from typing import Optional

import tornado.ioloop
import tornado.web

from aresdb_tpu.common.schema import Table
from aresdb_tpu.controller.state import ControllerState, Instance, JobConfig


class _Base(tornado.web.RequestHandler):
    def initialize(self, state: ControllerState, elector=None):
        self.state = state
        self.elector = elector

    def prepare(self):
        # HA mode: only the lease holder serves; followers answer 503 with
        # the leader's address so FailoverSession retries there (reference
        # leader_elector.go — only the elected controller runs tasks)
        if self.elector is not None and not self.elector.is_leader:
            lease = self.elector.current_leader()
            self.write_json(
                {"message": "not leader",
                 "leader": lease["address"] if lease else None}, 503)

    def write_json(self, obj, status: int = 200):
        self.set_status(status)
        self.set_header("Content-Type", "application/json")
        self.finish(json.dumps(obj, default=str))

    def body(self):
        try:
            return json.loads(self.request.body or b"{}")
        except json.JSONDecodeError as e:
            raise tornado.web.HTTPError(400, reason=str(e))

    def guard(self, fn):
        try:
            return fn()
        except KeyError as e:
            self.write_json({"message": str(e)}, 404)
        except ValueError as e:
            self.write_json({"message": str(e)}, 400)


class NamespacesHandler(_Base):
    def get(self):
        self.write_json(self.state.list_namespaces())

    def post(self):
        name = self.body().get("namespace", "")
        self.guard(lambda: (self.state.create_namespace(name),
                            self.write_json({"message": "created"}))[-1])


class SchemaHandler(_Base):
    def get(self, ns: str):
        def run():
            tables = self.state.get_tables(ns)
            self.write_json([t.to_json() for t in tables.values()])
        self.guard(run)

    def post(self, ns: str):
        def run():
            self.state.create_table(ns, Table.from_json(self.body()))
            self.write_json({"message": "created"})
        self.guard(run)


class SchemaHashHandler(_Base):
    def get(self, ns: str):
        self.guard(lambda: self.write_json({"hash": self.state.get_hash(ns)}))


class TableHandler(_Base):
    def get(self, ns: str, table: str):
        def run():
            tables = self.state.get_tables(ns)
            if table not in tables:
                raise KeyError(f"unknown table {table!r}")
            self.write_json(tables[table].to_json())
        self.guard(run)

    def put(self, ns: str, table: str):
        def run():
            t = Table.from_json(self.body())
            if t.name != table:
                raise ValueError("table name mismatch")
            self.state.update_table(ns, t)
            self.write_json({"message": "updated"})
        self.guard(run)

    def delete(self, ns: str, table: str):
        self.guard(lambda: (self.state.delete_table(ns, table),
                            self.write_json({"message": "deleted"}))[-1])


class EnumHandler(_Base):
    def get(self, ns: str, table: str, column: str):
        self.guard(lambda: self.write_json(
            self.state.get_enums(ns, table, column)))

    def post(self, ns: str, table: str, column: str):
        cases = self.body().get("enumCases", [])
        self.guard(lambda: self.write_json(
            self.state.extend_enum(ns, table, column, cases)))


class MembershipHandler(_Base):
    def get(self, ns: str):
        def run():
            alive = self.state.alive_instances(ns)
            self.write_json({k: {"host": v.host, "port": v.port}
                             for k, v in alive.items()})
        self.guard(run)

    def post(self, ns: str):
        b = self.body()
        inst = Instance(name=b["name"], host=b["host"], port=int(b["port"]))
        self.guard(lambda: (self.state.join(ns, inst),
                            self.write_json({"message": "joined"}))[-1])


class HeartbeatHandler(_Base):
    def put(self, ns: str, name: str):
        shard_rows = self.body().get("shardRows") if self.request.body \
            else None
        self.guard(lambda: (self.state.heartbeat(ns, name, shard_rows),
                            self.write_json({"message": "ok"}))[-1])

    def delete(self, ns: str, name: str):
        self.guard(lambda: (self.state.leave(ns, name),
                            self.write_json({"message": "left"}))[-1])


class PlacementHandler(_Base):
    def get(self, ns: str, kind: str):
        def run():
            p = self.state.get_placement(ns, kind)
            self.write_json({
                "numShards": p.num_shards,
                "replicaFactor": p.replica_factor,
                "shards": [{"shardId": sa.shard_id, "instances": sa.instances}
                           for sa in p.shards],
            })
        self.guard(run)

    def post(self, ns: str, kind: str):
        b = self.body()
        def run():
            self.state.init_placement(
                ns, kind, int(b["numShards"]), int(b["replicaFactor"]),
                list(b["instances"]))
            self.write_json({"message": "initialized"})
        self.guard(run)


class PlacementReplaceHandler(_Base):
    """Elastic instance replacement (reference: m3 placement replace —
    the leaving instance keeps serving as a Leaving bootstrap source
    until the joiner marks its shards Available)."""

    def post(self, ns: str, kind: str):
        b = self.body()
        self.guard(lambda: (self.state.replace_instance(
            ns, kind, b["leaving"], b["joining"]),
            self.write_json({"message": "replacing"}))[-1])


class PlacementRebalanceHandler(_Base):
    """Skew-aware shard rebalance from heartbeat-reported row counts."""

    def post(self, ns: str, kind: str):
        self.guard(lambda: self.write_json(self.state.rebalance(ns, kind)))


class PlacementAvailableHandler(_Base):
    def post(self, ns: str, kind: str, instance: str):
        b = self.body()
        shard = b.get("shardId")
        self.guard(lambda: (self.state.mark_available(
            ns, kind, instance, None if shard is None else int(shard)),
            self.write_json({"message": "ok"}))[-1])


class JobsHandler(_Base):
    def get(self, ns: str):
        def run():
            jobs = self.state.ns(ns).jobs
            self.write_json([vars(j) for j in jobs.values()])
        self.guard(run)

    def post(self, ns: str):
        b = self.body()
        job = JobConfig(name=b["name"], table=b["table"], topic=b["topic"],
                        cluster=b.get("cluster", ""),
                        config=b.get("config", {}))
        self.guard(lambda: (self.state.add_job(ns, job),
                            self.write_json({"message": "added"}))[-1])


class JobConfigHandler(_Base):
    """Single job-config CRUD (reference: controller/handlers/config.go
    GetJob/UpdateJob/DeleteJob at /config/{namespace}/jobs/{job})."""

    def get(self, ns: str, name: str):
        def run():
            jobs = self.state.ns(ns).jobs
            if name not in jobs:
                return self.write_json({"message": "job not found"}, 404)
            self.write_json(vars(jobs[name]))
        self.guard(run)

    def put(self, ns: str, name: str):
        b = self.body()
        job = JobConfig(name=name, table=b["table"], topic=b["topic"],
                        cluster=b.get("cluster", ""),
                        config=b.get("config", {}))
        self.guard(lambda: (self.state.add_job(ns, job),
                            self.write_json({"message": "updated"}))[-1])

    def delete(self, ns: str, name: str):
        self.guard(lambda: (self.state.delete_job(ns, name),
                            self.write_json({"message": "deleted"}))[-1])


class AssignmentHandler(_Base):
    def get(self, ns: str, subscriber: str):
        def run():
            self.state.subscriber_heartbeat(ns, subscriber)
            jobs = self.state.get_assignment(ns, subscriber)
            self.write_json([vars(j) for j in jobs])
        self.guard(run)


class LeaderHandler(_Base):
    """Election status — served by leaders AND followers."""

    def prepare(self):
        pass

    def get(self):
        e = self.elector
        if e is None:
            self.write_json({"mode": "single", "isLeader": True})
            return
        lease = e.current_leader()
        self.write_json({
            "mode": "ha",
            "isLeader": e.is_leader,
            "name": e.name,
            "epoch": e.epoch,
            "leader": lease["address"] if lease else None,
        })


def make_app(state: ControllerState, elector=None) -> tornado.web.Application:
    a = {"state": state, "elector": elector}
    return tornado.web.Application([
        (r"/leader", LeaderHandler, a),
        (r"/namespaces", NamespacesHandler, a),
        (r"/schema/([^/]+)/tables", SchemaHandler, a),
        (r"/schema/([^/]+)/hash", SchemaHashHandler, a),
        (r"/schema/([^/]+)/tables/([^/]+)", TableHandler, a),
        (r"/schema/([^/]+)/tables/([^/]+)/columns/([^/]+)/enum-cases",
         EnumHandler, a),
        (r"/membership/([^/]+)/instances", MembershipHandler, a),
        (r"/membership/([^/]+)/instances/([^/]+)", HeartbeatHandler, a),
        (r"/placement/([^/]+)/([^/]+)", PlacementHandler, a),
        (r"/placement/([^/]+)/([^/]+)/replace", PlacementReplaceHandler, a),
        (r"/placement/([^/]+)/([^/]+)/rebalance", PlacementRebalanceHandler, a),
        (r"/placement/([^/]+)/([^/]+)/([^/]+)/available",
         PlacementAvailableHandler, a),
        (r"/assignment/([^/]+)/jobs", JobsHandler, a),
        (r"/config/([^/]+)/jobs", JobsHandler, a),
        (r"/config/([^/]+)/jobs/([^/]+)", JobConfigHandler, a),
        (r"/assignment/([^/]+)/subscribers/([^/]+)", AssignmentHandler, a),
    ])


class ControllerServer:
    def __init__(self, state: Optional[ControllerState] = None, port: int = 0,
                 root_path: Optional[str] = None, *,
                 instance_name: str = "", advertise: str = "",
                 elect: bool = False, lease_ttl: float = 3.0):
        self.state = state or ControllerState(root_path)
        self.elector = None
        if elect:
            from aresdb_tpu.controller.election import LeaderElector

            if not self.state.root_path:
                raise ValueError("HA election requires a shared root_path")
            # a follower promoted to leader must pick up the previous
            # leader's persisted mutations before serving
            self.elector = LeaderElector(
                self.state.root_path, instance_name or advertise, advertise,
                ttl=lease_ttl, on_elected=self.state.reload)
        self.app = make_app(self.state, self.elector)
        self.port = port
        self._loop = None
        self._thread = None
        self._started = threading.Event()

    def start_background(self) -> int:
        import asyncio

        import tornado.httpserver
        import tornado.netutil

        def run():
            asyncio.set_event_loop(asyncio.new_event_loop())
            self._loop = tornado.ioloop.IOLoop.current()
            sockets = tornado.netutil.bind_sockets(self.port)
            self.port = sockets[0].getsockname()[1]
            self._httpserver = tornado.httpserver.HTTPServer(self.app)
            self._httpserver.add_sockets(sockets)
            self._started.set()
            self._loop.start()

        self._thread = threading.Thread(target=run, daemon=True,
                                        name="ares-controller")
        self._thread.start()
        self._started.wait(timeout=10)
        if self.elector is not None:
            if not self.elector.address:
                self.elector.address = f"localhost:{self.port}"
            self.elector.start()
        return self.port

    def stop(self):
        if self.elector is not None:
            self.elector.stop()
        if self._loop is not None:
            def shutdown():
                # close listening sockets too, or the port keeps accepting
                # connections that nothing will ever serve
                if getattr(self, "_httpserver", None) is not None:
                    self._httpserver.stop()
                self._loop.stop()

            self._loop.add_callback(shutdown)
        if self._thread is not None:
            self._thread.join(timeout=5)
