"""Broker HTTP service: /query/aql and /query/sql fan-out endpoints.

Reference: broker/handler.go:36 + cmd/broker/cmd/cmd.go:43.
"""

from __future__ import annotations

import json
import threading
from concurrent.futures import ThreadPoolExecutor

import tornado.ioloop
import tornado.web

from aresdb_tpu.broker.executor import BrokerError, BrokerExecutor
from aresdb_tpu.broker.validator import (BrokerValidationError,
                                         validate_query)
from aresdb_tpu.query.composite import CompositeError


class _Base(tornado.web.RequestHandler):
    def initialize(self, executor: BrokerExecutor, pool, schema_view=None):
        self.executor = executor
        self.pool = pool
        self.schema_view = schema_view

    def validate(self, q, hll_binary: bool = False) -> None:
        """Fail-fast compile gate (reference broker/query_compiler.go:117
        Compile) — rejects locally instead of scattering."""
        tables = self.schema_view.tables() if self.schema_view else None
        validate_query(q, tables, hll_binary=hll_binary)

    async def execute_one(self, loop, q, ctx=None):
        """Validate + execute one query dict; composite (multi-measure)
        queries scatter once per aggregate measure and recombine
        (query/composite.py)."""
        from aresdb_tpu.query import composite as C

        if C.is_composite(q):
            bases, aliases, derived, visible = C.split_query(q)
            for b in bases:
                self.validate(b)
            results = []
            for b in bases:
                results.append(await loop.run_in_executor(
                    self.pool, self.executor.execute, b, ctx))
            return C.combine(q, aliases, derived, results, visible)
        self.validate(q)
        return await loop.run_in_executor(
            self.pool, self.executor.execute, q, ctx)

    def write_json(self, obj, status=200):
        self.set_status(status)
        self.set_header("Content-Type", "application/json")
        self.finish(json.dumps(obj, default=str))

    def body(self):
        try:
            return json.loads(self.request.body or b"{}")
        except json.JSONDecodeError as e:
            raise tornado.web.HTTPError(400, reason=str(e))

    async def _run_queries(self, queries, verbose: bool = False):
        import time as _time

        from aresdb_tpu.utils import metrics as M

        loop = tornado.ioloop.IOLoop.current()
        results, errors, had_error = [], [], False
        contexts = []
        for q in queries:
            M.root().count(M.AQL_QUERY_RECEIVED_BROKER, 1)
            ctx = [] if verbose else None
            t0 = _time.perf_counter()
            try:
                r = await self.execute_one(loop, q, ctx)
                results.append(r)
                errors.append(None)
                M.root().count(M.QUERY_SUCCEEDED_BROKER, 1)
            except (BrokerError, BrokerValidationError, CompositeError,
                    ValueError, KeyError) as e:
                results.append({})
                errors.append(str(e))
                had_error = True
                M.root().count(M.QUERY_FAILED_BROKER, 1)
            M.root().record_timer(M.QUERY_LATENCY_BROKER,
                                  _time.perf_counter() - t0)
            contexts.append(ctx)
        resp = {"results": results}
        if had_error:
            resp["errors"] = errors
        if verbose:
            resp["context"] = contexts
        return resp


class BrokerAQLHandler(_Base):
    async def post(self):
        body = self.body()
        if "application/hll" in self.request.headers.get("Accept", ""):
            # binary register pass-through (reference broker handles
            # application/hll end-to-end; broker/query_compiler.go:305)
            from aresdb_tpu.query import hll_wire as W

            loop = tornado.ioloop.IOLoop.current()
            out = W.HLLQueryResults()
            for q in body.get("queries", []):
                try:
                    self.validate(q, hll_binary=True)
                    block = await loop.run_in_executor(
                        self.pool, self.executor.execute_hll_binary, q)
                    out.write_result(block)
                except (BrokerError, BrokerValidationError,
                        ValueError, KeyError) as e:
                    out.write_error(str(e))
            self.set_header("Content-Type", W.CONTENT_TYPE)
            return self.finish(out.get_bytes())
        resp = await self._run_queries(
            body.get("queries", []),
            verbose=bool(body.get("verbose") or body.get("debug")))
        self.write_json(resp)


class BrokerSQLHandler(_Base):
    async def post(self):
        from aresdb_tpu.query.aql import AQLQuery  # noqa: F401
        from aresdb_tpu.query.sql import SQLParseError, parse_sql

        import time as _time

        from aresdb_tpu.utils import metrics as M

        queries = []
        errors = []
        for stmt in self.body().get("queries", []):
            try:
                M.root().count(M.SQL_QUERY_RECEIVED_BROKER, 1)
                t0 = _time.perf_counter()
                q = parse_sql(stmt)
                M.root().record_timer(M.SQL_PARSING_LATENCY_BROKER,
                                      _time.perf_counter() - t0)
                # round-trip via the json form the executor consumes
                queries.append(_aql_to_json(q))
                errors.append(None)
            except SQLParseError as e:
                queries.append(None)
                errors.append(str(e))
        results = []
        final_errors = []
        had_error = False
        loop = tornado.ioloop.IOLoop.current()
        for q, err in zip(queries, errors):
            if err is not None:
                results.append({})
                final_errors.append(err)
                had_error = True
                continue
            try:
                r = await self.execute_one(loop, q)
                results.append(r)
                final_errors.append(None)
            except (BrokerError, BrokerValidationError, CompositeError,
                    ValueError, KeyError) as e:
                results.append({})
                final_errors.append(str(e))
                had_error = True
        resp = {"results": results}
        if had_error:
            resp["errors"] = final_errors
        self.write_json(resp)


class HealthHandler(tornado.web.RequestHandler):
    def get(self):
        self.finish("OK")


def _aql_to_json(q) -> dict:
    """AQLQuery dataclass → executor-consumable json dict."""
    return q.to_json()


class BrokerServer:
    def __init__(self, topology, port: int = 0, schema_view=None):
        self.executor = BrokerExecutor(topology)
        self.pool = ThreadPoolExecutor(max_workers=16)
        self.schema_view = schema_view
        a = {"executor": self.executor, "pool": self.pool,
             "schema_view": schema_view}
        self.app = tornado.web.Application([
            (r"/query/aql", BrokerAQLHandler, a),
            (r"/query/sql", BrokerSQLHandler, a),
            (r"/health", HealthHandler),
        ])
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
            server = tornado.httpserver.HTTPServer(self.app)
            server.add_sockets(sockets)
            self._started.set()
            self._loop.start()

        self._thread = threading.Thread(target=run, daemon=True,
                                        name="ares-broker")
        self._thread.start()
        self._started.wait(timeout=10)
        return self.port

    def stop(self):
        if self._loop is not None:
            self._loop.add_callback(self._loop.stop)
        if self._thread is not None:
            self._thread.join(timeout=5)
