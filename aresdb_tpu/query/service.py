"""Query service: AQL request → compile → execute → postprocess.

Reference: api/query_handler.go HandleAQL → handleAQLInternal
(compile, device selection, ProcessQuery, Postprocess).
"""

from __future__ import annotations

from typing import Any, Dict, List

from aresdb_tpu.query.aql import AQLQuery
from aresdb_tpu.query.compiler import Compiler, QueryError
from aresdb_tpu.query.executor import ShardExecutor
from aresdb_tpu.query.postprocess import build_agg_result, build_non_agg_result


class QueryService:
    def __init__(self, memstore, timezone_table: str = ""):
        self.memstore = memstore
        self.timezone_table = timezone_table
        self.executor = ShardExecutor(memstore)

    def handle_aql(self, request: Dict[str, Any]) -> Dict[str, Any]:
        """Process an AQLRequest JSON dict; returns AQLResponse-shaped dict."""
        results: List[Dict[str, Any]] = []
        errors: List[Any] = []
        had_error = False
        contexts: List[Any] = []
        verbose = bool(request.get("verbose") or request.get("debug"))
        for qd in request.get("queries", []):
            try:
                q = AQLQuery.from_json(qd)
                result, plan = self._run(q)
                results.append(result)
                errors.append(None)
                contexts.append(plan.stats)
            except (QueryError, KeyError, ValueError) as e:
                results.append({})
                errors.append(str(e))
                contexts.append(None)
                had_error = True
        resp: Dict[str, Any] = {"results": results}
        if had_error:
            resp["errors"] = errors
        if verbose:
            resp["context"] = contexts
        return resp

    def handle_aql_hll(self, request: Dict[str, Any]) -> bytes:
        """Process an AQLRequest with `Accept: application/hll` — binary
        HLLQueryResults framing (api/query_handler.go:382
        HLLQueryResponseWriter; every query must be an HLL query,
        broker/query_compiler.go:305)."""
        from aresdb_tpu.query import hll_wire as W

        out = W.HLLQueryResults()
        for qd in request.get("queries", []):
            try:
                q = AQLQuery.from_json(qd)
                compiler = Compiler(self.memstore.get_schemas(),
                                    timezone_table=self.timezone_table)
                plan = compiler.compile(q)
                if plan.is_non_agg or plan.measure.agg != "hll":
                    raise QueryError(
                        "expect hll aggregate function when Accept is "
                        "application/hll")
                table, _ = self.executor.execute(plan)
                out.write_result(W.serialize_result_table(plan, table))
            except (QueryError, KeyError, ValueError) as e:
                out.write_error(str(e))
        return out.get_bytes()

    def handle_sql(self, request: Dict[str, Any]) -> Dict[str, Any]:
        """Process {"queries": ["SELECT ..."]} (reference: /query/sql)."""
        from aresdb_tpu.query.sql import SQLParseError, parse_sql

        results: List[Dict[str, Any]] = []
        errors: List[Any] = []
        had_error = False
        for stmt in request.get("queries", []):
            try:
                results.append(self.handle_query(parse_sql(stmt)))
                errors.append(None)
            except (QueryError, SQLParseError, KeyError, ValueError) as e:
                results.append({})
                errors.append(str(e))
                had_error = True
        resp: Dict[str, Any] = {"results": results}
        if had_error:
            resp["errors"] = errors
        return resp

    def handle_query(self, q: AQLQuery) -> Dict[str, Any]:
        return self._run(q)[0]

    def _run(self, q: AQLQuery):
        import time as _time

        compiler = Compiler(self.memstore.get_schemas(),
                            timezone_table=self.timezone_table)
        t0 = _time.perf_counter()
        plan = compiler.compile(q)
        compile_s = _time.perf_counter() - t0
        table, rows = self.executor.execute(plan)
        plan.stats["compile"] = compile_s
        t0 = _time.perf_counter()
        if plan.is_non_agg:
            result = build_non_agg_result(plan, rows)
        else:
            result = build_agg_result(plan, table)
        plan.stats["postprocess"] = _time.perf_counter() - t0
        return result, plan
