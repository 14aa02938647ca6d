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
    def __init__(self, memstore):
        self.memstore = memstore
        self.executor = ShardExecutor(memstore)

    def handle_aql(self, request: Dict[str, Any]) -> Dict[str, Any]:
        """Process an AQLRequest JSON dict; returns AQLResponse-shaped dict."""
        results: List[Dict[str, Any]] = []
        errors: List[Any] = []
        had_error = False
        for qd in request.get("queries", []):
            hll_data = bool(qd.pop("_hllData", False)) if isinstance(qd, dict) \
                else False
            try:
                q = AQLQuery.from_json(qd)
                results.append(self.handle_query(q, hll_data=hll_data))
                errors.append(None)
            except (QueryError, KeyError, ValueError) as e:
                results.append({})
                errors.append(str(e))
                had_error = True
        resp: Dict[str, Any] = {"results": results}
        if had_error:
            resp["errors"] = errors
        return resp

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

    def handle_query(self, q: AQLQuery, hll_data: bool = False
                     ) -> Dict[str, Any]:
        compiler = Compiler(self.memstore.get_schemas())
        plan = compiler.compile(q)
        table, rows = self.executor.execute(plan)
        if plan.is_non_agg:
            return build_non_agg_result(plan, rows)
        return build_agg_result(plan, table, hll_data=hll_data)
