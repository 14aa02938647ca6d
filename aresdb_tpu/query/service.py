"""Query service: AQL request → compile → execute → postprocess.

Reference: api/query_handler.go HandleAQL → handleAQLInternal
(compile, device selection, ProcessQuery, Postprocess).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from aresdb_tpu.query.admission import AdmissionError
from aresdb_tpu.query.aql import AQLQuery
from aresdb_tpu.query.compiler import Compiler, QueryError
from aresdb_tpu.query.executor import ShardExecutor
from aresdb_tpu.query.postprocess import build_agg_result, build_non_agg_result


class QueryService:
    def __init__(self, memstore, timezone_table: str = "",
                 device_manager=None, admission_timeout: float = -1,
                 query_timeout: float = 0, device_pool=None):
        """device_manager: optional DeviceMemoryManager admission gate
        (query/device_manager.go FindDeviceForQuery). admission_timeout:
        seconds to wait for device memory (device_choosing_timeout).
        query_timeout: per-query execution deadline in seconds (0 = off).
        device_pool: optional admission.DevicePool — each admitted query
        pins to one chip so N queries run on N chips concurrently (the
        reference DeviceManager's placement model); takes precedence over
        device_manager."""
        self.memstore = memstore
        self.timezone_table = timezone_table
        self.executor = ShardExecutor(memstore)
        self.device_manager = device_manager
        self.device_pool = device_pool
        self.admission_timeout = admission_timeout
        self.query_timeout = query_timeout

    def handle_aql(self, request: Dict[str, Any],
                   data_only: bool = False, device: int = -1,
                   admission_timeout: Optional[float] = None
                   ) -> Dict[str, Any]:
        """Process an AQLRequest JSON dict; returns AQLResponse-shaped dict.

        data_only: keep enum dimensions as untranslated ranks (reference
        `?dataonly=1`, api/common/query_request.go:48 — the distributed
        mode where the broker merges on ranks and translates once,
        aql_postprocessor.go:116).
        device: preferred device index (`?device=`, -1 = auto) — honored
        when that chip's budget fits, else most-free-first
        (device_manager.go:193).
        admission_timeout: per-request device-choosing timeout seconds
        (`?timeout=`, query_request.go:50 DeviceChoosingTimeout)."""
        results: List[Dict[str, Any]] = []
        errors: List[Any] = []
        had_error = False
        contexts: List[Any] = []
        verbose = bool(request.get("verbose") or request.get("debug"))
        data_only = data_only or bool(request.get("dataonly"))
        for qd in request.get("queries", []):
            try:
                q = AQLQuery.from_json(qd)
                if len(q.measures) > 1 or q.supporting_measures:
                    results.append(self._run_composite(q))
                    errors.append(None)
                    contexts.append(None)
                    continue
                result, plan = self._run(q, data_only=data_only,
                                         device=device,
                                         admission_timeout=admission_timeout)
                results.append(result)
                errors.append(None)
                contexts.append(plan.stats)
            except (QueryError, AdmissionError, KeyError, ValueError) as e:
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
                # binary responses (and broker merges) need the raw
                # register planes; JSON queries fetch only per-group
                # estimate stats (executor._resolve_hll_pending)
                plan.hll_registers = True
                with self._admit(plan):
                    table, _ = self.executor.execute(plan)
                out.write_result(W.serialize_result_table(plan, table))
            except (QueryError, AdmissionError, KeyError, ValueError) as e:
                out.write_error(str(e))
        return out.get_bytes()

    def handle_sql(self, request: Dict[str, Any]) -> Dict[str, Any]:
        """Process {"queries": ["SELECT ..."]} (reference: /query/sql).
        verbose/debug return per-stage stats like the AQL form (the
        reference's SQL handler shares handleAQLInternal)."""
        from aresdb_tpu.query.sql import SQLParseError, parse_sql

        results: List[Dict[str, Any]] = []
        errors: List[Any] = []
        contexts: List[Any] = []
        had_error = False
        verbose = bool(request.get("verbose") or request.get("debug"))
        for stmt in request.get("queries", []):
            try:
                q = parse_sql(stmt)
                if len(q.measures) > 1 or q.supporting_measures:
                    results.append(self._run_composite(q))
                    contexts.append(None)
                else:
                    result, plan = self._run(q)
                    results.append(result)
                    contexts.append(plan.stats)
                errors.append(None)
            except (QueryError, AdmissionError, SQLParseError, KeyError, ValueError) as e:
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

    def handle_query(self, q: AQLQuery) -> Dict[str, Any]:
        if len(q.measures) > 1 or q.supporting_measures:
            return self._run_composite(q)
        return self._run(q)[0]

    def _run_composite(self, q: AQLQuery) -> Dict[str, Any]:
        """Composite (multi-measure) queries: one engine run per aggregate
        measure, host-side join + derived-expression evaluation. The
        reference parses these from SQL but refuses to execute them
        (query/sql/sql_parser.go:2018 'sub query not supported yet')."""
        from aresdb_tpu.query import composite as C

        try:
            return C.execute_composite(
                q.to_json(),
                lambda b: self._run(AQLQuery.from_json(b))[0])
        except C.CompositeError as e:
            raise QueryError(str(e)) from e

    def _admit(self, plan, device: int = -1,
               timeout: Optional[float] = None):
        """Reserve device memory for the plan's estimated footprint, for
        the duration of execution (FindDeviceForQuery + deferred release).
        Also stamps the query deadline. No-op without a device manager."""
        import contextlib
        import time as _time

        if self.query_timeout > 0:
            plan.deadline = _time.time() + self.query_timeout
        if self.device_pool is None and self.device_manager is None:
            return contextlib.nullcontext()

        from aresdb_tpu.query.admission import estimate_query_memory

        reserved = estimate_query_memory(plan, self.memstore)
        plan.memory_required = reserved
        if timeout is None or timeout <= 0:
            timeout = self.admission_timeout
        if self.device_pool is not None:
            lease = self.device_pool.acquire(
                reserved, timeout=timeout,
                preferred=device if device >= 0 else None)
            plan.stats["device"] = getattr(lease.device, "id", lease.index)
            return lease
        self.device_manager.reserve(reserved, timeout=timeout)

        @contextlib.contextmanager
        def _held():
            try:
                yield
            finally:
                self.device_manager.release(reserved)
        return _held()

    def _run(self, q: AQLQuery, data_only: bool = False,
             device: int = -1,
             admission_timeout: Optional[float] = None):
        import time as _time

        compiler = Compiler(self.memstore.get_schemas(),
                            timezone_table=self.timezone_table)
        t0 = _time.perf_counter()
        plan = compiler.compile(q)
        plan.data_only = data_only
        compile_s = _time.perf_counter() - t0
        with self._admit(plan, device=device,
                         timeout=admission_timeout):
            table, rows = self.executor.execute(plan)
        plan.stats["compile"] = compile_s
        if getattr(plan, "memory_required", None) is not None:
            plan.stats["memoryRequired"] = plan.memory_required
        t0 = _time.perf_counter()
        if plan.is_non_agg:
            result = build_non_agg_result(plan, rows)
        else:
            result = build_agg_result(plan, table)
        plan.stats["postprocess"] = _time.perf_counter() - t0
        return result, plan
