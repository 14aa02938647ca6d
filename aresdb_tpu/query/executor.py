"""Query executor: batch loop over live+archive stores, device staging, merge.

Reference: query/aql_processor.go (ProcessQuery/processShard/processBatch) and
query/aql_batchexecutor.go. The TPU design differs deliberately:

- The reference issues one CUDA kernel per AST node with double-buffered
  streams; here each batch is ONE fused jitted call (XLA overlaps its own
  host→HBM transfers via async dispatch, and the per-batch partial group
  tables are tiny so the merge is host-side and exact).
- Batch row counts are padded to power-of-two buckets so the jit cache stays
  bounded (SURVEY.md §7 'jit cache discipline').
- Group capacity K starts small and retries ×8 on overflow (fixed-capacity
  group table; reference uses dynamic thrust reduce_by_key which XLA cannot).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import numpy as np

from aresdb_tpu.utils import jax_env

jax_env.ensure()

import jax
import jax.numpy as jnp

from aresdb_tpu.utils import metrics as M

from aresdb_tpu.common import data_types as mdt
from aresdb_tpu.query.compiler import CompiledQuery, QueryError
from aresdb_tpu.query.dense import plan_dense
from aresdb_tpu.query.kernels import GLOBAL_KERNEL_CACHE, round_up_pow2

DEFAULT_GROUP_CAPACITY = 4096
MAX_GROUP_CAPACITY = 1 << 22


def _check_deadline(plan) -> None:
    """Per-batch query-timeout check (reference: QueryConfig timeouts —
    the wait-for-device timeout plus per-query cancellation)."""
    import time as _time

    dl = getattr(plan, "deadline", None)
    if dl and _time.time() > dl:
        raise QueryError("query timed out")
DEVICE_CACHE_BYTES = 4 << 30  # HBM residency budget for staged columns


def _current_device_id():
    """Thread-local placement target (None = process default device)."""
    try:
        import jax

        d = jax.config.jax_default_device
        return None if d is None else d.id
    except Exception:  # noqa: BLE001
        return None


class DeviceColumnCache:
    """LRU cache of staged device column arrays (HBM residency).

    The TPU analogue of the reference's device-memory management
    (query/device_allocator.go + HostMemoryManager eviction): archive batch
    columns are immutable and live batch columns carry mutation versions, so
    staged jnp arrays stay resident in HBM across queries and only changed
    data pays the host→device transfer again.
    """

    def __init__(self, max_bytes: int = DEVICE_CACHE_BYTES):
        from collections import OrderedDict
        import threading

        self.max_bytes = max_bytes
        self._entries = OrderedDict()
        self._bytes = 0
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    @staticmethod
    def _entry_bytes(entry) -> int:
        total = 0
        for a in entry if isinstance(entry, tuple) else (entry,):
            total += getattr(a, "nbytes", 0)
        return total

    def get_or_stage(self, key, stage_fn):
        # a query pinned to device k (admission.DevicePool lease sets the
        # thread's jax.default_device) must not reuse arrays staged on
        # another chip — placement is part of the cache key
        key = (_current_device_id(),) + key
        with self._lock:
            hit = self._entries.get(key)
            if hit is not None:
                self._entries.move_to_end(key)
                self.hits += 1
                return hit
        entry = stage_fn()
        nbytes = self._entry_bytes(entry)
        with self._lock:
            self.misses += 1
            if key not in self._entries:
                self._entries[key] = entry
                self._bytes += nbytes
                while self._bytes > self.max_bytes and len(self._entries) > 1:
                    _, old = self._entries.popitem(last=False)
                    self._bytes -= self._entry_bytes(old)
        return entry

    def stats(self) -> dict:
        with self._lock:
            return {"entries": len(self._entries), "bytes": self._bytes,
                    "hits": self.hits, "misses": self.misses}


GLOBAL_DEVICE_CACHE = DeviceColumnCache()


class GroupTable:
    """Exact merge of per-batch partial aggregates, finalized COLUMNAR.

    Partial group tables from heterogeneous kernels (sort path, dense path
    with per-batch slot spaces, mesh shards) accumulate as array piles and
    merge vectorized at finalize() on the canonical u64 group key — the
    same exact bit pack the device kernels sort on (kernels.pack_dim_keys /
    np_pack_dim_keys). The merge lattice mirrors the broker's semantics
    (reference: broker/common/result_merge.go) — sum/count add, min/min,
    max/max, avg carried as (sum, count), hll register-max.

    The finalized result is columnar (dim_values/dim_valids arrays + aggs +
    cnts), so the post-executor tail (postprocess, hll wire) runs vectorized
    with no per-group python dict — the round-4 serving path spent seconds
    building per-group tuples at 200k groups. A dict view (`groups`) is
    derived lazily for the rare inexact-pack mixed-pile fallback and
    legacy consumers.
    """

    def __init__(self, plan: CompiledQuery):
        self.plan = plan
        # vectorized accumulators for dense batches sharing a slot space:
        # dense_sig -> [dense_plan, agg_array, cnt_array, rows_array]
        self._dense_acc: Dict[tuple, list] = {}
        # raw pile list from keyed kernels (sort / hll / mesh):
        # (gkeys, agg, cnt, dim_values, dim_valids), each already sliced
        # to live groups
        self._keyed_acc: list = []
        # finalized columnar result
        self.n_groups = 0
        self.dim_values: List[np.ndarray] = []
        self.dim_valids: List[np.ndarray] = []
        self.aggs: np.ndarray = np.zeros(0, np.float64)
        self.cnts: np.ndarray = np.zeros(0, np.int64)

    # -- accumulation --

    def merge_dense(self, dense_sig: tuple, dense_plan, aggv, cnt, rows):
        """Accumulate whole dense slot tables elementwise (no python loop);
        decoded into columns at finalize()."""
        agg_kind = self.plan.measure.agg
        acc = self._dense_acc.get(dense_sig)
        if acc is None:
            self._dense_acc[dense_sig] = [dense_plan, np.array(aggv),
                                          np.array(cnt), np.array(rows)]
            return
        if agg_kind in ("sum", "count", "avg"):
            acc[1] += aggv
        elif agg_kind == "min":
            acc[1] = np.minimum(acc[1], aggv)
        else:
            acc[1] = np.maximum(acc[1], aggv)
        acc[2] += cnt
        acc[3] += rows

    def merge_keyed(self, gkeys, slot_used, agg, cnt, dim_values,
                    dim_valids):
        """Accumulate one keyed group table (u64 packed keys)."""
        sel = np.asarray(slot_used).astype(bool)
        if not sel.any():
            return
        self._keyed_acc.append((
            np.asarray(gkeys)[sel], np.asarray(agg)[sel],
            np.asarray(cnt)[sel],
            [np.asarray(v)[sel] for v in dim_values],
            [np.asarray(b)[sel] for b in dim_valids]))

    # -- finalize --

    def _dense_piles(self) -> list:
        piles = []
        for dense_plan, aggv, cnt, rows in self._dense_acc.values():
            used = np.asarray(rows) > 0
            slots = np.nonzero(used)[0]
            decoded = dense_plan.decode_slots(slots)
            piles.append((None,
                          np.asarray(aggv)[slots], np.asarray(cnt)[slots],
                          [np.asarray(v) for v, _ in decoded],
                          [np.asarray(b, bool) for _, b in decoded]))
        self._dense_acc.clear()
        return piles

    def finalize(self) -> None:
        """Merge all piles into the final columnar group table."""
        piles = self._keyed_acc + self._dense_piles()
        self._keyed_acc = []
        if not piles:
            self._set_empty()
            return
        if len(piles) > 1:
            # cross-pile merge needs canonical keys for every pile
            from aresdb_tpu.query.kernels import (np_pack_dim_keys,
                                                  pack_modes, _packing_type)

            ptypes = [_packing_type(d) for d in self.plan.dimensions]
            exact, _ = pack_modes(ptypes)
            keyed = []
            for keys, agg, cnt, dvals, dvalids in piles:
                if keys is None:
                    if not exact:
                        # inexact pack (UUID / >63-bit dims) mixed with a
                        # dense pile: dict-merge fallback (rare)
                        self._finalize_dict(piles)
                        return
                    keys = np_pack_dim_keys(dvals, dvalids, ptypes)
                keyed.append((keys, agg, cnt, dvals, dvalids))
            piles = [self._merge_piles(keyed)]
        keys, aggs, cnts, dvals, dvalids = piles[0]
        kind = self.plan.measure.agg
        if kind != "hll" and aggs.dtype.kind == "f":
            aggs = aggs.astype(np.float64)
        self.n_groups = len(cnts)
        self.dim_values = dvals
        self.dim_valids = [np.asarray(b, bool) for b in dvalids]
        self.aggs = aggs
        self.cnts = np.asarray(cnts).astype(np.int64)

    def _set_empty(self) -> None:
        n_dims = len(self.plan.dimensions)
        self.n_groups = 0
        self.dim_values = [np.zeros(0) for _ in range(n_dims)]
        self.dim_valids = [np.zeros(0, bool) for _ in range(n_dims)]
        self.aggs = np.zeros(0, np.float64)
        self.cnts = np.zeros(0, np.int64)

    def _merge_piles(self, piles):
        """Vectorized exact merge of keyed piles on the canonical u64 key."""
        gkeys = np.concatenate([p[0] for p in piles])
        aggs = np.concatenate([p[1] for p in piles])
        cnts = np.concatenate([p[2] for p in piles])
        uniq, inv = np.unique(gkeys, return_inverse=True)
        g = len(uniq)
        kind = self.plan.measure.agg
        if kind in ("sum", "count", "avg"):
            m_agg = np.zeros(g, np.float64 if aggs.dtype.kind == "f"
                             else aggs.dtype)
            np.add.at(m_agg, inv, aggs)
        elif kind == "min":
            m_agg = np.full(g, np.inf if aggs.dtype.kind == "f"
                            else np.iinfo(aggs.dtype).max, aggs.dtype)
            np.minimum.at(m_agg, inv, aggs)
        elif kind == "max":
            m_agg = np.full(g, -np.inf if aggs.dtype.kind == "f"
                            else np.iinfo(aggs.dtype).min, aggs.dtype)
            np.maximum.at(m_agg, inv, aggs)
        else:  # hll register rows
            m_agg = np.zeros((g,) + aggs.shape[1:], aggs.dtype)
            np.maximum.at(m_agg, inv, aggs)
        m_cnt = np.zeros(g, np.int64)
        np.add.at(m_cnt, inv, cnts)
        # dims from the first occurrence of each key (same key → same dims)
        first = np.full(g, len(gkeys), np.int64)
        np.minimum.at(first, inv, np.arange(len(gkeys)))
        n_dims = len(piles[0][3])
        dim_values = []
        dim_valids = []
        for d in range(n_dims):
            vals = np.concatenate([p[3][d] for p in piles])
            valids = np.concatenate([p[4][d] for p in piles])
            dim_values.append(vals[first])
            dim_valids.append(valids[first])
        return uniq, m_agg, m_cnt, dim_values, dim_valids

    def _finalize_dict(self, piles) -> None:
        """Dict-keyed exact merge for piles that cannot produce canonical
        u64 keys (inexact packs mixed with dense piles). Per-group python
        cost — acceptable for this rare shape."""
        agg_kind = self.plan.measure.agg
        groups: Dict[tuple, list] = {}
        for _, agg, cnt, dim_values, dim_valids in piles:
            n_used = len(cnt)
            dvals = []
            for dv in dim_values:
                dvals.append([tuple(x) for x in dv.tolist()]
                             if dv.ndim > 1 else dv.tolist())
            dvalids = [np.asarray(bv).astype(bool).tolist()
                       for bv in dim_valids]
            aggs = agg if agg_kind == "hll" else agg.tolist()
            cnts = np.asarray(cnt).tolist()
            rng = range(len(dvals))
            for j in range(n_used):
                dvalid = tuple(dvalids[i][j] for i in rng)
                dims = tuple(dvals[i][j] for i in rng)
                k = tuple((valid, value if valid else None)
                          for valid, value in zip(dvalid, dims))
                entry = groups.get(k)
                if entry is None:
                    groups[k] = [dims, dvalid, aggs[j], int(cnts[j])]
                    continue
                if agg_kind in ("sum", "count", "avg"):
                    entry[2] += aggs[j]
                elif agg_kind == "min":
                    entry[2] = min(entry[2], aggs[j])
                elif agg_kind == "hll":
                    entry[2] = np.maximum(entry[2], aggs[j])
                else:
                    entry[2] = max(entry[2], aggs[j])
                entry[3] += int(cnts[j])
        n_dims = len(self.plan.dimensions)
        self.n_groups = len(groups)
        entries = list(groups.values())
        self.dim_values = [
            np.asarray([e[0][d] for e in entries])
            for d in range(n_dims)]
        self.dim_valids = [
            np.asarray([e[1][d] for e in entries], bool)
            for d in range(n_dims)]
        if agg_kind == "hll" and entries and np.asarray(
                entries[0][2]).ndim > 0:
            self.aggs = np.stack([np.asarray(e[2]) for e in entries]) \
                if entries else np.zeros(0, np.float64)
        else:
            self.aggs = np.asarray([e[2] for e in entries], np.float64) \
                if entries else np.zeros(0, np.float64)
        self.cnts = np.asarray([e[3] for e in entries], np.int64) \
            if entries else np.zeros(0, np.int64)

    @property
    def groups(self) -> Dict[tuple, list]:
        """Legacy dict view of the FINALIZED columns (lazy, per-group
        python cost — prefer the columnar fields)."""
        out: Dict[tuple, list] = {}
        n_dims = len(self.dim_values)
        dvals = []
        for dv in self.dim_values:
            dvals.append([tuple(x) for x in dv.tolist()]
                         if dv.ndim > 1 else dv.tolist())
        dvalids = [b.tolist() for b in self.dim_valids]
        kind = self.plan.measure.agg if self.plan.measure else "sum"
        aggs = self.aggs if kind == "hll" and self.aggs.ndim > 1 \
            else self.aggs.tolist()
        cnts = self.cnts.tolist()
        rng = range(n_dims)
        for j in range(self.n_groups):
            dvalid = tuple(dvalids[i][j] for i in rng)
            dims = tuple(dvals[i][j] for i in rng)
            k = tuple((valid, value if valid else None)
                      for valid, value in zip(dvalid, dims))
            out[k] = [dims, dvalid, aggs[j], int(cnts[j])]
        return out


class ShardExecutor:
    """Executes one compiled query against local table shards."""

    def __init__(self, memstore, kernel_cache=GLOBAL_KERNEL_CACHE,
                 device_cache=GLOBAL_DEVICE_CACHE):
        self.memstore = memstore
        self.kernel_cache = kernel_cache
        self.device_cache = device_cache
        # plan-signature → observed group capacity: warm repeats of a
        # high-cardinality query start the ladder at the right K instead
        # of paying a wasted low-K kernel pass per batch
        self._k_hints: Dict[str, int] = {}
        # (vp.uid, vp.version, n) → (min, max) over valid values: scanning
        # 33M rows of host memory per query costs ~100ms+; columns are
        # immutable at a given mutation version so stats memoize exactly
        self._stat_memo: Dict[tuple, tuple] = {}
        # staged foreign tables keyed on their live batches' (uid, version):
        # re-staging a dim table per query costs several host→device
        # transfers (~30ms each through a remote tunnel)
        self._foreign_cache: Dict[tuple, tuple] = {}
        # composite run-boundary memo for mode-3 batches, keyed on
        # (sorted run-col uids, lo, hi) — the np.unique over entry counts
        # costs ~ms per batch and is immutable for a given column set
        self._runlen_memo: Dict[tuple, np.ndarray] = {}

    # -- public --

    def execute(self, plan: CompiledQuery):
        """Returns (GroupTable, None) for agg or (None, rows) for non-agg.

        Per-stage timings accumulate into plan.stats (reference: the CUDA-
        event stage timers of query/stats.go:33-54, logged in debug mode).
        """
        import time as _time

        plan.stats = {"batches": 0, "rows_scanned": 0}

        def stage(name):
            class _T:
                def __enter__(me):
                    me.t0 = _time.perf_counter()

                def __exit__(me, *a):
                    plan.stats[name] = plan.stats.get(name, 0.0) + (
                        _time.perf_counter() - me.t0)
            return _T()

        def _staged_nbytes(tree) -> int:
            import jax as _jax

            return sum(getattr(x, "nbytes", 0)
                       for x in _jax.tree_util.tree_leaves(tree))

        with stage("foreignTransfer"):
            foreign = self._stage_foreign_tables(plan)
            plan._exec_geo_cols = self._stage_geo(plan)
        # reserved (admission estimate) vs ACTUAL staged bytes surface in
        # verbose stats so over-reservation is observable (VERDICT r3 #9)
        plan.stats["stagedBytes"] = _staged_nbytes(foreign) + _staged_nbytes(
            plan._exec_geo_cols)
        plan.stats["peakBatchStagedBytes"] = 0
        shards = plan.shards or [0]

        if plan.is_non_agg:
            rows = self._execute_non_agg(plan, foreign, shards)
            return None, rows

        table = GroupTable(plan)
        stat_keys = self._dense_stat_keys(plan)
        plan._exec_pending = []
        plan._exec_dense_dev = {}
        plan._exec_sort_pending = []
        plan._exec_hll_pending = []
        for shard_id in shards:
            shard = self.memstore.get_table_shard(
                plan.main_schema.table.name, shard_id)
            it = self._iter_batches(plan, shard, stat_keys)
            while True:
                with stage("transfer"):
                    try:
                        (batch_cols, n_valid, n_padded, stats, cutoff,
                         runinfo) = next(it)
                    except StopIteration:
                        break
                with stage("batchExec"):
                    self._run_agg_batch(plan, foreign, batch_cols, n_valid,
                                        n_padded, table, stats, cutoff,
                                        runinfo)
                plan.stats["batches"] += 1
                plan.stats["rows_scanned"] += n_valid
                nb = _staged_nbytes(batch_cols)
                plan.stats["stagedBytes"] += nb
                plan.stats["peakBatchStagedBytes"] = max(
                    plan.stats["peakBatchStagedBytes"], nb)
        with stage("resultFetch"):
            self._resolve_pending(plan, table)
            self._resolve_sort_pending(plan, table)
            self._resolve_hll_pending(plan, table)
            table.finalize()
        M.root().count(M.QUERY_ROWS_RETURNED, table.n_groups)
        M.root().record_timer(M.QUERY_BATCH_TRANSFER_TIME,
                              plan.stats.get("transfer", 0.0))
        return table, None

    @staticmethod
    def _dense_stat_keys(plan: CompiledQuery):
        """Main-table columns whose (min, max) stats unlock dense mode:
        raw integer dims, and the column under FLOOR time-bucket dims so
        unbounded-time queries (no timeFilter) still plan densely."""
        from aresdb_tpu.query import expr as _E
        keys = set()
        for d in plan.dimensions:
            e = d.expr
            if isinstance(e, _E.VarRef) and e.table_id == 0 and \
                    e.data_type in (mdt.Uint16, mdt.Uint32):
                keys.add((0, e.column_id))
            elif isinstance(e, _E.BinaryExpr) and e.op == "FLOOR":
                from aresdb_tpu.query.dense import _underlying_column_key
                key = _underlying_column_key(e.lhs)
                if key is not None:
                    keys.add(key)
            elif isinstance(e, _E.Call) and e.name == "__numeric_bucket":
                from aresdb_tpu.query.dense import _underlying_column_key
                key = _underlying_column_key(e.args[0])
                if key is not None:
                    keys.add(key)
        return keys

    # -- batch iteration + staging --

    def _iter_batches(self, plan: CompiledQuery, shard, stat_keys=frozenset()):
        """Yield (columns, n_valid, n_padded, stats) for live+archive batches."""
        live = shard.live_store
        used = plan.used_columns
        schema = plan.main_schema
        # snapshot LIVE first, then take the archive version ONCE: this
        # ordering is correct under a concurrent archiving swap in every
        # interleaving — the snapshot keeps pre-purge live batches alive,
        # and whichever version we then observe either excludes the moved
        # rows (old cutoff, no archive copy) or filters the live copies
        # via its cutoff while the archive copy is scanned once. Reading
        # the cutoff and batch list from DIFFERENT version objects, or
        # reading the version before the live snapshot, double- or
        # under-counts mid-archive (caught by driving aresd while its
        # scheduler archived concurrently).
        with live.lock:
            snapshots = live.snapshot_columns(used)
        version = None
        live_cutoff = 0
        if schema.table.is_fact_table:
            version = shard.archive_store.get_current_version()
            live_cutoff = version.archiving_cutoff

        # live batches (skip by time column min/max like shouldSkipLiveBatch,
        # reference aql_processor.go:1435)
        for batch_id, n, batch in snapshots:
            if plan.time_column_id >= 0 and (plan.from_ts or plan.to_ts):
                vp = batch.column(plan.time_column_id)
                if vp is not None and vp.values is not None and n > 0:
                    mm = self._minmax(vp, vp.values[:n], vp.validity[:n], n)
                    if mm is not None:
                        tmin, tmax = mm
                        if plan.from_ts and tmax < plan.from_ts:
                            continue
                        if plan.to_ts and tmin >= plan.to_ts:
                            continue
            _check_deadline(plan)
            staged = self._stage_live_batch(schema, batch, n, used,
                                            stat_keys)
            M.root().count(M.QUERY_LIVE_BATCH_PROCESSED, 1)
            M.root().count(M.QUERY_LIVE_RECORDS_PROCESSED, staged[1])
            yield staged + (live_cutoff, None)

        # archive batches (fact tables): day-ranged by the time filter —
        # but ONLY when the time filter targets the event time column
        # (column 0). An "unmatched" time filter on another column is a
        # plain row filter and must not skip archive days (reference:
        # processTimeFilter matched/unmatched, aql_compiler_test.go:1206 —
        # ArchiveBatchIDStart/End stay unbounded)
        if schema.table.is_fact_table:
            if plan.time_column_id == 0:
                day_ids = version.get_batch_ids_for_range(
                    plan.from_ts or 0, plan.to_ts or 0)
            else:
                day_ids = version.get_batch_ids_for_range(0, 0)
            for day in day_ids:
                _check_deadline(plan)
                ab = version.request_batch(day)
                for staged in self._stage_archive_batch(schema, ab, used,
                                                        stat_keys, plan):
                    M.root().count(M.QUERY_ARCHIVE_BATCH_PROCESSED, 1)
                    M.root().count(M.QUERY_ARCHIVE_RECORDS_PROCESSED,
                                   staged[1])
                    yield staged[:4] + (0, staged[4])

    @staticmethod
    def _prefilter_slice(prefilters, vps, n: int, stats: dict):
        """Candidate [lo, hi) row range of a sorted archive batch.

        Reference: memstore/vector_party (sorted-column binary search) +
        query archive batch processing — each matched prefilter narrows the
        range via searchsorted on the sort column. Archive batches are
        ordered by raw value first, validity second (archiving.py
        _lexsort_order), so a raw-value run is a conservative superset of
        the matching valid rows; deeper levels are only sorted within each
        parent run, so narrowing stops when the slice is not monotone.
        Mode-3 columns search their ENTRY space directly (values per run
        are the sorted distincts) and map entries back to rows through the
        base counts — no expansion (reference iterator.hpp:214 semantics).
        """
        lo, hi = 0, n
        for cid, op, val in prefilters:
            if hi <= lo:
                break
            vp = vps.get(cid)
            if vp is None or vp.is_list or vp.values is None or \
                    vp.values.ndim != 1:
                break
            if getattr(vp, "is_compressed", False):
                counts = vp.counts.astype(np.int64)
                e0 = max(int(np.searchsorted(counts, lo, "right")) - 1, 0)
                e1 = int(np.searchsorted(counts, hi, "left"))
                seg = vp.values[e0:e1]
                if len(seg) > 1 and not np.all(seg[1:] >= seg[:-1]):
                    break
                if op == "=":
                    a = e0 + int(np.searchsorted(seg, val, "left"))
                    b = e0 + int(np.searchsorted(seg, val, "right"))
                    lo = max(lo, int(counts[a]))
                    hi = min(hi, int(counts[b]))
                elif op in (">=", ">"):
                    side = "left" if op == ">=" else "right"
                    a = e0 + int(np.searchsorted(seg, val, side))
                    lo = max(lo, int(counts[a]))
                elif op in ("<", "<="):
                    side = "left" if op == "<" else "right"
                    a = e0 + int(np.searchsorted(seg, val, side))
                    hi = min(hi, int(counts[a]))
                continue
            seg = vp.values[lo:hi]
            if len(seg) > 1 and not np.all(seg[1:] >= seg[:-1]):
                break
            if op == "=":
                lo, hi = (lo + int(np.searchsorted(seg, val, "left")),
                          lo + int(np.searchsorted(seg, val, "right")))
            elif op == ">=":
                lo += int(np.searchsorted(seg, val, "left"))
            elif op == ">":
                lo += int(np.searchsorted(seg, val, "right"))
            elif op == "<":
                hi = lo + int(np.searchsorted(seg, val, "left"))
            elif op == "<=":
                hi = lo + int(np.searchsorted(seg, val, "right"))
        if (lo, hi) != (0, n):
            stats["prefilterRowsSkipped"] = \
                stats.get("prefilterRowsSkipped", 0) + (n - max(hi - lo, 0))
        return lo, hi

    def _minmax(self, vp, values, validity, n_key) -> object:
        """Memoized (min, max) over valid values (None = all invalid)."""
        key = (getattr(vp, "uid", None), getattr(vp, "version", 0), n_key)
        if key[0] is not None and key in self._stat_memo:
            return self._stat_memo[key]
        if len(validity) and validity.any() and values.ndim == 1:
            sel = values[validity]
            out = (np.min(sel).item(), np.max(sel).item())
        else:
            out = None
        if key[0] is not None:
            if len(self._stat_memo) > 4096:
                self._stat_memo.clear()
            self._stat_memo[key] = out
        return out

    def _column_stat(self, stats, stat_keys, cid, vp, values, validity,
                     n_key):
        if (0, cid) in stat_keys:
            mm = self._minmax(vp, values, validity, n_key)
            if mm is not None:
                stats[(0, cid)] = mm

    def _stage_live_batch(self, schema, batch, n: int, used: List[int],
                          stat_keys=frozenset()):
        n_padded = round_up_pow2(max(n, 1))
        table = schema.table.name
        cols = {}
        stats = {}
        for cid in used:
            vp = batch.column(cid)
            col_schema = schema.table.columns[cid]
            if vp is None or vp.values is None and not vp.is_list:
                cols[(0, cid)] = self.device_cache.get_or_stage(
                    ("default", col_schema.data_type,
                     col_schema.default_value, n_padded),
                    lambda: _default_column(col_schema, n_padded))
                continue
            if vp.is_list:
                cols[(0, cid)] = self.device_cache.get_or_stage(
                    ("live-arr", vp.uid, vp.version, n, n_padded),
                    lambda: _pad_array_column(
                        vp.list_values[:n], vp.validity[:n], n_padded,
                        col_schema.data_type))
                continue
            self._column_stat(stats, stat_keys, cid, vp, vp.values[:n],
                              vp.validity[:n], n)
            # keyed on VP object identity + mutation version: collision-safe
            # across stores/tables and invalidated by any write
            cols[(0, cid)] = self.device_cache.get_or_stage(
                ("live", vp.uid, vp.version, n, n_padded),
                lambda: _pad_column(vp.values[:n], vp.validity[:n],
                                    n_padded, col_schema.data_type))
        return cols, n, n_padded, stats

    ARCHIVE_CHUNK_ROWS = 1 << 22   # day batches stage in <=4M-row slices:
                                   # the kernels are tuned (and the jit
                                   # cache warmed) at <=4M shapes — a 25M
                                   # single-kernel sort left that regime
                                   # and served 100x slower at the 100M
                                   # config, and a 33M staged batch OOMed

    def _stage_archive_batch(self, schema, ab, used: List[int],
                             stat_keys=frozenset(), plan=None):
        """Yield staged 5-tuples for one archive day batch, sliced to
        ARCHIVE_CHUNK_ROWS-row chunks after prefilter narrowing."""
        # resolve row count from the RAW (possibly mode-3 compressed)
        # columns — expansion is a fallback, not the default
        vps_raw = {}
        n = ab.size
        for cid in used:
            vp = ab.request_column(cid)
            if vp is not None:
                n = max(n, vp.num_rows)
            vps_raw[cid] = vp
        if n == 0:
            return
        # prefilter slicing: binary-search the sorted batch down to the
        # candidate row range before staging anything on device
        lo, hi = 0, n
        if plan is not None and plan.prefilters:
            lo, hi = self._prefilter_slice(plan.prefilters, vps_raw, n,
                                           plan.stats)
            if hi <= lo:
                return
        chunk = self.ARCHIVE_CHUNK_ROWS
        for clo in range(lo, hi, chunk):
            staged = self._stage_archive_slice(
                schema, vps_raw, used, clo, min(clo + chunk, hi), plan,
                stat_keys)
            if staged is not None:
                yield staged

    def _stage_archive_slice(self, schema, vps_raw, used: List[int],
                             lo: int, hi: int, plan,
                             stat_keys=frozenset()):
        # run-length aggregation over the compressed representation
        # (VERDICT r4 #2). OPT-IN (ARES_RUNLEN=1): priced on chip against
        # expand-on-stage at 8M and 100M rows — the expand path's fused
        # MXU kernel over HBM-cached expanded columns wins every WARM
        # steady-state shape tested (30 vs 82ms at 8M; 89 vs 124ms at
        # 100M) even though the runlen kernel itself is FASTER chained
        # (1.2ms vs 3ms per 4M chunk; the gap is serving-path overhead,
        # docs/PERFORMANCE.md round 5). Runlen's structural wins — no
        # expansion (2.3x less host memory, no np.repeat on first touch,
        # ~compression-ratio less host->HBM upload on cache churn) — make
        # it the right mode for memory-constrained deployments.
        import os as _os

        if plan is not None and _os.environ.get("ARES_RUNLEN") == "1":
            staged = self._stage_runlen(schema, vps_raw, lo, hi, plan)
            if staged is not None:
                return staged
        vps = {cid: (vp.expanded() if vp is not None else None)
               for cid, vp in vps_raw.items()}
        n_rows = hi - lo
        n_padded = round_up_pow2(max(n_rows, 1))
        cols = {}
        stats = {}
        for cid in used:
            vp = vps[cid]
            col_schema = schema.table.columns[cid]
            akey = ("arch", getattr(vp, "uid", None), lo, hi, n_padded)
            if vp is None:
                cols[(0, cid)] = self.device_cache.get_or_stage(
                    ("default", col_schema.data_type,
                     col_schema.default_value, n_padded),
                    lambda: _default_column(col_schema, n_padded))
            elif vp.is_list:
                cols[(0, cid)] = self.device_cache.get_or_stage(
                    akey, lambda: _pad_array_column(
                        vp.list_values[lo:hi], vp.validity[lo:hi], n_padded,
                        col_schema.data_type))
            else:
                self._column_stat(stats, stat_keys, cid, vp,
                                  vp.values[lo:hi], vp.validity[lo:hi],
                                  (lo, hi))
                cols[(0, cid)] = self.device_cache.get_or_stage(
                    akey, lambda: _pad_column(
                        vp.values[lo:hi], vp.validity[lo:hi], n_padded,
                        col_schema.data_type))
        return cols, n_rows, n_padded, stats, None

    RUNLEN_MIN_RATIO = 2   # runs must compress >= 2:1 to beat expansion

    def _stage_runlen(self, schema, vps, lo: int, hi: int, plan):
        """Stage one archive batch for run-length aggregation, or None.

        Composite boundaries (host, memoized per column-set+slice) define
        n_runs; run-level columns stage per-RUN value/validity lanes,
        row-level columns stage expanded row lanes, and (-2, 0) carries
        (run_starts, run_lens). See runlen.py / kernels.make_runlen_agg_kernel.
        """
        from aresdb_tpu.query import runlen as RL

        spec = RL.plan_runlen(plan, vps)
        if spec is None:
            return None
        bkey = (tuple(sorted(getattr(vps[c], "uid", 0) or 0
                             for c in spec.run_cols)), lo, hi)
        bnds = self._runlen_memo.get(bkey)
        if bnds is None:
            bnds = RL.composite_boundaries(vps, spec.run_cols, lo, hi)
            if len(self._runlen_memo) > 512:
                self._runlen_memo.clear()
            self._runlen_memo[bkey] = bnds
        n_runs = len(bnds) - 1
        n_rows = hi - lo
        if n_runs <= 0 or n_runs * self.RUNLEN_MIN_RATIO > n_rows:
            return None
        n_runs_pad = round_up_pow2(n_runs, 256)
        n_rows_pad = round_up_pow2(max(n_rows, 1))
        starts_rel = (bnds[:-1] - lo).astype(np.int32)
        lens = np.diff(bnds).astype(np.int32)
        cols = {}

        def _meta():
            s = np.full(n_runs_pad, n_rows, np.int32)
            s[:n_runs] = starts_rel
            ln = np.zeros(n_runs_pad, np.int32)
            ln[:n_runs] = lens
            return jnp.asarray(s), jnp.asarray(ln)

        cols[(-2, 0)] = self.device_cache.get_or_stage(
            ("archrunmeta",) + bkey + (n_runs_pad,), _meta)
        if spec.measure_level == "row" and plan.measure.agg == "sum" \
                and not plan.measure.out_float:
            def _rid():
                r = np.zeros(n_rows_pad, np.int32)
                r[:n_rows] = np.repeat(
                    np.arange(n_runs, dtype=np.int32), lens)
                return jnp.asarray(r), jnp.zeros(1, jnp.int32)

            cols[(-2, 1)] = self.device_cache.get_or_stage(
                ("archrunrid",) + bkey + (n_rows_pad,), _rid)
        for cid in spec.run_cols:
            vp = vps[cid]
            col_schema = schema.table.columns[cid]
            if vp is None:
                cols[(0, cid)] = self.device_cache.get_or_stage(
                    ("default", col_schema.data_type,
                     col_schema.default_value, n_runs_pad),
                    lambda cs=col_schema: _default_column(cs, n_runs_pad))
                continue

            def _run_col(vp=vp, cs=col_schema):
                vals, valid = RL.run_values_at(vp, bnds[:-1], cs)
                return _pad_column(vals, valid, n_runs_pad, cs.data_type)

            cols[(0, cid)] = self.device_cache.get_or_stage(
                ("archrun", vp.uid) + bkey + (n_runs_pad,), _run_col)
        for cid in spec.row_cols:
            vp = vps[cid]
            col_schema = schema.table.columns[cid]
            if vp is None:
                cols[(0, cid)] = self.device_cache.get_or_stage(
                    ("default", col_schema.data_type,
                     col_schema.default_value, n_rows_pad),
                    lambda cs=col_schema: _default_column(cs, n_rows_pad))
                continue
            vp = vp.expanded()
            akey = ("arch", vp.uid, lo, hi, n_rows_pad)
            cols[(0, cid)] = self.device_cache.get_or_stage(
                akey, lambda vp=vp, cs=col_schema: _pad_column(
                    vp.values[lo:hi], vp.validity[lo:hi], n_rows_pad,
                    cs.data_type))
        from aresdb_tpu.query.runlen import RunLenInfo

        plan.stats["runlenBatches"] = plan.stats.get("runlenBatches", 0) + 1
        plan.stats["runlenRuns"] = plan.stats.get("runlenRuns", 0) + n_runs
        plan.stats["runlenRowsCompressed"] = \
            plan.stats.get("runlenRowsCompressed", 0) + n_rows
        return cols, n_rows, n_rows_pad, {}, RunLenInfo(
            spec=spec, n_runs=n_runs, n_runs_pad=n_runs_pad)

    def _stage_foreign_tables(self, plan: CompiledQuery):
        """Stage each joined dimension table for the device probe.

        Replaces the reference's device cuckoo probe (query/hash_lookup.cu)
        with either a dense key→row lookup table (small integer key
        domains: one device gather) or a host argsort + device
        searchsorted (kernels._EvalCtx.foreign_row).
        """
        staged = []
        for ft in plan.foreign_tables:
            shard = self.memstore.get_table_shard(ft.schema.table.name, 0)
            live = shard.live_store
            with live.lock:
                snaps = live.snapshot_columns(ft.used_columns)
            ckey_parts = [ft.schema.table.name, tuple(ft.used_columns)]
            for _, n, batch in snaps:
                for cid in ft.used_columns:
                    vp = batch.column(cid)
                    ckey_parts.append((cid, n, getattr(vp, "uid", None),
                                       getattr(vp, "version", 0)))
            ckey = tuple(ckey_parts)
            hit = self._foreign_cache.get(ckey)
            if hit is not None:
                staged.append(hit)
                continue
            # concatenate visible rows of all live batches
            parts: Dict[int, list] = {cid: [] for cid in ft.used_columns}
            valid_parts: Dict[int, list] = {cid: [] for cid in ft.used_columns}
            total = 0
            for _, n, batch in snaps:
                for cid in ft.used_columns:
                    vp = batch.column(cid)
                    col_schema = ft.schema.table.columns[cid]
                    if vp is None or vp.values is None:
                        npdt = mdt.numpy_dtype(col_schema.data_type)
                        shape = (n, 2) if mdt.lanes(col_schema.data_type) == 2 else (n,)
                        parts[cid].append(np.zeros(shape, npdt))
                        valid_parts[cid].append(np.zeros(n, bool))
                    else:
                        parts[cid].append(np.asarray(vp.values[:n]))
                        valid_parts[cid].append(np.asarray(vp.validity[:n]))
                total += n
            if total == 0:
                # empty dim table: single never-matching sentinel row
                key_sorted = np.asarray([np.iinfo(np.int64).max], np.int64)
                perm = np.zeros(1, np.int64)
                columns = {}
                for cid in ft.used_columns:
                    col_schema = ft.schema.table.columns[cid]
                    columns[(0, cid)] = _default_column(col_schema, 1)
                entry = ((jnp.asarray(key_sorted), jnp.asarray(perm)),
                         columns)
                self._remember_foreign(ckey, entry)
                staged.append(entry)
                continue
            key_cid = ft.foreign_key_column
            keys = np.concatenate(parts[key_cid]).astype(np.int64)
            keys_valid = np.concatenate(valid_parts[key_cid])
            columns = {}
            for cid in ft.used_columns:
                vals = np.concatenate(parts[cid])
                valid = np.concatenate(valid_parts[cid])
                columns[(0, cid)] = (jnp.asarray(vals), jnp.asarray(valid))
            # small-domain integer keys: dense row lookup table — the probe
            # becomes ONE device gather instead of searchsorted's ~9
            # binary-search rounds (measured 425ms -> ~10ms per 2M-row
            # batch for a 300-row dim join on one v5e chip)
            vk = keys[keys_valid]
            if len(vk) and vk.min() >= 0 and vk.max() < self.FOREIGN_LUT_CAP:
                lut = np.full(int(vk.max()) + 2, -1, np.int32)
                rows_idx = np.nonzero(keys_valid)[0].astype(np.int32)
                # reversed write: first occurrence wins (PKs are unique, but
                # keep parity with the sorted path's first-match semantics)
                lut[vk[::-1]] = rows_idx[::-1]
                entry = ((jnp.asarray(lut),), columns)
                self._remember_foreign(ckey, entry)
                staged.append(entry)
                continue
            # general path: invalid keys sort to the end and can never match
            keys = np.where(keys_valid, keys, np.iinfo(np.int64).max)
            perm = np.argsort(keys, kind="stable")
            key_sorted = keys[perm]
            entry = ((jnp.asarray(key_sorted), jnp.asarray(perm)), columns)
            self._remember_foreign(ckey, entry)
            staged.append(entry)
        return staged

    def _remember_foreign(self, ckey, entry) -> None:
        if len(self._foreign_cache) > 128:
            self._foreign_cache.clear()
        self._foreign_cache[ckey] = entry

    FOREIGN_LUT_CAP = 1 << 22  # max dense key domain for the LUT join probe
    SMALL_K_FULL_FETCH = 4096  # sort tables at/below this capacity fetch
                               # whole with their counts (one round trip)

    def _stage_geo(self, plan: CompiledQuery):
        """Stage geo shapes: flattened edges + edge->shape one-hot arrays.

        Reference: prepareForGeoIntersect (query/aql_processor.go:333) builds
        the GeoShapeBatch from the geo table's candidate shapes.
        """
        if plan.geo is None:
            return {}
        from aresdb_tpu.query import geo as G

        geo = plan.geo
        shard = self.memstore.get_table_shard(geo.schema.table.name, 0)
        live = shard.live_store
        with live.lock:
            snaps = live.snapshot_columns([geo.pk_column, geo.shape_column])
        shapes, values = [], []
        cand = None
        if geo.candidates is not None and not geo.exclude:
            cand = {tuple(c) if isinstance(c, (list, tuple)) else c
                    for c in geo.candidates}
        excl = None
        if geo.candidates is not None and geo.exclude:
            excl = {tuple(c) if isinstance(c, (list, tuple)) else c
                    for c in geo.candidates}
        for _, n, batch in snaps:
            pk_vp = batch.column(geo.pk_column)
            sh_vp = batch.column(geo.shape_column)
            if pk_vp is None or sh_vp is None:
                continue
            for r in range(n):
                pk = pk_vp.read_value(r)
                shape = sh_vp.read_value(r)
                if pk is None or shape is None:
                    continue
                key = tuple(pk) if isinstance(pk, (list, tuple)) else pk
                if cand is not None and key not in cand:
                    continue
                if excl is not None and key not in excl:
                    continue
                shapes.append(shape)
                values.append(pk)
        batch_ = G.build_shape_batch(shapes, values)
        geo.shape_values = values
        if batch_ is None:
            # no candidate shapes: degenerate placeholder, nothing matches
            batch_ = G.empty_shape_batch()
        cols = {
            (-1, 0): (jnp.asarray(batch_.slope), jnp.asarray(batch_.lat1)),
            (-1, 1): (jnp.asarray(batch_.lng1), jnp.asarray(batch_.lng2)),
            (-1, 2): (jnp.asarray(batch_.onehot), jnp.zeros(1, jnp.float32)),
            (-1, 3): (jnp.asarray(np.int32(batch_.n_shapes)),
                      jnp.zeros(1, jnp.float32)),
        }
        if batch_.prune_ok and G.use_pruned():
            # bbox-pruned two-pass path (geo.matched_shape_pruned)
            cols[(-1, 4)] = (jnp.asarray(batch_.tab3),
                             jnp.asarray(batch_.bbox))
        return cols

    # -- agg execution --

    def _run_agg_batch(self, plan, foreign, batch_cols, n_valid, n_padded,
                       table: GroupTable, batch_stats=None, live_cutoff=0,
                       runinfo=None):
        foreign_idx = tuple(f[0] for f in foreign)
        # foreign columns are referenced through table_id > 0 VarRefs: install
        # them under their (table_id, column_id) keys
        columns = dict(batch_cols)
        columns.update(plan._exec_geo_cols)
        for ft, (_, fcols) in zip(plan.foreign_tables, foreign):
            for (_, cid), arrs in fcols.items():
                columns[(ft.table_id, cid)] = arrs

        if plan.measure.agg == "hll":
            self._run_hll_batch(plan, columns, foreign_idx, n_valid,
                                n_padded, table, live_cutoff)
            return

        if runinfo is not None:
            # run-length (mode-3) batch: per-run weighted kernel, resolved
            # through the same sort-pending device merge
            self._run_runlen_batch(plan, columns, foreign_idx, n_valid,
                                   n_padded, table, runinfo)
            return

        # multi-chip mesh execution (ARES_MESH=1): shard batch rows over
        # every device, merge partial group tables over the interconnect.
        # geo shape tables ride replicated like foreign tables; array
        # columns shard row-wise like scalar columns (all four lanes are
        # row-aligned).
        import os

        if os.environ.get("ARES_MESH") == "1":
            try:
                if self._run_mesh_batch(plan, columns, foreign_idx, n_valid,
                                        n_padded, table, live_cutoff):
                    M.root().count("query.mesh_batches")
                    return
                M.root().count("query.mesh_ineligible_batches")
            except Exception:
                # an unexpected mesh failure falls back to the single-chip
                # path — mesh mode must never fail a query — but it is a
                # bug to investigate, so log + meter it loudly rather than
                # silently degrading to single-chip forever
                import logging

                M.root().count("query.mesh_fallback_batches")
                logging.getLogger("aresdb.executor").exception(
                    "mesh batch execution failed; falling back to "
                    "single-chip path")

        # fast path: dense slot aggregation when every dim is bounded
        dense_plan = plan_dense(plan, batch_stats)
        if dense_plan is not None:
            kernel = self.kernel_cache.dense_agg_kernel(plan, n_padded,
                                                        dense_plan)
            dense_sig = tuple(
                (d.kind, d.size, d.base, d.step, d.post_div,
                 None if d.values is None else d.values.tobytes())
                for d in dense_plan.domains)
            # device-resident running aggregate: the accumulator rides the
            # SAME dispatch as the batch kernel (donated HBM — the
            # reference's result-buffer swap, aql_batchexecutor.go:209);
            # only overflow flags and ONE accumulated table per sig are
            # ever fetched
            from aresdb_tpu.query.kernels import dense_acc_init

            acc = plan._exec_dense_dev.get(dense_sig)
            acc_arrays = acc[1] if acc is not None else dense_acc_init(
                plan, dense_plan.n_slots)
            folded, overflow = kernel(
                columns, foreign_idx, np.int32(n_valid),
                np.int64(live_cutoff), acc_arrays)
            plan._exec_dense_dev[dense_sig] = (dense_plan, folded)
            plan._exec_pending.append(
                (overflow, columns, foreign_idx, n_valid, n_padded,
                 live_cutoff))
            return

        self._run_sort_batch(plan, columns, foreign_idx, n_valid, n_padded,
                             table, live_cutoff)

    def _run_sort_batch(self, plan, columns, foreign_idx, n_valid, n_padded,
                        table: GroupTable, live_cutoff=0, k: int = 0):
        """Sort-path aggregation; dispatched async and resolved after all
        batches, like the dense and HLL paths (_resolve_sort_pending)."""
        if not k:
            from aresdb_tpu.query.kernels import plan_signature
            k = self._k_hints.get(plan_signature(plan),
                                  DEFAULT_GROUP_CAPACITY)
        kernel = self.kernel_cache.agg_kernel(plan, n_padded, k)
        out = kernel(columns, foreign_idx, np.int32(n_valid),
                     np.int64(live_cutoff))
        plan._exec_sort_pending.append(
            (k, out, columns, foreign_idx, n_valid, n_padded, live_cutoff))

    def _run_runlen_batch(self, plan, columns, foreign_idx, n_valid,
                          n_padded, table: GroupTable, runinfo,
                          k: int = 0):
        """Dispatch one run-length archive batch (see _stage_runlen);
        output rides the sort-pending device merge like any keyed table."""
        if not k:
            from aresdb_tpu.query.kernels import plan_signature
            k = self._k_hints.get(plan_signature(plan),
                                  DEFAULT_GROUP_CAPACITY)
        kernel = self.kernel_cache.runlen_kernel(
            plan, n_padded, runinfo.n_runs_pad, k, runinfo.spec)
        out = kernel(columns, foreign_idx, np.int32(n_valid),
                     np.int32(runinfo.n_runs))
        # normalize to the sort-pending 8-tuple ABI (rep placeholder kept
        # by the kernel itself)
        plan._exec_sort_pending.append(
            (k, out, columns, foreign_idx, n_valid, n_padded, 0,
             ("runlen", runinfo)))

    def _resolve_sort_pending(self, plan, table: GroupTable) -> None:
        """Resolve all pending sort/mesh batches with ONE device-side
        cross-batch merge: group counts are fetched first (tiny scalars),
        live slots are sliced ON DEVICE, the sliced tables concatenate and
        fold by key in _keyed_merge_device, and exactly one merged group
        table crosses the host link. Overflows re-run on a bigger K and
        join the same merge."""
        sliced = []
        mesh_sliced = []
        total_live = 0
        while True:
            pending = getattr(plan, "_exec_sort_pending", [])
            plan._exec_sort_pending = []
            if not pending:
                break
            # small-K tables fetch WHOLE alongside their group count in the
            # same device_get: through a remote tunnel every round trip
            # costs ~27ms, and a second sliced fetch would double the
            # latency of every small query (caught by the battery's
            # archive-runlen row at 108ms vs 35ms for the fused path)
            req = []
            for entry in pending:
                k, out = entry[0], entry[1]
                if k <= self.SMALL_K_FULL_FETCH and \
                        (len(entry) <= 7 or entry[7] != "mesh"):
                    req.append((out[5], (out[0], out[3], out[4], out[6],
                                         out[7])))
                else:
                    req.append((out[5], None))
            fetched = jax.device_get(req)
            for entry, (n_groups, full) in zip(pending, fetched):
                k, out = entry[0], entry[1]
                ng = int(n_groups)
                if full is not None and ng <= k:
                    gkeys_h, agg_h, cnt_h, dims_h, dvalids_h = full
                    kg = min(round_up_pow2(max(ng, 1), 64), k)
                    from aresdb_tpu.query.kernels import SENTINEL64
                    table.merge_keyed(
                        gkeys_h[:kg], gkeys_h[:kg] != SENTINEL64,
                        agg_h[:kg], cnt_h[:kg],
                        [dv[:kg] for dv in dims_h],
                        [dv[:kg] for dv in dvalids_h])
                    continue
                if ng > k:
                    (old_k, _, columns, foreign_idx, n_valid, n_padded,
                     live_cutoff) = entry[:7]
                    kind = entry[7] if len(entry) > 7 else None
                    if ng > MAX_GROUP_CAPACITY:
                        raise QueryError(
                            f"group cardinality {ng} exceeds maximum "
                            f"capacity {MAX_GROUP_CAPACITY}")
                    k2 = min(round_up_pow2(ng), MAX_GROUP_CAPACITY)
                    from aresdb_tpu.query.kernels import plan_signature
                    sig = plan_signature(plan)
                    self._k_hints[sig] = max(self._k_hints.get(sig, 0), k2)
                    if isinstance(kind, tuple) and kind[0] == "runlen":
                        self._run_runlen_batch(
                            plan, columns, foreign_idx, n_valid, n_padded,
                            table, kind[1], k=k2)
                    else:
                        self._run_sort_batch(
                            plan, columns, foreign_idx, n_valid, n_padded,
                            table, live_cutoff, k=k2)
                    continue
                (gkeys, _, slot_used, agg, cnt, _, dim_values,
                 dim_valids) = out
                if len(entry) > 7 and entry[7] == "mesh":
                    # mesh tables are committed across the whole device
                    # mesh: device-side slicing would reshard (concurrent
                    # collectives abort under threaded queries), so they
                    # fetch whole (deferred, one batched get below) and
                    # slice on host
                    mesh_sliced.append(
                        (ng, (gkeys, agg, cnt, dim_values, dim_valids)))
                    continue
                kg = min(round_up_pow2(max(ng, 1), 64), k)
                sliced.append((gkeys[:kg], agg[:kg], cnt[:kg],
                               tuple(dv[:kg] for dv in dim_values),
                               tuple(dv[:kg] for dv in dim_valids)))
                total_live += ng
        if mesh_sliced:
            from aresdb_tpu.query.kernels import SENTINEL64
            fetched = jax.device_get([m[1] for m in mesh_sliced])
            for (ng, _), (gkeys, agg, cnt, dim_values, dim_valids) in \
                    zip(mesh_sliced, fetched):
                kg = min(round_up_pow2(max(ng, 1), 64), len(gkeys))
                table.merge_keyed(
                    gkeys[:kg], gkeys[:kg] != SENTINEL64, agg[:kg],
                    cnt[:kg], [dv[:kg] for dv in dim_values],
                    [dv[:kg] for dv in dim_valids])
        if not sliced:
            return
        if len(sliced) == 1:
            gkeys, agg, cnt, dim_values, dim_valids = jax.device_get(
                sliced[0])
            from aresdb_tpu.query.kernels import SENTINEL64
            table.merge_keyed(gkeys, gkeys != SENTINEL64, agg, cnt,
                              list(dim_values), list(dim_valids))
            return
        gkeys = jnp.concatenate([s[0] for s in sliced])
        agg = jnp.concatenate([s[1] for s in sliced])
        cnt = jnp.concatenate([s[2] for s in sliced])
        n_dims = len(sliced[0][3])
        dims = tuple(jnp.concatenate([s[3][d] for s in sliced])
                     for d in range(n_dims))
        dvalids = tuple(jnp.concatenate([s[4][d] for s in sliced])
                        for d in range(n_dims))
        plan.stats["deviceMergedTables"] = len(sliced)
        kind = plan.measure.agg
        k_out = round_up_pow2(max(total_live, 1), 64)
        # the union count first (a scalar round trip): k_out is the SUM of
        # the per-batch partials, which over-counts shared groups by the
        # batch count — merging/fetching at that capacity cost seconds at
        # the 100M-row config (a 200k-group 25-chunk query would merge at
        # 8M capacity and fetch a 1M+-row padded table)
        n_u = int(jax.device_get(_count_unique_keys(gkeys)))
        kg = min(round_up_pow2(max(n_u, 1), 64), k_out)
        if kind in ("sum", "count", "avg"):
            (m_keys, m_used, m_agg, m_cnt, _, m_dims, m_dvalids) = \
                _merge_big_device(gkeys, agg, cnt, dims, dvalids, kg)
        else:
            # min/max fold via the scatter merge (needs the measure
            # lattice, not a weighted sum); capacity already n_uniq-bounded
            (m_keys, m_used, m_agg, m_cnt, m_dims, m_dvalids, _) = \
                _keyed_merge_device(gkeys, agg, cnt, dims, dvalids, kind,
                                    kg)
        # keys only matter when OTHER piles will join the final merge
        # (mesh tables fetched above, or dense accumulators from mixed
        # batches); a lone pile merges by position. Per-group counts only
        # matter downstream for avg (the division) or when another pile
        # will re-merge — skipping the f64 cnt column saves 8B/group of
        # tunnel fetch (~2MB at 200k groups).
        other_piles = bool(mesh_sliced) or bool(table._keyed_acc) \
            or bool(table._dense_acc)
        need_cnt = other_piles or kind == "avg"
        req2 = [m_used, m_agg, tuple(m_dims), tuple(m_dvalids)]
        if other_piles:
            req2.append(m_keys)
        if need_cnt:
            req2.append(m_cnt)
        fetched2 = jax.device_get(tuple(req2))
        used_h, agg_h, dims_h, dvalids_h = fetched2[:4]
        i = 4
        if other_piles:
            keys_h = fetched2[i]
            i += 1
        else:
            keys_h = np.arange(kg, dtype=np.uint64)  # positional placeholder
        cnt_h = fetched2[i] if need_cnt else np.zeros(kg, np.float64)
        table.merge_keyed(keys_h, used_h, agg_h, cnt_h,
                          list(dims_h), list(dvalids_h))

    def _run_mesh_batch(self, plan, columns, foreign_idx, n_valid, n_padded,
                        table: GroupTable, live_cutoff=0) -> bool:
        """Intra-query multi-chip execution over the device mesh.

        Rows shard across devices; per-chip partial group tables merge with
        all_gather + a replicated reduce (parallel/sharded.py). Returns
        False when ineligible (single device, hll measure)."""
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from aresdb_tpu.parallel import sharded

        devs = _jax.devices()
        if len(devs) < 2 or plan.measure.agg == "hll":
            return False
        n_dev = len(devs)
        if n_padded % n_dev != 0:
            return False
        rows_per_device = n_padded // n_dev
        mesh = sharded.make_mesh()
        row_sharding = NamedSharding(mesh, P(sharded.SHARD_AXIS))
        repl = NamedSharding(mesh, P())
        # main-table entries (scalar pairs AND 4-lane array stagings) shard
        # by rows; geo shape tables (-1, *) and foreign columns replicate
        cols_sharded = {}
        for k, arrs in columns.items():
            if k[0] == 0:
                cols_sharded[k] = tuple(
                    _jax.device_put(a, row_sharding) for a in arrs)
            else:
                cols_sharded[k] = tuple(_jax.device_put(a, repl)
                                        for a in arrs)
        foreign_repl = tuple(
            tuple(_jax.device_put(a, repl) for a in f) for f in foreign_idx)
        n_valid_per = _jax.device_put(
            jnp.asarray(sharded.per_shard_valid(int(n_valid), n_dev,
                                                rows_per_device)),
            row_sharding)
        k_groups = DEFAULT_GROUP_CAPACITY
        from aresdb_tpu.query.kernels import plan_signature
        cache_key = ("mesh", plan_signature(plan), rows_per_device, k_groups,
                     n_dev)
        fn = self.kernel_cache._cache.get(cache_key)
        if fn is None:
            fn = sharded.make_sharded_agg_kernel(
                plan, rows_per_device, k_groups, mesh)
            self.kernel_cache._cache[cache_key] = fn
        out = fn(cols_sharded, foreign_repl, n_valid_per,
                 jnp.int64(live_cutoff))
        (gkeys, slot_used, aggv, cnt, n_groups, dim_values, dim_valids) = out
        # deferred like every other path: normalize to the sort-pending ABI
        # and resolve in the single end-of-query device merge; an overflow
        # (n_groups > k) reruns that batch on the single-chip sort ladder
        plan._exec_sort_pending.append(
            (k_groups,
             (gkeys, None, slot_used, aggv, cnt, n_groups,
              dim_values, dim_valids),
             columns, foreign_idx, n_valid, n_padded, live_cutoff,
             "mesh"))
        return True

    def _resolve_pending(self, plan, table: GroupTable) -> None:
        """ONE device_get for the per-sig accumulated dense tables plus
        every batch's overflow flag; overflowed batches (domain understated
        by stale stats — excluded from the device fold) rerun on the sort
        ladder."""
        pending, plan._exec_pending = plan._exec_pending, []
        accs, plan._exec_dense_dev = plan._exec_dense_dev, {}
        if not pending and not accs:
            return
        sigs = list(accs.keys())
        flags, tables = jax.device_get(
            ([entry[0] for entry in pending],
             [accs[s][1] for s in sigs]))
        for entry, overflow in zip(pending, flags):
            if int(overflow) > 0:
                (_, columns, foreign_idx, n_valid, n_padded,
                 live_cutoff) = entry
                self._run_sort_batch(plan, columns, foreign_idx, n_valid,
                                     n_padded, table, live_cutoff)
        for sig, (aggv, cnt, rows) in zip(sigs, tables):
            table.merge_dense(sig, accs[sig][0], aggv, cnt, rows)

    def _run_hll_batch(self, plan, columns, foreign_idx, n_valid, n_padded,
                       table: GroupTable, live_cutoff=0, k: int = 0):
        """HLL register build; dispatched async and resolved after all
        batches (registers are 16KB per group, so results are fetched
        sliced to the live group count — see _resolve_hll_pending)."""
        import os

        if not k:
            from aresdb_tpu.query.kernels import plan_signature
            k = self._k_hints.get("hll:" + plan_signature(plan), 256)
        if os.environ.get("ARES_MESH") == "1":
            try:
                if self._run_mesh_hll_batch(plan, columns, foreign_idx,
                                            n_valid, n_padded, k,
                                            live_cutoff):
                    M.root().count("query.mesh_batches")
                    return
                M.root().count("query.mesh_ineligible_batches")
            except Exception:  # noqa: BLE001
                import logging

                M.root().count("query.mesh_fallback_batches")
                logging.getLogger("aresdb.executor").exception(
                    "mesh HLL batch execution failed; falling back to "
                    "single-chip path")
        kernel = self.kernel_cache.hll_kernel(plan, n_padded, k)
        out = kernel(columns, foreign_idx, np.int32(n_valid),
                     np.int64(live_cutoff))
        plan._exec_hll_pending.append(
            (k, out, columns, foreign_idx, n_valid, n_padded, live_cutoff))

    def _run_mesh_hll_batch(self, plan, columns, foreign_idx, n_valid,
                            n_padded, k_groups, live_cutoff=0) -> bool:
        """Multi-chip HLL over the device mesh (VERDICT r4 #3): rows shard
        across devices, register planes all_gather + register-max merge on
        device (parallel/sharded.make_sharded_hll_kernel); resolution is
        deferred like the single-chip path."""
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from aresdb_tpu.parallel import sharded

        devs = _jax.devices()
        if len(devs) < 2 or n_padded % len(devs) != 0:
            return False
        n_dev = len(devs)
        rows_per_device = n_padded // n_dev
        mesh = sharded.make_mesh()
        row_sharding = NamedSharding(mesh, P(sharded.SHARD_AXIS))
        repl = NamedSharding(mesh, P())
        cols_sharded = {}
        for key, arrs in columns.items():
            if key[0] == 0:
                cols_sharded[key] = tuple(
                    _jax.device_put(a, row_sharding) for a in arrs)
            else:
                cols_sharded[key] = tuple(_jax.device_put(a, repl)
                                          for a in arrs)
        foreign_repl = tuple(
            tuple(_jax.device_put(a, repl) for a in f) for f in foreign_idx)
        n_valid_per = _jax.device_put(
            jnp.asarray(sharded.per_shard_valid(int(n_valid), n_dev,
                                                rows_per_device)),
            row_sharding)
        from aresdb_tpu.query.kernels import plan_signature
        cache_key = ("mesh-hll", plan_signature(plan), rows_per_device,
                     k_groups, n_dev)
        fn = self.kernel_cache._cache.get(cache_key)
        if fn is None:
            fn = sharded.make_sharded_hll_kernel(
                plan, rows_per_device, k_groups, mesh)
            self.kernel_cache._cache[cache_key] = fn
        out = fn(cols_sharded, foreign_repl, n_valid_per,
                 jnp.int64(live_cutoff))
        plan._exec_hll_pending.append(
            (k_groups, out, columns, foreign_idx, n_valid, n_padded,
             live_cutoff, "mesh"))
        return True

    def _resolve_hll_pending(self, plan, table: GroupTable) -> None:
        """Resolve all pending HLL batches with ONE device-side cross-batch
        register merge (segment-max by group key), so the 16KB-per-group
        register planes cross the wire at most once — and for JSON queries
        not at all: only the two per-group register reductions the
        estimator needs (Σ 2^-rho + zeros, #non-zero; 16 bytes per group)
        are fetched, with hll.estimate_from_stats finishing on host.
        Binary wire responses (plan.hll_registers, Accept: application/hll
        — which is also how the broker merges datanode partials) fetch the
        merged register table, count-sliced in a second round. Overflowed
        batches re-run on a bigger K first."""
        sliced = []
        mesh_pending = []
        while True:
            pending = getattr(plan, "_exec_hll_pending", [])
            plan._exec_hll_pending = []
            if not pending:
                break
            counts = jax.device_get([entry[1][4] for entry in pending])
            for entry, n_groups in zip(pending, counts):
                k, out = entry[0], entry[1]
                if int(n_groups) <= k:
                    kg = min(round_up_pow2(max(int(n_groups), 1), 8), k)
                    if len(entry) > 7:
                        # mesh tables are committed across the whole mesh:
                        # fetch whole (one batched get below), slice on
                        # host — device-side slicing would reshard
                        mesh_pending.append((kg, out))
                        continue
                    (gkeys, slot_used, registers, cnt, _, dim_values,
                     dim_valids) = out
                    sliced.append((gkeys[:kg], slot_used[:kg],
                                   registers[:kg], cnt[:kg],
                                   tuple(dv[:kg] for dv in dim_values),
                                   tuple(dv[:kg] for dv in dim_valids)))
                    continue
                n_groups = int(n_groups)
                (old_k, _, columns, foreign_idx, n_valid, n_padded,
                 live_cutoff) = entry[:7]
                if n_groups > 4096:
                    raise QueryError(
                        f"hll group cardinality {n_groups} exceeds 4096")
                k2 = min(round_up_pow2(n_groups, 256), 4096)
                from aresdb_tpu.query.kernels import plan_signature
                sig = "hll:" + plan_signature(plan)
                self._k_hints[sig] = max(self._k_hints.get(sig, 0), k2)
                self._run_hll_batch(plan, columns, foreign_idx, n_valid,
                                    n_padded, table, live_cutoff, k=k2)
        if mesh_pending:
            fetched = jax.device_get([mp[1] for mp in mesh_pending])
            for (kg, _), out in zip(mesh_pending, fetched):
                (gkeys, slot_used, registers, cnt, _, dim_values,
                 dim_valids) = out
                sliced.append((gkeys[:kg], slot_used[:kg],
                               registers[:kg], cnt[:kg],
                               tuple(dv[:kg] for dv in dim_values),
                               tuple(dv[:kg] for dv in dim_valids)))
        if not sliced:
            return
        import jax.numpy as jnp

        gkeys = jnp.concatenate([s[0] for s in sliced])
        used = jnp.concatenate([s[1] for s in sliced])
        regs = jnp.concatenate([s[2] for s in sliced])
        cnt = jnp.concatenate([s[3] for s in sliced])
        n_dims = len(sliced[0][4])
        dims = [jnp.concatenate([s[4][d] for s in sliced])
                for d in range(n_dims)]
        dvalids = [jnp.concatenate([s[5][d] for s in sliced])
                   for d in range(n_dims)]
        want_regs = bool(getattr(plan, "hll_registers", False))
        merged = _hll_merge_device(gkeys, used, regs, cnt, tuple(dims),
                                   tuple(dvalids), want_regs)
        if want_regs:
            (m_keys, m_used, m_cnt, m_dims, m_dvalids, n_uniq,
             m_regs) = merged
            kg = min(round_up_pow2(max(int(jax.device_get(n_uniq)), 1), 8),
                     int(m_keys.shape[0]))
            (m_keys, m_used, m_regs, m_cnt, m_dims, m_dvalids) = \
                jax.device_get((m_keys[:kg], m_used[:kg], m_regs[:kg],
                                m_cnt[:kg],
                                tuple(dv[:kg] for dv in m_dims),
                                tuple(dv[:kg] for dv in m_dvalids)))
            table.merge_keyed(m_keys, m_used, m_regs, m_cnt,
                              list(m_dims), list(m_dvalids))
            return
        from aresdb_tpu.query import hll as H

        (m_keys, m_used, m_cnt, m_dims, m_dvalids, _,
         sum_recip, non_zero) = jax.device_get(merged)
        ests = np.array([
            H.estimate_from_stats(float(sr), float(nz)) if u else 0.0
            for sr, nz, u in zip(sum_recip, non_zero, m_used)])
        table.merge_keyed(m_keys, m_used, ests, m_cnt,
                          list(m_dims), list(m_dvalids))

    # -- non-agg execution --

    NON_AGG_SORT_SCAN_CAP = 100_000

    def _execute_non_agg(self, plan, foreign, shards):
        """Collect up to limit rows of dim values (reference non-agg path).

        With ORDER BY, matching rows are collected up to
        NON_AGG_SORT_SCAN_CAP, sorted, then limited (sorting requires seeing
        past the limit; the cap bounds memory).
        """
        rows: List[Tuple] = []
        limit = plan.limit
        sorts = plan.query.sorts or []
        if sorts:
            limit_collect = self.NON_AGG_SORT_SCAN_CAP
        else:
            limit_collect = limit
        foreign_idx = tuple(f[0] for f in foreign)
        for shard_id in shards:
            shard = self.memstore.get_table_shard(
                plan.main_schema.table.name, shard_id)
            for batch_cols, n_valid, n_padded, _, cutoff, _runinfo in \
                    self._iter_batches(plan, shard):
                columns = dict(batch_cols)
                columns.update(plan._exec_geo_cols)
                for ft, (_, fcols) in zip(plan.foreign_tables, foreign):
                    for (_, cid), arrs in fcols.items():
                        columns[(ft.table_id, cid)] = arrs
                # device-side top-L compaction: only L rows per dim lane
                # cross to the host instead of the whole batch
                top_l = 0
                if limit_collect and limit_collect < n_padded:
                    top_l = round_up_pow2(limit_collect)
                kernel = self.kernel_cache.select_kernel(plan, n_padded,
                                                         top_l)
                out = kernel(
                    columns, foreign_idx, np.int32(n_valid), np.int64(cutoff))
                if top_l:
                    n_found, dim_values, dim_valids = jax.device_get(out)
                    take = min(int(n_found), top_l)
                    if limit_collect:
                        take = min(take, limit_collect - len(rows))
                    sel = range(take)
                else:
                    mask, dim_values, dim_valids = jax.device_get(out)
                    sel = np.nonzero(mask)[0]
                    if limit_collect and len(rows) + len(sel) > limit_collect:
                        sel = sel[:limit_collect - len(rows)]
                dvs = list(dim_values)
                dvds = list(dim_valids)
                for i in sel:
                    rows.append(tuple(
                        (dvs[d][i], bool(dvds[d][i]))
                        for d in range(len(dvs))))
                if limit_collect and len(rows) >= limit_collect:
                    break
            else:
                continue
            break
        if sorts:
            rows = self._sort_non_agg(plan, rows, sorts)
        if limit:
            rows = rows[:limit]
        return rows

    @staticmethod
    def _sort_non_agg(plan, rows, sorts):
        """Sort collected rows by dim name/alias (SortField order)."""
        name_to_idx = {}
        for i, d in enumerate(plan.dimensions):
            if d.raw is not None:
                if d.raw.alias:
                    name_to_idx[d.raw.alias] = i
                if d.raw.expr:
                    name_to_idx[d.raw.expr] = i
        for sf in reversed(sorts):
            idx = name_to_idx.get(sf.name)
            if idx is None:
                from aresdb_tpu.query.compiler import QueryError
                raise QueryError(f"unknown sort field {sf.name!r}")
            rows = sorted(
                rows,
                key=lambda r: (not r[idx][1],
                               r[idx][0].item()
                               if hasattr(r[idx][0], "item") else r[idx][0]),
                reverse=(sf.order == "desc"))
        return rows


# ---------------------------------------------------------------------------
# staging helpers
# ---------------------------------------------------------------------------

@jax.jit
def _count_unique_keys(gkeys):
    """Live-unique count of a concatenated key column (one u64 sort)."""
    from aresdb_tpu.query.kernels import SENTINEL64

    (sk,) = jax.lax.sort((gkeys,), num_keys=1, is_stable=False)
    first = jnp.concatenate([jnp.ones(1, jnp.bool_), sk[1:] != sk[:-1]])
    return jnp.sum((first & (sk != SENTINEL64)).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("k_out",))
def _merge_big_device(gkeys, wsum, wcnt, dims, dvalids, k_out: int):
    """Large-capacity cross-batch merge for sum/count/avg via the
    boundary-prefix machinery (one multi-operand sort + block prefix
    sums) — the scatter-based segment reductions of _keyed_merge_device
    cost seconds at multi-million-row capacities (segment_sum/min at 8M
    segments measured 2.6s warm on one v5e; this path is ~100ms at the
    same shape). k_out is pre-bounded to the true union count by
    _count_unique_keys, so the output arrays stay near n_uniq."""
    from aresdb_tpu.query import kernels as K

    # f64 lanes: the weighted reduce returns sums in its input dtype, and
    # a cross-batch f32 count/sum would round groups past 2^24 rows
    if wsum.dtype.kind == "f":
        wsum = wsum.astype(jnp.float64)
    wcnt = wcnt.astype(jnp.float64)
    dim_vals = [K._Val(d, v) for d, v in zip(dims, dvalids)]
    out = K._reduce_by_key_sorted_weighted(
        gkeys, wsum, wcnt, k_out, dim_vals, None)
    # (gkeys, slot_used, aggv, cnt, n_groups, dims, dvalids)
    return out


@functools.partial(jax.jit, static_argnames=("kind", "k_out"))
def _keyed_merge_device(gkeys, agg, cnt, dims, dvalids, kind: str,
                        k_out: int):
    """Cross-batch merge of keyed group tables ON DEVICE: the concatenated
    per-batch sliced tables (a few thousand to a few hundred thousand rows
    — partial GROUPS, not raw rows) sort by canonical u64 key and fold
    with segment reductions, so exactly ONE final group table crosses the
    host link per query. This replaces the round-4 host-side np.unique
    merge — the reference's peer is the device-resident running aggregate
    of query/aql_batchexecutor.go:266 (reduce into the previous result,
    swap buffers, one final fetch in aql_processor.go:145-154).

    Unused slots arrive with the sentinel key (kernels sentinel ghosts
    out) and agg=0/ident, cnt=0; they sort last into the dropped segment.
    Float sums fold in f64 for host-merge-identical exactness.
    Returns (m_keys[k_out], m_used[k_out], m_agg, m_cnt, m_dims,
    m_dvalids, n_uniq)."""
    from aresdb_tpu.query.kernels import SENTINEL64

    n = gkeys.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    skeys, sagg, scnt, order = jax.lax.sort(
        (gkeys, agg, cnt, iota), num_keys=1, is_stable=True)
    first = jnp.concatenate([jnp.ones(1, jnp.bool_),
                             skeys[1:] != skeys[:-1]])
    live = skeys != SENTINEL64
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg_c = jnp.where(live & (seg < k_out), seg, k_out)
    num = k_out + 1
    n_uniq = jnp.sum((first & live).astype(jnp.int32))
    if kind in ("sum", "count", "avg"):
        acc_dt = jnp.float64 if sagg.dtype.kind == "f" else sagg.dtype
        m_agg = jax.ops.segment_sum(sagg.astype(acc_dt), seg_c,
                                    num_segments=num)[:k_out]
    elif kind == "min":
        m_agg = jax.ops.segment_min(sagg, seg_c,
                                    num_segments=num)[:k_out]
    elif kind == "max":
        m_agg = jax.ops.segment_max(sagg, seg_c,
                                    num_segments=num)[:k_out]
    else:
        raise ValueError(f"unsupported keyed merge kind {kind}")
    m_cnt = jax.ops.segment_sum(scnt.astype(jnp.float64), seg_c,
                                num_segments=num)[:k_out]
    rep = jax.ops.segment_min(iota, seg_c, num_segments=num)[:k_out]
    rep = jnp.clip(rep, 0, jnp.int32(max(n - 1, 0)))
    m_keys = skeys[rep]
    m_used = jnp.arange(k_out, dtype=jnp.int32) < n_uniq
    m_keys = jnp.where(m_used, m_keys, SENTINEL64)
    src = order[rep]
    m_dims = tuple(dv[src] for dv in dims)
    m_dvalids = tuple((dv[src] & m_used) for dv in dvalids)
    return m_keys, m_used, m_agg, m_cnt, m_dims, m_dvalids, n_uniq


@functools.partial(jax.jit, static_argnames=("want_regs",))
def _hll_merge_device(gkeys, used, regs, cnt, dims, dvalids,
                      want_regs: bool):
    """Cross-batch HLL merge ON DEVICE: segment-max the register planes of
    equal group keys so at most one [G, 16384] table (or, for JSON
    queries, just per-group estimator stats) ever crosses the host link.
    Inputs are the concatenated per-batch sliced group tables (a few
    hundred to a few thousand rows). Returns
    (keys, used, cnt, dims, dvalids, n_uniq, regs) when want_regs else
    (keys, used, cnt, dims, dvalids, n_uniq, sum_recip f64, non_zero i32).
    Reference peer: query/hll.cu:21 builds per-batch register planes and
    the Go layer merges fetched planes host-side (query/hll.go:28)."""
    from aresdb_tpu.query.kernels import SENTINEL64

    n = gkeys.shape[0]
    keyed = jnp.where(used, gkeys, SENTINEL64)
    skeys, order = jax.lax.sort(
        (keyed, jnp.arange(n, dtype=jnp.int32)), num_keys=1,
        is_stable=True)
    regs_s = regs[order]
    cnt_s = cnt[order]
    first = jnp.concatenate([jnp.ones(1, jnp.bool_),
                             skeys[1:] != skeys[:-1]])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    live = skeys != SENTINEL64
    n_uniq = jnp.sum((first & live).astype(jnp.int32))
    m_regs = jax.ops.segment_max(regs_s.astype(jnp.int32), seg,
                                 num_segments=n).astype(regs.dtype)
    m_cnt = jax.ops.segment_sum(cnt_s.astype(jnp.float64), seg,
                                num_segments=n)
    rep = jax.ops.segment_min(jnp.arange(n, dtype=jnp.int32), seg,
                              num_segments=n)
    rep = jnp.clip(rep, 0, n - 1)
    m_keys = skeys[rep]
    m_used = jnp.arange(n, dtype=jnp.int32) < n_uniq
    m_keys = jnp.where(m_used, m_keys, SENTINEL64)
    src = order[rep]
    m_dims = tuple(dv[src] for dv in dims)
    m_dvalids = tuple((dv[src] & m_used) for dv in dvalids)
    if want_regs:
        return (m_keys, m_used, m_cnt, m_dims, m_dvalids, n_uniq, m_regs)
    # estimator stats: Σ 2^-rho over present registers + zero count as
    # 2^0 terms is NOT the formula — zeros contribute 1.0 each
    # (hll.compute_estimate); 2^-rho built bit-exactly in f64
    present = m_regs > 0
    non_zero = jnp.sum(present.astype(jnp.int32), axis=1)
    rho = jnp.minimum(m_regs.astype(jnp.uint64), jnp.uint64(1022))
    bits = (jnp.uint64(1023) - rho) << jnp.uint64(52)
    recip = jax.lax.bitcast_convert_type(bits, jnp.float64)
    sum_recip = jnp.sum(jnp.where(present, recip, jnp.float64(0)),
                        axis=1)
    from aresdb_tpu.query import hll as _H

    sum_recip = sum_recip + (jnp.float64(_H.HLL_M)
                             - non_zero.astype(jnp.float64))
    return (m_keys, m_used, m_cnt, m_dims, m_dvalids, n_uniq,
            sum_recip, non_zero)


def _pad_column(values: np.ndarray, validity: np.ndarray, n_padded: int,
                data_type: int):
    n = len(validity)
    if n < n_padded:
        pad_shape = (n_padded - n,) + values.shape[1:]
        values = np.concatenate([values, np.zeros(pad_shape, values.dtype)])
        validity = np.concatenate([validity, np.zeros(n_padded - n, bool)])
    return jnp.asarray(values), jnp.asarray(validity)


def _pad_array_column(list_values, validity, n_padded: int, data_type: int):
    """Ragged array column → (items[n,L], item_valid[n,L], lengths[n], valid).

    L is the power-of-two bucket of the longest row (SURVEY.md §7
    'Variable-length arrays ... padded ragged representations').
    """
    item_dt = mdt.item_type(data_type)
    two_lane = mdt.lanes(item_dt) == 2  # UUID / GeoPoint items
    npdt = mdt.numpy_dtype(item_dt)
    n = len(validity)
    max_len = max((len(v) for v in list_values if v is not None), default=0)
    L = 1
    while L < max_len:
        L <<= 1
    shape = (n_padded, L, 2) if two_lane else (n_padded, L)
    items = np.zeros(shape, npdt)
    item_valid = np.zeros((n_padded, L), bool)
    lengths = np.zeros(n_padded, np.int32)
    row_valid = np.zeros(n_padded, bool)
    row_valid[:n] = np.asarray(validity, bool)
    for i, v in enumerate(list_values):
        if v is None:
            row_valid[i] = False
            continue
        lengths[i] = len(v)
        for j, item in enumerate(v):
            if item is not None:
                items[i, j] = item
                item_valid[i, j] = True
    return (jnp.asarray(items), jnp.asarray(item_valid),
            jnp.asarray(lengths), jnp.asarray(row_valid))


def _default_column(col_schema, n_padded: int):
    """Column never written in this batch: default value or all-null."""
    data_type = col_schema.data_type
    npdt = mdt.numpy_dtype(data_type)
    shape = (n_padded, 2) if mdt.lanes(data_type) == 2 else (n_padded,)
    if col_schema.default_value is not None:
        v = mdt.parse_value(col_schema.default_value, data_type)
        values = np.full(shape, 0, npdt)
        if mdt.lanes(data_type) == 2:
            values[:, 0] = v[0]
            values[:, 1] = v[1]
        else:
            values[:] = v
        validity = np.ones(n_padded, bool)
    else:
        values = np.zeros(shape, npdt)
        validity = np.zeros(n_padded, bool)
    return jnp.asarray(values), jnp.asarray(validity)
