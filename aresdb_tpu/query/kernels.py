"""TPU kernel layer: fused expression eval + fixed-shape group-by reduce.

This replaces the reference's per-AST-node CUDA kernel dispatch
(query/time_series_aggregate.go processExpression + query/transform.cu,
filter.cu, sort_reduce.cu) with a single traced XLA computation per
(plan, batch-shape): XLA fuses the whole expression forest, the filter
mask, the dimension packing and the measure eval into a few kernels, and the
group-by runs as sort + segment-reduce over **static** shapes:

    rows --eval--> filter mask + dim lanes + measure lane
         --pack--> 64/32-bit group key   (exact pack when dims fit, else mixed
                                          splitmix64 hash, mirroring the
                                          reference's 64-bit murmur group-by
                                          in query/sort_reduce.cu:117)
         --sort--> multi-operand lax.sort (keys + measure lanes co-sorted)
         --segment-reduce--> fixed-capacity group table (K slots + overflow)

Selection is mask-carrying (no index compaction): filtered rows get the
sentinel key and sort to the end, bounding the live groups without any
dynamic shape (SURVEY.md §7 'Selection/compaction').

Null semantics mirror the reference functors (query/functor.hpp): binary ops
and comparisons propagate null; AND/OR use the reference's three-valued
rules; null measures contribute the aggregation identity
(query/iterator.hpp:620 MeasureProxy).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from aresdb_tpu.utils import jax_env

jax_env.ensure()

import jax
import jax.numpy as jnp

from aresdb_tpu.common import data_types as mdt
from aresdb_tpu.query import expr as E
from aresdb_tpu.query.compiler import CompiledQuery, QueryError

SENTINEL64 = np.uint64(0xFFFFFFFFFFFFFFFF)
SENTINEL32 = np.uint32(0xFFFFFFFF)

# aggregation identities (match reference get_identity_value)
_F32_MAX = np.float32(np.finfo(np.float32).max)


def _sentinel_of(keys):
    return SENTINEL32 if keys.dtype == jnp.uint32 else SENTINEL64


def _prefix_enabled() -> bool:
    """Sorted-contiguity prefix reduction (ARES_PREFIX=0 restores the
    factored/scatter segment path for A/B testing)."""
    import os

    return os.environ.get("ARES_PREFIX", "") != "0"


# ---------------------------------------------------------------------------
# typed value: (array, validity) pairs flowing through the expression forest
# ---------------------------------------------------------------------------

class _Val:
    __slots__ = ("value", "valid")

    def __init__(self, value, valid):
        self.value = value
        self.valid = valid


class _EvalCtx:
    """Per-trace context: staged column arrays + lazily-joined foreign rows."""

    def __init__(self, columns, foreign, n_rows: int,
                 mosaic: bool = False, prejoined: bool = False):
        # columns: {(table_id, column_id): (values, validity)}
        self.columns = columns
        # foreign: list of (sorted_keys, perm) per foreign table (device arrays)
        self.foreign = foreign
        self.n_rows = n_rows
        # True when this trace runs INSIDE a pallas TPU kernel
        # (fused_dense): emitters must avoid Mosaic-hostile ops — i1
        # select_n ("Unsupported target bitwidth for truncation") and
        # selects whose branches are both splats (invalid-relayout)
        self.mosaic = mosaic
        # True when foreign-table columns were already resolved to
        # row-aligned lanes by an XLA prologue (fused join): VarRef
        # emission must consume them directly instead of probing the join
        self.prejoined = prejoined
        self._foreign_rows: Dict[int, Tuple] = {}
        self._foreign_cols: Dict[Tuple, Tuple] = {}
        self._onehots: Dict[int, Tuple] = {}
        self._geo_matched = None

    FOREIGN_ONEHOT_MAX = 512

    def foreign_column(self, table_id: int, column_id: int, plan,
                       values, validity):
        """Resolve one joined column to row-aligned (values, validity).

        Formulations priced on one v5e at 2M rows vs a 301-row dim table
        (tools/bench_join_gather.py): the round-1 lut+value+validity
        gather chain costs 50.5ms (XLA TPU dynamic-gather lowering);
        a precomposed key-indexed [domain, 2] table with ONE stacked
        gather costs 8.4ms; and for small domains an MXU one-hot dot
        (chunked-exact: four 8-bit channels + validity, every chunk
        bf16-exact) costs 3.7ms. Small-LUT joins take the one-hot dot,
        larger LUT domains the stacked single gather, and everything else
        (sorted probes, 2-lane/int64 values) the original row-gather.
        Reference role: query/hash_lookup.cu device probe.
        """
        ckey = (table_id, column_id)
        cached = self._foreign_cols.get(ckey)
        if cached is not None:
            return cached
        fidx = plan.table_id_to_foreign[table_id]
        ft = plan.foreign_tables[fidx]
        main_key = _emit(ft.main_key_expr, self, plan)
        entry = self.foreign[fidx]
        out = None
        if len(entry) == 1 and values.ndim == 1 \
                and values.dtype.itemsize <= 4 and not self.mosaic:
            (lut,) = entry
            F = lut.shape[0]
            key = main_key.value
            in_range = (key >= 0) & (key < F) & main_key.valid
            idx = jnp.clip(key, 0, F - 1).astype(jnp.int32)
            rowsk = jnp.maximum(lut, 0)
            hitk = lut >= 0
            if values.dtype == jnp.float32:
                v32k = jax.lax.bitcast_convert_type(values, jnp.int32)
            else:
                v32k = values.astype(jnp.int32)
            v32k = v32k[rowsk]                       # [F] per-key values
            bk = (validity[rowsk] & hitk)            # [F] per-key valid
            if F <= self.FOREIGN_ONEHOT_MAX:
                fp = ((F + 127) // 128) * 128
                # shared per joined table: every column's chunk dot reuses
                # the same traced one-hot, so XLA materializes it once
                oh = self._onehots.get(table_id)
                if oh is None:
                    oh = ((idx[:, None]
                           == jnp.arange(fp, dtype=jnp.int32)[None, :])
                          & in_range[:, None]).astype(jnp.bfloat16)
                    self._onehots[table_id] = oh
                chan = jnp.zeros((fp, 5), jnp.float32)
                chan = chan.at[:F, 0].set(
                    (v32k & 0xFF).astype(jnp.float32))
                chan = chan.at[:F, 1].set(
                    ((v32k >> 8) & 0xFF).astype(jnp.float32))
                chan = chan.at[:F, 2].set(
                    ((v32k >> 16) & 0xFF).astype(jnp.float32))
                chan = chan.at[:F, 3].set(
                    ((v32k >> 24) & 0xFF).astype(jnp.float32))
                chan = chan.at[:F, 4].set(bk.astype(jnp.float32))
                dot = jax.lax.dot_general(
                    oh, chan.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)   # [n, 5]
                v32 = (dot[:, 0].astype(jnp.int32)
                       + (dot[:, 1].astype(jnp.int32) << 8)
                       + (dot[:, 2].astype(jnp.int32) << 16)
                       + (dot[:, 3].astype(jnp.int32) << 24))
                valid = (dot[:, 4] > 0) & in_range
            else:
                tbl = jnp.stack([v32k, bk.astype(jnp.int32)],
                                axis=1)               # [F, 2]
                row = tbl[idx]                        # ONE [n, 2] gather
                v32 = row[:, 0]
                valid = (row[:, 1] > 0) & in_range
            if values.dtype == jnp.float32:
                v = jax.lax.bitcast_convert_type(v32, jnp.float32)
            elif values.dtype == jnp.bool_:
                v = v32 != 0
            else:
                v = v32.astype(values.dtype)
            out = (v, valid)
        if out is None:
            rows, hit = self.foreign_row(table_id, fidx, main_key)
            out = (values[rows], validity[rows] & hit)
        self._foreign_cols[ckey] = out
        return out

    def foreign_row(self, table_id: int, fidx: int, main_key: _Val):
        """Resolve main rows to foreign row indices.

        TPU-native replacement for the reference's GPU cuckoo probe
        (query/hash_lookup.cu). Two stagings (executor
        _stage_foreign_tables): a dense key→row lookup table for
        small-domain integer keys — ONE device gather — or sorted keys +
        device searchsorted for the general case (searchsorted costs ~9
        gather rounds, ~425ms per 2M rows on v5e vs ~10ms for the LUT).
        """
        cached = self._foreign_rows.get(table_id)
        if cached is not None:
            return cached
        entry = self.foreign[fidx]
        if len(entry) == 1:
            (lut,) = entry
            size = lut.shape[0]
            key = main_key.value
            in_range = (key >= 0) & (key < size) & main_key.valid
            idx = jnp.clip(key, 0, size - 1).astype(jnp.int32)
            rows = lut[idx]
            hit = in_range & (rows >= 0)
            rows = jnp.maximum(rows, 0)
        else:
            sorted_keys, perm = entry
            key = main_key.value.astype(sorted_keys.dtype)
            pos = jnp.searchsorted(sorted_keys, key)
            pos = jnp.clip(pos, 0, sorted_keys.shape[0] - 1)
            hit = (sorted_keys[pos] == key) & main_key.valid
            rows = perm[pos]
        self._foreign_rows[table_id] = (rows, hit)
        return rows, hit


def _dtype_for_expr_type(t: int):
    if t == E.FLOAT:
        return jnp.float32
    if t == E.BOOLEAN:
        return jnp.bool_
    return jnp.int32


def _to_numeric(v: _Val, dtype) -> _Val:
    val = v.value
    if val.dtype == jnp.bool_ and dtype != jnp.bool_:
        val = val.astype(dtype)
    elif val.dtype != dtype:
        val = val.astype(dtype)
    return _Val(val, v.valid)


def _emit(node: E.Expr, ctx: _EvalCtx, plan: CompiledQuery) -> _Val:
    """Trace one AST node into jnp ops, returning (value, valid) lanes."""
    if isinstance(node, E.ParenExpr):
        return _emit(node.expr, ctx, plan)

    if isinstance(node, E.NumberLiteral):
        if node.type == E.FLOAT:
            v = jnp.float32(node.val)
        elif -(2**31) <= node.int_val < 2**31:
            # 32-bit compute lanes: TPU executes int32 natively while int64
            # is emulated at ~5x cost (matches the reference's 32-bit
            # per-type functors, query/functor.hpp)
            v = jnp.int32(node.int_val)
        else:
            v = jnp.int64(node.int_val)
        return _Val(jnp.full((ctx.n_rows,), v), jnp.ones(ctx.n_rows, jnp.bool_))

    if isinstance(node, E.BooleanLiteral):
        return _Val(jnp.full((ctx.n_rows,), node.val, jnp.bool_),
                    jnp.ones(ctx.n_rows, jnp.bool_))

    if isinstance(node, E.NullLiteral):
        return _Val(jnp.zeros(ctx.n_rows, jnp.int32),
                    jnp.zeros(ctx.n_rows, jnp.bool_))

    if isinstance(node, E.StringLiteral):
        if getattr(node, "uuid_lanes", None) is not None:
            # placeholder lanes; the comparison branch reads uuid_lanes
            return _Val(jnp.zeros((ctx.n_rows, 2), jnp.uint64),
                        jnp.ones(ctx.n_rows, jnp.bool_))
        raise QueryError(
            f"string literal {node.val!r} not resolvable (non-enum context)")

    if isinstance(node, E.VarRef):
        return _emit_varref(node, ctx, plan)

    if isinstance(node, E.UnaryExpr):
        return _emit_unary(node, ctx, plan)

    if isinstance(node, E.BinaryExpr):
        return _emit_binary(node, ctx, plan)

    if isinstance(node, E.Call):
        return _emit_call(node, ctx, plan)

    if isinstance(node, E.Case):
        return _emit_case(node, ctx, plan)

    raise QueryError(f"cannot emit expression node {node!r}")


def _emit_varref(node: E.VarRef, ctx: _EvalCtx, plan: CompiledQuery) -> _Val:
    key = (node.table_id, node.column_id)
    entry = ctx.columns.get(key)
    if entry is None:
        raise QueryError(f"column {node.val!r} not staged")
    if len(entry) == 4:
        raise QueryError(
            f"array column {node.val!r} can only be used via "
            f"length()/contains()/element_at()")
    values, validity = entry
    if node.table_id > 0 and not ctx.prejoined:
        values, validity = ctx.foreign_column(
            node.table_id, node.column_id, plan, values, validity)
    if node.data_type in (mdt.UUID, mdt.GeoPoint):
        return _Val(values, validity)  # (n, 2) lanes, special consumers only
    if node.data_type == mdt.Bool:
        return _Val(values.astype(jnp.bool_), validity)
    if node.data_type == mdt.Float32:
        return _Val(values.astype(jnp.float32), validity)
    if node.data_type == mdt.Int64:
        return _Val(values.astype(jnp.int64), validity)
    # 32-bit lanes for all narrower ints (native TPU width). Uint32 columns
    # are reinterpreted as int32 (two's complement); comparisons against
    # literals stay correct for values < 2^31 (e.g. unix timestamps), which
    # mirrors the reference treating time as uint32 seconds.
    return _Val(values.astype(jnp.int32), validity)


def _emit_unary(node: E.UnaryExpr, ctx: _EvalCtx, plan: CompiledQuery) -> _Val:
    op = node.op
    c = _emit(node.expr, ctx, plan)
    if op == "-":
        v = _to_numeric(c, _dtype_for_expr_type(node.type))
        return _Val(-v.value, v.valid)
    if op == "~":
        v = _to_numeric(c, jnp.int32)
        return _Val(~v.value, v.valid)
    if op == "NOT":
        t = _truthy(c)
        return _Val(~t.value, t.valid)
    if op == "IS_NULL":
        return _Val(~c.valid, jnp.ones(ctx.n_rows, jnp.bool_))
    if op == "IS_NOT_NULL":
        return _Val(c.valid, jnp.ones(ctx.n_rows, jnp.bool_))
    if op == "IS_TRUE":
        t = _truthy(c)
        return _Val(t.value & t.valid, jnp.ones(ctx.n_rows, jnp.bool_))
    if op == "IS_FALSE":
        t = _truthy(c)
        return _Val(~t.value & t.valid, jnp.ones(ctx.n_rows, jnp.bool_))
    if op.startswith("GET_"):
        return _emit_calendar(op, c, ctx)
    raise QueryError(f"unsupported unary op {op!r}")


def _truthy(v: _Val) -> _Val:
    if v.value.dtype == jnp.bool_:
        return v
    return _Val(v.value != 0, v.valid)


def _emit_binary(node: E.BinaryExpr, ctx: _EvalCtx, plan: CompiledQuery) -> _Val:
    op = node.op
    if op in ("AND", "OR"):
        l, r = _truthy(_emit(node.lhs, ctx, plan)), _truthy(_emit(node.rhs, ctx, plan))
        if op == "AND":
            # null if either null (reference AndFunctor)
            valid = l.valid & r.valid
            return _Val(l.value & r.value, valid)
        # OR: true if either valid-true; else null if either null
        true_side = (l.value & l.valid) | (r.value & r.valid)
        valid = true_side | (l.valid & r.valid)
        return _Val(true_side, valid)

    if op in ("IN", "NOT IN"):
        l = _emit(node.lhs, ctx, plan)
        assert isinstance(node.rhs, E.Call)
        hits = jnp.zeros(ctx.n_rows, jnp.bool_)
        for arg in node.rhs.args:
            r = _emit(arg, ctx, plan)
            if l.value.dtype == jnp.float32 or r.value.dtype == jnp.float32:
                dt = jnp.float32
            elif l.value.dtype == jnp.int64 or r.value.dtype == jnp.int64:
                dt = jnp.int64
            else:
                dt = jnp.int32
            hits = hits | (_to_numeric(l, dt).value == _to_numeric(r, dt).value)
        if op == "NOT IN":
            hits = ~hits
        return _Val(hits, l.valid)

    l = _emit(node.lhs, ctx, plan)
    r = _emit(node.rhs, ctx, plan)

    if op in ("=", "!=", "<>", "<", "<=", ">", ">="):
        # UUID literal comparison (two uint64 lanes)
        for a_node, b_node, a_val in ((node.lhs, node.rhs, l),
                                      (node.rhs, node.lhs, r)):
            lanes = getattr(b_node, "uuid_lanes", None)
            if lanes is not None and a_val.value.ndim == 2:
                hi, lo = lanes
                eq = (a_val.value[:, 0] == jnp.uint64(hi)) & \
                    (a_val.value[:, 1] == jnp.uint64(lo))
                if op in ("!=", "<>"):
                    eq = ~eq
                elif op != "=":
                    raise QueryError("UUIDs support only =/!= comparisons")
                return _Val(eq, a_val.valid)
        # GeoPoint equality on 2-lane arrays
        if l.value.ndim == 2 or r.value.ndim == 2:
            eq = jnp.all(l.value == r.value, axis=-1)
            valid = l.valid & r.valid
            return _Val(eq if op == "=" else ~eq, valid)
        if l.value.dtype == jnp.float32 or r.value.dtype == jnp.float32:
            dt = jnp.float32
        elif l.value.dtype == jnp.int64 or r.value.dtype == jnp.int64:
            dt = jnp.int64
        else:
            dt = jnp.int32
        a, b = _to_numeric(l, dt).value, _to_numeric(r, dt).value
        if op == "=":
            v = a == b
        elif op in ("!=", "<>"):
            v = a != b
        elif op == "<":
            v = a < b
        elif op == "<=":
            v = a <= b
        elif op == ">":
            v = a > b
        else:
            v = a >= b
        return _Val(v, l.valid & r.valid)

    valid = l.valid & r.valid
    if op == "/":
        a = _to_numeric(l, jnp.float32).value
        b = _to_numeric(r, jnp.float32).value
        return _Val(jnp.where(b != 0, a / jnp.where(b != 0, b, 1.0), 0.0),
                    valid & (b != 0))
    if op in ("+", "-", "*", "%", "FLOOR"):
        dt = _dtype_for_expr_type(node.type)
        if dt == jnp.bool_:
            dt = jnp.int32
        if l.value.dtype == jnp.int64 or r.value.dtype == jnp.int64:
            dt = jnp.int64
        a = _to_numeric(l, dt).value
        b = _to_numeric(r, dt).value
        if op == "+":
            return _Val(a + b, valid)
        if op == "-":
            return _Val(a - b, valid)
        if op == "*":
            return _Val(a * b, valid)
        if op == "%":
            # C truncation semantics (sign of the DIVIDEND), matching the
            # reference's ModFunctor (query/functor.hpp:260, C++ `%`) —
            # numpy/jnp `%` is floored (sign of divisor) and diverges on
            # negative operands ((-7) % 3: C -1, floored 2). Ported by the
            # functor matrix (functor_unittest.cu ModFunctor cases).
            safe = jnp.where(b != 0, b, 1)
            return _Val(jnp.where(b != 0, jax.lax.rem(a, safe), 0),
                        valid & (b != 0))
        # FLOOR(a, b) = a - a % b with C trunc-mod (reference FloorFunctor,
        # query/functor.hpp:338)
        safe = jnp.where(b != 0, b, 1)
        return _Val(jnp.where(b != 0, a - jax.lax.rem(a, safe), 0),
                    valid & (b != 0))
    if op in ("&", "|", "^", "<<", ">>"):
        a = _to_numeric(l, jnp.int32).value
        b = _to_numeric(r, jnp.int32).value
        if op == "&":
            return _Val(a & b, valid)
        if op == "|":
            return _Val(a | b, valid)
        if op == "^":
            return _Val(a ^ b, valid)
        if op == "<<":
            return _Val(a << b, valid)
        return _Val(a >> b, valid)
    raise QueryError(f"unsupported binary op {op!r}")


def _emit_call(node: E.Call, ctx: _EvalCtx, plan: CompiledQuery) -> _Val:
    name = node.name
    if name == E.HOUR:
        c = _to_numeric(_emit(node.args[0], ctx, plan), jnp.int32)
        return _Val((c.value % 86400) // 3600, c.valid)
    if name == E.DAY_OF_WEEK:
        # reference functor: weekday 1..7 with Monday=1 (GetDayOfWeekFunctor)
        c = _to_numeric(_emit(node.args[0], ctx, plan), jnp.int32)
        days = c.value // 86400
        return _Val((days + 3) % 7 + 1, c.valid)
    if name == E.CONVERT_TZ:
        base = _emit(node.args[0], ctx, plan)
        off = _emit(node.args[1], ctx, plan) if len(node.args) > 1 else None
        if off is None:
            return base
        return _Val(_to_numeric(base, jnp.int32).value
                    + _to_numeric(off, jnp.int32).value,
                    base.valid & off.valid)
    if name == E.HEX:
        return _emit(node.args[0], ctx, plan)  # 2-lane uuid passthrough
    if name == "__numeric_bucket":
        return _emit_numeric_bucket(node, ctx, plan)
    if name in (E.LENGTH, E.CONTAINS, E.ELEMENT_AT):
        return _emit_array_op(node, ctx, plan)
    if name == "__tz_offset":
        # per-row UTC offset via the joined timezone enum rank (reference
        # timezoneLookupD, aql_processor.go:487)
        rank = _emit(node.args[0], ctx, plan)
        table = jnp.asarray(node.tz_offsets)
        idx = jnp.clip(rank.value.astype(jnp.int32), 0, table.shape[0] - 1)
        return _Val(table[idx], rank.valid)
    raise QueryError(f"unsupported function {name!r} in kernel emitter")


def _array_entry(node: E.Call, ctx: _EvalCtx, plan: CompiledQuery):
    arg = node.args[0]
    if not (isinstance(arg, E.VarRef) and mdt.is_array_type(arg.data_type)):
        raise QueryError(
            f"{node.name} requires an array column, got {arg}")
    entry = ctx.columns.get((arg.table_id, arg.column_id))
    if entry is None or len(entry) != 4:
        raise QueryError(f"array column {arg.val!r} not staged")
    return entry  # (items[n,L], item_valid[n,L], lengths[n], row_valid[n])


def _emit_array_op(node: E.Call, ctx: _EvalCtx, plan: CompiledQuery) -> _Val:
    """Array ops over padded ragged staging.

    Semantics parity with the reference functors (query/functor.hpp:470-640):
    length(null array) is null; element_at supports negative (from-end)
    indices and yields null out of range or when the element is null;
    contains matches only valid elements.
    """
    items, item_valid, lengths, row_valid = _array_entry(node, ctx, plan)
    two_lane = items.ndim == 3  # UUID/GeoPoint items staged as (n, L, 2)
    name = node.name
    if name == E.LENGTH:
        return _Val(lengths.astype(jnp.int32), row_valid)
    if name == E.CONTAINS:
        lanes = getattr(node.args[1], "uuid_lanes", None)
        if two_lane:
            if lanes is None:
                raise QueryError(
                    "contains() over a UUID array requires a UUID literal")
            hi, lo = lanes
            eq = (items[:, :, 0] == jnp.uint64(hi)) & \
                (items[:, :, 1] == jnp.uint64(lo))
            hit = jnp.any(item_valid & eq, axis=1)
            return _Val(hit, row_valid)
        needle = _emit(node.args[1], ctx, plan)
        nv = needle.value
        if items.dtype == jnp.float32 or nv.dtype == jnp.float32:
            a = items.astype(jnp.float32)
            b = nv.astype(jnp.float32)
        else:
            a = items.astype(jnp.int32)
            b = nv.astype(jnp.int32)
        hit = jnp.any(item_valid & (a == b[:, None]), axis=1)
        return _Val(hit, row_valid & needle.valid)
    # element_at
    idx = _to_numeric(_emit(node.args[1], ctx, plan), jnp.int32)
    L = items.shape[1]
    lengths32 = lengths.astype(jnp.int32)
    eff = jnp.where(idx.value < 0, lengths32 + idx.value, idx.value)
    in_range = (eff >= 0) & (eff < lengths32)
    safe = jnp.clip(eff, 0, L - 1)
    if two_lane:
        value = jnp.take_along_axis(items, safe[:, None, None], axis=1)[:, 0, :]
    else:
        value = jnp.take_along_axis(items, safe[:, None], axis=1)[:, 0]
    evalid = jnp.take_along_axis(item_valid, safe[:, None], axis=1)[:, 0]
    valid = row_valid & idx.valid & in_range & evalid
    if not two_lane and value.dtype not in (jnp.float32, jnp.bool_):
        value = value.astype(jnp.int32)
    return _Val(value, valid)


def _emit_numeric_bucket(node: E.Call, ctx: _EvalCtx, plan: CompiledQuery) -> _Val:
    c = _to_numeric(_emit(node.args[0], ctx, plan), jnp.float32)
    b = node.bucketizer  # attached by compiler
    if b.bucket_width:
        w = jnp.float32(b.bucket_width)
        return _Val(jnp.floor(c.value / w) * w, c.valid)
    if b.log_base:
        base = jnp.float32(b.log_base)
        pos = c.value > 0
        exp = jnp.floor(jnp.log(jnp.where(pos, c.value, 1.0)) / jnp.log(base))
        return _Val(jnp.where(pos, base ** exp, 0.0), c.valid & pos)
    parts = jnp.asarray(np.asarray(b.manual_partitions, np.float32))
    idx = jnp.searchsorted(parts, c.value, side="right")
    lower = jnp.concatenate([jnp.array([-np.inf], jnp.float32), parts])[idx]
    return _Val(lower, c.valid)


def _case_select(take, a, b, ctx: _EvalCtx):
    """Branch select for CASE emission. In Mosaic (fused kernel) contexts
    select_n is avoided entirely: i1 selects fail to lower ("Unsupported
    target bitwidth for truncation"), and a select whose branches are both
    splats (e.g. `then fare else 0` with literal arms) makes Mosaic infer
    a replicated result layout and demand the per-lane condition
    replicated ("Invalid relayout"). The bit-space integer blend is
    value-exact for every dtype, NaN payloads included."""
    if not ctx.mosaic or a.dtype in (jnp.int64, jnp.float64):
        # 64-bit never occurs under Mosaic (x64 is disabled in-kernel and
        # plan_fused rejects int64 lanes); keep XLA's native select
        return jnp.where(take, a, b)
    t32 = take.astype(jnp.int32)
    nt32 = jnp.int32(1) - t32
    a = jnp.broadcast_to(a, take.shape)
    b = jnp.broadcast_to(b, take.shape)
    if a.dtype == jnp.bool_:
        return (t32 * a.astype(jnp.int32) + nt32 * b.astype(jnp.int32)) > 0
    if a.dtype == jnp.float32:
        ab = jax.lax.bitcast_convert_type(a, jnp.int32)
        bb = jax.lax.bitcast_convert_type(b, jnp.int32)
        return jax.lax.bitcast_convert_type(t32 * ab + nt32 * bb,
                                            jnp.float32)
    return (t32 * a.astype(jnp.int32)
            + nt32 * b.astype(jnp.int32)).astype(a.dtype)


def _emit_case(node: E.Case, ctx: _EvalCtx, plan: CompiledQuery) -> _Val:
    dt = _dtype_for_expr_type(node.type)
    if node.else_expr is not None:
        out = _to_numeric(_emit(node.else_expr, ctx, plan), dt)
        value, valid = out.value, out.valid
    else:
        value = jnp.zeros(ctx.n_rows, dt)
        valid = jnp.zeros(ctx.n_rows, jnp.bool_)
    for cond, res in reversed(node.when_thens):
        c = _truthy(_emit(cond, ctx, plan))
        r = _to_numeric(_emit(res, ctx, plan), dt)
        take = c.value & c.valid
        value = _case_select(take, r.value, value, ctx)
        valid = _case_select(take, r.valid, valid, ctx)
    return _Val(value, valid)


# ---------------------------------------------------------------------------
# calendar math (vectorized port of the 400-year-cycle algorithm the
# reference uses on device, query/functor.cu:71 resolveTimeBucketizer)
# ---------------------------------------------------------------------------

_ABSOLUTE_ZERO_TS = -62135596800  # 0001-01-01T00:00:00Z
_DAYS_PER_400Y = 365 * 400 + 97
_DAYS_PER_100Y = 365 * 100 + 24
_DAYS_PER_4Y = 365 * 4 + 1
_DAYS_BEFORE_MONTH = np.array(
    [0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334, 365], np.int64)


def _calendar_decompose(ts):
    """ts (int64 seconds) → (year_start_ts, days_into_year, year_index)."""
    t = ts - _ABSOLUTE_ZERO_TS
    days = t // 86400
    n = days // _DAYS_PER_400Y
    year = 400 * n
    start = n * _DAYS_PER_400Y * 86400
    days = days - _DAYS_PER_400Y * n
    n = days // _DAYS_PER_100Y
    n = n - (n >> 2)
    year = year + 100 * n
    start = start + n * _DAYS_PER_100Y * 86400
    days = days - _DAYS_PER_100Y * n
    n = days // _DAYS_PER_4Y
    year = year + 4 * n
    start = start + n * _DAYS_PER_4Y * 86400
    days = days - _DAYS_PER_4Y * n
    n = days // 365
    n = n - (n >> 2)
    year = year + n
    days = days - 365 * n
    start = start + n * 365 * 86400
    return start + _ABSOLUTE_ZERO_TS, days, year


def _is_leap(year):
    # year here is 0-based (reference isLeapYear(year + 1))
    y = year + 1
    return ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)


def _days_before_month(month, leap):
    base = jnp.asarray(_DAYS_BEFORE_MONTH)[month]
    return base + jnp.where(leap & (month >= 2), 1, 0)


def _month_of(days, leap):
    month = days // 31
    month_end = _days_before_month(month + 1, leap)
    return jnp.where(days >= month_end, month + 1, month)


def _emit_calendar(op: str, c: _Val, ctx: _EvalCtx) -> _Val:
    ts = _to_numeric(c, jnp.int64).value
    if op == "GET_WEEK_START":
        # reference getWeekStartTimestamp (functor.cu:207)
        four_days = 4 * 86400
        v = jnp.where(ts < four_days, 0,
                      ts - (ts - four_days) % (7 * 86400))
        return _Val(v, c.valid)
    start, days, year = _calendar_decompose(ts)
    if op == "GET_YEAR_START":
        return _Val(start, c.valid)
    if op == "GET_DAY_OF_YEAR":
        return _Val(days, c.valid)
    leap = _is_leap(year)
    month = _month_of(days, leap)
    if op == "GET_MONTH_START":
        return _Val(start + _days_before_month(month, leap) * 86400, c.valid)
    if op == "GET_DAY_OF_MONTH":
        return _Val(days - _days_before_month(month, leap), c.valid)
    if op == "GET_MONTH_OF_YEAR":
        return _Val(month, c.valid)
    quarter = month // 3
    if op == "GET_QUARTER_OF_YEAR":
        return _Val(quarter, c.valid)
    if op == "GET_QUARTER_START":
        return _Val(start + _days_before_month(quarter * 3, leap) * 86400,
                    c.valid)
    raise QueryError(f"unsupported calendar op {op!r}")


# ---------------------------------------------------------------------------
# dim packing: exact bit-pack when dims fit in 64 bits, else splitmix64 mix
# ---------------------------------------------------------------------------

def _splitmix64(x):
    x = (x + jnp.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
    return x ^ (x >> jnp.uint64(31))


def _dim_bits(data_type: int) -> int:
    if data_type == mdt.Bool:
        return 1
    return mdt.data_type_bits(data_type)


def _value_bits_u64(dim_val: _Val, data_type: int):
    """Dim value → uint64 bit pattern (list of lanes for UUID)."""
    v = dim_val.value
    if data_type == mdt.UUID:
        return [v[:, 0].astype(jnp.uint64), v[:, 1].astype(jnp.uint64)]
    if data_type == mdt.GeoPoint:
        lat = jax.lax.bitcast_convert_type(v[:, 0], jnp.uint32).astype(jnp.uint64)
        lng = jax.lax.bitcast_convert_type(v[:, 1], jnp.uint32).astype(jnp.uint64)
        return [lat | (lng << jnp.uint64(32))]
    if v.dtype == jnp.float32:
        return [jax.lax.bitcast_convert_type(v, jnp.uint32).astype(jnp.uint64)]
    if v.dtype == jnp.bool_:
        return [v.astype(jnp.uint64)]
    return [v.astype(jnp.uint64) & jnp.uint64((1 << _dim_bits(data_type)) - 1
                                              if _dim_bits(data_type) < 64
                                              else 0xFFFFFFFFFFFFFFFF)]


def _packing_type(d) -> int:
    """Group-key packing width type: geo dims pack as their 8-bit shape
    index, not their (UUID) formatting type."""
    return mdt.SmallEnum if d.geo_dim else d.data_type


def pack_modes(dim_types: List[int]) -> Tuple[bool, bool]:
    """(exact, sortpackable) for a dim-type list — static trace-time facts.

    exact: the u64 key embeds every dim's (value bits, valid bit) losslessly,
    so group dim values UNPACK from the group key (no iota lane in the sort,
    no [n]-sized representative-row gathers). key62: the key fits 62 bits,
    leaving room to fold the measure-validity bit into the key's low bit
    (drops the i8 sort lane — see reduce_by_key cost table)."""
    total_bits = sum(min(_dim_bits(t), 64) + 1 for t in dim_types)
    exact = total_bits <= 63 and not any(t == mdt.UUID for t in dim_types)
    key62 = total_bits <= 62 and exact
    return exact, key62


def unpack_dim_keys(gkeys, dim_vals: List[_Val], dim_types: List[int],
                    slot_used):
    """Invert pack_dim_keys' exact packing: per-slot dim (values, valids)
    straight from the u64 group keys. Valid only when pack_modes(...)[0].

    Invalid dims unpack as (0, False) — pack_dim_keys canonicalizes null
    value bits to zero, and no consumer reads a value behind valid=False.
    """
    values, valids = [], []
    shift = 0
    for dv, t in zip(dim_vals, dim_types):
        width = min(_dim_bits(t), 64)
        assert width < 64 and t not in (mdt.UUID, mdt.GeoPoint)
        vbit = ((gkeys >> jnp.uint64(shift)) & jnp.uint64(1)) != 0
        shift += 1
        bits = (gkeys >> jnp.uint64(shift)) & jnp.uint64((1 << width) - 1)
        shift += width
        tmpl = dv.value.dtype
        if tmpl == jnp.float32:
            val = jax.lax.bitcast_convert_type(
                bits.astype(jnp.uint32), jnp.float32)
        elif tmpl == jnp.bool_:
            val = bits != 0
        elif jnp.issubdtype(tmpl, jnp.signedinteger) and width < 64:
            sbit = jnp.uint64(1) << jnp.uint64(width - 1)
            val = (bits.astype(jnp.int64)
                   ^ sbit.astype(jnp.int64)) - sbit.astype(jnp.int64)
            val = val.astype(tmpl)
        else:
            val = bits.astype(tmpl)
        values.append(val)
        valids.append(vbit & slot_used)
    return values, valids


def np_pack_dim_keys(dim_values: List[np.ndarray],
                     dim_valids: List[np.ndarray],
                     dim_types: List[int]) -> np.ndarray:
    """Host-side (numpy) mirror of pack_dim_keys' EXACT branch: identical
    bit layout (valid bit below value bits per dim), so host-decoded group
    dims (e.g. dense slot tables) repack to the same canonical u64 keys the
    device kernels emit — the cross-source merge key of GroupTable.
    Callers must check pack_modes(dim_types)[0] first."""
    n = len(dim_valids[0]) if dim_valids else 0
    key = np.zeros(n, np.uint64)
    shift = 0
    for vals, valids, t in zip(dim_values, dim_valids, dim_types):
        vals = np.asarray(vals)
        valids = np.asarray(valids, bool)
        width = min(_dim_bits(t), 64)
        if vals.dtype == np.float32:
            bits = vals.view(np.uint32).astype(np.uint64)
        elif vals.dtype == np.bool_:
            bits = vals.astype(np.uint64)
        else:
            mask64 = np.uint64((1 << width) - 1 if width < 64
                               else 0xFFFFFFFFFFFFFFFF)
            bits = vals.astype(np.int64).view(np.uint64) & mask64
        bits = np.where(valids, bits, np.uint64(0))
        key |= valids.astype(np.uint64) << np.uint64(shift)
        shift += 1
        key |= bits << np.uint64(shift)
        shift += width
    return key


def pack_dim_keys(dim_vals: List[_Val], dim_types: List[int], mask):
    """Per-row group key; filtered rows get the sentinel.

    Emits uint32 keys when the packed dims fit 31 bits (a u32 sort network
    runs ~1.4x the u64 one on v5e) and uint64 otherwise; reduce_by_key
    widens group keys back to the canonical u64 space on output.
    """
    total_bits = sum(min(_dim_bits(t), 64) + 1 for t in dim_types)
    n = mask.shape[0]
    narrow = total_bits <= 31 and not any(t == mdt.UUID for t in dim_types)
    if not dim_vals:
        key = jnp.zeros(n, jnp.uint64)
    elif total_bits <= 63 and not any(t == mdt.UUID for t in dim_types):
        key = jnp.zeros(n, jnp.uint64)
        shift = 0
        for dv, t in zip(dim_vals, dim_types):
            # canonical NULL: zero the value bits so every null row lands in
            # one group regardless of the undefined value lane.
            # The valid bit sits BELOW the value bits (round 4): the total
            # order is identical either way (null key 0 still sorts first,
            # valid values keep their relative order), but nulls now sit
            # NEXT to the value range instead of 2^width away — so the
            # packed sort's runtime key rebase (kmax - kmin) stays within
            # one value-range even when null rows are present, unlocking
            # the single-operand sort for f32/u32-wide dims
            bits = jnp.where(dv.valid, _value_bits_u64(dv, t)[0], jnp.uint64(0))
            width = min(_dim_bits(t), 64)
            key = key | (dv.valid.astype(jnp.uint64) << jnp.uint64(shift))
            shift += 1
            key = key | (bits << jnp.uint64(shift))
            shift += width
    else:
        key = jnp.uint64(0)
        acc = jnp.zeros(n, jnp.uint64)
        for dv, t in zip(dim_vals, dim_types):
            for lane in _value_bits_u64(dv, t):
                lane = jnp.where(dv.valid, lane, jnp.uint64(0))
                acc = _splitmix64(acc ^ _splitmix64(
                    lane + dv.valid.astype(jnp.uint64)))
        key = acc
        # avoid accidental sentinel
        key = jnp.where(key == SENTINEL64, jnp.uint64(0), key)
        narrow = False
    if narrow:
        # real keys < 2^31 < the u32 sentinel, so the downcast is lossless
        # and u64(key32) reproduces the exact u64 packing for merges
        return jnp.where(mask, key.astype(jnp.uint32), SENTINEL32)
    return jnp.where(mask, key, SENTINEL64)


# ---------------------------------------------------------------------------
# batch kernels
# ---------------------------------------------------------------------------

def _eval_common(plan: CompiledQuery, ctx: _EvalCtx, n_valid, live_cutoff=None):
    """Filter mask + dim value lanes.

    live_cutoff: archiving-cutoff custom filter for fact-table live batches —
    rows below the cutoff already live in archive batches and must be
    excluded to avoid double counting (reference: liveCustomFilter,
    query/aql_processor.go processBatch). Archive batches pass 0.
    """
    row_ok = (jnp.arange(ctx.n_rows, dtype=jnp.int32) < n_valid)
    mask = row_ok
    if (live_cutoff is not None and plan.main_schema.table.is_fact_table
            and (0, 0) in ctx.columns):
        tvals, _ = ctx.columns[(0, 0)]
        mask = mask & (tvals.astype(jnp.int64) >= live_cutoff.astype(jnp.int64))
    for f in plan.filters + plan.time_filter_expr:
        v = _truthy(_emit(f, ctx, plan))
        mask = mask & v.value & v.valid
    if plan.geo is not None and plan.geo.has_filter:
        matched, point_valid = _geo_matched(plan, ctx)
        inside = matched >= 0
        # null points are dropped in BOTH modes: the reference writes
        # !inOrOut into the predicate for null points so the remove-if
        # always filters them (query/iterator.hpp:1380-1388)
        mask = mask & point_valid & (~inside if plan.geo.exclude else inside)
    dim_vals = []
    for d in plan.dimensions:
        if d.geo_dim:
            matched, _ = _geo_matched(plan, ctx)
            dim_vals.append(_Val(matched, matched >= 0))
        else:
            dim_vals.append(_emit(d.expr, ctx, plan))
    return mask, dim_vals


def _geo_matched(plan: CompiledQuery, ctx: _EvalCtx):
    """Per-row (matched shape index, point validity), cached across the
    filter + dimension uses."""
    cached = getattr(ctx, "_geo_matched", None)
    if cached is not None:
        return cached
    from aresdb_tpu.query import geo as G

    slope, lat1 = ctx.columns[(-1, 0)]
    lng1, lng2 = ctx.columns[(-1, 1)]
    onehot, _ = ctx.columns[(-1, 2)]
    n_shapes, _ = ctx.columns[(-1, 3)]
    pv = _emit(plan.geo.point_expr, ctx, plan)

    def dense():
        return G.matched_shape(pv.value[:, 0], pv.value[:, 1], pv.valid,
                               slope, lat1, lng1, lng2, onehot, n_shapes)

    if (-1, 4) in ctx.columns:
        # bbox-pruned two-pass path, bit-equal to the dense sweep; falls
        # back to it on candidate-count overflow (geo.PRUNE_ROUNDS_CAP)
        tab3, bbox = ctx.columns[(-1, 4)]
        pruned, overflow = G.matched_shape_pruned(
            pv.value[:, 0], pv.value[:, 1], pv.valid, tab3, bbox, n_shapes)
        matched = jax.lax.cond(overflow, dense, lambda: pruned)
    else:
        matched = dense()
    ctx._geo_matched = (matched, pv.valid)
    return ctx._geo_matched


def _measure_lane(plan: CompiledQuery, ctx: _EvalCtx):
    """Measure accumulator lane.

    64-bit is emulated on TPU (~5x), so: float sums/avg accumulate f32
    per batch (the host merge is f64); count accumulates f32 (exact for
    counts < 2^24; batches are capped well below); only integer sums keep
    the reference's i64 accumulator (AGGR_SUM_SIGNED semantics).
    """
    m = plan.measure
    mv = _emit(m.expr, ctx, plan)
    if m.agg == "count":
        dtype = jnp.float32
    elif m.agg in ("sum", "avg"):
        dtype = jnp.float32 if m.out_float or m.agg == "avg" else jnp.int64
    else:
        dtype = jnp.float32 if m.out_float else jnp.int32
    return _Val(mv.value.astype(dtype), mv.valid)


_PREFIX_BLOCK = 256   # round-4 (tools/bench_prefix_block.py, n=4M num=32k
                      # on one v5e): post-sort reduce 5.03ms at L=512,
                      # 2.45 at 256, 2.33 at 128, 3.39 at 64 — the
                      # [num, L] boundary windows dominate above the knee,
                      # the [n/L] block prefix below it. 128 measured best
                      # standalone but blows XLA's 16MB scoped-vmem limit
                      # inside the full fused batch program (reduce-window
                      # cumsum stack allocation); 256 keeps ~all the win


def _cumsum_2lvl(x, axis: int = 0):
    """Cumulative sum via 128-wide two-level decomposition (f64 path).

    XLA lowers long cumsums to reduce-window programs whose scoped-vmem
    stack scales with the surrounding fusion; inside the fully-fused batch
    program that blows the 16MB scoped limit ('Ran out of memory in memory
    space vmem ... reduce-window'). Splitting into within-128 cumsums plus
    a short offset cumsum keeps every window tiny. Exact for integer
    dtypes and f64 (addition re-association only)."""
    B = 128
    if axis != 0:
        x = jnp.moveaxis(x, axis, 0)
    n = x.shape[0]
    if n <= B:
        out = jnp.cumsum(x, axis=0)
        return jnp.moveaxis(out, 0, axis) if axis != 0 else out
    pad = (-n) % B
    xp = jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]) if pad else x
    m = xp.shape[0] // B
    rows = xp.reshape((m, B) + x.shape[1:])
    within = jnp.cumsum(rows, axis=1)
    offs = _cumsum_2lvl(within[:, -1])
    offs = jnp.concatenate(
        [jnp.zeros((1,) + x.shape[1:], x.dtype), offs[:-1]])
    out = (within + offs[:, None]).reshape((m * B,) + x.shape[1:])[:n]
    return jnp.moveaxis(out, 0, axis) if axis != 0 else out


def _row_cumsum_mxu(rows, small_ints: bool = False):
    """[m, B] inclusive row-wise cumsum as ONE triangular f32 matmul on
    the MXU — no reduce-window lowering at all, so no scoped-vmem
    lottery. Exact for integer inputs whose prefix totals stay below
    2^24. small_ints=True means every input is an integer <= 256
    (bf16-exact), so the single-pass DEFAULT dot is already exact;
    otherwise HIGHEST keeps f32-exact products."""
    b = rows.shape[1]
    tri = jnp.triu(jnp.ones((b, b), jnp.float32))
    prec = (jax.lax.Precision.DEFAULT if small_ints
            else jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(
        rows.astype(jnp.float32), tri, (((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32)


def _cumsum_int(x, axis: int = 0, small_ints: bool = False):
    """Exact integer cumsum via MXU triangular matmuls (see
    _row_cumsum_mxu). Valid for prefix totals < 2^24 — callers here sum
    mark/count flags over at most one batch (n <= 2^22 rows)."""
    B = 128
    if x.ndim == 2 and axis == 1:
        return _row_cumsum_mxu(x, small_ints).astype(x.dtype)
    assert axis == 0 and x.ndim == 1
    n = x.shape[0]
    pad = (-n) % B
    xp = jnp.concatenate([x, jnp.zeros(pad, x.dtype)]) if pad else x
    m = xp.shape[0] // B
    within = _row_cumsum_mxu(xp.reshape(m, B), small_ints)
    if m == 1:
        return within.reshape(-1)[:n].astype(x.dtype)
    offs = _row_cumsum_mxu(within[:, -1].reshape(1, m)).reshape(m)
    offs = jnp.concatenate([jnp.zeros(1, jnp.float32), offs[:-1]])
    return (within + offs[:, None]).reshape(-1)[:n].astype(x.dtype)


def sorted_starts_marks(first, num: int, n: int, sent_start):
    """starts[k] = row index of the k-th run-start mark (sent_start — the
    first sentinel row, or n when none — when there is no k-th mark, which
    reproduces lower_bound-over-clipped-segment-ids exactly: sentinel rows
    sort last with clipped id k_groups, so every needle past the live runs
    lands on the sentinel run). No 4M cumsum and no binary-search gather
    rounds (a flat searchsorted costs ~3ms at n=4M/num=32k on one v5e: 13+
    rounds of random scalar gathers).

    Construction: per-block mark counts -> exclusive block ranks -> a tiny
    scatter-histogram inverts the monotone rank sequence (count_le), so the
    k-th mark's block is a direct lookup; one contiguous window gather of
    the candidate block's marks plus an in-block rank count finishes the
    job. ~1ms at n=4M, num=32k (measured; replaces 1.9ms cumsum+clip +
    3.1ms two-level search).
    """
    L = _PREFIX_BLOCK
    if first.shape[0] % L != 0:
        pad = L - first.shape[0] % L
        first = jnp.concatenate([first, jnp.zeros(pad, jnp.bool_)])
    nb = first.shape[0] // L
    f = first.reshape(nb, L)
    blk_cnt = jnp.sum(f.astype(jnp.int32), axis=1)            # [nb]
    crank = _cumsum_int(blk_cnt)
    blk_rank = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), crank[:-1]])                # exclusive
    total = crank[nb - 1]
    j = jnp.arange(num, dtype=jnp.int32)
    # count_le[j] = #blocks with blk_rank <= j, via a [nb]-sized scatter
    # histogram (tiny) — cand block of the j-th mark is the last such block
    hist = jnp.zeros(num + 1, jnp.int32).at[
        jnp.clip(blk_rank, 0, num)].add(1)
    cnt_le = _cumsum_int(hist)[:num]                          # inclusive
    cand = jnp.clip(cnt_le - 1, 0, nb - 1)                    # [num]
    win = f[cand]                                             # [num, L]
    wrank = _cumsum_int(win.astype(jnp.int32), axis=1,
                        small_ints=True)                      # inclusive
    local_j = j - blk_rank[cand]
    pos = jnp.sum((wrank <= local_j[:, None]).astype(jnp.int32), axis=1)
    return jnp.where(j < total, cand * L + pos,
                     sent_start).astype(jnp.int32)


def sorted_starts(seg_c, num: int):
    """starts[k] = first index with seg_c >= k, for MONOTONE seg_c.

    A flat `searchsorted` binary search over n=4M rows costs ~7ms on one
    v5e chip (22 rounds, each a full-HBM gather). Two-level search — binary
    search over the [n/512] block-first values, then a vectorized count
    inside the one candidate block per needle — measures ~1.5ms. Falls back
    to the flat search when n is not block-aligned or the [num, 512] gather
    window would exceed the win (large num).
    """
    n = seg_c.shape[0]
    L = _PREFIX_BLOCK
    if n % L != 0 or n < 2 * L or num > (1 << 16):
        return jnp.searchsorted(
            seg_c, jnp.arange(num, dtype=seg_c.dtype)).astype(jnp.int32)
    nb = n // L
    blk_first = seg_c.reshape(nb, L)[:, 0]
    needles = jnp.arange(num, dtype=seg_c.dtype)
    bb = jnp.searchsorted(blk_first, needles).astype(jnp.int32)
    cand = jnp.maximum(bb - 1, 0)
    # lower bound lies in block `cand`, or is exactly bb*L when the whole
    # candidate block is < k (then the in-block count is L)
    window = seg_c.reshape(nb, L)[cand]                       # [num, L]
    within = jnp.sum((window < needles[:, None]).astype(jnp.int32), axis=1)
    return jnp.minimum(cand * L + within, n).astype(jnp.int32)


def sorted_segment_sum(values, num: int, starts, ends):
    """Segment sums for MONOTONE segment ids via block decomposition and
    boundary gathers — the sorted-data replacement for scatter/factored
    reductions (values must already be zeroed on invalid rows).

    Each slot's span [start, end) decomposes into a partial head block, a
    partial tail block, and the full 512-row blocks strictly between: the
    partials are masked f32 sums over the slot's OWN rows (error relative
    to the group's magnitude, like the scatter path) and the middle is an
    exact f64 difference of the running block-total prefix. No scatter, no
    full-length cumsum, and counts stay exact. Measured at n=4M, K=32k on
    one v5e chip: ~2ms vs 13.7ms for the factored MXU reduction and ~37ms
    for XLA's sorted segment_sum. Reference role: sort_reduce.cu
    ReduceByKey (query/sort_reduce.cu:117).
    """
    n, c = values.shape
    L = _PREFIX_BLOCK
    n_pad = ((n + L - 1) // L) * L
    # CHANNEL-MAJOR internals: a [n, c] array with a tiny minor dim can be
    # assigned the {1,0:T(8,128)} layout by XLA — the c=3 lane dim pads to
    # 128, a 42x memory expansion that OOMed a 33M-row archive batch (the
    # lax.cond below forces a canonical-layout copy of its captured
    # operand). [c, n] keeps the long axis minor, so every temp stays ~1x.
    vt = values.T                                             # [c, n]
    if n_pad != n:
        vt = jnp.concatenate(
            [vt, jnp.zeros((c, n_pad - n), values.dtype)], axis=1)
    nb = n_pad // L

    def span_sums(vt_):
        v3 = vt_.reshape(c, nb, L)
        blk = jnp.sum(v3, axis=2).astype(jnp.float64)         # [c, nb]
        # bpref[:, i] = exact sum of blocks < i
        bpref = jnp.concatenate(
            [jnp.zeros((c, 1), jnp.float64),
             _cumsum_2lvl(blk, axis=1)], axis=1)
        last = jnp.clip(ends - 1, 0, n_pad - 1)               # inclusive end
        hb = jnp.clip(starts, 0, n_pad - 1) // L
        tb = last // L
        same = hb == tb
        pos = jnp.arange(L, dtype=jnp.int32)[None, :]
        so = (starts % L)[:, None]
        eo = (last % L)[:, None]
        hmask = (pos >= so) & (pos <= jnp.where(same[:, None], eo, L - 1))
        tmask = (pos <= eo) & (~same)[:, None]
        head = jnp.sum(v3[:, hb] * hmask[None], axis=2)       # [c, num] f32
        tail = jnp.sum(v3[:, tb] * tmask[None], axis=2)
        mid = jnp.where(same[None, :], jnp.float64(0),
                        bpref[:, tb] - bpref[:, jnp.minimum(hb + 1, nb)])
        out = head.astype(jnp.float64) + tail.astype(jnp.float64) + mid
        return jnp.where((starts < ends)[None, :], out, jnp.float64(0))

    finite = jnp.isfinite(vt)

    def clean():
        return span_sums(vt)

    def poisoned():
        # a NaN/Inf anywhere would contaminate the running block prefix
        # for EVERY later group (mid = bpref difference), so nonfinite
        # contributions are split out: the finite part rides the prefix
        # machinery, the nonfinite part is an exact per-group scatter over
        # reconstructed segment ids (rare branch; the searchsorted +
        # scatter cost only executes when nonfinite measures exist).
        # f32 `finite + nonfinite` then reproduces direct-summation
        # semantics: NaN poisons its own group, +/-inf propagates.
        # Per-channel 1-D scatters keep every temp layout-safe.
        base = span_sums(jnp.where(finite, vt, jnp.zeros((), vt.dtype)))
        seg = (jnp.searchsorted(
            starts, jnp.arange(n_pad, dtype=starts.dtype), side="right")
            .astype(jnp.int32) - 1)
        seg = jnp.clip(seg, 0, num - 1)
        extra = jnp.stack([
            jax.ops.segment_sum(
                jnp.where(finite[ci], jnp.zeros((), vt.dtype), vt[ci]),
                seg, num_segments=num)
            for ci in range(c)]).astype(jnp.float64)          # [c, num]
        return base + extra

    out = jax.lax.cond(jnp.all(finite), clean, poisoned)
    return out.T.astype(values.dtype)                         # [num, c]


RT_DENSE_CAP = 16384   # runtime-dense slot budget: the fused factored
                       # reduction beats the u64 packed sort below this
                       # (4.5ms vs 6.6ms at n=4M on one v5e); above it the
                       # factored kernel's VMEM accumulator costs more than
                       # the sort saves


def _dim_fields(dim_types: List[int]):
    """(offset, width) of each dim's value+valid field in the exact u64
    key pack (pack_dim_keys layout)."""
    fields = []
    shift = 0
    for t in dim_types:
        width = min(_dim_bits(t), 64) + 1   # value bits + valid bit
        fields.append((shift, width))
        shift += width
    return fields


def dim_pack_stride(d) -> int:
    """Static value stride of a dim's packed bits: regular time bucketizers
    emit FLOOR(ts, width) so every live value is a multiple of `width` —
    the runtime-dense range check divides by it (a day of hour buckets is
    24 values, not 86400). Verified on device (alignment check), so a wrong
    hint can only force the sort fallback, never corrupt the grouping."""
    e = getattr(d, "expr", None)
    if (isinstance(e, E.BinaryExpr) and e.op == "FLOOR"
            and isinstance(e.rhs, E.NumberLiteral) and e.rhs.int_val > 1):
        return int(e.rhs.int_val)
    return 1


def _runtime_dense_slots(keys, dim_types: List[int],
                         dim_strides: Optional[List[int]] = None):
    """Per-batch dense-domain detection: rebase every dim's value field to
    its live min (divided by its static stride) and multiply the ranges;
    each dim's valid bit is its own factor-2 field that collapses when all
    rows agree. Returns (slot[n] i32 with -1 = dropped, fits bool,
    slot_keys[RT_DENSE_CAP] u64, slots_total u64).

    Slot order equals key order (ascending offsets get ascending strides),
    so the compacted dense group table is identical in layout to the sort
    path's."""
    live = keys != _sentinel_of(keys)
    k64 = keys.astype(jnp.uint64)
    strides = dim_strides or [1] * len(dim_types)
    # (offset, width, value_stride): 1-bit valid field BELOW the value
    # field per dim (pack_dim_keys round-4 layout)
    fields = []
    for (off, width), vs in zip(_dim_fields(dim_types), strides):
        fields.append((off, 1, 1))
        fields.append((off + 1, width - 1, vs))
    slots_total = jnp.uint64(1)
    stride = jnp.uint64(1)
    slot = jnp.zeros_like(k64)
    iota = jnp.arange(RT_DENSE_CAP, dtype=jnp.uint64)
    slot_keys = jnp.zeros(RT_DENSE_CAP, jnp.uint64)
    aligned = jnp.bool_(True)
    for off, width, vs in fields:
        mask = jnp.uint64((1 << width) - 1)
        f = (k64 >> jnp.uint64(off)) & mask
        if vs > 1:
            aligned = aligned & jnp.all(
                jnp.where(live, f % jnp.uint64(vs), jnp.uint64(0))
                == jnp.uint64(0))
            f = f // jnp.uint64(vs)
        fmin = jnp.min(jnp.where(live, f, mask))
        fmax = jnp.max(jnp.where(live, f, jnp.uint64(0)))
        fmin = jnp.minimum(fmin, fmax)  # no live rows -> range 1
        r = fmax - fmin + jnp.uint64(1)
        slot = slot + (f - fmin) * stride
        slot_keys = slot_keys | ((((iota // stride) % r + fmin)
                                  * jnp.uint64(vs)) << jnp.uint64(off))
        stride = stride * r
        # cap the running product so it cannot wrap u64 (62-bit fields ×
        # ranges; clamp keeps `fits` meaningful)
        slots_total = jnp.minimum(slots_total * r,
                                  jnp.uint64(1) << jnp.uint64(62))
    fits = (slots_total <= jnp.uint64(RT_DENSE_CAP)) & aligned
    slot_i32 = jnp.where(
        live, jnp.minimum(slot, jnp.uint64(RT_DENSE_CAP - 1)),
        jnp.uint64(0)).astype(jnp.int32)
    slot_i32 = jnp.where(live, slot_i32, jnp.int32(-1))
    return slot_i32, fits, slot_keys, slots_total


def _runtime_dense_reduce(slot, slot_keys, slots_total, mval, mvalid,
                          k_groups: int, stacked=None, ones_ch=(2,)):
    """Dense branch of the adaptive group-by: fused factored MXU reduction
    over the rebased slots, then compact the (tiny) slot table to the
    sort path's first-K-groups-in-key-order layout.

    stacked: optional pre-built [n, 3] channel matrix (agg, cnt, presence)
    — the weighted run-length path passes per-run weighted lanes here.
    Weighted count/presence channels are NOT 0/1 (they hold run row
    counts), so that path must use the f32-exact factored reduction
    (pallas indicator channels are single-pass bf16, exact only for
    0/1)."""
    from aresdb_tpu.query import pallas_ops as P

    weighted = stacked is not None
    if stacked is None:
        contrib = jnp.where(mvalid, mval, jnp.float32(0))
        ones_v = jnp.where(mvalid, jnp.float32(1), jnp.float32(0))
        present = jnp.ones_like(contrib)
        stacked = jnp.stack([contrib, ones_v, present], axis=1)
    if weighted:
        table = P.factored_segment_sum(slot, stacked, RT_DENSE_CAP)
    else:
        table = P.factored_segment_sum_indicator(slot, stacked,
                                                 RT_DENSE_CAP,
                                                 ones_channels=ones_ch)
    sidx = jnp.arange(RT_DENSE_CAP, dtype=jnp.int32)
    live_slot = (table[:, 2] > 0) & (sidx.astype(jnp.uint64) < slots_total)
    n_groups = jnp.sum(live_slot).astype(jnp.int32)
    # first-K live slots in slot (== key) order
    _, sel = jax.lax.sort(((~live_slot).astype(jnp.int8), sidx),
                          num_keys=1, is_stable=True)
    m = min(k_groups, RT_DENSE_CAP)   # n_groups <= slots_total <= CAP
    sel = sel[:m]
    slot_used = (jnp.arange(k_groups, dtype=jnp.int32) < n_groups)
    pad = k_groups - m
    gkeys = jnp.concatenate([slot_keys[sel], jnp.full(pad, SENTINEL64)]) \
        if pad else slot_keys[sel]
    agg_m = table[sel, 0]
    cnt_m = table[sel, 1]
    if pad:
        agg_m = jnp.concatenate([agg_m, jnp.zeros(pad, jnp.float32)])
        cnt_m = jnp.concatenate([cnt_m, jnp.zeros(pad, jnp.float32)])
    gkeys = jnp.where(slot_used, gkeys, SENTINEL64)
    aggv = jnp.where(slot_used, agg_m, jnp.float32(0))
    cnt = jnp.where(slot_used, cnt_m, jnp.float32(0))
    return gkeys, slot_used, aggv, cnt, n_groups


def reduce_by_key(keys, mval, mvalid, agg: str, out_float: bool,
                  k_groups: int, dim_vals: Optional[List[_Val]] = None,
                  dim_types: Optional[List[int]] = None,
                  sortpack: bool = False,
                  dim_strides: Optional[List[int]] = None):
    """Adaptive group-by: a runtime dense-domain check (lax.cond) routes
    each batch to the fused factored MXU reduction when the live keys' dim
    ranges multiply to <= RT_DENSE_CAP slots, and to the packed sort
    pipeline (_reduce_by_key_sorted) otherwise. Group tables are identical
    either way: first k_groups distinct keys in ascending key order, dims
    unpacked from the keys. Applies to f32 sum/count/avg with an exact key
    pack; everything else goes straight to the sort pipeline."""
    rt_ok = (dim_types is not None and bool(dim_vals)
             and agg in ("sum", "count", "avg")
             and mval.dtype == jnp.float32
             and _rt_dense_enabled())
    if not rt_ok:
        return _reduce_by_key_sorted(keys, mval, mvalid, agg, out_float,
                                     k_groups, dim_vals, dim_types,
                                     sortpack)
    slot, fits, slot_keys, slots_total = _runtime_dense_slots(
        keys, dim_types, dim_strides)

    def dense_b():
        return _runtime_dense_reduce(slot, slot_keys, slots_total, mval,
                                     mvalid, k_groups)

    def sort_b():
        out = _reduce_by_key_sorted(keys, mval, mvalid, agg, out_float,
                                    k_groups, None, None, sortpack)
        return out[:5]

    gkeys, slot_used, aggv, cnt, n_groups = jax.lax.cond(
        fits, dense_b, sort_b)
    dim_values, dim_valids = unpack_dim_keys(gkeys, dim_vals, dim_types,
                                             slot_used)
    return (gkeys, slot_used, aggv, cnt, n_groups,
            tuple(dim_values), tuple(dim_valids))


def _rt_dense_enabled() -> bool:
    import os

    return os.environ.get("ARES_RTDENSE", "") != "0"


def _reduce_by_key_sorted(keys, mval, mvalid, agg: str, out_float: bool,
                          k_groups: int,
                          dim_vals: Optional[List[_Val]] = None,
                          dim_types: Optional[List[int]] = None,
                          sortpack: bool = False):
    """Sort + segment-reduce rows (or partial tables) by 64-bit group key.

    The shared primitive behind per-batch aggregation AND cross-device /
    cross-batch merges — fixed output capacity `k_groups` plus one overflow
    slot; rows with the sentinel key are dropped.

    TPU cost shape (measured at n=4M on one v5e chip, chained dispatch):
    every operand carried through `lax.sort` costs real bandwidth — and
    the i8 validity lane is the expensive one: (u32,f32,i8,i32) 8.7ms,
    (u32,f32,i8) 8.7ms, (u32,f32) 5.7ms, one packed u64 6.7ms — while
    post-hoc gathers by the argsort permutation cost ~30ms EACH and
    scatter-based segment ops 65-96ms. So (round 3):
    (a) runtime key REBASE: group keys usually have tiny dynamic range
        (a day of hour buckets × a few thousand cities spans ~2^21 even
        when the static pack needs 50 bits). When max−min of the live
        keys fits 30 bits, (key−kmin) << 33 | mvalid << 32 | f32-measure
        bits pack into ONE u64 sort operand (lax.cond picks per batch);
    (b) otherwise the mvalid bit folds into the key's low bit when the
        pack fits 62 bits (key62) — a 2-operand sort, no i8 lane;
    (c) when the key pack is exact (dim_types given), group dim values
        UNPACK from the group keys and the iota/argsort lane is dropped;
    (d) everything downstream of the sort uses sorted-contiguity instead
        of scatters: slot boundaries come from `sorted_starts` over the
        monotone clipped segment ids, sums from the block-decomposed
        boundary reduction, and min/max fall out of boundary gathers by
        making the measure a secondary sort key.
    Radix partitioning (split on key high bits, B small sorts) was priced
    and rejected: the partition pass alone is an i8+payload stable sort
    (~12ms) — more than the whole packed sort.

    Returns (group_keys[K], slot_used[K], agg[K], cnt[K], n_groups,
             dim_values, dim_valids).
    """
    from aresdb_tpu.query import pallas_ops as P

    n = keys.shape[0]
    num = k_groups + 1
    sent = _sentinel_of(keys)
    minmax = agg in ("min", "max")
    unpackable = dim_types is not None and dim_vals
    need_order = bool(dim_vals) and not unpackable
    order = None
    if minmax:
        # measure as secondary sort key: per-group min/max become boundary
        # gathers (invalids sort to the min-end/max-end identity)
        if agg == "min":
            ident = _F32_MAX if out_float else jnp.array(
                np.iinfo(np.int32).max, mval.dtype)
        else:
            ident = -_F32_MAX if out_float else jnp.array(
                np.iinfo(np.int32).min, mval.dtype)
        contrib0 = jnp.where(mvalid, mval, ident)
        ops = (keys, contrib0, mvalid.astype(jnp.int8))
        if need_order:
            ops = ops + (jnp.arange(n, dtype=jnp.int32),)
        sorted_ = jax.lax.sort(ops, num_keys=2, is_stable=False)
        skeys, contrib, mvalid_i8 = sorted_[:3]
        if need_order:
            order = sorted_[3]
        mvalid = mvalid_i8.astype(jnp.bool_)
    elif sortpack and mval.dtype == jnp.float32 and not need_order:
        # keys widen to the canonical u64 space up front; the sentinel is
        # all-ones in either width, and real key62 keys stay < 2^62
        k64 = keys.astype(jnp.uint64)
        if keys.dtype == jnp.uint32:
            k64 = jnp.where(keys == SENTINEL32, SENTINEL64, k64)
        live = k64 != SENTINEL64
        any_live = jnp.any(live)
        # the ALL-NULL-dims key is 0 while valid value keys can sit near
        # 2^32 (f32's monotone bit transform sets the sign bit), which
        # would blow the rebase range whenever null rows exist. Remap it
        # to (smallest nonzero live key - 1): still strictly below every
        # valid key (null-first order preserved, no collisions — no live
        # key exists in (0, klo)), and trivially inverted after the sort.
        knz = jnp.where(live & (k64 != jnp.uint64(0)), k64, SENTINEL64)
        klo = jnp.min(knz)
        klo = jnp.where(klo == SENTINEL64, jnp.uint64(1), klo)
        k64r = jnp.where(live & (k64 == jnp.uint64(0)),
                         klo - jnp.uint64(1), k64)
        kmin = jnp.min(jnp.where(live, k64r, SENTINEL64))
        kmax = jnp.max(jnp.where(live, k64r, jnp.uint64(0)))
        krange = jnp.where(any_live, kmax - kmin, jnp.uint64(0))
        bits = jax.lax.bitcast_convert_type(
            mval, jnp.uint32).astype(jnp.uint64)

        def packed_sort():
            # (a) rebased single-operand pack: 32 bits of rebased key above
            # 32 bits of measure. Measure VALIDITY rides in the measure
            # lane itself: invalid rows canonicalize to the reserved quiet
            # -NaN 0xFFFFFFFF, and a valid measure carrying exactly those
            # bits remaps to another quiet -NaN (0xFFBFFFFF) — IEEE NaN
            # payloads are not preserved by f32 aggregation anyway, so
            # group results are bit-identical (NaN poisoning included).
            # This widened the eligible key range from 2^30 to 2^32-2
            # (round 4): with the valid-below-value key layout, a whole
            # f32/u32-wide dim rebases into range, so the true-hicard path
            # rides the 8-byte one-operand sort (5.2ms at n=4M on one v5e)
            # instead of the 12-byte folded sort (6.9ms).
            mb = jnp.where(bits == jnp.uint64(0xFFFFFFFF),
                           jnp.uint64(0xFFBFFFFF), bits)
            mb = jnp.where(mvalid, mb, jnp.uint64(0xFFFFFFFF))
            packed = ((k64r - kmin) << jnp.uint64(32)) | mb
            packed = jnp.where(live, packed, SENTINEL64)
            (sp,) = jax.lax.sort((packed,), num_keys=1, is_stable=False)
            live_s = sp != SENTINEL64
            sk = jnp.where(live_s, (sp >> jnp.uint64(32)) + kmin,
                           SENTINEL64)
            # invert the all-null-key remap (klo-1 never collides with a
            # real live key)
            sk = jnp.where(live_s & (sk == klo - jnp.uint64(1)),
                           jnp.uint64(0), sk)
            low = (sp & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
            mv = (low != jnp.uint32(0xFFFFFFFF)) & live_s
            vals = jax.lax.bitcast_convert_type(low, jnp.float32)
            return sk, vals, mv

        def folded_sort():
            # (b) mvalid folded into the key's low bit (no i8 lane)
            k2 = (k64 << jnp.uint64(1)) | mvalid.astype(jnp.uint64)
            k2 = jnp.where(live, k2, SENTINEL64)
            sk2, vals = jax.lax.sort((k2, mval), num_keys=1,
                                     is_stable=False)
            live_s = sk2 != SENTINEL64
            sk = jnp.where(live_s, sk2 >> jnp.uint64(1), SENTINEL64)
            mv = ((sk2 & jnp.uint64(1)) != 0) & live_s
            return sk, vals, mv

        skeys, mval, mvalid = jax.lax.cond(
            krange <= jnp.uint64((1 << 32) - 2), packed_sort, folded_sort)
        sent = SENTINEL64
    else:
        ops = (keys, mval, mvalid.astype(jnp.int8))
        if need_order:
            ops = ops + (jnp.arange(n, dtype=jnp.int32),)
        sorted_ = jax.lax.sort(ops, num_keys=1, is_stable=False)
        skeys, mval, mvalid_i8 = sorted_[:3]
        if need_order:
            order = sorted_[3]
        mvalid = mvalid_i8.astype(jnp.bool_)
    # fusion barrier between the sort and the boundary/reduction stages:
    # XLA fusing the whole pipeline (especially under a chained lax.scan)
    # can blow the 16MB scoped-vmem stack lowering the [num, L] cumsums
    # ("Ran out of memory in memory space vmem ... reduce-window");
    # identity-semantics, sort outputs are materialized anyway
    skeys, mval, mvalid = jax.lax.optimization_barrier(
        (skeys, mval, mvalid))
    first = jnp.concatenate([jnp.ones(1, jnp.bool_), skeys[1:] != skeys[:-1]])
    live = skeys != sent
    prefix = _prefix_enabled()

    def _seg_ids():
        # sentinel rows sort last and seg ascends, so the clipped ids stay
        # monotone — each slot owns one contiguous sorted span
        seg = jnp.cumsum(first.astype(jnp.int32)) - 1
        return jnp.where(live & (seg < k_groups), seg, k_groups)

    if prefix:
        # marks ARE the slot boundaries; no per-row segment ids needed on
        # the f32 path (integer sums below still build them for scatter)
        sent_start = jnp.sum(live.astype(jnp.int32))  # sentinels sort last
        starts = sorted_starts_marks(first, num, n, sent_start)
    else:
        seg_c = _seg_ids()
        starts = jnp.searchsorted(
            seg_c, jnp.arange(num, dtype=jnp.int32)).astype(jnp.int32)
    ends = jnp.concatenate([starts[1:], jnp.array([n], jnp.int32)])

    ones = jnp.where(mvalid, jnp.float32(1), jnp.float32(0))
    if agg in ("sum", "count", "avg"):
        contrib = jnp.where(mvalid, mval, jnp.zeros((), mval.dtype))
        if contrib.dtype == jnp.float32:
            stacked = jnp.stack([contrib, ones], axis=1)
            if prefix:
                both = sorted_segment_sum(stacked, num, starts, ends)
            elif P.use_factored(num):
                both = P.factored_segment_sum_indicator(seg_c, stacked, num)
            else:
                both = jax.ops.segment_sum(stacked, seg_c, num_segments=num)
            aggv = both[:k_groups, 0]
            cnt = both[:k_groups, 1]
        else:
            # integer sums keep their wide accumulator (scatter path)
            aggv = jax.ops.segment_sum(contrib, _seg_ids(),
                                       num_segments=num)[:k_groups]
            if prefix:
                cnt = sorted_segment_sum(ones[:, None], num, starts,
                                         ends)[:k_groups, 0]
            else:
                cnt = jax.ops.segment_sum(ones, seg_c,
                                          num_segments=num)[:k_groups]
    elif minmax:
        at = starts if agg == "min" else jnp.maximum(ends - 1, 0)
        aggv = contrib[jnp.clip(at[:k_groups], 0, n - 1)]
        empty = starts[:k_groups] >= ends[:k_groups]
        aggv = jnp.where(empty, ident, aggv)
        if prefix:
            cnt = sorted_segment_sum(ones[:, None], num, starts,
                                     ends)[:k_groups, 0]
        elif P.use_factored(num):
            cnt = P.factored_segment_sum_indicator(seg_c, ones[:, None], num)[:k_groups, 0]
        else:
            cnt = jax.ops.segment_sum(ones, seg_c, num_segments=num)[:k_groups]
    else:
        raise QueryError(f"agg {agg} has no device kernel yet")

    # representative row per slot = any member row (same key → same dims):
    # the first sorted position of the span, mapped back to row space
    start_pos = jnp.clip(starts[:k_groups], 0, n - 1)
    rep_safe = order[start_pos] if order is not None else None
    gkeys = skeys[start_pos]
    n_live_groups = jnp.sum(first & live).astype(jnp.int32)
    slot_used = (jnp.arange(k_groups, dtype=jnp.int32) < n_live_groups) & \
        (gkeys != sent)
    # unused slots would otherwise repeat a REAL key (the clipped boundary
    # gather lands on the last row): when partial tables are merged again
    # (mesh all_gather, cross-batch reduce), such ghosts can be picked as
    # group representatives and corrupt dim validity — sentinel them out.
    # u32-packed keys widen back to the canonical u64 key space here so
    # cross-batch/mesh merges see one key type regardless of packing.
    gkeys = jnp.where(slot_used, gkeys.astype(jnp.uint64), SENTINEL64)
    n_groups = n_live_groups

    if unpackable:
        # exact key pack: dim values come straight from the group keys
        # (no [n]-sized representative-row gathers, no argsort lane)
        dim_values, dim_valids = unpack_dim_keys(
            gkeys, dim_vals, dim_types, slot_used)
    else:
        dim_values = []
        dim_valids = []
        for dv in dim_vals or []:
            dim_values.append(dv.value[rep_safe])
            dim_valids.append(dv.valid[rep_safe] & slot_used)
    return (gkeys, slot_used, aggv, cnt, n_groups,
            tuple(dim_values), tuple(dim_valids))


def agg_batch_body(plan: CompiledQuery, n_rows: int, k_groups: int,
                   columns, foreign, n_valid, live_cutoff=None):
    """Un-jitted per-batch aggregation body (reused by the sharded path)."""
    ctx = _EvalCtx(columns, foreign, n_rows)
    mask, dim_vals = _eval_common(plan, ctx, n_valid, live_cutoff)
    mlane = _measure_lane(plan, ctx)
    ptypes = [_packing_type(d) for d in plan.dimensions]
    keys = pack_dim_keys(dim_vals, ptypes, mask)
    exact, key62 = pack_modes(ptypes)
    gkeys, slot_used, aggv, cnt, n_groups, dim_values, dim_valids = \
        reduce_by_key(keys, mlane.value, mlane.valid, plan.measure.agg,
                      plan.measure.out_float, k_groups, dim_vals,
                      dim_types=ptypes if (exact and dim_vals) else None,
                      sortpack=key62,
                      dim_strides=[dim_pack_stride(d)
                                   for d in plan.dimensions])
    rep_safe = jnp.zeros_like(gkeys, jnp.int32)  # retained for ABI stability
    return (gkeys, rep_safe, slot_used, aggv, cnt, n_groups,
            dim_values, dim_valids)


def make_agg_kernel(plan: CompiledQuery, n_rows: int, k_groups: int):
    """Build the jitted per-batch aggregation function.

    Signature: fn(columns, foreign, n_valid) ->
        (group_keys[K] u64, rep_idx[K] i32, slot_used[K] bool,
         agg[K], cnt[K] i64, n_groups i32,
         dim_values (tuple per dim), dim_valids (tuple per dim))
    """

    def fn(columns, foreign, n_valid, live_cutoff):
        return agg_batch_body(plan, n_rows, k_groups, columns, foreign,
                              n_valid, live_cutoff)

    return jax.jit(fn)


def _reduce_by_key_sorted_weighted(keys, wsum, wcnt, k_groups: int,
                                   dim_vals, dim_types):
    """Weighted sort+segment-reduce: each input row carries a pre-weighted
    measure (wsum) and count (wcnt) — the run-length path's per-run lanes
    (kernels for per-row data use _reduce_by_key_sorted). Same output ABI.
    """
    n = keys.shape[0]
    num = k_groups + 1
    sent = _sentinel_of(keys)
    unpackable = dim_types is not None and dim_vals
    need_order = bool(dim_vals) and not unpackable
    order = None
    ops = (keys, wsum, wcnt)
    if need_order:
        ops = ops + (jnp.arange(n, dtype=jnp.int32),)
    sorted_ = jax.lax.sort(ops, num_keys=1, is_stable=False)
    skeys, swsum, swcnt = sorted_[:3]
    if need_order:
        order = sorted_[3]
    skeys, swsum, swcnt = jax.lax.optimization_barrier(
        (skeys, swsum, swcnt))
    first = jnp.concatenate([jnp.ones(1, jnp.bool_),
                             skeys[1:] != skeys[:-1]])
    live = skeys != sent
    prefix = _prefix_enabled()
    if prefix:
        sent_start = jnp.sum(live.astype(jnp.int32))
        starts = sorted_starts_marks(first, num, n, sent_start)
    else:
        seg = jnp.cumsum(first.astype(jnp.int32)) - 1
        seg_c = jnp.where(live & (seg < k_groups), seg, k_groups)
        starts = jnp.searchsorted(
            seg_c, jnp.arange(num, dtype=jnp.int32)).astype(jnp.int32)
    ends = jnp.concatenate([starts[1:], jnp.array([n], jnp.int32)])
    # dropped (sentinel) rows carry wsum=0/wcnt=0 by construction upstream
    if swsum.dtype.kind == "f" and swsum.dtype == swcnt.dtype:
        both = sorted_segment_sum(jnp.stack([swsum, swcnt], axis=1),
                                  num, starts, ends)
        aggv = both[:k_groups, 0]
        cnt = both[:k_groups, 1]
    else:
        # integer sums keep their wide accumulator (scatter path)
        seg = jnp.cumsum(first.astype(jnp.int32)) - 1
        seg_c = jnp.where(live & (seg < k_groups), seg, k_groups)
        aggv = jax.ops.segment_sum(swsum, seg_c,
                                   num_segments=num)[:k_groups]
        cnt = sorted_segment_sum(swcnt[:, None], num, starts,
                                 ends)[:k_groups, 0]
    start_pos = jnp.clip(starts[:k_groups], 0, n - 1)
    rep_safe = order[start_pos] if order is not None else None
    gkeys = skeys[start_pos]
    n_live_groups = jnp.sum(first & live).astype(jnp.int32)
    slot_used = (jnp.arange(k_groups, dtype=jnp.int32) < n_live_groups) & \
        (gkeys != sent)
    gkeys = jnp.where(slot_used, gkeys.astype(jnp.uint64), SENTINEL64)
    if unpackable:
        dim_values, dim_valids = unpack_dim_keys(
            gkeys, dim_vals, dim_types, slot_used)
    else:
        dim_values = []
        dim_valids = []
        for dv in dim_vals or []:
            dim_values.append(dv.value[rep_safe])
            dim_valids.append(dv.valid[rep_safe] & slot_used)
    return (gkeys, slot_used, aggv, cnt, n_live_groups,
            tuple(dim_values), tuple(dim_valids))


def reduce_by_key_weighted(keys, wsum, wcnt, wrows, k_groups: int,
                           dim_vals, dim_types, dim_strides=None):
    """Adaptive WEIGHTED group-by for per-run lanes (run-length archive
    batches): wsum/wcnt/wrows are this run's pre-aggregated measure sum,
    valid-measure row count, and filter-passing row count. Routing mirrors
    reduce_by_key: a runtime dense-domain check sends bounded dims to the
    f32-exact factored MXU reduction (weighted channels are not 0/1, so
    the bf16 indicator kernel is ineligible), everything else to the
    weighted packed sort."""
    rt_ok = (dim_types is not None and bool(dim_vals)
             and wsum.dtype == jnp.float32 and _rt_dense_enabled())
    if not rt_ok:
        return _reduce_by_key_sorted_weighted(keys, wsum, wcnt, k_groups,
                                              dim_vals, dim_types)
    slot, fits, slot_keys, slots_total = _runtime_dense_slots(
        keys, dim_types, dim_strides)
    stacked = jnp.stack([wsum, wcnt, wrows], axis=1)

    def dense_b():
        return _runtime_dense_reduce(slot, slot_keys, slots_total, None,
                                     None, k_groups, stacked=stacked)

    def sort_b():
        out = _reduce_by_key_sorted_weighted(keys, wsum, wcnt, k_groups,
                                             None, None)
        return out[:5]

    gkeys, slot_used, aggv, cnt, n_groups = jax.lax.cond(
        fits, dense_b, sort_b)
    dim_values, dim_valids = unpack_dim_keys(gkeys, dim_vals, dim_types,
                                             slot_used)
    return (gkeys, slot_used, aggv, cnt, n_groups,
            tuple(dim_values), tuple(dim_valids))


def make_runlen_agg_kernel(plan: CompiledQuery, n_rows: int, n_runs: int,
                           k_groups: int, spec):
    """Jitted run-length archive aggregation (see runlen.py block comment).

    Signature: fn(columns, foreign, n_valid_rows, n_valid_runs) -> the
    agg-kernel 8-tuple ABI. columns holds run-granularity arrays for
    spec.run_cols, row-granularity arrays for spec.row_cols, plus
    (-2, 0) = (run_starts[n_runs] i32, run_lens[n_runs] i32) and, for
    integer row-level measures, (-2, 1) = (run_id[n_rows] i32, _).

    Reference role: compressed iteration of query/iterator.hpp:214-240 —
    here the composite runs are materialized by the host (cached) and the
    device consumes n_runs-sized lanes.
    """
    filters = list(plan.filters) + list(plan.time_filter_expr)
    agg = plan.measure.agg

    def fn(columns, foreign, n_valid_rows, n_valid_runs):
        row_ctx = _EvalCtx(columns, foreign, n_rows)
        run_ctx = _EvalCtx(columns, foreign, n_runs)
        starts, lens = columns[(-2, 0)]
        ends = starts + lens

        rmask = None
        if spec.row_filters or spec.measure_level == "row":
            rmask = jnp.arange(n_rows, dtype=jnp.int32) < n_valid_rows
            for i in spec.row_filters:
                v = _truthy(_emit(filters[i], row_ctx, plan))
                rmask = rmask & v.value & v.valid

        if spec.measure_level == "row":
            mlane = _measure_lane(plan, row_ctx)
            mvalid = mlane.valid & rmask
            ones = mvalid.astype(jnp.float32)
            rpass = rmask.astype(jnp.float32)
            if mlane.value.dtype == jnp.float32:
                contrib = jnp.where(mvalid, mlane.value, jnp.float32(0))
                per = sorted_segment_sum(
                    jnp.stack([contrib, ones, rpass], axis=1),
                    n_runs, starts, ends)
                wsum, wcnt, wrows = per[:, 0], per[:, 1], per[:, 2]
            else:
                rid, _ = columns[(-2, 1)]
                contrib = jnp.where(mvalid, mlane.value,
                                    jnp.zeros((), mlane.value.dtype))
                wsum = jax.ops.segment_sum(contrib, rid,
                                           num_segments=n_runs)
                per = sorted_segment_sum(
                    jnp.stack([ones, rpass], axis=1), n_runs, starts, ends)
                wcnt, wrows = per[:, 0], per[:, 1]
        else:
            mlane = _measure_lane(plan, run_ctx)
            if spec.row_filters:
                rpass = rmask.astype(jnp.float32)
                wrows = sorted_segment_sum(rpass[:, None], n_runs, starts,
                                           ends)[:, 0]
            else:
                wrows = lens.astype(jnp.float32)
            mv = mlane.valid
            wcnt = jnp.where(mv, wrows, jnp.float32(0))
            if mlane.value.dtype == jnp.float32:
                wsum = jnp.where(mv, mlane.value, jnp.float32(0)) * wrows
            else:
                wsum = (jnp.where(mv, mlane.value,
                                  jnp.zeros((), mlane.value.dtype))
                        * wrows.astype(mlane.value.dtype))

        run_live = jnp.arange(n_runs, dtype=jnp.int32) < n_valid_runs
        runmask = run_live
        for i in spec.run_filters:
            v = _truthy(_emit(filters[i], run_ctx, plan))
            runmask = runmask & v.value & v.valid
        dim_vals = [_emit(d.expr, run_ctx, plan) for d in plan.dimensions]
        ptypes = [_packing_type(d) for d in plan.dimensions]
        # a run only forms a group if >=1 of its rows passes all filters
        mask = runmask & (wrows > 0)
        # dropped runs must contribute exact zeros even in the dense branch
        zf = mask.astype(jnp.float32)
        wsum = wsum * zf.astype(wsum.dtype)
        wcnt = wcnt * zf
        wrows = wrows * zf
        keys = pack_dim_keys(dim_vals, ptypes, mask)
        exact, _ = pack_modes(ptypes)
        gkeys, slot_used, aggv, cnt, n_groups, dim_values, dim_valids = \
            reduce_by_key_weighted(
                keys, wsum, wcnt, wrows, k_groups, dim_vals,
                dim_types=ptypes if (exact and dim_vals) else None,
                dim_strides=[dim_pack_stride(d) for d in plan.dimensions])
        rep_safe = jnp.zeros_like(gkeys, jnp.int32)
        return (gkeys, rep_safe, slot_used, aggv, cnt, n_groups,
                dim_values, dim_valids)

    return jax.jit(fn)


def _hll_lane(plan: CompiledQuery, ctx: _EvalCtx) -> Tuple[_Val, object, object]:
    """Per-row HLL value lane → (value u32, reg_id i32, rho i32).

    Reference: GetHLLValueFunctor (query/functor.hpp:446) + the client-side
    precomputed path for hllConfig.isHLLColumn columns
    (client/connector.go:522).
    """
    from aresdb_tpu.query import hll as H

    expr_ast = plan.measure.expr
    is_hll_col = (isinstance(expr_ast, E.VarRef)
                  and expr_ast.column_id >= 0
                  and plan.main_schema.table.columns[expr_ast.column_id]
                  .hll_config.is_hll_column
                  and expr_ast.table_id == 0)
    v = _emit(expr_ast, ctx, plan)
    if is_hll_col:
        hv = v.value.astype(jnp.uint32)
    else:
        if isinstance(expr_ast, E.VarRef) and expr_ast.data_type == mdt.UUID:
            hashed = (v.value[:, 0].astype(jnp.uint64)
                      ^ v.value[:, 1].astype(jnp.uint64))
        else:
            width = 4
            if isinstance(expr_ast, E.VarRef):
                width = mdt.data_type_bytes(expr_ast.data_type)
            hashed = H.murmur3_64(v.value, width, xp=jnp)
        hv = H.hll_value_from_hash(hashed, xp=jnp)
    reg = (hv & jnp.uint32(H.HLL_M - 1)).astype(jnp.int32)
    # rho <= 51 for any real hash (64-bit hash, 14 register bits); the
    # clamp at 254 only guards adversarial client-precomputed wire values
    # (which previously wrapped mod 256 through the u8 store) and keeps
    # the packed-sort payload at 8 bits
    rho = jnp.minimum((hv >> jnp.uint32(16)).astype(jnp.int32),
                      jnp.int32(254))
    return _Val(hv, v.valid), reg, rho


def hll_batch_body(plan: CompiledQuery, n_rows: int, k_groups: int,
                   columns, foreign, n_valid, live_cutoff):
    """Un-jitted per-batch HLL aggregation body (reused by the sharded
    multi-chip path — parallel/sharded.make_sharded_hll_kernel)."""
    from aresdb_tpu.query import hll as H

    m = H.HLL_M
    return _hll_body_impl(plan, n_rows, k_groups, m, columns, foreign,
                          n_valid, live_cutoff)


def make_hll_kernel(plan: CompiledQuery, n_rows: int, k_groups: int):
    """HLL group-by: per-(group, register) max(rho) in one segment-max.

    Reference: query/hll.cu HyperLogLog. Output registers[K, 16384] uint8
    (0 = empty), plus the usual group table metadata.
    """

    def fn(columns, foreign, n_valid, live_cutoff):
        return hll_batch_body(plan, n_rows, k_groups, columns, foreign,
                              n_valid, live_cutoff)

    return jax.jit(fn)


def _hll_body_impl(plan: CompiledQuery, n_rows: int, k_groups: int, m: int,
                   columns, foreign, n_valid, live_cutoff):
    if True:
        from aresdb_tpu.query import pallas_ops as P

        ctx = _EvalCtx(columns, foreign, n_rows)
        mask, dim_vals = _eval_common(plan, ctx, n_valid, live_cutoff)
        hv, reg, rho = _hll_lane(plan, ctx)

        dim_types = [_packing_type(d) for d in plan.dimensions]
        exact, _ = pack_modes(dim_types)
        keys = pack_dim_keys(dim_vals, dim_types, mask)
        order = None
        hll_sort = os.environ.get("ARES_HLL_SORT", "ops")
        if (exact or not dim_vals) and hll_sort == "packed":
            # env-gated alternative (ARES_HLL_SORT=packed, measured 22%
            # SLOWER on-chip — the HLL batch is hash-bound, not
            # sort-bound; docs/PERFORMANCE.md round 4): the whole per-row
            # HLL state — valid(1) rho(8) reg(14) — packs UNDER a rebased
            # group key into ONE u64 sort operand (the same rebase tricks
            # as reduce_by_key's packed path). Runtime fallback: 4-operand
            # sort when the live key range overflows the 41 bits above
            # the payload.
            k64 = keys.astype(jnp.uint64)
            if keys.dtype == jnp.uint32:
                k64 = jnp.where(keys == SENTINEL32, SENTINEL64, k64)
            live = k64 != SENTINEL64
            knz = jnp.where(live & (k64 != jnp.uint64(0)), k64, SENTINEL64)
            klo = jnp.min(knz)
            klo = jnp.where(klo == SENTINEL64, jnp.uint64(1), klo)
            k64r = jnp.where(live & (k64 == jnp.uint64(0)),
                             klo - jnp.uint64(1), k64)
            kmin = jnp.min(jnp.where(live, k64r, SENTINEL64))
            kmax = jnp.max(jnp.where(live, k64r, jnp.uint64(0)))
            any_live = jnp.any(live)
            krange = jnp.where(any_live, kmax - kmin, jnp.uint64(0))
            PAY = jnp.uint64(23)
            pay = ((hv.valid.astype(jnp.uint64) << jnp.uint64(22))
                   | (rho.astype(jnp.uint64) << jnp.uint64(14))
                   | reg.astype(jnp.uint64))

            def hll_packed_sort():
                packed = ((k64r - kmin) << PAY) | pay
                packed = jnp.where(live, packed, SENTINEL64)
                (sp,) = jax.lax.sort((packed,), num_keys=1,
                                     is_stable=False)
                live_s = sp != SENTINEL64
                sk = jnp.where(live_s, (sp >> PAY) + kmin, SENTINEL64)
                sk = jnp.where(live_s & (sk == klo - jnp.uint64(1)),
                               jnp.uint64(0), sk)
                sv = (((sp >> jnp.uint64(22)) & jnp.uint64(1)) != 0) \
                    & live_s
                sr = ((sp >> jnp.uint64(14))
                      & jnp.uint64(0xFF)).astype(jnp.int32)
                sg = (sp & jnp.uint64(0x3FFF)).astype(jnp.int32)
                return sk, sg, sr, sv

            def hll_fallback_sort():
                sk, sg, sr, sv8 = jax.lax.sort(
                    (k64, reg, rho, hv.valid.astype(jnp.int8)),
                    num_keys=1, is_stable=False)
                return sk, sg, sr, sv8 != 0

            skeys, sreg, srho, svalid = jax.lax.cond(
                krange <= jnp.uint64((1 << 41) - 2),
                hll_packed_sort, hll_fallback_sort)
            sent = SENTINEL64
        elif exact or not dim_vals:
            # 4-operand co-sort, iota dropped: dims unpack from the keys
            sent = _sentinel_of(keys)
            skeys, sreg, srho, svalid_i8 = jax.lax.sort(
                (keys, reg, rho, hv.valid.astype(jnp.int8)),
                num_keys=1, is_stable=False)
            svalid = svalid_i8.astype(jnp.bool_)
        else:
            # inexact packs (UUID / >63-bit dims) need the iota lane for
            # representative-row dim gathers
            iota = jnp.arange(n_rows, dtype=jnp.int32)
            sent = _sentinel_of(keys)
            skeys, sreg, srho, svalid_i8, order = jax.lax.sort(
                (keys, reg, rho, hv.valid.astype(jnp.int8), iota),
                num_keys=1, is_stable=False)
            svalid = svalid_i8.astype(jnp.bool_)
        first = jnp.concatenate(
            [jnp.ones(1, jnp.bool_), skeys[1:] != skeys[:-1]])
        seg = jnp.cumsum(first.astype(jnp.int32)) - 1
        live = skeys != sent
        seg_c = jnp.where(live & (seg < k_groups), seg, k_groups)

        valid_m = svalid & (seg_c < k_groups)
        reg_key = jnp.where(valid_m, seg_c * m + sreg, k_groups * m)
        # stored register = raw trailing-zero count + 1 (the reference's
        # write functor: "rho must plus 1", query/functor.hpp:1364) — the
        # standard 1-based HLL rank, and 0 unambiguously means empty
        registers = jax.ops.segment_max(
            jnp.where(valid_m, srho + 1, 0), reg_key,
            num_segments=k_groups * m + 1,
            indices_are_sorted=False)[:k_groups * m]
        registers = jnp.maximum(registers, 0).astype(jnp.uint8).reshape(
            k_groups, m)

        # slot boundaries from sorted contiguity (no scatters)
        num = k_groups + 1
        prefix = _prefix_enabled()
        starts = sorted_starts(seg_c, num) if prefix else jnp.searchsorted(
            seg_c, jnp.arange(num, dtype=jnp.int32)).astype(jnp.int32)
        ones = jnp.where(svalid, jnp.float32(1), jnp.float32(0))
        if prefix:
            ends = jnp.concatenate([starts[1:],
                                    jnp.array([n_rows], jnp.int32)])
            cnt = sorted_segment_sum(ones[:, None], num, starts,
                                     ends)[:k_groups, 0]
        elif P.use_factored(num):
            cnt = P.factored_segment_sum_indicator(seg_c, ones[:, None],
                                         num)[:k_groups, 0]
        else:
            cnt = jax.ops.segment_sum(ones, seg_c,
                                      num_segments=num)[:k_groups]
        start_pos = jnp.clip(starts[:k_groups], 0, n_rows - 1)
        gkeys = skeys[start_pos]
        n_live_groups = jnp.sum(first & live).astype(jnp.int32)
        slot_used = (jnp.arange(k_groups, dtype=jnp.int32) < n_live_groups)
        gkeys = jnp.where(slot_used & (gkeys != sent),
                          gkeys.astype(jnp.uint64), SENTINEL64)

        if order is None:
            # exact pack: per-slot dim values unpack from the group keys
            dim_values, dim_valids = unpack_dim_keys(
                gkeys, dim_vals, dim_types, slot_used)
        else:
            rep_safe = order[start_pos]
            dim_values = []
            dim_valids = []
            for dv in dim_vals:
                dim_values.append(dv.value[rep_safe])
                dim_valids.append(dv.valid[rep_safe] & slot_used)

        return (gkeys, slot_used, registers, cnt, n_live_groups,
                tuple(dim_values), tuple(dim_valids))


def dense_slot_lane(dim_vals: List[_Val], dense_plan, n_rows: int = None):
    """Per-row dense slot index + out-of-domain flag (shared by the XLA
    dense kernel and the fused pallas kernel in fused_dense.py).

    slot = Σ (dim_idx+1) * stride with 0 = NULL per dim; `bad` marks rows
    whose VALID dim value falls outside the planned domain (dense overflow).
    """
    n = dim_vals[0].value.shape[0] if dim_vals else n_rows
    slot = jnp.zeros(n, jnp.int32)
    bad = jnp.zeros(n, jnp.bool_)
    for dv, dom, stride in zip(dim_vals, dense_plan.domains,
                               dense_plan.strides):
        v = dv.value
        if v.dtype == jnp.bool_:
            v = v.astype(jnp.int32)
        elif v.dtype == jnp.float32 and dom.post_div == 0.0:
            v = v.astype(jnp.int32)
        if dom.kind == "lookup":
            table = jnp.asarray(dom.values).astype(v.dtype)
            idx = jnp.clip(jnp.searchsorted(table, v), 0, dom.size - 1)
            in_range = table[idx] == v
            idx = idx.astype(jnp.int32)
        elif isinstance(dom.step, float) or isinstance(dom.base, float):
            # float affine (numeric width buckets): values are exact
            # f32 multiples of step, so rounding recovers the index
            vf = v.astype(jnp.float32)
            idxw = jnp.round((vf - jnp.float32(dom.base))
                             / jnp.float32(dom.step)).astype(jnp.int32)
            in_range = (idxw >= 0) & (idxw < dom.size)
            idx = jnp.clip(idxw, 0, dom.size - 1)
        else:
            if dom.post_div:
                # value was divided by post_div on the float path; recover
                # the integer index directly from the pre-division value
                v = jnp.round(v * jnp.float32(dom.post_div)).astype(jnp.int32)
            base = jnp.array(dom.base, v.dtype)
            step = jnp.array(max(dom.step, 1), v.dtype)
            idxw = (v - base) // step
            in_range = (idxw >= 0) & (idxw < dom.size)
            idx = jnp.clip(idxw, 0, dom.size - 1).astype(jnp.int32)
        idxp1 = jnp.where(dv.valid & in_range, idx + 1, 0)
        bad = bad | (dv.valid & ~in_range)
        slot = slot + idxp1 * jnp.int32(stride)
    return slot, bad


def dense_fold_epilogue(kind: str, acc, aggv, cnt, rows, overflow):
    """Fold one dense batch table into the running accumulator INSIDE the
    same compiled program (one dispatch per batch instead of kernel +
    fold — per-batch dispatch overhead is ~10ms through a remote tunnel
    and linear in batch count). Overflowed batches fold as identity; they
    re-run on the sort ladder (executor._resolve_pending). Mirrors the
    reference's device-resident result-buffer swap
    (query/aql_batchexecutor.go:209).

    Float sums and all counts accumulate in f64 (emulated but [S]-sized):
    per-batch f32 lanes are exact below 2^24, but a cross-batch f32
    accumulator would round any group crossing 16.7M rows."""
    a_agg, a_cnt, a_rows = acc
    keep = overflow == 0
    zero = jnp.zeros((), aggv.dtype)
    if kind in ("sum", "count", "avg"):
        a_agg = a_agg + jnp.where(keep, aggv, zero).astype(a_agg.dtype)
    elif kind == "min":
        ident = (jnp.array(np.finfo(np.float32).max, aggv.dtype)
                 if aggv.dtype.kind == "f"
                 else jnp.array(np.iinfo(np.int32).max, aggv.dtype))
        a_agg = jnp.minimum(a_agg, jnp.where(keep, aggv, ident))
    else:
        ident = (jnp.array(-np.finfo(np.float32).max, aggv.dtype)
                 if aggv.dtype.kind == "f"
                 else jnp.array(np.iinfo(np.int32).min, aggv.dtype))
        a_agg = jnp.maximum(a_agg, jnp.where(keep, aggv, ident))
    a_cnt = a_cnt + jnp.where(keep, cnt,
                              jnp.zeros((), cnt.dtype)).astype(a_cnt.dtype)
    a_rows = a_rows + jnp.where(
        keep, rows, jnp.zeros((), rows.dtype)).astype(a_rows.dtype)
    return (a_agg, a_cnt, a_rows), overflow


def _dense_donate():
    try:
        return (4,) if jax.devices()[0].platform not in ("cpu",) else ()
    except Exception:  # noqa: BLE001
        return ()


def make_dense_agg_kernel(plan: CompiledQuery, n_rows: int, dense_plan):
    """Dense slot-indexed aggregation — no sort, no 64-bit keys.

    Each row maps to slot = Σ (dim_idx+1) * stride (0 = NULL per dim) in a
    fixed [0, n_slots) space (dense.DensePlan); segment reductions produce
    the whole group table in one pass. Rows whose dim value falls outside
    the planned domain are counted in `overflow` — the executor falls back
    to the sort path for that batch when overflow > 0.

    On real TPU backends, eligible plans route to the fully-fused pallas
    kernel (fused_dense.py): expression eval + slot mapping + factored MXU
    reduction in one VMEM-resident pass over the raw columns.

    Signature: fn(columns, foreign, n_valid, live_cutoff, acc) ->
    ((agg[S], cnt[S], rows[S]) folded into acc, overflow) — the running
    accumulator rides the SAME dispatch (donated on TPU backends).
    """
    from aresdb_tpu.query import fused_dense as FD

    fused = FD.maybe_make_fused_kernel(plan, n_rows, dense_plan)
    if fused is not None:
        return fused

    agg = plan.measure.agg
    out_float = plan.measure.out_float
    n_slots = dense_plan.n_slots

    def fn(columns, foreign, n_valid, live_cutoff):
        ctx = _EvalCtx(columns, foreign, n_rows)
        mask, dim_vals = _eval_common(plan, ctx, n_valid, live_cutoff)
        mlane = _measure_lane(plan, ctx)

        slot, bad = dense_slot_lane(dim_vals, dense_plan, n_rows)

        keep = mask & ~bad
        slot = jnp.where(keep, slot, jnp.int32(n_slots))
        overflow = jnp.sum(mask & bad).astype(jnp.int32)

        mval, mvalid = mlane.value, mlane.valid & keep
        if n_slots <= 4:
            # tiny slot spaces (no-dims global aggregates, boolean dims):
            # per-slot MASKED REDUCTIONS — a scatter-based segment_sum
            # costs ~20ms per 2M-row batch on one v5e where jnp.sum costs
            # 0.4ms (tools/bench_join_gather.py)
            aggs, cnts, rows = [], [], []
            for s in range(n_slots):
                sel = keep & (slot == s)
                selm = sel & mvalid
                onesf = selm.astype(jnp.float32)
                if agg in ("sum", "count", "avg"):
                    contrib = jnp.where(selm, mval,
                                        jnp.zeros((), mval.dtype))
                    aggs.append(jnp.sum(contrib))
                elif agg == "min":
                    ident = _F32_MAX if out_float else jnp.array(
                        np.iinfo(np.int32).max, mval.dtype)
                    aggs.append(jnp.min(jnp.where(selm, mval, ident)))
                else:
                    ident = -_F32_MAX if out_float else jnp.array(
                        np.iinfo(np.int32).min, mval.dtype)
                    aggs.append(jnp.max(jnp.where(selm, mval, ident)))
                cnts.append(jnp.sum(onesf))
                rows.append(jnp.sum(sel.astype(jnp.float32)))
            return (jnp.stack(aggs), jnp.stack(cnts), jnp.stack(rows),
                    overflow)
        num = n_slots + 1
        ones = jnp.where(mvalid, jnp.float32(1), jnp.float32(0))
        present = jnp.where(keep, jnp.float32(1), jnp.float32(0))
        if agg in ("sum", "count", "avg"):
            contrib = jnp.where(mvalid, mval, jnp.zeros((), mval.dtype))
            if contrib.dtype == jnp.float32:
                # one fused (n, 3) f32 segment_sum: measure, count, presence
                stacked = jnp.stack([contrib, ones, present], axis=1)
                from aresdb_tpu.query import pallas_ops as P

                if P.use_factored(n_slots):
                    # factored hi/lo one-hot outer product on the MXU —
                    # fastest dense reduction at every slot count (see
                    # pallas_ops.factored_segment_sum measurements)
                    dropped = jnp.where(slot >= n_slots, jnp.int32(-1),
                                        slot.astype(jnp.int32))
                    out3 = P.factored_segment_sum_indicator(dropped, stacked, n_slots)
                    return out3[:, 0], out3[:, 1], out3[:, 2], overflow
                if P.use_pallas(n_slots):
                    # gridless pallas one-hot matmul reduction (scatter-free)
                    interp = jax.devices()[0].platform == "cpu"
                    dropped = jnp.where(slot >= n_slots, jnp.int32(-1),
                                        slot)
                    out3 = P.dense_segment_sum(dropped, stacked, n_slots,
                                               interpret=interp)
                    aggv = out3[:, 0]
                    cnt = out3[:, 1]
                    rows = out3[:, 2]
                    return aggv, cnt, rows, overflow
                out = jax.ops.segment_sum(stacked, slot, num_segments=num)
                aggv = out[:n_slots, 0]
                cnt = out[:n_slots, 1]
                rows = out[:n_slots, 2]
                return aggv, cnt, rows, overflow
            aggv = jax.ops.segment_sum(contrib, slot, num_segments=num)[:n_slots]
        elif agg == "min":
            big = _F32_MAX if out_float else jnp.array(
                np.iinfo(np.int32).max, mval.dtype)
            contrib = jnp.where(mvalid, mval, big)
            aggv = jax.ops.segment_min(contrib, slot, num_segments=num)[:n_slots]
        elif agg == "max":
            small = -_F32_MAX if out_float else jnp.array(
                np.iinfo(np.int32).min, mval.dtype)
            contrib = jnp.where(mvalid, mval, small)
            aggv = jax.ops.segment_max(contrib, slot, num_segments=num)[:n_slots]
        else:
            raise QueryError(f"agg {agg} has no dense kernel")

        stacked = jnp.stack([ones, present], axis=1)
        out = jax.ops.segment_sum(stacked, slot, num_segments=num)
        cnt = out[:n_slots, 0]
        rows = out[:n_slots, 1]
        return aggv, cnt, rows, overflow

    def fn_acc(columns, foreign, n_valid, live_cutoff, acc):
        aggv, cnt, rows, overflow = fn(columns, foreign, n_valid,
                                       live_cutoff)
        return dense_fold_epilogue(agg, acc, aggv, cnt, rows, overflow)

    return jax.jit(fn_acc, donate_argnums=_dense_donate())


def dense_acc_init(plan: CompiledQuery, n_slots: int):
    """Identity accumulator for the dense kernel's running fold.

    Additive channels accumulate in f64 / i64 (see dense_fold_epilogue);
    min/max keep the per-batch lane dtype (no accumulation error)."""
    m = plan.measure
    if m.agg in ("count", "sum", "avg"):
        dt = (jnp.float64 if (m.out_float or m.agg in ("avg", "count"))
              else jnp.int64)
        a = jnp.zeros(n_slots, dt)
    elif m.agg == "min":
        dt = jnp.float32 if m.out_float else jnp.int32
        a = jnp.full(n_slots, np.finfo(np.float32).max
                     if dt == jnp.float32 else np.iinfo(np.int32).max, dt)
    else:
        dt = jnp.float32 if m.out_float else jnp.int32
        a = jnp.full(n_slots, -np.finfo(np.float32).max
                     if dt == jnp.float32 else np.iinfo(np.int32).min, dt)
    return a, jnp.zeros(n_slots, jnp.float64), jnp.zeros(n_slots,
                                                         jnp.float64)


def run_dense_kernel(fn, plan: CompiledQuery, n_slots: int, columns,
                     foreign, n_valid, live_cutoff):
    """Single-batch convenience for tests/benches: run a dense kernel
    against an identity accumulator and return the classic
    (agg, cnt, rows, overflow) tuple."""
    acc = dense_acc_init(plan, n_slots)
    (aggv, cnt, rows), overflow = fn(columns, foreign, n_valid,
                                     live_cutoff, acc)
    return aggv, cnt, rows, overflow


def make_select_kernel(plan: CompiledQuery, n_rows: int, top_l: int = 0):
    """Non-aggregation kernel: filter mask + dim lanes (no reduce).

    Reference: query/aql_nonaggr_batchexecutor.go — dims are written directly
    per passing row; the host applies the limit. With top_l > 0 the kernel
    compacts to the first top_l passing rows on device and returns
    (n_found, dims[top_l], valids[top_l]) instead of full lanes.
    """

    def fn(columns, foreign, n_valid, live_cutoff):
        ctx = _EvalCtx(columns, foreign, n_rows)
        mask, dim_vals = _eval_common(plan, ctx, n_valid, live_cutoff)
        if not top_l:
            return (mask,
                    tuple(dv.value for dv in dim_vals),
                    tuple(dv.valid for dv in dim_vals))
        # device-side top-L compaction: a stable sort on the inverted mask
        # moves passing rows to the front in scan order, so only L rows of
        # each dim lane ever reach the host (full lanes cost ~n*D transfer)
        iota = jnp.arange(n_rows, dtype=jnp.int32)
        sortk = jnp.where(mask, jnp.int8(0), jnp.int8(1))
        _, idx = jax.lax.sort((sortk, iota), num_keys=1, is_stable=True)
        idx_l = idx[:top_l]
        n_found = jnp.sum(mask).astype(jnp.int32)
        return (n_found,
                tuple(dv.value[idx_l] for dv in dim_vals),
                tuple(dv.valid[idx_l] for dv in dim_vals))

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# kernel cache: keyed by (plan signature, shape buckets)
# ---------------------------------------------------------------------------

def plan_signature(plan: CompiledQuery) -> str:
    """Structural key so textually-identical queries share compilations."""
    parts = [plan.main_schema.table.name,
             "|".join(str(f) for f in plan.filters),
             "|".join(str(f) for f in plan.time_filter_expr),
             "|".join(str(d.expr) for d in plan.dimensions)]
    if plan.measure:
        parts.append(f"{plan.measure.agg}:{plan.measure.expr}:{plan.measure.out_float}")
    for ft in plan.foreign_tables:
        parts.append(f"join:{ft.alias}:{ft.main_key_expr}:{ft.foreign_key_column}")
    if plan.geo is not None:
        g = plan.geo
        parts.append(f"geo:{g.alias}:{g.shape_column}:{g.point_expr}:"
                     f"{g.has_filter}:{g.exclude}")
    parts.append("geodims:" + ",".join(
        "1" if d.geo_dim else "0" for d in plan.dimensions))
    parts.append(f"nonagg:{plan.is_non_agg}")
    return "\x01".join(parts)


class KernelCache:
    def __init__(self):
        self._cache: Dict[Tuple, object] = {}

    def agg_kernel(self, plan: CompiledQuery, n_rows: int, k_groups: int):
        key = ("agg", plan_signature(plan), n_rows, k_groups)
        fn = self._cache.get(key)
        if fn is None:
            fn = make_agg_kernel(plan, n_rows, k_groups)
            self._cache[key] = fn
        return fn

    def select_kernel(self, plan: CompiledQuery, n_rows: int,
                      top_l: int = 0):
        key = ("sel", plan_signature(plan), n_rows, top_l)
        fn = self._cache.get(key)
        if fn is None:
            fn = make_select_kernel(plan, n_rows, top_l)
            self._cache[key] = fn
        return fn

    def hll_kernel(self, plan: CompiledQuery, n_rows: int, k_groups: int):
        key = ("hll", plan_signature(plan), n_rows, k_groups)
        fn = self._cache.get(key)
        if fn is None:
            fn = make_hll_kernel(plan, n_rows, k_groups)
            self._cache[key] = fn
        return fn

    def runlen_kernel(self, plan: CompiledQuery, n_rows: int, n_runs: int,
                      k_groups: int, spec):
        key = ("runlen", plan_signature(plan), n_rows, n_runs, k_groups,
               spec.key())
        fn = self._cache.get(key)
        if fn is None:
            fn = make_runlen_agg_kernel(plan, n_rows, n_runs, k_groups,
                                        spec)
            self._cache[key] = fn
        return fn

    def dense_agg_kernel(self, plan: CompiledQuery, n_rows: int, dense_plan):
        dsig = tuple(
            (d.kind, d.size, d.base, d.step, d.post_div,
             None if d.values is None else d.values.tobytes())
            for d in dense_plan.domains)
        key = ("dense", plan_signature(plan), n_rows, dsig)
        fn = self._cache.get(key)
        if fn is None:
            fn = make_dense_agg_kernel(plan, n_rows, dense_plan)
            self._cache[key] = fn
        return fn


GLOBAL_KERNEL_CACHE = KernelCache()


def round_up_pow2(n: int, minimum: int = 1024) -> int:
    c = minimum
    while c < n:
        c <<= 1
    return c
