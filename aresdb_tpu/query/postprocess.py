"""Result postprocessing: group table → nested JSON AQLQueryResult.

Reference: query/aql_postprocessor.go (flushResultBuffer) and
query/common/dimval.go (ReadDimension / formatTimeDimension). Dimension
values become strings ("NULL" for null), nested one map level per dimension,
with the single measure as a float (or None) leaf. Non-agg queries return
{"headers": [...], "matrixData": [[...], ...]}.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from aresdb_tpu.common import data_types as mdt
from aresdb_tpu.query import expr as E
from aresdb_tpu.query import time_util as TU
from aresdb_tpu.query.compiler import CompiledQuery, DimensionPlan

NULL_STRING = "NULL"


def format_float32(v: float) -> str:
    """Mirror Go strconv.FormatFloat(float64(float32(v)), 'g', -1, 32)."""
    f = np.float32(v)
    if np.isnan(f):
        return "NaN"
    if np.isinf(f):
        return "+Inf" if f > 0 else "-Inf"
    # shortest repr that round-trips float32
    s = np.format_float_positional(f, unique=True, trim="-")
    # Go switches to scientific for exponent < -4 or >= 21
    av = abs(float(f))
    if av != 0 and (av < 1e-4 or av >= 1e21):
        s = np.format_float_scientific(f, unique=True, trim="-")
        # Go style: 1e+21 not 1.e+21
        s = s.replace(".e", "e")
    return s


def format_dimension(value, valid: bool, dim: DimensionPlan,
                     plan: Optional[CompiledQuery] = None) -> Optional[str]:
    """One dimension value → string (None = NULL), ReadDimension parity."""
    if not valid:
        return None
    dt = dim.data_type
    if dim.geo_dim and plan is not None and plan.geo is not None:
        idx = int(value)
        if not (0 <= idx < len(plan.geo.shape_values)):
            return None
        value = plan.geo.shape_values[idx]
        dt = plan.geo.pk_data_type
        if dt == mdt.UUID:
            # geo dimensions render the NORMALIZED uuid (uppercase hex, no
            # dashes) — reference utils.NormalizeUUIDString via
            # aql_compiler.go:965 shapeUUIDs / aql_postprocessor.go:200
            s = mdt.uuid_to_string(int(value[0]), int(value[1]))
            return s.replace("-", "").upper()
        return str(value)
    is_time = dim.raw is not None and dim.raw.is_time_dimension

    if dt == mdt.UUID:
        return mdt.uuid_to_string(int(value[0]), int(value[1]))
    if dt == mdt.GeoPoint:
        return mdt.geopoint_to_string(float(value[0]), float(value[1]))
    if dt == mdt.Float32 and not is_time:
        return format_float32(float(value))
    iv = int(value)
    if dt in (mdt.Int64, mdt.Int32, mdt.Int16, mdt.Int8, mdt.Bool):
        return str(iv)
    # unsigned path: enum translation first, then time formatting.
    # dataonly mode keeps ranks untranslated (reference ?dataonly=1,
    # aql_postprocessor.go:116 — distributed merges happen on ranks)
    rev = dim.enum_reverse_dict
    if rev is not None and not getattr(plan, "data_only", False) \
            and 0 <= iv < len(rev):
        return rev[iv]
    if is_time:
        return TU.format_time_dimension(
            iv, dim.raw.time_bucketizer, dim.raw.time_unit,
            dim.from_offset, dim.to_offset, dim.dst_switch_ts)
    return str(iv)


def _measure_value(plan: CompiledQuery, agg_value, count: int) -> Optional[float]:
    m = plan.measure
    if m.agg == "hll":
        from aresdb_tpu.query import hll as H
        a = np.asarray(agg_value)
        if a.ndim == 0:
            # executor already estimated on device stats (JSON fast path)
            return float(a)
        return H.compute_estimate(a)
    if m.agg == "avg":
        if count == 0:
            return None
        # reference computes running float32 average on device; final
        # division here matches within float tolerance
        return float(np.float32(float(agg_value) / count))
    if m.agg in ("sum", "count"):
        return float(agg_value)
    # min/max: a group whose measures were all null yields the identity;
    # the reference reports that identity verbatim, so do we
    return float(agg_value)


def build_agg_result(plan: CompiledQuery, table) -> Dict[str, Any]:
    """GroupTable → nested time-series result (AQLQueryResult.Set parity).

    HLL leaves are estimated here; the binary register pass-through for the
    broker / application/hll clients lives in hll_wire.serialize_result_table
    (reference query/hll.go SerializeHLL)."""
    result: Dict[str, Any] = {}
    n_dims = len(plan.dimensions)
    # memoize per-dimension formatting: group counts are typically much
    # larger than per-dimension cardinality (hour buckets, enums), and
    # time/float formatting dominates the python tail otherwise
    fmt_cache: List[Dict] = [{} for _ in range(n_dims)]

    def fmt(i: int, value, valid: bool) -> Optional[str]:
        if not valid:
            return None
        k = value
        if isinstance(value, np.ndarray):
            k = tuple(value.tolist())
        cache = fmt_cache[i]
        s = cache.get(k)
        if s is None and k not in cache:
            s = format_dimension(value, True, plan.dimensions[i], plan)
            cache[k] = s
        return s

    for key, (dims, dim_valids, agg, cnt) in table.groups.items():
        dim_strs = [fmt(i, dims[i], dim_valids[i]) for i in range(n_dims)]
        measure = _measure_value(plan, agg, cnt)
        if n_dims == 0:
            # no dimensions: single-value result under implicit empty key
            result[""] = measure
            continue
        node = result
        for i, s in enumerate(dim_strs):
            s = NULL_STRING if s is None else s
            if i == n_dims - 1:
                node[s] = measure
            else:
                node = node.setdefault(s, {})
    return result


def build_non_agg_result(plan: CompiledQuery, rows) -> Dict[str, Any]:
    headers = []
    for d in plan.dimensions:
        headers.append(d.raw.alias or (d.raw.expr or str(d.expr)))
    matrix: List[List[Any]] = []
    for row in rows:
        out = []
        for i, (value, valid) in enumerate(row):
            s = format_dimension(value, valid, plan.dimensions[i], plan)
            out.append(NULL_STRING if s is None else s)
        matrix.append(out)
    return {"headers": headers, "matrixData": matrix}
