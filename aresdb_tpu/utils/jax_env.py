"""JAX runtime configuration for the framework.

x64 is enabled because measure aggregation matches the reference's 8-byte
accumulators (AGGR_SUM_FLOAT/SIGNED accumulate into 64-bit lanes,
reference: query/time_series_aggregate.h AggregateFunction + MeasureBytes=8
in query/aql_compiler.go:1199). Hot-path arrays (columns, masks, dim keys)
remain explicitly 32-bit; only group-table accumulators widen.
"""

from __future__ import annotations

import jax

_initialized = False


def ensure() -> None:
    global _initialized
    if not _initialized:
        jax.config.update("jax_enable_x64", True)
        _initialized = True


def devices():
    ensure()
    return jax.devices()
