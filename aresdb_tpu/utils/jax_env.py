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
        import sys

        jax.config.update("jax_enable_x64", True)
        # deep pallas traces (jit → pallas_call → run_scoped → fori_loop)
        # exceed CPython's default 1000-frame limit
        sys.setrecursionlimit(max(sys.getrecursionlimit(), 10_000))
        # persistent compilation cache: remote-TPU compiles cost tens of
        # seconds per kernel; cache hits make repeated processes (bench,
        # daemons) start fast
        import os

        cache_dir = os.environ.get("ARES_JAX_CACHE",
                                   "/tmp/aresdb-jax-cache")
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        except Exception:
            pass
        _initialized = True


def devices():
    ensure()
    return jax.devices()
