"""Benchmark: AQL filter + group-by aggregation throughput on one chip.

Measures rows/s of the fused filter+dims+measure+group-by pipeline (the
reference's whole OOPK per-batch loop) on synthetic trips data per
BASELINE.md config #2. Headline = the dense slot path (the executor's
default for bounded dims); the general sort path is printed to stderr.
Prints one JSON line on stdout. The reference publishes no numbers
(BASELINE.json "published": {}), so vs_baseline is reported as 1.0.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _time(fn, sync, iters: int) -> float:
    for _ in range(3):
        sync(fn())
    start = time.perf_counter()
    for _ in range(iters):
        sync(fn())
    return time.perf_counter() - start


def main() -> None:
    from aresdb_tpu.utils import jax_env

    jax_env.ensure()
    import jax
    import jax.numpy as jnp

    from aresdb_tpu import demo
    from aresdb_tpu.query import kernels as K
    from aresdb_tpu.query.dense import plan_dense

    n_rows = 1 << 22  # 4M rows per batch
    plan = demo.demo_plan()
    cols_np, _ = demo.demo_columns(plan, n_rows)
    columns = {k: (jnp.asarray(v), jnp.asarray(b))
               for k, (v, b) in cols_np.items()}

    # dense path (executor default: hour bucket × city id are both bounded)
    city_key = (0, plan.main_schema.column_id("city_id"))
    stats = {city_key: int(cols_np[city_key][0].max())}
    dp = plan_dense(plan, stats)
    assert dp is not None, "demo plan must qualify for dense mode"
    dense_fn = K.make_dense_agg_kernel(plan, n_rows, dp)

    # block_until_ready does not synchronize through remote-execution
    # platforms (axon tunnel) — force a host scalar fetch instead
    def sync_dense(out):
        return float(jnp.sum(out[0]))

    iters = 8
    el_dense = _time(lambda: dense_fn(columns, (), np.int32(n_rows), np.int64(0)),
                     sync_dense, iters)
    dense_rps = n_rows * iters / el_dense

    # the general sort path is measured only with --full (one extra slow
    # compile through the remote-TPU tunnel)
    if "--full" in sys.argv:
        sort_fn = jax.jit(
            lambda c, n: K.agg_batch_body(plan, n_rows, 1 << 15, c, (), n))
        el_sort = _time(lambda: sort_fn(columns, np.int32(n_rows)),
                        lambda out: float(jnp.sum(out[3])), iters)
        print(f"sort-path: {n_rows * iters / el_sort / 1e6:.1f}M rows/s",
              file=sys.stderr)
    print(f"dense-path: {dense_rps/1e6:.1f}M rows/s", file=sys.stderr)
    print(json.dumps({
        "metric": "agg_query_rows_per_sec_per_chip",
        "value": round(dense_rps, 1),
        "unit": "rows/s",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
