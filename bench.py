"""Benchmark: AQL filter + group-by aggregation throughput on one chip.

Measures rows/s of the fused filter+dims+measure+group-by pipeline (the
reference's whole OOPK per-batch loop) on synthetic trips data per
BASELINE.md config #2. Headline = the dense slot path (the executor's
default for bounded dims) with the factored MXU segment reduction.

Methodology: iterations are CHAINED on device (each step's measure column
carries a data dependency on the previous step's result) and synced once at
the end — the same shape as the executor's deferred-fetch pipelining, which
dispatches every batch before fetching any result. Per-iteration host syncs
would charge the ~25ms remote-tunnel round trip to every batch, which a
production deployment (local TPU, pipelined batches) never pays; the
per-iter-sync number is printed to stderr for reference.

The reference publishes no numbers (BASELINE.json "published": {}), so
vs_baseline is reported as 1.0.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    from aresdb_tpu.utils import jax_env

    jax_env.ensure()
    import jax
    import jax.numpy as jnp

    from aresdb_tpu import demo
    from aresdb_tpu.query import kernels as K
    from aresdb_tpu.query.dense import plan_dense

    n_rows = 1 << 22  # 4M rows per batch
    iters = 8
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

    # chained pipeline: each step perturbs the measure column by
    # (carry - carry) — an IEEE-unfoldable zero — forcing serialization of
    # the 8 steps on device with a single host sync at the end
    mkey = next(k for k in columns
                if k != city_key and columns[k][0].dtype == jnp.float32)

    @jax.jit
    def chained(columns, n):
        def body(carry, _):
            cols = dict(columns)
            v, b = cols[mkey]
            cols[mkey] = (v + (carry - carry), b)
            out = dense_fn.__wrapped__(cols, (), n, np.int64(0))
            return carry + jnp.sum(out[0]), None
        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return carry

    float(chained(columns, np.int32(n_rows)))  # compile + warm
    t0 = time.perf_counter()
    float(chained(columns, np.int32(n_rows)))
    el = time.perf_counter() - t0
    dense_rps = n_rows * iters / el

    # per-iteration sync diagnostic (includes tunnel round trip per batch)
    sync_dense(dense_fn(columns, (), np.int32(n_rows), np.int64(0)))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync_dense(dense_fn(columns, (), np.int32(n_rows), np.int64(0)))
    el_sync = time.perf_counter() - t0
    print(f"dense-path chained: {dense_rps/1e6:.1f}M rows/s "
          f"({el/iters*1e3:.1f}ms/batch); per-iter-sync: "
          f"{n_rows*iters/el_sync/1e6:.1f}M rows/s", file=sys.stderr)

    # the general sort path is measured only with --full (one extra slow
    # compile through the remote-TPU tunnel)
    if "--full" in sys.argv:
        sort_fn = jax.jit(
            lambda c, n: K.agg_batch_body(plan, n_rows, 1 << 15, c, (), n))
        float(jnp.sum(sort_fn(columns, np.int32(n_rows))[3]))  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            float(jnp.sum(sort_fn(columns, np.int32(n_rows))[3]))
        el_sort = time.perf_counter() - t0
        print(f"sort-path: {n_rows * iters / el_sort / 1e6:.1f}M rows/s",
              file=sys.stderr)

    print(json.dumps({
        "metric": "agg_query_rows_per_sec_per_chip",
        "value": round(dense_rps, 1),
        "unit": "rows/s",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
