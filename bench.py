"""Benchmark: AQL filter + group-by aggregation throughput on one chip.

Measures rows/s of the fused filter+dims+measure+sort+segment-reduce kernel
(the reference's whole OOPK per-batch pipeline) on synthetic trips data per
BASELINE.md config #2. Prints one JSON line. The reference publishes no
numbers (BASELINE.json "published": {}), so vs_baseline is reported as 1.0.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    from aresdb_tpu.utils import jax_env

    jax_env.ensure()
    import jax
    import jax.numpy as jnp

    from aresdb_tpu import demo
    from aresdb_tpu.query import kernels as K

    n_rows = 1 << 22  # 4M rows per batch (one live-batch worth, padded)
    k_groups = 4096
    plan = demo.demo_plan()
    cols_np, _ = demo.demo_columns(plan, n_rows)
    columns = {k: (jnp.asarray(v), jnp.asarray(b))
               for k, (v, b) in cols_np.items()}

    fn = jax.jit(lambda c, n: K.agg_batch_body(plan, n_rows, k_groups, c, (), n))

    def run_once():
        out = fn(columns, np.int32(n_rows))
        # force a host fetch of a scalar: block_until_ready alone does not
        # synchronize through remote-execution platforms (axon tunnel)
        return float(jnp.sum(out[3]))

    # warmup + compile
    for _ in range(3):
        run_once()

    iters = 10
    start = time.perf_counter()
    for _ in range(iters):
        run_once()
    elapsed = time.perf_counter() - start

    rows_per_sec = n_rows * iters / elapsed
    print(json.dumps({
        "metric": "agg_query_rows_per_sec_per_chip",
        "value": round(rows_per_sec, 1),
        "unit": "rows/s",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
