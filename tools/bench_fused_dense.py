"""Micro-bench: fused dense pallas kernel vs the round-2 XLA+pallas path.

Must run via the repo import path (x64 on, axon registered) — standalone
configs give numbers that don't transfer (CLAUDE.md). Methodology matches
bench.py: 64 device-chained iterations, one host sync.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys
import time

import numpy as np

from aresdb_tpu.utils import jax_env

jax_env.ensure()

import jax
import jax.numpy as jnp

from aresdb_tpu import demo
from aresdb_tpu.query import fused_dense as FD
from aresdb_tpu.query import kernels as K
from aresdb_tpu.query.dense import plan_dense

N_ROWS = 1 << 22
ITERS = 64
TIME_KEY = (0, 0)


def chained(fn, columns, sync_of_out):
    @jax.jit
    def run(columns):
        def body(carry, _):
            cols = dict(columns)
            v, b = cols[TIME_KEY]
            cols[TIME_KEY] = (v + (carry - carry).astype(v.dtype), b)
            out = fn(cols)
            return carry + sync_of_out(out), None
        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return carry

    float(run(columns))
    t0 = time.perf_counter()
    float(run(columns))
    el = time.perf_counter() - t0
    return el / ITERS


def main():
    plan = demo.demo_plan()
    cols_np, _ = demo.demo_columns(plan, N_ROWS)
    columns = {k: (jnp.asarray(v), jnp.asarray(b))
               for k, (v, b) in cols_np.items()}
    city_key = (0, plan.main_schema.column_id("city_id"))
    stats = {city_key: int(cols_np[city_key][0].max())}
    dp = plan_dense(plan, stats)
    spec = FD.plan_fused(plan, dp)
    print(f"n_slots={dp.n_slots} khi_pad={spec.khi_pad} "
          f"lanes={len(spec.col_ids)+1}", flush=True)

    which = sys.argv[1] if len(sys.argv) > 1 else "both"

    if which in ("both", "old"):
        os.environ["ARES_FUSED"] = "0"
        old = K.make_dense_agg_kernel(plan, N_ROWS, dp)
        sec = chained(
            lambda c: old.__wrapped__(
                c, (), np.int32(N_ROWS), np.int64(0),
                K.dense_acc_init(plan, dp.n_slots)),
            columns, lambda out: jnp.sum(out[0][0]).astype(jnp.float32))
        print(f"old: {sec*1e3:.2f}ms/batch  {N_ROWS/sec/1e6:.0f}M rows/s",
              flush=True)
        os.environ.pop("ARES_FUSED", None)

    if which in ("both", "fused"):
        fused = FD.make_fused_dense_kernel(plan, N_ROWS, dp, spec)
        sec = chained(
            lambda c: fused.__wrapped__(
                c, (), np.int32(N_ROWS), np.int64(0),
                K.dense_acc_init(plan, dp.n_slots)),
            columns, lambda out: jnp.sum(out[0][0]).astype(jnp.float32))
        print(f"fused: {sec*1e3:.2f}ms/batch  {N_ROWS/sec/1e6:.0f}M rows/s",
              flush=True)

        # sanity: same result as the XLA path on a real-chip run
        os.environ["ARES_FUSED"] = "0"
        old = K.make_dense_agg_kernel(plan, N_ROWS, dp)
        os.environ.pop("ARES_FUSED", None)
        fa = np.asarray(K.run_dense_kernel(
            fused, plan, dp.n_slots, columns, (), np.int32(N_ROWS),
            np.int64(0))[0])
        ra = np.asarray(K.run_dense_kernel(
            old, plan, dp.n_slots, columns, (), np.int32(N_ROWS),
            np.int64(0))[0])
        rel = np.max(np.abs(fa - ra) / np.maximum(np.abs(ra), 1.0))
        print(f"max rel diff vs XLA path: {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
