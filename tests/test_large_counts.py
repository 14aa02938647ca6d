"""Cross-batch accumulator exactness past 2^24 rows per group.

Per-batch lanes are f32 (exact below 2^24 — batches are capped at 4M),
but the CROSS-BATCH accumulators must be f64/i64: an f32 running count
rounds to multiples of 2 past 16.7M, silently corrupting counts and
integer-valued float sums at the 100M-row config (caught while auditing
the device-resident fold; reference counts are 64-bit throughout).
"""

import numpy as np
import jax.numpy as jnp

from aresdb_tpu import demo
from aresdb_tpu.query import kernels as K


def test_dense_fold_accumulates_past_2_24():
    plan = demo.demo_plan()
    n_slots = 4
    acc = K.dense_acc_init(plan, n_slots)
    assert np.asarray(acc[1]).dtype == np.float64
    # 5 batches x (2^24 - 1) rows in slot 0: an f32 accumulator would
    # round every add past the first
    per = np.float32(2**24 - 1)
    aggv = jnp.asarray([per, 0, 0, 0], jnp.float32)
    cnt = jnp.asarray([per, 0, 0, 0], jnp.float32)
    rows = cnt
    for _ in range(5):
        (acc), _ = K.dense_fold_epilogue("sum", acc, aggv, cnt, rows,
                                         jnp.int32(0))
    total = int(np.asarray(acc[1])[0])
    assert total == 5 * (2**24 - 1)
    assert int(np.asarray(acc[0])[0]) == 5 * (2**24 - 1)


def test_big_merge_counts_past_2_24():
    from aresdb_tpu.query.executor import _merge_big_device
    from aresdb_tpu.query.kernels import SENTINEL64

    n = 256
    gkeys = jnp.asarray(
        np.where(np.arange(n) < 5, np.uint64(3) << np.uint64(1) | 1,
                 np.uint64(0xFFFFFFFFFFFFFFFF)).astype(np.uint64))
    per = np.float32(2**24 - 1)
    wsum = jnp.asarray(np.where(np.arange(n) < 5, per, 0).astype(np.float32))
    wcnt = wsum
    dims = (jnp.asarray(np.full(n, 3, np.int32)),)
    dvalids = (jnp.asarray(np.ones(n, bool)),)
    out = _merge_big_device(gkeys, wsum, wcnt, dims, dvalids, 64)
    aggv = np.asarray(out[2])
    cnt = np.asarray(out[3])
    assert int(cnt[0]) == 5 * (2**24 - 1)
    assert int(aggv[0]) == 5 * (2**24 - 1)
