"""Price the run-length kernel's row-level reduction formulations on chip.

The battery's archive-runlen row measures ~58ms vs 33ms for the fused
expand path at 4M rows / ~900 runs; this isolates where the extra cost is:
  A. sorted_segment_sum over run boundaries (current runlen kernel)
  B. factored_segment_sum_indicator over a staged run-id lane
  C. the fused-dense pallas kernel on EXPANDED rows (the path to beat)
Chained 64 iters, one sync.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from aresdb_tpu.utils import jax_env

jax_env.ensure()
import jax
import jax.numpy as jnp
import numpy as np

from aresdb_tpu.query.kernels import sorted_segment_sum

N = 1 << 22
N_RUNS = 1024
ITERS = 64

rng = np.random.RandomState(0)
lens = rng.multinomial(N, np.ones(900) / 900)
starts_np = np.zeros(N_RUNS, np.int32)
starts_np[:900] = np.concatenate([[0], np.cumsum(lens)[:-1]])
starts_np[900:] = N
lens_np = np.zeros(N_RUNS, np.int32)
lens_np[:900] = lens
rid_np = np.repeat(np.arange(900, dtype=np.int32), lens)
fare_np = (rng.rand(N) * 50).astype(np.float32)

starts = jnp.asarray(starts_np)
lens_d = jnp.asarray(lens_np)
rid = jnp.asarray(rid_np)
fare = jnp.asarray(fare_np)


def chain(body):
    def step(c, _):
        return body(c), ()

    def run():
        out, _ = jax.lax.scan(step, jnp.float32(0), None, length=ITERS)
        return out

    return jax.jit(run)


def timeit(name, fn):
    fn()
    float(jnp.sum(fn()))
    t0 = time.perf_counter()
    s = float(jnp.sum(fn()))
    dt = (time.perf_counter() - t0) * 1e3 / ITERS
    print(f"{name:44s} {dt:8.2f} ms/iter  (sum {s:.1f})")


def body_a(c):
    f = fare + (c - c)
    mask = jnp.ones(N, jnp.bool_)
    ones = mask.astype(jnp.float32)
    stacked = jnp.stack([jnp.where(mask, f, 0.0), ones, ones], axis=1)
    ends = starts + lens_d
    per = sorted_segment_sum(stacked, N_RUNS, starts, ends)
    return jnp.sum(per[:, 0]).astype(jnp.float32)


def body_b(c):
    from aresdb_tpu.query import pallas_ops as P

    f = fare + (c - c)
    ones = jnp.ones(N, jnp.float32)
    stacked = jnp.stack([f, ones, ones], axis=1)
    per = P.factored_segment_sum_indicator(rid, stacked, N_RUNS,
                                           ones_channels=(1, 2))
    return jnp.sum(per[:, 0])


def body_c(c):
    # the fused expand path's cost model: one pass over the rows with the
    # factored reduction at the DENSE slot count (300 cities)
    from aresdb_tpu.query import pallas_ops as P

    f = fare + (c - c)
    ones = jnp.ones(N, jnp.float32)
    stacked = jnp.stack([f, ones, ones], axis=1)
    per = P.factored_segment_sum_indicator(rid, stacked, 1024,
                                           ones_channels=(2,))
    return jnp.sum(per[:, 0])


timeit("A sorted_segment_sum (runlen now)", chain(body_a))
timeit("B factored rid lane (ones 1,2)", chain(body_b))
timeit("C factored rid lane (ones 2)", chain(body_c))
