"""Price foreign-probe + tiny-slot reduction formulations on the real chip.

Candidates for the join hot path (VERDICT r4 #4):
  A. current: lut[idx] gather + values[rows] gathers (XLA dynamic gather)
  B. precomposed per-key value table + ONE gather
  C. one-hot MXU dot gather (chunked-exact for i32/f32 values)
And for the no-dims (1-slot) reduction:
  D. segment_sum scatter with n_slots=1 (current)
  E. masked jnp.sum reduction
Chained 64 iterations, one sync (bench.py methodology).
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

N = 1 << 21
F = 301
ITERS = 64

rng = np.random.RandomState(0)
keys_np = rng.randint(0, 310, N).astype(np.int32)
lut_np = np.full(310 + 2, -1, np.int32)
lut_np[:F] = np.arange(F)
vals_np = ((np.arange(F) + 1) * 1000).astype(np.int32)
fvalid_np = np.ones(F, bool)
mval_np = rng.rand(N).astype(np.float32)

keys = jnp.asarray(keys_np)
lut = jnp.asarray(lut_np)
vals = jnp.asarray(vals_np)
fvalid = jnp.asarray(fvalid_np)
mval = jnp.asarray(mval_np)


def chain(body, *args):
    def step(c, _):
        out = body(*args, c)
        return out, ()

    def run(*a):
        out, _ = jax.lax.scan(step, jnp.float32(0), None, length=ITERS)
        return out

    return jax.jit(run)


def timeit(name, fn):
    fn()
    float(jnp.sum(fn()))
    t0 = time.perf_counter()
    r = fn()
    s = float(jnp.sum(r))
    dt = (time.perf_counter() - t0) * 1e3 / ITERS
    print(f"{name:36s} {dt:8.2f} ms/iter   (checksum {s:.3f})")
    return dt


# A: current probe: rows=lut[idx]; v=vals[rows]; b=fvalid[rows]&hit
def probe_a(keys, lut, vals, fvalid, carry):
    k = keys + (carry - carry).astype(jnp.int32)
    in_range = (k >= 0) & (k < lut.shape[0])
    idx = jnp.clip(k, 0, lut.shape[0] - 1)
    rows = lut[idx]
    hit = in_range & (rows >= 0)
    rows = jnp.maximum(rows, 0)
    v = vals[rows]
    b = fvalid[rows] & hit
    return jnp.sum(jnp.where(b, v, 0).astype(jnp.float32))


# B: precomposed dense key->value table, ONE gather
tbl_np = np.zeros((312, 2), np.int32)
tbl_np[:310, 0] = np.where(lut_np[:310] >= 0, vals_np[np.maximum(lut_np[:310], 0)], 0)
tbl_np[:310, 1] = (lut_np[:310] >= 0).astype(np.int32)
tbl = jnp.asarray(tbl_np)


def probe_b(keys, tbl, carry):
    k = keys + (carry - carry).astype(jnp.int32)
    idx = jnp.clip(k, 0, tbl.shape[0] - 1)
    row = tbl[idx]
    v, b = row[:, 0], row[:, 1] > 0
    return jnp.sum(jnp.where(b, v, 0).astype(jnp.float32))


# C: one-hot MXU gather (chunked-exact i32: 4x 8-bit chunks)
F_PAD = 384


def probe_c(keys, tbl, carry):
    k = keys + (carry - carry).astype(jnp.int32)
    idx = jnp.clip(k, 0, F_PAD - 1)
    oh = (idx[:, None] == jnp.arange(F_PAD, dtype=jnp.int32)[None, :]
          ).astype(jnp.bfloat16)                      # [N, F_PAD]
    tv = jnp.zeros((F_PAD, 5), jnp.float32)
    v32 = tbl[:, 0]
    chunks = [((v32 >> (8 * c)) & 0xFF).astype(jnp.float32)
              for c in range(4)]
    tv = tv.at[:tbl.shape[0], 0].set(chunks[0][:tbl.shape[0]]) \
           .at[:tbl.shape[0], 1].set(chunks[1][:tbl.shape[0]]) \
           .at[:tbl.shape[0], 2].set(chunks[2][:tbl.shape[0]]) \
           .at[:tbl.shape[0], 3].set(chunks[3][:tbl.shape[0]]) \
           .at[:tbl.shape[0], 4].set(tbl[:, 1].astype(jnp.float32))
    out = jax.lax.dot_general(oh, tv.astype(jnp.bfloat16),
                              (((1,), (0,)), ((), ())),
                              precision=jax.lax.Precision.DEFAULT,
                              preferred_element_type=jnp.float32)  # [N, 5]
    v = (out[:, 0].astype(jnp.int32)
         + (out[:, 1].astype(jnp.int32) << 8)
         + (out[:, 2].astype(jnp.int32) << 16)
         + (out[:, 3].astype(jnp.int32) << 24))
    b = out[:, 4] > 0
    return jnp.sum(jnp.where(b, v, 0).astype(jnp.float32))


# D/E: 1-slot reduction
slot_np = np.zeros(N, np.int32)
slot = jnp.asarray(slot_np)


def red_d(mval, slot, carry):
    m = mval + (carry - carry)
    stacked = jnp.stack([m, jnp.ones_like(m), jnp.ones_like(m)], axis=1)
    out = jax.ops.segment_sum(stacked, slot, num_segments=2)
    return out[0, 0]


def red_e(mval, carry):
    m = mval + (carry - carry)
    return jnp.sum(m) + jnp.sum(jnp.ones_like(m)) * 0


timeit("A lut+2 gathers", chain(probe_a, keys, lut, vals, fvalid))
timeit("B precomposed 1 gather", chain(probe_b, keys, tbl))
timeit("C one-hot MXU gather", chain(probe_c, keys, tbl))
timeit("D segment_sum 1-slot scatter", chain(red_d, mval, slot))
timeit("E masked jnp.sum", chain(red_e, mval))
