"""Sort-path composition variants at n=4M (VERDICT-r2 #3 pricing).

Chained on device (carry injected into the measure payload), one sync.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

from aresdb_tpu.utils import jax_env

jax_env.ensure()

import jax
import jax.numpy as jnp

N = 1 << 22
ITERS = 16


def chained(name, make_body):
    @jax.jit
    def run():
        def body(carry, _):
            return make_body(carry), None
        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return carry

    float(run())
    t0 = time.perf_counter()
    float(run())
    el = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {el*1e3:.2f}ms/iter -> {N/el/1e6:.0f}M rows/s",
          flush=True)


def main():
    rng = np.random.RandomState(0)
    keys = jnp.asarray(rng.randint(0, 1 << 15, N).astype(np.uint32))
    mval = jnp.asarray(rng.rand(N).astype(np.float32))
    valid = jnp.asarray(rng.rand(N) > 0.02)
    iota = jnp.arange(N, dtype=jnp.int32)

    def inj(c):
        return mval + (c - c)

    def v0(c):  # current composition
        sk, sv, svd, so = jax.lax.sort(
            (keys, inj(c), valid.astype(jnp.int8), iota),
            num_keys=1, is_stable=False)
        return sv[0] + so[0].astype(jnp.float32) * 1e-9

    def v1(c):  # drop iota (dims unpackable from exact keys)
        sk, sv, svd = jax.lax.sort(
            (keys, inj(c), valid.astype(jnp.int8)),
            num_keys=1, is_stable=False)
        return sv[0] + svd[0].astype(jnp.float32) * 1e-9

    def v2(c):  # single u64: key<<33 | valid<<32 | f32 bits
        m = inj(c)
        bits = jax.lax.bitcast_convert_type(m, jnp.uint32).astype(jnp.uint64)
        packed = ((keys.astype(jnp.uint64) << 33)
                  | (valid.astype(jnp.uint64) << 32) | bits)
        (sp,) = jax.lax.sort((packed,), num_keys=1, is_stable=False)
        sv = jax.lax.bitcast_convert_type(
            (sp & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), jnp.float32)
        return sv[0] + (sp[0] >> 33).astype(jnp.float32) * 1e-9

    def v3(c):  # two operands: u32 key, f32 measure (validity folded)
        m = jnp.where(valid, inj(c), jnp.float32(0))
        sk, sv = jax.lax.sort((keys, m), num_keys=1, is_stable=False)
        return sv[0] + sk[0].astype(jnp.float32) * 1e-9

    def v4(c):  # u64 key only (wide-key case today: u64 + 3 payloads)
        k64 = keys.astype(jnp.uint64) << 20
        sk, sv, svd, so = jax.lax.sort(
            (k64, inj(c), valid.astype(jnp.int8), iota),
            num_keys=1, is_stable=False)
        return sv[0] + so[0].astype(jnp.float32) * 1e-9

    chained("v0 sort(u32,f32,i8,i32)", v0)
    chained("v1 sort(u32,f32,i8)", v1)
    chained("v2 sort(u64 packed) + unpack", v2)
    chained("v3 sort(u32,f32)", v3)
    chained("v4 sort(u64,f32,i8,i32)", v4)


if __name__ == "__main__":
    main()


def main2():
    """Stage-level profile of the round-3 reduce_by_key at n=4M."""
    from aresdb_tpu.query import kernels as K

    rng = np.random.RandomState(0)
    # 50-bit-style keys with small dynamic range (hour buckets x city)
    base = np.uint64(1_600_000_000) << np.uint64(17)
    kv = (base + (rng.randint(0, 20, N).astype(np.uint64) << np.uint64(17))
          + rng.randint(0, 3000, N).astype(np.uint64))
    keys = jnp.asarray(kv)
    mval = jnp.asarray(rng.rand(N).astype(np.float32))
    mvalid = jnp.asarray(rng.rand(N) > 0.02)

    def inj(c):
        return mval + (c - c)

    def v5(c):  # sort stage only (rebase+cond), as in reduce_by_key
        m = inj(c)
        k64 = keys
        live = k64 != K.SENTINEL64
        any_live = jnp.any(live)
        kmin = jnp.min(jnp.where(live, k64, K.SENTINEL64))
        kmax = jnp.max(jnp.where(live, k64, jnp.uint64(0)))
        krange = jnp.where(any_live, kmax - kmin, jnp.uint64(0))
        bits = jax.lax.bitcast_convert_type(m, jnp.uint32).astype(jnp.uint64)

        def packed_sort():
            packed = (((k64 - kmin) << jnp.uint64(33))
                      | (mvalid.astype(jnp.uint64) << jnp.uint64(32)) | bits)
            packed = jnp.where(live, packed, K.SENTINEL64)
            (sp,) = jax.lax.sort((packed,), num_keys=1, is_stable=False)
            live_s = sp != K.SENTINEL64
            sk = jnp.where(live_s, (sp >> jnp.uint64(33)) + kmin,
                           K.SENTINEL64)
            mv = (((sp >> jnp.uint64(32)) & jnp.uint64(1)) != 0) & live_s
            vals = jax.lax.bitcast_convert_type(
                (sp & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), jnp.float32)
            return sk, vals, mv

        def folded_sort():
            k2 = (k64 << jnp.uint64(1)) | mvalid.astype(jnp.uint64)
            k2 = jnp.where(live, k2, K.SENTINEL64)
            sk2, vals = jax.lax.sort((k2, m), num_keys=1, is_stable=False)
            live_s = sk2 != K.SENTINEL64
            sk = jnp.where(live_s, sk2 >> jnp.uint64(1), K.SENTINEL64)
            mv = ((sk2 & jnp.uint64(1)) != 0) & live_s
            return sk, vals, mv

        sk, vals, mv = jax.lax.cond(krange < jnp.uint64(1 << 30),
                                    packed_sort, folded_sort)
        return vals[0] + sk[0].astype(jnp.float32) * 1e-18

    def v5b(c):  # packed sort WITHOUT the cond wrapper
        m = inj(c)
        k64 = keys
        live = k64 != K.SENTINEL64
        kmin = jnp.min(jnp.where(live, k64, K.SENTINEL64))
        bits = jax.lax.bitcast_convert_type(m, jnp.uint32).astype(jnp.uint64)
        packed = (((k64 - kmin) << jnp.uint64(33))
                  | (mvalid.astype(jnp.uint64) << jnp.uint64(32)) | bits)
        packed = jnp.where(live, packed, K.SENTINEL64)
        (sp,) = jax.lax.sort((packed,), num_keys=1, is_stable=False)
        vals = jax.lax.bitcast_convert_type(
            (sp & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), jnp.float32)
        return vals[0] + (sp[0] >> jnp.uint64(33)).astype(jnp.float32) * 1e-18

    def v7(c):  # full reduce_by_key (sortpack on)
        out = K.reduce_by_key(keys, inj(c), mvalid, "sum", True, 1 << 15,
                              None, sortpack=True)
        return out[2][0] + out[3][0] * 1e-9

    def v8(c):  # full reduce_by_key, legacy path
        out = K.reduce_by_key(keys, inj(c), mvalid, "sum", True, 1 << 15,
                              None, sortpack=False)
        return out[2][0] + out[3][0] * 1e-9

    chained("v5 rebased sort stage (cond)", v5)
    chained("v5b rebased sort stage (no cond)", v5b)
    chained("v7 reduce_by_key sortpack", v7)
    chained("v8 reduce_by_key legacy", v8)


if __name__ == "__main__" and "stages" in __import__("sys").argv:
    main2()
