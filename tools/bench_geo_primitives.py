"""Measure the primitives for a two-pass geo redesign on the real chip.

Candidates (VERDICT round-3 task 2): bbox prefilter + pair extraction +
i8-key shape sort + while_loop chunked edge test + reassembly. Each stage
is measured standalone (chained where meaningful) so the design can be
priced before building it.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

from aresdb_tpu.utils import jax_env

jax_env.ensure()

import jax
import jax.numpy as jnp

N = 1 << 22


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))
                                           ) if hasattr(x, "astype") else x,
                           out)
    # force host sync via a scalar fetch of the first leaf
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0].astype(jnp.float32)))
    el = time.perf_counter() - t0
    print(f"{name}: {el*1e3:.2f}ms", flush=True)
    return el


def chained(name, make_body, iters=8):
    """Time a primitive chained on device: make_body(carry)->carry, scanned
    `iters` times with an IEEE-unfoldable carry injection (CLAUDE.md), one
    sync at the end. Reports per-iteration time net of the dispatch floor."""
    @jax.jit
    def run():
        def body(carry, _):
            return make_body(carry), None
        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return carry

    float(run())  # compile
    t0 = time.perf_counter()
    float(run())
    el = time.perf_counter() - t0
    print(f"{name}: {el / iters * 1e3:.2f}ms/iter ({iters} chained)",
          flush=True)
    return el / iters


def main():
    rng = np.random.RandomState(0)
    which = set(sys.argv[1:]) or {"sort", "bbox", "while", "extract"}

    if "sort" in which:
        for m in (1 << 22, 1 << 23, 1 << 24):
            k8 = jnp.asarray(rng.randint(0, 100, m).astype(np.int8))
            lat = jnp.asarray(rng.rand(m).astype(np.float32))
            lng = jnp.asarray(rng.rand(m).astype(np.float32))
            idx = jnp.arange(m, dtype=jnp.int32)

            @jax.jit
            def s8(k8, lat, lng, idx):
                return jax.lax.sort((k8, lat, lng, idx), num_keys=1,
                                    is_stable=True)

            timeit(f"i8 stable sort {m>>20}M + 3 payloads", s8, k8, lat,
                   lng, idx)

        k32 = jnp.asarray(rng.randint(0, N, N).astype(np.int32))
        v8 = jnp.asarray(rng.randint(0, 2, N).astype(np.int8))

        @jax.jit
        def s32(k32, v8):
            return jax.lax.sort((k32, v8), num_keys=1, is_stable=False)

        timeit("i32 sort 4M + 1 payload", s32, k32, v8)

        # radix back-sort: 3 stable i8 passes on idx bytes
        m = 1 << 23
        idx = jnp.asarray(rng.permutation(m).astype(np.int32))
        v8 = jnp.asarray(rng.randint(0, 2, m).astype(np.int8))

        @jax.jit
        def radix3(idx, v8):
            b0 = (idx & 0xFF).astype(jnp.int8)
            b0, idx, v8 = jax.lax.sort((b0, idx, v8), num_keys=1,
                                       is_stable=True)
            b1 = ((idx >> 8) & 0xFF).astype(jnp.int8)
            b1, idx, v8 = jax.lax.sort((b1, idx, v8), num_keys=1,
                                       is_stable=True)
            b2 = ((idx >> 16) & 0xFF).astype(jnp.int8)
            b2, idx, v8 = jax.lax.sort((b2, idx, v8), num_keys=1,
                                       is_stable=True)
            return idx, v8

        timeit("radix sort-back 8M (3 i8 passes)", radix3, idx, v8)

    if "bbox" in which:
        S = 128
        plat = jnp.asarray((rng.rand(N) * 10).astype(np.float32))
        plng = jnp.asarray((rng.rand(N) * 10).astype(np.float32))
        bb = jnp.asarray(rng.rand(4, S).astype(np.float32))

        @jax.jit
        def bbox(plat, plng, bb):
            lo_lat, hi_lat, lo_lng, hi_lng = bb
            cand = ((plat[:, None] >= lo_lat[None]) &
                    (plat[:, None] <= hi_lat[None]) &
                    (plng[:, None] >= lo_lng[None]) &
                    (plng[:, None] <= hi_lng[None]))
            return jnp.sum(cand, axis=1).astype(jnp.int8)

        timeit("bbox matrix [4M,128] + row sum", bbox, plat, plng, bb)

    if "extract" in which:
        S = 128
        cand = jnp.asarray(rng.rand(N, S) < 0.01)

        @jax.jit
        def first4(cand):
            # pack to 4 u32 words via weighted sums, then 4x lowest-set-bit
            bits = cand.reshape(N, 4, 32)
            w = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None]
            words = jnp.sum(jnp.where(bits, w, jnp.uint32(0)), axis=2,
                            dtype=jnp.uint32)  # [N,4]
            outs = []
            for _ in range(4):
                nz = words != 0
                low = words & (~words + jnp.uint32(1))  # lowest set bit
                lb = (31 - jax.lax.clz(low)).astype(jnp.int32)
                word_ix = jnp.argmax(nz, axis=1).astype(jnp.int32)
                any_ = jnp.any(nz, axis=1)
                sel_lb = jnp.take_along_axis(lb, word_ix[:, None],
                                             axis=1)[:, 0]
                sid = jnp.where(any_, word_ix * 32 + sel_lb, -1)
                clear = jnp.take_along_axis(low, word_ix[:, None], axis=1)
                words = words ^ jnp.where(
                    (jnp.arange(4)[None] == word_ix[:, None]) & any_[:, None],
                    clear, jnp.uint32(0))
                outs.append(sid.astype(jnp.int8))
            return tuple(outs)

        timeit("first-4 candidate extraction [4M,128]", first4, cand)

    if "chain" in which:
        # chained per-iteration costs for the two-pass geo pipeline pieces
        lat = jnp.asarray((rng.rand(N) * 10).astype(np.float32))
        lng = jnp.asarray((rng.rand(N) * 10).astype(np.float32))
        bb = jnp.asarray(rng.rand(4, 128).astype(np.float32))
        perm = jnp.asarray(rng.permutation(N).astype(np.int32))
        iota = jnp.arange(N, dtype=jnp.int32)

        def inj(carry):
            return lat + (carry - carry)

        chained("bbox [4M,128] cand-count", lambda c: jnp.sum(
            ((inj(c)[:, None] >= bb[0][None]) & (inj(c)[:, None] <= bb[1][None]) &
             (lng[:, None] >= bb[2][None]) & (lng[:, None] <= bb[3][None]))
            .astype(jnp.int8), axis=1).astype(jnp.float32).sum() * 1e-9)

        def sort_i8_iota(c):
            k8 = (inj(c) * 12.7).astype(jnp.int8)
            _, idx = jax.lax.sort((k8, iota), num_keys=1, is_stable=True)
            return idx[0].astype(jnp.float32) * 1e-9
        chained("i8+iota stable sort 4M", sort_i8_iota)

        def sort_i8_3p(c):
            k8 = (inj(c) * 12.7).astype(jnp.int8)
            _, a, b, idx = jax.lax.sort((k8, inj(c), lng, iota), num_keys=1,
                                        is_stable=True)
            return (a[0] + b[0]) * 1e-9 + idx[0].astype(jnp.float32) * 1e-9
        chained("i8+3payload stable sort 4M", sort_i8_3p)

        def gather_4m(c):
            return inj(c)[perm][0] * 1e-9
        chained("random gather 4M f32", gather_4m)

        def scatter_4m(c):
            out = jnp.zeros(N, jnp.float32).at[perm].set(inj(c))
            return out[0] * 1e-9
        chained("random scatter 4M f32", scatter_4m)

        def cumsum_rank(c):
            cand = (inj(c)[:, None] >= bb[0][None]) & (lng[:, None] <= bb[3][None])
            rank = jnp.cumsum(cand.astype(jnp.int8), axis=1)
            s_iota = jnp.arange(128, dtype=jnp.int32)[None]
            outs = 0.0
            for k in range(4):
                mk = cand & (rank == (k + 1))
                sid = jnp.sum(jnp.where(mk, s_iota, 0), axis=1)
                outs = outs + sid[0].astype(jnp.float32)
            return outs * 1e-9
        chained("bbox+rank+first4 extraction (cumsum)", cumsum_rank)

    if "while" in which:
        # shape-sorted pairs, chunked edge test via dynamic slices
        CHUNK = 8192
        E_SLAB = 128  # 2 shapes x 64 edges
        n_pairs = N + (100 * CHUNK)
        n_chunks_live = n_pairs // CHUNK
        sshape = jnp.asarray(np.sort(rng.randint(0, 100, n_pairs))
                             .astype(np.int32))
        plat = jnp.asarray(rng.rand(n_pairs).astype(np.float32))
        plng = jnp.asarray(rng.rand(n_pairs).astype(np.float32))
        etab = jnp.asarray(rng.rand(100 + 2, 64, 4).astype(np.float32))

        @jax.jit
        def chunked(sshape, plat, plng, etab, n_live):
            out = jnp.zeros(n_pairs, jnp.int8)

            def body(state):
                c, out = state
                base = c * CHUNK
                s0 = jax.lax.dynamic_slice(sshape, (base,), (1,))[0]
                slab = jax.lax.dynamic_slice(
                    etab, (s0, jnp.int32(0), jnp.int32(0)),
                    (2, 64, 4)).reshape(E_SLAB, 4)
                pl_ = jax.lax.dynamic_slice(plat, (base,), (CHUNK,))
                pg = jax.lax.dynamic_slice(plng, (base,), (CHUNK,))
                ps = jax.lax.dynamic_slice(sshape, (base,), (CHUNK,))
                lng1 = slab[:, 0][None]
                lng2 = slab[:, 1][None]
                lat1 = slab[:, 2][None]
                slope = slab[:, 3][None]
                esid = jnp.repeat(jnp.arange(2, dtype=jnp.int32), 64)[None] + s0
                pgc = pg[:, None]
                cond1 = (lng1 > pgc) != (lng2 > pgc)
                cond2 = pl_[:, None] < slope * (pgc - lng1) + lat1
                own = esid == ps[:, None]
                cnt = jnp.sum((cond1 & cond2 & own).astype(jnp.bfloat16),
                              axis=1).astype(jnp.int32)
                inside = ((cnt % 2) == 1).astype(jnp.int8)
                out = jax.lax.dynamic_update_slice(out, inside, (base,))
                return c + 1, out

            def cond(state):
                return state[0] * CHUNK < n_live

            _, out = jax.lax.while_loop(cond, body, (jnp.int32(0), out))
            return out

        timeit(f"while-chunked edge test {n_chunks_live} chunks "
               f"({n_pairs>>20}M pairs, slab {E_SLAB})", chunked,
               sshape, plat, plng, etab, jnp.int32(n_pairs))


if __name__ == "__main__":
    main()
