"""Price a bf16 crossing prefilter for blanket geo (VERDICT r3 #4).

Hypothesis under test: computing the [T, E] crossing test in bf16 halves
the per-pair VPU cost, with an exact f32 recheck only for points whose
line evaluation falls inside a conservative uncertainty band.

This measures, on the real chip at the bench's scale (n=4M points,
E=3328 edges, 26 shapes):
  1. the f32 dense crossing tile (today's matched_shape inner loop)
  2. the same tile computed wholly in bf16 (accuracy aside) — the ceiling
     any prefilter scheme could reach
  3. a bf16 prefilter + banded f32 recheck variant
plus the bf16 variant's disagreement rate vs f32 (how wide the recheck
band must be).

MUST import aresdb_tpu first (x64 on, axon registered); chained >=64
iterations per dispatch.
"""

import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np

from aresdb_tpu.query import geo as G
from aresdb_tpu.utils import jax_env

jax_env.ensure()
import jax
import jax.numpy as jnp

N = 1 << 22
TILE = 1024
ITERS = 64


def chain(fn, plat, plng):
    def step(carry, _):
        m = fn(plat + (carry - carry), plng)
        r = jnp.sum(m.astype(jnp.float32))
        return (r - r) + carry, None

    f = jax.jit(lambda c: jax.lax.scan(step, c, None, length=ITERS)[0])
    c0 = jnp.float32(0)
    float(jnp.sum(f(c0)))
    t0 = time.perf_counter()
    float(jnp.sum(f(c0)))
    return (time.perf_counter() - t0) / ITERS * 1e3


def bench_shapes(rng, n_shapes=26, verts=128):
    """Same shape generator family as bench.py's geo battery: blob
    polygons tiling a [0,100]^2 field."""
    shapes = []
    for s in range(n_shapes):
        cx, cy = rng.rand(2) * 100
        r = 3 + rng.rand() * 12
        ang = np.sort(rng.rand(verts) * 2 * np.pi)
        pts = [(cy + r * (0.6 + 0.4 * rng.rand()) * np.sin(a),
                cx + r * (0.6 + 0.4 * rng.rand()) * np.cos(a))
               for a in ang]
        pts.append(pts[0])
        shapes.append([pts])
    return shapes


def main():
    rng = np.random.RandomState(7)
    shapes = bench_shapes(rng)
    batch = G.build_shape_batch(shapes, [str(i) for i in range(len(shapes))])
    e = batch.slope.shape[0]
    nb = e // G.BLOCK
    print(f"shapes {batch.n_shapes}, edges {e}")

    slope = jnp.asarray(batch.slope)
    lat1 = jnp.asarray(batch.lat1)
    lng1 = jnp.asarray(batch.lng1)
    lng2 = jnp.asarray(batch.lng2)
    onehot = jnp.asarray(batch.onehot)
    sb, l1b, g1b, g2b = (x.astype(jnp.bfloat16)
                         for x in (slope, lat1, lng1, lng2))

    plat_np = (rng.rand(N) * 100).astype(np.float32)
    plng_np = (rng.rand(N) * 100).astype(np.float32)
    plat = jnp.asarray(plat_np).reshape(N // TILE, TILE)
    plng = jnp.asarray(plng_np).reshape(N // TILE, TILE)

    def f32_tile(args):
        pla, pln = args
        plngc = pln[:, None]
        platc = pla[:, None]
        cond1 = (lng1[None, :] > plngc) != (lng2[None, :] > plngc)
        cond2 = platc < (slope[None, :] * (plngc - lng1[None, :])
                         + lat1[None, :])
        crossing = (cond1 & cond2).astype(jnp.bfloat16)
        blk = crossing.reshape(TILE, nb, G.BLOCK).sum(axis=-1)
        counts = jax.lax.dot_general(
            blk, onehot.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (counts.astype(jnp.int32) % 2) == 1

    def bf16_tile(args):
        pla, pln = args
        plngc = pln.astype(jnp.bfloat16)[:, None]
        platc = pla.astype(jnp.bfloat16)[:, None]
        cond1 = (g1b[None, :] > plngc) != (g2b[None, :] > plngc)
        cond2 = platc < (sb[None, :] * (plngc - g1b[None, :])
                         + l1b[None, :])
        crossing = (cond1 & cond2).astype(jnp.bfloat16)
        blk = crossing.reshape(TILE, nb, G.BLOCK).sum(axis=-1)
        counts = jax.lax.dot_general(
            blk, onehot.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (counts.astype(jnp.int32) % 2) == 1

    def banded_tile(args):
        """bf16 crossing everywhere; edges whose bf16 line evaluation is
        within a conservative band of the point re-test in f32."""
        pla, pln = args
        plngc = pln.astype(jnp.bfloat16)[:, None]
        platc = pla.astype(jnp.bfloat16)[:, None]
        cond1 = (g1b[None, :] > plngc) != (g2b[None, :] > plngc)
        line_b = (sb[None, :] * (plngc - g1b[None, :]) + l1b[None, :])
        # bf16 has 8 significand bits: relative error ~2^-8; band by
        # magnitude of the evaluation
        band = (jnp.abs(line_b) + jnp.bfloat16(1.0)) * jnp.bfloat16(1 / 64)
        diff = platc - line_b
        sure = jnp.abs(diff) > band
        cond2b = diff < 0
        # exact recheck lane (f32) only where unsure — but on TPU this is
        # a masked SECOND full evaluation (no gather/compaction wins at
        # this shape), so the question is whether bf16 pass 1 is cheap
        # enough to pay for itself
        plngf = pln[:, None]
        platf = pla[:, None]
        unsure = ~sure
        cond2f = platf < (slope[None, :] * (plngf - lng1[None, :])
                          + lat1[None, :])
        cond2 = jnp.where(sure, cond2b, cond2f)
        crossing = (cond1 & cond2).astype(jnp.bfloat16)
        blk = crossing.reshape(TILE, nb, G.BLOCK).sum(axis=-1)
        counts = jax.lax.dot_general(
            blk, onehot.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        del unsure
        return (counts.astype(jnp.int32) % 2) == 1

    def run(tile_fn, name):
        fn = lambda pa, pb: jax.lax.map(tile_fn, (pa, pb))
        ms = chain(fn, plat, plng)
        print(f"{name:22s} {ms:7.2f} ms/4M ({N / ms / 1e3:.0f}M pts/s)")
        return ms

    ms_f32 = run(f32_tile, "f32 dense (today)")
    ms_bf16 = run(bf16_tile, "bf16 whole (ceiling)")
    ms_band = run(banded_tile, "bf16+banded f32")

    # disagreement rate of raw bf16 vs f32 (per point-shape decisions)
    f = jax.jit(lambda pa, pb: jax.lax.map(f32_tile, (pa, pb)))
    g = jax.jit(lambda pa, pb: jax.lax.map(bf16_tile, (pa, pb)))
    h = jax.jit(lambda pa, pb: jax.lax.map(banded_tile, (pa, pb)))
    sub = slice(0, 256)  # 256 tiles = 256k points
    a = np.asarray(f(plat[sub], plng[sub]))
    b = np.asarray(g(plat[sub], plng[sub]))
    c = np.asarray(h(plat[sub], plng[sub]))
    print(f"bf16 vs f32 disagreement: {np.mean(a != b):.2e} per decision")
    print(f"banded vs f32 disagreement: {np.mean(a != c):.2e} per decision")
    print(f"speedups: bf16 {ms_f32 / ms_bf16:.2f}x, "
          f"banded {ms_f32 / ms_band:.2f}x")


if __name__ == "__main__":
    main()
