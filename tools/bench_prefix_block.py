"""Price _PREFIX_BLOCK (L) for the post-sort reduce at hicard shape.

Window work (marks gather + segment-sum head/tail masked sums) scales
with num*L; block-prefix work scales with n/L. At n=4M, num=32k the
default L=512 puts ~134MB*2 of window gathers on the hot path — this
sweeps L to find the knee. Chained dispatch, real TPU.
"""

import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np

from aresdb_tpu.query import kernels as K
from aresdb_tpu.utils import jax_env

jax_env.ensure()
import jax
import jax.numpy as jnp

N = 1 << 22
ITERS = 64
KG = 1 << 15


def chain(body, args):
    def step(carry, _):
        out = body(*args, carry)
        r = jnp.sum(out[0])
        return (r - r) + carry, None

    fn = jax.jit(lambda c: jax.lax.scan(step, c, None, length=ITERS)[0])
    c0 = jnp.float32(0)
    float(jnp.sum(fn(c0)))
    t0 = time.perf_counter()
    float(jnp.sum(fn(c0)))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    rng = np.random.RandomState(3)
    # sorted keys with ~1.3M distinct over 4M rows, ~32% live (bench shape)
    raw = np.sort(rng.randint(0, 1 << 22, N).astype(np.uint64))
    live = np.arange(N) < int(N * 0.32)
    sp = np.where(live, (raw << np.uint64(32)) | 0x3F800000,
                  np.uint64(0xFFFFFFFFFFFFFFFF))
    sp = np.sort(sp)
    spj = jnp.asarray(sp)

    def post_sort(sp, carry):
        z = (carry - carry).astype(jnp.float32)
        live_s = sp != jnp.uint64(0xFFFFFFFFFFFFFFFF)
        skeys = jnp.where(live_s, sp >> jnp.uint64(32),
                          jnp.uint64(0xFFFFFFFFFFFFFFFF))
        vals = jax.lax.bitcast_convert_type(
            (sp & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
            jnp.float32) + z
        mv = live_s
        first = jnp.concatenate(
            [jnp.ones(1, jnp.bool_), skeys[1:] != skeys[:-1]])
        sent_start = jnp.sum(live_s.astype(jnp.int32))
        starts = K.sorted_starts_marks(first, KG + 1, N, sent_start)
        ends = jnp.concatenate([starts[1:], jnp.array([N], jnp.int32)])
        ones = jnp.where(mv, jnp.float32(1), jnp.float32(0))
        contrib = jnp.where(mv, vals, jnp.float32(0))
        stacked = jnp.stack([contrib, ones], axis=1)
        return (K.sorted_segment_sum(stacked, KG + 1, starts, ends),)

    for L in (512, 256, 128, 64):
        K._PREFIX_BLOCK = L
        ms = chain(post_sort, (spj,))
        print(f"L={L:4d}: post-sort {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
