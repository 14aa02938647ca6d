"""On-chip cost breakdown of the true-hicard sort path (VERDICT r3 #3).

Times each stage of the packed-sort pipeline separately at n=4M on the
real TPU, chained >=64 steps per dispatch (CLAUDE.md: single dispatches
cost ~27ms of tunnel round trip). MUST import aresdb_tpu first — x64 on,
axon registered — or numbers don't transfer.
"""

import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np

from aresdb_tpu import demo
from aresdb_tpu.query import kernels as K
from aresdb_tpu.utils import jax_env

jax_env.ensure()
import jax
import jax.numpy as jnp

N = 1 << 22
ITERS = 64
KG = 1 << 15


def chain(body, args, reduce_out):
    """Chained timing: carry a scalar data dependency through ITERS calls.

    The body MUST mix `carry` into its inputs or XLA hoists the whole
    computation out of the scan (CLAUDE.md: only IEEE-unfoldable float
    injection survives — `x + (carry - carry)`)."""
    def step(carry, _):
        out = body(*args, carry)
        r = reduce_out(out)
        return (r - r) + carry, None

    fn = jax.jit(lambda c: jax.lax.scan(step, c, None, length=ITERS)[0])
    c0 = jnp.float32(0)
    float(jnp.sum(fn(c0)))  # compile + warm
    t0 = time.perf_counter()
    float(jnp.sum(fn(c0)))
    dt = (time.perf_counter() - t0) / ITERS
    return dt * 1e3


def _mix_f32(x, carry):
    """IEEE-unfoldable carry injection into a float array."""
    return x + (carry - carry)


def _mix_u64(x, carry):
    """Carry injection for integer arrays: add a f32-roundtripped zero the
    compiler cannot fold (carry - carry could be NaN for inf carries)."""
    if carry is None:
        return x
    z = (carry - carry).astype(jnp.float32)
    return x + z.astype(x.dtype)


def main():
    q = dict(demo.DEMO_QUERY)
    q["dimensions"] = [{"sqlExpression": "fare"}]
    plan = demo.demo_plan(q)
    cols_np, _ = demo.demo_columns(plan, N)
    columns = {k: (jnp.asarray(v), jnp.asarray(b))
               for k, (v, b) in cols_np.items()}
    nv = np.int32(N)

    # stage A: eval + key pack only
    def eval_pack(columns, carry):
        if carry is not None:
            v, ok = columns[(0, plan.main_schema.column_id("fare"))]
            columns = dict(columns)
            columns[(0, plan.main_schema.column_id("fare"))] = (
                _mix_f32(v, carry), ok)
        ctx = K._EvalCtx(columns, (), N)
        mask, dim_vals = K._eval_common(plan, ctx, nv, None)
        mlane = K._measure_lane(plan, ctx)
        ptypes = [K._packing_type(d) for d in plan.dimensions]
        keys = K.pack_dim_keys(dim_vals, ptypes, mask)
        return keys, mlane.value, mlane.valid

    ms = chain(lambda c1, c2: eval_pack(c1, c2), (columns,),
               lambda out: jnp.sum(out[0].astype(jnp.float32)))
    print(f"eval+pack:           {ms:7.2f} ms")

    # materialize packed inputs once for the post-eval stages
    keys, mval, mvalid = jax.jit(lambda c: eval_pack(c, None))(columns)
    keys, mval, mvalid = (jnp.asarray(np.asarray(keys)),
                          jnp.asarray(np.asarray(mval)),
                          jnp.asarray(np.asarray(mvalid)))
    kmin = np.uint64(np.asarray(keys)[np.asarray(keys) != np.uint64(0xFFFFFFFFFFFFFFFF)].min()) \
        if np.asarray(keys).dtype == np.uint64 else None
    arr = np.asarray(keys)
    sentv = np.uint64(0xFFFFFFFFFFFFFFFF) if arr.dtype == np.uint64 \
        else np.uint32(0xFFFFFFFF)
    live = arr != sentv
    print(f"key dtype {arr.dtype}, live {live.sum()}, "
          f"range {int(arr[live].max() - arr[live].min()):#x}")

    # stage B: the packed single-operand sort alone
    def sort_only(keys, mval, mvalid, carry):
        if carry is not None:
            mval = _mix_f32(mval, carry)
        k64 = keys.astype(jnp.uint64)
        live = k64 != jnp.uint64(0xFFFFFFFFFFFFFFFF)
        kmin = jnp.min(jnp.where(live, k64, jnp.uint64(0xFFFFFFFFFFFFFFFF)))
        bits = jax.lax.bitcast_convert_type(
            mval, jnp.uint32).astype(jnp.uint64)
        packed = (((k64 - kmin) << jnp.uint64(33))
                  | (mvalid.astype(jnp.uint64) << jnp.uint64(32)) | bits)
        packed = jnp.where(live, packed, jnp.uint64(0xFFFFFFFFFFFFFFFF))
        (sp,) = jax.lax.sort((packed,), num_keys=1, is_stable=False)
        return (sp,)

    ms = chain(sort_only, (keys, mval, mvalid),
               lambda out: jnp.sum(out[0].astype(jnp.float32)))
    print(f"pack+sort (1-op):    {ms:7.2f} ms")

    # stage B2: the 2-operand folded sort (what krange >= 2^30 runs today)
    def sort_folded(keys, mval, mvalid, carry):
        mval = _mix_f32(mval, carry)
        k64 = keys.astype(jnp.uint64)
        live = k64 != jnp.uint64(0xFFFFFFFFFFFFFFFF)
        k2 = (k64 << jnp.uint64(1)) | mvalid.astype(jnp.uint64)
        k2 = jnp.where(live, k2, jnp.uint64(0xFFFFFFFFFFFFFFFF))
        sk2, vals = jax.lax.sort((k2, mval), num_keys=1, is_stable=False)
        return sk2, vals

    # reduce over BOTH outputs: consuming only sk2 lets XLA DCE the
    # payload lane, which removes the carry dependency and hoists the sort
    ms = chain(sort_folded, (keys, mval, mvalid),
               lambda out: (jnp.sum(out[0].astype(jnp.float32))
                            + jnp.sum(out[1])))
    print(f"fold+sort (2-op):    {ms:7.2f} ms")

    # stage C: everything AFTER the sort (marks, boundaries, segment sums,
    # group table) on a presorted array
    sp = np.sort(np.asarray(jax.jit(
        lambda a, b, c: sort_only(a, b, c, None))(keys, mval, mvalid)[0]))
    sp = jnp.asarray(sp)

    def post_sort(sp, carry):
        sp = _mix_u64(sp, carry)
        live_s = sp != jnp.uint64(0xFFFFFFFFFFFFFFFF)
        skeys = jnp.where(live_s, sp >> jnp.uint64(33), jnp.uint64(0xFFFFFFFFFFFFFFFF))
        mv = (((sp >> jnp.uint64(32)) & jnp.uint64(1)) != 0) & live_s
        vals = jax.lax.bitcast_convert_type(
            (sp & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), jnp.float32)
        first = jnp.concatenate(
            [jnp.ones(1, jnp.bool_), skeys[1:] != skeys[:-1]])
        sent_start = jnp.sum(live_s.astype(jnp.int32))
        starts = K.sorted_starts_marks(first, KG + 1, N, sent_start)
        ends = jnp.concatenate([starts[1:], jnp.array([N], jnp.int32)])
        ones = jnp.where(mv, jnp.float32(1), jnp.float32(0))
        contrib = jnp.where(mv, vals, jnp.float32(0))
        stacked = jnp.stack([contrib, ones], axis=1)
        both = K.sorted_segment_sum(stacked, KG + 1, starts, ends)
        return (both,)

    ms = chain(post_sort, (sp,), lambda out: jnp.sum(out[0]))
    print(f"post-sort reduce:    {ms:7.2f} ms")

    # post-sort sub-stages
    def unpack_only(sp, carry):
        sp = _mix_u64(sp, carry)
        live_s = sp != jnp.uint64(0xFFFFFFFFFFFFFFFF)
        skeys = jnp.where(live_s, sp >> jnp.uint64(33),
                          jnp.uint64(0xFFFFFFFFFFFFFFFF))
        mv = (((sp >> jnp.uint64(32)) & jnp.uint64(1)) != 0) & live_s
        vals = jax.lax.bitcast_convert_type(
            (sp & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), jnp.float32)
        return skeys, mv, vals

    ms = chain(unpack_only, (sp,),
               lambda out: (jnp.sum(out[0].astype(jnp.float32))
                            + jnp.sum(out[2])))
    print(f"  unpack only:       {ms:7.2f} ms")

    def marks_only(sp, carry):
        skeys, mv, vals = unpack_only(sp, carry)
        live_s = skeys != jnp.uint64(0xFFFFFFFFFFFFFFFF)
        first = jnp.concatenate(
            [jnp.ones(1, jnp.bool_), skeys[1:] != skeys[:-1]])
        sent_start = jnp.sum(live_s.astype(jnp.int32))
        starts = K.sorted_starts_marks(first, KG + 1, N, sent_start)
        return (starts,)

    ms = chain(marks_only, (sp,),
               lambda out: jnp.sum(out[0].astype(jnp.float32)))
    print(f"  unpack+marks:      {ms:7.2f} ms")

    # segment sum alone on precomputed starts/ends/values
    st = np.asarray(jax.jit(lambda a: marks_only(a, None))(sp)[0])
    ends_np = np.concatenate([st[1:], [N]]).astype(np.int32)
    starts_j, ends_j = jnp.asarray(st), jnp.asarray(ends_np)
    vals_j = jnp.asarray(np.random.RandomState(0)
                         .rand(N, 2).astype(np.float32))

    def segsum_only(vals, starts, ends, carry):
        vals = _mix_f32(vals, carry)
        return (K.sorted_segment_sum(vals, KG + 1, starts, ends),)

    ms = chain(segsum_only, (vals_j, starts_j, ends_j),
               lambda out: jnp.sum(out[0]))
    print(f"  segment-sum only:  {ms:7.2f} ms")

    # full path for reference
    def full(columns, carry):
        v, ok = columns[(0, plan.main_schema.column_id("fare"))]
        columns = dict(columns)
        columns[(0, plan.main_schema.column_id("fare"))] = (
            _mix_f32(v, carry), ok)
        return K.agg_batch_body(plan, N, KG, columns, (), nv)

    ms = chain(full, (columns,), lambda out: jnp.sum(out[3]))
    print(f"full agg_batch_body: {ms:7.2f} ms "
          f"({N / ms / 1e3:.0f}M rows/s)")


if __name__ == "__main__":
    main()
