"""Fully-fused dense group-by: eval + slot map + factored MXU reduce in one
pallas kernel.

Round-2 profiling (docs/PERFORMANCE.md) showed the dense headline path at
0.52 of its own operator roofline: the fused factored reduction
(pallas_ops.factored_segment_sum_pallas) runs its MXU dots at the chip's
N=128 matmul rate, but the XLA expression-eval program in front of it
materializes slots + an 8-lane padded measure matrix to HBM (~290 MB of
round-trip traffic at n=4M) and costs ~1ms of its own. This kernel removes
that boundary for eligible plans: the staged columns stream HBM→VMEM
exactly once, and the filter/dimension/measure expression forest (the same
`kernels._emit` tracer the XLA path uses), the dense slot mapping
(`kernels.dense_slot_lane`), and the hi/lo factored one-hot MXU reduction
all run per chunk in VMEM.

Input layout (the non-MXU time is HBM-bandwidth-bound, so bytes moved is
the kernel's intercept):
- 4-byte columns (f32/u32/i32) are passed RAW — reshaped for free to
  (n_chunks, 8, t/8) tiles, zero prologue copies.
- sub-word columns (u16/u8/bool/enums) plus ALL validity bits and the
  row-count/archive-cutoff pre-mask byte-pack into shared 32-bit word
  lanes (usually one), the only array the XLA prologue materializes.
The demo headline plan (sum(fare) hour×city + status filter) moves
12 B/row through the kernel vs the old path's ~36 B/row of round trips.

Kernel structure: each chunk DMAs one (8, t/8) tile per input
(double-buffered), then runs 8 sub-steps of t/8 rows — eval, slot lane,
bf16 one-hot build, and ONE stacked [(C+1)·KHI, T] @ [T, 128] bf16 dot
whose f32 result lands in a double-buffered scratch and is accumulated one
step late (accumulate-before-issue measured 1.8x worse; Mosaic does not
otherwise overlap the MXU with neighboring chunks' DMA/VPU work).

Eligible plans: main-table scalar columns only (no joins, geo, arrays,
UUID, calendar GET_* int64 math, tz tables), affine dense domains, and an
f32 accumulator (sum float / avg / count — the reference's headline
shapes, query/time_series_aggregate.go). Everything else stays on the XLA
dense kernel; outputs are ABI- and semantics-identical (agg, cnt, rows,
overflow), with the measure channel exact to ≤2^-17 relative via the bf16
hi+lo split (see pallas_ops.py).

Mosaic gotchas encoded here (each cost a real debug cycle): trace under
enable_x64(False); integer jnp.sum traces an int64 upcast → reduce in f32;
bf16 `where` on a [KHI, T] i1 mask hits an invalid-relayout bug → build
bf16 one-hots with astype and multiply; DMA tiles need sublane-aligned
leading dims (hence the (8, t/8) row grouping).

Reference role: this is the operator stack of query/transform.cu +
query/sort_reduce.cu collapsed into a single TPU kernel.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from aresdb_tpu.utils import jax_env

jax_env.ensure()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aresdb_tpu.common import data_types as mdt
from aresdb_tpu.query import expr as E
from aresdb_tpu.query.compiler import CompiledQuery

FD_KLO = 128             # one MXU lane tile (matches pallas_ops.FP_KLO)
FD_MAX_KHI = 512         # dense.DENSE_MAX_SLOTS / 128
_PART_CH = (0, 0, 1, 2)  # dot part -> output channel (measure hi+lo, cnt, rows)
_MAX_COLS = 24
_R_SUB = 8               # sub-rows per tile: (8, t/8) tiles, 8 eval steps

_4B_DTS = (mdt.Uint32, mdt.Int32)
_2B_DTS = (mdt.Uint16, mdt.BigEnum, mdt.Int16)
_1B_DTS = (mdt.Bool, mdt.Uint8, mdt.SmallEnum, mdt.Int8)
_SIGNED_SUB = (mdt.Int16, mdt.Int8)

_ALLOWED_CALLS = (E.HOUR, E.DAY_OF_WEEK, E.CONVERT_TZ, "__numeric_bucket")

# experiment flag (read at import time): split the stacked 4-channel dot
# into four [KHI, te] @ [te, KLO] dots whose channel scale rides the
# smaller oh_lo operand — same MXU FLOPs, less VPU operand prep
_SPLIT_DOT = bool(os.environ.get("ARES_FD_SPLITDOT", ""))


@dataclass
class _Slot:
    """One sub-word column's (or the vmask's) position in the packed words."""

    col_id: int              # -1 = vmask
    word: int
    byte_off: int
    byte_width: int
    signed: bool = False


@dataclass
class FusedSpec:
    col_ids: List[int]             # all referenced main-table columns
    n_slots: int
    khi_pad: int
    raw_cols: List[int] = field(default_factory=list)   # 4-byte, passed raw
    slots: List[_Slot] = field(default_factory=list)    # sub-word packing
    n_words: int = 0
    keep_bit: int = 0              # bit index inside the vmask field
    # joined foreign columns, materialized to [n]-row lanes in the XLA
    # prologue (dense-LUT / searchsorted probe) and fed to the kernel as
    # ordinary input lanes — (table_id, column_id, data_type). Their slot
    # col_id code is -(2+j); their validity bit index is len(col_ids)+j.
    fkeys: List[Tuple[int, int, int]] = field(default_factory=list)
    raw_fidx: List[int] = field(default_factory=list)   # 4-byte foreign js


def _pack_subword(plan: CompiledQuery, col_ids: List[int],
                  sub_cols: List[int],
                  fkeys: List[Tuple[int, int, int]] = (),
                  sub_fidx: List[int] = ()) -> Tuple[List[_Slot], int, int]:
    """First-fit-decreasing byte packing of sub-word columns + vmask.

    sub_fidx: indices into fkeys whose joined lanes are sub-word; they
    pack with slot col_id -(2+j)."""
    schema = plan.main_schema.table
    items = []
    for cid in sub_cols:
        dt = schema.columns[cid].data_type
        nbytes = 2 if dt in _2B_DTS else 1
        items.append((nbytes, cid, dt in _SIGNED_SUB))
    for j in sub_fidx:
        dt = fkeys[j][2]
        nbytes = 2 if dt in _2B_DTS else 1
        items.append((nbytes, -(2 + j), dt in _SIGNED_SUB))
    vbits = len(col_ids) + len(fkeys) + 1
    vbytes = 1 if vbits <= 8 else (2 if vbits <= 16 else 4)
    items.append((vbytes, -1, False))
    items.sort(key=lambda it: -it[0])

    words: List[int] = []
    slots: List[_Slot] = []
    for nbytes, cid, signed in items:
        placed = False
        for w, used in enumerate(words):
            off = ((used + nbytes - 1) // nbytes) * nbytes  # natural align
            if off + nbytes <= 4:
                slots.append(_Slot(cid, w, off, nbytes, signed))
                words[w] = off + nbytes
                placed = True
                break
        if not placed:
            slots.append(_Slot(cid, len(words), 0, nbytes, signed))
            words.append(nbytes)
    return slots, len(words), len(col_ids) + len(fkeys)


def _domain_i32_safe(dom) -> bool:
    if dom.kind != "affine":
        return False
    if isinstance(dom.step, float) or isinstance(dom.base, float):
        return True  # float affine path computes in f32
    lo = dom.base
    hi = dom.base + dom.size * max(dom.step, 1)
    return -(2**31) < lo < 2**31 and -(2**31) < hi < 2**31


def plan_fused(plan: CompiledQuery, dense_plan) -> Optional[FusedSpec]:
    """Check kernel eligibility and build the input spec (or None)."""
    m = plan.measure
    if m is None or m.agg not in ("sum", "avg", "count"):
        return None
    if m.agg == "sum" and not m.out_float:
        return None  # integer sums keep their wide XLA accumulator
    if plan.geo is not None:
        return None
    if not plan.dimensions:
        # no-dims plans make the slot lane a replicated constant, and
        # Mosaic rejects the i1 relayout into the bf16 one-hot build
        # ("Invalid relayout ... replicated in destination"); a global
        # aggregate is a plain reduction the XLA kernel already handles
        return None
    if any(d.geo_dim for d in plan.dimensions):
        return None
    for dom in dense_plan.domains:
        if not _domain_i32_safe(dom):
            return None
    khi = (dense_plan.n_slots + FD_KLO - 1) // FD_KLO
    khi_pad = max(16, ((khi + 15) // 16) * 16)
    if khi_pad > FD_MAX_KHI:
        return None

    ok = [True]
    cols: List[int] = []
    fvars: List[Tuple[int, int, int]] = []  # (table_id, cid, data_type)
    lane_dts = _4B_DTS + _2B_DTS + _1B_DTS + (mdt.Float32,)

    def visit(node):
        if isinstance(node, E.VarRef):
            if node.data_type not in lane_dts:
                ok[0] = False
            elif node.table_id != 0:
                # joined column: the XLA prologue resolves foreign rows
                # (LUT gather / searchsorted probe) and hands the kernel a
                # materialized [n]-row lane (VERDICT r4 #4; reference role
                # query/hash_lookup.cu:69)
                key = (node.table_id, node.column_id, node.data_type)
                if key not in fvars:
                    fvars.append(key)
            elif node.column_id not in cols:
                cols.append(node.column_id)
        elif isinstance(node, E.NumberLiteral):
            if node.type != E.FLOAT and not (
                    -(2**31) <= node.int_val < 2**31):
                ok[0] = False
        elif isinstance(node, E.StringLiteral):
            ok[0] = False  # UUID literal lanes need 64-bit compares
        elif isinstance(node, E.UnaryExpr):
            if node.op.startswith("GET_"):
                ok[0] = False  # calendar math needs int64 lanes
        elif isinstance(node, E.Call):
            if node.name not in _ALLOWED_CALLS and node.name != "":
                ok[0] = False  # "" = IN-list args (expr.parse_in_list)
            if node.name == "__numeric_bucket":
                b = getattr(node, "bucketizer", None)
                if b is None or not b.bucket_width:
                    ok[0] = False  # manual partitions use searchsorted

    exprs = (list(plan.filters) + list(plan.time_filter_expr)
             + [d.expr for d in plan.dimensions] + [m.expr])
    for e in exprs:
        E.walk(e, visit)
        if not ok[0]:
            return None
    if len(cols) + len(fvars) > _MAX_COLS:
        return None
    cols = sorted(cols)
    fvars = sorted(fvars)
    schema = plan.main_schema.table
    raw_cols = [c for c in cols
                if schema.columns[c].data_type in _4B_DTS + (mdt.Float32,)]
    sub_cols = [c for c in cols if c not in raw_cols]
    raw_fidx = [j for j, (_, _, dt) in enumerate(fvars)
                if dt in _4B_DTS + (mdt.Float32,)]
    sub_fidx = [j for j in range(len(fvars)) if j not in raw_fidx]
    slots, n_words, keep_bit = _pack_subword(plan, cols, sub_cols, fvars,
                                             sub_fidx)
    # the archive-cutoff pre-mask reads the time column in the prologue; it
    # is applied only when staged, mirroring kernels._eval_common
    return FusedSpec(col_ids=cols, n_slots=dense_plan.n_slots,
                     khi_pad=khi_pad, raw_cols=raw_cols, slots=slots,
                     n_words=n_words, keep_bit=keep_bit, fkeys=fvars,
                     raw_fidx=raw_fidx)


def _row_tile(khi_pad: int, n: int) -> int:
    # sub-step size te = t/8; the stacked [(4·khi), te] bf16 W buffer is
    # the VMEM govenor: te=8192 at the headline khi (W ~7.3 MB), smaller
    # for wide slot spaces
    if os.environ.get("ARES_FD_T", ""):
        t = int(os.environ["ARES_FD_T"])
    elif khi_pad <= 128:
        t = 65536
    elif khi_pad <= 256:
        t = 32768
    else:
        t = 16384
    while t > 1024 and t // 2 >= n:
        t //= 2
    return t


def _unpack_subword(word, s: _Slot):
    """Extract one sub-word lane from its packed 32-bit word (kernel-side)."""
    if s.byte_width == 4:
        return word
    if s.signed:
        # arithmetic shifts sign-extend the sub-word field
        up = jnp.int32(32 - 8 * (s.byte_off + s.byte_width))
        return jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(word, up), jnp.int32(32 - 8 * s.byte_width))
    mask = jnp.int32((1 << (8 * s.byte_width)) - 1)
    return jax.lax.bitwise_and(
        jax.lax.shift_right_logical(word, jnp.int32(8 * s.byte_off)), mask)


def _make_kernel(plan: CompiledQuery, dense_plan, spec: FusedSpec,
                 n_chunks: int, t: int, raw_dtypes):
    from aresdb_tpu.query import kernels as K

    khi = spec.khi_pad
    te = t // _R_SUB
    n_buf = 2
    n_raw = len(spec.raw_cols) + len(spec.raw_fidx)
    n_inputs = n_raw + spec.n_words
    vslot = next(s for s in spec.slots if s.col_id == -1)
    col_slot = {s.col_id: s for s in spec.slots}

    def kernel(*refs):
        ins = refs[:n_inputs]
        out_ref, ovf_ref = refs[n_inputs], refs[n_inputs + 1]

        def body(*scoped):
            bufs = scoped[:n_inputs]
            sems, dotbuf = scoped[n_inputs], scoped[n_inputs + 1]

            def dma(j, slot, chunk):
                return pltpu.make_async_copy(
                    ins[j].at[chunk], bufs[j].at[slot], sems.at[slot, j])

            out_ref[:] = jnp.zeros_like(out_ref)
            ovf_ref[0, 0] = jnp.int32(0)
            for j in range(n_inputs):
                dma(j, jnp.int32(0), jnp.int32(0)).start()

            def loop_body(chunk, carry):
                one = jnp.int32(1)
                slot = jax.lax.rem(chunk, jnp.int32(n_buf))

                @pl.when(chunk + one < jnp.int32(n_chunks))
                def _():
                    nxt = jax.lax.rem(chunk + one, jnp.int32(n_buf))
                    for j in range(n_inputs):
                        dma(j, nxt, chunk + one).start()

                for j in range(n_inputs):
                    dma(j, slot, chunk).wait()

                for h in range(_R_SUB):
                    vword = bufs[n_raw + vslot.word][slot, h]
                    vmask = _unpack_subword(vword, vslot)
                    cols = {}
                    lane_keys = [(0, cid) for cid in spec.col_ids] + \
                        [(t_, c_) for (t_, c_, _) in spec.fkeys]
                    for i, key in enumerate(lane_keys):
                        if i < len(spec.col_ids):
                            code = spec.col_ids[i]
                            raw_j = (spec.raw_cols.index(code)
                                     if code in spec.raw_cols else None)
                        else:
                            fj = i - len(spec.col_ids)
                            code = -(2 + fj)
                            raw_j = (len(spec.raw_cols)
                                     + spec.raw_fidx.index(fj)
                                     if fj in spec.raw_fidx else None)
                        if raw_j is None:
                            s = col_slot[code]
                            v = _unpack_subword(
                                bufs[n_raw + s.word][slot, h], s)
                        else:
                            v = bufs[raw_j][slot, h]
                            if v.dtype == jnp.uint32:
                                # two's-complement reinterpret, matching
                                # kernels._emit_varref's 32-bit lanes
                                v = v.astype(jnp.int32)
                        valid = jax.lax.bitwise_and(
                            jax.lax.shift_right_logical(
                                vmask, jnp.int32(i)), jnp.int32(1)) == 1
                        cols[key] = (v, valid)
                    keep_pre = jax.lax.bitwise_and(
                        jax.lax.shift_right_logical(
                            vmask, jnp.int32(spec.keep_bit)),
                        jnp.int32(1)) == 1

                    # prejoined: foreign lanes are already row-aligned —
                    # VarRef emission must NOT re-probe the join
                    ctx = K._EvalCtx(cols, (), te, mosaic=True,
                                     prejoined=True)
                    mask = keep_pre
                    for f in plan.filters + plan.time_filter_expr:
                        fv = K._truthy(K._emit(f, ctx, plan))
                        mask = mask & fv.value & fv.valid
                    dim_vals = [K._emit(d.expr, ctx, plan)
                                for d in plan.dimensions]
                    mlane = K._measure_lane(plan, ctx)
                    slot_ix, bad = K.dense_slot_lane(dim_vals, dense_plan, te)

                    # combine keep/bad/measure-valid in INT32 multiplies
                    # and NEVER `where`-select against the measure: for
                    # count(*)'s
                    # LITERAL measure both select branches are splats, so
                    # Mosaic infers a replicated result layout and then
                    # demands the per-lane i1 condition replicated too —
                    # "Invalid relayout: ... replicated in destination but
                    # not in source", which crashed every filterless
                    # count-by-dim query on the real chip (caught by the
                    # round-4 battery gate's fused-count branch).
                    mask32 = mask.astype(jnp.int32)
                    bad32 = bad.astype(jnp.int32)
                    keep32 = mask32 * (jnp.int32(1) - bad32)
                    # f32 count reduction: integer jnp.sum traces an int64
                    # upcast internally, which Mosaic rejects; f32 is exact
                    # for sub-chunk counts <= 2^24
                    ovf_ref[0, 0] = ovf_ref[0, 0] + jnp.sum(
                        (mask32 * bad32).astype(jnp.float32)).astype(
                            jnp.int32)
                    # sl = slot when kept else -1, in pure int arithmetic
                    sl = keep32 * (slot_ix + jnp.int32(1)) - jnp.int32(1)
                    mvalid32 = mlane.valid.astype(jnp.int32) * keep32

                    # hi/lo split: sl == -1 maps to -1/-1 via sign
                    # arithmetic (no i1 select)
                    hi = jax.lax.shift_right_arithmetic(sl, 7)
                    lo = jax.lax.bitwise_or(
                        jax.lax.bitwise_and(sl, jnp.int32(127)),
                        jax.lax.shift_right_arithmetic(sl, 31))
                    # bf16 one-hots via astype (a bf16 `where` on the
                    # [khi, te] i1 mask hits a Mosaic relayout bug —
                    # multiply instead, like pallas_ops)
                    oh_hi = (jax.lax.broadcasted_iota(
                        jnp.int32, (khi, te), 0)
                        == hi[None, :]).astype(jnp.bfloat16)
                    oh_lo = (jax.lax.broadcasted_iota(
                        jnp.int32, (FD_KLO, te), 0)
                        == lo[None, :]).astype(jnp.bfloat16)

                    # measure → exact bf16 hi+lo parts. Invalid rows zero
                    # via an INTEGER multiply on the raw bit pattern
                    # (0 * bits = 0x00000000 = +0.0f) — their f32 lanes
                    # can be NaN bits, and NaN * 0.0 would stay NaN, so
                    # the scrub must happen in bit space, not value space
                    mbits = jax.lax.bitcast_convert_type(
                        mlane.value.astype(jnp.float32), jnp.int32)
                    mval = jax.lax.bitcast_convert_type(
                        mbits * mvalid32, jnp.float32)
                    vh = mval.astype(jnp.bfloat16)
                    vl = (mval - vh.astype(jnp.float32)).astype(jnp.bfloat16)
                    mvalid_bf = mvalid32.astype(jnp.bfloat16)

                    # issue this sub-step's dots into a double-buffered
                    # scratch, then accumulate the PREVIOUS one
                    # (accumulate-before-issue measured 1.8x WORSE — the
                    # scratch write after the conditional read stalls;
                    # this order lets the MXU retire the dot while the
                    # next chunk's DMA completes)
                    step = chunk * jnp.int32(_R_SUB) + jnp.int32(h)
                    dslot = jax.lax.rem(step, jnp.int32(2))
                    if _SPLIT_DOT:
                        # channel scales ride the SMALLER [KLO, te]
                        # operand — dot(oh_hi, oh_lo*s) == the stacked-W
                        # channel block, with no [4*KHI, te] concatenate
                        # and no 4x oh_hi broadcasts
                        for ci, s in enumerate((vh, vl, mvalid_bf, None)):
                            rhs = oh_lo if s is None else oh_lo * s[None, :]
                            dotbuf[dslot, ci * khi:(ci + 1) * khi] = (
                                jax.lax.dot_general(
                                    oh_hi, rhs, (((1,), (1,)), ((), ())),
                                    precision=jax.lax.Precision.DEFAULT,
                                    preferred_element_type=jnp.float32))
                    else:
                        W = jnp.concatenate(
                            [oh_hi * vh[None, :], oh_hi * vl[None, :],
                             oh_hi * mvalid_bf[None, :], oh_hi], axis=0)
                        dotbuf[dslot] = jax.lax.dot_general(
                            W, oh_lo, (((1,), (1,)), ((), ())),
                            precision=jax.lax.Precision.DEFAULT,
                            preferred_element_type=jnp.float32)  # [4KHI,KLO]

                    @pl.when(step > 0)
                    def _():
                        prev = dotbuf[jax.lax.rem(step + one, jnp.int32(2))]
                        for ci in range(4):
                            out_ref[_PART_CH[ci]] = (
                                out_ref[_PART_CH[ci]]
                                + prev[ci * khi:(ci + 1) * khi])
                return carry

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_chunks),
                              loop_body, jnp.int32(0))
            last_step = jnp.int32(n_chunks * _R_SUB - 1)
            last = dotbuf[jax.lax.rem(last_step, jnp.int32(2))]
            for ci in range(4):
                out_ref[_PART_CH[ci]] = (out_ref[_PART_CH[ci]]
                                         + last[ci * khi:(ci + 1) * khi])

        pl.run_scoped(
            body,
            *[pltpu.VMEM((n_buf, _R_SUB, te), dt) for dt in raw_dtypes],
            *[pltpu.VMEM((n_buf, _R_SUB, te), jnp.int32)
              for _ in range(spec.n_words)],
            pltpu.SemaphoreType.DMA((n_buf, n_inputs)),
            pltpu.VMEM((2, 4 * khi, FD_KLO), jnp.float32),
        )

    return kernel


def make_fused_dense_kernel(plan: CompiledQuery, n_rows: int, dense_plan,
                            spec: FusedSpec, interpret: bool = False):
    """Jitted fn(columns, foreign, n_valid, live_cutoff) -> (agg[S], cnt[S],
    rows[S], overflow) — the XLA dense kernel's exact ABI."""
    from aresdb_tpu.query import kernels as K

    schema = plan.main_schema.table
    khi_pad = spec.khi_pad
    n_slots = spec.n_slots
    t = _row_tile(khi_pad, n_rows)
    n_pad = ((n_rows + t - 1) // t) * t
    n_chunks = n_pad // t
    te = t // _R_SUB

    def _raw_dt(data_type):
        if data_type == mdt.Float32:
            return jnp.float32
        return jnp.uint32 if data_type == mdt.Uint32 else jnp.int32

    raw_dtypes = tuple(
        [_raw_dt(schema.columns[c].data_type) for c in spec.raw_cols]
        + [_raw_dt(spec.fkeys[j][2]) for j in spec.raw_fidx])

    def _tile(arr):
        if n_pad != n_rows:
            arr = jnp.concatenate(
                [arr, jnp.zeros(n_pad - n_rows, arr.dtype)])
        return arr.reshape(n_chunks, _R_SUB, te)

    def fn(columns, foreign, n_valid, live_cutoff):
        # ---- XLA prologue: ONLY the packed sub-word/validity lane (and
        # any joined foreign lanes) are materialized; 4-byte columns pass
        # through as free reshapes
        fvals = {}
        if spec.fkeys:
            # resolve foreign rows once (dense-LUT gather / sorted probe,
            # kernels._EvalCtx.foreign_row) and gather each joined column
            # into a [n]-row lane — a joined column is then just another
            # kernel input
            ctx0 = K._EvalCtx(columns, foreign, n_rows)
            for (t_, c_, _) in spec.fkeys:
                v, b = columns[(t_, c_)]
                fvals[(t_, c_)] = ctx0.foreign_column(t_, c_, plan, v, b)
        vmask = jnp.zeros(n_rows, jnp.int32)
        for i, cid in enumerate(spec.col_ids):
            _, b = columns[(0, cid)]
            vmask = vmask | (b.astype(jnp.int32) << i)
        for j, (t_, c_, _) in enumerate(spec.fkeys):
            _, b = fvals[(t_, c_)]
            vmask = vmask | (b.astype(jnp.int32)
                             << (len(spec.col_ids) + j))
        keep_pre = jnp.arange(n_rows, dtype=jnp.int32) < n_valid
        if (live_cutoff is not None and schema.is_fact_table
                and (0, 0) in columns):
            tvals, _ = columns[(0, 0)]
            keep_pre = keep_pre & (
                tvals.astype(jnp.int64)
                >= jnp.asarray(live_cutoff).astype(jnp.int64))
        vmask = vmask | (keep_pre.astype(jnp.int32) << spec.keep_bit)

        words = [jnp.zeros(n_rows, jnp.int32) for _ in range(spec.n_words)]
        for s in spec.slots:
            if s.col_id == -1:
                lane = vmask
            elif s.col_id <= -2:
                fj = -s.col_id - 2
                v, _ = fvals[spec.fkeys[fj][:2]]
                lane = v.astype(jnp.int32)
            else:
                v, _ = columns[(0, s.col_id)]
                lane = v.astype(jnp.int32)
            if s.byte_width < 4:
                lane = (lane & jnp.int32((1 << (8 * s.byte_width)) - 1)
                        ) << (8 * s.byte_off)
            words[s.word] = words[s.word] | lane

        inputs = []
        for dt, cid in zip(raw_dtypes, spec.raw_cols):
            v, _ = columns[(0, cid)]
            inputs.append(_tile(v.astype(dt)))
        for dt, fj in zip(raw_dtypes[len(spec.raw_cols):], spec.raw_fidx):
            v, _ = fvals[spec.fkeys[fj][:2]]
            inputs.append(_tile(v.astype(dt)))
        for w in words:
            inputs.append(_tile(w))

        from jax._src.config import enable_x64 as _x64_ctx

        with _x64_ctx(False):
            out, ovf = pl.pallas_call(
                _make_kernel(plan, dense_plan, spec, n_chunks, t,
                             raw_dtypes),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(inputs),
                out_specs=(
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((3, khi_pad, FD_KLO), jnp.float32),
                    jax.ShapeDtypeStruct((1, 1), jnp.int32),
                ),
                interpret=interpret,
            )(*inputs)
        out3 = out.reshape(3, khi_pad * FD_KLO)[:, :n_slots].T
        return out3[:, 0], out3[:, 1], out3[:, 2], ovf[0, 0]

    def fn_acc(columns, foreign, n_valid, live_cutoff, acc):
        # fold into the running accumulator in the SAME dispatch (the XLA
        # epilogue around the pallas call; see kernels.dense_fold_epilogue)
        from aresdb_tpu.query import kernels as K

        aggv, cnt, rows, overflow = fn(columns, foreign, n_valid,
                                       live_cutoff)
        return K.dense_fold_epilogue(plan.measure.agg, acc, aggv, cnt,
                                     rows, overflow)

    from aresdb_tpu.query.kernels import _dense_donate

    return jax.jit(fn_acc, donate_argnums=_dense_donate())


def fused_mode() -> str:
    """ARES_FUSED: "" (TPU default), "0" (off), "interp" (force the fused
    kernel in pallas interpreter mode on ANY backend — the CI variant that
    executes the TPU-default serving path on CPU, mirroring the reference's
    HOST-mode strategy: /root/reference/CMakeLists.txt:25-31)."""
    return os.environ.get("ARES_FUSED", "")


def use_fused() -> bool:
    """Fused dense kernel on real TPU backends (ARES_FUSED=0 disables,
    ARES_FUSED=interp forces interpreter mode everywhere)."""
    mode = fused_mode()
    if mode == "0":
        return False
    if mode == "interp":
        return True
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


FD_MIN_ROWS = 1 << 16   # below this the XLA dense kernel is just as fast,
                        # and tiny sub-tiles (te<1024) hit Mosaic i1
                        # relayout bugs (seen at te=128 on the 1k_trips
                        # drive: vector<128xi1> "(8,128)" -> "(16,128)")

FD_MIN_ROWS_INTERP = 64  # interpreter mode has no Mosaic tile constraints;
                         # a tiny floor lets the whole CI suite route its
                         # small batches through the fused eval/pack/slot
                         # code instead of only handcrafted plans


def maybe_make_fused_kernel(plan: CompiledQuery, n_rows: int, dense_plan):
    interp = fused_mode() == "interp"
    min_rows = FD_MIN_ROWS_INTERP if interp else FD_MIN_ROWS
    if n_rows < min_rows or not use_fused():
        return None
    spec = plan_fused(plan, dense_plan)
    if spec is None:
        return None
    return make_fused_dense_kernel(plan, n_rows, dense_plan, spec,
                                   interpret=interp)
