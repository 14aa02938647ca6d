"""Pallas TPU kernels for the hot reductions.

dense_segment_sum: the dense group-by's segment reduction as one-hot
matmuls on the MXU. XLA lowers `segment_sum` to scatter-add, which
serializes on TPU; reformulated as `values @ onehot(slots).T` the
accumulation runs on the systolic array.

The kernel is GRIDLESS: a single invocation walks the row chunks in HBM
with double-buffered async DMA (this environment's remote Mosaic compiler
rejects grid-style pallas_call lowering, and a manual pipeline is the
fully-controlled form anyway — see the double-buffering pattern in the TPU
kernel guide). The [C, K] accumulator lives in VMEM for the whole run, so
the slot space is capped at PALLAS_MAX_SLOTS; larger group tables fall back
to XLA's segment_sum.

Unit tests run the same kernel in interpreter mode on CPU (the HOST-mode
strategy of SURVEY.md §4). Measured on one v5e chip vs XLA's segment_sum at
n=4M, K=8192: 53.5ms vs 61.7ms per batch including the host round trip;
results agree to ~3e-4 relative (MXU accumulation order vs scatter order —
within the framework's float-sum tolerance policy).
"""

from __future__ import annotations

import functools

from aresdb_tpu.utils import jax_env

jax_env.ensure()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 1024
SLOT_TILE = 512
LANE_PAD = 8              # value lanes padded for MXU-friendly shapes
PALLAS_MAX_SLOTS = 8192   # above this the O(n*K) one-hot compares lose to
                          # XLA's scatter path (measured on v5e)


def _chunk_pump(slots_hbm, values_hbm, out_ref, n_chunks: int, t: int,
                c_rows: int, compute):
    """Shared double-buffered HBM→VMEM chunk pump: prefetches chunk k+1
    while `compute(slots_tile, values_tile)` accumulates chunk k into
    out_ref. slots tiles are (1, t) int32, value tiles (c_rows, t) f32.

    All index math stays int32: the framework enables x64 and both
    Mosaic's memref slicing and its i64<->i32 conversion lowering
    reject/loop on 64-bit indices.
    """
    n_buf = 2

    def body(slot_buf, val_buf, sems):
        def start_dma(slot, chunk):
            pltpu.make_async_copy(
                slots_hbm.at[chunk], slot_buf.at[slot],
                sems.at[slot, 0]).start()
            pltpu.make_async_copy(
                values_hbm.at[:, pl.ds(chunk * jnp.int32(t), t)],
                val_buf.at[slot], sems.at[slot, 1]).start()

        def wait_dma(slot, chunk):
            pltpu.make_async_copy(
                slots_hbm.at[chunk], slot_buf.at[slot],
                sems.at[slot, 0]).wait()
            pltpu.make_async_copy(
                values_hbm.at[:, pl.ds(chunk * jnp.int32(t), t)],
                val_buf.at[slot], sems.at[slot, 1]).wait()

        out_ref[:] = jnp.zeros_like(out_ref)
        start_dma(jnp.int32(0), jnp.int32(0))

        def loop_body(chunk, carry):
            one = jnp.int32(1)
            nb = jnp.int32(n_buf)
            slot = jax.lax.rem(chunk, nb)

            @pl.when(chunk + one < jnp.int32(n_chunks))
            def _():
                start_dma(jax.lax.rem(chunk + one, nb), chunk + one)

            wait_dma(slot, chunk)
            compute(slot_buf[slot], val_buf[slot])
            return carry

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_chunks),
                          loop_body, jnp.int32(0))

    pl.run_scoped(
        body,
        slot_buf=pltpu.VMEM((n_buf, 1, t), jnp.int32),
        val_buf=pltpu.VMEM((n_buf, c_rows, t), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((n_buf, 2)),
    )


def _make_kernel(n_chunks: int, k_pad: int, c_pad: int):
    def kernel(slots_hbm, values_hbm, out_ref):
        def compute(slots, values):
            # slots (1, T) int32; values (C, T) f32
            for kt in range(k_pad // SLOT_TILE):
                local = jax.lax.broadcasted_iota(
                    jnp.int32, (SLOT_TILE, ROW_TILE), 0) + kt * SLOT_TILE
                onehot_t = (slots == local).astype(jnp.float32)  # [KT, T]
                contrib = jax.lax.dot_general(
                    values, onehot_t,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [C, KT]
                cur = out_ref[:, pl.ds(kt * SLOT_TILE, SLOT_TILE)]
                out_ref[:, pl.ds(kt * SLOT_TILE, SLOT_TILE)] = cur + contrib

        _chunk_pump(slots_hbm, values_hbm, out_ref, n_chunks, ROW_TILE,
                    c_pad, compute)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_slots", "interpret"))
def dense_segment_sum(slots, values, n_slots: int, interpret: bool = False):
    """segment-sum values[n, C] by slots[n] into [n_slots, C] on the MXU.

    slots outside [0, n_slots) are dropped (the caller's overflow slot).
    """
    n = slots.shape[0]
    c = values.shape[1]
    if n == 0:
        # the kernel's unconditional first DMA would read a zero-length
        # leading dim and never be awaited
        return jnp.zeros((n_slots, c), jnp.float32)
    n_pad = ((n + ROW_TILE - 1) // ROW_TILE) * ROW_TILE
    c_pad = max(LANE_PAD, ((c + LANE_PAD - 1) // LANE_PAD) * LANE_PAD)
    k_pad = ((n_slots + SLOT_TILE - 1) // SLOT_TILE) * SLOT_TILE
    n_chunks = n_pad // ROW_TILE

    slots_p = jnp.full(n_pad, -1, jnp.int32).at[:n].set(
        slots.astype(jnp.int32)).reshape(n_chunks, 1, ROW_TILE)
    values_p = jnp.zeros((c_pad, n_pad), jnp.float32).at[:c, :n].set(
        values.astype(jnp.float32).T)

    # trace the kernel with x64 disabled: under jax_enable_x64 even static
    # slice sizes lower as i64 index constants, which Mosaic's memref ops
    # reject; all kernel dtypes are explicitly 32-bit anyway
    from jax._src.config import enable_x64 as _x64_ctx

    with _x64_ctx(False):
        out = pl.pallas_call(
            _make_kernel(n_chunks, k_pad, c_pad),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c_pad, k_pad), jnp.float32),
            interpret=interpret,
        )(slots_p, values_p)
    return out[:c, :n_slots].T


def use_pallas(n_slots: int = 0) -> bool:
    """Pallas path enabled on real TPU backends (ARES_PALLAS=0 disables,
    ARES_PALLAS=1 forces interpreter mode elsewhere for testing)."""
    import os

    if n_slots > PALLAS_MAX_SLOTS:
        return False
    flag = os.environ.get("ARES_PALLAS", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


# ---------------------------------------------------------------------------
# factored hi/lo segment sum — the fastest dense reduction on TPU
# ---------------------------------------------------------------------------
#
# result[c, hi, lo] = Σ_rows values[row, c] · onehot_hi[row, hi] ·
# onehot_lo[row, lo] with slot = hi*KLO + lo. The O(n·K) one-hot COMPARES of
# the direct formulation collapse to O(n·(KHI+KLO)) — 32× fewer at K=8192 —
# while the O(n·K·C) accumulation stays on the MXU as
# [C·KHI, T] @ [T, KLO] matmuls per row chunk. Measured on one v5e chip at
# n=4M, C=3 (chained iterations, single device sync):
#
#     K        XLA scatter   pallas one-hot   factored
#     1024        30.2ms          —             12.5ms
#     8192        30.1ms        27.1ms          10.9ms
#     16384       30.1ms          —             12.2ms
#     65536       73.5ms          —             14.7ms
#
# so the factored path wins at every dense slot count (dense mode caps at
# 65536 slots) and replaces both alternatives on TPU.

FACTORED_ROW_CHUNK = 1 << 15


def _factored_klo(n_slots: int) -> int:
    return 512 if n_slots > 16384 else 256


def factored_segment_sum_indicator(slots, values, n_slots: int,
                                   ones_channels: tuple = ()):
    """factored_segment_sum for the engine's standard channel layout:
    channel 0 is an arbitrary f32 measure, channels 1+ hold ONLY 0/1
    count/presence indicators. Under that contract the fused pallas
    kernel (bf16 hi/lo split on channel 0, single-pass bf16 on the
    indicator channels) is exact to <=2^-17 relative, so TPU backends
    route there; anything else must call factored_segment_sum, which
    keeps f32-exact HIGH-precision passes for every channel.

    ones_channels: channels statically known to be ALL-ONES rows (count
    channels) — the kernel skips their multiply and, for channel 0, the
    hi/lo split entirely (the one-hot is already the exact operand)."""
    if _pallas_factored_ok(n_slots):
        return factored_segment_sum_pallas(slots, values, n_slots,
                                           interpret=_pallas_interp(),
                                           ones_channels=ones_channels)
    return factored_segment_sum(slots, values, n_slots)


@functools.partial(jax.jit, static_argnames=("n_slots",))
def factored_segment_sum(slots, values, n_slots: int):
    """segment-sum values[n, C] by slots[n] into [n_slots, C] via factored
    one-hot outer products on the MXU. slots < 0 are dropped. All channels
    accumulate with f32-exact (bf16x3) products — generic contract; the
    engine's hot paths use factored_segment_sum_indicator instead."""
    n = slots.shape[0]
    c = values.shape[1]
    klo = _factored_klo(n_slots)
    khi = (n_slots + klo - 1) // klo
    t = min(FACTORED_ROW_CHUNK, n)
    n_pad = ((n + t - 1) // t) * t
    slots = slots.astype(jnp.int32)
    values = values.astype(jnp.float32)
    if n_pad != n:
        slots = jnp.full(n_pad, -1, jnp.int32).at[:n].set(slots)
        values = jnp.zeros((n_pad, c), jnp.float32).at[:n].set(values)
    hi = jnp.where(slots < 0, -1, slots // klo)
    lo = slots % klo

    def body(acc, xs):
        s_hi, s_lo, v = xs
        oh_hi = (s_hi[:, None] == jnp.arange(khi, dtype=jnp.int32)
                 ).astype(jnp.float32)
        oh_lo = (s_lo[:, None] == jnp.arange(klo, dtype=jnp.int32)
                 ).astype(jnp.float32)
        w = (oh_hi[:, None, :] * v[:, :, None]).reshape(t, c * khi)
        # Precision.HIGH (bf16x3 passes): f32-exact products (~1e-6 rel on
        # 4M-row sums) for ~10% over single-pass bf16, which silently
        # rounds the measure values to bf16 (2.5e-4 rel) — measured 11.7ms
        # vs 10.6ms at n=4M K=8192 on one v5e chip
        return acc + jax.lax.dot_general(
            w, oh_lo, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32), None

    xs = (hi.reshape(-1, t), lo.reshape(-1, t), values.reshape(-1, t, c))
    acc, _ = jax.lax.scan(body, jnp.zeros((c * khi, klo), jnp.float32), xs)
    return acc.reshape(c, khi * klo)[:, :n_slots].T


# ---------------------------------------------------------------------------
# fused factored reduction — one-hots built in VMEM, never touching HBM
# ---------------------------------------------------------------------------
#
# The XLA factored_segment_sum above materializes its [n, KLO] / [n, C·KHI]
# one-hot operands in HBM (~5 GB of traffic at n=4M, K=8k), which bounds it
# at ~11ms. This kernel builds both one-hots per row chunk in VMEM and runs
# the same hi/lo outer-product dots there, so HBM traffic collapses to the
# input scan (~80 MB). KLO is fixed at 128 — exactly one MXU lane tile, no
# N-padding waste — and KHI streams through the MXU M dimension.
#
# MXU passes are the cost: a naive f32-HIGHEST dot is 6 bf16 passes per
# channel. Instead the measure channel is split into bf16 hi + lo parts
# (2 exact single passes, ≤2^-17 relative representation error — below the
# f32 accumulation noise of the sums themselves), the 0/1 indicator
# channels are bf16-exact single passes, and ALL channel rows are stacked
# into ONE [(C+1)·KHI, T] @ [T, 128] bf16 dot per chunk: 8 passes → 4 in a
# single MXU dispatch. Measured on one v5e chip at n=4M, C=3, K=13.3k:
# 4.5ms vs 9.0ms for the XLA factored path (HIGH, bf16x3).

FP_KLO = 128
FP_MAX_KHI = 512          # dense.DENSE_MAX_SLOTS/128; VMEM sized via T below


def _fp_row_tile(khi: int, n: int = 1 << 30) -> int:
    # per-chunk VMEM is ~(4·KHI + 320)·T bytes (bf16 oh_hi + w temp +
    # oh_lo + double-buffered input tiles) and must fit ~16MB; bigger
    # tiles amortize the per-chunk one-hot build against the MXU dots
    # (measured on v5e at KHI=112: 4096→3.7ms, 16384→3.3ms per 4M batch)
    if khi <= 128:
        t = 16384
    elif khi <= 256:
        t = 8192
    else:
        t = 4096
    # don't pad tiny batches up to a huge tile
    while t > 1024 and t // 2 >= n:
        t //= 2
    return t


def _make_factored_pallas_kernel(n_chunks: int, khi: int, c: int, t: int,
                                 ones_channels: tuple = ()):
    klo = FP_KLO

    def kernel(slots_hbm, values_hbm, out_ref):
        def compute(slots, values):
            # slots (1, T) int32; values (C_pad, T) f32
            neg = slots < 0
            hi = jnp.where(neg, jnp.int32(-1),
                           jax.lax.shift_right_logical(slots, 7))
            lo = jnp.where(neg, jnp.int32(-1),
                           jax.lax.bitwise_and(slots, jnp.int32(127)))
            # bf16 one-hots are exact (0/1); the measure's exactness comes
            # from splitting the VALUE into bf16 hi+lo parts first — a 0/1
            # one-hot times a bf16 part stays bf16-exact
            oh_hi = (jax.lax.broadcasted_iota(jnp.int32, (khi, t), 0)
                     == hi).astype(jnp.bfloat16)    # [KHI, T]
            oh_lo = (jax.lax.broadcasted_iota(jnp.int32, (klo, t), 0)
                     == lo).astype(jnp.bfloat16)    # [KLO, T]

            parts = []  # (w [KHI, T] bf16, output channel)
            if 0 in ones_channels:
                # all-ones measure: oh_hi IS the weighted operand
                parts.append((oh_hi, 0))
            else:
                v0 = values[0, :]
                vh = v0.astype(jnp.bfloat16)
                vl = (v0 - vh.astype(jnp.float32)).astype(jnp.bfloat16)
                parts.append((oh_hi * vh[None, :], 0))
                parts.append((oh_hi * vl[None, :], 0))
            for ci in range(1, c):
                if ci in ones_channels:
                    parts.append((oh_hi, ci))
                else:
                    parts.append(
                        (oh_hi * values[ci, :].astype(jnp.bfloat16)[None, :],
                         ci))
            for w, ci in parts:
                contrib = jax.lax.dot_general(
                    w, oh_lo, (((1,), (1,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)  # [KHI, KLO]
                out_ref[ci] = out_ref[ci] + contrib

        _chunk_pump(slots_hbm, values_hbm, out_ref, n_chunks, t,
                    max(c, LANE_PAD), compute)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_slots", "interpret",
                                              "ones_channels"))
def factored_segment_sum_pallas(slots, values, n_slots: int,
                                interpret: bool = False,
                                ones_channels: tuple = ()):
    """Fused VMEM-resident factored segment sum (see block comment above).

    Same contract as factored_segment_sum: values[n, C] summed by slots[n]
    into [n_slots, C]; slots < 0 are dropped. Channel 0 (the measure)
    accumulates via an exact bf16 hi/lo split (≤2^-17 relative error);
    channels 1+ must hold bf16-exact values (the engine's 0/1
    count/presence indicators) — they run single-pass. Channels listed in
    ones_channels must be all-ones; they skip their multiply (and the
    channel-0 split) exactly.
    """
    n = slots.shape[0]
    c = values.shape[1]
    if n == 0:
        # the kernel's unconditional first DMA would read a zero-length
        # leading dim and never be awaited
        return jnp.zeros((n_slots, c), jnp.float32)
    klo = FP_KLO
    khi = (n_slots + klo - 1) // klo
    khi_pad = max(16, ((khi + 15) // 16) * 16)   # bf16 sublane tile
    t = _fp_row_tile(khi_pad, n)
    n_pad = ((n + t - 1) // t) * t
    n_chunks = n_pad // t
    c_pad = max(c, LANE_PAD)

    slots_p = jnp.full(n_pad, -1, jnp.int32).at[:n].set(
        slots.astype(jnp.int32)).reshape(n_chunks, 1, t)
    values_p = jnp.zeros((c_pad, n_pad), jnp.float32).at[:c, :n].set(
        values.astype(jnp.float32).T)

    from jax._src.config import enable_x64 as _x64_ctx

    with _x64_ctx(False):
        out = pl.pallas_call(
            _make_factored_pallas_kernel(n_chunks, khi_pad, c, t,
                                         ones_channels),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c, khi_pad, klo), jnp.float32),
            interpret=interpret,
        )(slots_p, values_p)
    return out.reshape(c, khi_pad * klo)[:, :n_slots].T


def _pallas_interp() -> bool:
    """ARES_FUSED=interp also routes the factored reduction's pallas kernel
    through interpreter mode, so the CI variant executes the SAME kernel
    code a real TPU serves (see fused_dense.fused_mode)."""
    import os

    return os.environ.get("ARES_FUSED", "") == "interp"


def _pallas_factored_ok(n_slots: int) -> bool:
    """Route factored_segment_sum through the fused pallas kernel on real
    TPU backends (ARES_FACTORED_PALLAS=0 disables, ARES_FUSED=interp forces
    interpreter mode on any backend)."""
    import os

    if os.environ.get("ARES_FACTORED_PALLAS", "") == "0":
        return False
    if (n_slots + FP_KLO - 1) // FP_KLO > FP_MAX_KHI:
        return False
    if _pallas_interp():
        return True
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


def use_factored(n_slots: int = 0) -> bool:
    """Factored MXU reduction on real TPU backends for any dense slot count
    (ARES_FACTORED=0 falls back to use_pallas()/scatter, =1 forces it on;
    ARES_FUSED=interp forces it so the CI variant runs the TPU-default
    reduction stack end to end)."""
    import os

    flag = os.environ.get("ARES_FACTORED", "")
    if flag == "0":
        return False
    if flag == "1" or _pallas_interp():
        return True
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False
