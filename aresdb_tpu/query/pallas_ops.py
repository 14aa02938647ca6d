"""Pallas TPU kernels for the hot reductions.

dense_segment_sum: the dense group-by's segment reduction as a tiled
one-hot matmul on the MXU. XLA lowers `segment_sum` to scatter-add, which
serializes on TPU; reformulated as `onehot(slots).T @ values` per
(row-tile, slot-tile) the accumulation runs on the systolic array:

    grid (k_tiles, row_tiles)             # k outer so output revisits blocks
    onehot[T, KT] = slots_tile[:,None] == slot_iota[None,:]
    out[KT, C]   += onehot.T @ values_tile   (jnp.dot → MXU)

The output block for a given k-tile is revisited across row tiles (TPU grids
execute sequentially), so accumulation into out_ref is race-free.

Used on the TPU backend; unit tests run the same kernel in interpreter mode
on CPU (the HOST-mode strategy of SURVEY.md §4).
"""

from __future__ import annotations

import functools

import numpy as np

from aresdb_tpu.utils import jax_env

jax_env.ensure()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 1024
SLOT_TILE = 512
LANE_PAD = 8  # value lanes padded for MXU-friendly shapes


def _kernel(slots_ref, values_ref, out_ref):
    kt = pl.program_id(0)
    rt = pl.program_id(1)

    @pl.when(rt == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    slots = slots_ref[:]                       # [T] int32 (global slot ids)
    base = kt * SLOT_TILE
    local = jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, SLOT_TILE), 1)
    onehot = (slots[:, None] - base) == local  # [T, KT]
    contrib = jnp.dot(onehot.astype(jnp.float32).T, values_ref[:],
                      preferred_element_type=jnp.float32)  # [KT, C]
    out_ref[:] += contrib


@functools.partial(jax.jit, static_argnames=("n_slots", "interpret"))
def dense_segment_sum(slots, values, n_slots: int, interpret: bool = False):
    """segment-sum values[n, C] by slots[n] into [n_slots, C] on the MXU.

    slots outside [0, n_slots) are dropped (the caller's overflow slot).
    n and C are padded internally; n_slots is rounded up to SLOT_TILE.
    """
    n = slots.shape[0]
    c = values.shape[1]
    n_pad = ((n + ROW_TILE - 1) // ROW_TILE) * ROW_TILE
    c_pad = max(LANE_PAD, ((c + LANE_PAD - 1) // LANE_PAD) * LANE_PAD)
    k_pad = ((n_slots + SLOT_TILE - 1) // SLOT_TILE) * SLOT_TILE

    slots_p = jnp.full(n_pad, -1, jnp.int32).at[:n].set(
        slots.astype(jnp.int32))
    values_p = jnp.zeros((n_pad, c_pad), jnp.float32).at[:n, :c].set(
        values.astype(jnp.float32))

    out = pl.pallas_call(
        _kernel,
        grid=(k_pad // SLOT_TILE, n_pad // ROW_TILE),
        in_specs=[
            pl.BlockSpec((ROW_TILE,), lambda kt, rt: (rt,)),
            pl.BlockSpec((ROW_TILE, c_pad), lambda kt, rt: (rt, 0)),
        ],
        out_specs=pl.BlockSpec((SLOT_TILE, c_pad), lambda kt, rt: (kt, 0)),
        out_shape=jax.ShapeDtypeStruct((k_pad, c_pad), jnp.float32),
        interpret=interpret,
    )(slots_p, values_p)
    return out[:n_slots, :c]


def use_pallas() -> bool:
    """Pallas path enabled on real TPU backends (ARES_PALLAS=0 disables,
    ARES_PALLAS=1 forces interpreter mode elsewhere for testing)."""
    import os

    flag = os.environ.get("ARES_PALLAS", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False
