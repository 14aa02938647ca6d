"""Intra-query multi-chip execution via shard_map over a device mesh.

The reference's multi-GPU story is query-level only (DeviceManager assigns a
whole query to one GPU, query/device_manager.go:56); its horizontal scaling
is broker scatter-gather over datanodes (broker/query_plan_agg.go). The TPU
rebuild goes further: a single query's batch rows are sharded over the mesh's
'shard' axis, each chip builds a partial fixed-capacity group table with the
same fused kernel as the single-chip path, the K-row tables are all-gathered
over ICI, and the final reduce_by_key merge runs replicated — so one query
uses every chip, with only O(devices × K) bytes crossing the interconnect.

This mirrors the scatter-gather + merge-lattice roles (BlockingScanNode →
MergeNode) in one compiled XLA program with collectives instead of RPC.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from aresdb_tpu.utils import jax_env

jax_env.ensure()

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aresdb_tpu.query import kernels as K
from aresdb_tpu.query.compiler import CompiledQuery

SHARD_AXIS = "shard"


def _shard_map(f, *, mesh, in_specs, out_specs):
    """Version-portable shard_map (jax.shard_map in ≥0.8, experimental before)."""
    try:
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except (AttributeError, TypeError):
        from jax.experimental.shard_map import shard_map as _sm
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)


def make_mesh(n_devices: int = 0) -> Mesh:
    devs = jax.devices()
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (SHARD_AXIS,))


def make_sharded_agg_kernel(plan: CompiledQuery, rows_per_device: int,
                            k_groups: int, mesh: Mesh):
    """Jitted multi-chip aggregation over row-sharded columns.

    Inputs are globally-shaped arrays with leading row axis sharded over the
    mesh; foreign (dimension) tables are replicated, like the reference
    transfers dimension tables wholesale per query
    (query/aql_processor.go:398 prepareForeignTable).

    Returns the same group-table tuple as the single-chip kernel, replicated.
    """
    n_dev = mesh.devices.size

    def per_shard(columns, foreign, n_valid, live_cutoff):
        # n_valid: int32[1] rows valid in THIS shard
        (gkeys, _, slot_used, aggv, cnt, n_groups, dim_values, dim_valids) = \
            K.agg_batch_body(plan, rows_per_device, k_groups,
                             columns, foreign, n_valid[0], live_cutoff)
        # gather partial tables from all chips over ICI
        all_keys = jax.lax.all_gather(gkeys, SHARD_AXIS).reshape(-1)
        all_agg = jax.lax.all_gather(aggv, SHARD_AXIS).reshape(-1)
        all_cnt = jax.lax.all_gather(cnt, SHARD_AXIS).reshape(-1)
        all_dims = [
            jax.lax.all_gather(dv, SHARD_AXIS).reshape(
                (-1,) + dv.shape[1:])
            for dv in dim_values
        ]
        all_dvalid = [jax.lax.all_gather(dv, SHARD_AXIS).reshape(-1)
                      for dv in dim_valids]

        # replicated final merge of the n_dev × K partial tables
        class _V:
            __slots__ = ("value", "valid")

            def __init__(self, value, valid):
                self.value = value
                self.valid = valid

        dim_vals = [_V(v, b) for v, b in zip(all_dims, all_dvalid)]
        mvalid = jnp.ones(all_keys.shape[0], jnp.bool_)
        (fkeys, f_used, f_agg, f_cnt, f_groups, f_dims, f_dvalids) = \
            K.reduce_by_key(all_keys, all_agg, mvalid, plan.measure.agg,
                            plan.measure.out_float, k_groups, dim_vals)
        # counts must be summed with the same segmentation
        (_, _, f_cnt2, _, _, _, _) = K.reduce_by_key(
            all_keys, all_cnt, mvalid, "sum", False, k_groups, None)
        total_groups = jnp.max(
            jax.lax.all_gather(f_groups, SHARD_AXIS))
        return (fkeys, f_used, f_agg, f_cnt2, total_groups,
                tuple(f_dims), tuple(f_dvalids))

    col_spec = jax.tree_util.tree_map(lambda _: P(SHARD_AXIS), {})

    def fn(columns, foreign, n_valid, live_cutoff):
        # columns: {key: (values[n_dev*rows], valid[n_dev*rows])} — ONLY
        # main-table entries (key[0] == 0) shard by rows; joined foreign
        # columns are whole-table lookups and must stay replicated
        # (sharding them silently corrupts the join when the table length
        # happens to divide the mesh, and errors otherwise)
        col_specs = {
            k: jax.tree_util.tree_map(
                lambda _: P(SHARD_AXIS) if k[0] == 0 else P(), v)
            for k, v in columns.items()
        }
        in_specs = (
            col_specs,
            jax.tree_util.tree_map(lambda _: P(), foreign),
            P(SHARD_AXIS),
            P(),
        )
        out_specs = (P(), P(), P(), P(), P(),
                     tuple(P() for _ in plan.dimensions),
                     tuple(P() for _ in plan.dimensions))
        return _shard_map(per_shard, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs)(columns, foreign, n_valid,
                                               live_cutoff)

    return jax.jit(fn)


def make_sharded_hll_kernel(plan: CompiledQuery, rows_per_device: int,
                            k_groups: int, mesh: Mesh):
    """Multi-chip HLL: each chip builds its partial [K, 16384] register
    planes with the single-chip kernel body, the planes all-gather over
    ICI, and a replicated register-MAX merge by group key produces the
    final table — the r3 device-side cross-batch register merge
    (executor._hll_merge_device) generalized to the mesh (VERDICT r4 #3).
    Reference peers: query/hll.cu (per-batch planes) + broker HLL merge.
    """
    from aresdb_tpu.query import hll as H

    m = H.HLL_M
    n_dev = mesh.devices.size

    def per_shard(columns, foreign, n_valid, live_cutoff):
        (gkeys, slot_used, regs, cnt, n_groups, dim_values, dim_valids) = \
            K.hll_batch_body(plan, rows_per_device, k_groups,
                             columns, foreign, n_valid[0], live_cutoff)
        all_keys = jax.lax.all_gather(gkeys, SHARD_AXIS).reshape(-1)
        all_regs = jax.lax.all_gather(regs, SHARD_AXIS).reshape(-1, m)
        all_cnt = jax.lax.all_gather(cnt, SHARD_AXIS).reshape(-1)
        all_dims = [jax.lax.all_gather(dv, SHARD_AXIS).reshape(
            (-1,) + dv.shape[1:]) for dv in dim_values]
        all_dvalid = [jax.lax.all_gather(dv, SHARD_AXIS).reshape(-1)
                      for dv in dim_valids]

        n = all_keys.shape[0]
        iota = jnp.arange(n, dtype=jnp.int32)
        skeys, order = jax.lax.sort((all_keys, iota), num_keys=1,
                                    is_stable=True)
        regs_s = all_regs[order]
        cnt_s = all_cnt[order]
        first = jnp.concatenate([jnp.ones(1, jnp.bool_),
                                 skeys[1:] != skeys[:-1]])
        live = skeys != K.SENTINEL64
        seg = jnp.cumsum(first.astype(jnp.int32)) - 1
        seg_c = jnp.where(live & (seg < k_groups), seg, k_groups)
        num = k_groups + 1
        n_uniq = jnp.sum((first & live).astype(jnp.int32))
        m_regs = jax.ops.segment_max(
            regs_s.astype(jnp.int32), seg_c,
            num_segments=num)[:k_groups]
        m_regs = jnp.maximum(m_regs, 0).astype(jnp.uint8)
        m_cnt = jax.ops.segment_sum(cnt_s, seg_c,
                                    num_segments=num)[:k_groups]
        rep = jax.ops.segment_min(iota, seg_c, num_segments=num)[:k_groups]
        rep = jnp.clip(rep, 0, n - 1)
        f_keys = skeys[rep]
        used = jnp.arange(k_groups, dtype=jnp.int32) < n_uniq
        f_keys = jnp.where(used, f_keys, K.SENTINEL64)
        src = order[rep]
        f_dims = tuple(dv[src] for dv in all_dims)
        f_dvalids = tuple((dv[src] & used) for dv in all_dvalid)
        return (f_keys, used, m_regs, m_cnt, n_uniq, f_dims, f_dvalids)

    def fn(columns, foreign, n_valid, live_cutoff):
        col_specs = {
            k: jax.tree_util.tree_map(
                lambda _: P(SHARD_AXIS) if k[0] == 0 else P(), v)
            for k, v in columns.items()
        }
        in_specs = (
            col_specs,
            jax.tree_util.tree_map(lambda _: P(), foreign),
            P(SHARD_AXIS),
            P(),
        )
        out_specs = (P(), P(), P(), P(), P(),
                     tuple(P() for _ in plan.dimensions),
                     tuple(P() for _ in plan.dimensions))
        return _shard_map(per_shard, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs)(columns, foreign, n_valid,
                                               live_cutoff)

    return jax.jit(fn)


def shard_rows(values: np.ndarray, validity: np.ndarray, n_dev: int,
               rows_per_device: int):
    """Pad + reshape host rows so row i of shard d is global row d*R+i."""
    total = n_dev * rows_per_device
    n = len(validity)
    if n < total:
        pad = (total - n,) + values.shape[1:]
        values = np.concatenate([values, np.zeros(pad, values.dtype)])
        validity = np.concatenate([validity, np.zeros(total - n, bool)])
    return values[:total], validity[:total]


def per_shard_valid(n: int, n_dev: int, rows_per_device: int) -> np.ndarray:
    """int32[n_dev] valid-row counts after contiguous row sharding."""
    out = np.zeros(n_dev, np.int32)
    remaining = n
    for d in range(n_dev):
        out[d] = max(0, min(rows_per_device, remaining))
        remaining -= out[d]
    return out
