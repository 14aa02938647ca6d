"""Benchmark: per-chip throughput of every kernel path in one run.

Covers the five execution paths of the query engine (BASELINE.md configs
2-4): dense slot aggregation (headline — the executor default for bounded
dims), sort-path aggregation (high-cardinality dims), HLL distinct count,
non-agg top-L selection, and geo point-in-polygon, all on synthetic trips
data shaped like the reference's examples/1k_trips workload.

Methodology: iterations are CHAINED on device (each step's time column
carries a data dependency on the previous step's result via an
IEEE-unfoldable `carry - carry` zero) and synced once at the end — the same
shape as the executor's deferred-fetch pipelining, which dispatches every
batch before fetching any result. Per-iteration host syncs would charge the
~27ms remote-tunnel round trip to every batch, which a production deployment
(local TPU, pipelined batches) never pays; that diagnostic number is printed
to stderr for the headline path. The whole chained call itself pays that
round trip ONCE — measured: an empty 8-step scan costs 26ms, a 64-step one
27ms — so iterations are set high enough (64) that the fixed cost adds
<0.5ms to each per-batch figure.

The reference publishes no numbers (BASELINE.json "published": {}), so
`vs_baseline` reports ROOFLINE attainment of the headline dense path: the
per-batch roofline is max(MXU time of the factored reduction's 4 bf16
passes at 197 TF/s, HBM time of the column scan at 819 GB/s), and
attainment = roofline_ms / measured_ms (1.0 = the hardware's own ceiling
for this operator). The dense path is MXU-bound by design — its one-hot
factored reduction does n*ceil(K/128)*128*2 FLOPs per pass — so raw
scan-bytes/HBM-peak would undersell it. Scan-bound paths additionally
report `hbm_attainment` (scan bytes/s over HBM peak).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

HBM_PEAK_BYTES_PER_S = 819e9   # TPU v5e
MXU_PEAK_BF16_FLOPS = 197e12   # TPU v5e


def _bytes_per_row(plan, mdt) -> int:
    total = 0
    for cid in plan.used_columns:
        col = plan.main_schema.table.columns[cid]
        total += mdt.data_type_bytes(col.data_type) + 1  # value + validity
    return total


def main() -> None:
    from aresdb_tpu.utils import jax_env

    jax_env.ensure()
    import jax
    import jax.numpy as jnp

    from aresdb_tpu import demo
    from aresdb_tpu.common import data_types as mdt
    from aresdb_tpu.query import geo as G
    from aresdb_tpu.query import kernels as K
    from aresdb_tpu.query.dense import plan_dense

    n_rows = 1 << 22  # 4M rows per batch
    iters = 64  # amortizes the one ~27ms tunnel round trip to <0.5ms/batch
    time_key = (0, 0)  # request_at is column 0 of the demo trips schema

    def chained_rps(kernel_body, columns, sync_of_out):
        """Time `iters` device-chained invocations; return (rows/s, s/batch).

        kernel_body(cols) -> out tuple; sync_of_out(out) -> f32 scalar used
        as the chain carry (data dependency between steps).
        """

        @jax.jit
        def chained(columns):
            def body(carry, _):
                cols = dict(columns)
                v, b = cols[time_key]
                cols[time_key] = (v + (carry - carry).astype(v.dtype), b)
                out = kernel_body(cols)
                return carry + sync_of_out(out), None
            carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return carry

        float(chained(columns))  # compile + warm
        t0 = time.perf_counter()
        float(chained(columns))
        el = time.perf_counter() - t0
        return n_rows * iters / el, el / iters

    paths = {}

    def record(name, plan, rps, sec):
        bpr = _bytes_per_row(plan, mdt) if plan is not None else 9  # geo
        paths[name] = {
            "rows_per_sec": round(rps, 1),
            "ms_per_4m_batch": round(sec * 1e3, 2),
            "scan_gb_per_sec": round(rps * bpr / 1e9, 2),
            "hbm_attainment": round(rps * bpr / HBM_PEAK_BYTES_PER_S, 4),
        }
        print(f"{name}: {rps/1e6:.1f}M rows/s ({sec*1e3:.1f}ms/batch, "
              f"{rps*bpr/1e9:.1f} GB/s scanned)", file=sys.stderr)

    # ---- dense path (executor default: hour bucket x city id both bounded)
    plan = demo.demo_plan()
    cols_np, _ = demo.demo_columns(plan, n_rows)
    columns = {k: (jnp.asarray(v), jnp.asarray(b))
               for k, (v, b) in cols_np.items()}
    city_key = (0, plan.main_schema.column_id("city_id"))
    stats = {city_key: int(cols_np[city_key][0].max())}
    dp = plan_dense(plan, stats)
    assert dp is not None, "demo plan must qualify for dense mode"
    dense_fn = K.make_dense_agg_kernel(plan, n_rows, dp)
    rps, sec = chained_rps(
        lambda c: dense_fn.__wrapped__(
            c, (), np.int32(n_rows), np.int64(0),
            K.dense_acc_init(plan, dp.n_slots)),
        columns, lambda out: jnp.sum(out[0][0]).astype(jnp.float32))
    record("dense", plan, rps, sec)
    dense_rps = rps
    # dense roofline: 4 bf16 MXU passes of the fused factored reduction
    # ([(C+1)*khi, T] @ [T, 128] per row chunk) vs the column scan
    khi_pad = max(16, ((((dp.n_slots + 127) // 128) + 15) // 16) * 16)
    flops = 4.0 * n_rows * khi_pad * 128 * 2
    flop_ms = flops / MXU_PEAK_BF16_FLOPS * 1e3
    scan_ms = n_rows * _bytes_per_row(plan, mdt) / HBM_PEAK_BYTES_PER_S * 1e3
    roofline_ms = max(flop_ms, scan_ms)
    paths["dense"]["roofline_ms_per_batch"] = round(roofline_ms, 2)
    paths["dense"]["roofline_attainment"] = round(roofline_ms / (sec * 1e3), 4)
    print(f"dense roofline: {roofline_ms:.2f}ms (mxu {flop_ms:.2f} / scan "
          f"{scan_ms:.2f}) -> attainment "
          f"{roofline_ms / (sec * 1e3):.2f}", file=sys.stderr)

    # per-iteration sync diagnostic (includes tunnel round trip per batch).
    # block_until_ready does not synchronize through remote-execution
    # platforms (axon tunnel) — force a host scalar fetch instead.
    def _one():
        return K.run_dense_kernel(dense_fn, plan, dp.n_slots, columns, (),
                                  np.int32(n_rows), np.int64(0))

    float(jnp.sum(_one()[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.sum(_one()[0]))
    el_sync = time.perf_counter() - t0
    print(f"dense per-iter-sync diagnostic: "
          f"{n_rows*iters/el_sync/1e6:.1f}M rows/s", file=sys.stderr)

    # ---- sort path, forced past the static dense planner (k=32k). The
    # runtime dense-domain check (kernels.reduce_by_key) re-detects the
    # bounded hour×city domain per batch and routes to the factored MXU
    # reduction — the adaptive-aggregation fast path.
    rps, sec = chained_rps(
        lambda c: K.agg_batch_body(plan, n_rows, 1 << 15, c, (),
                                   np.int32(n_rows)),
        columns, lambda out: jnp.sum(out[3]))
    record("sort", plan, rps, sec)

    # ---- true high-cardinality sort: group by raw fare (f32 bit patterns,
    # ~4M distinct) — the runtime check cannot compact this, so it runs the
    # genuine packed-sort pipeline
    hc_query = dict(demo.DEMO_QUERY)
    hc_query["dimensions"] = [{"sqlExpression": "fare"}]
    hc_plan = demo.demo_plan(hc_query)
    hc_cols_np, _ = demo.demo_columns(hc_plan, n_rows)
    hc_columns = {k: (jnp.asarray(v), jnp.asarray(b))
                  for k, (v, b) in hc_cols_np.items()}
    rps, sec = chained_rps(
        lambda c: K.agg_batch_body(hc_plan, n_rows, 1 << 15, c, (),
                                   np.int32(n_rows)),
        hc_columns, lambda out: jnp.sum(out[3]))
    record("sort_hicard", hc_plan, rps, sec)

    # ---- HLL path (countdistincthll over the UUID column)
    hll_query = dict(demo.DEMO_QUERY)
    hll_query["measures"] = [{"sqlExpression": "countdistincthll(uuid)"}]
    hll_plan = demo.demo_plan(hll_query)
    hll_cols_np, _ = demo.demo_columns(hll_plan, n_rows)
    hll_columns = {k: (jnp.asarray(v), jnp.asarray(b))
                   for k, (v, b) in hll_cols_np.items()}
    hll_fn = K.make_hll_kernel(hll_plan, n_rows, 1 << 13)
    rps, sec = chained_rps(
        lambda c: hll_fn.__wrapped__(c, (), np.int32(n_rows), np.int64(0)),
        hll_columns, lambda out: jnp.sum(out[3]))
    record("hll", hll_plan, rps, sec)

    # ---- non-agg path (top-L selection with device compaction)
    na_query = dict(demo.DEMO_QUERY)
    na_query["measures"] = [{"sqlExpression": "1"}]
    na_query["dimensions"] = [{"sqlExpression": "fare"},
                              {"sqlExpression": "status"}]
    na_query["limit"] = 1000
    na_plan = demo.demo_plan(na_query)
    na_cols_np, _ = demo.demo_columns(na_plan, n_rows)
    na_columns = {k: (jnp.asarray(v), jnp.asarray(b))
                  for k, (v, b) in na_cols_np.items()}
    na_fn = K.make_select_kernel(na_plan, n_rows, top_l=1024)
    rps, sec = chained_rps(
        lambda c: na_fn.__wrapped__(c, (), np.int32(n_rows), np.int64(0)),
        na_columns, lambda out: out[0].astype(jnp.float32))
    record("nonagg", na_plan, rps, sec)

    # ---- geo path (point-in-polygon). Two configs, both 100 shapes /
    # 3300 edges, run through the production dispatch (bbox-pruned
    # two-pass kernel with the lax.cond dense fallback, kernels.py):
    #   geo          — blanket coverage (shape bboxes tile ~92% of the
    #                  field; ~0.96 bbox candidates/point — the pruning
    #                  worst case, every point pays an edge slab)
    #   geo_selective— geofence-style coverage (~4% of the field; the
    #                  reference's geo use case: zone/airport polygons
    #                  against a city's worth of points)
    def geo_config(radius):
        rng = np.random.RandomState(11)
        shapes = []
        for s in range(100):
            cx, cy = rng.rand(2) * 10
            ang = np.linspace(0, 2 * np.pi, 33)
            ring = [(float(cx + radius * np.cos(a)),
                     float(cy + radius * np.sin(a))) for a in ang]
            ring[-1] = ring[0]  # polygon rings close exactly (WKT contract)
            shapes.append([ring])
        sb = G.build_shape_batch(shapes, list(range(100)))
        assert sb.prune_ok
        plat = jnp.asarray((rng.rand(n_rows) * 10).astype(np.float32))
        plng = jnp.asarray((rng.rand(n_rows) * 10).astype(np.float32))
        pvalid = jnp.asarray(rng.rand(n_rows) > 0.02)
        return sb, plat, plng, pvalid

    def geo_rps(sb, plat, plng, pvalid):
        gargs = tuple(jnp.asarray(a) for a in
                      (sb.slope, sb.lat1, sb.lng1, sb.lng2, sb.onehot))
        tab3 = jnp.asarray(sb.tab3)
        bbox = jnp.asarray(sb.bbox)

        @jax.jit
        def geo_chain(plat, plng, pvalid):
            def body(carry, _):
                p = plat + (carry - carry)
                pruned, ovf = G.matched_shape_pruned(
                    p, plng, pvalid, tab3, bbox, sb.n_shapes)
                m = jax.lax.cond(
                    ovf,
                    lambda: G.matched_shape(p, plng, pvalid, *gargs,
                                            sb.n_shapes),
                    lambda: pruned)
                return carry + jnp.sum(m).astype(jnp.float32), None
            carry, _ = jax.lax.scan(body, jnp.float32(0), None,
                                    length=iters)
            return carry

        float(geo_chain(plat, plng, pvalid))
        t0 = time.perf_counter()
        float(geo_chain(plat, plng, pvalid))
        el = time.perf_counter() - t0
        return n_rows * iters / el, el / iters

    rps, sec = geo_rps(*geo_config(0.5))
    record("geo", None, rps, sec)
    rps, sec = geo_rps(*geo_config(0.1))
    record("geo_selective", None, rps, sec)

    # ---- host-side ingestion (not a TPU kernel, but a headline the
    # reference also publishes benchmarks around): in-process columnar
    # upsert through the full path — WAL append, 8-way partitioned cuckoo
    # classification, native gather+scatter column writes
    def ingest_rps():
        import tempfile

        from aresdb_tpu.common import data_types as dt
        from aresdb_tpu.common.schema import Table
        from aresdb_tpu.common.upsert_batch import (UpsertBatch,
                                                    build_columnar_upsert)
        from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
        from aresdb_tpu.memstore.memstore import MemStore
        from aresdb_tpu.metastore.disk_metastore import DiskMetaStore

        day = 86400
        now = 1_600_000_000
        base = now - (now % day) - 2 * day
        n, batch = 8_000_000, 1 << 22
        ms = MemStore(DiskMetaStore(tempfile.mkdtemp()),
                      LocalDiskStore(tempfile.mkdtemp()))
        ms.create_table(Table.from_json({
            "name": "trips_ingest", "columns": [
                {"name": "request_at", "type": "Uint32"},
                {"name": "id", "type": "Uint32"},
                {"name": "city_id", "type": "Uint16"},
                {"name": "fare", "type": "Float32"}],
            "primaryKeyColumns": [1], "isFactTable": True,
            "config": {"batchSize": batch,
                       "recordRetentionInDays": 0}}))
        ms.init_shards()
        shard = ms.get_table_shard("trips_ingest")
        rng = np.random.RandomState(5)
        el = 0.0
        for off in range(0, n, batch):
            m = min(batch, n - off)
            blob = build_columnar_upsert([
                (0, dt.Uint32,
                 (base + rng.randint(0, 2 * day, m)).astype(np.uint32),
                 None, 0),
                (1, dt.Uint32,
                 np.arange(off, off + m, dtype=np.uint32), None, 0),
                (2, dt.Uint16,
                 rng.randint(0, 300, m).astype(np.uint16), None, 0),
                (3, dt.Float32,
                 (rng.rand(m) * 50).astype(np.float32), None, 0)], m)
            t0 = time.perf_counter()
            shard.save_upsert_batch(UpsertBatch(blob))
            el += time.perf_counter() - t0
        return n / el, el / (n / (1 << 22))

    rps, sec = ingest_rps()
    paths["ingest"] = {"rows_per_sec": round(rps, 1),
                       "ms_per_4m_batch": round(sec * 1e3, 2),
                       "note": "host-side, WAL on, 8-way partitioned "
                               "cuckoo classify"}
    print(f"ingest: {rps/1e6:.2f}M rows/s (host, WAL on)", file=sys.stderr)

    print(json.dumps({
        "metric": "agg_query_rows_per_sec_per_chip",
        "value": round(dense_rps, 1),
        "unit": "rows/s",
        "vs_baseline": paths["dense"]["roofline_attainment"],
        "vs_baseline_semantics":
            "no published reference numbers exist (BASELINE.md); this is "
            "roofline attainment of the headline dense path: "
            "max(MXU time of the reduction's 4 bf16 passes @197TF/s, HBM "
            "scan time @819GB/s) / measured batch time; 1.0 = the "
            "hardware ceiling for this operator",
        "paths": paths,
    }))


if __name__ == "__main__":
    main()
