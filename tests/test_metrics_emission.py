"""Metrics catalog wiring: every major path emits its reference metrics.

Reference: utils/metrics.go:25-140 (~110 named metrics with per-(table,
shard) scoped reporters used throughout ingestion, jobs, query,
bootstrap). N/A here by design: CUDA device-memory gauges
(AllocatedDeviceMemory/EstimatedDeviceMemory map to the XLA allocator and
are surfaced via /dbg/devices instead) and C-side memory tracking.
"""

from __future__ import annotations

import numpy as np
import pytest

from aresdb_tpu.utils import metrics as M


def test_catalog_name_diff_vs_reference():
    """Parse the reference's MetricName enum (utils/metrics.go:28-138) and
    assert SET EQUALITY with our catalog keys — not a count floor. The only
    name excluded is the `MetricNamesSentinel` enum terminator (not a
    metric)."""
    import os
    import re

    ref_path = "/root/reference/utils/metrics.go"
    if not os.path.exists(ref_path):
        pytest.skip("reference tree not present")
    src = open(ref_path).read()
    block = re.search(r"const \(\n(.*?)\n\)", src, re.S).group(1)
    ref_names = set()
    for line in block.splitlines():
        line = line.split("//")[0].strip()
        m = re.match(r"([A-Za-z0-9]+)\b", line) if line else None
        if m:
            ref_names.add(m.group(1))
    ref_names.discard("MetricNamesSentinel")
    ours = set(M.CATALOG)
    assert ref_names - ours == set(), f"missing: {sorted(ref_names - ours)}"
    assert ours - ref_names == set(), f"extra: {sorted(ours - ref_names)}"


def test_jobs_queries_redolog_http_emit(tmp_path):
    """Drive ingest -> archiving/backfill/snapshot/purge jobs -> queries
    through the HTTP API and assert each family of metrics was emitted."""
    import requests

    from aresdb_tpu.api.server import ApiServer
    from aresdb_tpu.common import data_types as dt
    from aresdb_tpu.common.schema import Table
    from aresdb_tpu.common.upsert_batch import (UpsertBatch,
                                                build_columnar_upsert)
    from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
    from aresdb_tpu.memstore.memstore import MemStore
    from aresdb_tpu.memstore.scheduler import Scheduler
    from aresdb_tpu.metastore.disk_metastore import DiskMetaStore

    base_t = 1_600_000_000 - (1_600_000_000 % 86400)
    root = str(tmp_path)
    ms = MemStore(DiskMetaStore(root), LocalDiskStore(root))
    ms.create_table(Table.from_json({
        "name": "trips",
        "columns": [
            {"name": "ts", "type": "Uint32"}, {"name": "id", "type": "Uint32"},
            {"name": "fare", "type": "Float32"}],
        "primaryKeyColumns": [1], "isFactTable": True,
        "config": {"batchSize": 4096, "recordRetentionInDays": 0},
    }))
    ms.init_shards()
    n = 5000
    rng = np.random.RandomState(0)
    buf = build_columnar_upsert([
        (0, dt.Uint32, (base_t + rng.randint(0, 86400, n)).astype(np.uint32),
         None, 0),
        (1, dt.Uint32, np.arange(n, dtype=np.uint32), None, 0),
        (2, dt.Float32, rng.rand(n).astype(np.float32), None, 0),
    ], n)
    ms.handle_ingestion("trips", 0, UpsertBatch(buf))

    sched = Scheduler(ms)
    for job in ("archiving", "backfill", "snapshot", "purge"):
        try:
            sched.run_job("trips", 0, job, now=base_t + 2 * 86400)
        except Exception:  # noqa: BLE001 — snapshot n/a on fact tables etc.
            pass

    srv = ApiServer(ms, sched, port=0)
    port = srv.start_background()
    try:
        r = requests.post(f"http://localhost:{port}/query/aql", json={
            "queries": [{"table": "trips",
                         "measures": [{"sqlExpression": "count(*)"}],
                         "timeFilter": {"column": "ts",
                                        "from": "100 days ago"},
                         "now": base_t + 86400}]}, timeout=30)
        assert r.status_code == 200, r.text
        snap = requests.get(f"http://localhost:{port}/metrics",
                            timeout=10).json()
    finally:
        srv.stop()

    # ingestion
    assert M.root().find("IngestedRecords")
    assert M.root().find("IngestedUpsertBatches")
    # jobs
    assert M.root().find("ArchivingCount")
    assert M.root().find("ArchivingRecords")
    assert M.root().find("ArchivingTimingTotal")
    assert M.root().find("BackfillTimingTotal")
    assert M.root().find("PurgeTimingTotal")
    # redolog gauges
    assert M.root().find("CurrentRedologSize")
    assert M.root().find("NumberOfRedologs")
    # query lifecycle + stages
    assert M.root().find("QueryReceived")
    assert M.root().find("QueryLatency")
    assert M.root().find("QueryRowsReturned")
    assert (M.root().find("QueryLiveRecordsProcessed")
            or M.root().find("QueryArchiveRecordsProcessed"))
    # http handler instrumentation + the /metrics dump itself
    assert M.root().find("HTTPHandlerCall")
    assert any("query" in k.lower() or "http" in k.lower()
               for k in snap.get("counters", {}))


def test_scoped_reporter_tags_table_and_shard(tmp_path):
    rep = M.root().scoped(table="t1", shard="3")
    rep.count(M.INGESTED_RECORDS, 7)
    series = M.root().find("IngestedRecords")
    assert any("table=t1" in k and "shard=3" in k for k in series)
