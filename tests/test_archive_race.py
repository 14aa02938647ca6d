"""Concurrent archiving vs queries: counts must never double or drop.

Regression test for a snapshot-ordering race: the executor read the
archive version cutoff and batch list separately, so a concurrent
archiving swap double-counted every archived row (caught by driving the
real aresd binary while its scheduler archived)."""

import tempfile
import threading
import time

import numpy as np
from aresdb_tpu.common.schema import Table
from aresdb_tpu.common.upsert_batch import build_columnar_upsert, UpsertBatch
from aresdb_tpu.common import data_types as dt
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.archiving import Archiver
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore
from aresdb_tpu.query.service import QueryService

DAY = 86400
BASE = 1_600_000_000 - (1_600_000_000 % DAY)


def test_archive_query_race():
    bad = []
    for trial in range(3):
        root = tempfile.mkdtemp()
        ms = MemStore(DiskMetaStore(root), LocalDiskStore(root))
        ms.create_table(Table.from_json({
            "name": "t", "columns": [
                {"name": "ts", "type": "Uint32"}, {"name": "id", "type": "Uint32"},
                {"name": "v", "type": "Float32"}],
            "primaryKeyColumns": [1], "isFactTable": True,
            "config": {"batchSize": 1 << 14, "recordRetentionInDays": 0}}))
        ms.init_shards()
        shard = ms.get_table_shard("t")
        n = 1 << 17
        rng = np.random.RandomState(trial)
        ms.handle_ingestion("t", 0, UpsertBatch(build_columnar_upsert([
            (0, dt.Uint32, (BASE + rng.randint(0, 2 * DAY, n)).astype(np.uint32), None, 0),
            (1, dt.Uint32, np.arange(n, dtype=np.uint32), None, 0),
            (2, dt.Float32, np.ones(n, np.float32), None, 0)], n)))
        svc = QueryService(ms)
        q = {"table": "t", "measures": [{"sqlExpression": "count(*)"}],
             "now": BASE + 3 * DAY}
        svc.handle_aql({"queries": [q]})  # warm kernels

        stop = threading.Event()
        counts = []
        def reader():
            while not stop.is_set():
                r = svc.handle_aql({"queries": [q]})
                if r.get("errors") and r["errors"][0]:
                    counts.append(("ERR", r["errors"]))
                else:
                    counts.append(r["results"][0].get("", 0.0))
        threads = [threading.Thread(target=reader) for _ in range(3)]
        for t in threads: t.start()
        time.sleep(0.05)
        Archiver(shard, ms.metastore, ms.diskstore).archive(BASE + 2 * DAY)
        time.sleep(0.2)
        stop.set()
        for t in threads: t.join()
        wrong = [c for c in counts if c != float(n)]
        if wrong:
            bad.append((trial, wrong[:3], len(wrong), len(counts)))
    assert not bad, bad
