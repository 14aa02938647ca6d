"""Peer-copy bootstrap sessions: token held for the copy, keep-alive, expiry.

Reference: datanode/bootstrap/bootstrap_server.go:76-463 (sessions +
keep-alive), memstore/common/types.go:23 (BootStrapToken).
"""

import time

from aresdb_tpu.memstore.common import BootstrapSessionManager, BootstrapToken


def test_session_holds_token_until_close():
    tok = BootstrapToken()
    mgr = BootstrapSessionManager(tok, ttl=5.0)
    sid = mgr.open("trips", 0)
    # a data job cannot take the token while the session is live
    assert not tok.acquire("trips", 0, blocking=False)
    assert mgr.validate(sid, "trips", 0)
    assert not mgr.validate(sid, "trips", 1)  # wrong shard
    assert mgr.close(sid)
    assert tok.acquire("trips", 0, blocking=False)
    tok.release("trips", 0)
    assert not mgr.close(sid)  # double close is a no-op


def test_session_expires_without_keepalive():
    tok = BootstrapToken()
    mgr = BootstrapSessionManager(tok, ttl=0.2)
    sid = mgr.open("trips", 0)
    assert not tok.acquire("trips", 0, blocking=False)
    time.sleep(0.3)
    mgr.sweep()
    assert not mgr.validate(sid)
    # expiry released the token so data jobs resume
    assert tok.acquire("trips", 0, blocking=False)
    tok.release("trips", 0)


def test_keepalive_extends_session():
    tok = BootstrapToken()
    mgr = BootstrapSessionManager(tok, ttl=0.4)
    sid = mgr.open("trips", 0)
    for _ in range(3):
        time.sleep(0.2)
        assert mgr.keepalive(sid)
    assert mgr.validate(sid)
    mgr.close(sid)
    assert not mgr.keepalive(sid)


def test_sweeper_thread_reaps_abandoned_session():
    tok = BootstrapToken()
    mgr = BootstrapSessionManager(tok, ttl=0.2)
    mgr.open("trips", 3)
    deadline = time.time() + 3
    while time.time() < deadline:
        if tok.acquire("trips", 3, blocking=False):
            tok.release("trips", 3)
            return
        time.sleep(0.05)
    raise AssertionError("sweeper never released the abandoned session")


def test_concurrent_sessions_different_shards():
    tok = BootstrapToken()
    mgr = BootstrapSessionManager(tok, ttl=5.0)
    s0 = mgr.open("trips", 0)
    s1 = mgr.open("trips", 1)  # different shard: no contention
    assert mgr.validate(s0) and mgr.validate(s1)
    mgr.close(s0)
    mgr.close(s1)


def test_second_session_same_shard_times_out():
    tok = BootstrapToken()
    mgr = BootstrapSessionManager(tok, ttl=5.0)
    sid = mgr.open("trips", 0)
    try:
        mgr.open("trips", 0, acquire_timeout=0.1)
    except TimeoutError:
        pass
    else:
        raise AssertionError("expected TimeoutError")
    finally:
        mgr.close(sid)


def test_bootstrap_transfer_reports_bandwidth(tmp_path):
    """bootstrap_shard reports bytes / seconds / MB/s and emits the
    RawVPFetch* metrics per transferred file (reference throughput surface:
    datanode/bootstrap/bootstrap_server_bm_test.go BenchmarkFileTransfer)."""
    import numpy as np

    from aresdb_tpu.api.server import ApiServer
    from aresdb_tpu.common import data_types as dt
    from aresdb_tpu.common.schema import Table
    from aresdb_tpu.common.upsert_batch import (UpsertBatch,
                                                build_columnar_upsert)
    from aresdb_tpu.datanode.bootstrap import bootstrap_shard
    from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
    from aresdb_tpu.memstore.archiving import Archiver
    from aresdb_tpu.memstore.memstore import MemStore
    from aresdb_tpu.metastore.disk_metastore import DiskMetaStore
    from aresdb_tpu.utils import metrics as M

    base_t = 1_600_000_000 - (1_600_000_000 % 86400)
    schema = {
        "name": "trips",
        "columns": [
            {"name": "ts", "type": "Uint32"}, {"name": "id", "type": "Uint32"},
            {"name": "city", "type": "Uint16"}, {"name": "fare", "type": "Float32"}],
        "primaryKeyColumns": [1], "isFactTable": True,
        "config": {"batchSize": 1 << 17, "recordRetentionInDays": 0},
    }
    src_root = str(tmp_path / "src")
    src = MemStore(DiskMetaStore(src_root), LocalDiskStore(src_root))
    src.create_table(Table.from_json(schema))
    src.init_shards()
    n = 200_000  # multi-MB archive files
    rng = np.random.RandomState(0)
    buf = build_columnar_upsert([
        (0, dt.Uint32, (base_t + rng.randint(0, 86400, n)).astype(np.uint32),
         None, 0),
        (1, dt.Uint32, np.arange(n, dtype=np.uint32), None, 0),
        (2, dt.Uint16, rng.randint(0, 500, n).astype(np.uint16), None, 0),
        (3, dt.Float32, rng.rand(n).astype(np.float32), None, 0),
    ], n)
    src.handle_ingestion("trips", 0, UpsertBatch(buf))
    shard = src.get_table_shard("trips", 0)
    Archiver(shard, src.metastore, src.diskstore).archive(base_t + 86400)

    srv = ApiServer(src, None, port=0)
    port = srv.start_background()
    try:
        dst_root = str(tmp_path / "dst")
        dst_meta = DiskMetaStore(dst_root)
        dst_disk = LocalDiskStore(dst_root)
        dst_meta.create_table(Table.from_json(schema))
        copied = bootstrap_shard(f"localhost:{port}", "trips", 0,
                                 dst_disk, dst_meta)
        assert copied["archive"] >= 4          # one file per column
        assert copied["bytes"] > 1_000_000     # multi-MB transfer
        assert copied["seconds"] > 0
        assert copied["mb_per_sec"] > 0
        fetched = M.root().find("RawVPBytesFetched")
        assert fetched and sum(fetched.values()) > 1_000_000
        bw = M.root().find("RawVPFetchBytesPerSec")
        assert bw and all(v > 0 for v in bw.values())
        # recovery on the destination sees the archived rows
        dst = MemStore(dst_meta, dst_disk)
        dst.fetch_schema()
        dst.init_shards(shard_assignments=[("trips", 0)])
        dsh = dst.get_table_shard("trips", 0)
        arch_rows = sum(
            b.size for b in
            dsh.archive_store.get_current_version().batches.values())
        assert arch_rows == n
    finally:
        srv.stop()
