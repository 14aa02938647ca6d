"""File redolog manager parity (redolog/file_redolog_manager_test.go).

Behavioral cases: rotation (create-new / reuse-young / rotate-old),
iteration across files with (file, offset) identities, corrupt-tail
truncation that continues into the next file, empty-file handling, and
the checkpoint purge predicate (getRedoLogFilesToPurge :347): purge only
non-current files whose max event time is below the cutoff AND that are
older than the checkpoint file — or ARE the checkpoint file with all
batches checkpointed (batch count == offset + 1).
"""

import struct

from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common.upsert_batch import UpsertBatchBuilder
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.redolog.file_redolog import FileRedoLogManager, UPSERT_HEADER
from aresdb_tpu.utils import clock


def _batch_bytes(value):
    b = UpsertBatchBuilder()
    b.add_column(0, dt.Uint32)
    b.add_row()
    b.set_value(0, 0, value)
    return b.to_bytes()


def _mgr(tmp_path, rotation=10):
    ds = LocalDiskStore(str(tmp_path))
    return FileRedoLogManager("abc", 0, ds, rotation_interval=rotation), ds


def test_rotation_create_reuse_and_rotate(tmp_path):
    mgr, ds = _mgr(tmp_path, rotation=10)
    clock.set_current_time(1000)
    try:
        f1, off = mgr.append(_batch_bytes(1), max_event_time=50)
        assert (f1, off) == (1000, 0)
        # young file is reused
        clock.set_current_time(1005)
        f2, off = mgr.append(_batch_bytes(2), max_event_time=60)
        assert (f2, off) == (1000, 1)
        # old file rotates
        clock.set_current_time(1010)
        f3, off = mgr.append(_batch_bytes(3), max_event_time=70)
        assert (f3, off) == (1010, 0)
        assert sorted(ds.list_logs("abc", 0)) == [1000, 1010]
    finally:
        clock.set_current_time(None)


def test_iterator_zero_files(tmp_path):
    mgr, _ = _mgr(tmp_path)
    assert list(mgr.iterate()) == []


def test_iterator_three_batches_two_files(tmp_path):
    mgr, _ = _mgr(tmp_path, rotation=10)
    clock.set_current_time(1000)
    try:
        mgr.append(_batch_bytes(1), 50)
        mgr.append(_batch_bytes(2), 60)
        clock.set_current_time(1010)
        mgr.append(_batch_bytes(3), 70)
        mgr.close()

        got = [(f, o) for f, o, _ in mgr.iterate()]
        assert got == [(1000, 0), (1000, 1), (1010, 0)]
        # checkpoint skip: batches at or before (1000, 0) are skipped
        got = [(f, o) for f, o, _ in mgr.iterate(1000, 1)]
        assert got == [(1000, 1), (1010, 0)]
        got = [(f, o) for f, o, _ in mgr.iterate(1010, 0)]
        assert got == [(1010, 0)]
    finally:
        clock.set_current_time(None)


def test_truncate_continues_to_next_file(tmp_path):
    """A corrupt tail in file 1 truncates it at the last good batch and
    iteration continues into file 2 (reference :351)."""
    mgr, ds = _mgr(tmp_path, rotation=10)
    clock.set_current_time(1000)
    try:
        payload = _batch_bytes(1)
        mgr.append(payload, 50)
        mgr.append(_batch_bytes(2), 60)
        clock.set_current_time(1010)
        mgr.append(_batch_bytes(3), 70)
        mgr.close()

        # corrupt file 1's tail: claim a 20-byte batch but write only 9
        with ds.open_log_for_append("abc", 0, 1000) as f:
            f.write(struct.pack("<I", 20))
            f.write(bytes([2, 3, 3, 3, 3, 3, 1, 2, 2]))

        got = [(f_, o) for f_, o, _ in mgr.iterate()]
        assert got == [(1000, 0), (1000, 1), (1010, 0)]

        # the truncation physically removed the garbage: re-iteration is
        # clean and the file size is back to header + 2 batches
        got = [(f_, o) for f_, o, _ in mgr.iterate()]
        assert got == [(1000, 0), (1000, 1), (1010, 0)]
        with ds.open_log_for_read("abc", 0, 1000) as f:
            data = f.read()
        assert len(data) == 4 + 2 * (4 + len(payload))
    finally:
        clock.set_current_time(None)


def test_iterator_header_only_file(tmp_path):
    mgr, ds = _mgr(tmp_path, rotation=10)
    with ds.open_log_for_append("abc", 0, 500) as f:
        f.write(struct.pack("<I", UPSERT_HEADER))
    assert list(mgr.iterate()) == []


def test_checkpoint_purge_predicate(tmp_path):
    """getRedoLogFilesToPurge matrix (:453): files 1/2/3 with max event
    times 100/200/300 and batch counts 10/20/30; file 3 is current."""
    def build(tmp):
        mgr, ds = _mgr(tmp, rotation=10)
        for creation, n, et in ((1000, 10, 100), (1010, 20, 200),
                                (1020, 30, 300)):
            clock.set_current_time(creation)
            for i in range(n):
                mgr.append(_batch_bytes(i), et)
        return mgr, ds

    clock.set_current_time(1000)
    try:
        # cutoff 0 / low checkpoint: nothing purged
        mgr, ds = build(tmp_path / "a")
        mgr.checkpoint(0, 0, 0)
        assert sorted(ds.list_logs("abc", 0)) == [1000, 1010, 1020]
        mgr.checkpoint(400, 0, 0)
        assert sorted(ds.list_logs("abc", 0)) == [1000, 1010, 1020]

        # file 2 is the checkpoint file but not fully checkpointed:
        # only file 1 goes
        mgr, ds = build(tmp_path / "b")
        mgr.checkpoint(400, 1010, 15)
        assert sorted(ds.list_logs("abc", 0)) == [1010, 1020]

        # file 2 checkpointed at its LAST batch (offset 19 of 20): purged
        mgr, ds = build(tmp_path / "c")
        mgr.checkpoint(400, 1010, 19)
        assert sorted(ds.list_logs("abc", 0)) == [1020]

        # current file is never purged even when fully checkpointed
        mgr, ds = build(tmp_path / "d")
        mgr.checkpoint(400, 1020, 29)
        assert sorted(ds.list_logs("abc", 0)) == [1020]
    finally:
        clock.set_current_time(None)
