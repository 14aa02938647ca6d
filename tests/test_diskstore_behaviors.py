"""LocalDiskStore behavioral parity (diskstore/local_diskstore_test.go).

Replays the reference suite's scenarios against OUR disk store: redolog
read/write/delete/truncate, bad-filename tolerance, missing-file errors,
snapshot dir/vp listing + delete-older-than-watermark, archive column
write/read + batch-version deletion + batch cutoff deletion + column
deletion, and whole-shard deletion.
"""

import os

import pytest

from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore


@pytest.fixture
def ds(tmp_path):
    return LocalDiskStore(str(tmp_path))


def test_redolog_write_read_delete(ds):
    # local_diskstore_test.go:63 Read/Write/Delete Redolog Files
    assert ds.list_logs("t", 0) == []
    with ds.open_log_for_append("t", 0, 1) as f:
        f.write(b"hello")
    with ds.open_log_for_append("t", 0, 2) as f:
        f.write(b"world")
    assert ds.list_logs("t", 0) == [1, 2]
    with ds.open_log_for_read("t", 0, 1) as f:
        assert f.read() == b"hello"
    # append mode appends
    with ds.open_log_for_append("t", 0, 1) as f:
        f.write(b"!")
    with ds.open_log_for_read("t", 0, 1) as f:
        assert f.read() == b"hello!"
    ds.delete_log("t", 0, 1)
    assert ds.list_logs("t", 0) == [2]
    ds.delete_log("t", 0, 1)  # idempotent (already gone)


def test_redolog_truncate(ds):
    # local_diskstore_test.go:135 Truncating Redolog Files
    with ds.open_log_for_append("t", 0, 5) as f:
        f.write(b"0123456789")
    ds.truncate_log("t", 0, 5, 4)
    with ds.open_log_for_read("t", 0, 5) as f:
        assert f.read() == b"0123"


def test_list_logs_ignores_bad_filenames(ds, tmp_path):
    # local_diskstore_test.go:203 "ignore the error if the redolog file
    # name is not correct"
    d = ds.redolog_dir("t", 0)
    os.makedirs(d)
    open(os.path.join(d, "notanumber.redolog"), "w").close()
    open(os.path.join(d, "123.redolog.tmp"), "w").close()
    open(os.path.join(d, "7.redolog"), "w").close()
    assert ds.list_logs("t", 0) == [7]


def test_open_log_for_replay_missing_raises(ds):
    # local_diskstore_test.go:212
    with pytest.raises(FileNotFoundError):
        ds.open_log_for_read("t", 0, 999)


def test_list_logs_missing_dir(ds):
    # local_diskstore_test.go:196 works with non-existing directory
    assert ds.list_logs("nope", 3) == []


def test_snapshot_roundtrip_and_listing(ds):
    # local_diskstore_test.go:219-316 snapshot dir/vp listing + read/write
    assert ds.list_snapshot_batches("d", 0, 1, 1) == []
    ds.write_snapshot_column("d", 0, 1, 1, -110, 0, b"col0")
    ds.write_snapshot_column("d", 0, 1, 1, -110, 2, b"col2")
    ds.write_snapshot_column("d", 0, 1, 1, -109, 0, b"x")
    assert ds.list_snapshot_batches("d", 0, 1, 1) == [-110, -109]
    assert ds.list_snapshot_batch_columns("d", 0, 1, 1, -110) == [0, 2]
    assert ds.read_snapshot_column("d", 0, 1, 1, -110, 2) == b"col2"
    assert ds.read_snapshot_column("d", 0, 1, 1, -110, 9) is None


def test_delete_snapshot_keeps_watermark(ds):
    # local_diskstore_test.go:380 Delete Snapshot: older snapshots go,
    # the latest (and anything newer) stays
    ds.write_snapshot_column("d", 0, 1, 10, -110, 0, b"old")
    ds.write_snapshot_column("d", 0, 2, 5, -110, 0, b"mid")
    ds.write_snapshot_column("d", 0, 2, 20, -110, 0, b"new")
    ds.delete_snapshot("d", 0, 2, 20)
    assert ds.read_snapshot_column("d", 0, 1, 10, -110, 0) is None
    assert ds.read_snapshot_column("d", 0, 2, 5, -110, 0) is None
    assert ds.read_snapshot_column("d", 0, 2, 20, -110, 0) == b"new"


def test_delete_snapshot_tolerates_bad_names(ds, tmp_path):
    # local_diskstore_test.go:440 DeleteSnapshot with invalid file names
    ds.write_snapshot_column("d", 0, 2, 20, -110, 0, b"new")
    os.makedirs(os.path.join(ds.snapshot_dir("d", 0), "garbage_name_x"),
                exist_ok=True)
    ds.delete_snapshot("d", 0, 2, 20)
    assert ds.read_snapshot_column("d", 0, 2, 20, -110, 0) == b"new"


def test_archive_column_roundtrip_and_versions(ds):
    # local_diskstore_test.go:468 Read/Write Archiving Column +
    # DeleteBatchVersions
    ds.write_archive_column("f", 0, 1, 0, 0, 2, b"v0")
    ds.write_archive_column("f", 0, 1, 5, 0, 2, b"v5")
    ds.write_archive_column("f", 0, 1, 5, 1, 2, b"v5s1")
    assert ds.read_archive_column("f", 0, 1, 5, 1, 2) == b"v5s1"
    # delete versions older than (5, 1): v0 and v5-seq0 go
    ds.delete_archive_batch_versions("f", 0, 1, 5, 1)
    assert ds.read_archive_column("f", 0, 1, 0, 0, 2) is None
    assert ds.read_archive_column("f", 0, 1, 5, 0, 2) is None
    assert ds.read_archive_column("f", 0, 1, 5, 1, 2) == b"v5s1"


def test_delete_batches_with_cutoff(ds):
    # local_diskstore_test.go:526 DeleteBatches with batchIDCutoff
    for bid in (1, 2, 3):
        ds.write_archive_column("f", 0, bid, 1, 0, 0, b"d")
    ds.delete_archive_batch("f", 0, 1)
    ds.delete_archive_batch("f", 0, 2)
    assert ds.read_archive_column("f", 0, 1, 1, 0, 0) is None
    assert ds.read_archive_column("f", 0, 2, 1, 0, 0) is None
    assert ds.read_archive_column("f", 0, 3, 1, 0, 0) == b"d"


def test_delete_column(ds):
    # local_diskstore_test.go:584 DeleteColumn removes the column's files
    # across every batch version but leaves other columns alone
    ds.write_archive_column("f", 0, 1, 1, 0, 0, b"keep")
    ds.write_archive_column("f", 0, 1, 1, 0, 3, b"drop")
    ds.write_archive_column("f", 0, 2, 1, 0, 3, b"drop2")
    ds.delete_column("f", 0, 3)
    assert ds.read_archive_column("f", 0, 1, 1, 0, 0) == b"keep"
    assert ds.read_archive_column("f", 0, 1, 1, 0, 3) is None
    assert ds.read_archive_column("f", 0, 2, 1, 0, 3) is None


def test_list_archive_batch_columns_ignores_bad_names(ds):
    # local_diskstore_test.go:634 ListArchiveBatchVectorPartyFiles
    ds.write_archive_column("f", 0, 1, 1, 0, 0, b"a")
    ds.write_archive_column("f", 0, 1, 1, 0, 4, b"b")
    d = ds.archive_batch_dir("f", 0, 1, 1, 0)
    open(os.path.join(d, "garbage"), "w").close()
    assert ds.list_archive_batch_columns("f", 0, 1, 1, 0) == [0, 4]


def test_delete_table_shard(ds):
    # local_diskstore_test.go:51 DeleteTableShard
    ds.write_archive_column("g", 2, 1, 1, 0, 0, b"a")
    with ds.open_log_for_append("g", 2, 1) as f:
        f.write(b"wal")
    ds.delete_table_shard("g", 2)
    assert ds.list_logs("g", 2) == []
    assert ds.read_archive_column("g", 2, 1, 1, 0, 0) is None
    ds.delete_table_shard("g", 2)  # idempotent on missing dir
