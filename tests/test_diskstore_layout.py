"""On-disk path layout goldens (diskstore/diskstore_util_test.go).

The exact strings matter: a reference deployment's data directory must be
readable in place (see tests/test_reference_root.py for the end-to-end
proof). Archive batch dirs use the "2006-01-02" DATE form of the day
batch id (local_diskstore.go:46), e.g. 2017-07-19 = day 17366.
"""

from aresdb_tpu.diskstore.local_diskstore import (LocalDiskStore,
                                                  _batch_id_str,
                                                  _parse_batch_dir)

DAY_2017_07_19 = 17366


def test_path_goldens():
    ds = LocalDiskStore("/path/to/store")
    assert ds.redolog_dir("myTable", 1) == \
        "/path/to/store/data/myTable_1/redologs"
    assert ds.redolog_path("myTable", 1, 1500496811) == \
        "/path/to/store/data/myTable_1/redologs/1500496811.redolog"
    assert ds.snapshot_dir("myTable", 1) == \
        "/path/to/store/data/myTable_1/snapshots"
    assert ds.snapshot_batch_dir("myTable", 1, 12345, 123, -2147483648) == \
        "/path/to/store/data/myTable_1/snapshots/12345_123/-2147483648"
    assert ds.archive_batch_root("myTable", 1) == \
        "/path/to/store/data/myTable_1/archiving_batches"
    assert ds.archive_batch_dir("myTable", 1, DAY_2017_07_19, 1499970253) == \
        ("/path/to/store/data/myTable_1/archiving_batches/"
         "2017-07-19_1499970253")
    assert ds.archive_batch_dir("myTable", 1, DAY_2017_07_19, 1499970253,
                                seq=2) == \
        ("/path/to/store/data/myTable_1/archiving_batches/"
         "2017-07-19_1499970253-2")


def test_batch_dir_parse_round_trip():
    assert _batch_id_str(DAY_2017_07_19) == "2017-07-19"
    assert _parse_batch_dir("2017-07-19_1499970253") == \
        (DAY_2017_07_19, 1499970253, 0)
    assert _parse_batch_dir("2017-07-19_1499970253-3") == \
        (DAY_2017_07_19, 1499970253, 3)
    # legacy integer form still parses
    assert _parse_batch_dir("17366_1499970253") == \
        (DAY_2017_07_19, 1499970253, 0)
    assert _parse_batch_dir("not-a-batch") is None


def test_archive_write_read_uses_date_dirs(tmp_path):
    ds = LocalDiskStore(str(tmp_path))
    ds.write_archive_column("t", 0, DAY_2017_07_19, 100, 0, 2, b"abc")
    import os
    assert os.path.isdir(
        tmp_path / "data" / "t_0" / "archiving_batches"
        / "2017-07-19_100")
    assert ds.read_archive_column("t", 0, DAY_2017_07_19, 100, 0, 2) == b"abc"
    assert ds.list_archive_batch_dirs("t", 0) == [(DAY_2017_07_19, 100, 0)]
