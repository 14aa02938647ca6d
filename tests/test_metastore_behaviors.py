"""DiskMetaStore behavioral parity (metastore/disk_metastore_test.go).

Table-driven replay of the reference suite's scenarios against OUR disk
metastore: table CRUD, enum files, progress checkpoints (archiving
cutoff / redolog / backfill / kafka / snapshot) with their zero
defaults, watcher events, and the archive-batch-version file whose line
format is a byte-exact on-disk parity surface
('version,size' / 'version-seqNum,size', disk_metastore_test.go:611-646).
"""

import os

import pytest

from aresdb_tpu.common.schema import Table
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore


def _table(name="tbl", fact=True):
    return Table.from_json({
        "name": name,
        "columns": [
            {"name": "t", "type": "Uint32"},
            {"name": "id", "type": "Uint32"},
            {"name": "status", "type": "SmallEnum",
             "defaultValue": "active"},
        ],
        "primaryKeyColumns": [1],
        "isFactTable": fact,
        "config": {"batchSize": 16},
    })


@pytest.fixture
def ms(tmp_path):
    return DiskMetaStore(str(tmp_path))


@pytest.fixture
def root(tmp_path):
    return tmp_path / "metastore"


def test_list_get_delete_table(ms):
    assert ms.list_tables() == []
    ms.create_table(_table("a"))
    ms.create_table(_table("b"))
    assert sorted(ms.list_tables()) == ["a", "b"]
    assert ms.get_table("a").name == "a"
    ms.delete_table("a")
    assert ms.list_tables() == ["b"]


def test_create_duplicate_table_rejected(ms):
    # disk_metastore_test.go:431 CreateTable: "table already exists"
    ms.create_table(_table("a"))
    with pytest.raises(Exception):
        ms.create_table(_table("a"))


def test_enum_extend_dedup_and_read(ms):
    # disk_metastore_test.go:602 ExtendEnumDict — appended cases get ranks
    # after the existing ones; duplicates keep their first rank
    ms.create_table(_table("a"))
    first = ms.extend_enum_cases("a", "status", ["x", "y"])
    again = ms.extend_enum_cases("a", "status", ["y", "z"])
    cases = ms.get_enum_cases("a", "status")
    assert cases[first[0]] == "x" and cases[first[1]] == "y"
    assert again[0] == first[1]          # 'y' keeps its rank
    assert cases[again[1]] == "z"


def test_enum_watch_events(ms):
    ms.create_table(_table("a"))
    seen = []
    ms.watch_enums(lambda t, c, cases: seen.append((t, c, list(cases))))
    ms.extend_enum_cases("a", "status", ["x"])
    assert seen and seen[-1][0] == "a" and seen[-1][1] == "status"
    assert "x" in seen[-1][2]


def test_schema_watch_events(ms):
    ms.create_table(_table("a"))
    seen = []
    ms.watch_schema(lambda t: seen.append(t.name))
    t = ms.get_table("a")
    ms.update_table(t)
    assert seen and seen[-1] == "a"


def test_progress_defaults_and_roundtrips(ms):
    # reference: Get* return zeros for missing files
    # (disk_metastore_test.go:274-372 + readRedoLogFileAndOffset:717)
    ms.create_table(_table("a"))
    assert ms.get_archiving_cutoff("a", 0) == 0
    assert ms.get_redolog_checkpoint("a", 0) == (0, 0)
    assert ms.get_backfill_progress("a", 0) == (0, 0)
    assert ms.get_snapshot_progress("a", 0) == (0, 0, 0, 0)
    assert ms.get_kafka_commit_offset("a", 0) == 0
    assert ms.get_kafka_checkpoint_offset("a", 0) == 0

    ms.update_archiving_cutoff("a", 0, 100)
    assert ms.get_archiving_cutoff("a", 0) == 100
    ms.update_redolog_checkpoint("a", 0, 123, 456)
    assert ms.get_redolog_checkpoint("a", 0) == (123, 456)
    ms.update_backfill_progress("a", 0, 1, 20)
    assert ms.get_backfill_progress("a", 0) == (1, 20)
    ms.update_snapshot_progress("a", 0, 1, 2, 3, 4)
    assert ms.get_snapshot_progress("a", 0) == (1, 2, 3, 4)
    ms.update_kafka_commit_offset("a", 0, 77)
    assert ms.get_kafka_commit_offset("a", 0) == 77
    ms.update_kafka_checkpoint_offset("a", 0, 88)
    assert ms.get_kafka_checkpoint_offset("a", 0) == 88


def test_progress_file_formats(ms, root):
    """On-disk formats match the reference root layout: 'version' holds
    the bare cutoff, 'redolog-offset' holds 'file,offset', 'snapshot'
    holds 'file,offset,batch,index' (writeArchivingCutoff golden '1',
    disk_metastore_test.go:765)."""
    ms.create_table(_table("a"))
    ms.update_archiving_cutoff("a", 0, 1)
    shard = root / "a" / "shards" / "0"
    assert (shard / "version").read_bytes() == b"1"
    ms.update_redolog_checkpoint("a", 0, 1, 1)
    assert (shard / "redolog-offset").read_bytes() == b"1,1"
    ms.update_snapshot_progress("a", 0, 1, 2, 3, 4)
    assert (shard / "snapshot").read_bytes() == b"1,2,3,4"


def test_archive_batch_version_line_format(ms, root):
    # golden bytes from disk_metastore_test.go:611-626
    ms.create_table(_table("c"))
    ms.add_archive_batch_version("c", 0, 1, 1, 0, 10)
    p = root / "c" / "shards" / "0" / "batches" / "1"
    assert p.read_bytes() == b"1,10\n"
    ms.add_archive_batch_version("c", 0, 1, 1, 2, 15)
    assert p.read_bytes() == b"1,10\n1-2,15\n"


def test_get_archive_batches_cutoff(ms, root):
    """GetArchiveBatchVersion semantics (disk_metastore_test.go:627):
    latest version <= cutoff wins; batches with no version <= cutoff are
    absent."""
    ms.create_table(_table("c"))
    p = root / "c" / "shards" / "0" / "batches"
    os.makedirs(p)
    (p / "1").write_bytes(b"1,10\n2,20\n4,40\n")
    assert ms.get_archive_batches("c", 0, cutoff=5)[1] == (4, 0, 40)
    assert ms.get_archive_batches("c", 0, cutoff=3)[1] == (2, 0, 20)
    (p / "1").write_bytes(b"2,20\n4,40\n")
    assert 1 not in ms.get_archive_batches("c", 0, cutoff=1)
    # seqNum ordering within a version
    (p / "2").write_bytes(b"3,30\n3-2,35\n")
    assert ms.get_archive_batches("c", 0)[2] == (3, 2, 35)


def test_get_archive_batches_reads_legacy_lines(ms, root):
    # round-1/2 roots wrote 'version,seq,size'; reads must keep working
    ms.create_table(_table("c"))
    p = root / "c" / "shards" / "0" / "batches"
    os.makedirs(p)
    (p / "7").write_bytes(b"1,0,10\n2,1,25\n")
    assert ms.get_archive_batches("c", 0)[7] == (2, 1, 25)


def test_purge_archive_batches(ms, root):
    # PurgeArchiveBatches (disk_metastore_test.go:695): removes metadata
    # below the cutoff; missing dir is fine
    ms.create_table(_table("c"))
    assert ms.purge_archive_batches("c", 0, 10) == []
    ms.add_archive_batch_version("c", 0, 1, 1, 0, 10)
    ms.add_archive_batch_version("c", 0, 2, 1, 0, 10)
    assert ms.purge_archive_batches("c", 0, 2) == [1]
    assert sorted(ms.get_archive_batches("c", 0)) == [2]
