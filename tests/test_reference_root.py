"""Cold-start from the reference's own on-disk data root.

The reference integration test boots aresd over
testing/data/integration/sample-ares-root (integration/config/ares.yaml) —
a metastore written by the reference's disk metastore (schema json, enum
file with the "\\u0000\\n" EnumDelimiter, metastore/common/data_type.go:19)
plus a 2017-era binary redolog (magic 0xADDAFEED, a version-0xFEED0001
upsert batch). Loading it through OUR metastore + recovery proves the
on-disk surfaces are byte-compatible, not merely shaped alike.
"""

import os
import shutil

import pytest

from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore, ENUM_DELIMITER
from aresdb_tpu.query.service import QueryService

SAMPLE_ROOT = "/root/reference/testing/data/integration/sample-ares-root"


@pytest.fixture()
def ref_root(tmp_path):
    root = tmp_path / "ares-root"
    shutil.copytree(SAMPLE_ROOT, root)
    os.chmod(root, 0o755)
    for dirpath, dirnames, filenames in os.walk(root):
        for d in dirnames:
            os.chmod(os.path.join(dirpath, d), 0o755)
        for f in filenames:
            os.chmod(os.path.join(dirpath, f), 0o644)
    return str(root)


def boot(root):
    ms = MemStore(DiskMetaStore(root), LocalDiskStore(root))
    ms.fetch_schema()
    ms.init_shards()
    return ms


def test_schema_parses(ref_root):
    meta = DiskMetaStore(ref_root)
    t = meta.get_table("abc")
    assert [c.name for c in t.columns] == ["c1", "c2"]
    assert [c.type for c in t.columns] == ["Uint8", "SmallEnum"]
    assert t.primary_key_columns == [0]
    assert not t.is_fact_table
    assert t.config.batch_size == 10
    assert t.archiving_sort_columns == [0, 1]


def test_enum_file_parses_with_reference_delimiter(ref_root):
    meta = DiskMetaStore(ref_root)
    # the reference fixture contains an EMPTY enum case at rank 2
    assert meta.get_enum_cases("abc", "c2") == ["case1", "case2", "", "case3"]


def test_enum_append_roundtrip_is_reference_format(tmp_path):
    meta = DiskMetaStore(str(tmp_path))
    os.makedirs(os.path.join(meta.root, "t"), exist_ok=True)
    meta.extend_enum_cases("t", "col", ["a b", "", "c,d"])
    raw = open(os.path.join(meta.root, "t", "enums", "col"),
               encoding="utf-8").read()
    assert raw == "a b" + ENUM_DELIMITER + ENUM_DELIMITER + "c,d" + ENUM_DELIMITER
    assert meta.get_enum_cases("t", "col") == ["a b", "", "c,d"]


def test_redolog_replays_and_queries(ref_root):
    ms = boot(ref_root)
    shard = ms.get_table_shard("abc", 0)
    # the 2017 redolog holds one upsert batch of two rows:
    # (c1=123, c2=rank 0 "case1") and (c1=234, c2=rank 1 "case2")
    assert shard.live_store.rows_visible() == 2

    svc = QueryService(ms)
    resp = svc.handle_aql({"queries": [{
        "table": "abc",
        "dimensions": [{"sqlExpression": "c2"}],
        "measures": [{"sqlExpression": "count(*)"}],
    }]})
    assert "errors" not in resp or not any(resp.get("errors", []))
    results = resp["results"][0]
    assert results == {"case1": 1, "case2": 1}


def test_restart_after_replay_is_stable(ref_root):
    boot(ref_root)
    # boot a second time over the same root — replay must be idempotent
    ms2 = boot(ref_root)
    assert ms2.get_table_shard("abc", 0).live_store.rows_visible() == 2
