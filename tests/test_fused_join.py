"""Fused-kernel join lanes: joined columns resolved in the XLA prologue
and fed to the pallas kernel as materialized lanes (VERDICT r4 #4).

Checks that (a) join plans with bounded dims now QUALIFY for the fused
kernel (spec.fkeys non-empty — a silently-ineligible plan would pass any
parity test), and (b) full-service results are identical between
ARES_FUSED=interp and ARES_FUSED=0 across LUT and sorted-probe stagings.
Reference role: query/hash_lookup.cu:69 (device join probe).
"""

import os
import tempfile

import numpy as np
import pytest

from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common.schema import Table
from aresdb_tpu.common.upsert_batch import UpsertBatch, build_columnar_upsert
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore
from aresdb_tpu.query.aql import AQLQuery
from aresdb_tpu.query.compiler import Compiler
from aresdb_tpu.query.service import QueryService

NOW = 1_600_000_000


def _store(sparse_keys=False, seed=5, n=2048, nd=24):
    rng = np.random.RandomState(seed)
    root = tempfile.mkdtemp()
    ms = MemStore(DiskMetaStore(root), LocalDiskStore(root))
    ms.create_table(Table.from_json({
        "name": "t", "columns": [
            {"name": "ts", "type": "Uint32"},
            {"name": "id", "type": "Uint32"},
            {"name": "k", "type": "Uint32"},
            {"name": "v", "type": "Float32"}],
        "primaryKeyColumns": [1], "isFactTable": True,
        "config": {"batchSize": 4096, "recordRetentionInDays": 0}}))
    ms.create_table(Table.from_json({
        "name": "d", "columns": [
            {"name": "pk", "type": "Uint32"},
            {"name": "name", "type": "SmallEnum"},
            {"name": "w", "type": "Float32"}],
        "primaryKeyColumns": [0], "isFactTable": False,
        "config": {"batchSize": 128}}))
    ms.init_shards()
    ms.get_schemas()["d"].extend_enum(
        "name", [f"g{i}" for i in range(6)])
    if sparse_keys:
        pks = (rng.choice(100000, nd, replace=False) * 97).astype(np.uint32)
    else:
        pks = rng.choice(200, nd, replace=False).astype(np.uint32)
    grp = rng.randint(0, 6, nd).astype(np.uint8)
    w = (rng.rand(nd) * 100).astype(np.float32)
    ms.get_table_shard("d").save_upsert_batch(UpsertBatch(
        build_columnar_upsert([
            (0, dt.Uint32, pks, None, 0),
            (1, dt.SmallEnum, grp, None, 0),
            (2, dt.Float32, w, None, 0)], nd)))
    keys = rng.choice(np.concatenate(
        [pks, rng.randint(0, 1 << 20, nd // 2).astype(np.uint32)]),
        n).astype(np.uint32)
    kvalid = rng.rand(n) > 0.1
    v = (rng.rand(n) * 10).astype(np.float32)
    ms.get_table_shard("t").save_upsert_batch(UpsertBatch(
        build_columnar_upsert([
            (0, dt.Uint32, np.full(n, NOW - 100, np.uint32), None, 0),
            (1, dt.Uint32, np.arange(n, dtype=np.uint32), None, 0),
            (2, dt.Uint32, keys, kvalid, 0),
            (3, dt.Float32, v, None, 0)], n)))
    return ms


JOIN_Q = {
    "table": "t",
    "joins": [{"table": "d", "alias": "dd", "conditions": ["dd.pk = k"]}],
    "measures": [{"sqlExpression": "sum(v)",
                  "rowFilters": ["dd.w > 30"]}],
    "dimensions": [{"sqlExpression": "dd.name"}],
    "now": NOW,
}


def test_join_plan_qualifies_for_fused():
    from aresdb_tpu.query import fused_dense as FD
    from aresdb_tpu.query.dense import plan_dense

    ms = _store()
    plan = Compiler(ms.get_schemas()).compile(AQLQuery.from_json(JOIN_Q))
    dp = plan_dense(plan, None)
    assert dp is not None, "joined enum dim must be dense-plannable"
    spec = FD.plan_fused(plan, dp)
    assert spec is not None, "join plan must qualify for the fused kernel"
    assert spec.fkeys, "joined columns must materialize as kernel lanes"
    # dd.name (SmallEnum dim) and dd.w (Float32 filter) both join lanes
    assert len(spec.fkeys) == 2


@pytest.mark.parametrize("sparse", [False, True])
def test_fused_join_matches_xla(sparse):
    ms = _store(sparse_keys=sparse)
    q = dict(JOIN_Q)

    os.environ["ARES_FUSED"] = "interp"
    try:
        r_fused = QueryService(ms).handle_aql({"queries": [q]})
    finally:
        os.environ["ARES_FUSED"] = "0"
    try:
        r_xla = QueryService(ms).handle_aql({"queries": [q]})
    finally:
        del os.environ["ARES_FUSED"]
    assert not r_fused.get("errors"), r_fused.get("errors")
    assert not r_xla.get("errors"), r_xla.get("errors")
    a, b = r_fused["results"][0], r_xla["results"][0]
    assert set(a) == set(b)
    for k in a:
        assert abs(float(a[k]) - float(b[k])) <= \
            max(1e-6, abs(float(b[k])) * 2e-4), (k, a[k], b[k])
