"""Join differential fuzz: random fact+dim tables, both probe stagings
(dense LUT for small key domains, sorted+searchsorted for sparse), checked
against a host oracle (reference: hash_lookup.cu join semantics)."""

import tempfile

import numpy as np
from aresdb_tpu.common.schema import Table
from aresdb_tpu.common.upsert_batch import build_columnar_upsert, UpsertBatch
from aresdb_tpu.common import data_types as dt
from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
from aresdb_tpu.memstore.memstore import MemStore
from aresdb_tpu.metastore.disk_metastore import DiskMetaStore
from aresdb_tpu.query.service import QueryService

NOW = 1_600_000_000


def test_join_differential():
    fails = 0
    for seed in range(4):
        rng = np.random.RandomState(9000 + seed)
        root = tempfile.mkdtemp()
        ms = MemStore(DiskMetaStore(root), LocalDiskStore(root))
        ms.create_table(Table.from_json({
            "name": "t", "columns": [
                {"name": "ts", "type": "Uint32"}, {"name": "id", "type": "Uint32"},
                {"name": "k", "type": "Uint32"}, {"name": "v", "type": "Float32"}],
            "primaryKeyColumns": [1], "isFactTable": True,
            "config": {"batchSize": 512, "recordRetentionInDays": 0}}))
        ms.create_table(Table.from_json({
            "name": "d", "columns": [
                {"name": "pk", "type": "Uint32"}, {"name": "grp", "type": "Uint16"},
                {"name": "w", "type": "Float32"}],
            "primaryKeyColumns": [0], "isFactTable": False,
            "config": {"batchSize": 128}}))
        ms.init_shards()

        n = rng.randint(500, 3000)
        nd = rng.randint(3, 60)
        # sparse or dense foreign key space: exercises both LUT and searchsorted
        if seed % 2:
            pks = rng.choice(200, nd, replace=False).astype(np.uint32)        # dense LUT
        else:
            pks = (rng.choice(100000, nd, replace=False) * 97).astype(np.uint32)  # sparse → sorted path
        grp = rng.randint(0, 6, nd).astype(np.uint16)
        w = rng.rand(nd).astype(np.float32)
        wvalid = rng.rand(nd) > 0.2
        keys = rng.choice(np.concatenate([pks, rng.randint(0, 1 << 22, max(1, nd // 2)).astype(np.uint32)]), n).astype(np.uint32)
        kvalid = rng.rand(n) > 0.1
        v = rng.rand(n).astype(np.float32)

        shard_d = ms.get_table_shard("d")
        shard_d.save_upsert_batch(UpsertBatch(build_columnar_upsert([
            (0, dt.Uint32, pks, None, 0), (1, dt.Uint16, grp, None, 0),
            (2, dt.Float32, w, wvalid, 0)], nd)))
        shard_t = ms.get_table_shard("t")
        shard_t.save_upsert_batch(UpsertBatch(build_columnar_upsert([
            (0, dt.Uint32, np.full(n, NOW - 100, np.uint32), None, 0),
            (1, dt.Uint32, np.arange(n, dtype=np.uint32), None, 0),
            (2, dt.Uint32, keys, kvalid, 0),
            (3, dt.Float32, v, None, 0)], n)))
        svc = QueryService(ms)

        pk_to_row = {int(p): i for i, p in enumerate(pks)}
        hit = np.array([kvalid[i] and int(keys[i]) in pk_to_row for i in range(n)])
        rowix = np.array([pk_to_row.get(int(keys[i]), 0) for i in range(n)])

        # 1. sum(v) grouped by d.grp
        resp = svc.handle_aql({"queries": [{
            "table": "t",
            "joins": [{"table": "d", "alias": "dd", "conditions": ["dd.pk = k"]}],
            "measures": [{"sqlExpression": "sum(v)"}],
            "dimensions": [{"sqlExpression": "dd.grp"}], "now": NOW}]})
        assert "errors" not in resp, resp["errors"]
        got = resp["results"][0]
        exp = {}
        for i in range(n):
            key = str(int(grp[rowix[i]])) if hit[i] else "NULL"
            exp[key] = exp.get(key, 0.0) + float(v[i])
        for kk, ev in exp.items():
            gv = got.get(kk)
            if gv is None or abs(gv - ev) > max(1e-2, 1e-4 * abs(ev)):
                print("FAIL sum", seed, kk, gv, ev); fails += 1
        if set(got) != set(exp):
            print("FAIL groups", seed, set(got) ^ set(exp)); fails += 1

        # 2. filter on foreign float with nulls: count where dd.w > 0.5
        resp = svc.handle_aql({"queries": [{
            "table": "t",
            "joins": [{"table": "d", "alias": "dd", "conditions": ["dd.pk = k"]}],
            "measures": [{"sqlExpression": "count(*)",
                          "rowFilters": ["dd.w > 0.5"]}], "now": NOW}]})
        if resp.get("errors") and resp["errors"][0]:
            print("FAIL filter errors", seed, resp["errors"]); fails += 1; continue
        got2 = resp["results"][0].get("", 0.0)
        exp2 = float(sum(1 for i in range(n)
                         if hit[i] and wvalid[rowix[i]] and w[rowix[i]] > 0.5))
        if got2 != exp2:
            print("FAIL filter", seed, got2, exp2); fails += 1
    assert fails == 0
