"""arescli shell: dispatch + rendering against a live ApiServer.

Reference: cmd/arescli (ishell shell — show tables, multi-line AQL/SQL).
"""

from __future__ import annotations

import io
import json

import numpy as np
import pytest

from aresdb_tpu.cmd.arescli import Shell, flatten_result, render_table

NOW = 1_600_000_000


@pytest.fixture(scope="module")
def server():
    import tempfile

    from aresdb_tpu.api.server import ApiServer
    from aresdb_tpu.common import data_types as dt
    from aresdb_tpu.common.schema import Table
    from aresdb_tpu.common.upsert_batch import build_columnar_upsert, UpsertBatch
    from aresdb_tpu.diskstore.local_diskstore import LocalDiskStore
    from aresdb_tpu.memstore.memstore import MemStore
    from aresdb_tpu.memstore.scheduler import Scheduler
    from aresdb_tpu.metastore.disk_metastore import DiskMetaStore

    root = tempfile.mkdtemp()
    ms = MemStore(DiskMetaStore(root), LocalDiskStore(root))
    ms.create_table(Table.from_json({
        "name": "trips",
        "columns": [
            {"name": "ts", "type": "Uint32"},
            {"name": "id", "type": "Uint32"},
            {"name": "fare", "type": "Float32"}],
        "primaryKeyColumns": [1], "isFactTable": True,
        "config": {"batchSize": 4096, "recordRetentionInDays": 0}}))
    ms.init_shards()
    n = 100
    buf = build_columnar_upsert([
        (0, dt.Uint32, np.full(n, NOW - 100, np.uint32), None, 0),
        (1, dt.Uint32, np.arange(n, dtype=np.uint32), None, 0),
        (2, dt.Float32, np.arange(n, dtype=np.float32), None, 0),
    ], n)
    ms.handle_ingestion("trips", 0, UpsertBatch(buf))
    srv = ApiServer(ms, Scheduler(ms), port=0)
    port = srv.start_background()
    yield port
    srv.stop()


def _shell(port):
    out, err = io.StringIO(), io.StringIO()
    return Shell("localhost", port, out=out, err=err), out, err


def test_show_tables_and_desc(server):
    sh, out, err = _shell(server)
    assert sh.dispatch("show tables")
    assert "trips" in out.getvalue()
    assert sh.dispatch("desc trips")
    text = out.getvalue()
    assert "fare" in text and "Float32" in text and "pk" in text
    assert err.getvalue() == ""


def test_sql_statement_renders_table(server):
    sh, out, err = _shell(server)
    sh.timing = True
    assert sh.dispatch(
        f"SELECT count(*) FROM trips WHERE aql_now(ts, {NOW})  ;")
    text = out.getvalue()
    assert "100" in text and "ms)" in text
    assert err.getvalue() == ""


def test_aql_json_statement(server):
    sh, out, _ = _shell(server)
    q = json.dumps({"table": "trips", "now": NOW,
                    "measures": [{"sqlExpression": "sum(fare)"}]})
    assert sh.dispatch(q)
    assert "4950" in out.getvalue()


def test_json_format_and_verbose_stats(server):
    sh, out, _ = _shell(server)
    sh.format = "json"
    sh.verbose = True
    q = json.dumps({"table": "trips", "now": NOW,
                    "measures": [{"sqlExpression": "count(*)"}]})
    assert sh.dispatch(q)
    text = out.getvalue()
    assert '"": 100' in text.replace(" 100.0", " 100")
    assert "stats:" in text  # verbose pass-through


def test_error_statement_reported_not_fatal(server):
    sh, out, err = _shell(server)
    assert sh.dispatch("SELECT count(*) FROM nope")
    assert "error:" in err.getvalue() or "nope" in err.getvalue()
    # shell keeps working afterwards
    assert sh.dispatch("show tables")
    assert "trips" in out.getvalue()


def test_connect_retargets_and_configs(server):
    sh, out, _ = _shell(server)
    assert sh.dispatch(f"connect localhost {server}")
    assert sh.dispatch("show configs")
    assert str(server) in out.getvalue()
    assert sh.dispatch("timing on")
    assert sh.timing


def test_source_file(server, tmp_path):
    p = tmp_path / "stmts.sql"
    p.write_text(f"SELECT count(*) FROM trips WHERE aql_now(ts, {NOW});\n"
                 "show tables;\n")
    sh, out, err = _shell(server)
    assert sh.dispatch(f"source {p}")
    text = out.getvalue()
    assert "100" in text and "trips" in text
    assert err.getvalue() == ""


def test_exit_returns_false(server):
    sh, _, _ = _shell(server)
    assert sh.dispatch("exit") is False


def test_render_helpers():
    t = render_table(["a", "bb"], [[1, 22], [333, 4]])
    assert "| a   | bb |" in t
    rows = flatten_result({"x": {"1": 2.0}, "y": 3.0})
    assert rows == [("x", "1", 2.0), ("y", 3.0)]
