"""Multi-chip executor path: ARES_MESH row-sharded execution end to end."""

import numpy as np
import pytest


def test_mesh_query_matches_single_chip(monkeypatch):
    import jax

    assert len(jax.devices()) >= 8
    from tests.test_query_e2e import make_store, NOW
    from aresdb_tpu.query.service import QueryService

    svc = QueryService(make_store())
    q = {"table": "trips",
         "measures": [{"sqlExpression": "sum(fare)"}],
         "dimensions": [{"sqlExpression": "status"}],
         "now": NOW}

    monkeypatch.delenv("ARES_MESH", raising=False)
    base = svc.handle_aql({"queries": [dict(q)]})["results"][0]

    monkeypatch.setenv("ARES_MESH", "1")
    mesh = svc.handle_aql({"queries": [dict(q)]})["results"][0]

    assert set(base) == set(mesh)
    for k in base:
        assert mesh[k] == pytest.approx(base[k], rel=1e-5)
