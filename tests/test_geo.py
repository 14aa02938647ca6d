"""Geo intersection tests (parity: query/geo_intersects.cu behaviors)."""

import numpy as np
import pytest

from aresdb_tpu.common import data_types as dt
from aresdb_tpu.common.schema import Table, TableSchema
from aresdb_tpu.common.upsert_batch import UpsertBatch, UpsertBatchBuilder
from aresdb_tpu.memstore.table_shard import TableShard
from aresdb_tpu.query.service import QueryService
from aresdb_tpu.query import geo as G

NOW = 1_600_000_000

TRIPS = {
    "name": "trips",
    "columns": [
        {"name": "request_at", "type": "Uint32"},
        {"name": "id", "type": "Uint32"},
        {"name": "request_point", "type": "GeoPoint"},
        {"name": "fare", "type": "Float32"},
    ],
    "primaryKeyColumns": [1],
    "isFactTable": True,
    "config": {"batchSize": 64, "recordRetentionInDays": 0},
}

ZONES = {
    "name": "zones",
    "columns": [
        {"name": "geo_uuid", "type": "UUID"},
        {"name": "shape", "type": "GeoShape"},
    ],
    "primaryKeyColumns": [0],
    "isFactTable": False,
    "config": {"batchSize": 16},
}


def test_wkt_parse_roundtrip():
    shape = dt.parse_geoshape("POLYGON ((10.0 20.0, 11.0 20.0, 11.0 21.0, 10.0 20.0))")
    # WKT order is (lng, lat); stored as (lat, lng)
    assert shape[0][0] == (20.0, 10.0)
    blob = dt.serialize_geoshape(shape)
    assert dt.deserialize_geoshape(blob) == shape


def test_matched_shape_unit():
    import jax.numpy as jnp
    # unit square [0,1]x[0,1] and a distant square [10,11]^2
    shapes = [
        [[(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0), (0.0, 0.0)]],
        [[(10.0, 10.0), (10.0, 11.0), (11.0, 11.0), (11.0, 10.0), (10.0, 10.0)]],
    ]
    batch = G.build_shape_batch(shapes, ["a", "b"])
    lats = jnp.asarray(np.array([0.5, 10.5, 5.0, 0.99], np.float32))
    lngs = jnp.asarray(np.array([0.5, 10.5, 5.0, 0.01], np.float32))
    # pad rows to a tile multiple
    pad = G.ROW_TILE - lats.shape[0] % G.ROW_TILE
    lats = jnp.concatenate([lats, jnp.zeros(pad, jnp.float32) + 99])
    lngs = jnp.concatenate([lngs, jnp.zeros(pad, jnp.float32) + 99])
    valid = jnp.ones(lats.shape[0], bool)
    m = np.asarray(G.matched_shape(
        lats, lngs, valid, jnp.asarray(batch.slope), jnp.asarray(batch.lat1),
        jnp.asarray(batch.lng1), jnp.asarray(batch.lng2),
        jnp.asarray(batch.onehot), jnp.int32(batch.n_shapes)))
    assert m[0] == 0
    assert m[1] == 1
    assert m[2] == -1
    assert m[3] == 0


def test_shape_with_hole():
    import jax.numpy as jnp
    # outer [0,4]^2 with hole [1,3]^2 — even-odd ray casting
    shapes = [[
        [(0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0)],
        [(1.0, 1.0), (1.0, 3.0), (3.0, 3.0), (3.0, 1.0), (1.0, 1.0)],
    ]]
    batch = G.build_shape_batch(shapes, ["x"])
    lats = np.full(G.ROW_TILE, 99.0, np.float32)
    lngs = np.full(G.ROW_TILE, 99.0, np.float32)
    lats[0], lngs[0] = 0.5, 0.5   # in outer ring
    lats[1], lngs[1] = 2.0, 2.0   # inside the hole
    m = np.asarray(G.matched_shape(
        jnp.asarray(lats), jnp.asarray(lngs), jnp.ones(G.ROW_TILE, bool),
        jnp.asarray(batch.slope), jnp.asarray(batch.lat1),
        jnp.asarray(batch.lng1), jnp.asarray(batch.lng2),
        jnp.asarray(batch.onehot), jnp.int32(batch.n_shapes)))
    assert m[0] == 0
    assert m[1] == -1


@pytest.fixture(scope="module")
def geo_service():
    from tests.test_query_e2e import FakeMemStore

    store = FakeMemStore()
    store.create(TRIPS)
    store.create(ZONES)

    zb = UpsertBatchBuilder()
    zb.add_column(0, dt.UUID)
    zb.add_column(1, dt.GeoShape)
    zones = [
        ((1, 0), "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),      # lng lat!
        ((2, 0), "POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))"),
    ]
    for i, (uid, wkt) in enumerate(zones):
        zb.add_row()
        zb.set_value(i, 0, uid)
        zb.set_value(i, 1, dt.parse_geoshape(wkt))
    store.get_table_shard("zones").save_upsert_batch(UpsertBatch(zb.to_bytes()))

    tb = UpsertBatchBuilder()
    tb.add_column(0, dt.Uint32)
    tb.add_column(1, dt.Uint32)
    tb.add_column(2, dt.GeoPoint)
    tb.add_column(3, dt.Float32)
    # points: 3 in zone A, 2 in zone B, 1 outside
    pts = [(0.5, 0.5), (0.2, 0.8), (0.9, 0.1), (10.5, 10.5), (10.1, 10.9),
           (50.0, 50.0)]
    for i, (lat, lng) in enumerate(pts):
        tb.add_row()
        tb.set_value(i, 0, NOW - 100 - i)
        tb.set_value(i, 1, i)
        tb.set_value(i, 2, (lat, lng))
        tb.set_value(i, 3, float(i + 1))
    store.get_table_shard("trips").save_upsert_batch(UpsertBatch(tb.to_bytes()))
    return QueryService(store)


def _zone_uuid(n):
    return dt.uuid_to_string(n, 0)


def test_geo_filter_in(geo_service):
    resp = geo_service.handle_aql({"queries": [{
        "table": "trips",
        "joins": [{"table": "zones", "alias": "g",
                   "conditions": ["geography_intersects(g.shape, request_point)"]}],
        "measures": [{"sqlExpression": "count(*)",
                      "rowFilters": [f"g.geo_uuid IN ('{_zone_uuid(1)}')"]}],
        "now": NOW}]})
    assert "errors" not in resp, resp.get("errors")
    assert resp["results"][0][""] == 3.0


def test_geo_filter_not_in(geo_service):
    resp = geo_service.handle_aql({"queries": [{
        "table": "trips",
        "joins": [{"table": "zones", "alias": "g",
                   "conditions": ["geography_intersects(g.shape, request_point)"]}],
        "measures": [{"sqlExpression": "count(*)",
                      "rowFilters": [f"g.geo_uuid NOT IN ('{_zone_uuid(1)}')"]}],
        "now": NOW}]})
    assert "errors" not in resp, resp.get("errors")
    assert resp["results"][0][""] == 3.0  # 2 in zone B + 1 outside


def test_geo_dimension(geo_service):
    resp = geo_service.handle_aql({"queries": [{
        "table": "trips",
        "joins": [{"table": "zones", "alias": "g",
                   "conditions": ["geography_intersects(g.shape, request_point)"]}],
        "measures": [{"sqlExpression": "sum(fare)"}],
        "dimensions": [{"sqlExpression": "g.geo_uuid"}],
        "rowFilters": [
            f"g.geo_uuid IN ('{_zone_uuid(1)}', '{_zone_uuid(2)}')"],
        "now": NOW}]})
    assert "errors" not in resp, resp.get("errors")
    r = resp["results"][0]
    # geo dims render NORMALIZED uuids (uppercase, no dashes) — reference
    # utils.NormalizeUUIDString via aql_postprocessor.go:200
    def norm(u):
        return u.replace("-", "").upper()
    assert r[norm(_zone_uuid(1))] == pytest.approx(1 + 2 + 3)
    assert r[norm(_zone_uuid(2))] == pytest.approx(4 + 5)
    assert "NULL" not in r  # the geo filter drops unmatched rows


def test_geo_join_requires_filter(geo_service):
    """Reference parity (aql_compiler.go:845): a geo-intersection join
    without a geo filter is a compile error."""
    resp = geo_service.handle_aql({"queries": [{
        "table": "trips",
        "joins": [{"table": "zones", "alias": "g",
                   "conditions": ["geography_intersects(g.shape, request_point)"]}],
        "measures": [{"sqlExpression": "count(*)"}],
        "now": NOW}]})
    assert "geo filter" in resp["errors"][0]


def test_geo_filter_empty_candidates(geo_service):
    """A geo filter whose candidate UUIDs match NO shapes must return an
    empty result, not crash (the empty placeholder batch must stay
    shape-consistent with matched_shape's block-parity dot)."""
    resp = geo_service.handle_aql({"queries": [{
        "table": "trips",
        "joins": [{"table": "zones", "alias": "g",
                   "conditions": ["geography_intersects(g.shape, request_point)"]}],
        "measures": [{"sqlExpression": "count(*)",
                      "rowFilters": [f"g.geo_uuid IN ('{_zone_uuid(99)}')"]}],
        "now": NOW}]})
    assert "errors" not in resp, resp.get("errors")
    assert resp["results"][0] in ({}, {"": 0.0})


def test_matched_shape_steep_edge_precision():
    """Near-vertical edge at large longitude: the line test must stay
    accurate (a plain slope*p+icept fma loses ~2^-10 relative here)."""
    import jax.numpy as jnp
    # triangle with a near-vertical edge spanning lng [100.0, 100.0001]
    shapes = [[[(0.0, 100.0), (1.0, 100.0001), (0.0, 100.0002),
                (0.0, 100.0)]]]
    batch = G.build_shape_batch(shapes, ["s"])
    lats = np.full(G.ROW_TILE, 99.0, np.float32)
    lngs = np.full(G.ROW_TILE, 0.0, np.float32)
    lats[0], lngs[0] = 0.5, 100.0001       # inside, near the apex
    lats[1], lngs[1] = 0.99, 100.00005     # outside (above the left edge)
    m = np.asarray(G.matched_shape(
        jnp.asarray(lats), jnp.asarray(lngs), jnp.ones(G.ROW_TILE, bool),
        jnp.asarray(batch.slope), jnp.asarray(batch.lat1),
        jnp.asarray(batch.lng1), jnp.asarray(batch.lng2),
        jnp.asarray(batch.onehot), jnp.int32(batch.n_shapes)))
    assert m[0] == 0
    assert m[1] == -1
