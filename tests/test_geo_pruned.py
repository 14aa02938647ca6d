"""bbox-pruned two-pass geo path (geo.matched_shape_pruned).

Contract: bit-equal to the dense matched_shape sweep for every eligible
shape batch — the pruned path's bbox skip must be conservative w.r.t. the
dense kernel's exact f32 crossing-test outcomes (see geo._build_prune_tables
docstring). Pure XLA, so the same code runs here on CPU and on TPU.
Reference peer: query/geo_intersects.cu ray-casts every pair; the pruning
pass has no reference counterpart (it beats that design).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aresdb_tpu.query import geo as G


def _dense(batch, lats, lngs, valid):
    return np.asarray(G.matched_shape(
        jnp.asarray(lats), jnp.asarray(lngs), jnp.asarray(valid),
        jnp.asarray(batch.slope), jnp.asarray(batch.lat1),
        jnp.asarray(batch.lng1), jnp.asarray(batch.lng2),
        jnp.asarray(batch.onehot), jnp.int32(batch.n_shapes)))


def _pruned(batch, lats, lngs, valid):
    m, ovf = G.matched_shape_pruned(
        jnp.asarray(lats), jnp.asarray(lngs), jnp.asarray(valid),
        jnp.asarray(batch.tab3), jnp.asarray(batch.bbox),
        jnp.int32(batch.n_shapes))
    return np.asarray(m), bool(ovf)


def _rand_polygon(rng, cx, cy, r, n_pts):
    ang = np.sort(rng.rand(n_pts) * 2 * np.pi)
    radii = r * (0.4 + 0.6 * rng.rand(n_pts))
    ring = [(float(cy + radii[i] * np.sin(ang[i])),
             float(cx + radii[i] * np.cos(ang[i]))) for i in range(n_pts)]
    ring.append(ring[0])
    return ring


def _points(rng, n, lo=0.0, hi=10.0):
    lats = (lo + rng.rand(n) * (hi - lo)).astype(np.float32)
    lngs = (lo + rng.rand(n) * (hi - lo)).astype(np.float32)
    valid = rng.rand(n) > 0.05
    return lats, lngs, valid


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_parity_random_shapes(seed):
    rng = np.random.RandomState(seed)
    shapes = []
    for _ in range(rng.randint(1, 40)):
        cx, cy = rng.rand(2) * 10
        polys = [_rand_polygon(rng, cx, cy, 0.3 + rng.rand(),
                               rng.randint(3, 20))]
        if rng.rand() < 0.3:  # hole
            polys.append(_rand_polygon(rng, cx, cy, 0.2, rng.randint(3, 8)))
        shapes.append(polys)
    batch = G.build_shape_batch(shapes, list(range(len(shapes))))
    assert batch.prune_ok
    lats, lngs, valid = _points(rng, 4096)
    m_d = _dense(batch, lats, lngs, valid)
    m_p, ovf = _pruned(batch, lats, lngs, valid)
    assert not ovf
    np.testing.assert_array_equal(m_p, m_d)
    assert (m_p >= 0).any()  # non-degenerate


def test_points_on_bbox_and_vertex_boundaries():
    """Exact-equality corners: points sharing coordinates with vertices,
    bbox edges, and horizontal/vertical polygon edges."""
    shapes = [
        [[(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0), (0.0, 0.0)]],
        [[(2.0, 2.0), (3.0, 2.5), (2.5, 3.5), (2.0, 2.0)]],
    ]
    batch = G.build_shape_batch(shapes, ["a", "b"])
    assert batch.prune_ok
    pts = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (0.5, 0.0), (0.5, 1.0),
           (0.0, 0.5), (1.0, 0.5), (0.5, 0.5), (2.0, 2.0), (2.5, 2.5),
           (3.0, 2.5), (2.5, 3.5), (-0.0, 0.5), (0.99999994, 0.99999994)]
    lats = np.array([p[0] for p in pts], np.float32)
    lngs = np.array([p[1] for p in pts], np.float32)
    valid = np.ones(len(pts), bool)
    m_d = _dense(batch, lats, lngs, valid)
    m_p, ovf = _pruned(batch, lats, lngs, valid)
    assert not ovf
    np.testing.assert_array_equal(m_p, m_d)


def test_near_edge_float_precision_parity():
    """Points a few ulps from edge lines: the margin must keep bbox skips
    consistent with the dense kernel's rounded line evaluations."""
    rng = np.random.RandomState(7)
    # steep near-vertical edges where line() rounding is worst
    shapes = [[[(0.0, 5.0), (1000.0, 5.0000048), (1000.0, 5.0001),
                (0.0, 5.00005), (0.0, 5.0)]]]
    batch = G.build_shape_batch(shapes, ["s"])
    assert batch.prune_ok
    base_lat = rng.rand(2048).astype(np.float32) * 1000
    base_lng = np.float32(5.00003) + (rng.randint(-20, 20, 2048)
                                      ).astype(np.float32) * np.float32(1e-7)
    valid = np.ones(2048, bool)
    m_d = _dense(batch, base_lat, base_lng, valid)
    m_p, ovf = _pruned(batch, base_lat, base_lng, valid)
    assert not ovf
    np.testing.assert_array_equal(m_p, m_d)


def test_overflow_reports_and_kernel_falls_back():
    """More than PRUNE_ROUNDS_CAP overlapping bboxes at one point."""
    shapes = []
    for i in range(G.PRUNE_ROUNDS_CAP + 3):
        d = 1.0 + i * 1e-3
        shapes.append([[(-d, -d), (-d, d), (d, d), (d, -d), (-d, -d)]])
    batch = G.build_shape_batch(shapes, list(range(len(shapes))))
    assert batch.prune_ok
    lats = np.zeros(64, np.float32)
    lngs = np.zeros(64, np.float32)
    valid = np.ones(64, bool)
    _, ovf = _pruned(batch, lats, lngs, valid)
    assert ovf


def test_open_ring_disables_pruning():
    shapes = [[[(0.0, 0.0), (0.0, 1.0), (1.0, 1.0)]]]  # not closed
    batch = G.build_shape_batch(shapes, ["x"])
    assert not batch.prune_ok


def test_too_many_edges_disables_pruning():
    ring = _rand_polygon(np.random.RandomState(0), 5, 5, 1.0,
                         G.PRUNE_MAX_EDGES + 10)
    batch = G.build_shape_batch([[ring]], ["x"])
    assert not batch.prune_ok


def test_invalid_and_padded_rows():
    shapes = [[[(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0),
                (0.0, 0.0)]]]
    batch = G.build_shape_batch(shapes, ["x"])
    n = 777  # not a chunk multiple
    rng = np.random.RandomState(3)
    lats, lngs, valid = _points(rng, n)
    lats[5] = np.nan
    m_d = _dense(batch, lats, lngs, valid)
    m_p, ovf = _pruned(batch, lats, lngs, valid)
    assert not ovf
    np.testing.assert_array_equal(m_p, m_d)
    assert (m_p[~valid] == -1).all()


def test_wkt_shape_is_prune_eligible():
    """Typical WKT-parsed zone polygons qualify for the pruned path (the
    geo e2e suite in test_geo.py then exercises it end-to-end, since
    ARES_GEO2 defaults on and the executor stages tab3/bbox)."""
    ring = [(20.0, 10.0), (20.0, 11.0), (21.0, 11.0), (20.0, 10.0)]
    batch = G.build_shape_batch([[ring]], ["u"])
    assert batch.prune_ok
    assert batch.tab3.shape[1] == G.PRUNE_S
    assert batch.bbox.shape == (4, G.PRUNE_S)
