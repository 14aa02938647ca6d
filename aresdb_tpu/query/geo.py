"""Geo intersection: batch point-in-polygon, VPU crossing test + MXU parity.

Reference: query/geo_intersects.cu (ray casting, one thread per
(point, edge), atomicXor into per-shape parity bits) and
query/iterator.hpp:1322 GeoBatchIntersectIterator (the exact crossing test).

TPU redesign: per row-tile, evaluate the crossing test for ALL edges at once
([T, E] elementwise), then reduce crossings per shape in two stages:
block-sum over each shape's BLOCK-padded edge runs ([T, E] -> [T, E/BLOCK]
on the VPU), then one small [T, E/BLOCK] @ [E/BLOCK, S] bf16 matmul against
the static block->shape one-hot — BLOCK x fewer MXU FLOPs than the naive
[T, E] @ [E, S] parity matmul. Crossing-count parity (odd = inside) gives
the same even-odd semantics as the reference's XOR, including holes.

Per-edge slopes are precomputed on the host so the hot [T, E] test has no
per-(point, edge) division, and padding edges are degenerate
(lng1 == lng2), which the crossing condition rejects by construction (no
separate edge-validity lane). The line test keeps the reference's
cancellation-free form slope*(p - lng1) + lat1 — a plain slope*p + icept
fma loses ~2^-10 relative precision for steep edges at large longitudes
(icept magnitudes reach 1e8 where the f32 ulp is 8.0).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from aresdb_tpu.utils import jax_env

jax_env.ensure()

import jax
import jax.numpy as jnp

MAX_SHAPES = 256        # reference uses an 8-bit shape index (uint8)
ROW_TILE = 1024
BLOCK = 32              # edges per block-sum lane (counts stay bf16-exact)

# bbox-pruned two-pass path (matched_shape_pruned) eligibility limits
PRUNE_S = 128           # shapes padded to one MXU K tile
PRUNE_MAX_EDGES = 128   # per-shape slab cap (gather dot M = 4*e_max*3)
PRUNE_ROUNDS_CAP = 32   # more bbox overlaps than this -> dense fallback
PRUNE_CHUNK = 4096      # points per lax.map chunk (measured best on v5e)


@dataclass
class GeoShapeBatch:
    """Host-staged shapes: per-edge line params + block->shape one-hot.

    Each shape's edges are padded to a BLOCK multiple with degenerate
    edges (lng1 == lng2 == 0), so every block belongs to exactly one shape.

    When prune_ok, tab3/bbox additionally stage the bbox-pruned path:
    tab3 [3·4·e_max, PRUNE_S] bf16 holds each shape's edge slab
    (lng1|lng2|lat1|slope blocks) split into exact bf16 hi/mid/lo parts
    (3×8 significand bits reconstruct any f32 exactly), and bbox
    [4, PRUNE_S] f32 holds conservative per-shape (lo_lng, hi_lng,
    lo_lat−margin, hi_lat+margin) bounds.
    """

    slope: np.ndarray       # f32[E]  (lat2-lat1)/(lng2-lng1); 0 if vertical
    lat1: np.ndarray        # f32[E]  edge start latitude
    lng1: np.ndarray        # f32[E]
    lng2: np.ndarray        # f32[E]
    onehot: np.ndarray      # f32[E/BLOCK, S_padded] block->shape
    n_shapes: int
    shape_values: List = field(default_factory=list)  # pk value per shape
    tab3: Optional[np.ndarray] = None    # bf16 [3*4*e_max, PRUNE_S]
    bbox: Optional[np.ndarray] = None    # f32 [4, PRUNE_S]
    prune_ok: bool = False


def build_shape_batch(shapes: List[List[List[Tuple[float, float]]]],
                      shape_values: List) -> Optional[GeoShapeBatch]:
    """shapes: per shape, list of rings of (lat, lng) vertices."""
    if not shapes:
        return None
    if len(shapes) > MAX_SHAPES:
        raise ValueError(
            f"geo intersection supports at most {MAX_SHAPES} shapes, "
            f"got {len(shapes)}")
    lat1, lat2, lng1, lng2 = [], [], [], []
    blk_sid = []
    shape_runs = []          # (padded_start, n_real_edges) per shape
    rings_closed = True      # prune path soundness needs closed rings
    for s, polygons in enumerate(shapes):
        n0 = len(lat1)
        for ring in polygons or []:
            if len(ring) >= 2 and tuple(ring[0]) != tuple(ring[-1]):
                rings_closed = False
            for i in range(len(ring) - 1):
                a, b = ring[i], ring[i + 1]
                lat1.append(a[0])
                lat2.append(b[0])
                lng1.append(a[1])
                lng2.append(b[1])
        shape_runs.append((n0, len(lat1) - n0))
        # pad this shape's edge run to a BLOCK multiple with degenerate edges
        while (len(lat1) - n0) % BLOCK:
            lat1.append(0.0)
            lat2.append(0.0)
            lng1.append(0.0)
            lng2.append(0.0)
        blk_sid.extend([s] * ((len(lat1) - n0) // BLOCK))
    if not blk_sid:
        return None
    # pad the block count to a sublane multiple (empty blocks map to no shape)
    while len(blk_sid) % 8:
        for _ in range(BLOCK):
            lat1.append(0.0)
            lat2.append(0.0)
            lng1.append(0.0)
            lng2.append(0.0)
        blk_sid.append(-1)
    a1, a2 = np.asarray(lat1, np.float32), np.asarray(lat2, np.float32)
    g1, g2 = np.asarray(lng1, np.float32), np.asarray(lng2, np.float32)
    denom = g2 - g1
    vertical = denom == 0
    slope = np.where(vertical, np.float32(0),
                     (a2 - a1) / np.where(vertical, 1, denom)).astype(np.float32)

    s_pad = max(8, 1 << (len(shapes) - 1).bit_length())
    onehot = np.zeros((len(blk_sid), s_pad), np.float32)
    for b, s in enumerate(blk_sid):
        if s >= 0:
            onehot[b, s] = 1.0
    batch = GeoShapeBatch(
        slope=slope, lat1=a1, lng1=g1, lng2=g2, onehot=onehot,
        n_shapes=len(shapes), shape_values=list(shape_values))
    max_edges = max((ne for _, ne in shape_runs), default=0)
    if (rings_closed and 0 < max_edges <= PRUNE_MAX_EDGES
            and len(shapes) <= PRUNE_S):
        _build_prune_tables(batch, shape_runs)
    return batch


def _build_prune_tables(batch: GeoShapeBatch, shape_runs) -> None:
    """Per-shape edge slabs (exact 3×bf16 split) + conservative bboxes.

    bbox soundness (so a skipped (point, shape) pair matches the dense
    test's verdict bit-for-bit): the straddle test cond1 is pure f32
    comparisons, so p outside [min lng, max lng) exactly yields zero
    crossings. The line test cond2 = lat < slope·(p−lng1)+lat1 rounds, so
    the lat bounds carry a margin ≥ the worst f32 evaluation error of any
    edge line: above hi_lat+margin every cond2 is certainly false (zero
    crossings); below lo_lat−margin every straddling edge's cond2 is
    certainly true, and a CLOSED ring straddles any vertical line an even
    number of times — even parity, i.e. "outside", same as skipping.
    Open rings break the below-case, so build_shape_batch gates on ring
    closure.
    """
    import ml_dtypes

    e_max = max(ne for _, ne in shape_runs)
    e_max = ((e_max + 31) // 32) * 32
    s_dim = PRUNE_S
    tab = np.zeros((4, e_max, s_dim), np.float32)
    bbox = np.zeros((4, s_dim), np.float32)
    bbox[0, :], bbox[1, :] = np.inf, -np.inf     # lo/hi lng: never candidate
    bbox[2, :], bbox[3, :] = np.inf, -np.inf
    eps = np.float64(np.finfo(np.float32).eps)
    for s, (ofs, ne) in enumerate(shape_runs):
        if ne == 0:
            continue
        sl = slice(ofs, ofs + ne)
        tab[0, :ne, s] = batch.lng1[sl]
        tab[1, :ne, s] = batch.lng2[sl]
        tab[2, :ne, s] = batch.lat1[sl]
        tab[3, :ne, s] = batch.slope[sl]
        lngs = np.concatenate([batch.lng1[sl], batch.lng2[sl]])
        lats = batch.lat1[sl].astype(np.float64)
        lo_lng, hi_lng = float(np.min(lngs)), float(np.max(lngs))
        span = np.float64(hi_lng) - np.float64(lo_lng)
        slopes = batch.slope[sl].astype(np.float64)
        worst = np.max(np.abs(slopes) * span + np.abs(lats))
        margin = 16.0 * eps * max(worst, 1.0)
        lat_end = lats + slopes * (batch.lng2[sl].astype(np.float64)
                                   - batch.lng1[sl].astype(np.float64))
        bbox[0, s], bbox[1, s] = lo_lng, hi_lng
        bbox[2, s] = np.float32(min(np.min(lats), np.min(lat_end)) - margin)
        bbox[3, s] = np.float32(max(np.max(lats), np.max(lat_end)) + margin)
    v = tab.reshape(4 * e_max, s_dim)
    hi = v.astype(ml_dtypes.bfloat16)
    rem = v - hi.astype(np.float32)
    mid = rem.astype(ml_dtypes.bfloat16)
    lo = (rem - mid.astype(np.float32)).astype(ml_dtypes.bfloat16)
    rec = (hi.astype(np.float32) + mid.astype(np.float32)
           + lo.astype(np.float32))
    if not np.array_equal(rec, v):
        return  # inf/denormal corner: keep the dense path
    batch.tab3 = np.concatenate([hi, mid, lo], axis=0)
    batch.bbox = bbox
    batch.prune_ok = True


def empty_shape_batch() -> GeoShapeBatch:
    """Zero-shape placeholder: 8 degenerate blocks (matching the 8-row
    one-hot so matched_shape's block dot stays shape-consistent), nothing
    matches."""
    z = np.zeros(8 * BLOCK, np.float32)
    return GeoShapeBatch(slope=z, lat1=z, lng1=z, lng2=z,
                         onehot=np.zeros((8, 8), np.float32),
                         n_shapes=0, shape_values=[])


def use_pruned() -> bool:
    """bbox-pruned geo path (ARES_GEO2=0 disables, =1 forces). Pure XLA —
    default ON everywhere; results are bit-equal to matched_shape."""
    import os

    return os.environ.get("ARES_GEO2", "") != "0"


def matched_shape_pruned(point_lat, point_lng, point_valid,
                         tab3, bbox, n_shapes):
    """Two-pass point-in-polygon: bbox prefilter + per-candidate edge-slab
    crossing test. Traced (jnp); bit-equal to matched_shape.

    Pass 1 tests every point against per-shape bboxes ([S, P] VPU compares,
    vs the dense path's [P, E_total] edge sweep). Pass 2 walks each point's
    bbox candidates in shape order (data-dependent while_loop, bounded by
    the chunk's worst candidate count): the k-th candidate's one-hot row is
    derived from a prefix-rank matmul, and its edge slab is fetched by an
    MXU one-hot gather — three bf16 dots against the hi/mid/lo split tables
    reconstruct the f32 edge params exactly, so the crossing test below is
    bit-identical to matched_shape's. Layout: shapes on sublanes, points on
    lanes (broadcasts and reductions stay native; the points-on-rows
    variant measured 8x slower).

    Returns (matched [n] int32, overflow bool). overflow=True means some
    point had more than PRUNE_ROUNDS_CAP bbox candidates and the result is
    incomplete — the caller must fall back to matched_shape (kernels.py
    wraps this in lax.cond). Reference peer: query/geo_intersects.cu:90
    ray-casts every (point, edge) pair with no pruning.
    """
    n = point_lat.shape[0]
    s_dim = bbox.shape[1]
    e_max = tab3.shape[0] // 12
    e4 = 4 * e_max
    p = min(PRUNE_CHUNK, ((n + ROW_TILE - 1) // ROW_TILE) * ROW_TILE)
    tab3 = tab3.astype(jnp.bfloat16)
    bbox = bbox.astype(jnp.float32)
    sub = jnp.arange(s_dim, dtype=jnp.int32)[:, None]
    ltT = (jnp.arange(s_dim)[None, :] <= jnp.arange(s_dim)[:, None]
           ).astype(jnp.bfloat16)
    n_pad = ((n + p - 1) // p) * p
    nanf = jnp.float32(np.nan)   # NaN compares false: invalid/pad rows
    pa_all = jnp.full(n_pad, nanf).at[:n].set(
        jnp.where(point_valid, point_lat.astype(jnp.float32), nanf))
    pg_all = jnp.full(n_pad, nanf).at[:n].set(
        jnp.where(point_valid, point_lng.astype(jnp.float32), nanf))

    def one_chunk(args):
        pa_row, pg_row = args
        pa = pa_row[None, :]
        pg = pg_row[None, :]
        cand = ((pg >= bbox[0][:, None]) & (pg < bbox[1][:, None]) &
                (pa > bbox[2][:, None]) & (pa < bbox[3][:, None]))
        candb = cand.astype(jnp.bfloat16)
        rank = jax.lax.dot_general(
            ltT, candb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [S, P] prefix count
        total = jnp.max(rank[s_dim - 1])
        matched = jnp.full((p,), -1, jnp.int32)

        def round_body(state):
            k, matched = state
            mk = cand & (rank == (k + 1).astype(jnp.float32))
            sidm = jnp.min(jnp.where(mk, sub, jnp.int32(9999)), axis=0)
            mkb = mk.astype(jnp.bfloat16)
            g3 = jax.lax.dot_general(
                tab3, mkb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [3*4E, P]
            g = g3[0:e4] + g3[e4:2 * e4] + g3[2 * e4:3 * e4]
            lng1 = g[0:e_max]
            lng2 = g[e_max:2 * e_max]
            lat1 = g[2 * e_max:3 * e_max]
            slope = g[3 * e_max:4 * e_max]
            cond1 = (lng1 > pg) != (lng2 > pg)
            cond2 = pa < slope * (pg - lng1) + lat1
            cnt = jnp.sum((cond1 & cond2).astype(jnp.float32), axis=0)
            odd = (cnt.astype(jnp.int32) & 1) == 1
            has = sidm < jnp.int32(9999)
            matched = jnp.where(has & odd & (matched < 0), sidm, matched)
            return k + 1, matched

        def round_cond(state):
            return state[0].astype(jnp.float32) < jnp.minimum(
                total, jnp.float32(PRUNE_ROUNDS_CAP))

        _, matched = jax.lax.while_loop(round_cond, round_body,
                                        (jnp.int32(0), matched))
        return matched, total > jnp.float32(PRUNE_ROUNDS_CAP)

    out, ovf = jax.lax.map(one_chunk, (pa_all.reshape(-1, p),
                                       pg_all.reshape(-1, p)))
    matched = out.reshape(n_pad)[:n]
    matched = jnp.where(matched < n_shapes, matched, -1)
    return matched, jnp.any(ovf)


def matched_shape(point_lat, point_lng, point_valid,
                  slope, lat1, lng1, lng2, onehot, n_shapes: int):
    """Per-row first matching shape index (int32, -1 = none). Traced (jnp).

    Mirrors the reference crossing test exactly
    (iterator.hpp:1404): ((lng1 > p) != (lng2 > p)) &&
    (lat < (lat2-lat1)*(p-lng1)/(lng2-lng1) + lat1), with the slope
    precomputed but the (p - lng1) subtraction kept per element — the
    cancellation-free form. Degenerate padding edges (lng1 == lng2) fail
    the first condition by construction.
    """
    n = point_lat.shape[0]
    tile = min(ROW_TILE, n)
    n_tiles = n // tile
    e = slope.shape[0]
    nb = e // BLOCK

    def one_tile(args):
        plat, plng = args  # [T]
        plngc = plng[:, None]
        platc = plat[:, None]
        cond1 = (lng1[None, :] > plngc) != (lng2[None, :] > plngc)
        cond2 = platc < (slope[None, :] * (plngc - lng1[None, :])
                         + lat1[None, :])
        crossing = (cond1 & cond2).astype(jnp.bfloat16)
        blk = crossing.reshape(tile, nb, BLOCK).sum(axis=-1)  # [T, NB] <= 32
        counts = jax.lax.dot_general(
            blk, onehot.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [T, S] on MXU, f32-exact
        inside = (counts.astype(jnp.int32) % 2) == 1
        any_in = jnp.any(inside, axis=1)
        first = jnp.argmax(inside, axis=1).astype(jnp.int32)
        return jnp.where(any_in, first, -1)

    plat = point_lat.reshape(n_tiles, tile)
    plng = point_lng.reshape(n_tiles, tile)
    matched = jax.lax.map(one_tile, (plat, plng)).reshape(n)
    matched = jnp.where(point_valid, matched, -1)
    return jnp.where(matched < n_shapes, matched, -1)
