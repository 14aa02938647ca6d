"""Geo intersection: batch point-in-polygon as a tiled MXU matmul.

Reference: query/geo_intersects.cu (ray casting, one thread per
(point, edge), atomicXor into per-shape parity bits) and
query/iterator.hpp:1322 GeoBatchIntersectIterator (the exact crossing test).

TPU redesign: per row-tile, evaluate the crossing test for ALL edges at once
([T, E] elementwise), then reduce crossings per shape with one [T, E] @ [E, S]
matmul against the static edge→shape one-hot — the parity reduction runs on
the MXU instead of atomics. Crossing-count parity (odd = inside) gives the
same even-odd semantics as the reference's XOR, including holes.
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


@dataclass
class GeoShapeBatch:
    """Host-staged shapes: flattened edges + edge→shape one-hot."""

    lat1: np.ndarray        # f32[E]
    lat2: np.ndarray
    lng1: np.ndarray
    lng2: np.ndarray
    onehot: np.ndarray      # f32[E, S_padded]
    n_shapes: int
    shape_values: List = field(default_factory=list)  # pk value per shape


def build_shape_batch(shapes: List[List[List[Tuple[float, float]]]],
                      shape_values: List) -> Optional[GeoShapeBatch]:
    """shapes: per shape, list of rings of (lat, lng) vertices."""
    if not shapes:
        return None
    if len(shapes) > MAX_SHAPES:
        raise ValueError(
            f"geo intersection supports at most {MAX_SHAPES} shapes, "
            f"got {len(shapes)}")
    lat1, lat2, lng1, lng2, sid = [], [], [], [], []
    for s, polygons in enumerate(shapes):
        for ring in polygons or []:
            for i in range(len(ring) - 1):
                a, b = ring[i], ring[i + 1]
                lat1.append(a[0])
                lat2.append(b[0])
                lng1.append(a[1])
                lng2.append(b[1])
                sid.append(s)
    if not lat1:
        return None
    e = len(lat1)
    e_pad = 1
    while e_pad < e:
        e_pad <<= 1
    s_pad = max(8, 1 << (len(shapes) - 1).bit_length())

    def arr(v, fill):
        out = np.full(e_pad, fill, np.float32)
        out[:e] = v
        return out

    onehot = np.zeros((e_pad, s_pad), np.float32)
    onehot[np.arange(e), np.asarray(sid)] = 1.0
    return GeoShapeBatch(
        lat1=arr(lat1, np.finfo(np.float32).max),
        lat2=arr(lat2, np.finfo(np.float32).max),
        lng1=arr(lng1, 0.0), lng2=arr(lng2, 0.0),
        onehot=onehot, n_shapes=len(shapes), shape_values=list(shape_values))


def matched_shape(point_lat, point_lng, point_valid,
                  lat1, lat2, lng1, lng2, onehot, n_shapes: int):
    """Per-row first matching shape index (int32, -1 = none). Traced (jnp).

    Mirrors the reference crossing test exactly
    (iterator.hpp:1404): ((lng1 > p) != (lng2 > p)) &&
    (lat < (lat2-lat1)*(p-lng1)/(lng2-lng1) + lat1), edges with FLT_MAX
    latitude (padding / ring separators) excluded.
    """
    n = point_lat.shape[0]
    tile = min(ROW_TILE, n)
    n_tiles = n // tile
    fmax = jnp.float32(np.finfo(np.float32).max)
    edge_ok = (lat1 < fmax) & (lat2 < fmax)

    def one_tile(args):
        plat, plng = args  # [T]
        plngc = plng[:, None]
        platc = plat[:, None]
        cond1 = (lng1[None, :] > plngc) != (lng2[None, :] > plngc)
        denom = lng2 - lng1
        denom = jnp.where(denom == 0, jnp.float32(1e-30), denom)
        xline = (lat2 - lat1)[None, :] * (plngc - lng1[None, :]) / denom[None, :] \
            + lat1[None, :]
        crossing = cond1 & (platc < xline) & edge_ok[None, :]
        counts = jnp.dot(crossing.astype(jnp.float32), onehot,
                         preferred_element_type=jnp.float32)  # [T, S] on MXU
        inside = (counts.astype(jnp.int32) % 2) == 1
        any_in = jnp.any(inside, axis=1)
        first = jnp.argmax(inside, axis=1).astype(jnp.int32)
        return jnp.where(any_in, first, -1)

    plat = point_lat.reshape(n_tiles, tile)
    plng = point_lng.reshape(n_tiles, tile)
    matched = jax.lax.map(one_tile, (plat, plng)).reshape(n)
    matched = jnp.where(point_valid, matched, -1)
    return jnp.where(matched < n_shapes, matched, -1)
