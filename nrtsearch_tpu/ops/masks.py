"""Filter-mask algebra over columnar doc values.

The reference's filter queries (range, term-on-numeric, exists, match-all —
QueryNodeMapper.java:171-204 dispatch) become elementwise compares over the
segment's columnar arrays, producing boolean [D] masks that AND/OR/NOT
together. All ops are trivially fused by XLA.

Numeric columns may be float32 (fast path) or float64 (exact int64/double
values; see SegmentBuilder._numeric_device_array). f64 compares on TPU are
slow but these are tiny memory-bound ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def range_mask(
    values: jax.Array,   # [D] numeric column
    present: jax.Array,  # bool [D]
    lower: jax.Array,    # scalar, same dtype family
    upper: jax.Array,
    lower_inclusive: jax.Array,  # bool scalar
    upper_inclusive: jax.Array,
) -> jax.Array:
    lo_ok = jnp.where(lower_inclusive, values >= lower, values > lower)
    hi_ok = jnp.where(upper_inclusive, values <= upper, values < upper)
    return lo_ok & hi_ok & present


@jax.jit
def eq_mask(values: jax.Array, present: jax.Array, target: jax.Array) -> jax.Array:
    return (values == target) & present


@jax.jit
def in_set_mask(values: jax.Array, present: jax.Array, targets: jax.Array) -> jax.Array:
    """targets: [T] — mask of docs whose value is any of targets."""
    hit = jnp.any(values[:, None] == targets[None, :], axis=1)
    return hit & present


@jax.jit
def exists_mask(present: jax.Array) -> jax.Array:
    return present


def geo_bounding_box_mask(
    latlon: jax.Array,   # f32 [D, 2]
    present: jax.Array,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
) -> jax.Array:
    lat, lon = latlon[:, 0], latlon[:, 1]
    ok = (lat >= min_lat) & (lat <= max_lat)
    if min_lon <= max_lon:
        ok &= (lon >= min_lon) & (lon <= max_lon)
    else:  # crosses the dateline
        ok &= (lon >= min_lon) | (lon <= max_lon)
    return ok & present


def point_in_polygon_mask(
    latlon: jax.Array,    # f32 [D, 2]
    present: jax.Array,
    polygon: jax.Array,   # f32 [V, 2] (lat, lon) vertices, closed or open
) -> jax.Array:
    """Ray-casting point-in-polygon (GeoPointQuery: docs inside a polygon)."""
    lat, lon = latlon[:, 0:1], latlon[:, 1:2]       # [D, 1]
    y1, x1 = polygon[:, 0][None, :], polygon[:, 1][None, :]   # [1, V]
    y2 = jnp.roll(polygon[:, 0], -1)[None, :]
    x2 = jnp.roll(polygon[:, 1], -1)[None, :]
    cond = (y1 > lat) != (y2 > lat)
    denom = jnp.where(y2 - y1 == 0, 1e-12, y2 - y1)
    x_int = x1 + (lat - y1) * (x2 - x1) / denom
    crossings = jnp.sum(cond & (lon < x_int), axis=1)
    return ((crossings % 2) == 1) & present


def point_in_rings_mask(
    latlon: jax.Array,    # f32 [D, 2]
    present: jax.Array,
    rings: jax.Array,     # f32 [V, 2] NaN-separated CLOSED rings (outer + holes)
) -> jax.Array:
    """Even-odd point-in-polygon over NaN-separated rings (GeoPolygonQuery
    with holes). Ray-cast parity is counted over consecutive-vertex edges;
    NaN separator/padding edges never satisfy the crossing condition, so one
    parity sum covers the outer ring and all holes (a point inside a hole
    crosses an even number of edges)."""
    lat, lon = latlon[:, 0:1], latlon[:, 1:2]            # [D, 1]
    y1, x1 = rings[:-1, 0][None, :], rings[:-1, 1][None, :]   # [1, V-1]
    y2, x2 = rings[1:, 0][None, :], rings[1:, 1][None, :]
    cond = (y1 > lat) != (y2 > lat)                      # False on NaN edges
    denom = jnp.where(y2 - y1 == 0, 1e-12, y2 - y1)
    x_int = x1 + (lat - y1) * (x2 - x1) / denom
    crossings = jnp.sum(cond & (lon < x_int), axis=1)
    return ((crossings % 2) == 1) & present


def doc_polygons_contain_point(
    verts: jax.Array,     # f32 [D, V, 2] NaN-separated closed rings per doc
    present: jax.Array,   # bool [D]
    lat: float,
    lon: float,
) -> jax.Array:
    """Docs whose indexed POLYGON contains the query point (the reference's
    GeoPointQuery against PolygonfieldDef: LatLonShape CONTAINS box query of
    a single point, field/PolygonfieldDef.java getGeoPointQuery). One parity
    count across all docs' edges — data-parallel, no tree."""
    y1, x1 = verts[:, :-1, 0], verts[:, :-1, 1]          # [D, V-1]
    y2, x2 = verts[:, 1:, 0], verts[:, 1:, 1]
    cond = (y1 > lat) != (y2 > lat)                      # False on NaN edges
    denom = jnp.where(y2 - y1 == 0, 1e-12, y2 - y1)
    x_int = x1 + (lat - y1) * (x2 - x1) / denom
    crossings = jnp.sum(cond & (lon < x_int), axis=1)
    return ((crossings % 2) == 1) & present


def haversine_meters(latlon: jax.Array, center_lat: float, center_lon: float):
    """Per-doc haversine distance (meters) from a [D, 2] lat/lon column to a
    point (reference: geo/GeoUtils.arcDistance)."""
    r_earth = 6371008.7714  # mean earth radius, meters
    lat = jnp.deg2rad(latlon[:, 0])
    lon = jnp.deg2rad(latlon[:, 1])
    clat = jnp.deg2rad(center_lat)
    clon = jnp.deg2rad(center_lon)
    dlat = lat - clat
    dlon = lon - clon
    a = jnp.sin(dlat / 2) ** 2 + jnp.cos(lat) * jnp.cos(clat) * jnp.sin(dlon / 2) ** 2
    return 2 * r_earth * jnp.arcsin(jnp.sqrt(a))


def geo_radius_mask(
    latlon: jax.Array,
    present: jax.Array,
    center_lat: float,
    center_lon: float,
    radius_meters: float,
) -> jax.Array:
    """Haversine distance filter (GeoRadiusQuery equivalent)."""
    dist = haversine_meters(latlon, center_lat, center_lon)
    return (dist <= radius_meters) & present
