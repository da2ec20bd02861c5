"""Geodesic helpers for lon/lat inputs — numpy-native pyproj stand-ins.

The reference uses pyproj's Geod (WGS84 ellipsoid) for nearest-vegetation
azimuth/distance and polygon areas (reference:
data_prep/vegetation/xx_fiona_testing.py:212,
data_prep/vegetation/04_merge_geometries.py:45,187). This module provides
the spherical equivalents in vectorized numpy (great-circle distance,
forward azimuth, local-tangent projection) for corpora keyed by lon/lat
rather than projected metres. The engine core stays planar (the reference's
Gen-1 also requires a projected CRS, reference: bal.py:352-368); these are
the ingest/refine utilities.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6371008.8  # IUGG mean radius


def haversine_m(lon1, lat1, lon2, lat2):
    """Great-circle distance in metres, vectorized."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(v, dtype=np.float64))
                              for v in (lon1, lat1, lon2, lat2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = (np.sin(dlat / 2.0) ** 2
         + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2)
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def forward_azimuth_deg(lon1, lat1, lon2, lat2):
    """Initial bearing from point 1 to point 2, degrees clockwise from
    north in (-180, 180] — pyproj Geod.inv's fwd-azimuth convention."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(v, dtype=np.float64))
                              for v in (lon1, lat1, lon2, lat2))
    dlon = lon2 - lon1
    y = np.sin(dlon) * np.cos(lat2)
    x = (np.cos(lat1) * np.sin(lat2)
         - np.sin(lat1) * np.cos(lat2) * np.cos(dlon))
    return np.degrees(np.arctan2(y, x))


def spherical_destination(lon, lat, bearing_deg, dist_m):
    """Spherical direct geodesic: destination point at ``dist_m`` along
    ``bearing_deg`` (clockwise from north) — the st_buffer(geography)
    vertex generator (reference:
    data_prep/gnaf/create_buffered_points.sql:10 buffers in geography).
    Vectorized; returns (lon2, lat2) in degrees."""
    lon1 = np.radians(np.asarray(lon, dtype=np.float64))
    lat1 = np.radians(np.asarray(lat, dtype=np.float64))
    theta = np.radians(np.asarray(bearing_deg, dtype=np.float64))
    delta = np.asarray(dist_m, dtype=np.float64) / EARTH_RADIUS_M
    sin_lat2 = (np.sin(lat1) * np.cos(delta)
                + np.cos(lat1) * np.sin(delta) * np.cos(theta))
    lat2 = np.arcsin(np.clip(sin_lat2, -1.0, 1.0))
    lon2 = lon1 + np.arctan2(
        np.sin(theta) * np.sin(delta) * np.cos(lat1),
        np.cos(delta) - np.sin(lat1) * sin_lat2)
    return np.degrees(lon2), np.degrees(lat2)


def local_tangent_xy(lon, lat, lon0: float, lat0: float):
    """Equirectangular local projection to metres around (lon0, lat0) —
    the cheap azimuthal stand-in for per-feature planar math within a few
    km (buffers, PIP refinement). Returns (x, y)."""
    lat0r = np.radians(lat0)
    x = (np.radians(np.asarray(lon, dtype=np.float64) - lon0)
         * np.cos(lat0r) * EARTH_RADIUS_M)
    y = np.radians(np.asarray(lat, dtype=np.float64) - lat0) \
        * EARTH_RADIUS_M
    return x, y


def spherical_ring_area_m2(lon, lat):
    """Spherical excess polygon area (L'Huilier via the shoelace on the
    unit sphere) — the st_area(geography) stand-in. Vertices in degrees,
    ring open or closed."""
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    if lon[0] == lon[-1] and lat[0] == lat[-1] and len(lon) > 1:
        lon, lat = lon[:-1], lat[:-1]
    lon2 = np.roll(lon, -1)
    lat2 = np.roll(lat, -1)
    # spherical shoelace (Girard-style summation)
    area = np.sum((lon2 - lon) * (2.0 + np.sin(lat) + np.sin(lat2))) / 2.0
    return float(abs(area) * EARTH_RADIUS_M ** 2)
