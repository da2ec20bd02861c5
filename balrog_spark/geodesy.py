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


# ---------------------------------------------------------------------------
# Ellipsoidal geodesy (WGS84/GRS80) — the reference's pyproj surfaces are
# ellipsoidal (Geod.inv azimuth/distance, MGA/Albers projected CRSs:
# reference: data_prep/vegetation/xx_fiona_testing.py:212, bal.py:352-368,
# examples/input/*/prj.adf). Everything below is vectorized numpy built
# from public formulas: Karney 2011 (transverse Mercator series),
# Snyder 1987 USGS PP-1395 (Albers equal-area conic, conformal-latitude
# series), Vincenty 1975 (inverse geodesic). The spherical helpers above
# remain the default engine contract; these are the parity-grade options.
# ---------------------------------------------------------------------------

GRS80_A = 6378137.0
GRS80_F = 1.0 / 298.257222101
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563


def _tm_consts(a: float, f: float):
    n = f / (2.0 - f)
    A = a / (1.0 + n) * (1.0 + n * n / 4.0 + n ** 4 / 64.0)
    alpha = (n / 2.0 - 2.0 * n ** 2 / 3.0 + 5.0 * n ** 3 / 16.0,
             13.0 * n ** 2 / 48.0 - 3.0 * n ** 3 / 5.0,
             61.0 * n ** 3 / 240.0)
    beta = (n / 2.0 - 2.0 * n ** 2 / 3.0 + 37.0 * n ** 3 / 96.0,
            n ** 2 / 48.0 + n ** 3 / 15.0,
            17.0 * n ** 3 / 480.0)
    return n, A, alpha, beta


def tm_forward(lon, lat, lon0: float, k0: float = 0.9996,
               fe: float = 500000.0, fn: float = 10000000.0,
               a: float = GRS80_A, f: float = GRS80_F):
    """Ellipsoidal transverse Mercator forward (Karney 2011 series, ~nm
    accuracy over a UTM/MGA zone). Degrees in, projected metres out —
    e.g. MGA zone 50 is lon0=117 with the GDA defaults here."""
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    dlon = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    e = np.sqrt(f * (2.0 - f))
    _, A, alpha, _ = _tm_consts(a, f)
    tau = np.tan(lat)
    sigma = np.sinh(e * np.arctanh(e * np.sin(lat)))
    taup = tau * np.sqrt(1.0 + sigma ** 2) - sigma * np.sqrt(1.0 + tau ** 2)
    xi0 = np.arctan2(taup, np.cos(dlon))
    eta0 = np.arcsinh(np.sin(dlon)
                      / np.sqrt(taup ** 2 + np.cos(dlon) ** 2))
    xi, eta = xi0, eta0
    for j, aj in enumerate(alpha, start=1):
        xi = xi + aj * np.sin(2 * j * xi0) * np.cosh(2 * j * eta0)
        eta = eta + aj * np.cos(2 * j * xi0) * np.sinh(2 * j * eta0)
    return fe + k0 * A * eta, fn + k0 * A * xi


def tm_inverse(x, y, lon0: float, k0: float = 0.9996,
               fe: float = 500000.0, fn: float = 10000000.0,
               a: float = GRS80_A, f: float = GRS80_F):
    """Ellipsoidal transverse Mercator inverse; returns (lon, lat) deg."""
    e = np.sqrt(f * (2.0 - f))
    e2 = f * (2.0 - f)
    _, A, _, beta = _tm_consts(a, f)
    xi = (np.asarray(y, dtype=np.float64) - fn) / (k0 * A)
    eta = (np.asarray(x, dtype=np.float64) - fe) / (k0 * A)
    xi0, eta0 = xi, eta
    for j, bj in enumerate(beta, start=1):
        xi0 = xi0 - bj * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta0 = eta0 - bj * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    taup = np.sin(xi0) / np.sqrt(np.sinh(eta0) ** 2 + np.cos(xi0) ** 2)
    dlon = np.arctan2(np.sinh(eta0), np.cos(xi0))
    # Newton-invert the conformal tangent (Karney 2011 eq. 19-21)
    tau = np.array(taup, dtype=np.float64, copy=True)
    for _ in range(6):
        sigma = np.sinh(e * np.arctanh(e * tau / np.sqrt(1.0 + tau ** 2)))
        taupi = (tau * np.sqrt(1.0 + sigma ** 2)
                 - sigma * np.sqrt(1.0 + tau ** 2))
        tau = tau + ((taup - taupi) * (1.0 + (1.0 - e2) * tau ** 2)
                     / ((1.0 - e2) * np.sqrt(1.0 + taupi ** 2)
                        * np.sqrt(1.0 + tau ** 2)))
    return lon0 + np.degrees(dlon), np.degrees(np.arctan(tau))


def _albers_q(sin_lat, e: float):
    return (1.0 - e * e) * (
        sin_lat / (1.0 - e * e * sin_lat ** 2)
        - (1.0 / (2.0 * e)) * np.log((1.0 - e * sin_lat)
                                     / (1.0 + e * sin_lat)))


def _albers_consts(lat1: float, lat2: float, lat0: float, a: float,
                   f: float):
    e = np.sqrt(f * (2.0 - f))
    s1, s2, s0 = (np.sin(np.radians(v)) for v in (lat1, lat2, lat0))
    c1, c2 = (np.cos(np.radians(v)) for v in (lat1, lat2))
    m1 = c1 / np.sqrt(1.0 - e * e * s1 ** 2)
    m2 = c2 / np.sqrt(1.0 - e * e * s2 ** 2)
    q1, q2, q0 = (_albers_q(s, e) for s in (s1, s2, s0))
    n = (m1 ** 2 - m2 ** 2) / (q2 - q1)
    C = m1 ** 2 + n * q1
    rho0 = a * np.sqrt(C - n * q0) / n
    return e, n, C, rho0


def albers_forward(lon, lat, lat1: float = -18.0, lat2: float = -36.0,
                   lon0: float = 132.0, lat0: float = 0.0,
                   fe: float = 0.0, fn: float = 0.0,
                   a: float = GRS80_A, f: float = GRS80_F):
    """Ellipsoidal Albers equal-area conic forward (Snyder 14-1..14-6).
    Defaults are GDA94 Australian Albers (EPSG:3577), the reference's
    vegetation CRS (examples/input/jerram_veg/prj.adf)."""
    e, n, C, rho0 = _albers_consts(lat1, lat2, lat0, a, f)
    q = _albers_q(np.sin(np.radians(np.asarray(lat, dtype=np.float64))), e)
    rho = a * np.sqrt(C - n * q) / n
    theta = n * np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    return fe + rho * np.sin(theta), fn + rho0 - rho * np.cos(theta)


def albers_inverse(x, y, lat1: float = -18.0, lat2: float = -36.0,
                   lon0: float = 132.0, lat0: float = 0.0,
                   fe: float = 0.0, fn: float = 0.0,
                   a: float = GRS80_A, f: float = GRS80_F):
    """Ellipsoidal Albers inverse (Snyder 14-8..14-11 + 3-16 iteration)."""
    e, n, C, rho0 = _albers_consts(lat1, lat2, lat0, a, f)
    xs = np.asarray(x, dtype=np.float64) - fe
    ys = rho0 - (np.asarray(y, dtype=np.float64) - fn)
    rho = np.hypot(xs, ys) * np.sign(n)
    theta = np.arctan2(np.sign(n) * xs, np.sign(n) * ys)
    q = (C - (rho * n / a) ** 2) / n
    lat = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(8):
        s = np.sin(lat)
        lat = lat + ((1.0 - e * e * s ** 2) ** 2 / (2.0 * np.cos(lat))) * (
            q / (1.0 - e * e)
            - s / (1.0 - e * e * s ** 2)
            + np.log((1.0 - e * s) / (1.0 + e * s)) / (2.0 * e))
    return lon0 + np.degrees(theta / n), np.degrees(lat)


def geod_inverse(lon1, lat1, lon2, lat2, a: float = WGS84_A,
                 f: float = WGS84_F, iters: int = 64):
    """Vincenty inverse geodesic on the ellipsoid: (fwd_azimuth_deg in
    (-180, 180], back_azimuth_deg, distance_m) — the pyproj Geod.inv twin
    the reference calls for nearest-vegetation bearings (reference:
    data_prep/vegetation/xx_fiona_testing.py:212). Vectorized; converges
    < 1e-12 everywhere except exactly-antipodal pairs (returned via the
    last iterate)."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(v, dtype=np.float64))
                              for v in (lon1, lat1, lon2, lat2))
    b = a * (1.0 - f)
    U1 = np.arctan((1.0 - f) * np.tan(lat1))
    U2 = np.arctan((1.0 - f) * np.tan(lat2))
    L = lon2 - lon1
    sU1, cU1 = np.sin(U1), np.cos(U1)
    sU2, cU2 = np.sin(U2), np.cos(U2)
    lam = np.array(L, dtype=np.float64, copy=True)
    for _ in range(iters):
        sl, cl = np.sin(lam), np.cos(lam)
        sin_sig = np.sqrt((cU2 * sl) ** 2 + (cU1 * sU2 - sU1 * cU2 * cl) ** 2)
        cos_sig = sU1 * sU2 + cU1 * cU2 * cl
        sig = np.arctan2(sin_sig, cos_sig)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = np.where(sin_sig != 0.0,
                                 cU1 * cU2 * sl / np.where(sin_sig == 0.0,
                                                           1.0, sin_sig),
                                 0.0)
        cos2_alpha = 1.0 - sin_alpha ** 2
        with np.errstate(divide="ignore", invalid="ignore"):
            cos_2sigm = np.where(cos2_alpha != 0.0,
                                 cos_sig - 2.0 * sU1 * sU2
                                 / np.where(cos2_alpha == 0.0, 1.0,
                                            cos2_alpha),
                                 0.0)
        Cc = f / 16.0 * cos2_alpha * (4.0 + f * (4.0 - 3.0 * cos2_alpha))
        lam_new = L + (1.0 - Cc) * f * sin_alpha * (
            sig + Cc * sin_sig * (cos_2sigm + Cc * cos_sig
                                  * (-1.0 + 2.0 * cos_2sigm ** 2)))
        if np.all(np.abs(lam_new - lam) < 1e-13):
            lam = lam_new
            break
        lam = lam_new
    sl, cl = np.sin(lam), np.cos(lam)
    sin_sig = np.sqrt((cU2 * sl) ** 2 + (cU1 * sU2 - sU1 * cU2 * cl) ** 2)
    cos_sig = sU1 * sU2 + cU1 * cU2 * cl
    sig = np.arctan2(sin_sig, cos_sig)
    with np.errstate(divide="ignore", invalid="ignore"):
        sin_alpha = np.where(sin_sig != 0.0,
                             cU1 * cU2 * sl / np.where(sin_sig == 0.0, 1.0,
                                                       sin_sig), 0.0)
    cos2_alpha = 1.0 - sin_alpha ** 2
    with np.errstate(divide="ignore", invalid="ignore"):
        cos_2sigm = np.where(cos2_alpha != 0.0,
                             cos_sig - 2.0 * sU1 * sU2
                             / np.where(cos2_alpha == 0.0, 1.0, cos2_alpha),
                             0.0)
    u2 = cos2_alpha * (a * a - b * b) / (b * b)
    Aa = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2
                                              * (320.0 - 175.0 * u2)))
    Bb = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))
    dsig = Bb * sin_sig * (cos_2sigm + Bb / 4.0 * (
        cos_sig * (-1.0 + 2.0 * cos_2sigm ** 2)
        - Bb / 6.0 * cos_2sigm * (-3.0 + 4.0 * sin_sig ** 2)
        * (-3.0 + 4.0 * cos_2sigm ** 2)))
    dist = b * Aa * (sig - dsig)
    az1 = np.degrees(np.arctan2(cU2 * sl, cU1 * sU2 - sU1 * cU2 * cl))
    # Vincenty's alpha2 is the azimuth of the geodesic CONTINUING at point
    # 2; pyproj's back azimuth points from 2 back to 1 — flip 180 degrees
    # and keep the (-180, 180] range
    az2_cont = np.degrees(np.arctan2(cU1 * sl,
                                     -sU1 * cU2 + cU1 * sU2 * cl))
    az2 = np.mod(az2_cont, 360.0) - 180.0
    az2 = np.where(az2 == -180.0, 180.0, az2)
    return az1, az2, dist


def geod_direct(lon, lat, azimuth_deg, dist_m, a: float = WGS84_A,
                f: float = WGS84_F, iters: int = 64):
    """Vincenty direct geodesic: destination (lon2, lat2, back_azimuth)
    at ``dist_m`` along ``azimuth_deg`` from each start point — the
    pyproj Geod.fwd twin (ellipsoidal st_buffer vertex generator;
    back azimuth in pyproj's to-point-1 convention)."""
    lon1 = np.radians(np.asarray(lon, dtype=np.float64))
    lat1 = np.radians(np.asarray(lat, dtype=np.float64))
    alpha1 = np.radians(np.asarray(azimuth_deg, dtype=np.float64))
    s = np.asarray(dist_m, dtype=np.float64)
    b = a * (1.0 - f)
    tanU1 = (1.0 - f) * np.tan(lat1)
    cosU1 = 1.0 / np.sqrt(1.0 + tanU1 ** 2)
    sinU1 = tanU1 * cosU1
    sig1 = np.arctan2(tanU1, np.cos(alpha1))
    sin_alpha = cosU1 * np.sin(alpha1)
    cos2_alpha = 1.0 - sin_alpha ** 2
    u2 = cos2_alpha * (a * a - b * b) / (b * b)
    Aa = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2
                                              * (320.0 - 175.0 * u2)))
    Bb = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))
    sig = s / (b * Aa)
    for _ in range(iters):
        cos_2sigm = np.cos(2.0 * sig1 + sig)
        sin_sig, cos_sig = np.sin(sig), np.cos(sig)
        dsig = Bb * sin_sig * (cos_2sigm + Bb / 4.0 * (
            cos_sig * (-1.0 + 2.0 * cos_2sigm ** 2)
            - Bb / 6.0 * cos_2sigm * (-3.0 + 4.0 * sin_sig ** 2)
            * (-3.0 + 4.0 * cos_2sigm ** 2)))
        sig_new = s / (b * Aa) + dsig
        if np.all(np.abs(sig_new - sig) < 1e-14):
            sig = sig_new
            break
        sig = sig_new
    sin_sig, cos_sig = np.sin(sig), np.cos(sig)
    cos_2sigm = np.cos(2.0 * sig1 + sig)
    lat2 = np.arctan2(
        sinU1 * cos_sig + cosU1 * sin_sig * np.cos(alpha1),
        (1.0 - f) * np.hypot(sin_alpha,
                             sinU1 * sin_sig
                             - cosU1 * cos_sig * np.cos(alpha1)))
    lam = np.arctan2(sin_sig * np.sin(alpha1),
                     cosU1 * cos_sig - sinU1 * sin_sig * np.cos(alpha1))
    Cc = f / 16.0 * cos2_alpha * (4.0 + f * (4.0 - 3.0 * cos2_alpha))
    L = lam - (1.0 - Cc) * f * sin_alpha * (
        sig + Cc * sin_sig * (cos_2sigm + Cc * cos_sig
                              * (-1.0 + 2.0 * cos_2sigm ** 2)))
    lon2 = lon1 + L
    az2_cont = np.arctan2(sin_alpha,
                          -sinU1 * sin_sig + cosU1 * cos_sig
                          * np.cos(alpha1))
    back = np.mod(np.degrees(az2_cont), 360.0) - 180.0
    back = np.where(back == -180.0, 180.0, back)
    return np.degrees(lon2), np.degrees(lat2), back


def _lcc_t(lat_r, e: float):
    return (np.tan(np.pi / 4.0 - lat_r / 2.0)
            / ((1.0 - e * np.sin(lat_r))
               / (1.0 + e * np.sin(lat_r))) ** (e / 2.0))


def _lcc_consts(lat1: float, lat2: float, lat0: float, a: float, f: float):
    e = np.sqrt(f * (2.0 - f))
    p1, p2, p0 = (np.radians(v) for v in (lat1, lat2, lat0))
    m = lambda p: np.cos(p) / np.sqrt(1.0 - e * e * np.sin(p) ** 2)  # noqa
    t1, t2, t0 = (_lcc_t(p, e) for p in (p1, p2, p0))
    n = np.log(m(p1) / m(p2)) / np.log(t1 / t2)
    F = m(p1) / (n * t1 ** n)
    rho0 = a * F * t0 ** n
    return e, n, F, rho0


def lcc_forward(lon, lat, lat1: float = -36.0, lat2: float = -38.0,
                lon0: float = 145.0, lat0: float = -37.0,
                fe: float = 2500000.0, fn: float = 2500000.0,
                a: float = GRS80_A, f: float = GRS80_F):
    """Ellipsoidal Lambert conformal conic forward (Snyder 15-1..15-5).
    Defaults are VICGRID94, the reference's vegetation CRS
    (tests/test_data/input/vege.img PROJCS)."""
    e, n, F, rho0 = _lcc_consts(lat1, lat2, lat0, a, f)
    t = _lcc_t(np.radians(np.asarray(lat, dtype=np.float64)), e)
    rho = a * F * t ** n
    th = n * np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)


def lcc_inverse(x, y, lat1: float = -36.0, lat2: float = -38.0,
                lon0: float = 145.0, lat0: float = -37.0,
                fe: float = 2500000.0, fn: float = 2500000.0,
                a: float = GRS80_A, f: float = GRS80_F):
    """Ellipsoidal Lambert conformal conic inverse (Snyder 15-9..15-11 +
    7-9 iteration)."""
    e, n, F, rho0 = _lcc_consts(lat1, lat2, lat0, a, f)
    xs = np.asarray(x, dtype=np.float64) - fe
    ys = rho0 - (np.asarray(y, dtype=np.float64) - fn)
    rho = np.sign(n) * np.hypot(xs, ys)
    th = np.arctan2(np.sign(n) * xs, np.sign(n) * ys)
    t = (rho / (a * F)) ** (1.0 / n)
    lat_r = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        s = e * np.sin(lat_r)
        lat_r = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - s) / (1.0 + s)) ** (e / 2.0))
    return lon0 + np.degrees(th / n), np.degrees(lat_r)


# --- CRS registry (GeoTIFF GeoKey interchange) -------------------------------

# projection parameter sets for the EPSG codes the engine's projections
# cover (all GRS80): GDA94 Australian Albers and VICGRID94 LCC — the two
# fixed CRSs the reference's rasters use (examples/input/jerram_veg/
# prj.adf; tests/test_data/input/vege.img PROJCS)
_EPSG_PARAMS = {
    3577: {"proj": "albers", "lat1": -18.0, "lat2": -36.0,
           "lon0": 132.0, "lat0": 0.0, "fe": 0.0, "fn": 0.0},
    3111: {"proj": "lcc", "lat1": -36.0, "lat2": -38.0,
           "lon0": 145.0, "lat0": -37.0,
           "fe": 2500000.0, "fn": 2500000.0},
}


def crs_params(crs) -> dict:
    """Normalize a CRS as carried in GeoTIFF GeoKeys (EPSG int or param
    dict) to the engine's projection param dict. Known EPSG: MGA94
    zones (28349-28356), MGA2020 zones (7849-7856) — both TM on GRS80
    with the same defining params — plus 3577 / 3111."""
    if isinstance(crs, dict):
        return dict(crs)
    code = int(crs)
    if 28349 <= code <= 28356 or 7849 <= code <= 7856:
        zone = code % 100
        return {"proj": "tm", "lon0": float(zone * 6 - 183),
                "lat0": 0.0, "k0": 0.9996,
                "fe": 500000.0, "fn": 10000000.0}
    if code in _EPSG_PARAMS:
        return dict(_EPSG_PARAMS[code])
    raise ValueError(
        f"EPSG:{code} not in the engine's registry — pass the param "
        "dict form instead")


def projector_for_crs(crs):
    """(forward, inverse) lon/lat<->projected-metre callables for a CRS
    read from a GeoTIFF's GeoKeys (:func:`geotiff.read_info` ``.crs``)
    — the reprojection entry point that needs no side-channel CRS
    parameter."""
    p = crs_params(crs)
    kind = p.pop("proj")
    if kind == "tm":
        if p.get("lat0", 0.0) != 0.0:
            raise ValueError("TM with non-zero natural-origin latitude "
                             "is not supported")
        args = dict(lon0=p["lon0"], k0=p.get("k0", 0.9996),
                    fe=p.get("fe", 500000.0), fn=p.get("fn", 10000000.0))
        return (lambda lon, lat: tm_forward(lon, lat, **args),
                lambda x, y: tm_inverse(x, y, **args))
    if kind == "albers":
        args = dict(lat1=p["lat1"], lat2=p["lat2"], lon0=p["lon0"],
                    lat0=p.get("lat0", 0.0), fe=p.get("fe", 0.0),
                    fn=p.get("fn", 0.0))
        return (lambda lon, lat: albers_forward(lon, lat, **args),
                lambda x, y: albers_inverse(x, y, **args))
    if kind == "lcc":
        args = dict(lat1=p["lat1"], lat2=p["lat2"], lon0=p["lon0"],
                    lat0=p.get("lat0", 0.0), fe=p.get("fe", 0.0),
                    fn=p.get("fn", 0.0))
        return (lambda lon, lat: lcc_forward(lon, lat, **args),
                lambda x, y: lcc_inverse(x, y, **args))
    raise ValueError(f"unknown projection kind {kind!r}")
