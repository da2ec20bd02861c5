"""S7: Esri shapefile source — .shp -> DataFrame of WKT geometries.

The reference's vector fixtures and masks are shapefiles (reference:
tests/test_data/input/mask_extent_*.shp, bal.py:233-256 writes masks as
.shp). The format is publicly documented (Esri Shapefile Technical
Description): a 100-byte big-endian header, then records of
(record number, content length) big-endian + little-endian shape payloads.
Point (1), PolyLine (3) and Polygon (5) are implemented — the types the
reference uses.

Parsing happens on the driver (shapefiles are small side inputs — masks,
extents, footprints); the RESULT is a distributed DataFrame, so everything
downstream (cover joins, subdivision, dissolve) scales as usual. For a
many-file corpus, wrap `read_shp_records` in mapInPandas over a file list.
Polygon ring roles follow the spec: clockwise rings are exteriors,
counter-clockwise rings are holes of the preceding exterior.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from . import geometry

SHAPE_POINT = 1
SHAPE_POLYLINE = 3
SHAPE_POLYGON = 5


def _ring_is_cw(ring: np.ndarray) -> bool:
    x, y = ring[:, 0], ring[:, 1]
    return (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) < 0


def read_shp_records(path: str):
    """Parse a .shp file -> list of (shape_id, geom_type, wkt)."""
    with open(path, "rb") as f:
        data = f.read()
    if struct.unpack(">i", data[:4])[0] != 9994:
        raise ValueError("not a shapefile")
    file_len = struct.unpack(">i", data[24:28])[0] * 2
    out = []
    p = 100
    while p + 8 <= file_len:
        recno, clen = struct.unpack(">ii", data[p:p + 8])
        p += 8
        body = data[p:p + clen * 2]
        p += clen * 2
        stype = struct.unpack("<i", body[:4])[0]
        if stype == 0:  # null shape
            continue
        if stype == SHAPE_POINT:
            x, y = struct.unpack("<2d", body[4:20])
            out.append((recno, "POINT", f"POINT ({x} {y})"))
            continue
        if stype not in (SHAPE_POLYLINE, SHAPE_POLYGON):
            raise NotImplementedError(f"shape type {stype}")
        nparts, npoints = struct.unpack("<2i", body[36:44])
        parts = struct.unpack(f"<{nparts}i", body[44:44 + 4 * nparts])
        pts = np.frombuffer(body, dtype="<f8",
                            count=npoints * 2,
                            offset=44 + 4 * nparts).reshape(npoints, 2)
        rings = [pts[parts[i]:(parts[i + 1] if i + 1 < nparts
                               else npoints)].copy()
                 for i in range(nparts)]
        if stype == SHAPE_POLYLINE:
            body_w = ", ".join(
                "(" + ", ".join(f"{x} {y}" for x, y in r) + ")"
                for r in rings)
            out.append((recno, "MULTILINESTRING",
                        f"MULTILINESTRING ({body_w})"))
            continue
        # polygon: CW rings are exteriors, CCW rings holes of the current
        # exterior (Esri winding convention)
        polys = []
        for r in rings:
            if _ring_is_cw(r) or not polys:
                polys.append([r])
            else:
                polys[-1].append(r)
        if len(polys) == 1:
            wkt = geometry.polygon_wkt_rings(polys[0])
            gt = "POLYGON"
        else:
            wkt = geometry.multipolygon_wkt_polys(polys)
            gt = "MULTIPOLYGON"
        out.append((recno, gt, wkt))
    return out


def read_shapefile(spark: SparkSession, path: str) -> DataFrame:
    """S7 source: .shp -> DataFrame (shape_id, geom_type, wkt)."""
    rows = read_shp_records(path)
    return spark.createDataFrame(
        rows, "shape_id INT, geom_type STRING, wkt STRING")


def write_shp_polygons(path: str, wkts) -> None:
    """S7 sink: WKT polygons -> a minimal .shp (+ .shx) — the engine's
    get_extent_mask/footprint output format (reference: bal.py:233-256).
    Rings are written clockwise (Esri convention)."""
    recs = []
    for w in wkts:
        polys = geometry.parse_wkt_polys(w)
        rings = []
        for rings_p in polys:
            for i, r in enumerate(rings_p):
                rr = np.asarray(r, dtype=np.float64)
                if not np.array_equal(rr[0], rr[-1]):
                    rr = np.vstack([rr, rr[:1]])
                cw = _ring_is_cw(rr[:-1]) if len(rr) > 3 else True
                want_cw = (i == 0)
                if cw != want_cw:
                    rr = rr[::-1]
                rings.append(rr)
        recs.append(rings)

    shp_records = b""
    shx_records = b""
    offset_words = 50
    all_pts = np.vstack([r for rings in recs for r in rings]) \
        if recs else np.zeros((0, 2))
    for i, rings in enumerate(recs):
        npoints = sum(len(r) for r in rings)
        pts = np.vstack(rings)
        content = struct.pack("<i", SHAPE_POLYGON)
        content += struct.pack("<4d", pts[:, 0].min(), pts[:, 1].min(),
                               pts[:, 0].max(), pts[:, 1].max())
        content += struct.pack("<2i", len(rings), npoints)
        start = 0
        for r in rings:
            content += struct.pack("<i", start)
            start += len(r)
        content += pts.astype("<f8").tobytes()
        clen = len(content) // 2
        shp_records += struct.pack(">ii", i + 1, clen) + content
        shx_records += struct.pack(">ii", offset_words, clen)
        offset_words += 4 + clen

    def header(total_words, is_shx):
        h = struct.pack(">i", 9994) + b"\x00" * 20
        h += struct.pack(">i", total_words)
        h += struct.pack("<2i", 1000, SHAPE_POLYGON)
        if len(all_pts):
            h += struct.pack("<4d", all_pts[:, 0].min(),
                             all_pts[:, 1].min(),
                             all_pts[:, 0].max(), all_pts[:, 1].max())
        else:
            h += struct.pack("<4d", 0, 0, 0, 0)
        h += struct.pack("<4d", 0, 0, 0, 0)  # Z/M ranges
        return h

    with open(path, "wb") as f:
        f.write(header(50 + len(shp_records) // 2, False) + shp_records)
    with open(path[:-4] + ".shx", "wb") as f:
        f.write(header(50 + len(shx_records) // 2, True) + shx_records)
