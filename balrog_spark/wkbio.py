"""WKB / EWKB geometry codec + GeoParquet-style column ingest.

The reference's vector store is PostGIS: its NVIS table carries the
ogr2ogr-loaded ``wkb_geometry`` column (reference:
data_prep/vegetation/03_explode_multipolygons_and_classify.sql:7) and
its prep stages move whole tables as pg_dump archives (reference:
data_prep/geoscape/01_prep_and_export_data_to_s3.sh). The standard
Spark route for that data is a parquet export whose geometry column is
WKB bytes — exactly what GeoParquet standardizes — so this module gives
the engine that wire format: a clean-room (E)WKB codec (OGC 06-103r4
structure) and Arrow-batched column functions to convert a binary
geometry column to the engine's WKT and back.

Scope: Point, LineString, Polygon, MultiPoint, MultiLineString,
MultiPolygon, GeometryCollection; both byte orders; EWKB SRID flag
(read + write). Z/M dimensions raise ValueError — refused, never
silently flattened (the reference likewise forces 2D with st_force2d).
"""

from __future__ import annotations

import re
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType

_EWKB_SRID = 0x20000000
_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000

_NAME = {1: "POINT", 2: "LINESTRING", 3: "POLYGON", 4: "MULTIPOINT",
         5: "MULTILINESTRING", 6: "MULTIPOLYGON",
         7: "GEOMETRYCOLLECTION"}
_CODE = {v: k for k, v in _NAME.items()}
WKB_TYPE_NAMES = _NAME    # public: consumers (gpkg) name typed empties


class _Reader:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def u8(self) -> int:
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def u32(self, bo: str) -> int:
        v = struct.unpack_from(bo + "I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def coords(self, bo: str, n: int) -> np.ndarray:
        arr = np.frombuffer(self.buf, dtype=bo + "f8", count=2 * n,
                            offset=self.pos).reshape(n, 2)
        self.pos += 16 * n
        return arr


def _decode_geom(r: _Reader):
    """One geometry at the cursor -> (type_name, payload, srid)."""
    bo = "<" if r.u8() == 1 else ">"
    raw_type = r.u32(bo)
    if raw_type & (_EWKB_Z | _EWKB_M) or (raw_type & 0xFFFF) >= 1000:
        raise ValueError("Z/M WKB dimensions unsupported (force 2D "
                         "upstream, as the reference's st_force2d does)")
    srid = r.u32(bo) if raw_type & _EWKB_SRID else None
    code = raw_type & 0xFF
    name = _NAME.get(code)
    if name is None:
        raise ValueError(f"unknown WKB geometry type {raw_type:#x}")
    if name == "POINT":
        return name, r.coords(bo, 1), srid
    if name == "LINESTRING":
        return name, r.coords(bo, r.u32(bo)), srid
    if name == "POLYGON":
        return name, [r.coords(bo, r.u32(bo))
                      for _ in range(r.u32(bo))], srid
    # multi-geometries nest full WKB geometries (each with its own
    # byte-order byte)
    n = r.u32(bo)
    parts = []
    for _ in range(n):
        sub_name, payload, _ = _decode_geom(r)
        parts.append((sub_name, payload))
    return name, parts, srid


def _fmt(v: float) -> str:
    return f"{v:.8f}".rstrip("0").rstrip(".")


def _ring_txt(ring: np.ndarray) -> str:
    pts = ring
    if len(pts) and not np.array_equal(pts[0], pts[-1]):
        pts = np.vstack([pts, pts[:1]])
    return "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in pts) + ")"


def _to_wkt(name: str, payload) -> str:
    # typed empties decode symmetrically with the encoder: 0-count
    # bodies (and the NaN-point convention) -> "<TYPE> EMPTY", so a
    # decode->encode round trip never fabricates a 1-point header with
    # zero coordinate bytes
    if name == "POINT":
        x, y = payload[0]
        if np.isnan(x) and np.isnan(y):
            return "POINT EMPTY"
        return f"POINT ({_fmt(x)} {_fmt(y)})"
    if name != "GEOMETRYCOLLECTION" and len(payload) == 0:
        return f"{name} EMPTY"
    if name == "LINESTRING":
        return "LINESTRING (" + ", ".join(
            f"{_fmt(x)} {_fmt(y)}" for x, y in payload) + ")"
    if name == "POLYGON":
        return "POLYGON (" + ", ".join(_ring_txt(r) for r in payload) + ")"
    if name == "MULTIPOINT":
        return "MULTIPOINT (" + ", ".join(
            f"({_fmt(p[0][0])} {_fmt(p[0][1])})" for _, p in payload) + ")"
    if name == "MULTILINESTRING":
        return "MULTILINESTRING (" + ", ".join(
            "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in p) + ")"
            for _, p in payload) + ")"
    if name == "MULTIPOLYGON":
        return "MULTIPOLYGON (" + ", ".join(
            "(" + ", ".join(_ring_txt(r) for r in p) + ")"
            for _, p in payload) + ")"
    if not payload:
        return "GEOMETRYCOLLECTION EMPTY"
    return "GEOMETRYCOLLECTION (" + ", ".join(
        _to_wkt(n2, p2) for n2, p2 in payload) + ")"


def wkb_to_wkt(payload: bytes) -> str:
    """(E)WKB bytes -> WKT text (engine interchange format)."""
    name, data, _ = _decode_geom(_Reader(bytes(payload)))
    return _to_wkt(name, data)


def wkb_srid(payload: bytes) -> int | None:
    """The EWKB SRID, or None for plain ISO WKB."""
    _, _, srid = _decode_geom(_Reader(bytes(payload)))
    return srid


# --- encoder ----------------------------------------------------------------

def _enc_header(code: int, srid, bo: str) -> bytes:
    t = code | (_EWKB_SRID if srid is not None else 0)
    out = (b"\x01" if bo == "<" else b"\x00") + struct.pack(bo + "I", t)
    if srid is not None:
        out += struct.pack(bo + "I", srid)
    return out


def _enc_coords(arr, bo: str) -> bytes:
    a = np.asarray(arr, dtype=np.float64)
    return struct.pack(bo + "I", len(a)) + a.astype(bo + "f8").tobytes()


def _split_top(body: str):
    """Split on commas at paren depth 0 (WKT multi-geometry parts)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(body[start:i])
            start = i + 1
    parts.append(body[start:])
    return [p.strip() for p in parts]


def _check_2d_wkt(s: str):
    """Refuse Z/M WKT loudly instead of silently flattening: a
    dimension qualifier after the type name, or any coordinate group
    that is not exactly two numbers, raises (the module contract —
    the reference likewise forces 2D with st_force2d)."""
    if re.match(r"^\s*[A-Za-z]+\s+(ZM|Z|M)\b", s, re.IGNORECASE):
        raise ValueError(
            "Z/M WKT dimensions unsupported (force 2D upstream, as the "
            "reference's st_force2d does)")
    if "(" not in s:
        return
    # leaf coordinate groups are the runs ending at ',' or ')'; child
    # type names inside GEOMETRYCOLLECTION end at '(' so never match
    for grp in re.findall(r"[^(),]+(?=[,)])", s[s.index("("):]):
        toks = grp.split()
        if not toks:
            continue
        try:
            [float(t) for t in toks]
        except ValueError:
            continue                        # e.g. nested 'POINT EMPTY'
        if len(toks) != 2:
            raise ValueError(
                f"coordinate group {grp.strip()!r} has {len(toks)} "
                "ordinates; only 2D WKT is supported (never silently "
                "flattened)")


def wkt_to_wkb(wkt: str, srid: int | None = None, bo: str = "<") -> bytes:
    """WKT -> (E)WKB bytes. ``srid`` emits the PostGIS EWKB SRID flag.
    Covers all seven 2D types (the decoder's scope): multi-geometries
    nest full WKB children, each with its own byte-order byte and never
    an SRID flag. Typed empties round-trip (``LINESTRING EMPTY`` etc;
    ``POINT EMPTY`` uses the NaN-coordinates convention PostGIS
    emits); Z/M raises — never silently flattened."""
    from . import geometry

    s = wkt.strip()
    u = s.upper()
    _check_2d_wkt(s)
    m_empty = re.match(r"^([A-Z]+)\s+EMPTY$", u)
    if m_empty:
        name = m_empty.group(1)
        code = _CODE.get(name)
        if code is None:
            raise ValueError(f"unsupported WKT type {name!r}")
        if name == "POINT":
            return _enc_header(1, srid, bo) + struct.pack(
                bo + "2d", float("nan"), float("nan"))
        return _enc_header(code, srid, bo) + struct.pack(bo + "I", 0)
    if u.startswith("MULTIPOINT"):
        body = s[s.index("(") + 1:s.rindex(")")]
        pts = [p.strip().lstrip("(").rstrip(")").strip()
               for p in _split_top(body)]
        out = _enc_header(4, srid, bo) + struct.pack(bo + "I", len(pts))
        for p in pts:
            x, y = (float(v) for v in p.split()[:2])
            out += _enc_header(1, None, bo) + struct.pack(bo + "2d", x, y)
        return out
    if u.startswith("MULTILINESTRING"):
        body = s[s.index("(") + 1:s.rindex(")")]
        out = _enc_header(5, srid, bo)
        lines = _split_top(body)
        out += struct.pack(bo + "I", len(lines))
        for ln in lines:
            inner = ln[ln.index("(") + 1:ln.rindex(")")]
            pts = np.array([[float(v) for v in pair.split()[:2]]
                            for pair in inner.split(",")])
            out += _enc_header(2, None, bo) + _enc_coords(pts, bo)
        return out
    if u.startswith("GEOMETRYCOLLECTION"):
        if "(" not in s:                    # GEOMETRYCOLLECTION EMPTY
            return _enc_header(7, srid, bo) + struct.pack(bo + "I", 0)
        body = s[s.index("(") + 1:s.rindex(")")].strip()
        if not body:
            return _enc_header(7, srid, bo) + struct.pack(bo + "I", 0)
        children = _split_top(body)
        out = _enc_header(7, srid, bo) + struct.pack(bo + "I",
                                                     len(children))
        for child in children:
            out += wkt_to_wkb(child, None, bo)
        return out
    if u.startswith("POINT"):
        body = s[s.index("(") + 1:s.rindex(")")]
        x, y = (float(v) for v in body.split()[:2])
        return _enc_header(1, srid, bo) + struct.pack(bo + "2d", x, y)
    if u.startswith("LINESTRING"):
        body = s[s.index("(") + 1:s.rindex(")")]
        pts = np.array([[float(v) for v in pair.split()[:2]]
                        for pair in body.split(",")])
        return _enc_header(2, srid, bo) + _enc_coords(pts, bo)
    if u.startswith("MULTIPOLYGON") or u.startswith("POLYGON"):
        polys = geometry.parse_wkt_polys(s)

        def rings_body(rings):
            out = struct.pack(bo + "I", len(rings))
            for r in rings:
                rr = np.asarray(r, dtype=np.float64)
                if len(rr) and not np.array_equal(rr[0], rr[-1]):
                    rr = np.vstack([rr, rr[:1]])
                out += _enc_coords(rr, bo)
            return out

        if u.startswith("POLYGON"):
            return _enc_header(3, srid, bo) + rings_body(polys[0])
        out = _enc_header(6, srid, bo) + struct.pack(bo + "I", len(polys))
        for rings in polys:
            # nested geometry: own byte-order byte, never an SRID flag
            out += ((b"\x01" if bo == "<" else b"\x00")
                    + struct.pack(bo + "I", 3) + rings_body(rings))
        return out
    raise ValueError(f"unsupported WKT for WKB encode: {s[:30]}...")


# --- Spark column functions -------------------------------------------------

@F.pandas_udf(StringType())
def wkb_to_wkt_col(payloads: pd.Series) -> pd.Series:
    """Arrow-batched binary-WKB -> WKT column (the GeoParquet ingest
    step: spark.read.parquet(...).withColumn("wkt", wkb_to_wkt_col("geometry")))."""
    return payloads.map(lambda b: None if b is None else wkb_to_wkt(b))


@F.pandas_udf(BinaryType())
def wkt_to_wkb_col(wkts: pd.Series) -> pd.Series:
    """Arrow-batched WKT -> ISO little-endian WKB column (the export
    step back toward PostGIS/GeoParquet)."""
    return wkts.map(lambda s: None if s is None else wkt_to_wkb(s))


def read_geoparquet(spark, path: str, geometry_col: str = "geometry",
                    wkt_col: str = "wkt") -> DataFrame:
    """Parquet with a WKB geometry column (the GeoParquet layout, and
    what a PostGIS-to-parquet export produces) -> the same DataFrame
    with the engine's WKT column appended. Scan stays a plain parquet
    relation (pushdown/pruning intact); only the decode is a UDF."""
    df = spark.read.parquet(path)
    return df.withColumn(wkt_col, wkb_to_wkt_col(F.col(geometry_col)))
