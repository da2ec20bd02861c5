"""GeoPackage (GPKG) vector source — stdlib sqlite3 + the WKB codec.

GeoPackage is the OGC's SQLite container: feature tables whose geometry
column holds a "GP" binary header (version, flags, srs_id, optional
envelope) followed by ISO WKB. The reference's vector data enters
PostGIS through exactly this kind of ogr2ogr container load (the NVIS
table's ``wkb_geometry``, reference:
data_prep/vegetation/03_explode_multipolygons_and_classify.sql:7); this
source lets the engine read the container directly — no GDAL, no
PostGIS.

Distributed shape: SQLite files are not block-splittable, but they ARE
rowid-indexed. The driver reads only the KB-scale metadata
(gpkg_contents / gpkg_geometry_columns, min/max rowid) and builds a
rowid-RANGE manifest; each executor opens the file read-only
(immutable=1) and SELECTs exactly its range — the same
manifest-then-range-read shape as the GeoTIFF source, so one big GPKG
fans out across the cluster instead of serializing through the driver.
"""

from __future__ import annotations

import sqlite3
import struct

import pandas as pd
from pyspark.sql import DataFrame

from . import wkbio

_MAGIC = b"GP"


def parse_gpkg_geometry(blob: bytes) -> str:
    """GPKG geometry blob -> WKT: validate the GP header, skip the
    envelope (its size is coded in the flags), decode the WKB tail.
    Empty-flagged blobs keep their WKB-declared type (``POINT EMPTY``
    etc — ogr2ogr writes typed empties routinely) instead of collapsing
    to GEOMETRYCOLLECTION EMPTY."""
    if len(blob) < 8:
        raise ValueError(
            f"GPKG geometry blob truncated ({len(blob)} bytes < 8)")
    if blob[:2] != _MAGIC:
        raise ValueError("not a GPKG geometry blob")
    version, flags = blob[2], blob[3]
    if version != 0:
        raise ValueError(f"unsupported GPKG geometry version {version}")
    if flags & 0x20:
        raise ValueError("extended GPKG geometry types unsupported")
    env_code = (flags >> 1) & 0x07
    env_doubles = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}.get(env_code)
    if env_doubles is None:
        raise ValueError(f"invalid GPKG envelope code {env_code}")
    tail = blob[8 + 8 * env_doubles:]
    if flags & 0x10:                       # empty-geometry flag
        if len(tail) >= 5:
            import struct
            bo = "<" if tail[0] == 1 else ">"
            (code,) = struct.unpack(f"{bo}I", tail[1:5])
            name = wkbio.WKB_TYPE_NAMES.get(code % 1000)
            if name:
                return f"{name} EMPTY"
        return "GEOMETRYCOLLECTION EMPTY"
    return wkbio.wkb_to_wkt(tail)


def _connect_ro(path: str) -> sqlite3.Connection:
    return sqlite3.connect(f"file:{path}?mode=ro&immutable=1", uri=True)


def list_layers(path: str) -> list:
    """(table, geometry_column, srs_id, row_count) for every feature
    table — driver-side metadata only."""
    con = _connect_ro(path)
    try:
        rows = con.execute(
            "SELECT c.table_name, g.column_name, g.srs_id "
            "FROM gpkg_contents c JOIN gpkg_geometry_columns g "
            "ON c.table_name = g.table_name "
            "WHERE c.data_type = 'features'").fetchall()
        out = []
        for table, gcol, srs in rows:
            n = con.execute(
                f'SELECT COUNT(*) FROM "{table}"').fetchone()[0]
            out.append((table, gcol, srs, n))
        return out
    finally:
        con.close()


def gpkg_features(spark, path: str, table: str | None = None,
                  wkt_col: str = "wkt",
                  rows_per_task: int = 20000) -> DataFrame:
    """GPKG feature table -> DataFrame (attribute columns + ``wkt``).

    The driver touches only metadata; executors each SELECT one rowid
    range from a read-only immutable connection and decode geometry
    blobs with the shared WKB codec. ``table`` defaults to the file's
    single feature table (ambiguity raises)."""
    layers = list_layers(path)
    if not layers:
        raise ValueError(f"{path} has no feature tables")
    if table is None:
        if len(layers) > 1:
            raise ValueError(
                f"{path} has {len(layers)} feature tables "
                f"({[t for t, _, _, _ in layers]}); pass table=")
        table, gcol, _, _ = layers[0]
    else:
        match = [row for row in layers if row[0] == table]
        if not match:
            raise ValueError(f"no feature table {table!r} in {path}")
        gcol = match[0][1]

    con = _connect_ro(path)
    try:
        lo, hi = con.execute(
            f'SELECT MIN(rowid), MAX(rowid) FROM "{table}"').fetchone()
        tinfo = con.execute(f'PRAGMA table_info("{table}")').fetchall()
    finally:
        con.close()
    cols = [r[1] for r in tinfo]
    # schema from the DECLARED sqlite types, not a one-row probe: a
    # nullable INTEGER whose first row happens to be non-null would
    # otherwise be typed from an int64 probe and then break (or cast
    # garbage) when a later range's pandas frame arrives as
    # float64-with-NaN; declared affinity is null-stable
    decl = {r[1]: _spark_type_decl(r[2]) for r in tinfo}
    attr_cols = [c for c in cols if c != gcol]
    if lo is None:
        lo, hi = 0, -1
    ranges = [(a, min(a + rows_per_task - 1, hi))
              for a in range(lo, hi + 1, rows_per_task)] or [(0, -1)]
    mdf = spark.createDataFrame(
        pd.DataFrame(ranges, columns=["lo", "hi"])) \
        .repartition(min(len(ranges),
                         spark.sparkContext.defaultParallelism))

    out_schema = ", ".join(
        [f"`{c}` {decl[c]}" for c in attr_cols]
        + [f"{wkt_col} STRING"])
    int_cols = [c for c in attr_cols if decl[c] == "BIGINT"]

    def fetch(batches):
        con = _connect_ro(path)
        sel = ", ".join([f'"{c}"' for c in attr_cols] + [f'"{gcol}"'])
        for pdf in batches:
            for r in pdf.itertuples():
                q = (f'SELECT {sel} FROM "{table}" '
                     f"WHERE rowid BETWEEN {int(r.lo)} AND {int(r.hi)}")
                part = pd.read_sql_query(q, con)
                for c in int_cols:
                    # NULL-bearing ranges come back float64+NaN; the
                    # nullable Int64 dtype converts to BIGINT cleanly
                    part[c] = part[c].astype("Int64")
                part[wkt_col] = part[gcol].map(
                    lambda b: None if b is None
                    else parse_gpkg_geometry(bytes(b)))
                yield part.drop(columns=[gcol])
    return mdf.mapInPandas(fetch, schema=out_schema)


def _spark_type_decl(decl: str) -> str:
    """sqlite declared type -> Spark type by SQLite affinity rules
    (the GPKG spec's column types all resolve through these)."""
    d = (decl or "").upper()
    if "INT" in d or d in ("BOOLEAN", "BOOL"):
        return "BIGINT"
    if any(k in d for k in ("CHAR", "CLOB", "TEXT", "DATE", "TIME")):
        return "STRING"
    if "BLOB" in d or d == "":
        return "BINARY"
    if any(k in d for k in ("REAL", "FLOA", "DOUB", "NUMERIC", "DECIMAL")):
        return "DOUBLE"
    return "STRING"


# --- writer (fixtures + export) ---------------------------------------------

def write_gpkg(path: str, table: str, pdf: pd.DataFrame,
               wkt_col: str = "wkt", srs_id: int = 0) -> None:
    """Write a minimal valid GeoPackage (driver-side; fixture twin of
    the reader, and a practical small-result export). Attribute columns
    are taken from ``pdf`` minus ``wkt_col``; geometry blobs are GP
    header (no envelope) + ISO WKB."""
    con = sqlite3.connect(path)
    try:
        con.execute("PRAGMA application_id = 0x47504B47")   # 'GPKG'
        con.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_contents ("
            "table_name TEXT PRIMARY KEY, data_type TEXT, "
            "identifier TEXT, srs_id INTEGER)")
        con.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_geometry_columns ("
            "table_name TEXT, column_name TEXT, geometry_type_name TEXT, "
            "srs_id INTEGER, z TINYINT, m TINYINT)")
        attr_cols = [c for c in pdf.columns if c != wkt_col]
        defs = ", ".join(
            f'"{c}" {_sqlite_type(pdf[c])}' for c in attr_cols)
        con.execute(f'CREATE TABLE "{table}" '
                    f"({defs}{', ' if defs else ''}geom BLOB)")
        con.execute(
            "INSERT OR REPLACE INTO gpkg_contents VALUES (?, "
            "'features', ?, ?)", (table, table, srs_id))
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', "
            "'GEOMETRY', ?, 0, 0)", (table, srs_id))
        header = _MAGIC + bytes([0, 0x01]) \
            + struct.pack("<i", srs_id)            # v0, little-endian, no env
        for r in pdf.itertuples(index=False):
            d = r._asdict()
            blob = header + wkbio.wkt_to_wkb(d[wkt_col])
            con.execute(
                f'INSERT INTO "{table}" VALUES '
                f"({', '.join('?' * (len(attr_cols) + 1))})",
                [d[c] for c in attr_cols] + [blob])
        con.commit()
    finally:
        con.close()


def _sqlite_type(series: pd.Series) -> str:
    import numpy as np

    dt = series.dtype
    if np.issubdtype(dt, np.integer):
        return "INTEGER"
    if np.issubdtype(dt, np.floating):
        return "REAL"
    return "TEXT"
