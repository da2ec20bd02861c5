"""GeoPackage source: stdlib-sqlite3 metadata walk, rowid-range
manifest fan-out, GP-header parsing (envelope variants), WKB decode —
the container format the reference's vector data passes through on its
way into PostGIS."""

import struct

import numpy as np
import pandas as pd
import pytest

from balrog_spark import geometry, gpkg, joins, wkbio

POLY_A = "POLYGON ((0 0, 100 0, 100 100, 0 100, 0 0))"
POLY_B = ("POLYGON ((200 200, 300 200, 300 300, 200 300, 200 200), "
          "(240 240, 260 240, 260 260, 240 260, 240 240))")


def _world_pdf(n_extra=0):
    rows = [("A", 1, POLY_A), ("B", 2, POLY_B)]
    for i in range(n_extra):
        x = 1000 + 10 * i
        rows.append((f"X{i:03d}", 3,
                     f"POLYGON (({x} 0, {x + 5} 0, {x + 5} 5, {x} 5, "
                     f"{x} 0))"))
    return pd.DataFrame(rows, columns=["veg_id", "bal_number", "wkt"])


def test_roundtrip_and_layer_metadata(spark, tmp_path):
    path = str(tmp_path / "veg.gpkg")
    pdf = _world_pdf()
    gpkg.write_gpkg(path, "veg", pdf, srs_id=7844)
    assert gpkg.list_layers(path) == [("veg", "geom", 7844, 2)]
    got = gpkg.gpkg_features(spark, path).toPandas() \
        .sort_values("veg_id").reset_index(drop=True)
    assert list(got.columns) == ["veg_id", "bal_number", "wkt"]
    for i, r in got.iterrows():
        a = geometry.parse_wkt_polys(pdf.wkt[i])
        b = geometry.parse_wkt_polys(r.wkt)
        assert len(a) == len(b)
        assert sum(geometry.polygon_area(p) for p in b) == \
            pytest.approx(sum(geometry.polygon_area(p) for p in a),
                          abs=1e-9)


def test_rowid_range_fanout_covers_every_row(spark, tmp_path):
    """A small rows_per_task forces a multi-range manifest; the union of
    executor range-reads must be exactly the table."""
    path = str(tmp_path / "many.gpkg")
    pdf = _world_pdf(n_extra=57)
    gpkg.write_gpkg(path, "veg", pdf)
    got = gpkg.gpkg_features(spark, path, rows_per_task=7).toPandas()
    assert sorted(got.veg_id) == sorted(pdf.veg_id)
    assert got.wkt.notna().all()


def test_geometry_blob_envelope_variants():
    wkb = wkbio.wkt_to_wkb(POLY_A)
    # no envelope
    assert gpkg.parse_gpkg_geometry(
        b"GP" + bytes([0, 0x01]) + struct.pack("<i", 0) + wkb) \
        .startswith("POLYGON")
    # envelope code 1: 4 doubles between header and WKB
    env = struct.pack("<4d", 0, 100, 0, 100)
    blob = b"GP" + bytes([0, 0x01 | (1 << 1)]) + struct.pack("<i", 0) \
        + env + wkb
    assert gpkg.parse_gpkg_geometry(blob).startswith("POLYGON")
    # empty-geometry flag
    blob = b"GP" + bytes([0, 0x01 | 0x10]) + struct.pack("<i", 0)
    assert gpkg.parse_gpkg_geometry(blob) == "GEOMETRYCOLLECTION EMPTY"
    with pytest.raises(ValueError, match="not a GPKG"):
        gpkg.parse_gpkg_geometry(b"XX" + bytes(20))
    with pytest.raises(ValueError, match="envelope"):
        gpkg.parse_gpkg_geometry(b"GP" + bytes([0, 0x01 | (5 << 1)])
                                 + struct.pack("<i", 0) + wkb)


def test_table_selection_and_errors(spark, tmp_path):
    path = str(tmp_path / "two.gpkg")
    gpkg.write_gpkg(path, "veg", _world_pdf())
    gpkg.write_gpkg(path, "roads", pd.DataFrame(
        {"rid": [1], "wkt": ["LINESTRING (0 0, 1 1)"]}))
    assert len(gpkg.list_layers(path)) == 2
    with pytest.raises(ValueError, match="2 feature tables"):
        gpkg.gpkg_features(spark, path)
    with pytest.raises(ValueError, match="no feature table"):
        gpkg.gpkg_features(spark, path, table="nope")
    got = gpkg.gpkg_features(spark, path, table="roads").toPandas()
    assert got.wkt[0].startswith("LINESTRING")


def test_gpkg_feeds_pip_join(spark, tmp_path):
    """End-to-end: GPKG-ingested vegetation drives the engine's PIP
    join identically to native input (hole semantics included)."""
    path = str(tmp_path / "veg.gpkg")
    gpkg.write_gpkg(path, "veg", _world_pdf(), srs_id=7844)
    vegs = gpkg.gpkg_features(spark, path)
    pts = spark.createDataFrame(pd.DataFrame(
        [("in_a", 50.0, 50.0), ("in_hole", 250.0, 250.0),
         ("in_b", 210.0, 210.0), ("out", 900.0, 900.0)],
        columns=["addr_id", "x", "y"]))
    got = joins.pip_join(pts, vegs).select("addr_id", "veg_id") \
        .toPandas().sort_values("addr_id")
    assert list(map(tuple, got.values)) == [("in_a", "A"), ("in_b", "B")]


def test_nullable_integer_column_survives_later_nulls(spark, tmp_path):
    """Schema comes from the DECLARED sqlite type, not a one-row probe:
    an INTEGER column whose first row is non-null but a later range is
    NULL must read back as BIGINT with nulls, not crash or cast
    garbage."""
    import sqlite3

    path = str(tmp_path / "nullable.gpkg")
    gpkg.write_gpkg(path, "t", pd.DataFrame({
        "height": [10, 20, 30],
        "wkt": ["POINT (0 0)", "POINT (1 1)", "POINT (2 2)"]}))
    con = sqlite3.connect(path)
    con.execute('UPDATE "t" SET height = NULL WHERE rowid = 3')
    con.commit()
    con.close()
    got = gpkg.gpkg_features(spark, path, rows_per_task=2) \
        .orderBy("height").toPandas()
    assert str(got.height.dtype) in ("float64", "Int64", "object")
    vals = sorted(int(v) for v in got.height.dropna())
    assert vals == [10, 20] and got.height.isna().sum() == 1
    assert dict(gpkg.gpkg_features(spark, path).dtypes)["height"] \
        == "bigint"


def test_empty_flag_keeps_wkb_type_and_short_blob_raises():
    from balrog_spark import wkbio

    blob = (b"GP\x00\x00" + (0).to_bytes(4, "little")
            + wkbio.wkt_to_wkb("POINT EMPTY"))
    blob = bytes([blob[0], blob[1], blob[2], blob[3] | 0x10]) + blob[4:]
    assert gpkg.parse_gpkg_geometry(blob) == "POINT EMPTY"
    with pytest.raises(ValueError, match="truncated"):
        gpkg.parse_gpkg_geometry(b"GP\x00")
