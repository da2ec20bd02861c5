"""WKB/EWKB codec + GeoParquet-style ingest: the reference's PostGIS
wire format (wkb_geometry, 03_explode_multipolygons_and_classify.sql:7)
read into the engine's WKT interchange and back."""

import struct

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from balrog_spark import geometry, joins, wkbio


def _same_polys(w1, w2):
    a, b = geometry.parse_wkt_polys(w1), geometry.parse_wkt_polys(w2)
    assert len(a) == len(b)
    for pa, pb in zip(a, b):
        assert len(pa) == len(pb)
        for ra, rb in zip(pa, pb):
            ra = geometry._closed(ra)
            rb = geometry._closed(rb)
            assert np.allclose(ra, rb)


WKTS = [
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
    ("MULTIPOLYGON (((0 0, 5 0, 5 5, 0 5, 0 0)), "
     "((10 10, 12 10, 12 12, 10 12, 10 10)))"),
    ("MULTIPOLYGON (((0 0, 9 0, 9 9, 0 9, 0 0), "
     "(3 3, 6 3, 6 6, 3 6, 3 3)), "
     "((20 20, 24 20, 24 24, 20 24, 20 20)))"),   # holed part + plain part
]


def test_wkb_roundtrip_both_byte_orders():
    for bo in ("<", ">"):
        for w in WKTS:
            _same_polys(w, wkbio.wkb_to_wkt(wkbio.wkt_to_wkb(w, bo=bo)))
        assert wkbio.wkb_to_wkt(wkbio.wkt_to_wkb("POINT (3.5 -7.25)",
                                                 bo=bo)) \
            == "POINT (3.5 -7.25)"
        assert wkbio.wkb_to_wkt(
            wkbio.wkt_to_wkb("LINESTRING (0 0, 1 2, 3 4.5)", bo=bo)) \
            == "LINESTRING (0 0, 1 2, 3 4.5)"


def test_ewkb_srid_and_refusals():
    b = wkbio.wkt_to_wkb(WKTS[0], srid=7844)
    assert wkbio.wkb_srid(b) == 7844               # GDA2020
    _same_polys(WKTS[0], wkbio.wkb_to_wkt(b))
    assert wkbio.wkb_srid(wkbio.wkt_to_wkb(WKTS[0])) is None
    # Z coordinates: refused, never silently flattened
    zpt = b"\x01" + struct.pack("<I", 0x80000001) \
        + struct.pack("<3d", 1, 2, 3)
    with pytest.raises(ValueError, match="Z/M"):
        wkbio.wkb_to_wkt(zpt)
    with pytest.raises(ValueError, match="unknown WKB"):
        wkbio.wkb_to_wkt(b"\x01" + struct.pack("<I", 99))


def test_multi_and_collection_encode_roundtrip():
    """Decode->encode symmetry for the three remaining types: a WKT
    produced by wkb_to_wkt must re-encode and decode to itself."""
    wkts = [
        "MULTIPOINT ((1 2), (3.5 -4.25), (0 0))",
        "MULTILINESTRING ((0 0, 1 1, 2 0), (5 5, 6 7))",
        ("GEOMETRYCOLLECTION (POINT (1 1), "
         "LINESTRING (0 0, 2 2), "
         "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)), "
         "MULTIPOINT ((9 9), (8 8)))"),
        "GEOMETRYCOLLECTION EMPTY",
    ]
    for w in wkts:
        for bo in ("<", ">"):
            once = wkbio.wkb_to_wkt(wkbio.wkt_to_wkb(w, bo=bo))
            twice = wkbio.wkb_to_wkt(wkbio.wkt_to_wkb(once, bo=bo))
            assert once == twice
    # canonical decoder output re-encodes exactly
    assert wkbio.wkb_to_wkt(wkbio.wkt_to_wkb(
        "MULTIPOINT ((1 2), (3 4))")) == "MULTIPOINT ((1 2), (3 4))"
    # bare (unparenthesized) MULTIPOINT member form also accepted
    assert wkbio.wkb_to_wkt(wkbio.wkt_to_wkb(
        "MULTIPOINT (1 2, 3 4)")) == "MULTIPOINT ((1 2), (3 4))"
    # EWKB SRID on the outer geometry only
    b = wkbio.wkt_to_wkb("MULTILINESTRING ((0 0, 1 1))", srid=4283)
    assert wkbio.wkb_srid(b) == 4283


def test_geometrycollection_and_area_preserved():
    gc = (b"\x01" + struct.pack("<I", 7) + struct.pack("<I", 2)
          + wkbio.wkt_to_wkb("POINT (1 1)")
          + wkbio.wkt_to_wkb("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"))
    wkt = wkbio.wkb_to_wkt(gc)
    assert wkt.startswith("GEOMETRYCOLLECTION (POINT (1 1), POLYGON")
    for w in WKTS:
        back = wkbio.wkb_to_wkt(wkbio.wkt_to_wkb(w))
        a = sum(geometry.polygon_area(p)
                for p in geometry.parse_wkt_polys(w))
        b = sum(geometry.polygon_area(p)
                for p in geometry.parse_wkt_polys(back))
        assert b == pytest.approx(a, abs=1e-9)


def test_geoparquet_ingest_feeds_pip_join(spark, tmp_path):
    """End-to-end: a parquet export whose geometry column is PostGIS-style
    EWKB (the GeoParquet layout) ingests via read_geoparquet and drives
    the engine's PIP join identically to native-WKT input."""
    polys = [
        ("A", 1, "POLYGON ((0 0, 100 0, 100 100, 0 100, 0 0))"),
        ("B", 2, ("POLYGON ((200 200, 300 200, 300 300, 200 300, "
                  "200 200), (240 240, 260 240, 260 260, 240 260, "
                  "240 240))")),
    ]
    pdf = pd.DataFrame(polys, columns=["veg_id", "bal_number", "wkt"])
    pdf["geometry"] = pdf.wkt.map(
        lambda w: wkbio.wkt_to_wkb(w, srid=7844))
    path = str(tmp_path / "veg_geoparquet")
    spark.createDataFrame(pdf[["veg_id", "bal_number", "geometry"]]) \
        .write.parquet(path)

    vegs = wkbio.read_geoparquet(spark, path).select(
        "veg_id", "bal_number", "wkt")
    pts = spark.createDataFrame(
        pd.DataFrame([("in_a", 50.0, 50.0), ("in_hole", 250.0, 250.0),
                      ("in_b", 210.0, 210.0), ("out", 500.0, 500.0)],
                     columns=["addr_id", "x", "y"]))
    got = joins.pip_join(pts, vegs).select("addr_id", "veg_id") \
        .toPandas().sort_values("addr_id").reset_index(drop=True)
    assert list(map(tuple, got.values)) == [("in_a", "A"), ("in_b", "B")]

    # export path: WKT back to WKB column, bytes decode to same geometry
    back = vegs.withColumn("geom2", wkbio.wkt_to_wkb_col(F.col("wkt"))) \
        .select("veg_id", "geom2").toPandas()
    for r in back.itertuples():
        src = dict((v, w) for v, _, w in polys)[r.veg_id]
        _same_polys(src, wkbio.wkb_to_wkt(bytes(r.geom2)))


def test_zm_wkt_refused_never_flattened():
    """Encoder contract symmetry with the decoder: Z/M WKT raises in
    every form (qualifier or bare 3-number groups) instead of silently
    dropping the third ordinate."""
    for bad in ("POINT Z (1 2 3)", "POINT ZM (1 2 3 4)",
                "LINESTRING M (1 2 3, 4 5 6)",
                "LINESTRING (1 2 3, 4 5 6)",
                "POLYGON ((0 0 1, 1 0 1, 1 1 1, 0 0 1))",
                "MULTIPOINT (1 2 3, 4 5 6)"):
        with pytest.raises(ValueError):
            wkbio.wkt_to_wkb(bad)


def test_typed_empties_roundtrip():
    """LINESTRING/POLYGON/MULTI*/POINT EMPTY encode to 0-count bodies
    (POINT: the NaN convention PostGIS uses) and decode back to the
    same typed EMPTY — no corrupt 1-point headers with zero coordinate
    bytes."""
    for wkt in ("POINT EMPTY", "LINESTRING EMPTY", "POLYGON EMPTY",
                "MULTIPOINT EMPTY", "MULTILINESTRING EMPTY",
                "MULTIPOLYGON EMPTY", "GEOMETRYCOLLECTION EMPTY"):
        for bo in ("<", ">"):
            blob = wkbio.wkt_to_wkb(wkt, bo=bo)
            assert wkbio.wkb_to_wkt(blob) == wkt, (wkt, bo)
            # decode->encode->decode is stable too
            assert wkbio.wkb_to_wkt(
                wkbio.wkt_to_wkb(wkbio.wkb_to_wkt(blob))) == wkt
