"""FlatGeobuf source/sink: roundtrip, index pruning, ingest parity.

The reference reads its production vegetation layer (nvis6_bal.fgb)
through fiona with a spatial mask (xx_fiona_testing.py:133-136); these
tests pin the clean-room reader/writer pair: WKT+property roundtrip for
every supported geometry, packed-Hilbert-R-tree window reads touching
<10% of file bytes on a clustered file, and pip_join parity between the
FGB ingest path and the GeoParquet/WKB ingest of identical polygons.
"""

import os
import struct

import numpy as np
import pandas as pd
import pytest

from balrog_spark import fgb


def _grid_polys(n_side: int, cell: float = 10.0) -> pd.DataFrame:
    rows = []
    f = fgb._f                     # engine-canonical float formatting
    for i in range(n_side):
        for j in range(n_side):
            x, y = i * cell, j * cell
            w = cell * 0.8
            rows.append({
                "fid": i * n_side + j,
                "cls": f"veg{(i + j) % 5}",
                "score": round(0.1 * ((i * 31 + j * 17) % 90), 4),
                "wkt": (f"POLYGON (({f(x)} {f(y)}, {f(x + w)} {f(y)}, "
                        f"{f(x + w)} {f(y + w)}, {f(x)} {f(y + w)}, "
                        f"{f(x)} {f(y)}))")})
    return pd.DataFrame(rows)


def _decode_all(path: str) -> pd.DataFrame:
    info = fgb.read_fgb_info(path)
    rows = []
    with open(path, "rb") as f:
        fd = f.fileno()
        for off in fgb._leaf_offsets(path, info):
            (sz,) = struct.unpack("<I", os.pread(fd, 4, off))
            rows.append(fgb.decode_feature(
                os.pread(fd, sz, off + 4), info["columns"],
                info["geometry_type"]))
    return pd.DataFrame(rows)


def test_fgb_roundtrip_polygons(tmp_path):
    pdf = _grid_polys(5)
    p = str(tmp_path / "t.fgb")
    meta = fgb.write_fgb(p, pdf, crs_code=7844)
    assert meta["features"] == 25
    info = fgb.read_fgb_info(p)
    assert info["features_count"] == 25
    assert info["geometry_type"] == fgb.GT_POLYGON
    assert info["crs"] == ("EPSG", 7844)
    assert info["envelope"] == (0.0, 0.0, 48.0, 48.0)
    assert info["columns"] == [("fid", fgb.CT_LONG),
                               ("cls", fgb.CT_STRING),
                               ("score", fgb.CT_DOUBLE)]
    got = _decode_all(p).sort_values("fid").reset_index(drop=True)
    exp = pdf.sort_values("fid").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["fid", "cls", "score", "wkt"]], exp)


def test_fgb_roundtrip_mixed_types(tmp_path):
    """Point / LineString / MultiPolygon + holes + null property."""
    pdf = pd.DataFrame({
        "name": ["pt", "ln", None, "mp"],
        "wkt": [
            "POINT (3.25 4.5)",
            "LINESTRING (0 0, 5 5, 10 0)",
            ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
             "(3 3, 4 3, 4 4, 3 4, 3 3))"),
            ("MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), "
             "((5 5, 7 5, 7 7, 5 7, 5 5)))"),
        ]})
    p = str(tmp_path / "m.fgb")
    fgb.write_fgb(p, pdf)
    info = fgb.read_fgb_info(p)
    assert info["geometry_type"] == 0          # heterogeneous
    got = _decode_all(p)
    assert sorted(got.wkt) == sorted(pdf.wkt)
    assert set(got.name) == {"pt", "ln", "mp", None}


def test_fgb_window_read_prunes_bytes(tmp_path):
    """A small bbox on a Hilbert-clustered file must be answerable by
    reading <10% of file bytes (header + touched index nodes + hit
    features) — the property the reference exploits for its 37 GB
    vegetation layer over HTTP GetRange."""
    pdf = _grid_polys(45)                      # 2025 features
    p = str(tmp_path / "big.fgb")
    meta = fgb.write_fgb(p, pdf)
    total = meta["total_bytes"]
    res = fgb.fgb_search(p, (100.0, 100.0, 140.0, 140.0))
    feat_bytes = 0
    with open(p, "rb") as f:
        fd = f.fileno()
        for off in res["offsets"]:
            (sz,) = struct.unpack("<I", os.pread(fd, 4, off))
            feat_bytes += 4 + sz
    touched = res["bytes_header"] + res["bytes_index"] + feat_bytes
    assert touched < 0.10 * total, (touched, total)
    # and the hits are exactly the bbox-intersecting cells
    xs = range(10, 15)                         # cells overlapping 100..140
    expect = {i * 45 + j for i in xs for j in xs}
    got = set()
    with open(p, "rb") as f:
        fd = f.fileno()
        info = res["info"]
        for off in res["offsets"]:
            (sz,) = struct.unpack("<I", os.pread(fd, 4, off))
            row = fgb.decode_feature(os.pread(fd, sz, off + 4),
                                     info["columns"],
                                     info["geometry_type"])
            got.add(row["fid"])
    assert got == expect


def test_fgb_spark_read_full_and_bbox(spark, tmp_path):
    pdf = _grid_polys(12)
    p = str(tmp_path / "s.fgb")
    fgb.write_fgb(p, pdf)
    full = fgb.read_fgb(spark, p).toPandas() \
        .sort_values("fid").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        full[["fid", "cls", "score", "wkt"]],
        pdf.sort_values("fid").reset_index(drop=True))
    sub = fgb.read_fgb(spark, p, bbox=(0, 0, 25, 25)).toPandas()
    assert set(sub.fid) == {i * 12 + j for i in range(3)
                            for j in range(3)}
    empty = fgb.read_fgb(spark, p, bbox=(1e6, 1e6, 2e6, 2e6))
    assert empty.count() == 0
    assert "wkt" in empty.columns


def test_fgb_read_coalescing_invariant(spark, tmp_path):
    """The coalesced-range fetch is a pure IO optimization: gap=0
    (one pread per feature), a mid-size gap (mixed runs: adjacent
    Hilbert neighbours coalesce, far ones split), and the default
    64 KiB gap (whole partition in few ranges) must all decode the
    identical frame, full-scan and bbox-pruned alike."""
    pdf = _grid_polys(12)
    p = str(tmp_path / "c.fgb")
    fgb.write_fgb(p, pdf)
    want = pdf.sort_values("fid").reset_index(drop=True)
    for gap in (0, 96, 1 << 16):
        got = fgb.read_fgb(spark, p, coalesce_gap=gap).toPandas() \
            .sort_values("fid").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["fid", "cls", "score", "wkt"]], want)
        sub = fgb.read_fgb(spark, p, bbox=(0, 0, 25, 25),
                           coalesce_gap=gap).toPandas()
        assert set(sub.fid) == {i * 12 + j for i in range(3)
                                for j in range(3)}


def test_fgb_pip_join_parity_with_geoparquet(spark, tmp_path):
    """Identical polygons ingested via FlatGeobuf and via WKB/
    GeoParquet must drive joins.pip_join to identical output."""
    from balrog_spark import joins, wkbio

    pdf = _grid_polys(8)
    pdf = pdf.rename(columns={"fid": "veg_id"})
    pdf["bal_number"] = (pdf.veg_id % 7).astype("int64")
    pdf["veg_id"] = pdf.veg_id.map(lambda v: f"v{v:04d}")
    p = str(tmp_path / "j.fgb")
    fgb.write_fgb(p, pdf[["veg_id", "bal_number", "wkt"]])
    polys_fgb = fgb.read_fgb(spark, p).select(
        "veg_id", "bal_number", "wkt")

    gp = pdf.copy()
    gp["geometry"] = gp.wkt.map(lambda w: wkbio.wkt_to_wkb(w))
    pq = str(tmp_path / "j.parquet")
    spark.createDataFrame(gp[["veg_id", "bal_number", "geometry"]]) \
        .write.parquet(pq)
    polys_pq = wkbio.read_geoparquet(spark, pq).select(
        "veg_id", "bal_number", "wkt")

    pts = spark.createDataFrame(pd.DataFrame({
        "addr_id": [f"a{i:04d}" for i in range(300)],
        "x": (np.arange(300) * 37.0) % 80,
        "y": (np.arange(300) * 53.0) % 80}))
    a = joins.pip_join(pts, polys_fgb).toPandas() \
        .sort_values(["addr_id", "veg_id"]).reset_index(drop=True)
    b = joins.pip_join(pts, polys_pq).toPandas() \
        .sort_values(["addr_id", "veg_id"]).reset_index(drop=True)
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_fgb_gpkg_cross_format_parity(spark, tmp_path):
    """The same layer written as GPKG and as FGB reads back identical
    (attributes + WKT) through both sources."""
    from balrog_spark import gpkg

    pdf = _grid_polys(6)[["fid", "cls", "wkt"]]
    gp = str(tmp_path / "x.gpkg")
    fp = str(tmp_path / "x.fgb")
    gpkg.write_gpkg(gp, "veg", pdf, wkt_col="wkt")
    fgb.write_fgb(fp, pdf)
    a = gpkg.gpkg_features(spark, gp).select("fid", "cls", "wkt") \
        .toPandas().sort_values("fid").reset_index(drop=True)
    b = fgb.read_fgb(spark, fp).select("fid", "cls", "wkt") \
        .toPandas().sort_values("fid").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_fgb_refusals(tmp_path):
    with pytest.raises(ValueError, match="unsupported WKT"):
        fgb.write_fgb(str(tmp_path / "x.fgb"), pd.DataFrame({
            "wkt": ["GEOMETRYCOLLECTION (POINT (0 0))"]}))
    with pytest.raises(ValueError, match="at least one"):
        fgb.write_fgb(str(tmp_path / "y.fgb"),
                      pd.DataFrame({"wkt": []}))
    bad = tmp_path / "bad.fgb"
    bad.write_bytes(b"notafgbfile!")
    with pytest.raises(ValueError, match="not a FlatGeobuf"):
        fgb.read_fgb_info(str(bad))


def test_fgb_hilbert_locality(tmp_path):
    """Hilbert ordering puts spatially-adjacent features at adjacent
    byte offsets: the mean byte distance between a cell and its east
    neighbor must be far below the shuffled expectation (~1/3 file)."""
    n = 32
    pdf = _grid_polys(n)
    p = str(tmp_path / "h.fgb")
    meta = fgb.write_fgb(p, pdf)
    info = fgb.read_fgb_info(p)
    offs = fgb._leaf_offsets(p, info)
    fid_off = {}
    with open(p, "rb") as f:
        fd = f.fileno()
        for off in offs:
            (sz,) = struct.unpack("<I", os.pread(fd, 4, off))
            row = fgb.decode_feature(os.pread(fd, sz, off + 4),
                                     info["columns"],
                                     info["geometry_type"])
            fid_off[row["fid"]] = off
    gaps = [abs(fid_off[i * n + j] - fid_off[(i + 1) * n + j])
            for i in range(n - 1) for j in range(n)]
    assert np.mean(gaps) < 0.15 * meta["total_bytes"]


def test_level_bounds_guards_spec_legal_headers():
    """features_count=0 (unknown) and node_size<2 are spec-legal header
    values that used to hang / ZeroDivision the driver — now they fail
    loud at the math layer and size to 0 at the info layer."""
    with pytest.raises(ValueError, match="num_items"):
        fgb._level_bounds(0, 16)
    with pytest.raises(ValueError, match="node_size"):
        fgb._level_bounds(5, 1)
    assert fgb._rtree_size(0) == 0
    assert fgb._rtree_size(5, 0) == 0


def test_unindexed_fgb_full_scan_and_loud_bbox_refusal(spark, tmp_path):
    """node_size=0 writes a spec-legal UNINDEXED file: info parses,
    the full scan walks size prefixes sequentially and matches the
    indexed twin row-for-row, and a bbox search refuses with a clear
    error instead of hanging."""
    pdf = _grid_polys(4)
    plain = str(tmp_path / "plain.fgb")
    noidx = str(tmp_path / "noindex.fgb")
    fgb.write_fgb(plain, pdf, node_size=16)
    out = fgb.write_fgb(noidx, pdf, node_size=0)
    assert out["index_bytes"] == 0

    info = fgb.read_fgb_info(noidx)
    assert info["index_node_size"] == 0 and info["index_bytes"] == 0

    a = fgb.read_fgb(spark, plain).toPandas().sort_values("fid") \
        .reset_index(drop=True)
    b = fgb.read_fgb(spark, noidx).toPandas().sort_values("fid") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    with pytest.raises(ValueError, match="no spatial index"):
        fgb.fgb_search(noidx, (0, 0, 15, 15))
