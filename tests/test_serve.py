"""Single-address serving path vs the distributed pipeline: the Gen-2
point query (windowed COG read + zonal + AS 3959) must produce rows
value-identical to pipeline.address_bal_factors — the serving endpoint
and the batch engine can never drift."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from balrog_spark import corpus, docparse, geotiff, pipeline, serve

NX, NY = 2, 2


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    docs = corpus.spark_documents(spark, NX, NY)
    tiles = corpus.spark_tiles(spark, NX, NY, layers=("dem",)) \
        .filter(F.col("layer") == "dem")
    n = corpus.TILE_N
    mosaic = np.zeros((NY * n, NX * n), np.float32)
    for tx in range(NX):
        for ty in range(NY):
            dem, _ = corpus.tile_arrays(tx, ty)
            mosaic[(NY - 1 - ty) * n:(NY - ty) * n,
                   tx * n:(tx + 1) * n] = dem
    path = str(tmp_path_factory.mktemp("serve") / "dem.tif")
    with open(path, "wb") as f:
        f.write(geotiff.encode_geotiff(
            mosaic, 0.0, NY * corpus.TILE_M, corpus.PIXEL_M, tile=n,
            compression=5, nodata=-99))
    batch = pipeline.address_bal_factors(spark, docs, tiles).toPandas() \
        .set_index("addr_id")
    addrs = docparse.addresses_from_documents(docs).toPandas() \
        .set_index("addr_id")
    vegs = docparse.veg_from_documents(docs).toPandas()
    return path, batch, addrs, vegs


def test_serve_matches_pipeline_rows(world):
    """Every served column equals the distributed row for a spread of
    addresses (interior ones — the serving contract assumes the buffer
    window exists in the raster, as the reference's S3 reads do)."""
    path, batch, addrs, vegs = world
    t = corpus.TILE_M
    inner = [a for a, r in addrs.iterrows()
             if 110.0 < r.x < NX * t - 110.0
             and 110.0 < r.y < NY * t - 110.0]
    assert len(inner) >= 20
    sample = inner[:25]
    checked = 0
    with open(path, "rb") as f:
        for addr_id in sample:
            a = addrs.loc[addr_id]
            got = serve.address_bal(f, vegs, addr_id, float(a.x),
                                    float(a.y), int(a.fdi))
            want = batch.loc[addr_id]
            assert got["veg_id"] == want.veg_id, addr_id
            assert got["bal_number"] == want.bal_number
            assert got["distance_m"] == pytest.approx(
                want.distance_m, abs=1e-9), addr_id
            assert got["azimuth_deg"] == pytest.approx(
                want.azimuth_deg, abs=1e-9), addr_id
            assert got["slope_med_deg"] == want.slope_med_deg, addr_id
            assert got["aspect_med_deg"] == want.aspect_med_deg, addr_id
            for c in ("fdi", "slope_class", "aspect_class", "dir_class",
                      "eff_slope_code"):
                assert got[c] == getattr(want, c), (addr_id, c)
            assert got["bal"] == pytest.approx(float(want.bal)), addr_id
            checked += 1
    assert checked == len(sample) >= 20
