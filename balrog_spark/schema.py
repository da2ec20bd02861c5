"""Explicit StructTypes for every engine table (no schema inference —
matching the reference's declared-DDL style, reference:
testing/03_create_tables.sql, data_prep/vegetation/05_create_tables.sql)."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# The interleaved-document corpus (BASELINE.json input_hint).
SPAN = StructType([
    StructField("kind", StringType(), False),
    StructField("text", StringType(), False),
    StructField("media_ref", StringType(), False),
    StructField("offset", IntegerType(), False),
])

DOCUMENTS = StructType([
    StructField("doc_id", StringType(), False),
    StructField("spans", ArrayType(SPAN), False),
])

# Raster tile store — the Spark analogue of a COG block
# (reference: testing/02_get_slope_from_buffer.py:204-220 windowed COG reads).
TILES = StructType([
    StructField("media_ref", StringType(), False),
    StructField("layer", StringType(), False),
    StructField("tile_x", IntegerType(), False),
    StructField("tile_y", IntegerType(), False),
    StructField("x0", DoubleType(), False),
    StructField("y0", DoubleType(), False),
    StructField("pixel_m", DoubleType(), False),
    StructField("nrows", IntegerType(), False),
    StructField("ncols", IntegerType(), False),
    StructField("data", ArrayType(FloatType()), False),
])

# Address points (reference: data_prep/gnaf/create_buffered_points.sql:17-25).
ADDRESSES = StructType([
    StructField("addr_id", StringType(), False),
    StructField("x", DoubleType(), False),
    StructField("y", DoubleType(), False),
    StructField("fdi", IntegerType(), False),
])

# Vegetation polygons
# (reference: data_prep/vegetation/05_create_tables.sql:7-18).
VEG_POLYGONS = StructType([
    StructField("veg_id", StringType(), False),
    StructField("bal_number", IntegerType(), False),
    StructField("wkt", StringType(), False),
    StructField("area_m2", DoubleType(), False),
    StructField("cell_id", LongType(), False),
])

# Per-address zonal stats row (reference: testing/03_create_tables.sql:7-28).
ZONAL_STATS = StructType([
    StructField("addr_id", StringType(), False),
    StructField("buffer_size_m", DoubleType(), False),
    StructField("stat_min", IntegerType(), False),
    StructField("stat_max", IntegerType(), False),
    StructField("stat_avg", IntegerType(), False),
    StructField("stat_std", IntegerType(), False),
    StructField("stat_med", IntegerType(), False),
    StructField("pixel_count", IntegerType(), False),
])

# Per-tile 9-column BAL output
# (reference: calculate_bal.py:56-91 writes 9 rasters; we emit 9 arrays).
BAL_TILES = StructType([
    StructField("tile_x", IntegerType(), False),
    StructField("tile_y", IntegerType(), False),
    StructField("x0", DoubleType(), False),
    StructField("y0", DoubleType(), False),
    StructField("pixel_m", DoubleType(), False),
    StructField("nrows", IntegerType(), False),
    StructField("ncols", IntegerType(), False),
    StructField("bal_w", ArrayType(FloatType()), False),
    StructField("bal_e", ArrayType(FloatType()), False),
    StructField("bal_n", ArrayType(FloatType()), False),
    StructField("bal_s", ArrayType(FloatType()), False),
    StructField("bal_nw", ArrayType(FloatType()), False),
    StructField("bal_ne", ArrayType(FloatType()), False),
    StructField("bal_se", ArrayType(FloatType()), False),
    StructField("bal_sw", ArrayType(FloatType()), False),
    StructField("bal_max", ArrayType(FloatType()), False),
])
