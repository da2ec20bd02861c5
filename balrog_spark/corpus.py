"""Deterministic synthetic corpus generator (seed folded into integer hashes).

Generates the interleaved-document corpus of FIXTURES.md §1-2: documents with
ADDR / VEG text spans and media_ref tile spans, plus the raster tile side
table. Everything derives from pure integer hashes of grid coordinates, so:

- any tile/address/polygon can be generated independently on any executor
  (generation itself is distributed via mapInPandas — no driver bottleneck,
  which is what makes the same generator usable at bench scale);
- reruns are bit-identical (no wall-clock, no global RNG state).

World model: projected CRS in metres; tiles are 64x64 px at 25 m (1600 m
square), DEM is a smooth analytic surface with seeded nodata blobs, raw
vegetation codes form 400 m blobs remapped by the reference NVIS remap string
(reference: data_prep/vegetation/02_create_nvis_bal_map_table.sql:8-9).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import cells, geometry
from .constants import NODATA

SEED = 42
TILE_N = 64
PIXEL_M = 25.0
TILE_M = TILE_N * PIXEL_M

# reference NVIS -> AS 3959 veg class remap
# (reference: data_prep/vegetation/02_create_nvis_bal_map_table.sql:8-9)
VEG_REMAP = ("1 6;2 1;3 1;4 1;5 13 2;14 5;15 18 3;19 22 7;23 4;"
             "24 25 NODATA;26 4;27 28 NODATA;29 4;30 1;31 2;32 5;99 NODATA")

FDI_CHOICES = np.array([100, 80, 50, 40])


def _hash64(*cols):
    """Vectorized splitmix64-style mix of integer arrays -> uint64."""
    h = np.uint64(SEED * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
    acc = np.zeros(np.broadcast(*[np.asarray(c) for c in cols]).shape,
                   dtype=np.uint64) + h
    with np.errstate(over="ignore"):
        for c in cols:
            v = np.asarray(c, dtype=np.int64).astype(np.uint64)
            acc ^= v + np.uint64(0x9E3779B97F4A7C15) \
                + (acc << np.uint64(6)) + (acc >> np.uint64(2))
            acc = (acc ^ (acc >> np.uint64(30))) \
                * np.uint64(0xBF58476D1CE4E5B9)
            acc = (acc ^ (acc >> np.uint64(27))) \
                * np.uint64(0x94D049BB133111EB)
            acc ^= acc >> np.uint64(31)
    return acc


def _uniform(*cols):
    """Deterministic uniform [0, 1) from integer coordinates."""
    return (_hash64(*cols) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


# --- raster layers ------------------------------------------------------------

def dem_surface(x_m, y_m):
    """Smooth analytic terrain: peaks to ~30 deg slopes so all slope classes
    occur."""
    x = np.asarray(x_m, dtype=np.float64)
    y = np.asarray(y_m, dtype=np.float64)
    return (300.0  # keep the surface well clear of the -99 nodata sentinel
            + 150.0 * np.sin(x / 500.0) * np.cos(y / 600.0)
            + 40.0 * np.sin(x / 150.0 + 1.0) * np.sin(y / 130.0)
            + 0.01 * x)


def tile_arrays(tile_x: int, tile_y: int, n: int = TILE_N,
                pixel_m: float = PIXEL_M):
    """(dem, veg_raw) arrays for one tile. Row 0 is the NORTH edge (row-major
    top-down, like RasterToNumPyArray): pixel (r, c) centre is at
    x = x0 + (c + .5) px, y = y0 + (n - r - .5) px."""
    x0 = tile_x * n * pixel_m
    y0 = tile_y * n * pixel_m
    cidx = np.arange(n)
    ridx = np.arange(n)
    xs = x0 + (cidx + 0.5) * pixel_m
    ys = y0 + (n - ridx - 0.5) * pixel_m
    xg, yg = np.meshgrid(xs, ys)  # (row, col)

    dem = dem_surface(xg, yg)
    # global pixel indices for hashing
    gx = np.round(xg / pixel_m - 0.5).astype(np.int64)
    gy = np.round(yg / pixel_m - 0.5).astype(np.int64)
    # nodata blobs on 4x4 pixel blocks, ~2% of blocks
    holes = _uniform(gx >> 2, gy >> 2, np.int64(101)) < 0.02
    dem = np.where(holes, NODATA, dem)

    # raw veg codes: 400 m blobs of codes 1..32 with occasional 99
    bx, by = gx >> 4, gy >> 4
    code = (_hash64(bx, by, np.int64(202)) % np.uint64(33)).astype(np.int64) + 1
    veg_raw = np.where(code == 33, 99, code).astype(np.float64)
    veg_holes = _uniform(gx >> 3, gy >> 3, np.int64(303)) < 0.01
    veg_raw = np.where(veg_holes, NODATA, veg_raw)
    return dem.astype(np.float64), veg_raw


def tiles_pdf(tile_coords, layers=("dem", "veg")) -> pd.DataFrame:
    """Build the tiles side table for an iterable of (tile_x, tile_y).
    ``layers`` restricts generation — a DEM-only consumer (the flagship
    slope/aspect path) skips computing the vegetation hash blobs
    entirely."""
    rows = []
    for tx, ty in tile_coords:
        dem, veg = tile_arrays(tx, ty)
        x0 = tx * TILE_M
        y0 = ty * TILE_M
        for layer, arr in (("dem", dem), ("veg", veg)):
            if layer not in layers:
                continue
            rows.append({
                "media_ref": f"{layer}/{tx}/{ty}",
                "layer": layer, "tile_x": tx, "tile_y": ty,
                "x0": x0, "y0": y0, "pixel_m": PIXEL_M,
                "nrows": TILE_N, "ncols": TILE_N,
                "data": arr.astype(np.float32).ravel(),
            })
    return pd.DataFrame(rows)


# --- vector layers -------------------------------------------------------------

def addresses_pdf(tile_coords, per_tile: int = 5) -> pd.DataFrame:
    """Deterministic address points, ``per_tile`` per tile, jittered inside
    the tile interior (mirrors GNAF points,
    reference: data_prep/gnaf/create_buffered_points.sql:17-25)."""
    rows = []
    for tx, ty in tile_coords:
        k = np.arange(per_tile, dtype=np.int64)
        ux = _uniform(np.int64(tx), np.int64(ty), k, np.int64(404))
        uy = _uniform(np.int64(tx), np.int64(ty), k, np.int64(505))
        fi = (_hash64(np.int64(tx), np.int64(ty), k, np.int64(606))
              % np.uint64(4)).astype(np.int64)
        xs = (tx + 0.05 + 0.9 * ux) * TILE_M
        ys = (ty + 0.05 + 0.9 * uy) * TILE_M
        for j in range(per_tile):
            rows.append({"addr_id": f"A-{tx}-{ty}-{j}",
                         "x": float(xs[j]), "y": float(ys[j]),
                         "fdi": int(FDI_CHOICES[fi[j]])})
    return pd.DataFrame(rows)


def veg_polygons_pdf(tile_coords, cell_m: float = cells.DEFAULT_CELL_M
                     ) -> pd.DataFrame:
    """Disjoint vegetation polygons on a jittered 800 m grid: one hexagon per
    poly-cell, radius < half spacing so parts never overlap (like exploded
    parts of a classification layer — the reference dissolve input,
    reference: data_prep/vegetation/03_explode_multipolygons_and_classify.sql)."""
    spacing = 800.0
    seen = set()
    rows = []
    for tx, ty in tile_coords:
        px0 = int(np.floor(tx * TILE_M / spacing))
        px1 = int(np.floor((tx + 1) * TILE_M / spacing))
        py0 = int(np.floor(ty * TILE_M / spacing))
        py1 = int(np.floor((ty + 1) * TILE_M / spacing))
        for pcx in range(px0, px1 + 1):
            for pcy in range(py0, py1 + 1):
                if (pcx, pcy) in seen:
                    continue
                seen.add((pcx, pcy))
                if _uniform(np.int64(pcx), np.int64(pcy),
                            np.int64(707)) < 0.25:
                    continue  # ~25% empty cells
                jx = _uniform(np.int64(pcx), np.int64(pcy), np.int64(808))
                jy = _uniform(np.int64(pcx), np.int64(pcy), np.int64(909))
                cx = (pcx + 0.35 + 0.3 * float(jx)) * spacing
                cy = (pcy + 0.35 + 0.3 * float(jy)) * spacing
                rad = 120.0 + 180.0 * float(
                    _uniform(np.int64(pcx), np.int64(pcy), np.int64(111)))
                # vegetation class skew mirrors the reference's 47:1
                # woodland-vs-scrub imbalance
                # (reference: data_prep/vegetation/xx_testing.sql:114-125)
                u = float(_uniform(np.int64(pcx), np.int64(pcy),
                                   np.int64(222)))
                bal = int(np.searchsorted(
                    np.cumsum([0.18, 0.45, 0.1, 0.02, 0.08, 0.07, 0.10]), u)
                    + 1)
                rot = 2 * np.pi * float(
                    _uniform(np.int64(pcx), np.int64(pcy), np.int64(333)))
                ang = rot + np.linspace(0, 2 * np.pi, 6, endpoint=False)
                ring = np.stack([cx + rad * np.cos(ang),
                                 cy + rad * np.sin(ang)], axis=1)
                rows.append({
                    "veg_id": f"V-{pcx}-{pcy}",
                    "bal_number": min(bal, 7),
                    "wkt": geometry.polygon_wkt(ring),
                    "area_m2": geometry.ring_area(ring),
                    "cell_id": int(cells.cell_id(cx, cy, cell_m)),
                })
    return pd.DataFrame(rows)


# --- document assembly ---------------------------------------------------------

def documents_pdf(tile_coords, per_tile_addresses: int = 5) -> pd.DataFrame:
    """Interleave every entity into documents of 1-8 spans, ~70% text / 30%
    media_ref, offsets strictly increasing (FIXTURES.md §1)."""
    addrs = addresses_pdf(tile_coords, per_tile_addresses)
    vegs = veg_polygons_pdf(tile_coords)
    spans = []
    for r in addrs.itertuples():
        spans.append(("text",
                      f"ADDR|{r.addr_id}|{r.x:.6f}|{r.y:.6f}|{r.fdi}", ""))
    for r in vegs.itertuples():
        spans.append(("text", f"VEG|{r.veg_id}|{r.bal_number}|{r.wkt}", ""))
    for tx, ty in tile_coords:
        for layer in ("dem", "veg"):
            spans.append(("media_ref", "", f"{layer}/{tx}/{ty}"))

    # deterministic shuffle: lexicographic sort for a stable base order,
    # then a seeded index permutation (process-independent — no str hash())
    spans.sort()
    keys = _hash64(np.arange(len(spans), dtype=np.int64), np.int64(616))
    order = np.argsort(keys, kind="stable")
    docs = []
    i = 0
    doc_no = 0
    n = len(spans)
    while i < n:
        size = int(_hash64(np.int64(doc_no), np.int64(515))
                   % np.uint64(8)) + 1
        chunk = [spans[j] for j in order[i:i + size]]
        docs.append({
            "doc_id": f"doc-{doc_no:012d}",
            "spans": [{"kind": k, "text": t, "media_ref": m, "offset": o}
                      for o, (k, t, m) in enumerate(chunk)],
        })
        i += size
        doc_no += 1
    return pd.DataFrame(docs)


def grid_coords(nx: int, ny: int):
    return [(tx, ty) for tx in range(nx) for ty in range(ny)]


# --- Spark-side distributed generation ------------------------------------------

def spark_tiles(spark, nx: int, ny: int, layers=("dem", "veg")):
    """Distributed tile generation: a tiny coords DataFrame fans out to
    executors; each partition generates its tiles locally (no driver-side
    data movement — the generator scales with the cluster)."""
    from .schema import TILES

    coords = spark.createDataFrame(grid_coords(nx, ny),
                                   "tile_x INT, tile_y INT")
    coords = coords.repartition(max(spark.sparkContext.defaultParallelism,
                                    1))

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield tiles_pdf(list(zip(pdf.tile_x, pdf.tile_y)),
                                layers=layers)

    return coords.mapInPandas(gen, schema=TILES)


def spark_documents(spark, nx: int, ny: int, per_tile_addresses: int = 5):
    """Documents corpus as a Spark DataFrame (small-scale: generated in
    pandas then parallelized; the tile payloads stay in the side table)."""
    from .schema import DOCUMENTS

    pdf = documents_pdf(grid_coords(nx, ny), per_tile_addresses)
    return spark.createDataFrame(pdf.to_dict("records"), schema=DOCUMENTS)
