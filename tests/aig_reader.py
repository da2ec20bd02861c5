"""Minimal ESRI Arc/Info Binary Grid (AIG) reader — TEST USE ONLY.

Decodes the reference repository's published test rasters
(tests/test_data/*, single-band AIG coverages) so its raster goldens can
be asserted pixel-exactly without arcpy/GDAL. Format layout follows the
publicly documented AIG structure (as implemented by GDAL's aigrid
driver): hdr.adf (cell type + tile geometry), dblbnd.adf (bounds),
w001001x.adf (tile index), w001001.adf (tile data; raw float tiles, and
integer tiles in constant/raw/RLE encodings).

Only the encodings present in the reference fixtures are implemented;
unknown tile types raise loudly.
"""

from __future__ import annotations

import os
import struct

import numpy as np

NODATA_OUT = -99.0  # the reference loads rasters with nodata_to_value=-99
_INT_NODATA = -2147483647
_FLT_NODATA_THRESHOLD = -3.0e38


def _read(path):
    with open(path, "rb") as f:
        return f.read()


def read_aig_bounds(cov_dir: str):
    """(xmin, ymin, xmax, ymax) world bounds of a coverage."""
    return struct.unpack(">4d", _read(os.path.join(cov_dir, "dblbnd.adf")))


def read_aig(cov_dir: str) -> np.ndarray:
    """Decode a coverage directory -> (rows, cols) float64 array with
    nodata mapped to -99 (the reference's RasterToNumPyArray contract)."""
    hdr = _read(os.path.join(cov_dir, "hdr.adf"))
    celltype = struct.unpack(">i", hdr[16:20])[0]  # 1=int, 2=float
    # header word 5: 0 = tile payloads carry a (type, min) header and may
    # be RLE-compressed; 1 = uncompressed coverage, tiles are raw value
    # words with no per-tile header (GDAL aigrid's bCompressed flag)
    uncompressed = struct.unpack(">i", hdr[20:24])[0] == 1
    ps_x = struct.unpack(">d", hdr[256:264])[0]
    ps_y = struct.unpack(">d", hdr[264:272])[0]
    tiles_per_row, _tiles_per_col, tile_xs = struct.unpack(
        ">3i", hdr[288:300])
    tile_ys = struct.unpack(">i", hdr[304:308])[0]
    xmin, ymin, xmax, ymax = read_aig_bounds(cov_dir)
    ncols = int(round((xmax - xmin) / ps_x))
    nrows = int(round((ymax - ymin) / ps_y))

    idx = _read(os.path.join(cov_dir, "w001001x.adf"))
    n_tiles = (len(idx) - 100) // 8
    offsets = [struct.unpack(">ii", idx[100 + 8 * i:108 + 8 * i])
               for i in range(n_tiles)]
    dat = _read(os.path.join(cov_dir, "w001001.adf"))

    out = np.full((nrows, ncols), NODATA_OUT, dtype=np.float64)
    for ti, (off_words, size_words) in enumerate(offsets):
        trow, tcol = divmod(ti, tiles_per_row)
        r0, c0 = trow * tile_ys, tcol * tile_xs
        if r0 >= nrows or c0 >= ncols:
            continue
        if celltype == 1 and uncompressed:
            # raw big-endian int32 after the 2-byte size prefix; the index
            # size field is unused in uncompressed coverages
            tile = np.full((tile_ys, tile_xs), NODATA_OUT,
                           dtype=np.float64)
            p = off_words * 2 + 2
            cnt = min(tile_xs * tile_ys, max((len(dat) - p) // 4, 0))
            if cnt > 0:
                raw = np.frombuffer(dat, dtype=">i4", count=cnt, offset=p) \
                    .astype(np.float64)
                raw[raw == float(_INT_NODATA)] = NODATA_OUT
                tile.ravel()[:cnt] = raw
        else:
            tile = _decode_tile(dat, off_words * 2, size_words, celltype,
                                tile_xs, tile_ys)
        rr = min(tile_ys, nrows - r0)
        cc = min(tile_xs, ncols - c0)
        out[r0:r0 + rr, c0:c0 + cc] = tile[:rr, :cc]
    return out


def _decode_tile(dat, byte_off, size_words, celltype, txs, tys):
    tile = np.full((tys, txs), NODATA_OUT, dtype=np.float64)
    if size_words <= 0:
        return tile  # absent tile: all nodata
    # each tile record: int16 size (words), then payload
    p = byte_off + 2
    if celltype == 2:  # float tiles are raw big-endian float32
        raw = np.frombuffer(dat, dtype=">f4", count=txs * tys, offset=p)
        vals = raw.astype(np.float64).reshape(tys, txs)
        vals[vals < _FLT_NODATA_THRESHOLD] = NODATA_OUT
        return vals
    ttype = dat[p]
    min_size = dat[p + 1]
    minval = int.from_bytes(dat[p + 2:p + 2 + min_size], "big",
                            signed=True)
    q = p + 2 + min_size
    end = byte_off + 2 + size_words * 2
    flat = np.full(txs * tys, float(_INT_NODATA), dtype=np.float64)

    def put(vals):
        n = min(len(vals), txs * tys)
        flat[:n] = vals[:n]

    if ttype == 0x00:  # constant tile = min value
        flat[:] = minval
    elif ttype == 0x08:  # raw 8-bit + min
        raw = np.frombuffer(dat, dtype=np.uint8, count=min(
            end - q, txs * tys), offset=q)
        put(raw.astype(np.int64) + minval)
    elif ttype == 0x10:  # raw 16-bit + min
        cnt = min((end - q) // 2, txs * tys)
        raw = np.frombuffer(dat, dtype=">i2", count=cnt, offset=q)
        put(raw.astype(np.int64) + minval)
    elif ttype == 0x20:  # raw 32-bit + min
        cnt = min((end - q) // 4, txs * tys)
        raw = np.frombuffer(dat, dtype=">i4", count=cnt, offset=q)
        put(raw.astype(np.int64) + minval)
    elif ttype == 0xE0:  # RLE 32-bit: (count u8, value i32) + min, mod 2^32
        vals = []
        while q + 5 <= end and len(vals) < txs * tys:
            cnt = dat[q]
            v = int.from_bytes(dat[q + 1:q + 5], "big", signed=False)
            val = (v + (minval & 0xFFFFFFFF)) & 0xFFFFFFFF
            if val >= 1 << 31:
                val -= 1 << 32
            vals.extend([val] * cnt)
            q += 5
        put(np.array(vals, dtype=np.float64))
    elif ttype == 0xD7:
        # 8-bit literal runs / nodata runs: marker < 0x80 -> marker
        # literal bytes (+min) follow; marker >= 0x80 -> (256 - marker)
        # NODATA pixels (rows padded to the full tile width)
        vals = []
        while q < end and len(vals) < txs * tys:
            m = dat[q]
            q += 1
            if m < 0x80:
                vals.extend(int(dat[q + i]) + minval for i in range(m))
                q += m
            else:
                vals.extend([_INT_NODATA] * (256 - m))
        put(np.array(vals[:txs * tys], dtype=np.float64))
    elif ttype == 0xCF:
        # 16-bit literal runs / nodata runs (same marker scheme)
        vals = []
        while q < end and len(vals) < txs * tys:
            m = dat[q]
            q += 1
            if m < 0x80:
                for i in range(m):
                    vals.append(int.from_bytes(
                        dat[q + 2 * i:q + 2 * i + 2], "big") + minval)
                q += 2 * m
            else:
                vals.extend([_INT_NODATA] * (256 - m))
        put(np.array(vals[:txs * tys], dtype=np.float64))
    elif ttype in (0xF8, 0xFC):  # RLE 8-bit: (count u8, value u8) + min
        vals = []
        while q + 2 <= end and len(vals) < txs * tys:
            cnt = dat[q]
            vals.extend([dat[q + 1] + minval] * cnt)
            q += 2
        put(np.array(vals, dtype=np.float64))
    elif ttype == 0xF0:  # RLE 16-bit: (count u8, value u16) + min
        vals = []
        while q + 3 <= end and len(vals) < txs * tys:
            cnt = dat[q]
            v = int.from_bytes(dat[q + 1:q + 3], "big", signed=False)
            vals.extend([v + minval] * cnt)
            q += 3
        put(np.array(vals, dtype=np.float64))
    else:
        raise NotImplementedError(f"AIG tile type 0x{ttype:02X}")
    flat[flat == _INT_NODATA] = NODATA_OUT
    return flat.reshape(tys, txs)
