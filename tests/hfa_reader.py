"""Minimal ERDAS Imagine (HFA / .img) reader — TEST USE ONLY.

Decodes the reference repository's published .img test rasters (dem.img,
expect_bal_max.img) so its whole-pipeline goldens can be asserted without
arcpy/GDAL. Follows the publicly documented HFA layout (as implemented by
GDAL's hfa driver): EHFA_HEADER_TAG -> Ehfa_File -> Ehfa_Entry tree ->
Eimg_Layer (width/height/pixelType/block geometry) -> Edms_State virtual
block table. Only uncompressed blocks and the pixel types present in the
fixtures are implemented; anything else raises loudly.
"""

from __future__ import annotations

import struct

import numpy as np

_PIXEL_DTYPES = {
    3: np.uint8, 4: np.int8, 5: np.dtype("<u2"), 6: np.dtype("<i2"),
    7: np.dtype("<u4"), 8: np.dtype("<i4"), 9: np.dtype("<f4"),
    10: np.dtype("<f8"),
}


def _entries(data, off, out):
    while off:
        nxt, _prev, _parent, child, dptr, dsize = struct.unpack(
            "<6I", data[off:off + 24])
        name = data[off + 24:off + 88].split(b"\0")[0].decode()
        typ = data[off + 88:off + 120].split(b"\0")[0].decode()
        out.append((name, typ, dptr, dsize))
        if child:
            _entries(data, child, out)
        off = nxt


def read_mapinfo(path: str):
    """(upperLeftCenterX, upperLeftCenterY, pixel_size) from the layer's
    Eprj_MapInfo node. The node layout is a pcstring (count, ptr, chars)
    for the projection name, then (count, ptr, 2 doubles) blocks for the
    upper-left centre, lower-right centre and pixel size — the name
    length varies per file, so offsets are parsed, not assumed."""
    with open(path, "rb") as f:
        data = f.read()
    hdr_ptr = struct.unpack("<I", data[16:20])[0]
    _v, _fl, root_ptr = struct.unpack("<III", data[hdr_ptr:hdr_ptr + 12])
    nodes = []
    _entries(data, root_ptr, nodes)
    _n, _t, dp, ds = next(n for n in nodes if n[1] == "Eprj_MapInfo")
    raw = data[dp:dp + ds]
    name_len = struct.unpack("<I", raw[0:4])[0]
    off = 8 + name_len                       # count + ptr + name chars
    ulx, uly = struct.unpack_from("<2d", raw, off + 8)
    off += 8 + 16                            # ULC block
    off += 8 + 16                            # LRC block
    px = struct.unpack_from("<d", raw, off + 8)[0]
    return ulx, uly, px


def _uncompress_rlc(data, off, npix, dt):
    """HFA run-length compression (ESRI RLC, as documented by GDAL's
    UncompressBlock): header (min u32, numRuns u32, dataOffset u32,
    numBits u8), variable-width repeat counts (top 2 bits of the first
    byte select 6/14/22/30-bit counts), then bit-packed value deltas;
    float32 blocks compress the raw IEEE bit patterns."""
    dmin, nruns, doff = struct.unpack("<III", data[off:off + 12])
    nbits = data[off + 12]
    # repeat counts
    counts = np.empty(nruns, dtype=np.int64)
    p = off + 13
    for i in range(nruns):
        b0 = data[p]
        sz = b0 >> 6
        v = b0 & 0x3F
        for j in range(sz):
            v = (v << 8) | data[p + 1 + j]
        counts[i] = v
        p += 1 + sz
    # bit-packed values
    vp = off + doff
    vals = np.empty(nruns, dtype=np.uint64)
    if nbits == 0:
        vals[:] = 0
    elif nbits in (1, 2, 4):
        per = 8 // nbits
        mask = (1 << nbits) - 1
        for i in range(nruns):
            byte = data[vp + i // per]
            shift = (i % per) * nbits
            vals[i] = (byte >> shift) & mask
    elif nbits == 8:
        vals[:] = np.frombuffer(data, np.uint8, nruns, vp)
    elif nbits == 16:
        vals[:] = np.frombuffer(data, "<u2", nruns, vp)
    elif nbits == 32:
        vals[:] = np.frombuffer(data, "<u4", nruns, vp)
    else:
        raise NotImplementedError(f"RLC numBits {nbits}")
    raw = (vals + dmin).astype(np.uint32)
    if dt == np.dtype("<f4"):
        pix = raw.view(np.float32).astype(np.float64)
    elif dt == np.dtype("<f8"):
        raise NotImplementedError("compressed f64")
    else:
        # integer rasters: min+delta wraps at the pixel width and is then
        # reinterpreted signed/unsigned per the band type (an s8 band's
        # 7 + 121 is -128, its declared-nodata pattern)
        nbytes = dt.itemsize
        wrapped = (raw & ((1 << (8 * nbytes)) - 1)).astype(
            np.dtype(f"<u{nbytes}")).view(dt)
        pix = wrapped.astype(np.float64)
    out = np.repeat(pix, counts)
    assert len(out) >= npix, f"RLC underflow {len(out)} < {npix}"
    return out[:npix]


def read_img(path: str, layer_index: int = 0):
    """Decode one raster layer of an HFA .img -> (rows, cols) float64."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:16] == b"EHFA_HEADER_TAG\x00", "not an HFA file"
    hdr_ptr = struct.unpack("<I", data[16:20])[0]
    _v, _fl, root_ptr = struct.unpack("<III", data[hdr_ptr:hdr_ptr + 12])
    nodes = []
    _entries(data, root_ptr, nodes)

    layers = [(n, t, d, s) for n, t, d, s in nodes if t == "Eimg_Layer"]
    name, _t, lptr, _s = layers[layer_index]
    w, h = struct.unpack("<II", data[lptr:lptr + 8])
    _ltype, ptype = struct.unpack("<HH", data[lptr + 8:lptr + 12])
    bw, bh = struct.unpack("<II", data[lptr + 12:lptr + 20])
    if ptype not in _PIXEL_DTYPES:
        raise NotImplementedError(f"pixel type {ptype}")
    dt = np.dtype(_PIXEL_DTYPES[ptype])

    # the layer's RasterDMS (Edms_State) node follows it in the flat walk
    idx = nodes.index((name, _t, lptr, _s))
    dms = next((n for n in nodes[idx:] if n[1] == "Edms_State"), None)
    assert dms is not None, "no Edms_State for layer"
    st = dms[2]
    nvb = struct.unpack("<I", data[st:st + 4])[0]
    cnt, ptr = struct.unpack("<II", data[st + 14:st + 22])
    assert cnt == nvb
    # Edms_VirtualBlockInfo stride 14: fileCode h, offset I, size I,
    # logvalid h, compressionType h
    blocks = []
    for i in range(cnt):
        b = data[ptr + 14 * i: ptr + 14 * (i + 1)]
        _fc, off, size, logvalid, comp = struct.unpack("<hIIhh", b)
        blocks.append((off, size, logvalid, comp))

    nbx = (w + bw - 1) // bw
    out = np.full((h, w), np.nan, dtype=np.float64)
    for bi, (off, size, logvalid, comp) in enumerate(blocks):
        if not logvalid:
            continue
        if comp == 0:
            arr = np.frombuffer(data, dtype=dt, count=bw * bh,
                                offset=off).reshape(bh, bw) \
                .astype(np.float64)
        elif comp == 1:
            arr = _uncompress_rlc(data, off, bw * bh, dt) \
                .reshape(bh, bw).astype(np.float64)
        else:
            raise NotImplementedError(f"HFA compression {comp}")
        br, bc = divmod(bi, nbx)
        r0, c0 = br * bh, bc * bw
        rr, cc = min(bh, h - r0), min(bw, w - c0)
        out[r0:r0 + rr, c0:c0 + cc] = arr[:rr, :cc]
    return out
