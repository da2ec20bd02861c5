"""Clean-room FlatGeobuf source/sink — no GDAL, no flatbuffers library.

The reference's production vegetation layer is a FlatGeobuf file
(``nvis6_bal.fgb``) read through fiona with a spatial mask (reference:
data_prep/vegetation/xx_fiona_testing.py:34-36 for the file,
:133-136 for the masked filter scan). FlatGeobuf is an open
specification (https://flatgeobuf.org): a magic sequence, a
flatbuffers-encoded header, an optional packed Hilbert R-tree index,
then size-prefixed flatbuffers Feature records. Its design goal is
exactly the engine's manifest-then-pread shape: the header + the
touched index nodes are enough to turn a bbox query into a short list
of feature byte ranges, so a 37 GB file serves a 230 m buffer query
with a few KB of reads (the reference exploits this via fiona/GDAL's
HTTP GetRange path; this module does it with plain ``pread``).

Everything here is derived from the public FlatGeobuf spec and the
public flatbuffers wire format (little-endian scalars, vtable-relative
field slots, forward uoffsets); both the encoder and decoder are
written from the format descriptions, not from any implementation.

Distributed shape (same as geotiff.py / gpkg.py): the driver parses
the KB-scale header, stream-searches the packed R-tree reading ONLY
intersecting node pages (40 bytes per node, pread per touched run),
and builds a manifest of feature byte offsets; executors each pread
and decode their slice of features. Feature payload bytes never pass
through the driver.

Scope: Point, LineString, Polygon, MultiPolygon geometries (2D);
Bool / Int / Long / Double / String properties; packed Hilbert R-tree
written and searched (node_size 16, the spec default). Z/M dimensions
and the remaining geometry types raise — loud refusal over silent
mis-decode.
"""

from __future__ import annotations

import math
import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from . import geometry

MAGIC = b"fgb\x03fgb\x00"          # "fgb", spec major 3, "fgb", patch 0
NODE_SIZE = 16                     # spec-default R-tree fanout
_NODE_BYTES = 40                   # 4 doubles + uint64 per node

# GeometryType enum (header.fbs)
GT_POINT, GT_LINESTRING, GT_POLYGON = 1, 2, 3
GT_MULTIPOINT, GT_MULTILINESTRING, GT_MULTIPOLYGON = 4, 5, 6
_GT_NAME = {GT_POINT: "POINT", GT_LINESTRING: "LINESTRING",
            GT_POLYGON: "POLYGON", GT_MULTIPOLYGON: "MULTIPOLYGON"}

# ColumnType enum (header.fbs)
CT_BOOL, CT_INT, CT_LONG, CT_DOUBLE, CT_STRING = 2, 5, 7, 10, 11
CT_SHORT, CT_FLOAT = 3, 9
_CT_SIZE = {CT_BOOL: 1, CT_SHORT: 2, CT_INT: 4, CT_LONG: 8,
            CT_FLOAT: 4, CT_DOUBLE: 8}
_CT_FMT = {CT_BOOL: "?", CT_SHORT: "h", CT_INT: "i", CT_LONG: "q",
           CT_FLOAT: "f", CT_DOUBLE: "d"}


# --- flatbuffers wire format: reader ----------------------------------------

class _Tab:
    """Minimal flatbuffers table accessor: vtable-relative field slots."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf, pos: int):
        self.buf = buf
        self.pos = pos

    def _slot(self, fid: int) -> int:
        """Absolute position of field ``fid``'s inline slot, 0 if absent."""
        vt = self.pos - struct.unpack_from("<i", self.buf, self.pos)[0]
        vt_size = struct.unpack_from("<H", self.buf, vt)[0]
        entry = 4 + 2 * fid
        if entry + 2 > vt_size:
            return 0
        rel = struct.unpack_from("<H", self.buf, vt + entry)[0]
        return self.pos + rel if rel else 0

    def scalar(self, fid: int, fmt: str, default):
        p = self._slot(fid)
        if not p:
            return default
        return struct.unpack_from("<" + fmt, self.buf, p)[0]

    def _indirect(self, fid: int) -> int:
        p = self._slot(fid)
        if not p:
            return 0
        return p + struct.unpack_from("<I", self.buf, p)[0]

    def table(self, fid: int):
        p = self._indirect(fid)
        return _Tab(self.buf, p) if p else None

    def string(self, fid: int):
        p = self._indirect(fid)
        if not p:
            return None
        n = struct.unpack_from("<I", self.buf, p)[0]
        return bytes(self.buf[p + 4:p + 4 + n]).decode("utf-8")

    def vector(self, fid: int):
        """(data_pos, count) of a vector field, or (0, 0)."""
        p = self._indirect(fid)
        if not p:
            return 0, 0
        return p + 4, struct.unpack_from("<I", self.buf, p)[0]

    def vec_f64(self, fid: int) -> np.ndarray:
        p, n = self.vector(fid)
        if not n:
            return np.empty(0, dtype="<f8")
        return np.frombuffer(self.buf, dtype="<f8", count=n, offset=p)

    def vec_u32(self, fid: int) -> np.ndarray:
        p, n = self.vector(fid)
        if not n:
            return np.empty(0, dtype="<u4")
        return np.frombuffer(self.buf, dtype="<u4", count=n, offset=p)

    def vec_u8(self, fid: int) -> bytes:
        p, n = self.vector(fid)
        return bytes(self.buf[p:p + n])

    def vec_tables(self, fid: int):
        p, n = self.vector(fid)
        out = []
        for i in range(n):
            sp = p + 4 * i
            out.append(_Tab(self.buf,
                            sp + struct.unpack_from("<I", self.buf, sp)[0]))
        return out


# --- flatbuffers wire format: builder ---------------------------------------

class _FB:
    """Minimal back-to-front flatbuffers builder.

    The buffer's END is written first and references always point
    forward (uoffset = referrer_endrel - target_endrel, both measured
    from the final end of the buffer, which never moves as the front
    grows). ``finish`` prepends the root uoffset and pads the total to
    8 bytes so every end-relative alignment decision equals an
    absolute one.
    """

    def __init__(self):
        self.b = bytearray()

    def _pad_for(self, size: int, align: int):
        """Pad so the next ``size`` bytes end 8-aligned groups right."""
        while (len(self.b) + size) % align:
            self.b[:0] = b"\x00"

    def vec_scalar(self, arr: np.ndarray) -> int:
        data = arr.tobytes()
        align = max(4, arr.dtype.itemsize)
        # the uint32 length word sits directly before the data, so pad
        # FIRST (padding lands after the data in the file), then
        # prepend data + length contiguously
        self._pad_for(len(data), align)
        self.b[:0] = data
        self.b[:0] = struct.pack("<I", len(arr))
        return len(self.b)

    def vec_f64(self, values) -> int:
        return self.vec_scalar(np.asarray(values, dtype="<f8"))

    def vec_u32(self, values) -> int:
        return self.vec_scalar(np.asarray(values, dtype="<u4"))

    def vec_u8(self, raw: bytes) -> int:
        self._pad_for(len(raw) + 4, 4)
        self.b[:0] = raw
        self.b[:0] = struct.pack("<I", len(raw))
        return len(self.b)

    def string(self, s: str) -> int:
        raw = s.encode("utf-8") + b"\x00"      # spec: NUL-terminated
        self._pad_for(len(raw) + 4, 4)
        self.b[:0] = raw
        self.b[:0] = struct.pack("<I", len(raw) - 1)
        return len(self.b)

    def vec_offsets(self, offs) -> int:
        """Vector of uoffsets to already-built tables."""
        self._pad_for(4 * len(offs) + 4, 4)
        # emit the slots back-to-front so each slot knows its position
        for off in reversed(offs):
            slot_endrel = len(self.b) + 4
            self.b[:0] = struct.pack("<I", slot_endrel - off)
        self.b[:0] = struct.pack("<I", len(offs))
        return len(self.b)

    def table(self, fields) -> int:
        """``fields``: iterable of (fid, kind, value) with kind one of
        u8/u16/u32/u64/f64/bool/off; values for 'off' are endrel
        offsets of already-built children. Returns the table's endrel
        offset."""
        fields = [f for f in fields if f[2] is not None]
        sizes = {"u8": 1, "bool": 1, "u16": 2, "u32": 4, "off": 4,
                 "u64": 8, "f64": 8}
        # lay out inline data: soffset(4) then fields, biggest first
        order = sorted(fields, key=lambda f: -sizes[f[1]])
        pos = 4
        slot_of = {}
        for fid, kind, _ in order:
            sz = sizes[kind]
            pos = (pos + sz - 1) // sz * sz
            slot_of[fid] = pos
            pos += sz
        tbl_size = (pos + 3) // 4 * 4
        # table start must be 8-aligned (f64 inline fields)
        self._pad_for(tbl_size, 8 if any(
            k in ("f64", "u64") for _, k, _ in fields) else 4)
        tbl_endrel = len(self.b) + tbl_size
        raw = bytearray(tbl_size)
        for fid, kind, val in fields:
            s = slot_of[fid]
            if kind == "off":
                struct.pack_into("<I", raw, s, (tbl_endrel - s) - val)
            elif kind == "bool":
                struct.pack_into("<?", raw, s, bool(val))
            else:
                fmt = {"u8": "B", "u16": "H", "u32": "I",
                       "u64": "Q", "f64": "d"}[kind]
                struct.pack_into("<" + fmt, raw, s, val)
        # vtable: size, table size, slot offsets by field id
        max_fid = max((f[0] for f in fields), default=-1)
        vt_size = 4 + 2 * (max_fid + 1)
        vt = bytearray(struct.pack("<HH", vt_size, tbl_size))
        for fid in range(max_fid + 1):
            vt += struct.pack("<H", slot_of.get(fid, 0))
        struct.pack_into("<i", raw, 0, vt_size)   # soffset: vtable sits
        self.b[:0] = raw                          # directly before table
        self.b[:0] = vt
        return tbl_endrel

    def finish(self, root: int) -> bytes:
        self._pad_for(4, 8)
        self.b[:0] = struct.pack("<I", (len(self.b) + 4) - root)
        return bytes(self.b)


# --- Hilbert curve (flatbush variant, order 16) -----------------------------

_HILBERT_MAX = (1 << 16) - 1


def _interleave(x: np.ndarray) -> np.ndarray:
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def hilbert_d(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Distance along the order-16 Hilbert curve for uint32 grid
    coords — the bitwise state-propagation form published with
    flatbush; vectorized over numpy arrays."""
    x = np.asarray(x, dtype=np.uint32)
    y = np.asarray(y, dtype=np.uint32)
    a = x ^ y
    b = np.uint32(0xFFFF) ^ a
    c = np.uint32(0xFFFF) ^ (x | y)
    d = x & (y ^ np.uint32(0xFFFF))
    A = a | (b >> 1)
    B = (a >> 1) ^ a
    C = ((c >> 1) ^ (b & (d >> 1))) ^ c
    D = ((a & (c >> 1)) ^ (d >> 1)) ^ d
    a, b, c, d = A, B, C, D
    A = (a & (a >> 2)) ^ (b & (b >> 2))
    B = (a & (b >> 2)) ^ (b & ((a ^ b) >> 2))
    C = ((a & (c >> 2)) ^ (b & (d >> 2))) ^ c
    D = ((b & (c >> 2)) ^ ((a ^ b) & (d >> 2))) ^ d
    a, b, c, d = A, B, C, D
    A = (a & (a >> 4)) ^ (b & (b >> 4))
    B = (a & (b >> 4)) ^ (b & ((a ^ b) >> 4))
    C = ((a & (c >> 4)) ^ (b & (d >> 4))) ^ c
    D = ((b & (c >> 4)) ^ ((a ^ b) & (d >> 4))) ^ d
    a, b, c, d = A, B, C, D
    C = ((a & (c >> 8)) ^ (b & (d >> 8))) ^ c
    D = ((b & (c >> 8)) ^ ((a ^ b) & (d >> 8))) ^ d
    a = C ^ (C >> 1)
    b = D ^ (D >> 1)
    i0 = x ^ y
    i1 = b | (np.uint32(0xFFFF) ^ (i0 | a))
    return ((_interleave(i1).astype(np.uint64) << np.uint64(1))
            | _interleave(i0).astype(np.uint64))


# --- packed Hilbert R-tree --------------------------------------------------

def _level_bounds(num_items: int, node_size: int):
    """[(start, end)] node-index bounds per level, leaf level first,
    root last; nodes are stored root-first so leaves occupy the tail.

    Guards: node_size < 2 never converges (n = (n+s-1)//s stays put)
    and num_items <= 0 loops forever at n == 0 — both are spec-legal
    header values (unindexed file / unknown feature count) that the
    CALLERS must route around, so failing loud here beats a silent
    driver hang."""
    if node_size < 2:
        raise ValueError(f"index node_size must be >= 2, got {node_size}")
    if num_items <= 0:
        raise ValueError(f"num_items must be positive, got {num_items}")
    level_sizes = [num_items]
    n = num_items
    while True:
        n = (n + node_size - 1) // node_size
        level_sizes.append(n)
        if n == 1:
            break
    total = sum(level_sizes)
    bounds, acc = [], total
    for size in level_sizes:
        bounds.append((acc - size, acc))
        acc -= size
    return bounds, total


def _build_rtree(leaf: np.ndarray, node_size: int = NODE_SIZE) -> bytes:
    """``leaf``: (n, 5) float64 [minx, miny, maxx, maxy, feature_offset]
    already in Hilbert order -> packed node bytes (root first)."""
    n_items = len(leaf)
    bounds, total = _level_bounds(n_items, node_size)
    nodes = np.zeros((total, 5), dtype=np.float64)
    offsets = leaf[:, 4].copy()
    lo, hi = bounds[0]
    nodes[lo:hi, :4] = leaf[:, :4]
    off_u64 = np.zeros(total, dtype=np.uint64)
    off_u64[lo:hi] = offsets.astype(np.uint64)
    for lvl in range(len(bounds) - 1):
        c_lo, c_hi = bounds[lvl]
        p_lo, _ = bounds[lvl + 1]
        for i, pos in enumerate(range(c_lo, c_hi, node_size)):
            grp = nodes[pos:min(pos + node_size, c_hi), :4]
            nodes[p_lo + i, 0] = grp[:, 0].min()
            nodes[p_lo + i, 1] = grp[:, 1].min()
            nodes[p_lo + i, 2] = grp[:, 2].max()
            nodes[p_lo + i, 3] = grp[:, 3].max()
            off_u64[p_lo + i] = pos            # first child node index
    out = bytearray()
    for i in range(total):
        out += struct.pack("<4dQ", *nodes[i, :4], int(off_u64[i]))
    return bytes(out)


def _rtree_size(num_items: int, node_size: int = NODE_SIZE) -> int:
    """0 for the no-index cases (unknown feature count / node_size 0)."""
    if num_items <= 0 or node_size < 2:
        return 0
    return _level_bounds(num_items, node_size)[1] * _NODE_BYTES


def _stream_search(pread, num_items: int, node_size: int, bbox):
    """bbox-intersecting leaf entries via top-down node traversal.

    ``pread(offset, size)`` reads from the start of the index section.
    Returns (sorted feature byte offsets, index bytes actually read) —
    only touched node runs are fetched, never the whole tree."""
    bounds, total = _level_bounds(num_items, node_size)
    leaf_lo = bounds[0][0]
    qminx, qminy, qmaxx, qmaxy = bbox
    queue = [(0, len(bounds) - 1)]
    hits, bytes_read = [], 0
    while queue:
        node_index, level = queue.pop()
        end = min(node_index + node_size, bounds[level][1])
        raw = pread(node_index * _NODE_BYTES,
                    (end - node_index) * _NODE_BYTES)
        bytes_read += len(raw)
        for pos in range(node_index, end):
            minx, miny, maxx, maxy, off = struct.unpack_from(
                "<4dQ", raw, (pos - node_index) * _NODE_BYTES)
            if maxx < qminx or maxy < qminy or minx > qmaxx \
                    or miny > qmaxy:
                continue
            if pos >= leaf_lo:
                hits.append(off)
            else:
                queue.append((off, level - 1))
    return sorted(hits), bytes_read


# --- geometry encode/decode -------------------------------------------------

def _wkt_to_parts(wkt: str):
    """WKT -> (geometry_type, [part]) where each part is (xy, ends)."""
    u = wkt.strip().upper()
    if u.startswith("POINT") or u.startswith("LINESTRING"):
        body = wkt[wkt.index("(") + 1:wkt.rindex(")")]
        pts = np.array([[float(v) for v in pair.split()[:2]]
                        for pair in body.split(",")], dtype=np.float64)
        gt = GT_POINT if u.startswith("POINT") else GT_LINESTRING
        return gt, [(pts.ravel(), None)]
    if u.startswith("MULTIPOLYGON") or u.startswith("POLYGON"):
        polys = geometry.parse_wkt_polys(wkt)
        parts = []
        for rings in polys:
            closed = []
            for r in rings:
                rr = np.asarray(r, dtype=np.float64)
                if len(rr) and not np.array_equal(rr[0], rr[-1]):
                    rr = np.vstack([rr, rr[:1]])
                closed.append(rr)
            ends = np.cumsum([len(r) for r in closed]).astype(np.uint32)
            xy = np.vstack(closed).ravel()
            parts.append((xy, ends))
        gt = GT_POLYGON if u.startswith("POLYGON") else GT_MULTIPOLYGON
        return gt, parts
    raise ValueError(f"unsupported WKT for FlatGeobuf: {wkt[:30]}...")


def _geom_table(fb: _FB, xy, ends, gtype: int) -> int:
    fields = []
    if ends is not None and len(ends) > 1:
        fields.append((0, "off", fb.vec_u32(ends)))
    fields.append((1, "off", fb.vec_f64(xy)))
    fields.append((6, "u8", gtype))
    return fb.table(fields)


def _encode_geometry(fb: _FB, wkt: str, header_gt: int) -> int:
    gt, parts = _wkt_to_parts(wkt)
    if gt == GT_MULTIPOLYGON:
        part_offs = [_geom_table(fb, xy, ends, GT_POLYGON)
                     for xy, ends in parts]
        vec = fb.vec_offsets(part_offs)
        return fb.table([(6, "u8", gt), (7, "off", vec)])
    xy, ends = parts[0]
    # a homogeneous file omits the per-feature type (it's in the header)
    return _geom_table(fb, xy, ends,
                       gt if gt != header_gt else None)


def _decode_geom_tab(g: _Tab, gtype: int) -> str:
    gt = g.scalar(6, "B", 0) or gtype
    if gt == GT_MULTIPOLYGON:
        parts = g.vec_tables(7)
        polys = [_decode_geom_tab(p, GT_POLYGON)[len("POLYGON "):]
                 for p in parts]
        return "MULTIPOLYGON (" + ", ".join(polys) + ")"
    xy = g.vec_f64(1).reshape(-1, 2)
    if gt == GT_POINT:
        return f"POINT ({_f(xy[0, 0])} {_f(xy[0, 1])})"
    if gt == GT_LINESTRING:
        return "LINESTRING (" + ", ".join(
            f"{_f(x)} {_f(y)}" for x, y in xy) + ")"
    if gt == GT_POLYGON:
        ends = g.vec_u32(0)
        if len(ends) == 0:
            ends = np.array([len(xy)], dtype=np.uint32)
        rings, s = [], 0
        for e in ends:
            ring = xy[s:int(e)]
            rings.append("(" + ", ".join(
                f"{_f(x)} {_f(y)}" for x, y in ring) + ")")
            s = int(e)
        return "POLYGON (" + ", ".join(rings) + ")"
    raise ValueError(f"unsupported FlatGeobuf geometry type {gt}")


def _f(v: float) -> str:
    return f"{v:.8f}".rstrip("0").rstrip(".")


# --- properties encode/decode -----------------------------------------------

def _encode_props(row, cols) -> bytes:
    out = bytearray()
    for i, (name, ct) in enumerate(cols):
        v = row[name]
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        out += struct.pack("<H", i)
        if ct == CT_STRING:
            raw = str(v).encode("utf-8")
            out += struct.pack("<I", len(raw)) + raw
        else:
            out += struct.pack("<" + _CT_FMT[ct], v)
    return bytes(out)


def _decode_props(raw: bytes, cols):
    out = {name: None for name, _ in cols}
    pos = 0
    while pos + 2 <= len(raw):
        (i,) = struct.unpack_from("<H", raw, pos)
        pos += 2
        name, ct = cols[i]
        if ct == CT_STRING:
            (n,) = struct.unpack_from("<I", raw, pos)
            pos += 4
            out[name] = raw[pos:pos + n].decode("utf-8")
            pos += n
        else:
            (out[name],) = struct.unpack_from("<" + _CT_FMT[ct], raw, pos)
            pos += _CT_SIZE[ct]
    return out


def _infer_cols(pdf: pd.DataFrame, wkt_col: str):
    cols = []
    for c in pdf.columns:
        if c == wkt_col:
            continue
        dt = pdf[c].dtype
        if np.issubdtype(dt, np.bool_):
            cols.append((c, CT_BOOL))
        elif np.issubdtype(dt, np.integer):
            cols.append((c, CT_LONG))
        elif np.issubdtype(dt, np.floating):
            cols.append((c, CT_DOUBLE))
        else:
            cols.append((c, CT_STRING))
    return cols


# --- writer -----------------------------------------------------------------

def write_fgb(path: str, pdf: pd.DataFrame, wkt_col: str = "wkt",
              name: str = "layer", crs_code: int | None = None,
              node_size: int = NODE_SIZE) -> dict:
    """pandas frame with a WKT column -> FlatGeobuf file with a packed
    Hilbert R-tree. Features are Hilbert-sorted by bbox center (the
    spec's clustering) so spatially-close features are byte-adjacent —
    that locality is what makes the masked read touch few bytes.
    Returns {features, index_bytes, total_bytes}."""
    n = len(pdf)
    if n == 0:
        raise ValueError("write_fgb needs at least one feature")
    # per-feature bbox + hilbert order
    boxes = np.zeros((n, 4))
    gts = set()
    wkts = pdf[wkt_col].tolist()
    for i, w in enumerate(wkts):
        gt, parts = _wkt_to_parts(w)
        gts.add(gt)
        xs = np.concatenate([p[0][0::2] for p in parts])
        ys = np.concatenate([p[0][1::2] for p in parts])
        boxes[i] = (xs.min(), ys.min(), xs.max(), ys.max())
    header_gt = gts.pop() if len(gts) == 1 else 0
    env = (boxes[:, 0].min(), boxes[:, 1].min(),
           boxes[:, 2].max(), boxes[:, 3].max())
    w_span = max(env[2] - env[0], 1e-12)
    h_span = max(env[3] - env[1], 1e-12)
    cx = ((boxes[:, 0] + boxes[:, 2]) / 2 - env[0]) / w_span
    cy = ((boxes[:, 1] + boxes[:, 3]) / 2 - env[1]) / h_span
    order = np.argsort(
        hilbert_d((cx * _HILBERT_MAX).astype(np.uint32),
                  (cy * _HILBERT_MAX).astype(np.uint32)),
        kind="stable")

    cols = _infer_cols(pdf, wkt_col)
    rows = pdf.iloc[order].to_dict("records")

    # features first (to know leaf byte offsets), root-first tree after
    feat_blobs, feat_offs = [], np.zeros(n)
    acc = 0
    for r in rows:
        fb = _FB()
        geom_off = _encode_geometry(fb, r[wkt_col], header_gt)
        props = _encode_props(r, cols)
        fields = [(0, "off", geom_off)]
        if props:
            fields.append((1, "off", fb.vec_u8(props)))
        body = fb.finish(fb.table(fields))
        blob = struct.pack("<I", len(body)) + body
        feat_blobs.append(blob)
        feat_offs[len(feat_blobs) - 1] = acc
        acc += len(blob)

    # node_size=0: spec-legal unindexed file (streaming writers);
    # features stay Hilbert-sorted but no R-tree is emitted — readers
    # take the sequential full-scan path and bbox search refuses loud
    if node_size == 0:
        tree = b""
    else:
        leaf = np.column_stack([boxes[order], feat_offs])
        tree = _build_rtree(leaf, node_size)

    hb = _FB()
    col_offs = []
    for cname, ct in cols:
        noff = hb.string(cname)
        col_offs.append(hb.table([(0, "off", noff), (1, "u8", ct)]))
    crs_off = None
    if crs_code is not None:
        org = hb.string("EPSG")
        crs_off = hb.table([(0, "off", org), (1, "u32", crs_code)])
    name_off = hb.string(name)
    env_off = hb.vec_f64(env)
    header = hb.finish(hb.table([
        (0, "off", name_off), (1, "off", env_off),
        (2, "u8", header_gt),
        (7, "off", hb.vec_offsets(col_offs) if col_offs else None),
        (8, "u64", n), (9, "u16", node_size),
        (10, "off", crs_off)]))

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(tree)
        for blob in feat_blobs:
            f.write(blob)
        total = f.tell()
    os.replace(tmp, path)
    return {"features": n, "index_bytes": len(tree),
            "total_bytes": total}


# --- reader -----------------------------------------------------------------

def read_fgb_info(path: str) -> dict:
    """Driver-side header parse: metadata only, KB-scale read."""
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic[:3] != b"fgb" or magic[4:7] != b"fgb":
            raise ValueError(f"{path}: not a FlatGeobuf file")
        (hlen,) = struct.unpack("<I", f.read(4))
        hbuf = f.read(hlen)
    root = struct.unpack_from("<I", hbuf, 0)[0]
    h = _Tab(hbuf, root)
    cols = [(t.string(0), t.scalar(1, "B", 0)) for t in h.vec_tables(7)]
    crs = h.table(10)
    n = h.scalar(8, "Q", 0)
    node_size = h.scalar(9, "H", NODE_SIZE)
    env = h.vec_f64(1)
    return {
        "name": h.string(0),
        "geometry_type": h.scalar(2, "B", 0),
        "envelope": tuple(env) if len(env) else None,
        "columns": cols,
        "features_count": n,
        "index_node_size": node_size,
        "crs": (crs.string(0), crs.scalar(1, "i", 0)) if crs else None,
        "header_bytes": 12 + hlen,
        "index_offset": 12 + hlen,
        "index_bytes": _rtree_size(n, node_size) if node_size else 0,
    }


def decode_feature(buf, cols, gtype: int) -> dict:
    """One size-prefix-stripped feature flatbuffer -> props + wkt."""
    root = struct.unpack_from("<I", buf, 0)[0]
    t = _Tab(buf, root)
    g = t.table(0)
    row = _decode_props(t.vec_u8(1), cols)
    row["wkt"] = _decode_geom_tab(g, gtype) if g else None
    return row


def fgb_search(path: str, bbox) -> dict:
    """Driver-side index search: bbox -> sorted feature byte offsets
    (absolute file positions) + exact accounting of bytes touched."""
    info = read_fgb_info(path)
    n, node_size = info["features_count"], info["index_node_size"]
    if node_size < 2 or n == 0:
        raise ValueError(
            f"{path} has no spatial index (features_count={n}, "
            f"node_size={node_size}) — bbox search needs the packed "
            f"R-tree; use read_fgb(path) for a full scan")
    idx0 = info["index_offset"]
    feat0 = idx0 + info["index_bytes"]
    with open(path, "rb") as f:
        def pread(off, size):
            return os.pread(f.fileno(), size, idx0 + off)
        rel, idx_bytes = _stream_search(pread, n, node_size, bbox)
    return {"offsets": [feat0 + r for r in rel],
            "bytes_index": idx_bytes,
            "bytes_header": info["header_bytes"],
            "info": info}


def _sequential_offsets(path: str, info: dict) -> list:
    """Full-scan manifest for UNINDEXED files (index_node_size 0, or
    unknown features_count): walk the size prefixes from the data
    section. O(features) 4-byte preads on the driver — manifest-build
    cost, not a data read; the feature bytes still stream on the
    executors."""
    feat0 = info["index_offset"] + info["index_bytes"]
    fsize = os.path.getsize(path)
    offs = []
    with open(path, "rb") as f:
        cur = feat0
        while cur + 4 <= fsize:
            (sz,) = struct.unpack("<I", os.pread(f.fileno(), 4, cur))
            offs.append(cur)
            cur += 4 + sz
    return offs


def _leaf_offsets(path: str, info: dict) -> list:
    """All feature offsets (full-scan manifest) from the leaf nodes,
    or the sequential size-prefix walk when the file carries no
    index."""
    n, node_size = info["features_count"], info["index_node_size"]
    if node_size < 2 or n == 0:
        return _sequential_offsets(path, info)
    bounds, _ = _level_bounds(n, node_size)
    lo, hi = bounds[0]
    idx0 = info["index_offset"]
    with open(path, "rb") as f:
        raw = os.pread(f.fileno(), (hi - lo) * _NODE_BYTES,
                       idx0 + lo * _NODE_BYTES)
    feat0 = idx0 + info["index_bytes"]
    return [feat0 + struct.unpack_from("<Q", raw, i * _NODE_BYTES + 32)[0]
            for i in range(hi - lo)]


def read_fgb(spark, path: str, bbox=None, wkt_col: str = "wkt",
             features_per_task: int = 4096,
             coalesce_gap: int = 1 << 16) -> DataFrame:
    """FlatGeobuf -> DataFrame (property columns + ``wkt``).

    The driver reads header + (for bbox queries) only the touched
    index nodes, then ships offset slices; each executor preads and
    decodes exactly its features — the fiona masked-scan semantics of
    the reference (xx_fiona_testing.py:133-136) with the byte-range
    discipline of the engine's COG source. ``bbox`` prunes via the
    packed R-tree; the returned features are index candidates
    (bbox-intersecting), matching fiona's mask filter — exact
    predicates stay downstream (pip_join / dwithin).

    Offsets within ``coalesce_gap`` bytes of their predecessor are
    fetched in ONE range read (Hilbert clustering makes bbox hits
    byte-adjacent, so a window read is typically a couple of ranges,
    not one request per feature — the discipline that matters when
    pread is an object-store GetRange)."""
    info = read_fgb_info(path)
    if bbox is not None:
        offsets = fgb_search(path, bbox)["offsets"]
    else:
        offsets = _leaf_offsets(path, info)
    cols = info["columns"]
    gtype = info["geometry_type"]
    spark_types = {CT_BOOL: "BOOLEAN", CT_SHORT: "SMALLINT",
                   CT_INT: "INT", CT_LONG: "BIGINT", CT_FLOAT: "FLOAT",
                   CT_DOUBLE: "DOUBLE", CT_STRING: "STRING"}
    schema = ", ".join([f"`{c}` {spark_types.get(ct, 'STRING')}"
                        for c, ct in cols] + [f"{wkt_col} STRING"])
    if not offsets:
        return spark.createDataFrame([], schema)
    chunks = [offsets[i:i + features_per_task]
              for i in range(0, len(offsets), features_per_task)]
    mdf = spark.createDataFrame(
        pd.DataFrame({"offs": chunks})).repartition(
        min(len(chunks), spark.sparkContext.defaultParallelism))

    def fetch(batches):
        f = open(path, "rb")
        try:
            fd = f.fileno()
            for pdf in batches:
                rows = []
                for offs in pdf["offs"]:
                    offs = [int(o) for o in offs]   # sorted by contract
                    runs, s = [], 0
                    for i in range(1, len(offs)):
                        if offs[i] - offs[i - 1] > coalesce_gap:
                            runs.append((s, i))
                            s = i
                    runs.append((s, len(offs)))
                    for lo, hi in runs:
                        base, last = offs[lo], offs[hi - 1]
                        # one range read through the last size prefix,
                        # then exactly the last feature's body
                        head = os.pread(fd, last + 4 - base, base)
                        (last_sz,) = struct.unpack_from(
                            "<I", head, last - base)
                        buf = head + os.pread(fd, last_sz, last + 4)
                        for off in offs[lo:hi]:
                            rel = off - base
                            (sz,) = struct.unpack_from("<I", buf, rel)
                            rows.append(decode_feature(
                                buf[rel + 4:rel + 4 + sz], cols, gtype))
                if rows:
                    out = pd.DataFrame(
                        rows, columns=[c for c, _ in cols] + [wkt_col])
                    yield out
        finally:
            f.close()
    return mdf.mapInPandas(fetch, schema=schema)
