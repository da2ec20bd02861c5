"""Baseline TIFF 6.0 + GIF87a/89a codecs: pure-numpy roundtrips, LZW
width-schedule/clear coverage, hand-built foreign-endian and multi-frame
fixtures, and the Spark decode paths (image_features mapInPandas dispatch,
animated-GIF decode_frames). Unlike mp3 (spec-data Huffman tables), every
TIFF/GIF detail is derivable from public structure — so these decode for
real, closing the last derivable media-format refusals."""

import struct

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from balrog_spark import gifcodec, mediaops, tiffcodec


# --- TIFF ------------------------------------------------------------------

@pytest.mark.parametrize("comp", [1, 32773, 5])
@pytest.mark.parametrize("pred", [1, 2])
def test_tiff_roundtrip_rgb(comp, pred):
    rng = np.random.default_rng(3)
    for shape in [(13, 17, 3), (1, 1, 3), (30, 5, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for rps in (None, 4):
            enc = tiffcodec.encode_tiff(img, compression=comp,
                                        predictor=pred, rows_per_strip=rps)
            assert np.array_equal(tiffcodec.decode_tiff(enc), img)


def test_tiff_grayscale_and_whiteiszero():
    rng = np.random.default_rng(4)
    g = rng.integers(0, 256, size=(9, 11), dtype=np.uint8)
    for comp in (1, 32773, 5):
        dec = tiffcodec.decode_tiff(tiffcodec.encode_tiff(g,
                                                          compression=comp))
        assert np.array_equal(dec, np.repeat(g[:, :, None], 3, axis=2))
    # photometric 0: white-is-zero inverts
    inv = tiffcodec.decode_tiff(tiffcodec.encode_tiff(g, photometric=0))
    assert np.array_equal(inv[:, :, 0], 255 - g)


def test_tiff_lzw_width_schedule_and_clears():
    rng = np.random.default_rng(5)
    # low-entropy data grows the table across every width boundary;
    # 500k constant bytes force multiple table clears
    for n in (0, 1, 2, 5, 100, 5000, 70000):
        for hi in (4, 256):
            d = bytes(rng.integers(0, hi, size=n, dtype=np.uint8))
            got = tiffcodec.lzw_decode(tiffcodec.lzw_encode(d), n)
            assert got == d, (n, hi)
    const = bytes(500000)
    assert tiffcodec.lzw_decode(tiffcodec.lzw_encode(const),
                                len(const)) == const


def test_tiff_packbits_edge_cases():
    for data in (b"", b"a", b"ab", b"aaa", b"a" * 400,
                 bytes(range(256)) * 3):
        enc = tiffcodec.packbits_encode(data)
        assert tiffcodec.unpackbits_decode(enc, len(data)) == data


def test_tiff_big_endian_fixture():
    """Hand-built MM (Motorola) file: the byte-order branch must flip every
    multi-byte field."""
    w, h = 3, 2
    pix = bytes(range(w * h))
    ifd_off = 8 + len(pix)
    entries = [(256, 3, w), (257, 3, h), (258, 3, 8), (259, 3, 1),
               (262, 3, 1), (273, 4, 8), (277, 3, 1), (278, 4, h),
               (279, 4, len(pix))]
    buf = struct.pack(">2sHI", b"MM", 42, ifd_off) + pix
    buf += struct.pack(">H", len(entries))
    for tag, typ, val in entries:
        if typ == 3:
            buf += struct.pack(">HHIHH", tag, typ, 1, val, 0)
        else:
            buf += struct.pack(">HHII", tag, typ, 1, val)
    buf += struct.pack(">I", 0)
    dec = tiffcodec.decode_tiff(buf)
    assert np.array_equal(dec[:, :, 0],
                          np.frombuffer(pix, np.uint8).reshape(h, w))


def test_tiff_rejects_non_tiff():
    with pytest.raises(ValueError):
        tiffcodec.decode_tiff(b"XXXX garbage")


@pytest.mark.parametrize("comp", [1, 5, 32773])
@pytest.mark.parametrize("pred", [1, 2])
@pytest.mark.parametrize("byte_order", ["II", "MM"])
def test_tiff_16bit_roundtrip(comp, pred, byte_order):
    rng = np.random.default_rng(21)
    gray = rng.integers(0, 65536, size=(9, 13), dtype=np.uint16)
    enc = tiffcodec.encode_tiff(gray, compression=comp, predictor=pred,
                                rows_per_strip=4, byte_order=byte_order)
    dec = tiffcodec.decode_tiff(enc)
    assert dec.dtype == np.uint16
    assert np.array_equal(dec[:, :, 0], gray)
    rgb = rng.integers(0, 65536, size=(7, 5, 3), dtype=np.uint16)
    enc = tiffcodec.encode_tiff(rgb, compression=comp, predictor=pred,
                                byte_order=byte_order)
    assert np.array_equal(tiffcodec.decode_tiff(enc), rgb)


def test_tiff_16bit_decode_image_dispatch():
    from balrog_spark import mediaops

    rng = np.random.default_rng(22)
    img = rng.integers(0, 65536, size=(6, 8, 3), dtype=np.uint16)
    for byte_order in ("II", "MM"):
        payload = tiffcodec.encode_tiff(img, byte_order=byte_order)
        dec = mediaops.decode_image(payload, 8, 6)
        assert dec.dtype == np.uint16
        assert np.array_equal(dec, img)


def _tiff_without_counts(comp: int, strips: list, w: int, h: int,
                         rows_per_strip: int) -> bytes:
    """Hand-built II file with NO StripByteCounts tag (279)."""
    offs, pos = [], 8
    for s in strips:
        offs.append(pos)
        pos += len(s)
    ifd_off = pos + (pos % 2)
    entries = [(256, 4, [w]), (257, 4, [h]), (258, 3, [8]),
               (259, 3, [comp]), (262, 3, [1]), (273, 4, offs),
               (277, 3, [1]), (278, 4, [rows_per_strip])]
    ifd_size = 2 + 12 * len(entries) + 4
    over_off = ifd_off + ifd_size
    ifd = bytearray(struct.pack("<H", len(entries)))
    overflow = bytearray()
    fmt = {3: "H", 4: "I"}
    size_of = {3: 2, 4: 4}
    for tag, typ, vals in entries:
        packed = struct.pack(f"<{len(vals)}{fmt[typ]}", *vals)
        if len(vals) * size_of[typ] <= 4:
            val = packed + b"\0" * (4 - len(packed))
        else:
            val = struct.pack("<I", over_off + len(overflow))
            overflow += packed
        ifd += struct.pack("<HHI", tag, typ, len(vals)) + val
    ifd += struct.pack("<I", 0)
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    for s in strips:
        out += s
    if len(out) % 2:
        out += b"\0"
    return bytes(out + ifd + overflow)


def test_tiff_missing_stripbytecounts():
    """Tag 279 absent: single strip and uncompressed multi-strip are
    derivable; compressed multi-strip must raise a clear diagnostic
    instead of dying later in an unrelated reshape."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(6, 5), dtype=np.uint8)
    raw = [img[:3].tobytes(), img[3:].tobytes()]
    dec = tiffcodec.decode_tiff(_tiff_without_counts(1, raw, 5, 6, 3))
    assert np.array_equal(dec[:, :, 0], img)
    lzw = [tiffcodec.lzw_encode(c) for c in raw]
    with pytest.raises(ValueError, match="StripByteCounts"):
        tiffcodec.decode_tiff(_tiff_without_counts(5, lzw, 5, 6, 3))
    one = [tiffcodec.lzw_encode(img.tobytes())]
    dec = tiffcodec.decode_tiff(_tiff_without_counts(5, one, 5, 6, 6))
    assert np.array_equal(dec[:, :, 0], img)


# --- GIF -------------------------------------------------------------------

def test_gif_roundtrip_plain_and_interlaced():
    rng = np.random.default_rng(9)
    for shape in [(13, 17), (1, 1), (33, 7), (64, 64)]:
        pal = rng.integers(0, 256, size=(13, 3), dtype=np.uint8)
        img = pal[rng.integers(0, 13, size=shape)]
        for il in (False, True):
            enc = gifcodec.encode_gif(img, interlace=il)
            assert np.array_equal(gifcodec.decode_gif(enc), img), (shape,
                                                                   il)


def test_gif_full_256_color_palette():
    rng = np.random.default_rng(10)
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    img = pal[rng.integers(0, 256, size=(40, 40))]
    assert np.array_equal(gifcodec.decode_gif(gifcodec.encode_gif(img)),
                          img)
    with pytest.raises(ValueError):
        gifcodec.encode_gif(rng.integers(0, 256, size=(64, 64, 3),
                                         dtype=np.uint8))


def test_gif_lzw_widths_and_min_code_sizes():
    rng = np.random.default_rng(11)
    for mcs in (2, 4, 8):
        for n in (0, 1, 7, 300, 20000):
            d = bytes(rng.integers(0, 1 << mcs, size=n, dtype=np.uint8))
            enc = gifcodec.gif_lzw_encode(d, mcs)
            assert gifcodec.gif_lzw_decode(enc, mcs, n) == d, (mcs, n)


def test_gif_multiframe_compositing():
    """Hand-spliced two-frame GIF: second frame paints a 2x2 red square at
    (1, 1) with a local color table; frames composite in place."""
    f1 = np.zeros((4, 4, 3), np.uint8)
    body = bytearray(gifcodec.encode_gif(f1)[:-1])  # drop trailer
    pal2 = np.array([[255, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0]],
                    np.uint8)
    lzw = gifcodec.gif_lzw_encode(np.zeros((2, 2), np.uint8).tobytes(), 2)
    body += struct.pack("<BHHHHB", 0x2C, 1, 1, 2, 2, 0x80 | 1)
    body += pal2.tobytes()
    body += bytes([2, len(lzw)]) + lzw + b"\x00" + b"\x3B"
    frames = gifcodec.gif_frames(bytes(body))
    assert len(frames) == 2
    assert np.array_equal(frames[0], f1)
    exp = f1.copy()
    exp[1:3, 1:3] = [255, 0, 0]
    assert np.array_equal(frames[1], exp)


def _splice_frame(body: bytearray, ix, iy, arr: np.ndarray,
                  pal: np.ndarray, disposal: int | None):
    """Append (optionally a GCE with a disposal method and) one image
    block with a local color table to a trailerless GIF body."""
    if disposal is not None:
        body += bytes([0x21, 0xF9, 4, disposal << 2, 0, 0, 0, 0])
    ih, iw = arr.shape
    mcs = 2
    lzw = gifcodec.gif_lzw_encode(arr.astype(np.uint8).tobytes(), mcs)
    body += struct.pack("<BHHHHB", 0x2C, ix, iy, iw, ih, 0x80 | 1)
    body += pal.tobytes()
    body += bytes([mcs, len(lzw)]) + lzw + b"\x00"


def test_gif_disposal_restore_background():
    """Disposal 2: the frame rect clears to the background color before
    the next frame renders — the red square must NOT persist."""
    f1 = np.zeros((4, 4, 3), np.uint8)
    body = bytearray(gifcodec.encode_gif(f1)[:-1])
    pal_red = np.array([[255, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0]],
                       np.uint8)
    pal_grn = np.array([[0, 255, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0]],
                       np.uint8)
    _splice_frame(body, 1, 1, np.zeros((2, 2)), pal_red, disposal=2)
    _splice_frame(body, 0, 0, np.zeros((1, 1)), pal_grn, disposal=None)
    frames = gifcodec.gif_frames(bytes(body + b"\x3B"))
    assert len(frames) == 3
    exp2 = f1.copy()
    exp2[1:3, 1:3] = [255, 0, 0]
    assert np.array_equal(frames[1], exp2)
    exp3 = f1.copy()                    # red square ERASED to background
    exp3[0, 0] = [0, 255, 0]
    assert np.array_equal(frames[2], exp3)


def test_gif_disposal_restore_previous():
    """Disposal 3: the canvas reverts to the pre-frame screen."""
    f1 = np.zeros((4, 4, 3), np.uint8)
    body = bytearray(gifcodec.encode_gif(f1)[:-1])
    pal_red = np.array([[255, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0]],
                       np.uint8)
    pal_blu = np.array([[0, 0, 255], [0, 0, 0], [0, 0, 0], [0, 0, 0]],
                       np.uint8)
    _splice_frame(body, 0, 0, np.zeros((4, 4)), pal_red, disposal=3)
    _splice_frame(body, 3, 3, np.zeros((1, 1)), pal_blu, disposal=None)
    frames = gifcodec.gif_frames(bytes(body + b"\x3B"))
    assert len(frames) == 3
    assert np.array_equal(frames[1],
                          np.full((4, 4, 3), [255, 0, 0], np.uint8))
    exp3 = f1.copy()                    # full-screen red reverted
    exp3[3, 3] = [0, 0, 255]
    assert np.array_equal(frames[2], exp3)


# --- Spark dispatch ---------------------------------------------------------

def _media_df(spark):
    rng = np.random.default_rng(21)
    pal = rng.integers(0, 256, size=(7, 3), dtype=np.uint8)
    gif_img = pal[rng.integers(0, 7, size=(12, 16))]
    tif_img = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    rows = [
        {"media_id": "tif-0", "kind": "image", "mime": "image/tiff",
         "width": 16, "height": 12, "n_frames": None,
         "payload": bytearray(tiffcodec.encode_tiff(tif_img,
                                                    compression=5))},
        {"media_id": "gif-0", "kind": "image", "mime": "image/gif",
         "width": 16, "height": 12, "n_frames": None,
         "payload": bytearray(gifcodec.encode_gif(gif_img))},
    ]
    return (spark.createDataFrame(rows, schema=mediaops.MEDIA),
            {"tif-0": tif_img, "gif-0": gif_img})


def test_image_features_dispatches_tiff_and_gif(spark):
    media, imgs = _media_df(spark)
    got = mediaops.image_features(media, fake_decode=False).toPandas() \
        .set_index("media_id")
    assert set(got.index) == {"tif-0", "gif-0"}
    for mid, img in imgs.items():
        small = mediaops.resize_nearest(img, 8, 8)
        exp = (small.astype(np.float32) / 255.0).mean(axis=2).ravel()
        assert np.allclose(np.array(got.loc[mid].feat), exp)


def test_decode_frames_animated_gif(spark):
    """A 3-frame animated GIF flows through the video sample->decode->
    featurize path exactly like MJPEG."""
    pal = np.array([[0, 0, 0], [255, 255, 255], [255, 0, 0], [0, 255, 0]],
                   np.uint8)
    base = np.zeros((8, 8), np.uint8)
    frames_idx = []
    for k in range(3):
        f = base.copy()
        f[k:k + 3, k:k + 3] = k + 1
        frames_idx.append(f)
    body = bytearray(gifcodec.encode_gif(pal[frames_idx[0]])[:-1])
    for f in frames_idx[1:]:
        lzw = gifcodec.gif_lzw_encode(f.tobytes(), 2)
        body += struct.pack("<BHHHHB", 0x2C, 0, 0, 8, 8, 0x80 | 1)
        body += pal.tobytes()
        body += bytes([2, len(lzw)]) + lzw + b"\x00"
    body += b"\x3B"
    media = spark.createDataFrame(
        [{"media_id": "anim-0", "kind": "video", "mime": "image/gif",
          "width": 8, "height": 8, "n_frames": 3,
          "payload": bytearray(bytes(body))}], schema=mediaops.MEDIA)
    got = mediaops.decode_frames(media, every_n=2).toPandas()
    assert sorted(got.frame_idx) == [0, 2]
    # no GCE transparency: each full-screen frame fully overwrites, so the
    # sampled frame 2 is exactly its own palette expansion
    comp = pal[frames_idx[2]]
    small = mediaops.resize_nearest(comp, 8, 8)
    exp = (small.astype(np.float32) / 255.0).mean(axis=2).ravel()
    row = got.set_index("frame_idx").loc[2]
    assert np.allclose(np.array(row.feat), exp)
