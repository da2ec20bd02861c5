"""Baseline JPEG codec and WAV PCM decode — the last media stubs made
real. Spec anchors: the published zigzag order, IDCT closed forms, byte
stuffing, and refusal (not mis-decode) of out-of-subset streams."""

import numpy as np
import pytest

from balrog_spark import jpegcodec as J
from balrog_spark import mediaops as M

# the standard zigzag sequence (T.81 Figure A.6), typed out independently
ZZ_REF = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
          12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
          35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
          58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]


def test_zigzag_matches_standard():
    assert list(J.ZIGZAG) == ZZ_REF


def test_idct_closed_forms():
    # DC-only block: flat value dc/8 (orthonormal scaling)
    blk = np.zeros((1, 8, 8))
    blk[0, 0, 0] = 80.0
    assert np.allclose(J._idct2(blk), 10.0)
    # single AC coefficient (u=0, v=3): separable cosine profile
    blk = np.zeros((1, 8, 8))
    blk[0, 0, 3] = 16.0
    got = J._idct2(blk)[0]
    x = np.arange(8)
    prof = 16.0 * np.sqrt(1 / 8) * np.sqrt(2 / 8) \
        * np.cos((2 * x + 1) * 3 * np.pi / 16)
    assert np.allclose(got, np.tile(prof, (8, 1)))
    # inverse really inverts the forward transform
    rng = np.random.RandomState(0)
    b = rng.randn(5, 8, 8)
    assert np.allclose(J._idct2(J._dct2(b)), b, atol=1e-12)


def test_jpeg_roundtrips():
    x, y = np.meshgrid(np.arange(40), np.arange(24))
    img = np.stack([(x * 3 + y * 2) % 256, (x * 2) % 256,
                    (255 - y * 4) % 256], axis=2).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4

    gray = ((x + y) % 256).astype(np.uint8)
    decg = J.decode_jpeg(J.encode_jpeg(gray, quality=95))
    assert np.abs(decg[:, :, 0].astype(int) - gray.astype(int)).max() <= 2
    assert (decg[:, :, 0] == decg[:, :, 1]).all()

    flat = np.full((16, 16, 3), 128, np.uint8)
    assert (J.decode_jpeg(J.encode_jpeg(flat, 90)) == 128).all()

    # worst case: q100 noise with odd (non-multiple-of-8) dimensions;
    # only YCbCr rounding remains
    rng = np.random.RandomState(1)
    noisy = rng.randint(0, 256, (17, 23, 3), dtype=np.uint8)
    enc = J.encode_jpeg(noisy, quality=100)
    assert b"\xff\x00" in enc            # byte stuffing exercised
    decn = J.decode_jpeg(enc)
    assert np.abs(decn.astype(int) - noisy.astype(int)).max() <= 3


def test_jpeg_refuses_out_of_subset():
    img = np.full((8, 8), 7, np.uint8)
    enc = bytearray(J.encode_jpeg(img, 90))
    sof = bytes(enc).index(b"\xff\xc0")
    # arithmetic-coded lossless marker (SOF2 and SOF3 decode for real now)
    prog = bytes(enc[:sof + 1]) + b"\xcb" + bytes(enc[sof + 2:])
    with pytest.raises(ValueError, match="baseline"):
        J.decode_jpeg(prog)
    # out-of-range sampling factors
    sub = bytearray(enc)
    sub[sof + 11] = 0x55                 # hv byte of component 1
    with pytest.raises(ValueError, match="bad sampling"):
        J.decode_jpeg(bytes(sub))
    with pytest.raises(ValueError, match="not a JPEG"):
        J.decode_jpeg(b"nope")


def test_decode_image_dispatches_jpeg():
    x, y = np.meshgrid(np.arange(16), np.arange(16))
    img = ((x * 8 + y) % 256).astype(np.uint8)
    rgb = np.repeat(img[:, :, None], 3, axis=2)
    dec = M.decode_image(J.encode_jpeg(rgb, 95), 16, 16)
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 4


def test_wav_roundtrip_and_mixdown():
    t = np.arange(2048) / 16000.0
    pcm = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    out = M.decode_wav(M.encode_wav(pcm))
    assert out.dtype == np.float32 and out.shape == pcm.shape
    assert np.abs(out - pcm).max() <= 1.5 / 32768  # 16-bit quantization

    # stereo mixes down to the channel mean (hand-built 2-channel file)
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(8000)
        inter = np.zeros(8, "<i2")
        inter[0::2] = [1000, 2000, 3000, 4000]
        inter[1::2] = [3000, 4000, 5000, 6000]
        f.writeframes(inter.tobytes())
    got = M.decode_audio(buf.getvalue())
    assert np.allclose(got * 32768.0, [2000, 3000, 4000, 5000])

    # compressed audio still refuses without fake=True
    with pytest.raises(NotImplementedError):
        M.decode_audio(b"\xff\xfb mp3ish")


def test_real_media_pipeline_end_to_end(spark):
    """The Spark media pipeline over REAL payloads — PNG and JPEG through
    image_features, WAV through audio_features — with no fake flag; the
    features must match a driver-side numpy recomputation of the same
    decode + resize / window math."""
    media = M.synthetic_media_real(spark, n=9)
    rows = {r.media_id: r for r in media.collect()}

    feats = {r.media_id: np.array(r.feat)
             for r in M.image_features(media, out_w=4, out_h=4,
                                       fake_decode=False).collect()}
    n_img = sum(1 for r in rows.values() if r.kind == "image")
    assert len(feats) == n_img > 0
    for mid, f in feats.items():
        img = M.decode_image(bytes(rows[mid].payload), 0, 0)
        small = M.resize_nearest(img, 4, 4)
        want = (small.astype(np.float32) / 255.0).mean(axis=2).ravel()
        assert np.allclose(f, want, atol=1e-6)

    af = M.audio_features(media, window=512, fake_decode=False).collect()
    assert {r.media_id for r in af} == \
        {m for m, r in rows.items() if r.kind == "audio"}
    for r in af:
        pcm = M.decode_wav(bytes(rows[r.media_id].payload))
        w = pcm[r.window_idx * 512:(r.window_idx + 1) * 512]
        assert r.rms == pytest.approx(
            float(np.sqrt((w.astype(np.float64) ** 2).mean())), rel=1e-5)
        assert r.peak == pytest.approx(float(np.abs(w).max()), rel=1e-5)


def test_jpeg_420_subsampled_roundtrip():
    """4:2:0 — the layout virtually every real JPEG uses. Luma stays as
    tight as 4:4:4; chroma carries the inherent 2x2-averaging loss, so the
    check compares against the chroma-downsampled reference."""
    x, y = np.meshgrid(np.arange(41), np.arange(27))
    img = np.stack([(x * 3 + y * 2) % 256, (x * 2 + 60) % 256,
                    (255 - y * 4) % 256], axis=2).astype(np.uint8)
    enc = J.encode_jpeg(img, quality=95, subsample=True)
    dec = J.decode_jpeg(enc)
    assert dec.shape == img.shape
    # luma of the decode matches luma of the source tightly
    def luma(a):
        return (0.299 * a[:, :, 0] + 0.587 * a[:, :, 1]
                + 0.114 * a[:, :, 2])
    assert np.abs(luma(dec) - luma(img)).max() <= 3.0
    # whole-image error bounded by the chroma averaging
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8

    # flat-chroma image: 4:2:0 loses almost nothing
    img2 = np.stack([((x + y) * 3) % 256, np.full_like(x, 90),
                     np.full_like(x, 170)], axis=2).astype(np.uint8)
    d2 = J.decode_jpeg(J.encode_jpeg(img2, 95, subsample=True))
    assert np.abs(d2.astype(int) - img2.astype(int)).max() <= 4
    # and decode_image dispatches it like any JPEG
    from balrog_spark import mediaops as MM
    assert (MM.decode_image(enc, 0, 0) == dec).all()


def test_jpeg_restart_intervals():
    """DRI/RSTn: markers every N MCUs, byte alignment, DC predictor reset
    — decode must be identical to the no-restart stream, and a stream with
    the WRONG restart marker ordinal must be refused."""
    x, y = np.meshgrid(np.arange(41), np.arange(27))
    img = np.stack([(x * 3 + y * 2) % 256, (x * 2 + 60) % 256,
                    (255 - y * 4) % 256], axis=2).astype(np.uint8)
    base = J.decode_jpeg(J.encode_jpeg(img, 95))
    for sub in (False, True):
        for ri in (1, 3):
            enc = J.encode_jpeg(img, 95, subsample=sub,
                                restart_interval=ri)
            assert any(bytes([0xFF, 0xD0 + k]) in enc for k in range(8))
            dec = J.decode_jpeg(enc)
            if not sub:
                assert (dec == base).all()   # same data path, same pixels
            else:
                assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8

    # corrupt the first restart marker's ordinal -> refused
    enc = bytearray(J.encode_jpeg(img, 95, restart_interval=2))
    p = bytes(enc).index(b"\xff\xd0")
    enc[p + 1] = 0xD5
    with pytest.raises(ValueError, match="expected RST"):
        J.decode_jpeg(bytes(enc))


def test_mjpeg_video_frame_decode(spark):
    """Video is real now too: MJPEG payloads split exactly at EOI markers,
    sampled frames decode through the JPEG codec inside Spark, and each
    feature row matches a driver-side recompute."""
    media = M.synthetic_media_real(spark, n=9)
    vids = {r.media_id: bytes(r.payload)
            for r in media.collect() if r.kind == "video"}
    assert vids
    got = M.decode_frames(media, every_n=2).collect()
    assert {r.media_id for r in got} == set(vids)
    for r in got:
        frames = M.split_mjpeg(vids[r.media_id])
        assert len(frames) == 6
        from balrog_spark.jpegcodec import decode_jpeg
        img = decode_jpeg(frames[r.frame_idx])
        small = M.resize_nearest(img, 8, 8)
        want = (small.astype(np.float32) / 255.0).mean(axis=2).ravel()
        assert np.allclose(np.array(r.feat), want, atol=1e-6)
    # every_n=2 over 6 frames -> frames 0, 2, 4
    by_vid = {}
    for r in got:
        by_vid.setdefault(r.media_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 2, 4] for v in by_vid.values())


def test_mjpeg_split_survives_ffd9_inside_marker_segments():
    """Regression: real camera MJPEG carries APPn/COM/DQT segments whose
    binary payloads can contain the FF D9 byte pair; a naive find() split
    mid-frame there. The splitter must walk marker segments by their
    length fields and only treat a bare post-SOS FF D9 as EOI."""
    img = (np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
           * 7 % 256).astype(np.uint8)
    plain = J.encode_jpeg(img, 90)
    assert plain[:2] == b"\xff\xd8"

    # inject an EXIF-ish APP1 segment containing FF D9 right after SOI
    evil = b"Exif\x00\x00" + b"\xff\xd9" * 3 + b"\x00\xff\xd9tail"
    app1 = b"\xff\xe1" + (len(evil) + 2).to_bytes(2, "big") + evil
    framed = plain[:2] + app1 + plain[2:]

    # and a COM segment with FF D9 in a second frame
    com = b"\xff\xfe" + (12).to_bytes(2, "big") + b"ab\xff\xd9cdefgh"
    frame2 = plain[:2] + com + plain[2:]

    stream = framed + frame2 + plain
    frames = M.split_mjpeg(stream)
    assert len(frames) == 3
    assert frames[0] == framed and frames[1] == frame2 and frames[2] == plain
    # every recovered frame still decodes to the same pixels
    base = J.decode_jpeg(plain)
    for f in frames:
        assert (J.decode_jpeg(f) == base).all()


def test_progressive_jpeg_equals_baseline_decode():
    """Progressive (SOF2) decodes for real: the default 10-scan
    successive-approximation script over identical quantized coefficients
    must reproduce the baseline decode BIT-FOR-BIT — 4:4:4, 4:2:0 and
    grayscale, odd dimensions, smooth and noisy content."""
    rng = np.random.default_rng(6)
    x, y = np.meshgrid(np.arange(37), np.arange(29))
    smooth = np.stack([(x * 5 + y * 3) % 256, (x * 2 + y * 7) % 256,
                       (255 - x * 3) % 256], axis=2).astype(np.uint8)
    noisy = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    for img in (smooth, noisy):
        for q in (75, 95):
            assert (J.decode_jpeg(J.encode_jpeg_progressive(img, q))
                    == J.decode_jpeg(J.encode_jpeg(img, q))).all()
        assert (J.decode_jpeg(J.encode_jpeg_progressive(
                    img, 85, subsample=True))
                == J.decode_jpeg(J.encode_jpeg(img, 85,
                                               subsample=True))).all()
    g = ((x * 11 + y * 13) % 256).astype(np.uint8)
    assert (J.decode_jpeg(J.encode_jpeg_progressive(g, 90))
            == J.decode_jpeg(J.encode_jpeg(g, 90))).all()


def test_progressive_custom_scan_scripts():
    """Band splits, deep successive approximation and scan order are all
    honoured: a hand-written script with three AC bands and 3-level
    approximation still reproduces the baseline decode exactly, and a
    PARTIAL script (no final refinements) decodes without error to a
    coarser image."""
    x, y = np.meshgrid(np.arange(21), np.arange(18))
    img = np.stack([(x * 9 + y * 2) % 256, (x + y * 5) % 256,
                    (x * 4) % 256], axis=2).astype(np.uint8)
    script = [((0, 1, 2), 0, 0, 0, 2),
              ((0,), 1, 2, 0, 3), ((0,), 3, 20, 0, 3), ((0,), 21, 63, 0, 3),
              ((1,), 1, 63, 0, 2), ((2,), 1, 63, 0, 2),
              ((0, 1, 2), 0, 0, 1, 1), ((0, 1, 2), 0, 0, 2, 0),
              ((0,), 1, 63, 3, 2), ((0,), 1, 63, 2, 1), ((0,), 1, 63, 1, 0),
              ((1,), 1, 63, 2, 1), ((1,), 1, 63, 1, 0),
              ((2,), 1, 63, 2, 1), ((2,), 1, 63, 1, 0)]
    enc = J.encode_jpeg_progressive(img, 90, scans=script)
    assert (J.decode_jpeg(enc) == J.decode_jpeg(J.encode_jpeg(img, 90))) \
        .all()
    # truncated delivery: only the first-pass scans — still decodable,
    # coarser but close (that is the point of progressive rendering)
    partial = J.encode_jpeg_progressive(img, 90, scans=script[:6])
    coarse = J.decode_jpeg(partial)
    full = J.decode_jpeg(J.encode_jpeg(img, 90))
    assert np.abs(coarse.astype(int) - full.astype(int)).mean() < 40


def test_lossless_jpeg_roundtrip_every_predictor():
    """SOF3 (T.81 Annex H): bit-exact roundtrip for all seven predictors,
    gray and RGB, including a worst-case random image (no residual
    structure) and a gradient (predictor-friendly)."""
    rng = np.random.default_rng(11)
    x, y = np.meshgrid(np.arange(37), np.arange(23))
    grad = ((x * 3 + y * 7) % 256).astype(np.uint8)
    noise = rng.integers(0, 256, (23, 37), dtype=np.uint8)
    rgb = rng.integers(0, 256, (19, 11, 3), dtype=np.uint8)
    for p in range(1, 8):
        for img in (grad, noise):
            out = J.decode_jpeg_lossless(
                J.encode_jpeg_lossless(img, predictor=p))
            assert out.shape == (23, 37, 1)
            assert (out[:, :, 0] == img).all(), f"predictor {p}"
        out = J.decode_jpeg_lossless(
            J.encode_jpeg_lossless(rgb, predictor=p))
        assert (out == rgb).all(), f"predictor {p} rgb"


def test_lossless_jpeg_restarts_precision_point_transform():
    rng = np.random.default_rng(13)
    # restart intervals reset the prediction to the scan default
    img = rng.integers(0, 256, (29, 17, 3), dtype=np.uint8)
    enc = J.encode_jpeg_lossless(img, predictor=4, restart_interval=31)
    assert b"\xff\xdd" in enc and b"\xff\xd0" in enc
    assert (J.decode_jpeg_lossless(enc) == img).all()
    # 16-bit samples force the SSSS=16 (diff = 32768, no appended bits)
    # and full mod-2^16 wraparound paths
    img16 = np.array([[0, 65535, 0, 32768], [65535, 0, 32768, 1]],
                     dtype=np.int64)
    enc = J.encode_jpeg_lossless(img16, predictor=1, precision=16)
    assert (J.decode_jpeg_lossless(enc)[:, :, 0] == img16).all()
    # point transform drops Pt low bits; decoder re-multiplies
    img12 = rng.integers(0, 4096, (9, 14)).astype(np.int64)
    enc = J.encode_jpeg_lossless(img12, precision=12, point_transform=2)
    assert (J.decode_jpeg_lossless(enc)[:, :, 0]
            == (img12 >> 2) << 2).all()


def test_lossless_jpeg_decode_jpeg_dispatch():
    """decode_jpeg and the Spark-side media path see SOF3 streams as
    ordinary images (8-bit exact; >8-bit rescaled into uint8)."""
    rng = np.random.default_rng(17)
    rgb = rng.integers(0, 256, (12, 15, 3), dtype=np.uint8)
    assert (J.decode_jpeg(J.encode_jpeg_lossless(rgb)) == rgb).all()
    gray = rng.integers(0, 256, (12, 15), dtype=np.uint8)
    out = J.decode_jpeg(J.encode_jpeg_lossless(gray))
    assert out.shape == (12, 15, 3) and (out[:, :, 1] == gray).all()
    img12 = (np.arange(12 * 15).reshape(12, 15) * 23 % 4096).astype(
        np.int64)
    out = J.decode_jpeg(J.encode_jpeg_lossless(img12, precision=12))
    assert (out[:, :, 0] == (img12 >> 4).astype(np.uint8)).all()
    dec = M.decode_image(J.encode_jpeg_lossless(rgb), 12, 15)
    assert (dec == rgb).all()
