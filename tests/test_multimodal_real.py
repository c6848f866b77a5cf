"""End-to-end decode_stub=False path: real BMP/WAV payloads through
the Spark mapInPandas pipeline, with exact expected values."""

import io
import wave

import numpy as np
import pytest

from dragnet_spark.ops.multimodal import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    extract_features,
    resize_media,
)


def _bmp_bytes(px) -> bytes:
    return encode_bmp(np.asarray(px, dtype=np.uint8))


def _wav_bytes(samples, rate=8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def test_bmp_roundtrip():
    px = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3)
    w, h, out = decode_bmp(encode_bmp(px))
    assert (w, h) == (4, 3)
    np.testing.assert_array_equal(out, px)


def test_bmp_roundtrip_padded_stride():
    # width 3 → row stride pads from 9 to 12 bytes
    px = np.full((2, 3, 3), 7, dtype=np.uint8)
    _, _, out = decode_bmp(encode_bmp(px))
    np.testing.assert_array_equal(out, px)


def test_wav_roundtrip():
    nch, rate, x = decode_wav(_wav_bytes([0, 16384, -16384, 32767], rate=44100))
    assert (nch, rate, len(x)) == (1, 44100, 4)
    np.testing.assert_allclose(x[:3], [0.0, 0.5, -0.5])


@pytest.fixture(scope="module")
def media(spark):
    bmp = _bmp_bytes(np.full((2, 2, 3), 100, dtype=np.uint8))
    wav = _wav_bytes([16384] * 8, rate=8000)
    rows = [
        (1, "image/bmp", bmp, (2, 2, "bmp")),
        (2, "audio/wav", wav, (0, 0, "pcm")),
    ]
    return spark.createDataFrame(
        rows,
        "id long, media_type string, payload binary, "
        "meta struct<width:int, height:int, codec:string>",
    )


def test_extract_features_real(media):
    out = {
        r["id"]: r
        for r in extract_features(media, decode_stub=False).collect()
    }
    img = out[1]
    # BMP: [w, h, meanB, meanG, meanR, n_bytes, 0, 1]
    assert img["features"][:2] == [2.0, 2.0]
    np.testing.assert_allclose(img["features"][2:5], [100 / 255.0] * 3)
    assert img["features"][7] == 1.0
    snd = out[2]
    # WAV: [channels, rate, n, rms, mean, n_bytes, 0, 2]
    assert snd["features"][:3] == [1.0, 8000.0, 8.0]
    np.testing.assert_allclose(snd["features"][3:5], [0.5, 0.5])
    assert snd["features"][7] == 2.0


def test_extract_features_real_unsupported_raises(spark):
    df = spark.createDataFrame(
        [(1, "video/mp4", b"xx", (0, 0, "h264"))],
        "id long, media_type string, payload binary, "
        "meta struct<width:int, height:int, codec:string>",
    )
    with pytest.raises(Exception, match="no native decoder"):
        extract_features(df, decode_stub=False).collect()


def test_resize_real_nearest_neighbor(spark):
    # 2x2 checkerboard upscaled to 4x4: each source pixel becomes 2x2
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    px[0, 1] = px[1, 0] = 255
    df = spark.createDataFrame(
        [(1, "image/bmp", _bmp_bytes(px), (2, 2, "bmp"))],
        "id long, media_type string, payload binary, "
        "meta struct<width:int, height:int, codec:string>",
    )
    (row,) = resize_media(
        df, target_width=4, target_height=4, decode_stub=False
    ).collect()
    w, h, out = decode_bmp(bytes(row["payload"]))
    assert (w, h) == (4, 4) and (row["width"], row["height"]) == (4, 4)
    expect = px[np.arange(4) * 2 // 4][:, np.arange(4) * 2 // 4]
    np.testing.assert_array_equal(out, expect)


# --- PNG: stdlib decoder (zlib inflate + per-scanline unfilter) ---------


def _rand_px(h, w, ch, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(filter_type):
    from dragnet_spark.ops.multimodal import decode_png, encode_png

    px = _rand_px(5, 7, 3, seed=10 + filter_type)
    w, h, out = decode_png(encode_png(px, filter_type=filter_type))
    assert (w, h) == (7, 5)
    np.testing.assert_array_equal(out, px)


@pytest.mark.parametrize("ch", [1, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_channel_counts(ch, filter_type):
    from dragnet_spark.ops.multimodal import decode_png, encode_png

    px = _rand_px(4, 3, ch, seed=100 + ch * 10 + filter_type)
    _, _, out = decode_png(encode_png(px, filter_type=filter_type))
    np.testing.assert_array_equal(out, px)


def test_png_one_pixel_wide():
    # stride == bpp: the left-neighbor slice is empty on every row
    from dragnet_spark.ops.multimodal import decode_png, encode_png

    px = _rand_px(6, 1, 3, seed=3)
    for ft in range(5):
        _, _, out = decode_png(encode_png(px, filter_type=ft))
        np.testing.assert_array_equal(out, px)


def test_png_rejects_non_png_and_interlace():
    from dragnet_spark.ops.multimodal import decode_png

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BMnotapng")


def test_extract_features_real_png(spark):
    from dragnet_spark.ops.multimodal import encode_png, extract_features

    px = np.full((3, 4, 3), 51, dtype=np.uint8)  # 51/255 = 0.2
    png = encode_png(px, filter_type=4)
    df = spark.createDataFrame(
        [(7, "image/png", png, (4, 3, "png"))],
        "id long, media_type string, payload binary, "
        "meta struct<width:int, height:int, codec:string>",
    )
    (row,) = extract_features(df, decode_stub=False).collect()
    # PNG: [w, h, meanR, meanG, meanB, n_bytes, 0, 3]
    assert row["features"][:2] == [4.0, 3.0]
    np.testing.assert_allclose(row["features"][2:5], [0.2] * 3)
    assert row["features"][5] == float(len(png))
    assert row["features"][7] == 3.0


def test_extract_features_real_mixed_formats(spark):
    """BMP + WAV + PNG through one decode_stub=False pass."""
    from dragnet_spark.ops.multimodal import encode_png, extract_features

    rows = [
        (1, "image/bmp", _bmp_bytes(np.full((2, 2, 3), 100, np.uint8)), (2, 2, "bmp")),
        (2, "audio/wav", _wav_bytes([16384] * 8), (0, 0, "pcm")),
        (3, "image/png", encode_png(_rand_px(2, 2, 3, seed=9), filter_type=2), (2, 2, "png")),
    ]
    df = spark.createDataFrame(
        rows,
        "id long, media_type string, payload binary, "
        "meta struct<width:int, height:int, codec:string>",
    )
    out = {r["id"]: r["features"][7] for r in extract_features(df, decode_stub=False).collect()}
    assert out == {1: 1.0, 2: 2.0, 3: 3.0}  # each format hit its decoder


def test_resize_real_png(spark):
    from dragnet_spark.ops.multimodal import decode_png, encode_png, resize_media

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    px[0, 1] = px[1, 0] = 255
    df = spark.createDataFrame(
        [(1, "image/png", encode_png(px, filter_type=1), (2, 2, "png"))],
        "id long, media_type string, payload binary, "
        "meta struct<width:int, height:int, codec:string>",
    )
    (row,) = resize_media(df, target_width=4, target_height=4, decode_stub=False).collect()
    w, h, out = decode_png(bytes(row["payload"]))
    assert (w, h) == (4, 4)
    expect = px[np.arange(4) * 2 // 4][:, np.arange(4) * 2 // 4]
    np.testing.assert_array_equal(out, expect)


# ------------------------------------------------- header-only metadata probe


def _jpeg_header_bytes(w, h):
    """Minimal JPEG prefix: SOI, APP0 stub, SOF0 with dimensions."""
    import struct as _s

    app0 = b"\xff\xe0" + _s.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0"
        + _s.pack(">H", 11)
        + b"\x08"
        + _s.pack(">HH", h, w)
        + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_sniff_media_formats():
    import struct as _s

    from dragnet_spark.ops.multimodal import encode_png, sniff_media

    px = _rand_px(5, 7, 3, seed=3)
    assert sniff_media(encode_png(px))[:3] == ("png", 7, 5)
    assert sniff_media(_bmp_bytes(_rand_px(4, 6, 3, seed=4)))[:3] == ("bmp", 6, 4)
    assert sniff_media(_jpeg_header_bytes(640, 480))[:3] == ("jpeg", 640, 480)
    gif = b"GIF89a" + _s.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert sniff_media(gif)[:3] == ("gif", 320, 200)
    fmt, _, _, dur = sniff_media(_wav_bytes([0] * 8000, rate=8000))
    assert fmt == "wav" and dur == 1000  # 8000 frames at 8 kHz mono 16-bit
    mp4 = _s.pack(">I", 20) + b"ftypisom" + b"\x00" * 12
    assert sniff_media(mp4)[0] == "mp4"
    assert sniff_media(b"plain text payload")[0] == "unknown"
    assert sniff_media(b"")[0] == "unknown"
    # truncated headers must not raise
    assert sniff_media(b"\x89PNG\r\n\x1a\n" + b"IH")[0] == "unknown"
    assert sniff_media(b"\xff\xd8\xff\xc0\x00")[0] == "jpeg"


def test_probe_media_metadata(spark):
    from dragnet_spark.ops.multimodal import encode_png, probe_media_metadata

    png = bytes(encode_png(_rand_px(5, 7, 3, seed=5)))
    wav = _wav_bytes([100, -100] * 4000, rate=8000)
    rows = [
        (1, "image/png", png, None),
        (2, "audio/wav", wav, None),
        (3, "image/png", wav, None),  # mislabeled: wav bytes as png
        (4, "video/mp4", b"garbage", None),
    ]
    df = spark.createDataFrame(
        rows,
        "id long, media_type string, payload binary, "
        "meta struct<width:int, height:int, codec:string>",
    )
    out = {r["id"]: r for r in probe_media_metadata(df).collect()}
    assert out[1]["detected_format"] == "png"
    assert (out[1]["width"], out[1]["height"]) == (7, 5)
    assert out[1]["type_mismatch"] == 0
    assert out[2]["detected_format"] == "wav"
    assert out[2]["duration_ms"] == 1000
    assert out[2]["type_mismatch"] == 0
    assert out[3]["detected_format"] == "wav"
    assert out[3]["type_mismatch"] == 1
    assert out[4]["detected_format"] == "unknown"
    assert out[4]["type_mismatch"] == 1
    assert out[4]["n_bytes"] == 7


def _mp4_bytes(w=640, h=360, timescale=1000, duration=5500):
    """Minimal ISO-BMFF container: ftyp + moov(mvhd + trak(tkhd))."""
    import struct as _s

    def box(t, body):
        return _s.pack(">I", 8 + len(body)) + t + body

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isommp41")
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00" + b"\x00" * 8
        + _s.pack(">I", timescale) + _s.pack(">I", duration) + b"\x00" * 80,
    )
    # spec field layout: version/flags(4) + times/ids(20) +
    # layer/volume(16) + matrix(36) = 76 bytes before width (v0)
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07" + b"\x00" * 72
        + _s.pack(">II", w << 16, h << 16),
    )
    return ftyp + box(b"moov", mvhd + box(b"trak", tkhd))


def test_sniff_mp4_container_metadata():
    from dragnet_spark.ops.multimodal import sniff_media

    fmt, w, h, dur = sniff_media(_mp4_bytes(1280, 720, 600, 3600))
    assert (fmt, w, h, dur) == ("mp4", 1280, 720, 6000)
    # moov-less (streaming-style) file: format detected, no metadata
    import struct as _s

    bare = _s.pack(">I", 20) + b"ftypisom" + b"\x00" * 12
    assert sniff_media(bare) == ("mp4", None, None, None)
    # truncated moov must not raise
    trunc = _mp4_bytes()[:40]
    assert sniff_media(trunc)[0] == "mp4"


# ------------------------------------------------------------- Adam7 PNG


def _png_chunks(w, h, channels, interlace, raw):
    """Assemble a PNG from already-filtered raw scanline data."""
    import struct as _s
    import zlib

    ctype = {1: 0, 3: 2, 4: 6}[channels]

    def chunk(tag, body):
        c = tag + body
        return _s.pack(">I", len(body)) + c + _s.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    ihdr = _s.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_adam7_hand_computed_2x2():
    """2x2 RGB Adam7 stream assembled by hand from the spec's pass
    table (pass 1 holds (0,0), pass 6 holds (1,0), pass 7 holds the
    y=1 row; passes 2-5 are empty at this size), every scanline
    filter 0. Fully independent of the decoder's own geometry."""
    from dragnet_spark.ops.multimodal import decode_png

    p00, p10 = b"\x10\x20\x30", b"\x40\x50\x60"
    p01, p11 = b"\x70\x80\x90", b"\xa0\xb0\xc0"
    raw = (b"\x00" + p00) + (b"\x00" + p10) + (b"\x00" + p01 + p11)
    w, h, px = decode_png(_png_chunks(2, 2, 3, 1, raw))
    assert (w, h) == (2, 2)
    assert bytes(px[0, 0]) == p00 and bytes(px[0, 1]) == p10
    assert bytes(px[1, 0]) == p01 and bytes(px[1, 1]) == p11


@pytest.mark.parametrize("wh", [(9, 5), (3, 7), (16, 16), (1, 1), (8, 1)])
@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_adam7_roundtrip_geometry(wh, ch):
    """Adam7 streams built by a test-side pass splitter (spec pass
    table, filter 0) must decode to the original pixels for dims that
    cross every pass-boundary case, including empty passes."""
    from dragnet_spark.ops.multimodal import decode_png

    w, h = wh
    px = _rand_px(h, w, ch, seed=w * 100 + h * 10 + ch)
    if ch == 1:
        px = px.reshape(h, w, 1)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = px[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw += b"\x00" + row.tobytes()
    got_w, got_h, out = decode_png(_png_chunks(w, h, ch, 1, bytes(raw)))
    assert (got_w, got_h) == (w, h)
    assert (out.reshape(h, w, ch) == px).all()


# ------------------------------------------------------------------ GIF


def test_gif_hand_built_lzw():
    """2x2 GIF with a 4-color palette, LZW stream hand-packed from
    the spec (CLEAR emitted before every literal so every code is a
    fixed 3 bits — valid, and independent of the decoder's dictionary
    logic). Pixels must come back through the palette exactly."""
    import struct as _s

    from dragnet_spark.ops.multimodal import decode_gif

    palette = bytes(
        [255, 0, 0,  0, 255, 0,  0, 0, 255,  255, 255, 0]
    )
    # logical screen 2x2, GCT flag set, 4 entries (2<<1)
    hdr = b"GIF89a" + _s.pack("<HH", 2, 2) + bytes([0x81, 0, 0]) + palette
    img = b"\x2c" + _s.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
    # min code size 2: CLEAR=4, END=5, width 3. Stream:
    # CLEAR 0 CLEAR 1 CLEAR 2 CLEAR 3 END  (9 3-bit codes, LSB-first)
    codes = [4, 0, 4, 1, 4, 2, 4, 3, 5]
    acc = n = 0
    out = bytearray()
    for c in codes:
        acc |= c << n
        n += 3
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        out.append(acc & 0xFF)
    data = hdr + img + b"\x02" + bytes([len(out)]) + bytes(out) + b"\x00" + b"\x3b"
    w, h, px = decode_gif(data)
    assert (w, h) == (2, 2)
    assert bytes(px[0, 0]) == b"\xff\x00\x00"
    assert bytes(px[0, 1]) == b"\x00\xff\x00"
    assert bytes(px[1, 0]) == b"\x00\x00\xff"
    assert bytes(px[1, 1]) == b"\xff\xff\x00"


_REAL_GIFS = [
    "/usr/share/doc/libxslt1-dev/html/Libxslt-Logo-90x34.gif",
    "/usr/share/doc/libxslt1-dev/html/node.gif",
]


@pytest.mark.parametrize("path", _REAL_GIFS)
def test_gif_decodes_real_world(path):
    """Real GIFs (written by standard encoders, exercising the full
    LZW dictionary-growth path): dims must match the screen
    descriptor and the output must be plausible image data."""
    import os

    if not os.path.exists(path):
        pytest.skip("libxslt doc images not present")
    from dragnet_spark.ops.multimodal import decode_gif, sniff_media

    data = open(path, "rb").read()
    fmt, sw, sh, _ = sniff_media(data)
    assert fmt == "gif"
    w, h, px = decode_gif(data)
    assert (w, h) == (sw, sh) and px.shape == (h, w, 3)
    assert px.std() > 5  # real content


def test_gif_features_and_garbage(spark):
    from dragnet_spark.ops.multimodal import decode_gif, extract_features

    path = _REAL_GIFS[0]
    import os

    if not os.path.exists(path):
        pytest.skip("libxslt doc images not present")
    payload = open(path, "rb").read()
    df = spark.createDataFrame(
        [(1, "image/gif", payload, None)],
        "id long, media_type string, payload binary, "
        "meta struct<width:int, height:int, codec:string>",
    )
    feats = extract_features(df, decode_stub=False).collect()[0]
    assert feats["features"][0] == 90.0 and feats["features"][1] == 34.0
    assert feats["features"][7] == 5.0  # gif tag
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"nope")
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a\x01")


def test_all_decoders_normalize_errors_under_corruption():
    """Every decoder keeps the one-except-clause contract: corrupted
    or truncated input either decodes or raises ValueError — never a
    leaked zlib.error/struct.error/wave.Error/KeyError. Seeded."""
    import random

    from dragnet_spark.ops.jpeg import encode_jpeg
    from dragnet_spark.ops.multimodal import (
        decode_bmp, decode_gif, decode_png, decode_wav, encode_png,
    )

    px = _rand_px(9, 11, 3, seed=1)
    gif = open("/usr/share/doc/libxslt1-dev/html/node.gif", "rb").read() \
        if __import__("os").path.exists(
            "/usr/share/doc/libxslt1-dev/html/node.gif") else None
    corpora = [
        (decode_png, bytearray(encode_png(px))),
        (decode_bmp, bytearray(_bmp_bytes(px))),
        (decode_wav, bytearray(_wav_bytes([100, -100] * 500))),
    ]
    if gif:
        corpora.append((decode_gif, bytearray(gif)))
    rng = random.Random(7)
    for fn, base in corpora:
        for _ in range(40):
            data = bytearray(base)
            for _ in range(rng.randint(1, 3)):
                data[rng.randrange(len(data))] = rng.randrange(256)
            try:
                fn(bytes(data))
            except ValueError:
                pass
        for cut in (0, 1, 5, 12, len(base) // 2):
            try:
                fn(bytes(base[:cut]))
            except ValueError:
                pass


# ------------------------------------------------------------- audio resample


def test_resample_wav_preserves_pitch():
    """440 Hz sine survives 8k→16k and 8k→4k conversion with its FFT
    peak intact — the correctness property of rate conversion."""
    import numpy as np

    from dragnet_spark.ops.multimodal import (
        decode_wav, encode_wav, resample_wav,
    )

    t = np.arange(8000) / 8000.0
    x = np.sin(2 * np.pi * 440 * t) * 0.8
    wav = encode_wav(x, 8000)
    for target in (16000, 4000):
        nch, rate, y = decode_wav(resample_wav(wav, target))
        assert (nch, rate, len(y)) == (1, target, target)
        freqs = np.fft.rfftfreq(len(y), 1 / rate)
        peak = freqs[np.argmax(np.abs(np.fft.rfft(y)))]
        assert abs(peak - 440.0) < 2.0


def test_resample_audio_spark(spark):
    import numpy as np

    from dragnet_spark.ops.multimodal import (
        decode_wav, encode_wav, resample_audio,
    )

    t = np.arange(4000) / 8000.0
    wav = encode_wav(np.sin(2 * np.pi * 220 * t), 8000)
    df = spark.createDataFrame(
        [(1, "audio/wav", wav, None), (2, "image/png", b"x", None)],
        "id long, media_type string, payload binary, "
        "meta struct<width:int, height:int, codec:string>",
    )
    rows = resample_audio(df, 16000, decode_stub=False).collect()
    assert [r["id"] for r in rows] == [1]  # non-audio rows filtered
    r = rows[0]
    assert r["sample_rate"] == 16000 and r["n_frames"] == 8000
    nch, rate, y = decode_wav(bytes(r["payload"]))
    assert rate == 16000 and len(y) == 8000


def test_gif_encode_roundtrip_and_resize(spark):
    """encode_gif -> decode_gif is exact for palette-limited images;
    the real resize path re-encodes GIF losslessly (nearest-neighbor
    keeps the palette a subset)."""
    import numpy as np

    from dragnet_spark.ops.multimodal import (
        decode_gif, encode_gif, resize_media,
    )

    rng = np.random.RandomState(5)
    px = (rng.randint(0, 5, (12, 16, 3)) * 50).astype(np.uint8)
    w, h, out = decode_gif(encode_gif(px))
    assert (w, h) == (16, 12) and (out == px).all()
    df = spark.createDataFrame(
        [(1, "image/gif", encode_gif(px), (16, 12, "gif"))],
        "id long, media_type string, payload binary, "
        "meta struct<width:int, height:int, codec:string>",
    )
    r = resize_media(df, 8, 6, decode_stub=False).collect()[0]
    w2, h2, out2 = decode_gif(bytes(r["payload"]))
    assert (w2, h2) == (8, 6)
    ys = np.arange(6) * 12 // 6
    xs = np.arange(8) * 16 // 8
    assert (out2 == px[ys][:, xs]).all()


# ------------------------------------------- ADVICE r4 regression nets


def test_sniff_mp4_tkhd_v1_layout():
    """tkhd v1 (64-bit times) puts width at payload offset 88; the
    walker must also bounds-check so a truncated tkhd yields no dims
    without losing the already-parsed mvhd duration."""
    import struct as _s

    from dragnet_spark.ops.multimodal import sniff_media

    def box(t, body):
        return _s.pack(">I", 8 + len(body)) + t + body

    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00" + b"\x00" * 8
        + _s.pack(">I", 500) + _s.pack(">I", 1500) + b"\x00" * 80,
    )
    # v1 payload: vf(4) + 8+8+4+4+8 times/ids (32) + 16 + matrix 36 = 88
    tkhd_v1 = box(
        b"tkhd",
        b"\x01\x00\x00\x07" + b"\x00" * 84
        + _s.pack(">II", 320 << 16, 240 << 16),
    )
    data = box(b"ftyp", b"isom") + box(b"moov", mvhd + box(b"trak", tkhd_v1))
    assert sniff_media(data) == ("mp4", 320, 240, 3000)
    # truncated tkhd body: dims None but mvhd duration preserved
    tkhd_short = box(b"tkhd", b"\x00\x00\x00\x07" + b"\x00" * 40)
    data2 = box(b"ftyp", b"isom") + box(
        b"moov", mvhd + box(b"trak", tkhd_short)
    )
    assert sniff_media(data2) == ("mp4", None, None, 3000)


def test_gif_local_table_background_and_transparency():
    """Frame smaller than the logical screen, LOCAL color table, GCE
    transparency: background pixels must map through the GLOBAL table
    and transparent frame pixels stay background."""
    import struct as _s

    import numpy as np

    from dragnet_spark.ops.multimodal import decode_gif

    # logical screen 4x2, global table [black, red], bg index 1
    out = bytearray(b"GIF89a")
    out += _s.pack("<HH", 4, 2)
    out += bytes([0x80 | 0, 1, 0])  # gct present, 2 entries, bg=1
    out += bytes([0, 0, 0, 255, 0, 0])
    # GCE: transparency on, transparent index 0
    out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, 0, 0])
    # image descriptor: 2x1 at (1,0), LOCAL table [green, blue]
    out += b"\x2c" + _s.pack("<HHHH", 1, 0, 2, 1) + bytes([0x80 | 0])
    out += bytes([0, 255, 0, 0, 0, 255])
    # LZW min_code=2: clear,0,clear,1,end at width 3
    acc = n = 0
    stream = bytearray()
    for code in (4, 0, 4, 1, 5):
        acc |= code << n
        n += 3
        while n >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        stream.append(acc & 0xFF)
    out += bytes([2, len(stream)]) + stream + b"\x00\x3b"
    w, h, px = decode_gif(bytes(out))
    assert (w, h) == (4, 2)
    red, blue = [255, 0, 0], [0, 0, 255]
    expect = np.array([[red, red, blue, red], [red, red, red, red]])
    assert (px == expect).all()


def test_jpeg_skip_rst_consumes_fill_bytes():
    """B.1.1.2 fill bytes (runs of 0xFF) before an RSTn marker must be
    skipped; a non-RST marker must be left unconsumed."""
    from dragnet_spark.ops.jpeg import _Bits

    br = _Bits(b"\xff\xff\xff\xd0\x12", 0)
    br.skip_rst()
    assert br.i == 4  # fill bytes + marker consumed
    br2 = _Bits(b"\xff\xff\xd9", 0)
    pos = br2.i
    br2.skip_rst()
    assert br2.i == pos  # EOI: not an RST, untouched


def test_injected_video_decoder_hook(spark):
    """decoders={media_type: fn} plugs an external codec (e.g. ffmpeg)
    in without touching engine code: the injected path feeds
    extract_features; the absent path still raises cleanly; a crashing
    injected decoder is normalized into the on_error boundary."""
    import numpy as np

    from dragnet_spark.ops.multimodal import extract_features

    frame = np.full((4, 6, 3), 128, dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, "video/mp4", b"fake-container-bytes", None)],
        "id long, media_type string, payload binary, "
        "meta struct<width:int, height:int, codec:string>",
    )
    (row,) = extract_features(
        df, decode_stub=False, decoders={"video/mp4": lambda p: frame}
    ).collect()
    # injected frame: [w, h, mean RGB, n_bytes, 0, 6]
    assert row["features"][:2] == [6.0, 4.0]
    np.testing.assert_allclose(row["features"][2:5], [128 / 255.0] * 3)
    assert row["features"][5] == 20.0
    assert row["features"][7] == 6.0
    # no hook -> the declared boundary still raises cleanly
    with pytest.raises(Exception, match="no native decoder"):
        extract_features(df, decode_stub=False).collect()
    # crashing injected codec under on_error="skip": record dropped
    def boom(p):
        raise RuntimeError("codec crash")

    assert (
        extract_features(
            df, decode_stub=False, on_error="skip", decoders={"video/mp4": boom}
        ).count()
        == 0
    )
    # native formats are NOT overridden by the hook
    from dragnet_spark.ops.multimodal import encode_bmp

    bmp = encode_bmp(np.full((2, 2, 3), 10, dtype=np.uint8))
    df2 = spark.createDataFrame(
        [(2, "image/bmp", bmp, None)],
        "id long, media_type string, payload binary, "
        "meta struct<width:int, height:int, codec:string>",
    )
    (r2,) = extract_features(
        df2, decode_stub=False,
        decoders={"image/bmp": lambda p: frame},  # must be ignored
    ).collect()
    assert r2["features"][7] == 1.0  # native BMP format code, not 6


# ------------------------------------------- perceptual hash + spectral


def test_dhash_invariances():
    """dHash must be identical under re-encode, global brightness
    shift, and nearest upscale — and far for unrelated images."""
    from dragnet_spark.ops.multimodal import (
        dhash64_from_array, decode_png, encode_png,
    )

    rng = np.random.RandomState(3)
    px = rng.randint(0, 200, (16, 16, 3), dtype=np.uint8)
    h1 = dhash64_from_array(px)
    assert dhash64_from_array(decode_png(encode_png(px))[2]) == h1
    assert dhash64_from_array((px.astype(int) + 30).astype(np.uint8)) == h1
    assert dhash64_from_array(px.repeat(3, 0).repeat(3, 1)) == h1
    other = rng.randint(0, 200, (16, 16, 3), dtype=np.uint8)
    ham = bin((h1 ^ dhash64_from_array(other)) & (2**64 - 1)).count("1")
    assert ham > 10


def test_perceptual_hash_groups_twins(spark):
    """Brightness twins (different bytes!) must land in one dHash
    bucket through the Spark mapInPandas path; BMP and PNG encodings
    of the SAME pixels must too (format-independence)."""
    from dragnet_spark.ops.multimodal import (
        encode_bmp, encode_png, perceptual_hash,
    )

    rng = np.random.RandomState(9)
    px = rng.randint(0, 200, (12, 12, 3), dtype=np.uint8)
    twin = (px.astype(int) + 25).astype(np.uint8)
    rows = [
        (1, "image/png", encode_png(px), None),
        (2, "image/png", encode_png(twin), None),
        (3, "image/bmp", encode_bmp(px), None),
        (4, "audio/wav", _wav_bytes([0] * 100), None),  # non-image: NULL
    ]
    df = spark.createDataFrame(
        rows,
        "id long, media_type string, payload binary, "
        "meta struct<width:int, height:int, codec:string>",
    )
    got = {r["id"]: r["dhash"] for r in perceptual_hash(df, decode_stub=False).collect()}
    assert got[1] == got[2] == got[3]
    assert got[4] is None


def test_audio_spectral_stats_pure_tone(spark):
    """A pure 1 kHz sine at 8 kHz: centroid and rolloff land on the
    tone, zcr = 2f/rate, rms = amplitude/sqrt(2)."""
    from dragnet_spark.ops.multimodal import audio_spectral_stats

    rate, f, n = 8000, 1000, 8000
    t = np.arange(n) / rate
    samples = (0.5 * np.sin(2 * np.pi * f * t) * 32767).astype("<i2")
    df = spark.createDataFrame(
        [(1, "audio/wav", _wav_bytes(samples, rate=rate), None),
         (2, "image/png", b"notaudio", None)],
        "id long, media_type string, payload binary, "
        "meta struct<width:int, height:int, codec:string>",
    )
    rows = audio_spectral_stats(df).collect()
    assert len(rows) == 1  # non-audio filtered before decode
    r = rows[0]
    assert r["sample_rate"] == 8000 and r["n_samples"] == 8000
    assert abs(r["spectral_centroid_hz"] - 1000) < 20
    assert abs(r["spectral_rolloff_hz"] - 1000) < 5
    assert abs(r["zero_cross_rate"] - 2 * f / rate) < 0.01
    assert abs(r["rms"] - 0.5 / np.sqrt(2)) < 0.01


# ---------------------------------------------------------------- AVI/MJPEG


def _gradient_frames(n=3, w=24, h=16):
    i = np.arange(h)[:, None, None]
    j = np.arange(w)[None, :, None]
    return [
        ((i * 5 + j * 3 + k * 17) % 240).astype(np.uint8)
        .repeat(3, axis=2) for k in range(n)
    ]


def test_avi_mjpeg_roundtrip_gradient():
    from dragnet_spark.ops.avi import (
        avi_metadata,
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    frames = _gradient_frames(4)
    data = encode_avi_mjpeg(frames, fps=25.0)
    assert avi_metadata(data) == (24, 16, 4, 25.0)
    w, h, fps, out = decode_avi_mjpeg(data)
    assert (w, h, fps) == (24, 16, 25.0)
    assert [i for i, _ in out] == [0, 1, 2, 3]
    for (_, got), want in zip(out, frames):
        assert got.shape == want.shape
        # q90 JPEG on smooth gradients: small bounded error
        assert np.abs(got.astype(int) - want.astype(int)).mean() < 4


def test_avi_frame_sampling_skips_entropy_decode():
    from dragnet_spark.ops.avi import decode_avi_mjpeg, encode_avi_mjpeg

    data = encode_avi_mjpeg(_gradient_frames(7), fps=10)
    _, _, _, out = decode_avi_mjpeg(data, every_n=3)
    assert [i for i, _ in out] == [0, 3, 6]
    _, _, _, out = decode_avi_mjpeg(data, every_n=2, max_frames=2)
    assert [i for i, _ in out] == [0, 2]


def test_avi_tolerates_junk_and_rec_groupings():
    """Real-world AVIs carry JUNK padding chunks and group frames
    inside LIST 'rec ' — the walker must see through both."""
    import struct

    from dragnet_spark.ops.avi import decode_avi_mjpeg, encode_avi_mjpeg
    from dragnet_spark.ops.jpeg import encode_jpeg

    frames = _gradient_frames(2)
    base = encode_avi_mjpeg(frames, fps=10)

    def chunk(fourcc, body):
        return fourcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    j0, j1 = (encode_jpeg(f) for f in frames)
    movi_body = (
        b"movi"
        + chunk(b"JUNK", b"\x00" * 13)
        + chunk(b"LIST", b"rec " + chunk(b"00dc", j0))
        + chunk(b"01dc", j1)  # second stream number still video
    )
    # splice: reuse base's hdrl, rebuild movi with the exotic layout
    hdrl_end = base.index(b"LIST", 12)
    hdrl_len = struct.unpack("<I", base[hdrl_end + 4 : hdrl_end + 8])[0]
    hdrl = base[hdrl_end : hdrl_end + 8 + hdrl_len]
    body = hdrl + chunk(b"LIST", movi_body)
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
    _, _, _, out = decode_avi_mjpeg(data)
    assert len(out) == 2


def test_avi_error_contract():
    from dragnet_spark.ops.avi import (
        avi_metadata,
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    with pytest.raises(ValueError, match="RIFF"):
        avi_metadata(b"not an avi at all")
    data = encode_avi_mjpeg(_gradient_frames(2))
    with pytest.raises(ValueError):
        decode_avi_mjpeg(data[:60])  # torn chunk tree
    with pytest.raises(ValueError):
        decode_avi_mjpeg(data, every_n=0)
    with pytest.raises(ValueError):
        encode_avi_mjpeg([])
    with pytest.raises(ValueError, match="dimensions"):
        encode_avi_mjpeg([np.zeros((8, 8, 3), np.uint8),
                          np.zeros((9, 8, 3), np.uint8)])


def test_sniff_media_detects_avi():
    from dragnet_spark.ops.avi import encode_avi_mjpeg
    from dragnet_spark.ops.multimodal import sniff_media

    data = encode_avi_mjpeg(_gradient_frames(5), fps=10)
    assert sniff_media(data) == ("avi", 24, 16, 500)


def test_decode_video_frames_spark(spark):
    """End-to-end through the real op: AVI payloads in a DataFrame →
    per-frame rows with decoded dims and channel means; corrupt
    records honor on_error."""
    from dragnet_spark.ops.avi import encode_avi_mjpeg
    from dragnet_spark.ops.multimodal import decode_video_frames

    good = encode_avi_mjpeg(
        [np.full((8, 8, 3), 100, np.uint8),
         np.full((8, 8, 3), 200, np.uint8)], fps=10,
    )
    rows = [
        (1, "video/x-msvideo", bytearray(good)),
        (2, "video/x-msvideo", bytearray(b"RIFFgarbage!")),
        (3, "image/png", bytearray(b"ignored: not video")),
    ]
    media = spark.createDataFrame(
        rows, "id long, media_type string, payload binary"
    )
    out = decode_video_frames(
        media.filter("id = 1")
    ).orderBy("frame_index").collect()
    assert [(r["frame_index"], r["width"], r["height"]) for r in out] == [
        (0, 8, 8), (1, 8, 8)
    ]
    assert [r["mean_r"] for r in out] == [100.0, 200.0]

    with pytest.raises(Exception, match="AVI|ValueError"):
        decode_video_frames(media).collect()
    nulled = decode_video_frames(media, on_error="null").collect()
    assert sorted(r["id"] for r in nulled) == [1, 1, 2]
    assert [r["frame_index"] for r in nulled if r["id"] == 2] == [None]
    skipped = decode_video_frames(media, on_error="skip").collect()
    assert sorted(r["id"] for r in skipped) == [1, 1]


def test_extract_features_real_avi(spark):
    """The NotImplementedError video boundary is gone for MJPEG-AVI:
    the native feature path decodes real frames (kind tag 7.0)."""
    from dragnet_spark.ops.avi import encode_avi_mjpeg
    from dragnet_spark.ops.multimodal import extract_features

    data = encode_avi_mjpeg(
        [np.full((8, 8, 3), 51, np.uint8),
         np.full((8, 8, 3), 153, np.uint8)], fps=10,
    )
    media = spark.createDataFrame(
        [(7, "video/x-msvideo", bytearray(data))],
        "id long, media_type string, payload binary",
    )
    f = extract_features(media, decode_stub=False).first()
    w, h, luma, n_frames, fps, n_bytes = f["features"][:6]
    assert (w, h, n_frames, fps) == (8.0, 8.0, 2.0, 10.0)
    assert abs(luma - (51 + 153) / 2 / 255.0) < 1e-9
    assert f["features"][7] == 7.0
