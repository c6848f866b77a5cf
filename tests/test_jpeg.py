"""Baseline JPEG codec (ops/jpeg) — roundtrips, real-world files,
and the Spark multimodal wiring."""

import os

import numpy as np
import pytest

from dragnet_spark.ops.jpeg import decode_jpeg, encode_jpeg


def _psnr(a, b):
    mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [np.clip(xx * 3, 0, 255), np.clip(yy * 4, 0, 255),
         np.clip(255 - (xx + yy) * 2, 0, 255)],
        axis=-1,
    ).astype(np.uint8)


def test_jpeg_roundtrip_smooth_rgb():
    img = _gradient(40, 56)
    w, h, dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert (w, h) == (56, 40) and dec.shape == (40, 56, 3)
    assert _psnr(img, dec) > 40


def test_jpeg_roundtrip_flat_is_exact():
    flat = np.full((16, 24, 3), 77, dtype=np.uint8)
    _, _, dec = decode_jpeg(encode_jpeg(flat, 90))
    assert _psnr(flat, dec) > 50


def test_jpeg_roundtrip_grayscale():
    g = np.clip(np.mgrid[0:33, 0:41][0] * 6, 0, 255).astype(np.uint8)
    w, h, dec = decode_jpeg(encode_jpeg(g, 92))
    assert (w, h) == (41, 33) and dec.shape == (33, 41)
    assert _psnr(g, dec) > 40


def test_jpeg_roundtrip_noise_bounded_by_quantization():
    rng = np.random.RandomState(7)
    noise = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    _, _, dec = decode_jpeg(encode_jpeg(noise, 95))
    assert _psnr(noise, dec) > 30  # worst-case content, still bounded


def test_jpeg_odd_dimensions():
    img = _gradient(37, 29)
    w, h, dec = decode_jpeg(encode_jpeg(img, 90))
    assert (w, h) == (29, 37) and dec.shape == (37, 29, 3)


def test_jpeg_rejects_lossless_and_garbage():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"nope")
    # hand-built SOF3 (lossless) header — out of scope, clear error
    import struct

    data = (
        b"\xff\xd8"
        + b"\xff\xc3"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", 8, 8)
        + b"\x01\x01\x11\x00"
    )
    with pytest.raises(ValueError, match="JPEG supported"):
        decode_jpeg(data)


_REAL_420 = [
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/multi-channel/chr30.4.184.jpg",
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/DP802813.jpg",
]


@pytest.mark.parametrize("path", _REAL_420)
def test_jpeg_decodes_real_world_420(path):
    """Real camera/web JPEGs (4:2:0 subsampled, written by libjpeg,
    shipped with the Spark distribution) — dims must match the SOF
    header and the output must be plausible image data, which also
    exercises the subsampled-MCU + upsampling path our own encoder
    never produces."""
    if not os.path.exists(path):
        pytest.skip("spark sample images not present")
    from dragnet_spark.ops.multimodal import sniff_media

    data = open(path, "rb").read()
    fmt, sw, sh, _ = sniff_media(data)
    assert fmt == "jpeg"
    w, h, px = decode_jpeg(data)
    assert (w, h) == (sw, sh)
    assert px.shape == (h, w, 3)
    assert 5 < px.mean() < 250  # not black/white garbage
    assert px.std() > 5  # real image content, not a constant


def test_jpeg_spark_features_and_resize(spark):
    from dragnet_spark.ops.multimodal import extract_features, resize_media

    img = _gradient(24, 32)
    payload = encode_jpeg(img, 90)
    df = spark.createDataFrame(
        [(1, "image/jpeg", payload, (32, 24, "jpeg"))],
        "id long, media_type string, payload binary, "
        "meta struct<width:int, height:int, codec:string>",
    )
    feats = extract_features(df, decode_stub=False).collect()[0]
    assert feats["features"][0] == 32.0 and feats["features"][1] == 24.0
    assert feats["features"][7] == 4.0  # jpeg tag
    out = resize_media(df, 8, 6, decode_stub=False).collect()[0]
    assert (out["width"], out["height"]) == (8, 6)
    w2, h2, px2 = decode_jpeg(bytes(out["payload"]))
    assert (w2, h2) == (8, 6) and px2.shape == (6, 8, 3)


# ---------------------------------------------------------------- progressive


_PROGRESSIVE_REAL = [
    "/usr/share/doc/nodejs/full-white-stripe.jpg",
    "/usr/share/doc/nodejs/thin-white-stripe.jpg",
]


@pytest.mark.parametrize("path", _PROGRESSIVE_REAL)
def test_jpeg_decodes_real_progressive(path):
    """Real progressive JPEGs with known content: the 'white stripe'
    images must decode to mostly-white pixels with the SOF dims."""
    if not os.path.exists(path):
        pytest.skip("nodejs doc images not present")
    from dragnet_spark.ops.multimodal import sniff_media

    data = open(path, "rb").read()
    fmt, sw, sh, _ = sniff_media(data)
    assert fmt == "jpeg"
    w, h, px = decode_jpeg(data)
    assert (w, h) == (sw, sh) and px.shape == (h, w, 3)
    assert px.mean() > 200  # the image is, in fact, a white stripe


def test_jpeg_progressive_successive_approximation_exact():
    """Hand-assembled 8x8 grayscale progressive stream with all four
    scan kinds (DC first al=1, DC refine, AC first al=1 + EOB, AC
    refine correction bit). With an all-ones quant table the decoded
    block must equal IDCT of the hand-chosen coefficients exactly:
    DC first sets 6<<1=12, its refine bit makes 13; AC[k=1] first
    sets 3<<1=6, its refine correction makes 7."""
    import struct

    import numpy as np

    from dragnet_spark.ops.jpeg import (
        AC_LUM, DC_LUM, ZIGZAG, _BitWriter, _canonical_codes, _T,
    )

    dc = _canonical_codes(*DC_LUM)
    ac = _canonical_codes(*AC_LUM)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes((1, 0x11, 0))
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    body = b"\x00" + bytes(DC_LUM[0]) + bytes(DC_LUM[1])
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    body = b"\x10" + bytes(AC_LUM[0]) + bytes(AC_LUM[1])
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    def scan(ss, se, ah, al, payload: bytes):
        nonlocal out
        sos = bytes((1, 1, 0x00, ss, se, (ah << 4) | al))
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += payload

    # scan 1: DC first, al=1, diff=6 (category 3, bits '110')
    bw = _BitWriter()
    code, ln = dc[3]
    bw.put(code, ln)
    bw.put(0b110, 3)
    bw.flush()
    scan(0, 0, 0, 1, bytes(bw.out))
    # scan 2: DC refine — one raw bit, set
    bw = _BitWriter()
    bw.put(1, 1)
    bw.flush()
    scan(0, 0, 1, 0, bytes(bw.out))
    # scan 3: AC first, al=1 — (run 0, size 2) value 3 at k=1, then EOB
    bw = _BitWriter()
    code, ln = ac[0x02]
    bw.put(code, ln)
    bw.put(0b11, 2)
    code, ln = ac[0x00]
    bw.put(code, ln)
    bw.flush()
    scan(1, 63, 0, 1, bytes(bw.out))
    # scan 4: AC refine — EOB1 then the correction bit for AC[1]
    bw = _BitWriter()
    code, ln = ac[0x00]
    bw.put(code, ln)
    bw.put(1, 1)  # correction: 6 -> 7
    bw.flush()
    scan(1, 63, 1, 0, bytes(bw.out))
    out += b"\xff\xd9"

    w, h, px = decode_jpeg(bytes(out))
    assert (w, h) == (8, 8)
    want = np.zeros((8, 8))
    want[0, 0] = 13.0
    pos = int(ZIGZAG[1])
    want[pos // 8, pos % 8] = 7.0
    expect = np.clip(np.round(_T.T @ want @ _T + 128.0), 0, 255)
    assert np.array_equal(px.astype(float), expect)


def test_jpeg_corruption_fuzz_raises_only_valueerror():
    """Corpus-robustness contract: byte-corrupted JPEGs either decode
    (damage in entropy data often still parses) or raise ValueError —
    never KeyError/IndexError/struct.error leaking out of the
    internals. Seeded positions, deterministic."""
    import random

    base = bytearray(encode_jpeg(_gradient(24, 24), 90))
    rng = random.Random(42)
    for _ in range(60):
        data = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            pos = rng.randrange(2, len(data))
            data[pos] = rng.randrange(256)
        try:
            w, h, px = decode_jpeg(bytes(data))
            assert px.shape[0] > 0
        except ValueError:
            pass
    # truncations at every interesting boundary
    for cut in (1, 2, 3, 10, 20, 50, len(base) // 2, len(base) - 2):
        try:
            decode_jpeg(bytes(base[:cut]))
        except ValueError:
            pass


def test_extract_features_on_error_modes(spark):
    from dragnet_spark.ops.multimodal import extract_features

    good = encode_jpeg(_gradient(16, 16), 90)
    rows = [
        (1, "image/jpeg", bytes(good), None),
        (2, "image/jpeg", b"\xff\xd8garbage", None),  # corrupt
        (3, "video/mp4", b"\x00\x00\x00\x14ftypisom", None),  # no codec
    ]
    df = spark.createDataFrame(
        rows,
        "id long, media_type string, payload binary, "
        "meta struct<width:int, height:int, codec:string>",
    )
    skipped = extract_features(df, decode_stub=False, on_error="skip")
    assert [r["id"] for r in skipped.collect()] == [1]
    nulled = {r["id"]: r["features"]
              for r in extract_features(df, decode_stub=False,
                                        on_error="null").collect()}
    assert set(nulled) == {1, 2, 3}
    assert nulled[1] is not None and nulled[2] is None and nulled[3] is None
    with pytest.raises(Exception):
        extract_features(df, decode_stub=False).collect()


def test_jpeg_progressive_ac_refine_zrl_and_corrections():
    """AC refinement with every successive-approximation construct,
    derived by hand from spec G.2 / libjpeg's decode_mcu_AC_refine:

    AC-first scan (al=1) plants k=3:+2, k=5:-2. The refine scan
    (ah=1, al=0) then sends
      (r=2,s=1)+sign1 — advance over two zero-history positions,
        append a correction bit (1) to the existing k=3 (+2 -> +3),
        and place the new +1 at k=4;
      ZRL (r=15,s=0) — skip 16 zero-history positions, appending a
        correction bit (0) to the existing k=5 on the way (-2 stays);
      EOB — band of zeros to k=63.
    Final coefficients must be exactly k=3:+3, k=4:+1, k=5:-2."""
    import struct

    import numpy as np

    from dragnet_spark.ops.jpeg import (
        AC_LUM, DC_LUM, ZIGZAG, _BitWriter, _canonical_codes, _T,
    )

    ac = _canonical_codes(*AC_LUM)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes((1, 0x11, 0))
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    body = b"\x00" + bytes(DC_LUM[0]) + bytes(DC_LUM[1])
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    body = b"\x10" + bytes(AC_LUM[0]) + bytes(AC_LUM[1])
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    def scan(ss, se, ah, al, payload):
        nonlocal out
        sos = bytes((1, 1, 0x00, ss, se, (ah << 4) | al))
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += payload

    # AC first (al=1): (run 2, size 1) val 1 -> k=3 gets 1<<1 = 2;
    # (run 1, size 1) val -1 (bit 0) -> k=5 gets -1<<1 = -2; EOB
    bw = _BitWriter()
    c, ln = ac[0x21]
    bw.put(c, ln)
    bw.put(1, 1)
    c, ln = ac[0x11]
    bw.put(c, ln)
    bw.put(0, 1)
    c, ln = ac[0x00]
    bw.put(c, ln)
    bw.flush()
    scan(1, 63, 0, 1, bytes(bw.out))
    # AC refine (ah=1, al=0)
    bw = _BitWriter()
    c, ln = ac[0x21]  # r=2, s=1
    bw.put(c, ln)
    bw.put(1, 1)  # new coefficient is +1
    bw.put(1, 1)  # correction bit for existing k=3: +2 -> +3
    c, ln = ac[0xF0]  # ZRL
    bw.put(c, ln)
    bw.put(0, 1)  # correction bit for existing k=5: unchanged
    c, ln = ac[0x00]  # EOB
    bw.put(c, ln)
    bw.flush()
    scan(1, 63, 1, 0, bytes(bw.out))
    out += b"\xff\xd9"

    w, h, px = decode_jpeg(bytes(out))
    want = np.zeros(64)
    want[ZIGZAG[3]] = 3.0
    want[ZIGZAG[4]] = 1.0
    want[ZIGZAG[5]] = -2.0
    expect = np.clip(
        np.round(_T.T @ want.reshape(8, 8) @ _T + 128.0), 0, 255
    )
    assert np.array_equal(px.astype(float), expect)


def test_batched_block_math_matches_per_block_reference():
    """The stacked DCT/IDCT (one matmul over every block of a plane,
    r14) must reproduce the per-block expressions through the codec's
    actual discretization: identical int64 quantized coefficients on
    the encode side, identical clip(round())-rounded uint8 pixels on
    the decode side.

    NOT asserted: bitwise equality of the raw float64 products. On the
    host this test was written on the two forms happened to be
    bit-identical; a later host (OpenBLAS DYNAMIC_ARCH picking AVX512
    kernels) computes the stacked (3D) matmul and the per-block 2D
    dgemm with different accumulation orders, diverging by a few ulps
    (~3e-14 at pixel magnitude). The codec's contract is over the
    discretized values — an ulp can only flip them at an exact .5
    boundary, so the rounded comparison here stays exact while a raw
    float comparison encodes a BLAS-kernel accident. The bound below
    (1e-9, ~5 decimal digits of slack vs the observed 6e-14) fails
    loudly if a real math change sneaks in."""
    import numpy as np

    from dragnet_spark.ops.jpeg import QUANT_LUM, ZIGZAG, _T, _UNZIGZAG
    from dragnet_spark.ops.jpeg import _scaled_quant

    rng = np.random.RandomState(7)
    pp = (rng.rand(24, 32) * 255.0).round()  # 12 blocks
    qz = _scaled_quant(QUANT_LUM, 85).reshape(64)[ZIGZAG]
    nby, nbx = 3, 4
    blocks = pp.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    # encoder: batched forward DCT + quantize
    coef = _T @ (blocks - 128.0) @ _T.T
    zz_batch = np.round(coef.reshape(-1, 64)[:, ZIGZAG] / qz).astype(np.int64)
    for b in range(nby * nbx):
        ref = _T @ (blocks[b] - 128.0) @ _T.T
        assert np.abs(coef[b] - ref).max() < 1e-9
        zz_ref = np.round(ref.reshape(64)[ZIGZAG] / qz).astype(np.int64)
        assert (zz_batch[b] == zz_ref).all()
    # decoder: batched dequant + un-zigzag + IDCT, compared through the
    # decoder's exact output rounding (_decode_scan callers emit
    # clip(round(px), 0, 255) uint8)
    deq = zz_batch.astype(np.float64) * qz
    sq = deq[:, _UNZIGZAG].reshape(-1, 8, 8)
    px_batch = _T.T @ sq @ _T + 128.0
    for b in range(nby * nbx):
        d = zz_batch[b].astype(np.float64) * qz
        px_ref = _T.T @ d[_UNZIGZAG].reshape(8, 8) @ _T + 128.0
        assert np.abs(px_batch[b] - px_ref).max() < 1e-9
        assert np.array_equal(
            np.clip(np.round(px_batch[b]), 0, 255).astype(np.uint8),
            np.clip(np.round(px_ref), 0, 255).astype(np.uint8),
        )


def test_vectorized_entropy_emission_matches_bitwriter_reference():
    """The vectorized Huffman emitter (r14: one numpy pass per scan —
    symbol streams derived with array ops, interleaved by sort key,
    bit-packed + 0xFF-stuffed vectorized) must produce the EXACT bytes
    of the retired per-symbol loop (_encode_block over _BitWriter,
    kept as the reference). Exercises DC-only blocks (flat), dense AC
    (checkerboard -> ZRL runs), odd dimensions (edge-replicated
    padding), grayscale and RGB interleaving, and the 1-bit flush pad
    + final-byte stuffing."""
    import numpy as np

    from dragnet_spark.ops.jpeg import (
        AC_CHROM, AC_LUM, DC_CHROM, DC_LUM, QUANT_CHROM, QUANT_LUM,
        ZIGZAG, _BitWriter, _canonical_code_arrays, _canonical_codes,
        _emit_entropy, _encode_block, _scaled_quant, _T,
    )

    def zz_stacks(px, quality):
        px = np.asarray(px, dtype=np.float64)
        gray = px.ndim == 2
        h, w = px.shape[:2]
        qlum = _scaled_quant(QUANT_LUM, quality)
        qchrom = _scaled_quant(QUANT_CHROM, quality)
        if gray:
            planes = [px]
            qz = [qlum.reshape(64)[ZIGZAG]]
        else:
            R, G, B = px[..., 0], px[..., 1], px[..., 2]
            planes = [
                0.299 * R + 0.587 * G + 0.114 * B,
                -0.168736 * R - 0.331264 * G + 0.5 * B + 128,
                0.5 * R - 0.418688 * G - 0.081312 * B + 128,
            ]
            qz = [qlum.reshape(64)[ZIGZAG]] + [qchrom.reshape(64)[ZIGZAG]] * 2
        ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
        stacks = []
        for ci, p in enumerate(planes):
            pp = np.empty((ph, pw))
            pp[:h, :w] = p
            pp[h:, :w] = p[h - 1 : h, :]
            pp[:, w:] = pp[:, w - 1 : w]
            blocks = (
                pp.reshape(ph // 8, 8, pw // 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(-1, 8, 8)
            )
            coef = _T @ (blocks - 128.0) @ _T.T
            stacks.append(
                np.round(coef.reshape(-1, 64)[:, ZIGZAG] / qz[ci]).astype(
                    np.int64
                )
            )
        return stacks, gray

    def reference(zzs, dicts):
        bw = _BitWriter()
        pred = [0] * len(zzs)
        for b in range(zzs[0].shape[0]):
            for ci in range(len(zzs)):
                pred[ci] = _encode_block(
                    bw, zzs[ci][b], dicts[ci][0], dicts[ci][1], pred[ci]
                )
        bw.flush()
        return bytes(bw.out)

    rng = np.random.RandomState(11)
    y, x = np.mgrid[0:24, 0:40]
    cases = [
        (rng.rand(17, 23) * 255).round().astype(np.uint8),
        (rng.rand(24, 32, 3) * 255).round().astype(np.uint8),
        np.full((16, 16, 3), 128, np.uint8),          # flat: EOB-only blocks
        ((y + x) % 2 * 255).astype(np.uint8),          # checker: ZRL-heavy
        np.zeros((8, 8), np.uint8),
    ]
    dl, al = _canonical_codes(*DC_LUM), _canonical_codes(*AC_LUM)
    dc_, ac_ = _canonical_codes(*DC_CHROM), _canonical_codes(*AC_CHROM)
    dla = _canonical_code_arrays(*DC_LUM, 16)
    ala = _canonical_code_arrays(*AC_LUM, 256)
    dca = _canonical_code_arrays(*DC_CHROM, 16)
    aca = _canonical_code_arrays(*AC_CHROM, 256)
    for q in (1, 50, 85, 100):
        for img in cases:
            zzs, gray = zz_stacks(img, q)
            if gray:
                dicts, dct, act = [(dl, al)], [dla], [ala]
            else:
                dicts = [(dl, al), (dc_, ac_), (dc_, ac_)]
                dct, act = [dla, dca, dca], [ala, aca, aca]
            assert _emit_entropy(zzs, dct, act) == reference(zzs, dicts), (
                q, img.shape
            )
