"""MJPEG-in-AVI container codec — the real-video path (VERDICT r8 #3).

Motion-JPEG inside a RIFF/AVI container is the one mainstream video
format decodable with zero external codecs: the container is a plain
chunk walk (the same RIFF layout as WAV, public spec) and each frame
is a complete baseline/progressive JPEG handled by
:mod:`dragnet_spark.ops.jpeg`. This replaces the declared
``NotImplementedError`` video boundary for ``video/x-msvideo``
payloads; formats whose frames need an entropy codec we don't carry
(H.264/VP9 in mp4/webm) remain behind the ``decoders={...}``
injection hook.

Provenance: reference dragnet has no media handling at all — this
module exists for the LLM-training-data side of the engine (frame
sampling / feature extraction over opaque binary columns, the
``multimodal_*`` registry family).

Layout written by :func:`encode_avi_mjpeg` (and accepted, along with
the usual real-world variations — ``rec `` groupings, JUNK chunks,
odd-size padding — by :func:`decode_avi_mjpeg`)::

    RIFF <size> 'AVI '
      LIST 'hdrl'
        'avih' MainAVIHeader   (µs/frame, total frames, width, height)
        LIST 'strl'
          'strh' 'vids'/'MJPG' (scale/rate → fps)
          'strf' BITMAPINFOHEADER
      LIST 'movi'
        '00dc' <jpeg bytes> [pad to even]  × n_frames
      'idx1' index            (written for players; ignored on read)

Error contract: every malformed input raises ``ValueError`` (the
one-except-clause rule every decoder in ops/multimodal.py keeps).
"""

from __future__ import annotations

import struct

from dragnet_spark.ops.jpeg import decode_jpeg, encode_jpeg

__all__ = [
    "encode_avi_mjpeg",
    "decode_avi_mjpeg",
    "avi_metadata",
    "iter_mjpeg_frames",
]


def _chunks(data: bytes, lo: int, hi: int):
    """Yield (fourcc, body_lo, body_hi) for each RIFF chunk in
    [lo, hi); chunk bodies are word-aligned (odd sizes padded)."""
    i = lo
    while i + 8 <= hi:
        fourcc = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        body = i + 8
        end = body + size
        if end > hi:
            raise ValueError(
                f"AVI chunk {fourcc!r} overruns its parent "
                f"({end} > {hi})"
            )
        yield fourcc, body, end
        i = end + (size & 1)  # pad byte after odd-sized chunks


def _require_avi(data: bytes) -> int:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/'AVI ' signature)")
    (riff_size,) = struct.unpack("<I", data[4:8])
    return min(8 + riff_size, len(data))


def avi_metadata(data: bytes):
    """Header-only probe: (width, height, n_frames, fps) from the
    ``avih`` header — O(header) cost, frames never touched. Fields
    the file omits come back None."""
    try:
        hi = _require_avi(data)
        w = h = n = None
        fps = None
        for fourcc, lo2, hi2 in _chunks(data, 12, hi):
            if fourcc != b"LIST" or data[lo2 : lo2 + 4] != b"hdrl":
                continue
            for f2, lo3, hi3 in _chunks(data, lo2 + 4, hi2):
                if f2 == b"avih" and hi3 - lo3 >= 40:
                    (us_per_frame,) = struct.unpack(
                        "<I", data[lo3 : lo3 + 4]
                    )
                    (n,) = struct.unpack("<I", data[lo3 + 16 : lo3 + 20])
                    w, h = struct.unpack(
                        "<II", data[lo3 + 32 : lo3 + 40]
                    )
                    if us_per_frame:
                        fps = 1e6 / us_per_frame
            break
        return w, h, n, fps
    except ValueError:
        raise
    except (struct.error, IndexError) as e:
        raise ValueError(f"invalid AVI: {type(e).__name__}: {e}") from e


def iter_mjpeg_frames(data: bytes):
    """Yield each frame's raw JPEG bytes from the ``movi`` list, in
    stream order. Accepts compressed ('..dc') and uncompressed-named
    ('..db') video chunks from any stream number, descends into
    ``rec `` groupings, skips JUNK/audio chunks. The JPEGs are NOT
    decoded here — callers sample first, decode only what they keep
    (the frame-sampling plan's whole point)."""

    def is_video(fourcc: bytes) -> bool:
        return (
            fourcc[:2].isdigit() and fourcc[2:4] in (b"dc", b"db")
        )

    def walk(lo: int, hi: int):
        for fourcc, lo2, hi2 in _chunks(data, lo, hi):
            if fourcc == b"LIST" and data[lo2 : lo2 + 4] == b"rec ":
                yield from walk(lo2 + 4, hi2)
            elif is_video(fourcc) and hi2 > lo2:
                yield data[lo2:hi2]

    try:
        hi = _require_avi(data)
        for fourcc, lo2, hi2 in _chunks(data, 12, hi):
            if fourcc == b"LIST" and data[lo2 : lo2 + 4] == b"movi":
                yield from walk(lo2 + 4, hi2)
    except ValueError:
        raise
    except (struct.error, IndexError) as e:
        raise ValueError(f"invalid AVI: {type(e).__name__}: {e}") from e


def decode_avi_mjpeg(data: bytes, every_n: int = 1, max_frames: int | None = None):
    """AVI bytes → (width, height, fps, frames) where frames is a
    list of (frame_index, pixel_array) for every ``every_n``-th frame
    (pixels as :func:`decode_jpeg` returns them: uint8 (h, w) or
    (h, w, 3)). ``max_frames`` bounds decode work per record — a 100
    TB corpus will contain hour-long files and one record must not
    monopolize a task. Header dimensions are returned even when they
    disagree with the frames' own (frames are authoritative per
    frame; the mismatch is the caller's signal, not an error)."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    w, h, _n, fps = avi_metadata(data)
    frames = []
    for idx, jpeg in enumerate(iter_mjpeg_frames(data)):
        if idx % every_n:
            continue
        frames.append((idx, decode_jpeg(jpeg)[2]))
        if max_frames is not None and len(frames) >= max_frames:
            break
    return w, h, fps, frames


def encode_avi_mjpeg(frames, fps: float = 10.0, quality: int = 90) -> bytes:
    """Pixel arrays (each uint8 (h, w) or (h, w, 3), identical dims)
    → MJPEG-AVI bytes. The fixture-builder twin of
    :func:`decode_avi_mjpeg`; also the honest write path for a frame
    pipeline's sink."""
    import numpy as np

    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    first = np.asarray(frames[0])
    h, w = first.shape[:2]
    jpegs = []
    for f in frames:
        a = np.asarray(f)
        if a.shape[:2] != (h, w):
            raise ValueError(
                f"all frames must share dimensions; got {a.shape[:2]} "
                f"vs {(h, w)}"
            )
        jpegs.append(encode_jpeg(a, quality=quality))

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return (
            fourcc
            + struct.pack("<I", len(body))
            + body
            + (b"\x00" if len(body) & 1 else b"")
        )

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    us_per_frame = int(round(1e6 / fps)) if fps > 0 else 0
    max_bytes = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I",
        us_per_frame, max_bytes * int(round(fps)), 0,
        0x10,  # AVIF_HASINDEX
        len(jpegs), 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, 1, int(round(fps)), 0,
                      len(jpegs), max_bytes, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_body)
    # idx1: players want it; our reader ignores it (stream order wins)
    idx = bytearray()
    off = 4  # offsets are relative to the 'movi' fourcc
    for j in jpegs:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) & 1)
    body = hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
