#!/usr/bin/env python
"""Multimodal path throughput soak: measure the header probe and the
real decode+feature pass over a generated mixed-format corpus
(PNG / baseline JPEG / BMP / WAV), records/sec — the honest cost of
the Python/Arrow boundary for BASELINE.md.

Payloads are generated once on the driver (small images, ~1 KB each),
parallelized to all cores, then each stage is timed end to end.

Usage: python tools/soak_media.py [N_RECORDS]   (default 4000)
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from dragnet_spark.ops.jpeg import encode_jpeg  # noqa: E402
from dragnet_spark.ops.multimodal import (  # noqa: E402
    encode_bmp,
    encode_png,
    extract_features,
    probe_media_metadata,
)
from dragnet_spark.session import get_spark  # noqa: E402


def _wav_bytes(n: int, rate: int = 8000) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    x = (np.sin(np.arange(n) * 0.1) * 2000).astype("<i2")
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(x.tobytes())
    return buf.getvalue()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    spark = get_spark(app_name="soak_media")
    rng = np.random.RandomState(42)
    rows = []
    for i in range(n):
        w, h = 8 + i % 24, 8 + i % 16
        px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        kind = i % 4
        if kind == 0:
            mt, payload = "image/png", encode_png(px)
        elif kind == 1:
            mt, payload = "image/jpeg", encode_jpeg(px, 85)
        elif kind == 2:
            mt, payload = "image/bmp", encode_bmp(px)
        else:
            mt, payload = "audio/wav", _wav_bytes(4000 + (i % 10) * 500)
        rows.append((i, mt, bytes(payload), None))
    df = spark.createDataFrame(
        rows,
        "id long, media_type string, payload binary, "
        "meta struct<width:int, height:int, codec:string>",
    ).repartition(32)
    df.cache().count()
    probe_media_metadata(df).count()  # warm the Python workers once
    out = {"n_records": n}
    t0 = time.time()
    assert probe_media_metadata(df).filter("type_mismatch = 1").count() == 0
    dt = time.time() - t0
    out["probe"] = {"sec": round(dt, 2), "rec_per_sec": round(n / dt)}
    t0 = time.time()
    assert extract_features(df, decode_stub=False).count() == n
    dt = time.time() - t0
    out["decode_features"] = {"sec": round(dt, 2), "rec_per_sec": round(n / dt)}
    t0 = time.time()
    assert extract_features(df, decode_stub=True).count() == n
    dt = time.time() - t0
    out["stub_features"] = {"sec": round(dt, 2), "rec_per_sec": round(n / dt)}
    # perceptual hash: decode + dHash over the image subset (3/4 of n)
    from dragnet_spark.ops.multimodal import perceptual_hash

    n_img = (
        perceptual_hash(df, decode_stub=False)
        .filter("dhash IS NOT NULL").count()
    )  # warm
    t0 = time.time()
    assert (
        perceptual_hash(df, decode_stub=False)
        .filter("dhash IS NOT NULL").count() == n_img
    )
    dt = time.time() - t0
    out["perceptual_hash"] = {
        "sec": round(dt, 2),
        "rec_per_sec": round(n_img / dt),
        "n_images": n_img,
    }
    df.unpersist()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
