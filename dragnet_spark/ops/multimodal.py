"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a metadata struct (media_type, width/height/duration, codec). The
Spark-side machinery — schema, Arrow batch shape, mapInPandas
signatures, partitioning — is real and tested; the actual decoders
(Pillow/ffmpeg/torchaudio) are not present in this environment, so
the decode step is stubbed: ``decode_stub=True`` produces
deterministic fake features (seeded by content hash), and
``decode_stub=False`` raises NotImplementedError where the real
library call belongs.

At 100 TB the pattern matters more than the decoder: binary columns
stay columnar (parquet keeps them out of unrelated scans), feature
extraction is mapInPandas (one Python worker per partition, Arrow
batches, no driver involvement), and downstream ops see only the
small feature columns.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "id long, media_type string, payload binary, "
    "meta struct<width:int, height:int, codec:string>"
)

FEATURE_DIM = 8


def attach_payloads(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a media table from a text table for testing: payload =
    utf-8 bytes, media_type round-robins by id. Stands in for a real
    (id, bytes) source such as parquet binary columns or tar shards."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.length(F.col(text_col)).cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real encoder: dim floats in [0,1)
    derived from the content digest."""
    out = []
    digest = hashlib.sha256(payload).digest()
    for i in range(dim):
        chunk = digest[(4 * i) % 28 : (4 * i) % 28 + 4]
        out.append(int.from_bytes(chunk, "big") / 2**32)
    return out


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """binary payload → feature vector, via mapInPandas.

    Output: (id, media_type, n_bytes, features array<double>). The
    real implementation replaces _fake_features with a model/codec
    call; everything around it (batching, schema, partition layout)
    is production-shaped.
    """
    import pandas as pd

    def run(batches):
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real decoders (Pillow/ffmpeg) are not available in this "
                    "environment; run with decode_stub=True"
                )
            feats = [_fake_features(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(
        run,
        schema="id long, media_type string, n_bytes long, features array<double>",
    )


def resize_media(
    media: DataFrame,
    target_width: int,
    target_height: int,
    decode_stub: bool = True,
) -> DataFrame:
    """Image resize via mapInPandas: payload → resized payload with
    updated meta. The real implementation decodes with Pillow, resizes,
    re-encodes; here the stub emits a deterministic content-derived
    payload of plausible size (scaled by target/source pixel ratio) so
    downstream size accounting is testable. Aspect-ratio metadata and
    the Arrow batch shape are production-real.

    Scale shape: a pure map — no shuffle, binary columns never leave
    their partition, output parquet keeps payloads columnar.
    """
    import pandas as pd

    def run(batches):
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real decoders (Pillow) are not available in this "
                    "environment; run with decode_stub=True"
                )
            payloads, widths, heights = [], [], []
            for p, w, h in zip(
                pdf["payload"], pdf["meta_width"], pdf["meta_height"]
            ):
                src = bytes(p)
                ratio = (target_width * target_height) / max(int(w) * int(h), 1)
                n_out = max(int(len(src) * min(ratio, 1.0)), 1)
                seed = hashlib.sha256(
                    src + f"{target_width}x{target_height}".encode()
                ).digest()
                payloads.append((seed * (n_out // len(seed) + 1))[:n_out])
                widths.append(target_width)
                heights.append(target_height)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media_type": pdf["media_type"],
                    "payload": payloads,
                    "width": widths,
                    "height": heights,
                }
            )

    flat = media.filter(F.col("media_type") == "image/png").select(
        "id",
        "media_type",
        "payload",
        F.col("meta.width").alias("meta_width"),
        F.col("meta.height").alias("meta_height"),
    )
    return flat.mapInPandas(
        run,
        schema=(
            "id long, media_type string, payload binary, "
            "width int, height int"
        ),
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    index (the decode itself is the stubbed step). Demonstrates the
    explode-to-work-units pattern that keeps per-task memory flat when
    a single video fans out to many frames."""
    return media.filter(F.col("media_type") == "video/mp4").select(
        "id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.floor(F.length("payload") / every_n).cast("int") - 1, F.lit(0)
                ),
            )
        ).alias("frame_index"),
        (F.col("meta.width") * F.col("meta.height")).alias("pixels"),
    )
