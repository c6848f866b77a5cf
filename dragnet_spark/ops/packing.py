"""Sequence packing: fill fixed token-budget bins for training batches.

Training consumes documents in fixed-size context windows; feeding one
short document per window wastes most of it. Packing groups documents
so each pack's token total stays within the budget. Optimal bin
packing is NP-hard and inherently sequential — so it is NOT expressed
as joins/aggregations. Instead: documents are hash-partitioned into
independent buckets (narrow, deterministic), and each bucket is packed
locally by a greedy first-fit over id-sorted rows inside one
applyInPandas call. Pack quality is within a few percent of global
greedy once buckets hold thousands of docs, and the algorithm
parallelizes embarrassingly — each of 1000 executors packs its buckets
with zero coordination.

Determinism contract: pack assignment depends only on (id, n_tokens)
pairs and the bucket count — not on input partitioning or row order —
so reruns and engine moves reproduce identical packs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dragnet_spark.ops.text import shingle_hash


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    num_buckets: int = 64,
) -> DataFrame:
    """Assign each row a ``pack_id`` (string ``"<bucket>/<n>"``) such
    that the sum of ``tokens_col`` within a pack is <= ``budget``.
    Rows longer than the budget get a singleton pack (the caller
    decides whether to truncate or drop them). Greedy first-fit over
    id-sorted rows per bucket.
    """
    bucket = (shingle_hash(F.col(id_col).cast("string")) % num_buckets).alias(
        "__bucket"
    )
    slim = df.select(F.col(id_col).alias("id"), F.col(tokens_col).alias("n"), bucket)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        b = int(pdf["__bucket"].iloc[0])
        # first-fit: scan open packs for the first with room
        remaining: list[int] = []  # room left per open pack
        assignment = []
        for n in pdf["n"]:
            n = int(n)
            placed = None
            for i, room in enumerate(remaining):
                if n <= room:
                    placed = i
                    remaining[i] = room - n
                    break
            if placed is None:
                remaining.append(max(budget - n, 0))
                placed = len(remaining) - 1
            assignment.append(f"{b}/{placed}")
        return pd.DataFrame({"id": pdf["id"], "pack_id": assignment})

    id_dt = dict(df.dtypes)[id_col]
    packed = slim.groupBy("__bucket").applyInPandas(
        _pack, f"id {id_dt}, pack_id string"
    )
    return df.join(
        packed.withColumnRenamed("id", id_col), id_col
    )


def pack_stats(packed: DataFrame, tokens_col: str, budget: int) -> DataFrame:
    """Per-pack utilisation summary: n_docs, n_tokens, fill fraction."""
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(tokens_col).cast("long").alias("n_tokens"),
        F.round(F.sum(tokens_col) / F.lit(float(budget)), 4).alias("fill"),
    )
