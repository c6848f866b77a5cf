"""Stateful streaming operators: session windows and custom state.

The reference has no session semantics (its only windows are tumbling
lquantize buckets); these are north-star extensions built on Spark's
native stateful machinery:

* :func:`sessionize` — gap-based session windows via the built-in
  ``session_window``. Works identically on batch and streaming
  DataFrames (batch = the oracle path for tests); in streaming, pair
  with a watermark so closed sessions finalize and state is evicted.
* :func:`stream_running_counts` — a custom stateful operator via
  ``applyInPandasWithState``: exact running per-key totals maintained
  across micro-batches, emitted on every update. The state is one
  (count, weight) pair per key — the pattern to copy for any
  accumulating operator Spark lacks (distinct sketches, decaying
  counters, per-entity rate limits).

Scale notes: session/state operators shuffle once on the grouping key
and keep state partitioned executor-side; watermarks (sessionize) and
explicit timeouts (GroupStateTimeout) bound state size — the knob the
reference lacked when its aggregation hash outgrew the heap
(README.md:666-698).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

VALUE_COL = "value"


def sessionize(
    df: DataFrame,
    time_col: str,
    keys: list[str],
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessions per key: rows whose event times are within
    ``gap`` of each other merge into one session.

    Output: keys + session_start/session_end (epoch seconds) + value
    (event count). ``time_col`` may be a timestamp column or anything
    ``timestamp_seconds``-compatible after cast.
    """
    ts = F.col(time_col)
    out = df
    if watermark is not None and out.isStreaming:
        out = out.withWatermark(time_col, watermark)
    win = F.session_window(ts, gap)
    return (
        out.groupBy(win.alias("__dn_session"), *[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).cast("long").alias(VALUE_COL))
        .select(
            *keys,
            F.unix_timestamp(F.col("__dn_session.start")).alias("session_start"),
            F.unix_timestamp(F.col("__dn_session.end")).alias("session_end"),
            F.col(VALUE_COL),
        )
    )


def stream_running_counts(
    sdf: DataFrame,
    key_cols: list[str],
    weight_col: str | None = None,
) -> DataFrame:
    """Exact running totals per key across the life of the stream.

    Emits one row per key per micro-batch that touched it:
    keys + n_events + total_weight. State per key is two longs —
    bounded by key cardinality, not input volume.
    """
    weight = weight_col or "__dn_one"
    src = sdf
    if weight_col is None:
        src = sdf.withColumn("__dn_one", F.lit(1).cast("long"))

    key_schema = ", ".join(f"{k} string" for k in key_cols)
    out_schema = f"{key_schema}, n_events long, total_weight long"

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, w = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            # accumulate exactly; truncating per micro-batch would make
            # fractional weights depend on how the stream was sliced
            w += float(pdf[weight].sum())
        state.update((n, w))
        yield pd.DataFrame(
            [list(key) + [n, int(round(w))]],
            columns=list(key_cols) + ["n_events", "total_weight"],
        )

    keyed = src.select(
        *[F.col(k).cast("string").alias(k) for k in key_cols],
        F.col(weight).alias(weight),
    )
    return keyed.groupBy(*key_cols).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="n long, w double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
