"""Temporal operators: as-of join, sliding windows.

The reference engine has no joins at all (SURVEY §2.5 — explicitly
future work, docs/design-stateful.md:11-12/163-165); these are the
time-series joins a metrics/training pipeline reaches for first.

As-of join (left row ← most recent right row at-or-before its
timestamp) is implemented with the union+window trick rather than a
range join: tag both inputs, union, sort each key group once by
(ts, side), and carry the last-seen right payload forward with
``last(..., ignorenulls=True)``. That is ONE shuffle by key plus a
partition-local sort — the same cost as a sort-merge join — and never
materializes the O(left × right-per-key) intermediate a range-join
condition (l.ts >= r.ts) would produce before its per-row top-1
reduction. Skewed keys are handled by AQE like any other shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"


def ts_micros(col):
    """Epoch microseconds from any time-shaped column — the one shared
    recipe for registry queries that need sub-second arithmetic.

    ``F.unix_micros`` alone requires TIMESTAMP and rejects
    TIMESTAMP_NTZ (UNEXPECTED_INPUT_TYPE); the leading cast makes the
    expression total over NTZ (interpreted in the session tz, pinned
    UTC in session.py so it matches DuckDB ``epoch_us(ts)``), ISO-8601
    strings, and numeric epoch-seconds (cast treats them as seconds).
    """
    if isinstance(col, str):
        col = F.col(col)
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: each left row gains ``payload_cols`` from the
    latest right row with the same key(s) and right_ts <= left_ts
    (backward, inclusive — DuckDB ``ASOF LEFT JOIN ... ON l.ts >= r.ts``
    semantics); null payload when no right row precedes. Payload column
    names must not collide with left's columns. If several right rows
    share a key+timestamp the latest in (ts, payload) order wins —
    pre-aggregate the right side for a different tie rule.

    Payloads carry forward as ONE struct, so a right row whose payload
    value is NULL still "wins" as the latest row (matching ASOF):
    per-column last(ignorenulls) would instead skip the NULL and mix
    columns from different right rows.
    """
    keys = [on] if isinstance(on, str) else list(on)
    pl = "__asof_pl"
    lt = left.withColumn(_TS, F.col(left_ts)).withColumn(_SIDE, F.lit(1))
    # a NULL right_ts can never satisfy right_ts <= left_ts; without
    # this filter the NULL row sorts FIRST (nulls-first asc) and its
    # non-NULL payload struct would carry into every left row.
    # NULL JOIN KEYS never match either (equi-join/ASOF semantics —
    # NULL = NULL is unknown): window partitionBy would instead group
    # every NULL-key row into ONE partition and hand NULL-key left
    # rows a NULL-key right row's payload (caught by the
    # parquet-resident-NULL fixture). Dropping NULL-key right rows
    # leaves NULL-key left rows alone in their partition → NULL
    # payload, exactly DuckDB's ASOF LEFT JOIN.
    rfilter = F.col(right_ts).isNotNull()
    for k in keys:
        rfilter = rfilter & F.col(k).isNotNull()
    rt = (
        right.filter(rfilter)
        .select(
            *keys,
            F.col(right_ts).alias(_TS),
            F.struct(*payload_cols).alias(pl),
        )
        .withColumn(_SIDE, F.lit(0))
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    # right rows (_SIDE=0) sort before left rows at equal ts → inclusive
    w = (
        W.partitionBy(*keys)
        .orderBy(_TS, _SIDE, pl)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    u = u.withColumn(pl, F.last(pl, ignorenulls=True).over(w))
    return (
        u.filter(F.col(_SIDE) == 1)
        .select(
            *[c for c in u.columns if c not in (pl, _TS, _SIDE)],
            *[F.col(f"{pl}.{p}").alias(p) for p in payload_cols],
        )
    )


def range_join(
    fact: DataFrame,
    dim: DataFrame,
    value_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Interval join: every (fact, dim) pair with
    start <= value < end (half-open; overlapping intervals yield one
    output row per covering interval).

    A naive range condition forces BroadcastNestedLoopJoin — O(n×m)
    compares even when almost nothing matches. Instead each dim
    interval explodes to the fixed-width buckets it covers and each
    fact row computes its single bucket, turning the range join into an
    equi-join on bucket + a residual filter. A (fact, dim) pair shares
    exactly one bucket — the fact's — so no dedup is needed. Cost is
    |dim| × (interval_len / bucket_width) replicated dim rows (choose
    bucket_width near the median interval length) against a hash or
    broadcast equi-join that scales to arbitrarily large fact sides.
    Values must be integral (epoch days/seconds); convert dates first.

    broadcast_dim pins the build side: interval dims are usually tiny
    but often reach Spark as createDataFrame/RDD relations with no
    stats, and without the hint Catalyst may instead broadcast the
    *fact* side — fine in a local test, fatal when the fact is the
    100 TB table. Pass False only when the exploded dim is genuinely
    too big to broadcast; the join then shuffles both sides on the
    bucket key.
    """
    v = F.col(value_col)
    fact2 = fact.withColumn("__rjb", F.floor(v / bucket_width).cast("long"))
    dim2 = dim.withColumn(
        "__rjb",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width).cast("long"),
                F.floor((F.col(end_col) - 1) / bucket_width).cast("long"),
            )
        ),
    )
    if broadcast_dim:
        dim2 = F.broadcast(dim2)
    else:
        # pin a shuffle hash join so Catalyst can't flip to
        # broadcasting whichever side happens to have small stats
        dim2 = dim2.hint("shuffle_hash")
    return (
        fact2.join(dim2, "__rjb")
        .filter((v >= F.col(start_col)) & (v < F.col(end_col)))
        .drop("__rjb")
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    length_sec: int,
    slide_sec: int,
    *agg_exprs,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Sliding event-time windows (each event lands in
    length/slide overlapping windows) via Spark's built-in window();
    emits the window start as epoch-second BIGINT ``ws`` so results are
    timezone-free. Same expression works under Structured Streaming
    with a watermark."""
    win = F.window(ts_col, f"{length_sec} seconds", f"{slide_sec} seconds")
    gcols = group_cols or []
    return (
        df.groupBy(win, *gcols)
        .agg(*agg_exprs)
        .withColumn("ws", F.unix_timestamp("window.start"))
        .drop("window")
    )


def sliding_window_count_sql(
    table: str, ts_expr: str, length_sec: int, slide_sec: int
) -> str:
    """DuckDB twin for a count over sliding windows: replicate each row
    into its length/slide windows with UNNEST(range), then group."""
    n = -(-length_sec // slide_sec)  # ceil: partial last window still covers the event
    return f"""
    SELECT ws, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT (CAST(floor({ts_expr}/{slide_sec}) AS BIGINT) - u.k)*{slide_sec} AS ws,
             {ts_expr} AS e
      FROM {table}, UNNEST(range(0, {n})) AS u(k)
    ) WHERE e >= ws AND e < ws + {length_sec}
    GROUP BY ws
    """
