"""Registry family module (split from registry.py; see _base)."""
from __future__ import annotations

from dragnet_spark.registry._base import DataFrame, F, SparkSession, W, _dec4, _t, register  # noqa: F401
from dragnet_spark.registry.temporal import ts_micros  # noqa: F401

# ---------------------------------------------------------------------------
# Behavioral analytics over the event stream: window chains,
# gap-based sessionization, cohort retention, funnels. All time math
# is integer microseconds (unix_micros / epoch_us) so both engines
# compare the identical integers — no float-epoch rounding.
# ---------------------------------------------------------------------------


@register(
    "customer_order_history",
    """
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
           CAST(ROW_NUMBER() OVER w AS INT) AS order_seq,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
               AS running_total,
           CAST(DATEDIFF('day', LAG(CAST(o_orderdate AS DATE)) OVER w,
                         CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "window-function chain (running sum + row_number + lag delta) in a "
    "single per-customer sort: one shuffle on custkey serves all three; "
    "the orderkey tiebreaker makes RANGE and ROWS frames agree",
)
def customer_order_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    odate = F.col("o_orderdate").cast("date")
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        odate.alias("orderdate"),
        F.row_number().over(w).cast("int").alias("order_seq"),
        F.sum(_dec4("o_totalprice")).over(w).cast("double").alias("running_total"),
        F.datediff(odate, F.lag(odate).over(w)).cast("int").alias("days_since_prev"),
    )


_SESSION_GAP_US = 30 * 60 * 1_000_000


@register(
    "events_user_sessions",
    f"""
    WITH o AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id) AS prev
      FROM events
    ), m AS (
      SELECT user_id, event_id, tus,
             CASE WHEN prev IS NULL OR tus - prev > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM o
    ), s AS (
      SELECT user_id, SUM(is_new) OVER (PARTITION BY user_id
                                        ORDER BY tus, event_id) AS sess_id
      FROM m
    ), per_sess AS (
      SELECT user_id, sess_id, COUNT(*) AS sess_events
      FROM s GROUP BY user_id, sess_id
    )
    SELECT user_id, COUNT(*) AS n_sessions,
           CAST(SUM(sess_events) AS BIGINT) AS n_events,
           CAST(MAX(sess_events) AS BIGINT) AS max_session_events
    FROM per_sess GROUP BY user_id
    """,
    "batch sessionization via lag-gap detection (30 min): the lag, the "
    "running session-id sum, and the per-session rollup all reuse one "
    "user_id shuffle; the streaming twin is streaming/stateful.sessionize",
)
def events_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("tus", "event_id")
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", ts_micros("ts").alias("tus")
    )
    prev = F.lag("tus").over(w)
    is_new = F.when(
        prev.isNull() | (F.col("tus") - prev > _SESSION_GAP_US), 1
    ).otherwise(0)
    sess = e.withColumn("is_new", is_new).withColumn(
        "sess_id", F.sum("is_new").over(w)
    )
    per_sess = sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("sess_events")
    )
    return per_sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("sess_events").cast("long").alias("n_events"),
        F.max("sess_events").cast("long").alias("max_session_events"),
    )


_WEEK_US = 7 * 86400 * 1_000_000


@register(
    "user_weekly_retention",
    f"""
    WITH wk AS (SELECT DISTINCT user_id,
                CAST(FLOOR(epoch_us(ts) / {_WEEK_US}.0) AS BIGINT) AS week
                FROM events)
    SELECT a.week AS week, COUNT(*) AS n_retained
    FROM wk a JOIN wk b ON a.user_id = b.user_id AND b.week = a.week + 1
    GROUP BY a.week
    """,
    "cohort retention: users active in week w AND w+1 via distinct "
    "(user, week) self-join — the distinct and both join sides share "
    "the user_id hash partitioning, so the self-join adds no exchange",
)
def user_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    wk = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.floor(ts_micros("ts") / _WEEK_US).cast("long").alias("week"),
        )
        .distinct()
    )
    a, b = wk.alias("a"), wk.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.week") == F.col("a.week") + 1),
        )
        .groupBy(F.col("a.week").alias("week"))
        .agg(F.count(F.lit(1)).alias("n_retained"))
    )


@register(
    "events_first_seen_cohorts",
    f"""
    WITH first_seen AS (
      SELECT user_id,
             CAST(FLOOR(MIN(epoch_us(ts)) / {_WEEK_US}.0) AS BIGINT) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT cohort_week, COUNT(*) AS cohort_size
    FROM first_seen GROUP BY cohort_week
    """,
    "acquisition cohorts: each user's first-activity week and the "
    "cohort sizes — the companion primitive to user_weekly_retention; "
    "the per-user MIN and the cohort rollup are two partial-agg "
    "phases, integer microsecond math throughout",
)
def events_first_seen_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    first_seen = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.floor(F.min(ts_micros("ts")) / _WEEK_US)
            .cast("long")
            .alias("cohort_week")
        )
    )
    return first_seen.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )


@register(
    "events_hourly_heatmap",
    """
    SELECT CAST((FLOOR(epoch_us(ts) / 86400000000) + 4) % 7 AS BIGINT) AS dow,
           CAST(FLOOR((epoch_us(ts) % 86400000000) / 3600000000) AS BIGINT) AS hod,
           COUNT(*) AS n_events
    FROM events GROUP BY 1, 2
    """,
    "day-of-week x hour-of-day activity heatmap; bucketing is pure "
    "integer epoch arithmetic (1970-01-01 was a Thursday, hence +4) — "
    "no calendar functions whose week-start conventions differ "
    "between engines",
)
def events_hourly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    tus = ts_micros("ts")
    day_us = 86_400_000_000
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            ((F.floor(tus / day_us) + 4) % 7).cast("long").alias("dow"),
            F.floor((tus % day_us) / 3_600_000_000).cast("long").alias("hod"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "events_markov_transitions",
    """
    WITH ordered AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           COUNT(*) AS n_transitions
    FROM ordered WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
    "per-user event-type transition matrix (lead over one user_id "
    "sort — the sequence-modeling prep stat); deterministic ordering "
    "via the (ts, event_id) tie-break, exact integer counts",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", ts_micros("ts").alias("tus")
    )
    w = W.partitionBy("user_id").orderBy("tus", "event_id")
    return (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@register(
    "events_funnel_conversion",
    """
    WITH v AS (SELECT user_id, MIN(epoch_us(ts)) AS t0 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t1
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t0
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t1
          GROUP BY e.user_id)
    SELECT 'view' AS stage, COUNT(*) AS n_users FROM v
    UNION ALL SELECT 'click', COUNT(*) FROM c
    UNION ALL SELECT 'purchase', COUNT(*) FROM p
    """,
    "ordered funnel (view -> click after view -> purchase after click): "
    "each stage is a per-user MIN-timestamp aggregate broadcast into "
    "the next stage's filter, so the big events table never shuffles",
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", ts_micros("ts").alias("tus")
    )

    from dragnet_spark.ops.dedup import _materialize_once

    def stage(etype: str, prev: DataFrame | None, prev_t: str, out_t: str) -> DataFrame:
        s = e.filter(F.col("event_type") == etype)
        if prev is not None:
            s = s.join(F.broadcast(prev), "user_id").filter(
                F.col("tus") > F.col(prev_t)
            )
        return s.groupBy("user_id").agg(F.min("tus").alias(out_t))

    # each stage table is consumed twice (its own count + the next
    # stage's broadcast filter), and unmaterialized that re-embedded
    # the events scan per reference — SIX scans for three stages
    # (measured r14). Checkpointing the per-user stage tables (small
    # by construction) keeps the deliberate no-shuffle posture at one
    # scan per stage.
    v = _materialize_once(stage("view", None, "", "t0"))
    c = _materialize_once(stage("click", v, "t0", "t1"))
    p = stage("purchase", c, "t1", "t2")

    def cnt(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"), F.count(F.lit(1)).alias("n_users")
        ).select("stage", "n_users")

    return cnt(v, "view").unionByName(cnt(c, "click")).unionByName(cnt(p, "purchase"))


