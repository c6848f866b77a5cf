"""Registry family module (split from registry.py; see _base)."""
from __future__ import annotations

from dragnet_spark.registry._base import DataFrame, F, SparkSession, W, _dec4, _t, register  # noqa: F401
from dragnet_spark.registry.curation import _text  # noqa: F401
from dragnet_spark.registry.temporal import ts_micros  # noqa: F401

# ---------------------------------------------------------------------------
# Reshaping family: pivot (long→wide) and unpivot (wide→long), plus
# percentile-threshold outlier counts. Pivot values are pinned
# explicitly — never inferred — so the plan skips the extra distinct
# pass and the output schema is stable at any scale.
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "events_pivot_type_by_day",
    f"""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           {", ".join(
               f"COALESCE(SUM(CASE WHEN event_type = '{t}' THEN 1 END), 0) AS n_{t}"
               for t in _EVENT_TYPES)}
    FROM events GROUP BY 1
    """,
    "pivot (long→wide): one row per day, one column per event type. "
    "Explicit pivot values skip the inference pass and make this a "
    "single groupBy — map-side partial aggregation, one shuffle",
)
def events_pivot_type_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
    )
    piv = (
        e.groupBy("day")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
          for t in _EVENT_TYPES],
    )


@register(
    "events_cube_type_day",
    """
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS sum_value_e2,
           CAST(GROUPING(event_type, CAST(date_trunc('day', ts) AS DATE))
                AS BIGINT) AS gid
    FROM events
    GROUP BY CUBE(event_type, CAST(date_trunc('day', ts) AS DATE))
    """,
    "grouping-sets aggregate (CUBE over type × day): per-cell, "
    "per-type, per-day, and grand-total rows in ONE pass — Spark "
    "plans an Expand (each input row fans to its 4 grouping sets) "
    "over a single scan + single shuffle, exactly the multiplexed "
    "one-pass discipline of the index build (fanout_aggregate) "
    "applied to OLAP subtotals. grouping_id bit order matches "
    "DuckDB's GROUPING() (probed, not assumed); the value sum rides "
    "the e2-integer discipline so every cell is hash-exact",
)
def events_cube_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.round(F.col("value") * 100, 0).cast("long").alias("v_e2"),
    )
    return e.cube("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v_e2").alias("sum_value_e2"),
        F.grouping_id().alias("gid"),
    )


@register(
    "sales_rollup_region_nation",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))
                AS BIGINT) AS revenue_e2,
           CAST(GROUPING(r.r_name, n.n_name) AS BIGINT) AS gid
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
    "hierarchical ROLLUP (region → nation → grand total) over the "
    "star join: the financial-reporting subtotal shape. The fact side "
    "broadcast-joins the three dims (they never grow), then ONE "
    "Expand+shuffle produces all three aggregation levels — vs three "
    "separate scans in a naive engine. Revenue in e2 integers for "
    "cross-engine exactness",
)
def sales_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("p_e2"),
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", F.col("n_name").alias("nation")
    )
    r = _t(spark, sf_dir, "region").select(
        "r_regionkey", F.col("r_name").alias("region")
    )
    joined = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.rollup("region", "nation").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("p_e2").alias("revenue_e2"),
        F.grouping_id().alias("gid"),
    )


@register(
    "docs_weighted_sample",
    f"""
    WITH w AS (
      SELECT doc_id, source,
             CAST({_text.token_count_sql('text')} AS BIGINT) AS n_tokens,
             CAST(CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)
                  || '|wsample'), 1, 13)) AS BIGINT) AS DOUBLE)
               / 4503599627370496.0 AS u
      FROM documents
    ),
    pri AS (
      SELECT doc_id, source, n_tokens,
             CAST(ROUND(POW(u, 1.0 / GREATEST(n_tokens, 1)) * 1e6, 0)
                  AS BIGINT) AS priority_e6
      FROM w
    )
    SELECT doc_id, source, n_tokens, priority_e6
    FROM pri
    ORDER BY priority_e6 DESC, doc_id
    LIMIT 200
    """,
    "weighted sampling without replacement (Efraimidis-Spirtsis "
    "priority sampling): each doc draws u ~ U(0,1) from a 52-bit "
    "md5 slice of its id (RNG-free, any-engine reproducible) and the "
    "global top-k by priority u^(1/weight) IS a weighted sample — "
    "the data-mixing primitive for token-budgeted corpus draws, "
    "weight = token count here. One narrow projection + distributed "
    "TakeOrdered(200): no shuffle of the corpus, no driver sort. "
    "pow is transcendental so its e6 rounding is boundary-safe "
    "(never lands on .5), and the (priority_e6, doc_id) tiebreak "
    "makes the top-k deterministic in both engines",
)
def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        "source",
        _text.token_count("text").cast("long").alias("n_tokens"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"),
                                   F.lit("|wsample"))),
                    1, 13,
                ),
                16, 10,
            ).cast("long").cast("double")
            / F.lit(4503599627370496.0)  # 16^13 = 2^52: u in [0, 1)
        ).alias("u"),
    )
    pri = w.select(
        "doc_id",
        "source",
        "n_tokens",
        F.round(
            F.pow(F.col("u"), F.lit(1.0) / F.greatest("n_tokens", F.lit(1)))
            * F.lit(1e6),
            0,
        ).cast("long").alias("priority_e6"),
    )
    return pri.orderBy(F.desc("priority_e6"), F.asc("doc_id")).limit(200)


@register(
    "events_unpivot_daily_metrics",
    f"""
    WITH wide AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS n_events,
             COUNT(DISTINCT user_id) AS n_users
      FROM events GROUP BY 1
    )
    SELECT day, 'n_events' AS metric, n_events AS n FROM wide
    UNION ALL
    SELECT day, 'n_users', n_users FROM wide
    """,
    "unpivot/melt (wide→long): per-day metric columns melted to "
    "(day, metric, n) rows — the built-in unpivot generator, no join, "
    "no extra shuffle beyond the one aggregation",
)
def events_unpivot_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    return wide.unpivot("day", ["n_events", "n_users"], "metric", "n")


@register(
    "events_p99_outliers",
    """
    WITH thr AS (SELECT event_type, quantile_cont(value, 0.99) AS p99
                 FROM events GROUP BY event_type)
    SELECT e.event_type, CAST(thr.p99 AS DOUBLE) AS p99,
           COUNT(*) AS n_outliers
    FROM events e JOIN thr ON e.event_type = thr.event_type
    WHERE e.value > thr.p99
    GROUP BY e.event_type, thr.p99
    """,
    "percentile-threshold outliers: per-type exact p99 (interpolated — "
    "both engines use the same formula, proven by the percentile "
    "oracle) broadcast back as the filter threshold; the events table "
    "never shuffles, only the tiny threshold dim does",
)
def events_p99_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    thr = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.99)).alias("p99")
    )
    return (
        e.join(F.broadcast(thr), "event_type")
        .filter(F.col("value") > F.col("p99"))
        .groupBy("event_type", F.col("p99").cast("double").alias("p99"))
        .agg(F.count(F.lit(1)).alias("n_outliers"))
    )


@register(
    "daily_activity_full_outer",
    """
    WITH od AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                       COUNT(*) AS n_orders
                FROM orders GROUP BY 1),
         ev AS (SELECT CAST(date_trunc('month', ts) AS DATE) AS m,
                       COUNT(*) AS n_events
                FROM events GROUP BY 1)
    SELECT COALESCE(od.m, ev.m) AS month,
           COALESCE(od.n_orders, 0) AS n_orders,
           COALESCE(ev.n_events, 0) AS n_events
    FROM od FULL OUTER JOIN ev ON od.m = ev.m
    """,
    "full outer join of two pre-aggregated monthly series (order months "
    "and event months are disjoint here, so both null sides are "
    "exercised); aggregating before the join keeps the outer join over "
    "months, not raw rows",
)
def daily_activity_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("m"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    ev = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("month", "ts").cast("date").alias("m"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    j = od.join(ev, od.m == ev.m, "full_outer")
    return j.select(
        F.coalesce(od.m, ev.m).alias("month"),
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
    )


@register(
    "users_clicked_never_purchased",
    """
    SELECT user_id FROM events WHERE event_type = 'click' AND value > 90
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 90
    """,
    "set difference (EXCEPT): distinct high-value clickers minus "
    "high-value purchasers — "
    "Catalyst plans except as a left-anti join over the distinct sets, "
    "one hash shuffle per side",
)
def users_clicked_never_purchased(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    clickers = e.filter(
        (F.col("event_type") == "click") & (F.col("value") > 90)
    ).select("user_id")
    buyers = e.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 90)
    ).select("user_id")
    return clickers.subtract(buyers)  # EXCEPT DISTINCT


@register(
    "users_both_signup_and_error",
    """
    SELECT user_id FROM events WHERE event_type = 'signup'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    "set intersection (INTERSECT): users appearing in both event "
    "populations — planned as a left-semi join over distinct sets",
)
def users_both_signup_and_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "signup").select("user_id")
    b = e.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


from dragnet_spark.ops.dedup import simhash_md5, simhash_md5_sql  # noqa: E402


@register(
    "dedup_simhash_md5",
    simhash_md5_sql("text"),
    "portable 56-bit SimHash (md5 token hashes): bit-identical on any "
    "engine, so unlike the xxhash64 variant it is oracle-checked; "
    "tokens hashed once via explode+groupBy, signature assembled from "
    "per-bit sign sums after the shuffle",
)
def dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_md5(_t(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "events_daily_gapfilled",
    """
    WITH b AS (SELECT CAST(MIN(date_trunc('day', ts)) AS DATE) AS lo,
                      CAST(MAX(date_trunc('day', ts)) AS DATE) AS hi
               FROM events),
    cal AS (SELECT CAST(u.d AS DATE) AS day
            FROM b, UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS u(d)),
    cnt AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n
            FROM events WHERE event_type = 'purchase' AND value > 250
            GROUP BY 1)
    SELECT cal.day, COALESCE(cnt.n, 0) AS n
    FROM cal LEFT JOIN cnt ON cal.day = cnt.day
    """,
    "time-series gap filling: a generated calendar dim (sequence + "
    "explode, one row per day of the observed range) left-joins the "
    "sparse per-day counts so missing days surface as explicit zeros — "
    "the calendar side is rows-per-day tiny and broadcast",
)
def events_daily_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    b = e.agg(
        F.min(F.date_trunc("day", "ts")).cast("date").alias("lo"),
        F.max(F.date_trunc("day", "ts")).cast("date").alias("hi"),
    )
    cal = b.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    cnt = (
        e.filter((F.col("event_type") == "purchase") & (F.col("value") > 250))
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # a left join can only broadcast its non-preserved side; the
    # aggregated counts are <= one row per day, so broadcast those
    return cal.join(F.broadcast(cnt), "day", "left").select(
        "day", F.coalesce("n", F.lit(0)).alias("n")
    )


@register(
    "events_value_mad_by_type",
    """
    WITH med AS (SELECT event_type,
                        quantile_cont(value, 0.5) AS median
                 FROM events GROUP BY event_type)
    SELECT e.event_type, CAST(med.median AS DOUBLE) AS median,
           CAST(quantile_cont(ABS(e.value - med.median), 0.5) AS DOUBLE) AS mad
    FROM events e JOIN med ON e.event_type = med.event_type
    GROUP BY e.event_type, med.median
    """,
    "robust dispersion (median absolute deviation): per-type median "
    "broadcast back for the residual pass — two exact interpolated "
    "percentiles (identical formula in both engines), fact table "
    "scanned twice but never shuffled by row",
)
def events_value_mad_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("median")
    )
    return (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type", F.col("median").cast("double").alias("median"))
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("median")), F.lit(0.5))
            .cast("double")
            .alias("mad")
        )
    )


from dragnet_spark.ops.dedup import fuzzy_key_pairs  # noqa: E402


@register(
    "customers_fuzzy_name_pairs",
    """
    WITH v AS (
      SELECT c_custkey AS id, c_name AS key,
             UNNEST(list_append(
               list_transform(range(1, len(c_name) + 1),
                              i -> substr(c_name, 1, i - 1) || substr(c_name, i + 1)),
               c_name)) AS var
      FROM customer
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.key AS ka, b.key AS kb
      FROM v a JOIN v b ON a.var = b.var AND a.id < b.id
    )
    SELECT id_a, id_b, CAST(levenshtein(ka, kb) AS INT) AS dist
    FROM cand WHERE levenshtein(ka, kb) <= 1
    """,
    "entity resolution via SymSpell deletion-neighborhood blocking: "
    "edit-distance-1 key pairs from an equi-join on deletion variants "
    "(lossless for distance 1) + exact levenshtein verification — "
    "never the O(n^2) cross product",
)
def customers_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fuzzy_key_pairs(_t(spark, sf_dir, "customer"), "c_name", "c_custkey")


from dragnet_spark.ops.sampling import hash_fraction, hash_fraction_sql  # noqa: E402


@register(
    "sample_quota_per_lang",
    f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY {hash_fraction_sql('doc_id', 'quota')},
                                         doc_id) AS rn
      FROM documents
    ) WHERE rn <= 20
    """,
    "fixed-size quota sample: exactly 20 docs per language, chosen by "
    "deterministic hash order (stable across runs/engines, no RNG). "
    "Complements fractional stratified sampling when the curation "
    "budget is per-group counts, not rates; one shuffle on lang",
)
def sample_quota_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = _t(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(
        hash_fraction("doc_id", "quota"), F.asc("doc_id")
    )
    return (
        doc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang")
    )


@register(
    "docs_length_quartiles_by_lang",
    """
    WITH q AS (
      SELECT lang, n_chars,
             NTILE(4) OVER (PARTITION BY lang
                            ORDER BY n_chars, doc_id) AS quartile
      FROM documents
    )
    SELECT lang, CAST(quartile AS INT) AS quartile, COUNT(*) AS n,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM q GROUP BY lang, quartile
    """,
    "length-quartile balance check: NTILE within each language (doc_id "
    "tiebreak makes the total order — and thus the tile boundaries — "
    "deterministic across engines); the follow-up rollup shares the "
    "lang shuffle",
)
def docs_length_quartiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = _t(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.asc("n_chars"), F.asc("doc_id"))
    q = doc.withColumn("quartile", F.ntile(4).over(w).cast("int"))
    return q.groupBy("lang", "quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


from dragnet_spark.ops.text import (  # noqa: E402
    chunk_token_windows,
    chunk_token_windows_sql,
)


@register(
    "docs_chunk_windows",
    chunk_token_windows_sql("text", size=50, stride=40),
    "document chunking into overlapping token windows (50 tokens, "
    "stride 40 — 10-token overlap): the context-window unit a training "
    "pipeline consumes. A narrow map (slice inside transform+explode), "
    "no shuffle, expansion factor len/stride known in advance",
)
def docs_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_token_windows(
        _t(spark, sf_dir, "documents"), "text", "doc_id", size=50, stride=40
    )


_SKETCH_CACHE: dict[str, str] = {}


@register(
    "index_sketch_distinct_rollup",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_exact,
           CAST(1 AS BOOLEAN) AS sketch_ok
    FROM events GROUP BY event_type
    """,
    "mergeable-sketch materialization: per-day HLL sketches of user_id "
    "persisted as a binary column in the day-partitioned view, unioned "
    "at query time for distinct users per type over ANY day range — "
    "the one aggregate plain count rollups cannot answer from a "
    "materialized view (distinct does not sum). The sketch path never "
    "rescans raw data; the GRADING twin does (once, to state the "
    "exact count and the ±3σ tolerance the binary sketch must land "
    "in — binary datasketches themselves have no DuckDB twin). Sketch "
    "union is commutative so partial aggregation and AQE apply.",
)
def index_sketch_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    if sf_dir not in _SKETCH_CACHE:
        path = tempfile.mkdtemp(prefix="dragnet_sketch_")
        (
            _t(spark, sf_dir, "events")
            .groupBy(
                F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
            )
            .agg(F.hll_sketch_agg("user_id").alias("sk"))
            .write.mode("overwrite")
            .parquet(path)
        )
        _SKETCH_CACHE[sf_dir] = path
    sk = spark.read.parquet(_SKETCH_CACHE[sf_dir])
    approx = sk.groupBy(F.col("event_type").alias("__et")).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("long")
        .alias("__approx")
    )
    exact = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").cast("long").alias("n_distinct_exact"))
    )
    # null-SAFE join: NULL event_type is a real group in both the
    # sketch view and the exact rollup (parquet-resident NULL fixture)
    return (
        exact.join(
            F.broadcast(approx),
            F.col("event_type").eqNullSafe(F.col("__et")),
        )
        .select(
            "event_type",
            "n_distinct_exact",
            (
                F.abs(F.col("__approx") - F.col("n_distinct_exact"))
                <= F.greatest(
                    F.lit(3.0), F.col("n_distinct_exact") * F.lit(0.06)
                )
            ).alias("sketch_ok"),
        )
    )


@register(
    "events_ctr_by_day",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0) AS n_clicks,
           COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END), 0) AS n_views,
           CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0) AS DOUBLE)
             / NULLIF(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END), 0), 0)
             AS ctr
    FROM events GROUP BY 1
    """,
    "dividing one series by another (reference future-work dashboard "
    "post-processing, docs/design-stateful.md:154-171): per-day "
    "click-through rate as conditional counts in ONE aggregation pass "
    "— never two scans joined; the ratio is a single integer division "
    "(deterministic), NULL on zero-view days",
)
def events_ctr_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    clicks = F.coalesce(
        F.sum(F.when(F.col("event_type") == "click", 1)), F.lit(0)
    )
    views = F.coalesce(F.sum(F.when(F.col("event_type") == "view", 1)), F.lit(0))
    return (
        e.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            clicks.alias("n_clicks"),
            views.alias("n_views"),
            (clicks.cast("double") / F.nullif(views, F.lit(0))).alias("ctr"),
        )
    )


@register(
    "events_cube_type_uid_bucket",
    """
    SELECT event_type, CAST(FLOOR(user_id / 50) * 50 AS BIGINT) AS uid_bucket,
           CAST(GROUPING(event_type) AS BIGINT)*2
             + CAST(GROUPING(CAST(FLOOR(user_id / 50) * 50 AS BIGINT)) AS BIGINT)
             AS gid,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY CUBE(event_type, CAST(FLOOR(user_id / 50) * 50 AS BIGINT))
    """,
    "full cube over (type, user bucket): all four grouping sets in one "
    "pass — the cross-tab the reference would need four separate index "
    "metrics to serve; grouping_id disambiguates the NULL semantics",
)
def events_cube_type_uid_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "uid_bucket", (F.floor(F.col("user_id") / 50) * 50).cast("long")
    )
    return ev.cube("event_type", "uid_bucket").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@register(
    "orders_above_customer_avg",
    """
    SELECT o_custkey, COUNT(*) AS n_above
    FROM (SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,4)) AS p,
                 SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                   OVER (PARTITION BY o_custkey) AS s,
                 COUNT(*) OVER (PARTITION BY o_custkey) AS n
          FROM orders)
    WHERE p * n > s
    GROUP BY o_custkey
    """,
    "correlated-subquery shape (orders above their own customer's "
    "average) flattened to one window pass — no per-row subquery, one "
    "custkey shuffle; the comparison is price*n > sum, decimal-exact, "
    "so no float-average threshold can disagree between engines",
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey")
    # prices ride as exact e4 longs (the q1 discipline): decimal(18,4)
    # is a multiple of 1e-4, the recode is lossless per row, and
    # p*n > s compares the same exact integers the decimal form did —
    # the window sum's state narrows to an 8-byte long
    p4 = (_dec4("o_totalprice") * F.lit(10_000)).cast("long")
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        p4.alias("p"),
        F.sum(p4).over(w).alias("s"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return (
        o.filter(F.col("p") * F.col("n") > F.col("s"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_above"))
    )


@register(
    "events_daily_moving_stats",
    """
    WITH d AS (SELECT CAST(FLOOR(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
                      COUNT(*) AS n
               FROM events GROUP BY 1)
    SELECT day, n,
           CAST(SUM(n) OVER w AS BIGINT) AS sum_7d,
           CAST(SUM(n) OVER w AS DOUBLE) / COUNT(*) OVER w AS avg_7d
    FROM d
    WINDOW w AS (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    "moving 7-day window with an explicit RANGE frame (value-based, so "
    "calendar gaps shrink the frame rather than sliding over them); "
    "runs on the pre-aggregated daily series — one row per day — so "
    "the global ordering the frame needs is over days, never raw rows",
)
def events_daily_moving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.floor(ts_micros("ts") / 86_400_000_000).cast("long").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.orderBy("day").rangeBetween(-6, 0)
    return d.select(
        "day",
        "n",
        F.sum("n").over(w).cast("long").alias("sum_7d"),
        (F.sum("n").over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
            "avg_7d"
        ),
    )


from dragnet_spark.buckets import quantize, quantize_sql  # noqa: E402


@register(
    "events_interarrival_histogram",
    f"""
    WITH g AS (
      SELECT user_id,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id)
               - epoch_us(ts) AS gap_us
      FROM events
    )
    SELECT {quantize_sql('(gap_us / 1000000)')} AS gap_bucket_s,
           COUNT(*) AS n
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY 1
    """,
    "inter-arrival time distribution: lead() gap per user, bucketed "
    "with the reference's power-of-two quantize — composes the DTrace "
    "histogram semantics (A3) with a window function; one user_id "
    "shuffle then a tiny bucket aggregation",
)
def events_interarrival_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("tus", "event_id")
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", ts_micros("ts").alias("tus")
    )
    g = e.withColumn("gap_us", F.lead("tus").over(w) - F.col("tus")).filter(
        F.col("gap_us").isNotNull()
    )
    return (
        g.groupBy(
            quantize(F.col("gap_us") / 1_000_000).alias("gap_bucket_s")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "embedding_dim_stats",
    """
    SELECT label, CAST(u.i - 1 AS INT) AS dim,
           CAST(MIN(embedding[u.i]) AS DOUBLE) AS min_v,
           CAST(MAX(embedding[u.i]) AS DOUBLE) AS max_v
    FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)
    GROUP BY label, u.i
    """,
    "per-dimension value ranges per label (feature-drift / "
    "normalization audit): posexplode keeps (label, dim) keys only in "
    "the shuffle, and MIN/MAX are order-independent so float parity is "
    "exact — no summation to disagree on",
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("dim", "x")
    )
    return ex.groupBy("label", F.col("dim").cast("int").alias("dim")).agg(
        F.min("x").cast("double").alias("min_v"),
        F.max("x").cast("double").alias("max_v"),
    )




from dragnet_spark.ops.profile import profile_sql, profile_table  # noqa: E402

_EVENTS_PROFILE_COLS = {
    "event_id": "num", "ts": "time", "user_id": "num",
    "event_type": "str", "value": "num", "props": "str",
}


@register(
    "events_profile",
    profile_sql("events", _EVENTS_PROFILE_COLS),
    "one-scan table profiler: per-column nulls/distincts/ranges for "
    "the whole table in a single pass (multi-count_distinct Expand — "
    "the naive form is one 100 TB scan PER column); time ranges via "
    "the sanctioned epoch-micros recipe, numeric ranges as exact-"
    "below-2^53 doubles, string ranges lexicographic",
)
def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_table(_t(spark, sf_dir, "events"))
