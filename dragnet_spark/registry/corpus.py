"""Registry family module (split from registry.py; see _base)."""
from __future__ import annotations

from dragnet_spark.registry._base import DataFrame, F, QueryConfig, SparkSession, W, _t, register  # noqa: F401
from dragnet_spark.registry.curation import _text  # noqa: F401
from dragnet_spark.registry.indexes import _indexed  # noqa: F401
from dragnet_spark.registry.temporal import _SPLIT_TEST, _SPLIT_VAL  # noqa: F401

# ---------------------------------------------------------------------------
# Corpus indexing & leakage family: tf-idf relevance, n-gram language
# stats, inverted index, train/test contamination. All outputs are
# integers/strings or single IEEE divisions so the hash compare can
# never trip on summation order or libm ulp drift.
# ---------------------------------------------------------------------------

from dragnet_spark.ops.sampling import (  # noqa: E402
    cross_split_contamination,
    cross_split_contamination_sql,
)
from dragnet_spark.ops.text import (  # noqa: E402
    shingle_postings,
    shingle_postings_sql,
    tfidf_top_terms,
    tfidf_top_terms_sql,
)


@register(
    "text_tfidf_top_terms",
    tfidf_top_terms_sql("text", k=3),
    "top-3 distinguishing terms per document by tf/df (linear-idf "
    "tf-idf: one integer division keeps the ranking bit-reproducible "
    "across engines); tf reused for df so the corpus is read once",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_top_terms(_t(spark, sf_dir, "documents"), "text", "doc_id", k=3)


@register(
    "text_top_bigrams_per_lang",
    f"""
    WITH sh AS (SELECT lang, s.bg
                FROM documents, UNNEST({_text.shingles_sql("text", 2)}) AS s(bg)),
    cnt AS (SELECT lang, bg AS bigram, COUNT(*) AS n FROM sh GROUP BY lang, bg)
    SELECT * FROM (
      SELECT lang, bigram, n,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                     ORDER BY n DESC, bigram) AS INT) AS rank
      FROM cnt
    ) WHERE rank <= 5
    """,
    "top-5 bigrams per language: n-gram frequency stats + per-group "
    "top-k — partial aggregation collapses repeats map-side, the "
    "window shuffles only (lang, bigram, n) triples",
)
def text_top_bigrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dragnet_spark.ops.text import shingles

    from dragnet_spark.ops import spread

    doc = spread(_t(spark, sf_dir, "documents"))
    cnt = (
        doc.select("lang", F.explode(shingles("text", 2)).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("lang").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        cnt.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
    )


@register(
    "text_shingle_postings",
    shingle_postings_sql("text", ngram=3, min_df=2, max_df=5),
    "inverted index over rare 3-shingles (df in [2,5]): sorted posting "
    "lists, df-banded so no posting list exceeds max_df — common "
    "shingles never reach the collect",
)
def text_shingle_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shingle_postings(
        _t(spark, sf_dir, "documents"), "text", "doc_id", ngram=3, min_df=2, max_df=5
    )


@register(
    "split_leakage_report",
    cross_split_contamination_sql("text", _SPLIT_TEST, _SPLIT_VAL),
    "train/test contamination: test docs sharing >=3 rare shingles "
    "with a train doc — near-dup leakage that exact-dup checks miss; "
    "df-capped shingle join bounds fanout (winnowing discipline), the "
    "shuffle carries only (shingle, id, split)",
)
def split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cross_split_contamination(
        _t(spark, sf_dir, "documents"), "text", "doc_id", _SPLIT_TEST, _SPLIT_VAL
    )


@register(
    "index_month_rollup_cascade",
    """
    SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
           COUNT(*) AS value
    FROM events GROUP BY 1
    """,
    "cascading time rollup (hypertable continuous-aggregate pattern): "
    "monthly counts derived by re-aggregating the *materialized* daily "
    "view — the raw table is never rescanned; correctness comes from "
    "the weighted-count closure (A5/A6). Oracle is the raw-scan "
    "equivalent, proving the cascade loses nothing.",
)
def index_month_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dragnet_spark.index import query_index

    day = query_index(
        spark,
        _indexed(spark, sf_dir),
        QueryConfig.load("day[date,field=ts,aggr=lquantize,step=86400]"),
    )
    return (
        day.select(
            F.date_trunc("month", F.timestamp_seconds(F.col("day")))
            .cast("date")
            .alias("month"),
            "value",
        )
        .groupBy("month")
        .agg(F.sum("value").cast("long").alias("value"))
    )




from dragnet_spark.ops.text import bm25_rank, bm25_rank_sql  # noqa: E402

_BM25_TERMS = ["spark", "window", "scan"]


@register(
    "text_bm25_rank",
    bm25_rank_sql("text", _BM25_TERMS, k=10),
    "top-10 documents for a 3-term keyword query, BM25 (k1=1.2, "
    "b=0.75) with linear idf: every per-term score is one IEEE "
    "division of two exact BIGINT products and the doc score adds "
    "terms in fixed query order (conditional pivot), so the ranking "
    "is bit-reproducible across engines; tokens filter to the query "
    "terms BEFORE aggregation so only matching tokens shuffle, and "
    "the global rank is the distributed range-sort (ops/rank.py), "
    "never a single-partition window",
)
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_rank(
        _t(spark, sf_dir, "documents"), "text", "doc_id", _BM25_TERMS, k=10
    )


from dragnet_spark.ops.sketch import kmv_distinct, kmv_distinct_sql  # noqa: E402

_KMV_K = 256


def _vocab_kmv_oracle() -> str:
    toks = _text.tokens_sql("text")
    est = kmv_distinct_sql(
        "tok",
        ["source"],
        f"SELECT source, unnest({toks}) AS tok FROM documents",
        k=_KMV_K,
    )
    return f"""
    WITH est AS ({est}),
    ex AS (
      SELECT source, COUNT(DISTINCT t.tok) AS exact_distinct
      FROM documents, UNNEST({toks}) t(tok) GROUP BY source
    )
    SELECT est.source, est.est_distinct, ex.exact_distinct
    FROM est JOIN ex USING (source)
    """


_KMV_STORE_CACHE: dict[str, str] = {}


def _vocab_kmv_inc_oracle() -> str:
    from dragnet_spark.ops.sketch import kmv_distinct_sql

    toks = _text.tokens_sql("text")
    return kmv_distinct_sql(
        "tok",
        ["source"],
        f"SELECT source, unnest({toks}) AS tok FROM documents",
        k=_KMV_K,
    )


@register(
    "vocab_kmv_incremental",
    _vocab_kmv_inc_oracle(),
    "continuous-ingest vocabulary census: the corpus slice "
    "(doc_id%4≠0) builds a persisted bottom-k KMV store "
    "(index/kmv.py), the arriving slice (doc_id%4=0) FOLDS in as a "
    "batch (lease-guarded sketch merge — two sketch-sized sides, the "
    "batch reduces to ≤k rows per group before touching the store), "
    "and the estimate reads off the swapped sketch. Bottom-k merges "
    "exactly, so the fold is bit-identical to the one-shot sketch "
    "over ALL documents — which is what the oracle computes",
)
def vocab_kmv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from dragnet_spark.index.kmv import (
        build_kmv_store,
        kmv_store_estimate,
        merge_kmv_batch,
    )
    from dragnet_spark.ops.text import tokens

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.explode(tokens("text")).alias("tok")
    )
    if sf_dir not in _KMV_STORE_CACHE:
        path = tempfile.mkdtemp(prefix="dragnet_kmv_")
        build_kmv_store(
            spark,
            toks.filter(F.col("doc_id") % 4 != 0),
            path,
            "tok",
            ["source"],
            k=_KMV_K,
        )
        merge_kmv_batch(spark, toks.filter(F.col("doc_id") % 4 == 0), path)
        _KMV_STORE_CACHE[sf_dir] = path
    return kmv_store_estimate(spark, _KMV_STORE_CACHE[sf_dir])

@register(
    "corpus_vocab_kmv",
    _vocab_kmv_oracle(),
    "per-source vocabulary census via the KMV bottom-k sketch "
    "(k=256): deterministic md5-prefix order statistics make a "
    "CARDINALITY ESTIMATOR value-hash gradable cross-engine (HLL "
    "never is — register layouts are engine-private), alongside the "
    "exact COUNT(DISTINCT) for the error to be read off. Mergeable: "
    "per-batch bottom-k partials combine exactly, so only "
    "sketch-sized rows ever shuffle (ops/sketch.py)",
)

def corpus_vocab_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dragnet_spark.ops.text import tokens

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokens("text")).alias("tok")
    )
    est = kmv_distinct(toks, "tok", ["source"], k=_KMV_K)
    exact = toks.groupBy("source").agg(
        F.countDistinct("tok").alias("exact_distinct")
    )
    return est.join(exact, "source").select(
        "source", "est_distinct", "exact_distinct"
    )


# ---------------------------------------------------------------------------
# NULL-group-key coverage: every generated table is NULL-free in its
# group keys, so the cross-engine NULL divergences the round-10 KMV fix
# exposed (Spark NULLS FIRST vs DuckDB NULLS LAST windows, dropna
# defaults, join-vs-group NULL semantics) were invisible to the oracle
# gate. These entries derive NULLs DETERMINISTICALLY inside the query —
# the same rule on both engines over the same parquet — which grades
# the NULL paths at every tier with no fixture changes: GROUP BY over a
# NULL key (a group like any other), aggregate over NULL values
# (ignored by COUNT(DISTINCT) in both engines), KMV sketching of a
# NULL-keyed group with NULL-bearing values, and the null-safe join
# (eqNullSafe / IS NOT DISTINCT FROM) a NULL group needs to survive an
# est⋈exact merge.
# ---------------------------------------------------------------------------


@register(
    "corpus_vocab_kmv_nulled",
    f"""
    WITH src AS (
      SELECT nullif(source, 'src0') AS source_n,
             nullif(t.tok, 'the') AS tok_n
      FROM documents, UNNEST({_text.tokens_sql("text")}) t(tok)
    ),
    est AS ({kmv_distinct_sql("tok_n", ["source_n"],
                              "SELECT source_n, tok_n FROM src", k=_KMV_K)}),
    ex AS (
      SELECT source_n, COUNT(DISTINCT tok_n) AS exact_distinct
      FROM src GROUP BY source_n
    )
    SELECT est.source_n, est.est_distinct, ex.exact_distinct
    FROM est JOIN ex ON est.source_n IS NOT DISTINCT FROM ex.source_n
    """,
    "the KMV census over data with REAL NULL group keys and NULL "
    "values: source 'src0' maps to a NULL group (GROUP BY keeps it in "
    "both engines; the bottom-k prune passes dropna=False), token "
    "'the' maps to a NULL value (md5(NULL) is filtered before the "
    "window — unfiltered it would sort NULLS FIRST in Spark and LAST "
    "in DuckDB and silently diverge the k-th minimum), and the "
    "est⋈exact merge uses the null-safe equality a NULL group needs "
    "to survive a join",
)
def corpus_vocab_kmv_nulled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dragnet_spark.ops.text import tokens

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.expr("nullif(source, 'src0')").alias("source_n"),
        F.explode(tokens("text")).alias("tok"),
    ).select("source_n", F.expr("nullif(tok, 'the')").alias("tok_n"))
    est = kmv_distinct(toks, "tok_n", ["source_n"], k=_KMV_K)
    exact = toks.groupBy("source_n").agg(
        F.countDistinct("tok_n").alias("exact_distinct")
    )
    return est.join(
        exact, est["source_n"].eqNullSafe(exact["source_n"])
    ).select(est["source_n"], "est_distinct", "exact_distinct")


@register(
    "events_nulled_type_rollup",
    """
    SELECT CASE WHEN event_id % 5 = 0 THEN NULL ELSE event_type END AS etype,
           COUNT(*) AS n,
           COUNT(DISTINCT CASE WHEN user_id % 11 = 0 THEN NULL
                               ELSE user_id END) AS n_users
    FROM events
    GROUP BY 1
    """,
    "scan-family rollup over a NULL-bearing group key (every 5th "
    "event's type nulled) with NULL-bearing distinct values (every "
    "11th user nulled): GROUP BY keeps the NULL group, "
    "COUNT(DISTINCT) ignores NULL values — both semantics must agree "
    "across engines for any pipeline whose real data has missing "
    "keys. Exact integers only; one partial-agg pass",
)
def events_nulled_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    etype = F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(
        F.col("event_type")
    )
    user_n = F.when(F.col("user_id") % 11 == 0, F.lit(None)).otherwise(
        F.col("user_id")
    )
    return (
        ev.select(etype.alias("etype"), user_n.alias("user_n"))
        .groupBy("etype")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_n").alias("n_users"),
        )
    )


@register(
    "docs_nulled_source_stats",
    """
    SELECT nullif(source, 'src1') AS source_n,
           COUNT(*) AS n_docs,
           SUM(n_chars) AS total_chars,
           COUNT(DISTINCT lang) AS n_langs
    FROM documents
    GROUP BY 1
    """,
    "document stats over a nulled source key (src1 -> NULL): the "
    "NULL group aggregates exactly like a named one — counts and the "
    "bigint char total are exact integers, so the hash compare "
    "proves both engines fold the NULL group identically",
)
def docs_nulled_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            F.expr("nullif(source, 'src1')").alias("source_n"),
            "n_chars",
            "lang",
        )
        .groupBy("source_n")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )
