"""Materialized fingerprint store: incremental exact-dedup for
continuous ingest — the build-once index pattern (index/build.py,
index/vector.py) applied to document identity.

A 100 TB corpus under continuous ingest cannot re-fingerprint itself
for every arriving batch. The store persists ONLY ``(fingerprint,
doc_id)`` — ~45 bytes/doc vs the corpus text — partitioned by the
fingerprint's first hex byte (256 buckets), so:

* **probe**: an arriving batch fingerprints itself (narrow map), joins
  the store on ``(fp_bucket, fp)``, and reports which new docs
  duplicate an existing one. The store side is pre-bucketed by the
  join key's prefix; a broadcast probe side enables dynamic partition
  pruning of untouched buckets, and the corpus TEXT is never read.
* **append**: survivors' fingerprints append into the same bucket
  layout (partition overwrite per bucket), keeping the store one
  cheap compaction away from optimal file counts — the event index's
  compaction discipline.

Reference parity: dragnet's index answers metric queries without
rescanning raw NDJSON (lib/dn.js build → index-scan); this store
answers "have we seen this document?" without rescanning corpus text.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dragnet_spark.ops import text as _text

STORE_DIR = "fingerprints"


def build_fingerprint_store(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize ``(fp_bucket, fp, doc_id)`` for every document."""
    (
        docs.select(
            _text.fingerprint(text_col).alias("fp"),
            F.col(id_col).alias("doc_id"),
        )
        .withColumn("fp_bucket", F.substring("fp", 1, 2))
        .write.mode("overwrite")
        .partitionBy("fp_bucket")
        .parquet(os.path.join(path, STORE_DIR))
    )


def append_fingerprints(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Append a new batch's fingerprints into the same bucket layout."""
    (
        docs.select(
            _text.fingerprint(text_col).alias("fp"),
            F.col(id_col).alias("doc_id"),
        )
        .withColumn("fp_bucket", F.substring("fp", 1, 2))
        .write.mode("append")
        .partitionBy("fp_bucket")
        .parquet(os.path.join(path, STORE_DIR))
    )


#: Above this many probe rows the batch is no longer "small": a forced
#: broadcast would collect it all to the driver. ~45 B/row of
#: fingerprint+id keeps 2M rows under ~100 MB serialized — within
#: Spark's default broadcast comfort zone with headroom.
MAX_BROADCAST_PROBES = 2_000_000


def probe_new_documents(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_broadcast_probes: int = MAX_BROADCAST_PROBES,
) -> DataFrame:
    """(doc_id, fp, dup_of, is_duplicate) for an arriving batch.

    ``dup_of`` is the minimum existing doc_id sharing the fingerprint
    (NULL for fresh docs). The probe side is broadcast only when its
    fingerprint projection is small (≤ ``max_broadcast_probes`` rows,
    counted on the narrow (id, fp) projection — the text column never
    materializes for the count): Spark's dynamic partition pruning
    then skips store buckets the batch doesn't hash into. A larger
    batch falls back to a shuffle hash join on (fp_bucket, fp) — the
    store is already bucketed by the key prefix — instead of
    collecting an unbounded batch through the driver.
    """
    store = spark.read.parquet(os.path.join(path, STORE_DIR)).select(
        "fp_bucket", "fp", F.col("doc_id").alias("existing_id")
    )
    probes = new_docs.select(
        F.col(id_col).alias("doc_id"),
        _text.fingerprint(text_col).alias("fp"),
    ).withColumn("fp_bucket", F.substring("fp", 1, 2))
    # Size gate: limit(n+1).count() touches at most n+1 narrow rows —
    # it never pays for the full batch when the batch is huge.
    small = (
        probes.limit(max_broadcast_probes + 1).count()
        <= max_broadcast_probes
    )
    probe_side = F.broadcast(probes) if small else probes
    hits = (
        store.join(probe_side, ["fp_bucket", "fp"])
        .groupBy("doc_id", "fp")
        .agg(F.min("existing_id").alias("dup_of"))
    )
    return (
        probes.select("doc_id", "fp")
        .join(hits, ["doc_id", "fp"], "left")
        .select(
            "doc_id",
            "fp",
            "dup_of",
            F.col("dup_of").isNotNull().alias("is_duplicate"),
        )
    )
