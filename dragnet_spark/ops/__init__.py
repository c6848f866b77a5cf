"""Beyond-reference operators for large-scale training-data pipelines.

The reference stops at filter→group→count; these modules add the
operations a 100 TB data-curation pipeline needs: deduplication
(exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity search over
embeddings, text analysis (language ID, quality scoring, token
counting, fingerprinting), and multimodal binary-column plumbing.

All hot paths are built-in Spark expressions (codegen'd, shuffle-
friendly, no driver-side state); Pandas UDFs appear only where
vectorized Python is genuinely needed (multimodal decode stubs,
blocked matrix similarity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Ensure CPU-heavy per-row stages (minhash over shingles, plane
    signatures, simhash bits) use every core: a small input that
    arrived as one or two file splits is round-robin repartitioned to
    the cluster's default parallelism. At real scale inputs already
    carry more partitions than cores, so this is a no-op — the 100 TB
    path stays shuffle-free."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
