"""Profile the pair-gen vs downstream split of the graph-family queries.

Times, in ONE session with noop sinks (guide §1.4):
  - ngram_jaccard_pairs alone
  - pagerank / trustrank / clustering end-to-end (as benched)
  - the same downstream ops over a pre-materialized edge table
so the wall can be attributed to pair generation vs the loop itself.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dragnet_spark.session import get_spark  # noqa: E402
from dragnet_spark.registry.curation import _t, _JACCARD_T, _NGRAM  # noqa: E402
from dragnet_spark.ops.dedup import ngram_jaccard_pairs  # noqa: E402
from dragnet_spark.ops.graph import (  # noqa: E402
    pagerank,
    personalized_pagerank,
    clustering_coefficients,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(label, fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:45s} min {best:7.3f} s", flush=True)
    return best


def main():
    spark = get_spark()
    docs = _t(spark, SF_DIR, "documents")

    def pairs_df():
        return ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=_JACCARD_T, ngram=_NGRAM
        )

    spark.sparkContext.setJobDescription("profile: pairs alone")
    timeit("ngram_jaccard_pairs (noop)", lambda: noop(pairs_df()))

    spark.sparkContext.setJobDescription("profile: pagerank end-to-end")
    timeit(
        "pagerank end-to-end",
        lambda: noop(pagerank(docs, pairs_df(), id_col="doc_id")),
    )

    spark.sparkContext.setJobDescription("profile: trustrank end-to-end")
    seeds = docs.filter(F.col("doc_id") % 17 == 0).select("doc_id")
    timeit(
        "trustrank end-to-end",
        lambda: noop(
            personalized_pagerank(docs, pairs_df(), seeds, id_col="doc_id")
        ),
    )

    spark.sparkContext.setJobDescription("profile: clustering end-to-end")
    timeit(
        "clustering end-to-end",
        lambda: noop(clustering_coefficients(pairs_df())),
    )

    # pre-materialized edges: isolate the downstream cost
    edges = pairs_df().localCheckpoint(eager=True)
    spark.sparkContext.setJobDescription("profile: loops on materialized edges")
    timeit("pagerank loop only", lambda: noop(pagerank(docs, edges, id_col="doc_id")))
    timeit(
        "trustrank loop only",
        lambda: noop(personalized_pagerank(docs, edges, seeds, id_col="doc_id")),
    )
    timeit("clustering only", lambda: noop(clustering_coefficients(edges)))
    spark.stop()


if __name__ == "__main__":
    main()
