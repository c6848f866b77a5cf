"""Capture the pagerank SETUP lineage plans (r15 evidence).

The benched query's final plan reads the per-round localCheckpoint
(Scan ExistingRDD) in both code states, so the change is invisible
there; the evidence is the plan of the setup pass itself — the
initial rank-state lineage as built from the benched pair generation:

  before: sym = union of two branches over the eagerly persisted edge
          table (a separate edges.count() materialization job paid
          the pair lineage first), then ids ⋈ deg plus a separate
          ids.count() job
  after:  sym = explode(array(fwd, rev)) over the pair lineage — one
          reference, no pre-materialization job — and n rides the
          initial checkpoint's observe (no ids.count() job)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dragnet_spark.session import get_spark  # noqa: E402
from dragnet_spark.registry.curation import _t, _JACCARD_T, _NGRAM  # noqa: E402
from dragnet_spark.ops.dedup import ngram_jaccard_pairs  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r15")


def explain(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main():
    spark = get_spark()
    docs = _t(spark, SF_DIR, "documents")
    edges = ngram_jaccard_pairs(
        docs, "text", "doc_id", threshold=_JACCARD_T, ngram=_NGRAM
    )
    ids = docs.select(F.col("doc_id").alias("id"))

    # BEFORE: two-branch union symmetrize (lazy form of the old code —
    # the old code additionally persisted edges and ran edges.count()
    # and ids.count() as separate jobs before this)
    sym_old = (
        edges.select(F.col("id_a").alias("s"), F.col("id_b").alias("d"))
        .union(edges.select(F.col("id_b").alias("s"), F.col("id_a").alias("d")))
        .repartition("s")
        .distinct()
    )
    deg_old = sym_old.groupBy(F.col("s").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    setup_old = ids.join(deg_old, "id", "left").select(
        "id", "deg", F.lit(10**12 // 5000).alias("r")
    )
    with open(os.path.join(OUT, "pagerank_setup_before.txt"), "w") as f:
        f.write(
            "NOTE: lazy lineage of the OLD setup; the old code ALSO ran\n"
            "edges.persist()+count() (one full pair-gen pass materialized\n"
            "to cache) and ids.count() as separate jobs before this plan\n"
            "executed over the cached edges. Without that pre-\n"
            "materialization the two union branches below each embed the\n"
            "full pair-generation lineage:\n\n"
        )
        f.write(explain(setup_old))
    print("wrote pagerank_setup_before.txt")

    # AFTER: explode symmetrize, single edge-lineage reference
    sym_new = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("id_a").alias("s"), F.col("id_b").alias("d")),
                    F.struct(F.col("id_b").alias("s"), F.col("id_a").alias("d")),
                )
            ).alias("e")
        )
        .select("e.s", "e.d")
        .repartition("s")
        .distinct()
    )
    deg_new = sym_new.groupBy(F.col("s").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    setup_new = ids.join(deg_new, "id", "left")
    with open(os.path.join(OUT, "pagerank_setup_after.txt"), "w") as f:
        f.write(
            "NOTE: the NEW setup lineage — the ONLY setup job: the edge\n"
            "lineage appears once under Generate(explode); n and n_dang\n"
            "ride this job's observe, so the separate edges.count() and\n"
            "ids.count() jobs are gone.\n\n"
        )
        f.write(explain(setup_new))
    print("wrote pagerank_setup_after.txt")
    spark.stop()


if __name__ == "__main__":
    main()
