"""Measure (a) q1's scan vs decimal-agg split, (b) pagerank setup vs rounds."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dragnet_spark.session import get_spark  # noqa: E402
from dragnet_spark.registry import queries  # noqa: E402
from dragnet_spark.registry.curation import _t, _JACCARD_T, _NGRAM  # noqa: E402
from dragnet_spark.ops.dedup import ngram_jaccard_pairs  # noqa: E402
from dragnet_spark.ops.graph import pagerank  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(label, fn, reps=5):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:50s} min {best:7.3f} s", flush=True)
    return best


def main():
    spark = get_spark()
    # --- q1 split ---
    li = _t(spark, SF_DIR, "lineitem")
    cols = ["l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_shipdate"]
    flt = F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp")
    timeit("q1: scan only (noop cols)", lambda: noop(li.select(cols).filter(flt)))

    def _dec4(c):
        return F.col(c).cast("decimal(18,4)")

    def dec_agg():
        one = F.lit(1).cast("decimal(18,4)")
        dp = (_dec4("l_extendedprice") * (one - _dec4("l_discount"))).cast("decimal(18,6)")
        ch = (dp * (one + _dec4("l_tax"))).cast("decimal(18,6)")
        return (li.filter(flt).groupBy("l_returnflag", "l_linestatus")
                .agg(F.sum(_dec4("l_quantity")), F.sum(_dec4("l_extendedprice")),
                     F.sum(dp), F.sum(ch), F.count(F.lit(1))))

    timeit("q1: scan+decimal agg", lambda: noop(dec_agg()))

    def long_agg():
        # e-unit long sums: each decimal(18,4) value is an exact
        # multiple of 1e-4, so sum(long(v*1e4)) == sum(v)*1e4 exactly
        q4 = (F.col("l_quantity").cast("decimal(18,4)") * 10000).cast("long")
        e4 = (F.col("l_extendedprice").cast("decimal(18,4)") * 10000).cast("long")
        one = F.lit(1).cast("decimal(18,4)")
        dp = ((F.col("l_extendedprice").cast("decimal(18,4)")
               * (one - F.col("l_discount").cast("decimal(18,4)"))).cast("decimal(18,6)")
              * 1000000).cast("long")
        return (li.filter(flt).groupBy("l_returnflag", "l_linestatus")
                .agg(F.sum(q4), F.sum(e4), F.sum(dp), F.count(F.lit(1))))

    timeit("q1: scan+long-e-unit agg (3 sums)", lambda: noop(long_agg()))

    q1 = queries()["q1_pricing_summary"]
    timeit("q1: full query as benched", lambda: noop(q1(spark, SF_DIR)))

    # --- pagerank iterations split ---
    docs = _t(spark, SF_DIR, "documents")

    def pairs_df():
        return ngram_jaccard_pairs(docs, "text", "doc_id",
                                   threshold=_JACCARD_T, ngram=_NGRAM)

    edges = pairs_df().localCheckpoint(eager=True)
    for it in (0, 1, 2, 4):
        try:
            timeit(f"pagerank loop, iterations={it}",
                   lambda it=it: noop(pagerank(docs, edges, id_col="doc_id",
                                               iterations=it)), reps=4)
        except Exception as e:
            print(f"iterations={it}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
