"""Interleaved A/B of the graph edge-prep/setup change (r15).

Loads the OLD graph module (pre-change, from /tmp/graph_old.py, i.e.
`git show HEAD:dragnet_spark/ops/graph.py`) alongside the new one and
alternates old/new end-to-end runs of pagerank / trustrank /
connected_components over the benched lineage in ONE session, so box
drift cancels. Also asserts rank/label checksums are bit-identical.
"""
import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dragnet_spark.session import get_spark  # noqa: E402
from dragnet_spark.registry.curation import _t, _JACCARD_T, _NGRAM  # noqa: E402
from dragnet_spark.ops.dedup import ngram_jaccard_pairs  # noqa: E402
from dragnet_spark.ops import graph as graph_new  # noqa: E402

spec = importlib.util.spec_from_file_location("graph_old", "/tmp/graph_old.py")
graph_old = importlib.util.module_from_spec(spec)
spec.loader.exec_module(graph_old)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "6"))
ONLY = set(
    q for q in os.environ.get("AB_ONLY", "").split(",") if q
)  # e.g. AB_ONLY=pagerank,trustrank


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark()
    docs = _t(spark, SF_DIR, "documents")

    def pairs_df():
        return ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=_JACCARD_T, ngram=_NGRAM
        )

    seeds = docs.filter(F.col("doc_id") % 17 == 0).select("doc_id")

    def pr(mod):
        return mod.pagerank(docs, pairs_df(), id_col="doc_id")

    def tr(mod):
        return mod.personalized_pagerank(docs, pairs_df(), seeds, id_col="doc_id")

    def cc(mod):
        return mod.connected_components(
            docs.select("doc_id"), pairs_df(), id_col="doc_id"
        )

    # checksum equality first
    for label, fn, col in (("pagerank", pr, "pagerank"),
                           ("trustrank", tr, "trustrank"),
                           ("components", cc, "component")):
        if ONLY and label not in ONLY:
            continue
        agg = [F.count(F.lit(1)), F.sum(F.hash("id", col).cast("long"))]
        old = fn(graph_old).agg(*agg).collect()[0]
        new = fn(graph_new).agg(*agg).collect()[0]
        assert tuple(old) == tuple(new), (label, tuple(old), tuple(new))
        print(f"checksum {label}: identical {tuple(new)}", flush=True)

    for label, fn in (("pagerank", pr), ("trustrank", tr), ("components", cc)):
        if ONLY and label not in ONLY:
            continue
        ts = {"old": [], "new": []}
        for _ in range(REPS):
            for tag, mod in (("old", graph_old), ("new", graph_new)):
                t0 = time.perf_counter()
                noop(fn(mod))
                ts[tag].append(time.perf_counter() - t0)
        for tag in ("old", "new"):
            v = sorted(ts[tag])
            med = v[len(v) // 2]
            print(f"{label:11s} {tag}: min {v[0]:.3f} med {med:.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
