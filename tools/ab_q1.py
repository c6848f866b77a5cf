"""Interleaved A/B: q1 decimal-sum (old) vs long-e-unit-sum (new)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dragnet_spark.session import get_spark  # noqa: E402
from dragnet_spark.registry import queries  # noqa: E402
from dragnet_spark.registry._base import _dec4, _t  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 9


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def old_q1(spark, sf_dir):
    one = F.lit(1).cast("decimal(18,4)")
    disc_price = (_dec4("l_extendedprice") * (one - _dec4("l_discount"))).cast(
        "decimal(18,6)"
    )
    charge = (disc_price * (one + _dec4("l_tax"))).cast("decimal(18,6)")

    def e_double(agg, s):
        return (agg * F.lit(10 ** s)).cast("long").cast("double") / F.lit(
            float(10 ** s)
        )

    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            e_double(F.sum(_dec4("l_quantity")), 4).alias("sum_qty"),
            e_double(F.sum(_dec4("l_extendedprice")), 4).alias("sum_base_price"),
            e_double(F.sum(disc_price), 6).alias("sum_disc_price"),
            e_double(F.sum(charge), 6).alias("sum_charge"),
            (e_double(F.sum(_dec4("l_quantity")), 4) / F.count(F.lit(1))).alias(
                "avg_qty"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def main():
    spark = get_spark()
    new_q1 = queries()["q1_pricing_summary"]
    old_rows = sorted(map(tuple, old_q1(spark, SF_DIR).collect()))
    new_rows = sorted(map(tuple, new_q1(spark, SF_DIR).collect()))
    assert old_rows == new_rows, (old_rows, new_rows)
    print("rows identical", flush=True)
    ts = {"old": [], "new": []}
    for _ in range(REPS):
        for tag, fn in (("old", old_q1), ("new", new_q1)):
            t0 = time.perf_counter()
            noop(fn(spark, SF_DIR))
            ts[tag].append(time.perf_counter() - t0)
    for tag in ("old", "new"):
        v = sorted(ts[tag])
        print(f"q1 {tag}: min {v[0]:.3f} med {v[len(v)//2]:.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
