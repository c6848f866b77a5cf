"""Registry family module (split from registry.py; see _base)."""
from __future__ import annotations

from dragnet_spark.registry._base import DataFrame, F, SparkSession, _dec4, _t, register  # noqa: F401

# ---------------------------------------------------------------------------
# Analytics breadth (beyond reference §2.5 future work): outer/anti
# joins, scalar subqueries, HAVING, conditional aggregation — the
# TPC-H shapes q13/q14/q18/q22 that exercise join strategies the
# earlier q1/q3/q5 family does not.
# ---------------------------------------------------------------------------


@register(
    "q13_customer_order_distribution",
    """
    SELECT n_orders, COUNT(*) AS n_customers FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) GROUP BY n_orders
    """,
    "TPC-H Q13 shape: left outer join preserving order-less customers, "
    "then a distribution over the per-customer counts (two-level agg; "
    "first agg is pre-shuffled by the join key so it adds no exchange)",
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


_INACTIVE_YEAR = ("1997-01-01 00:00:00", "1998-01-01 00:00:00")


@register(
    "customers_inactive_1997",
    f"""
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '{_INACTIVE_YEAR[0]}'
                        AND o_orderdate <  TIMESTAMP '{_INACTIVE_YEAR[1]}')
    GROUP BY c_mktsegment
    """,
    "NOT EXISTS as left-anti join: customers with no orders in 1997 "
    "(the filter narrows the right side before the anti join so only "
    "the relevant year's orderkeys shuffle)",
)
def customers_inactive_1997(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders97 = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_INACTIVE_YEAR[0]).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_INACTIVE_YEAR[1]).cast("timestamp"))
    )
    return (
        cust.join(orders97, cust.c_custkey == orders97.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec4("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


@register(
    "q14_promo_revenue_share",
    """
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
           CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                THEN CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                     * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                     AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END)
                * 1000000 AS BIGINT) AS DOUBLE) / 1000000 AS promo_revenue,
           CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE)
                / 1000000 AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
    "TPC-H Q14 shape: conditional aggregation over a fact-dim join; "
    "part is broadcast so the lineitem side never shuffles. Money "
    "leaves as e6 BIGINT → double ÷ 1e6 (the q1 discipline): a direct "
    "decimal→double cast is 1-ulp off vs DuckDB once monthly sums "
    "reach 17 significant digits — caught by the 100× tier",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    one = F.lit(1).cast("decimal(18,4)")
    disc_price = (_dec4("l_extendedprice") * (one - _dec4("l_discount"))).cast(
        "decimal(18,6)"
    )
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    # per-row exact e6 recode (the q1 discipline): disc_price is a
    # decimal(18,6), an exact multiple of 1e-6, so (v * 1e6) cast long
    # is lossless per row and SUM(long) equals the old
    # (SUM(decimal) * 1e6) cast BIGINT whenever that cast itself fits
    # — which the query's e-integer contract already requires. The
    # aggregation state narrows from overflow-checked decimals to
    # 8-byte longs (guide §2.3); per-row decimal rounding is unchanged
    disc_e6 = (disc_price * F.lit(1_000_000)).cast("long")

    def e6_double(agg):
        return agg.cast("double") / F.lit(1_000_000.0)

    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").cast("date").alias("month"))
        .agg(
            e6_double(
                F.sum(
                    F.when(F.col("p_type") == "PROMO", disc_e6).otherwise(
                        F.lit(0).cast("long")
                    )
                )
            ).alias("promo_revenue"),
            e6_double(F.sum(disc_e6)).alias("total_revenue"),
        )
    )


_Q18_MIN_QTY = 150


@register(
    "q18_large_volume_orders",
    f"""
    SELECT c_name, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_name, o_orderkey, o_orderdate
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > {_Q18_MIN_QTY}
    """,
    "TPC-H Q18 shape: HAVING on a grouped sum across a 3-way join; "
    "aggregating lineitem by orderkey *before* joining orders/customer "
    "shrinks the probe side to the few qualifying orders",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # pre-aggregate + HAVING first: the join then only sees qualifying
    # orderkeys instead of every lineitem row
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec4("l_quantity")).alias("_sum_qty"))
        .filter(F.col("_sum_qty") > _Q18_MIN_QTY)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.col("_sum_qty").cast("double").alias("sum_qty"),
        )
    )


@register(
    "q22_idle_high_balance",
    f"""
    WITH stats AS (SELECT COUNT(*) AS n, SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS s
                   FROM customer WHERE c_acctbal > 0)
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
    FROM customer, stats
    WHERE CAST(c_acctbal AS DECIMAL(18,4)) * n > s
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '{_INACTIVE_YEAR[0]}'
                        AND o_orderdate <  TIMESTAMP '{_INACTIVE_YEAR[1]}')
    GROUP BY c_mktsegment
    """,
    "TPC-H Q22 shape: scalar-subquery threshold (above-average balance) "
    "+ anti join. The average is compared as balance*count > sum — all "
    "decimal-exact, no float division to disagree on — and the 1-row "
    "stats side is a broadcast cross join",
)
def q22_idle_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    stats = cust.filter(F.col("c_acctbal") > 0).agg(
        F.count(F.lit(1)).alias("n"), F.sum(_dec4("c_acctbal")).alias("s")
    )
    orders97 = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_INACTIVE_YEAR[0]).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_INACTIVE_YEAR[1]).cast("timestamp"))
    )
    return (
        cust.join(F.broadcast(stats))
        .filter(_dec4("c_acctbal") * F.col("n") > F.col("s"))
        .join(orders97, F.col("c_custkey") == orders97.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec4("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


