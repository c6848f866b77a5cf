"""Registry family module (split from registry.py; see _base)."""
from __future__ import annotations

from dragnet_spark.registry._base import DataFrame, F, SparkSession, W, _dec4, _t, register  # noqa: F401

# ---------------------------------------------------------------------------
# Analytics family (beyond the reference: joins, top-k, windows —
# the reference lists these as future work, docs/design-stateful.md:154-171)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) * 10000
                AS BIGINT) AS DOUBLE) / 10000 AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000
                AS BIGINT) AS DOUBLE) / 10000 AS sum_base_price,
           CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE)
                / 1000000 AS sum_disc_price,
           CAST(CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                AS DECIMAL(18,6))
                * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4)))
                AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE)
                / 1000000 AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) * 10000
                AS BIGINT) AS DOUBLE) / 10000 / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1 shape: multi-aggregate pricing summary with decimal-"
    "exact math. The double outputs go through the e-integer "
    "discipline (exact decimal sum → e4/e6 BIGINT → double ÷ 10^s): "
    "a direct decimal→double cast is correctly rounded in one engine "
    "but not the other, which surfaces as a 1-ulp hash mismatch once "
    "the sums reach 17 significant digits (~6M rows); int64→double "
    "and ÷10^s are IEEE-deterministic in both",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    one = F.lit(1).cast("decimal(18,4)")
    disc_price = (_dec4("l_extendedprice") * (one - _dec4("l_discount"))).cast(
        "decimal(18,6)"
    )
    charge = (disc_price * (one + _dec4("l_tax"))).cast("decimal(18,6)")

    def e_long(col, s: int):
        # per-row exact e-unit recode: every decimal(18,s) value is an
        # exact multiple of 10^-s, so (v * 10^s) cast long is lossless
        # per row, and SUM(long) == (SUM(decimal) * 10^s) cast long
        # whenever the latter itself fits in int64 — which the query's
        # own e-integer contract already requires (the old form cast
        # the scaled decimal total to BIGINT). The per-row decimal
        # arithmetic (incl. each cast's HALF_UP rounding) is
        # unchanged; only the AGGREGATION runs on 8-byte longs instead
        # of 16-byte overflow-checked decimals — narrower partial-agg
        # state and ~half the sum CPU (guide §2.3 narrower types)
        return F.sum((col * F.lit(10 ** s)).cast("long"))

    def as_double(agg, s: int):
        # e-scaled BIGINT -> double / 10^s: IEEE-deterministic in both
        # engines, unlike a direct decimal->double cast (1-ulp
        # divergence vs DuckDB at 17 significant digits)
        return agg.cast("double") / F.lit(float(10 ** s))

    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            as_double(e_long(_dec4("l_quantity"), 4), 4).alias("sum_qty"),
            as_double(e_long(_dec4("l_extendedprice"), 4), 4).alias(
                "sum_base_price"
            ),
            as_double(e_long(disc_price, 6), 6).alias("sum_disc_price"),
            as_double(e_long(charge, 6), 6).alias("sum_charge"),
            (
                as_double(e_long(_dec4("l_quantity"), 4), 4)
                / F.count(F.lit(1))
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_top_revenue_orders",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    "TPC-H Q3 shape: 3-way join + agg + deterministic top-k "
    "(broadcast the dimension side; tie-broken by orderkey)",
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    one = F.lit(1).cast("decimal(18,4)")
    disc_price = (_dec4("l_extendedprice") * (one - _dec4("l_discount"))).cast(
        "decimal(18,6)"
    )
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(
            orders, li.l_orderkey == orders.o_orderkey, "inner"
        )
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_revenue_by_nation",
    """
    SELECT n_name,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    "TPC-H Q5 shape: 6-table star join, small dims broadcast, "
    "fact-fact join shuffles on orderkey",
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    one = F.lit(1).cast("decimal(18,4)")
    disc_price = (_dec4("l_extendedprice") * (one - _dec4("l_discount"))).cast(
        "decimal(18,6)"
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    supplier = _t(spark, sf_dir, "supplier")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
    )


@register(
    "top_customers_per_nation",
    """
    SELECT n_name, c_name, acctbal FROM (
      SELECT n_name, c_name,
             CAST(CAST(c_acctbal AS DECIMAL(18,4)) AS DOUBLE) AS acctbal,
             ROW_NUMBER() OVER (PARTITION BY n_name
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) WHERE rn <= 3
    """,
    "top-k per group via window row_number (reference future-work top-N, "
    "docs/design-stateful.md:166)",
)
def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    w = W.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "n_name",
            "c_name",
            F.col("c_acctbal").cast("decimal(18,4)").cast("double").alias("acctbal"),
        )
    )


@register(
    "orders_with_discounted_lines",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
    GROUP BY o_orderpriority
    """,
    "EXISTS as left-semi join (TPC-H Q4 shape)",
)
def orders_with_discounted_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


