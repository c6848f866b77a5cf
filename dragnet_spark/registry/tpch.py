"""Registry family module (split from registry.py; see _base)."""
from __future__ import annotations

from dragnet_spark.registry._base import DataFrame, F, SparkSession, W, _dec4, _t, register  # noqa: F401

# ---------------------------------------------------------------------------
# Remaining TPC-H query shapes expressible over the slimmed schema
# (the driver's tables omit partsupp, l_shipmode/commitdate/
# receiptdate, and p_container — so q2/q11/q12/q20/q21 have no data to
# run against; q4/q9/q16/q19 below keep each query's *shape* — the
# join topology, aggregation pattern, and plan challenge — with
# predicates adapted to the columns that exist).
# ---------------------------------------------------------------------------

_DISC_PRICE_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,4))"
    " * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"
    " AS DECIMAL(18,6))"
)


def _disc_price():
    one = F.lit(1).cast("decimal(18,4)")
    return (_dec4("l_extendedprice") * (one - _dec4("l_discount"))).cast(
        "decimal(18,6)"
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(COALESCE(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
               * CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(18,6))), 0)
           AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    "TPC-H Q6: pure filter + ungrouped aggregate — the canonical "
    "pushdown check; every predicate must reach the parquet scan "
    "(PushedFilters) and the plan is a single codegen stage, no "
    "shuffle at all beyond the final partial-sum merge",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.coalesce(
                F.sum(
                    (_dec4("l_extendedprice") * _dec4("l_discount")).cast(
                        "decimal(18,6)"
                    )
                ),
                F.lit(0).cast("decimal(18,6)"),
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q4_priority_late_ship",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    "TPC-H Q4 shape (commitdate/receiptdate absent → 'shipped after "
    "order date' stands in for 'received after commit'): EXISTS as a "
    "left-semi join; the orders year filter narrows the probe side "
    "before the semi join so only one year of orderkeys shuffles",
)
def q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q7_volume_shipping",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
    "TPC-H Q7: bi-directional nation pair over a 5-way star join; "
    "nation (and its filter) broadcasts to both the supplier and "
    "customer legs, so only the lineitem→orders join shuffles",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    n1 = nat.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                         THEN volume ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             {_DISC_PRICE_SQL} AS volume,
             n1.n_name AS supp_nation
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region   ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ) GROUP BY o_year
    """,
    "TPC-H Q8: market share = conditional / total revenue per order "
    "year for one region's customers; both sums are exact decimals, "
    "divided as doubles only at the end (identical IEEE result in "
    "both engines); region→nation→customer prunes via broadcasts",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nat.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_regionkey").alias("c_rkey"),
    )
    zero = F.lit(0).cast("decimal(18,6)")
    vol = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(reg), F.col("c_rkey") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _disc_price().alias("volume"),
            "supp_nation",
        )
    )
    return vol.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                .otherwise(zero)
            ).cast("double")
            / F.sum("volume").cast("double")
        )
        .cast("double")
        .alias("mkt_share")
    )


@register(
    "q9_profit_by_nation_year",
    f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS sum_profit
    FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE p_type = 'ECONOMY'
    GROUP BY 1, 2
    """,
    "TPC-H Q9 shape (no partsupp table → profit is discounted revenue "
    "without the supplycost term): part-filtered profit per supplier "
    "nation per order year; part and supplier broadcast, lineitem "
    "shuffles once on orderkey",
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nat = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(_disc_price()).cast("double").alias("sum_profit"))
    )


@register(
    "q10_returned_top_customers",
    f"""
    SELECT c_custkey, c_name, n_name,
           CAST(revenue AS DOUBLE) AS revenue
    FROM (
      SELECT c_custkey, c_name, n_name, SUM({_DISC_PRICE_SQL}) AS revenue
      FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        AND l_returnflag = 'R'
      GROUP BY 1, 2, 3
    ) ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    "TPC-H Q10: top-20 customers by returned-item revenue in a "
    "half-year window; ranking happens on the exact decimal (cast to "
    "double only for output) with custkey as the deterministic "
    "tie-break, so both engines pick the identical 20",
)
def q10_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = _t(spark, sf_dir, "nation")
    rev = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_disc_price()).alias("revenue"))
    )
    # (revenue desc, custkey) is a deterministic total order, so a
    # distributed TakeOrderedAndProject (orderBy + limit, mirroring
    # q3) is bit-identical to the former global row_number window —
    # without funneling the customer frame through one partition.
    return (
        rev.orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("revenue").cast("double").alias("revenue"),
        )
    )


@register(
    "q15_top_supplier",
    f"""
    WITH rev AS (
      SELECT l_suppkey AS suppkey, SUM({_DISC_PRICE_SQL}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
    FROM rev JOIN supplier ON suppkey = s_suppkey
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
    "TPC-H Q15: supplier(s) achieving the quarter's max revenue; the "
    "max is taken over the exact decimal so the equality can't be "
    "perturbed by float summation order; a window max avoids a second "
    "scan of lineitem",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(_disc_price()).alias("total_rev")
    )
    best = rev.withColumn(
        "__mx", F.max("total_rev").over(W.partitionBy())
    ).filter(F.col("total_rev") == F.col("__mx"))
    sup = _t(spark, sf_dir, "supplier")
    return best.join(F.broadcast(sup), best.suppkey == sup.s_suppkey).select(
        "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev")
    )


@register(
    "q16_part_variety",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size >= 1 AND p_size <= 15
    GROUP BY 1, 2, 3
    """,
    "TPC-H Q16 shape (no partsupp → the lineitem fact stands in as "
    "the part-supplier relation): distinct-supplier variety per "
    "(brand, type, size); the distinct is a partial-agg-friendly "
    "two-phase count, part broadcasts",
)
def q16_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 15)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    """
    WITH stats AS (
      SELECT l_partkey AS pk,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qsum,
             COUNT(*) AS qn
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 0)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN stats ON l_partkey = pk
    WHERE p_brand = 'Brand#3'
      AND CAST(l_quantity AS DECIMAL(18,4)) * 5 * qn < qsum
    """,
    "TPC-H Q17: small-quantity orders vs the part's average; the "
    "comparison l_quantity < 0.2*avg is algebraically rearranged to "
    "5*qty*n < sum so it stays in exact decimal/integer arithmetic — "
    "no engine-dependent decimal-division scale rules at the "
    "boundary; the per-part stats reuse the lineitem partkey shuffle",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dragnet_spark.ops.dedup import _materialize_once

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    # the part predicate commutes with the per-part stats (only
    # Brand#3 partkeys' rows survive the final join), so semi-filter
    # lineitem BEFORE aggregating — the q20 discipline — and
    # checkpoint the brand slice once: the old shape aggregated the
    # FULL lineitem table for stats and scanned lineitem a second
    # time for the revenue side (measured r14)
    lif = _materialize_once(
        li.join(
            F.broadcast(part.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
    )
    stats = lif.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_dec4("l_quantity")).alias("qsum"),
        F.count(F.lit(1)).alias("qn"),
    )
    return (
        lif.join(F.broadcast(part), lif.l_partkey == part.p_partkey)
        .join(stats, lif.l_partkey == stats.pk)
        .filter(_dec4("l_quantity") * 5 * F.col("qn") < F.col("qsum"))
        .agg(
            (
                F.coalesce(
                    F.sum(_dec4("l_extendedprice")),
                    F.lit(0).cast("decimal(18,4)"),
                )
                / 7.0
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "q12_priority_by_returnflag",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
    "TPC-H Q12 shape (shipmode/commit/receipt columns absent → "
    "returnflag carries the grouping, the ship-year window the "
    "filter): the signature conditional priority split over the "
    "orders⋈lineitem join, one orderkey shuffle",
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
    )


@register(
    "q19_bracketed_revenue",
    f"""
    SELECT CAST(COALESCE(SUM({_DISC_PRICE_SQL}), 0) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size >= 1 AND p_size <= 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size >= 1 AND p_size <= 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size >= 1 AND p_size <= 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    "TPC-H Q19 shape (container column absent → brand/size/quantity "
    "brackets): disjunction of conjunctive brackets across the "
    "join — Catalyst splits the OR into a residual join condition "
    "while still pushing the shared l_quantity/p_size bounds down",
)
def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(bracket).agg(
        F.coalesce(
            F.sum(_disc_price()), F.lit(0).cast("decimal(18,6)")
        )
        .cast("double")
        .alias("revenue")
    )


