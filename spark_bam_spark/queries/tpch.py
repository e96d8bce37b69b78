"""TPC-H-adapted decision-support suite over the synthetic star schema.

The reference has no general relational benchmark surface (its joins are
the ordered zip/merge shapes of SURVEY.md §2.3); this module proves the
engine covers the classic warehouse query shapes a user migrating from any
Spark deployment would expect: multiway pipelined joins, group-having,
disjunctive pushdown predicates, scalar/correlated subqueries, market-share
ratio aggregates, and top-k with deterministic tie-breaks.

Adaptations from stock TPC-H (the synthetic schema has no partsupp,
l_shipmode, l_commitdate, o_shippriority, c_phone): Q12 groups by ship
month instead of ship mode, Q16 counts distinct suppliers via lineitem,
Q22 groups dormant customers by nation instead of phone prefix; Q2/Q11/Q20
use lineitem as the price/stock book in place of partsupp, Q9 prices
supply cost off p_retailprice, and Q21's lateness becomes last-to-ship in
a finalized multi-supplier order.  With Q1's shape covered by
relational.pricing_summary, all 22 TPC-H query SHAPES are represented.

Numeric policy: same as relational.py — money aggregates accumulate in
DECIMAL(18,4) (exact, order-independent), rounded then cast to DOUBLE so
the Spark and DuckDB results are bit-identical; ratio outputs are rounded
to 6 decimals on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_bam_spark.queries import register
from spark_bam_spark.tables import table
from spark_bam_spark.queries.relational import dec, dsum


def _revenue() -> F.Column:
    """Exact decimal revenue sum, rounded to 4 then cast to double."""
    return (
        F.round(F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))), 4)
        .cast("double")
    )


_REV_SQL = (
    "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))"
    " * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE)"
)


@register(
    "tpch_q3_segment_topk",
    tags=("tpch", "join", "topk"),
    oracle=f"""
    SELECT l_orderkey,
           {_REV_SQL} AS revenue,
           CAST(o_orderdate AS DATE) AS order_date
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_segment_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): segment filter -> 3-way join ->
    hash agg -> TakeOrderedAndProject.

    Scale shape: customer/orders filters push to the scans; the customer
    side of the first join is segment-pruned before shuffle; top-k never
    materializes a global sort."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ltz")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ltz")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_revenue().alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("order_date"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5_regional_volume",
    tags=("tpch", "join"),
    oracle=f"""
    SELECT n_name, {_REV_SQL} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): 6-way join where the
    customer-nation = supplier-nation equality makes the join graph cyclic.

    Scale shape: region/nation broadcast (tiny dims); the only large
    shuffles are lineitem-orders and the customer join; the supplier join
    key (l_suppkey) rides the same shuffled side."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ltz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ltz"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_revenue().alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "tpch_q7_volume_shipping",
    tags=("tpch", "join"),
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {_REV_SQL} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l_shipdate) AS l_year,
             l_extendedprice, l_discount
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bidirectional nation-pair trade flow.

    Scale shape: the two nation dims broadcast; the disjunctive pair
    predicate evaluates after the broadcast joins, so no blow-up; year
    extraction is a narrow projection before the final agg."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp_ltz"), F.lit("1997-12-31").cast("timestamp_ltz")
        )
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_revenue().alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8_market_share",
    tags=("tpch", "join", "ratio"),
    oracle="""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem, orders, customer, supplier, nation n1, nation n2, region
      WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND l_suppkey = s_suppkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'EUROPE' AND s_nationkey = n2.n_nationkey
    ) all_sales
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (market share): a target nation's share of regional import
    volume per year — conditional-sum / total-sum ratio.

    Scale shape: both sums come out of ONE hash agg pass (conditional agg,
    not two jobs); nation/region broadcast; the ratio is a scalar epilogue."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    volume = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(zero)).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q10_returned_items",
    tags=("tpch", "join", "topk"),
    oracle=f"""
    SELECT c_custkey, c_name, {_REV_SQL} AS revenue, c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned items): top-20 customers by lost revenue.

    Scale shape: returnflag + quarter filters push to the scans; grouping
    key includes the customer attributes so no second join after the agg;
    top-k via TakeOrderedAndProject."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ltz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ltz"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_revenue().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q12_ship_months",
    tags=("tpch", "agg"),
    oracle="""
    SELECT EXTRACT(month FROM l_shipdate) AS ship_month,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY ship_month
    ORDER BY ship_month
    """,
)
def tpch_q12_ship_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted (no l_shipmode column): priority mix per ship
    month — conditional counts in one agg pass."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ltz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ltz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.month("l_shipdate").cast("long").alias("ship_month"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_month")
    )


@register(
    "tpch_q14_promo_revenue",
    tags=("tpch", "ratio"),
    oracle="""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))
                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                            * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 6) AS promo_revenue_pct
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): promo share of one month's revenue.

    Scale shape: month filter prunes lineitem at the scan; part joins
    broadcast (dim table); single conditional-agg pass, scalar output."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ltz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ltz"))
    )
    part = table(spark, sf_dir, "part")
    volume = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("p_type"), volume.alias("volume"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", F.col("volume")).otherwise(zero)).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q16_supplier_variety",
    tags=("tpch", "agg", "distinct"),
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#9'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted (no partsupp table): distinct supplier count per
    part group, via the lineitem fact.

    Scale shape: all part predicates (inequality, NOT LIKE, IN-list) push
    into the broadcast side before the join; count-distinct expands to a
    two-level agg under AQE."""
    part = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q18_large_volume",
    tags=("tpch", "having", "join"),
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 250
      )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): group-having feeding a semi
    join back into the fact.

    Scale shape: the HAVING subquery is a partial-agg-friendly groupBy on
    the join key itself, so the semi join is co-partitioned with the outer
    lineitem shuffle — one exchange is reused."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .filter(F.col("q") > F.lit(250).cast("decimal(18,4)"))
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_orderkey"),
                li.l_orderkey == F.col("big_orderkey"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("total_qty"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_totalprice", "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "tpch_q19_disjunctive_revenue",
    tags=("tpch", "predicate"),
    oracle=f"""
    SELECT {_REV_SQL} AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): OR-of-ANDs mixing join-side and
    fact-side predicates.

    Scale shape: Catalyst derives the implied disjunction per side
    (p_brand IN (...) pushes into the part scan, l_quantity range into
    lineitem) before evaluating the residual after the broadcast join."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    clause = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return j.filter(clause).agg(_revenue().alias("revenue"))


@register(
    "tpch_q22_dormant_customers",
    tags=("tpch", "subquery", "anti"),
    oracle="""
    SELECT n_name,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE CAST(c_acctbal AS DECIMAL(18,4)) > (
        SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) / COUNT(*)
        FROM customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey
      )
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted (nation instead of phone prefix): rich customers
    with no orders — scalar subquery + anti join.

    Scale shape: the AVG subquery is a broadcast scalar; the anti join
    needs only the o_custkey column of orders (column pruning keeps the
    built side narrow). AVG over doubles is order-sensitive in the last
    bits, so the threshold comparison uses a DECIMAL-exact average."""
    from spark_bam_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE CAST(c_acctbal AS DECIMAL(18,4)) > (
            SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) / COUNT(*)
            FROM customer WHERE c_acctbal > 0
          )
          AND NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
          )
        GROUP BY n_name
        ORDER BY n_name
        """
    )


@register(
    "tpch_q4_priority_check",
    tags=("tpch", "subquery", "agg"),
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 (order priority checking), adapted: the synthetic lineitem has
    no l_commitdate/l_receiptdate, so the late-delivery EXISTS becomes an
    EXISTS on returned lines — the query SHAPE (quarter filter →
    left-semi join → group-count) is what's under test.  The semi-join
    carries only o_orderkey; no lineitem payload crosses the shuffle."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ltz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ltz"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q6_forecast_revenue",
    tags=("tpch", "agg", "pushdown"),
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 (forecasting revenue change): the pure scan-filter-aggregate —
    every predicate pushes to the parquet scan, one partial+final agg,
    zero joins.  The canonical 'is pushdown working' probe."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ltz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ltz"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(dec("l_extendedprice") * dec("l_discount")), 4)
        .cast("double")
        .alias("revenue")
    )


@register(
    "tpch_q13_order_distribution",
    tags=("tpch", "join", "agg"),
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 (customer order-count distribution): left outer join with an
    ON-clause filter (customers with zero qualifying orders must survive
    with count 0), double aggregation.  COUNT(col) vs COUNT(*) null
    semantics is exactly what this shape exercises."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q17_small_quantity_revenue",
    tags=("tpch", "subquery", "agg"),
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))), 4) AS DOUBLE) / 7
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    ) t ON t.l_partkey = l.l_partkey
    WHERE p.p_size <= 5 AND l.l_quantity < t.qty_threshold
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 (small-quantity-order revenue): correlated average-quantity
    subquery decorrelated into an aggregate join (p_brand/p_container
    absent -> p_size<=5 plays the part filter).  The per-part threshold
    table is small (one row per part) and broadcasts; lineitem is
    touched twice but never shuffled on a wide key.

    Threshold comparison uses the engines' native DOUBLE avg — safe
    because 0.2*avg(quantity) vs quantity is a strict inequality on
    well-separated values, not an output; output money sums are DECIMAL."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    thresh = li.groupBy("l_partkey").agg((0.2 * F.avg("l_quantity")).alias("qty_threshold"))
    return (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(thresh), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.round(F.sum(dec("l_extendedprice")), 4).cast("double") / 7)
            .alias("avg_yearly")
        )
    )


@register(
    "tpch_q15_top_supplier",
    tags=("tpch", "subquery", "topk"),
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {_REV_SQL} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 (top supplier): quarterly per-supplier revenue, keep the
    supplier(s) hitting the global maximum — the argmax-via-scalar-
    subquery shape (the view in stock TPC-H becomes a reused DataFrame).

    Scale shape: revenue is one shuffle on l_suppkey; the MAX is a
    single-row aggregate joined back by broadcast, so the argmax costs
    one extra tiny stage, not a global sort; the supplier dim broadcasts."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ltz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ltz"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _revenue().alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q2_min_cost_supplier",
    tags=("tpch", "subquery", "join"),
    oracle="""
    WITH eu AS (
      SELECT l.l_partkey, l.l_suppkey, l.l_extendedprice
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    mins AS (SELECT l_partkey, MIN(l_extendedprice) AS min_price FROM eu GROUP BY l_partkey)
    SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name, m.min_price
    FROM eu
    JOIN mins m ON m.l_partkey = eu.l_partkey AND eu.l_extendedprice = m.min_price
    JOIN part p ON p.p_partkey = eu.l_partkey AND p.p_size <= 3
    JOIN supplier s ON s.s_suppkey = eu.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 (minimum cost supplier), adapted: no partsupp table, so lineitem
    is the price book — for each small part, the EUROPE supplier(s) whose
    line hit the part's minimum extended price.  The correlated MIN
    subquery decorrelates into a per-part aggregate joined back by
    broadcast (one row per part); region/nation/supplier dims broadcast;
    the only fact shuffle is the per-part min.  Prices are compared by
    value (no arithmetic), so DOUBLE equality is engine-exact."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = table(spark, sf_dir, "part").filter(F.col("p_size") <= 3)
    eu_supp = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu = li.join(F.broadcast(eu_supp), li.l_suppkey == F.col("s_suppkey")).select(
        "l_partkey", "l_extendedprice", "s_suppkey", "s_name", "s_acctbal", "n_name"
    )
    mins = eu.groupBy("l_partkey").agg(F.min("l_extendedprice").alias("min_price"))
    return (
        eu.join(
            F.broadcast(mins.withColumnRenamed("l_partkey", "m_partkey")),
            (F.col("l_partkey") == F.col("m_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "min_price")
        .distinct()
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q9_product_profit",
    tags=("tpch", "join", "agg"),
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                            * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                          - CAST(p.p_retailprice AS DECIMAL(18,4))
                            * CAST(l.l_quantity AS DECIMAL(18,4)) * 0.1), 4) AS DOUBLE)
             AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 (product type profit), adapted: supply cost becomes 10% of
    p_retailprice (no partsupp) — profit = revenue − cost·quantity per
    (supplier nation, order year) over 'widget' parts.  Scale shape: part
    filter broadcasts and prunes lineitem FIRST (the selective join), then
    supplier/nation broadcast, orders is the one co-shuffled join
    (orderkey), single hash-agg.  All money math in DECIMAL, rounded once."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    profit = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")) - dec(
        "p_retailprice"
    ) * dec("l_quantity") * F.lit(0.1).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_retailprice")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nat.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 4).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "tpch_q11_important_stock",
    tags=("tpch", "agg", "subquery"),
    oracle="""
    WITH nat_val AS (
      SELECT l.l_partkey AS p_partkey,
             CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))), 4) AS DOUBLE) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY 1
    )
    SELECT p_partkey, value
    FROM nat_val
    WHERE value > (SELECT SUM(value) FROM nat_val) * 0.001
    ORDER BY value DESC, p_partkey
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 (important stock), adapted: per-part shipped value from one
    nation's suppliers, keeping parts above a fraction of the nation
    total — the group-HAVING-against-global-scalar shape.  The scalar is
    a single-row aggregate broadcast back; per-part values are computed
    once and reused for both sides (no second scan).  The threshold
    comparison happens on identically-derived DOUBLEs (DECIMAL sum,
    round, cast), so both engines agree bitwise."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nat_supp = supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey).select("s_suppkey")
    nat_val = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.round(F.sum(dec("l_extendedprice")), 4).cast("double").alias("value"))
    )
    total = nat_val.agg((F.sum("value") * F.lit(0.001)).alias("threshold"))
    # explicit single-ROW broadcast (the BroadcastNestedLoopJoin this plans
    # to is a scalar filter, not a pairwise join — same sanctioned pattern
    # as the sketch-row crossJoins in datapipe.py)
    return (
        nat_val.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("p_partkey", "value")
        .orderBy(F.desc("value"), "p_partkey")
    )


@register(
    "tpch_q20_promotion_suppliers",
    tags=("tpch", "subquery", "semijoin"),
    oracle="""
    WITH per_ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) AS sq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    ),
    per_p AS (SELECT l_partkey, SUM(sq) AS tq FROM per_ps GROUP BY 1)
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_1'
    WHERE EXISTS (
      SELECT 1 FROM per_ps ps
      JOIN per_p p ON p.l_partkey = ps.l_partkey
      WHERE ps.l_suppkey = s.s_suppkey AND ps.sq > 0.5 * p.tq
    )
    ORDER BY s_name
    """,
)
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 (potential part promotion), adapted: no partsupp availqty, so
    the 'excess stock' predicate becomes 'this supplier shipped more than
    half of the part's 1997 volume'.  The nested-IN shape survives as two
    aggregations (per part-supplier, per part) and a left-semi join into
    the supplier dim.  Quantities accumulate in DECIMAL; the dominance
    test compares identically-derived doubles.  Nothing wide shuffles:
    per_ps is one shuffle on (part, supp); per_p rides a map-side
    re-aggregation of per_ps."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ltz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ltz"))
    )
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.sum(dec("l_quantity")), 4).cast("double").alias("sq")
    )
    per_p = per_ps.groupBy("l_partkey").agg(F.sum("sq").alias("tq"))
    dominant = (
        per_ps.join(per_p, "l_partkey")
        .filter(F.col("sq") > 0.5 * F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "tpch_q21_waiting_suppliers",
    tags=("tpch", "subquery", "antijoin"),
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > l1.l_shipdate
    )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 (suppliers who kept orders waiting), adapted: without
    commit/receipt dates the 'late' line is the one that shipped LAST in
    a finalized multi-supplier order (some other supplier shipped
    earlier, none shipped later).  The EXISTS / NOT-EXISTS pair becomes a
    left-semi then left-anti self-join, both shuffling on l_orderkey only
    (co-partitioned with the orders semi-join); the supplier dim
    broadcasts and the top-100 is TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem")
    f_orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(f_orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_semi")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("o3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    waiting = (
        l1.join(l2, (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")), "left_semi")
        .join(
            l3,
            (F.col("l_orderkey") == F.col("o3"))
            & (F.col("l_suppkey") != F.col("s3"))
            & (F.col("d3") > F.col("l_shipdate")),
            "left_anti",
        )
    )
    supp = table(spark, sf_dir, "supplier")
    return (
        waiting.join(F.broadcast(supp.select("s_suppkey", "s_name")), waiting.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
