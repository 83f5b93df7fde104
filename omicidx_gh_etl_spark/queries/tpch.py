"""Literal TPC-H queries on the synthetic star schema
(Q1 Q3 Q5 Q6 Q7 Q8 Q10 Q13 Q14 Q15 Q17 Q18 Q19 Q22 — every TPC-H
query expressible without the partsupp table and the comment/date
columns the synthetic schema omits).

The reference's workload never exceeds single-key joins + counts
(SURVEY.md §2.3-2.4); these classical queries demonstrate the OLAP
breadth beyond it on the same tables — multi-predicate aggregation,
join + top-k, and a 6-way join cycle — each with the standard TPC-H
text as the DuckDB oracle (dates shifted into the synthetic data's
1995-2001 range; decimal sums per the parity rules in base.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .base import register
from .tables import load_table

_DEC = "decimal(18,2)"


@register(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
           sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(8,4)))), 4)
               AS DECIMAL(38,4)) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(8,4)))
               * (1 + CAST(l_tax AS DECIMAL(8,4)))), 4)
               AS DECIMAL(38,4)) AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("tpch", "A2"),
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: scan-heavy multi-aggregate groupBy on
    a 6-value grouping key. Scale: pure map + one tiny shuffle; the
    per-row expression chain stays in whole-stage codegen.

    Parity: inputs cast to DECIMAL BEFORE the arithmetic, and sums run
    in decimal. Multiplying in double and casting the product differs
    across engines (Spark's double→decimal goes through the shortest
    string representation; DuckDB rounds the binary expansion), so
    per-row products must never round from double. The product sums
    (scale 6/10) are re-scaled to DECIMAL(38,4) on output: above
    scale ~4 the unscaled value exceeds 2^53 and DuckDB's pandas
    decimal→float64 conversion is no longer correctly rounded (1-ulp
    drift vs Spark's). avg omitted — it's sum/count downstream."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp_ntz")
    )
    ext = F.col("l_extendedprice").cast(_DEC)
    disc = ext * (F.lit(1) - F.col("l_discount").cast("decimal(8,4)"))
    charge = disc * (F.lit(1) + F.col("l_tax").cast("decimal(8,4)"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(_DEC)).alias("sum_qty"),
        F.sum(ext).alias("sum_base_price"),
        F.sum(disc).cast("decimal(38,4)").alias("sum_disc_price"),
        F.sum(charge).cast("decimal(38,4)").alias("sum_charge"),
        F.count("*").alias("count_order"),
    )


@register(
    "tpch_q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(8,4)))) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("tpch", "J5", "O1"),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: filtered 3-way join + revenue
    aggregate + top-10. Scale: no forced hint on customer — it is
    data-proportional (150M rows at sf100), so the planner/AQE picks
    broadcast only when size stats permit (it does at test sf);
    lineitem shuffles once on l_orderkey; TakeOrderedAndProject caps
    the sort at k."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(8,4)")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    """
    SELECT n.n_name,
           sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(8,4)))) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
    tags=("tpch", "J5"),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local supplier volume: the 6-way join cycle
    (customer-orders-lineitem-supplier-nation-region) with the
    same-nation constraint. Scale: only the genuinely fixed-size dims
    (region=5 rows, nation=25 at every SF) carry explicit broadcast
    hints; customer AND supplier get NO hint — both scale linearly
    with the data (150k·SF / 10k·SF rows), so stats/AQE decide (still
    broadcasts at test sf) — leaving lineitem⋈orders the only
    guaranteed-shuffled join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(8,4)")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(F.sum(rev).alias("revenue"))
    )


@register(
    "tpch_q7_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(8,4)))) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                           AND TIMESTAMP '1997-12-31'
    GROUP BY 1, 2, 3
    """,
    tags=("tpch", "J5", "A2"),
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping: lineitem joined to BOTH ends of the
    trade (supplier nation and customer nation) with a symmetric
    two-nation predicate, grouped by ship year. Scale: the nation
    filter reaches the fact scan only through the joins, so the big
    tables shuffle once each on their join keys while the two nation
    lookups broadcast (fixed 25 rows at every SF; supplier/customer
    are data-proportional so they carry no forced hint — stats/AQE
    still broadcast them at test sf); the OR-pair predicate evaluates
    post-join inside codegen. l_year is BIGINT to match EXTRACT's
    type."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp_ntz"),
            F.lit("1997-12-31").cast("timestamp_ntz"),
        )
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(8,4)")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(rev).alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    """
    WITH all_nations AS (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
               CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(8,4))) AS volume,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'AMERICA'
          AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                AND TIMESTAMP '1997-12-31'
          AND p.p_type = 'ECONOMY'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
                               ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 4) AS mkt_share
    FROM all_nations
    GROUP BY o_year
    """,
    tags=("tpch", "J5", "F7"),
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: 8-way join with nation joined
    twice (customer side filters the region, supplier side labels the
    share), then a conditional-aggregate ratio per order year. Scale:
    only the fixed-size dims (nation/region) carry broadcast hints;
    part (even type-filtered it is ~1/150 of 200k·SF rows), supplier
    and customer are data-proportional so stats/AQE pick their join
    side (all still broadcast at test sf); lineitem⋈orders is the
    lone guaranteed-shuffled join, and the CASE/ratio runs in the
    final single-stage aggregate.
    Parity: volume stays DECIMAL through both sums; the ratio is
    computed in double and rounded to 4 (per base.py rule 2) because
    decimal division precision rules differ across engines."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp_ntz"),
            F.lit("1997-12-31").cast("timestamp_ntz"),
        )
    )
    c = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    volume = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(8,4)")
    )
    nations = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r["r_regionkey"])
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            volume.alias("volume"),
            "nation",
        )
    )
    zero = F.lit(0).cast("decimal(28,6)")
    return nations.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(zero)
            ).cast("double")
            / F.sum("volume").cast("double"),
            4,
        ).alias("mkt_share")
    )


@register(
    "tpch_q18_large_volume_customer",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
           sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    tags=("tpch", "J5", "A8", "O1"),
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: a group-by-HAVING subquery
    selecting heavy orders, re-joined (left-semi) against the fact
    tables, re-aggregated, top-100. Scale: the heavy-order key set is
    produced by one partial-aggregated pass over lineitem and then
    BROADCAST as the semi-join side — it is tiny after HAVING — so
    lineitem is scanned twice but shuffled only once; the final top-k
    is TakeOrderedAndProject, never a full sort."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    qty = F.col("l_quantity").cast(_DEC)
    heavy = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(heavy), "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast(_DEC).alias("o_totalprice"),
        )
        .agg(F.sum(qty).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "tpch_q6_forecast_revenue",
    """
    SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(8,4))) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN CAST(0.05 AS DOUBLE) AND CAST(0.07 AS DOUBLE)
      AND l_quantity < 24
    """,
    tags=("tpch", "P3", "A7"),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting revenue change: pure scan-filter-aggregate,
    no join, no grouping — the pushdown showcase. All three predicates
    reach the parquet scan (date + two numeric ranges are all
    min/max-skippable), and the single global sum partial-aggregates
    to one row per partition before a one-row exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(
            F.col("l_extendedprice").cast(_DEC)
            * F.col("l_discount").cast("decimal(8,4)")
        ).alias("revenue")
    )


@register(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(8,4)))) AS revenue,
           CAST(c.c_acctbal AS DECIMAL(18,2)) AS c_acctbal,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 4, 5
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch", "J5", "O1"),
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: who returned the most value
    this quarter. Scale: the returnflag filter prunes lineitem at the
    scan; customer and nation broadcast; one shuffle joins the
    surviving facts; top-20 is TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(8,4)")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            "c_custkey",
            "c_name",
            F.col("c_acctbal").cast(_DEC).alias("c_acctbal"),
            "n_name",
        )
        .agg(F.sum(rev).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tags=("tpch", "J5", "A1"),
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution: LEFT OUTER join
    (customers with zero orders MUST survive with c_count=0 — the
    shape inner joins cannot express), per-customer count, then a
    histogram of the counts. Scale: outer join shuffles on custkey;
    both aggregates partial-combine; the second groupBy's key space is
    tiny (distinct counts)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q14_promo_effect",
    """
    SELECT round(
        100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(8,4)))
                    ELSE 0 END) AS DOUBLE)
        / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(8,4)))) AS DOUBLE),
        4) AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1996-02-01'
    """,
    tags=("tpch", "F7"),
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: conditional-aggregate ratio over a
    part join. Scale: part is unfiltered and data-proportional
    (200k·SF rows), so no forced broadcast — stats/AQE pick the side
    (broadcast at test sf, shuffle at 100-TB SFs where the
    month-filtered lineitem side may even be the smaller one).
    Parity: both sums stay decimal (exact), the ratio is double
    rounded to 4 (base.py rule 2)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(8,4)")
    )
    zero = F.lit(0).cast("decimal(28,6)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_revenue")
        )
    )


@register(
    "tpch_q15_top_supplier",
    """
    WITH revenue0 AS (
        SELECT l_suppkey AS supplier_no,
               sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue0 r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue0)
    """,
    tags=("tpch", "A8", "J5"),
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: an aggregate view joined against its
    own scalar max — the high-watermark pattern (SURVEY.md §2.4 A8).
    Scale: revenue0 is one shuffled aggregate over the filtered scan;
    its max is a one-row broadcast. The supplier lookup carries NO
    hint — supplier is data-proportional (10k·SF rows) while the
    max-matched left side is ~1 row, so AQE broadcasts the tiny
    post-aggregate side at runtime instead of a forced full-supplier
    broadcast. Exact decimal equality makes the max-match
    deterministic across engines (never compare double aggregates for
    equality)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(8,4)")
    )
    revenue0 = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev).alias("total_revenue")
    )
    best = revenue0.agg(F.max("total_revenue").alias("best_revenue"))
    return (
        revenue0.join(
            F.broadcast(best),
            revenue0["total_revenue"] == best["best_revenue"],
        )
        .join(s, F.col("supplier_no") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    """
    SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                      AS DOUBLE) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (
          SELECT round(0.2 * avg(l2.l_quantity), 6)
          FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
      )
    """,
    tags=("tpch", "A8", "J5"),
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: a correlated scalar
    subquery (per-part average quantity) gating the outer scan —
    decorrelated the Spark way into a per-key aggregate joined back.
    The brand filter is applied FIRST (semi-join through the filtered
    part side — no forced hint: brand-filtered part is still ~1/25 of
    200k·SF rows, so stats/AQE pick broadcast only while it fits), so
    the per-part averages aggregate only the brand's lineitems —
    equivalent because the correlation key is p_partkey and every
    lineitem of a qualifying part survives the brand join. The
    thresholds join-back likewise carries no hint (one row per
    qualifying part — AQE broadcasts it while small, shuffles on the
    uniform p_partkey key beyond that).
    Parity: the 0.2·avg threshold is double; both engines round it to
    6 decimals before the comparison so last-ulp noise in the average
    cannot flip a row at the boundary."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li = load_table(spark, sf_dir, "lineitem").join(
        p.select("p_partkey"),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    thresholds = li.groupBy("l_partkey").agg(
        F.round(0.2 * F.avg("l_quantity"), 6).alias("qty_threshold")
    )
    return (
        li.join(thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / 7.0,
                4,
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q19_discounted_revenue",
    """
    SELECT sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(8,4)))) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("tpch", "P7", "J5"),
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue: a three-way disjunction mixing
    columns from BOTH join sides — the predicate can only be evaluated
    post-join, but its single-side implications still prune: Catalyst
    infers p_brand IN (…) and p_size/l_quantity range envelopes and
    pushes them below the join (constraint propagation), so both scans
    shrink before the join evaluates the full OR. Scale: part carries
    no forced hint (data-proportional); stats/AQE broadcast it at test
    sf and fall back to a shuffled join on the uniform partkey when it
    outgrows the threshold."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast(_DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(8,4)")
    )
    disjunct = (
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
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .filter(disjunct)
        .agg(F.sum(rev).alias("revenue"))
    )


@register(
    "tpch_q22_global_sales_opportunity",
    """
    SELECT c_nationkey % 5 AS cntrycode,
           count(*) AS numcust,
           sum(CAST(c_acctbal AS DECIMAL(18,2))) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
            SELECT round(avg(c_acctbal), 6) FROM customer
            WHERE c_acctbal > 0.0)
      AND NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
    tags=("tpch", "A8", "U3"),
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity: rich customers who never
    ordered — an uncorrelated scalar average plus an ANTI join
    (NOT EXISTS). The reference's country-code substring becomes
    nationkey % 5 (no phone column in the synthetic schema). Scale:
    the average is a one-row broadcast; the anti join broadcasts
    nothing small — it shuffles on custkey like any big-big join and
    left_anti drops matches map-side after the hash lookup. Parity:
    the avg threshold is rounded to 6 before comparing (boundary
    noise), the output sum is decimal."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    thr = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 6).alias("bal_threshold")
    )
    return (
        c.join(F.broadcast(thr), c["c_acctbal"] > thr["bal_threshold"])
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy((F.col("c_nationkey") % 5).alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(_DEC)).alias("totacctbal"),
        )
    )
