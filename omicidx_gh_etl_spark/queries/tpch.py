"""Literal TPC-H queries (Q1, Q3, Q5) on the synthetic star schema.

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
           sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(8,4)))) AS sum_disc_price,
           sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(8,4)))
               * (1 + CAST(l_tax AS DECIMAL(8,4)))) AS sum_charge,
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
    per-row products must never round from double. avg omitted —
    it's sum/count downstream."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp_ntz")
    )
    ext = F.col("l_extendedprice").cast(_DEC)
    disc = ext * (F.lit(1) - F.col("l_discount").cast("decimal(8,4)"))
    charge = disc * (F.lit(1) + F.col("l_tax").cast("decimal(8,4)"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(_DEC)).alias("sum_qty"),
        F.sum(ext).alias("sum_base_price"),
        F.sum(disc).alias("sum_disc_price"),
        F.sum(charge).alias("sum_charge"),
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
    aggregate + top-10. Scale: the segment-filtered customer side
    broadcasts; lineitem (the only big table) shuffles once on
    l_orderkey; TakeOrderedAndProject caps the sort at k."""
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
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
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
    same-nation constraint. Scale: region/nation/supplier/customer all
    broadcast (each orders of magnitude under the fact tables), so
    lineitem⋈orders is the only shuffled join — the plan a cost-based
    optimizer should find, declared explicitly."""
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
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(F.sum(rev).alias("revenue"))
    )
