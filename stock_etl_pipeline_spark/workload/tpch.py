"""Join/aggregation breadth queries over the TPC-H-ish star schema.

The reference delegates every join to BigQuery (SURVEY.md §2.4 — no in-process
join); on Spark the engine gets all physical join strategies from Catalyst.
These queries pin the patterns that matter at 100 TB:

- Q1-shape: one wide partial+final hash aggregate, no join.
- Q3-shape: fact⋈fact join + top-k per the scalable row_number idiom.
- Q5-shape: star join where every dimension is broadcast (no fact shuffle).

Money aggregates use the integer-exact discipline (functions/__init__.py):
extendedprice→cents, discount/tax→integer percent, so sums are
order-independent longs and both engines land on identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datasets import load_table
from ..functions import pround, sql_pround
from . import spec


def _cents(col: str):
    return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("long")


_SQL_EP_C = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
_SQL_D_C = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
_SQL_T_C = "CAST(floor(l_tax * 100 + 0.5) AS BIGINT)"

_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
  sum(l_quantity) AS sum_qty,
  {sql_pround(f"CAST(sum({_SQL_EP_C}) AS BIGINT) / 100.0", 2)} AS sum_base_price,
  {sql_pround(f"CAST(sum({_SQL_EP_C} * (100 - {_SQL_D_C})) AS BIGINT) / 10000.0", 2)} AS sum_disc_price,
  {sql_pround(f"CAST(sum({_SQL_EP_C} * (100 - {_SQL_D_C}) * (100 + {_SQL_T_C})) AS BIGINT) / 1000000.0", 2)} AS sum_charge,
  {sql_pround("sum(l_quantity) / count(*)", 6)} AS avg_qty,
  {sql_pround(f"CAST(sum({_SQL_EP_C}) AS BIGINT) / (100.0 * count(*))", 6)} AS avg_price,
  {sql_pround(f"CAST(sum({_SQL_D_C}) AS BIGINT) / (100.0 * count(*))", 6)} AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
GROUP BY l_returnflag, l_linestatus
""".strip()


@spec("pricing_summary", oracle=_Q1_ORACLE, tags=("tpch", "agg"), bench=True)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical wide hash aggregate."""
    l = load_table(spark, sf_dir, "lineitem")
    ep_c, d_c, t_c = _cents("l_extendedprice"), _cents("l_discount"), _cents("l_tax")
    n = F.count("*")
    return (
        l.filter(F.col("l_shipdate").cast("date") <= F.lit("2001-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            pround(F.sum(ep_c) / F.lit(100.0), 2).alias("sum_base_price"),
            pround(F.sum(ep_c * (100 - d_c)) / F.lit(10000.0), 2).alias("sum_disc_price"),
            pround(
                F.sum(ep_c * (100 - d_c) * (100 + t_c)) / F.lit(1000000.0), 2
            ).alias("sum_charge"),
            pround(F.sum("l_quantity") / n, 6).alias("avg_qty"),
            pround(F.sum(ep_c) / (F.lit(100.0) * n), 6).alias("avg_price"),
            pround(F.sum(d_c) / (F.lit(100.0) * n), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_SQL_REVENUE = (
    f"{sql_pround(f'CAST(sum({_SQL_EP_C} * (100 - {_SQL_D_C})) AS BIGINT) / 10000.0', 2)}"
)

_TOP_CUSTOMERS_ORACLE = f"""
WITH rev AS (
  SELECT o.o_custkey AS custkey,
    {_SQL_REVENUE} AS revenue,
    count(DISTINCT o.o_orderkey) AS n_orders
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey
)
SELECT c.c_custkey AS custkey, c.c_name AS customer_name, c.c_mktsegment AS segment,
  r.revenue, r.n_orders
FROM rev r JOIN customer c ON r.custkey = c.c_custkey
ORDER BY r.revenue DESC, c.c_custkey
LIMIT 10
""".strip()


def _revenue_agg():
    ep_c = _cents("l_extendedprice")
    d_c = _cents("l_discount")
    return pround(F.sum(ep_c * (100 - d_c)) / F.lit(10000.0), 2)


@spec("top_customers", oracle=_TOP_CUSTOMERS_ORACLE, tags=("tpch", "join", "topk"), bench=True)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: fact⋈fact aggregate then broadcast-join the dimension and
    take a deterministic top-10 (exact revenue + key tiebreak)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rev = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            _revenue_agg().alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )
    return (
        rev.join(c, rev.o_custkey == c.c_custkey)  # customer scales with SF — let AQE pick
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("customer_name"),
            F.col("c_mktsegment").alias("segment"),
            "revenue",
            "n_orders",
        )
        .orderBy(F.col("revenue").desc(), F.col("custkey"))
        .limit(10)
    )


_REGIONAL_ORACLE = f"""
SELECT n.n_name AS nation,
  {_SQL_REVENUE} AS revenue,
  count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""".strip()


@spec("regional_revenue", oracle=_REGIONAL_ORACLE, tags=("tpch", "join"), bench=True)
def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: star join. customer/nation/region are broadcast so the only
    shuffle is lineitem⋈orders + the final aggregate; region filter prunes
    before the fact join (Catalyst pushes it through the broadcast chain)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(dims, o.o_custkey == dims.c_custkey)  # customer-sized — let AQE pick
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            _revenue_agg().alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


_ORDER_PRIORITY_ORACLE = f"""
SELECT o_orderpriority, count(*) AS order_count,
  {sql_pround("CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / (100.0 * count(*))", 6)} AS avg_total
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
GROUP BY o_orderpriority
""".strip()


@spec("order_priority", oracle=_ORDER_PRIORITY_ORACLE, tags=("tpch", "agg"))
def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        o.filter((d >= F.lit("1996-01-01").cast("date")) & (d < F.lit("1997-01-01").cast("date")))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("order_count"),
            pround(F.sum(_cents("o_totalprice")) / (F.lit(100.0) * F.count("*")), 6).alias(
                "avg_total"
            ),
        )
    )


# --- grouping sets: ROLLUP revenue by region/nation -------------------------
# The reference's only grouping-sets use is the degenerate ROLLUP(())
# (plugins/helpers/queries.py:145); this exercises the real thing. NULL
# subtotal keys are produced identically by Spark rollup() and DuckDB ROLLUP.
_ROLLUP_ORACLE = f"""
SELECT r.r_name AS region, n.n_name AS nation,
  {_SQL_REVENUE} AS revenue,
  count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""".strip()


@spec("regional_rollup", oracle=_ROLLUP_ORACLE, tags=("tpch", "rollup", "grouping_sets"))
def q_regional_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (region, nation) revenue: nation subtotals, region subtotals,
    grand total in one pass — Spark plans rollup as an Expand + single hash
    aggregate (no extra scans). Dimensions broadcast as in regional_revenue."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(dims, o.o_custkey == dims.c_custkey)  # customer-sized — let AQE pick
        .rollup(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            _revenue_agg().alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )
