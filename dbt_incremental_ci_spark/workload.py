"""The engine's query workload: one entry per operator family from
SURVEY.md §2, expressed Spark-first over the driver's test tables, each
paired with an ANSI-SQL DuckDB oracle.

Determinism rules (so Spark and DuckDB hash-match bit-for-bit):

- Money/measure aggregation casts doubles to ``decimal(18,2)`` first —
  decimal arithmetic is exact in both engines regardless of summation
  order; the final cast to double is then deterministic.
- Ratios divide two already-deterministic doubles.
- Inherently floating aggregates (stddev/corr) and cosines are rounded.
- Rankings always carry an id tiebreaker; ranked floats are rounded
  *before* ranking in both engines.
- All aliases are lowercase and identical on both sides (the driver
  compares columns by name).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.operators import (
    asof,
    dedup,
    packing,
    sampling,
    similarity,
    skew,
    text,
)
from dbt_incremental_ci_spark.plans.recursion import (
    recursive_loop,
    supports_recursive_cte,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
# Oracles whose construction is expensive (parquet I/O, Python replica
# pipelines) register a thunk here instead of computing at import time;
# get_oracles() materializes them once on first access.
_LAZY_ORACLES: dict[str, Callable[[], str | None]] = {}


def get_oracles() -> dict[str, str]:
    """ORACLES plus lazily-built entries (memoized into ORACLES)."""
    for name in list(_LAZY_ORACLES):
        sql = _LAZY_ORACLES.pop(name)()
        if sql is not None:
            ORACLES[name] = sql
    return dict(ORACLES)


def q(name: str, oracle: str | None = None):
    def wrap(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return wrap


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract: ``ts`` is ALWAYS BIGINT nanoseconds-since-epoch,
    whatever the file's physical type — queries do exact integer
    arithmetic on it and never emit raw ts.

    - TIMESTAMP(NANOS) files (earlier testdata): Spark's vectorized
      reader rejects nanos; ``nanosAsLong`` reads them as the raw long
      (exact — no double conversion, nanos exceed 2^53).
    - TIMESTAMP(MICROS) files (current testdata): read natively, then
      ``unix_micros * 1000``. The session timezone is pinned UTC
      (session.py), so a TIMESTAMP_NTZ wall clock converts to the same
      epoch DuckDB's ``epoch_ns`` gives for the naive timestamp — the
      oracle twins stay aligned."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = t(spark, sf_dir, "events")
    ts_type = df.schema["ts"].dataType.simpleString()
    if ts_type in ("timestamp", "timestamp_ntz"):
        df = df.withColumn(
            "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
        )
    return df


def dec(col: str | F.Column) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def d(col: F.Column) -> F.Column:
    return col.cast("double")


# =====================================================================
# §2.2 projections / filters  +  §2.4 aggregation — pricing summary
# (SURVEY A1/A2/A5/P3; shape of TPC-H Q1 over the driver's lineitem)
# =====================================================================
@q(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_qty,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            d(F.sum(dec("l_quantity"))).alias("sum_qty"),
            d(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
            d(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))).alias(
                "sum_disc_price"
            ),
            (d(F.sum(dec("l_quantity"))) / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# =====================================================================
# §2.2 P1-P7: projection, computed CASE buckets, BETWEEN, IN, LIKE/ILIKE
# =====================================================================
@q(
    "q02_filter_project",
    """
    SELECT p_partkey,
           p_name,
           CASE WHEN p_retailprice < 500 THEN 'budget'
                WHEN p_retailprice < 1200 THEN 'standard'
                ELSE 'premium' END AS price_band,
           CAST(p_size AS INT) AS p_size,
           CAST(p_retailprice AS DOUBLE) AS p_retailprice
    FROM part
    WHERE p_size BETWEEN 10 AND 40
      AND p_type IN ('ECONOMY', 'STANDARD', 'PROMO')
      AND p_brand <> 'Brand#13'
      AND lower(p_name) LIKE '%o%'
      AND p_retailprice IS NOT NULL
    """,
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_size").between(10, 40)
        & F.col("p_type").isin("ECONOMY", "STANDARD", "PROMO")
        & (F.col("p_brand") != "Brand#13")
        & F.lower(F.col("p_name")).like("%o%")
        & F.col("p_retailprice").isNotNull()
    ).select(
        "p_partkey",
        "p_name",
        F.when(F.col("p_retailprice") < 500, "budget")
        .when(F.col("p_retailprice") < 1200, "standard")
        .otherwise("premium")
        .alias("price_band"),
        F.col("p_size").cast("int").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    )


# =====================================================================
# §2.3 J1/J3 joins + §2.6 O1/O2 top-k  (TPC-H Q3 shape)
# =====================================================================
@q(
    "q03_top_revenue_orders",
    """
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS o_orderdate,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            d(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))).alias("revenue")
        )
        .select("o_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"), "revenue")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# =====================================================================
# §2.4 A3/A4/A6: conditional aggregates (the reference's house style,
# count(case when …), count(distinct case when …), null-skipping avg)
# =====================================================================
@q(
    "q04_conditional_agg",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(CASE WHEN o_totalprice > 150000 THEN 1 END) AS BIGINT) AS n_big,
           CAST(COUNT(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_custkey END) AS BIGINT)
               AS n_f_customers,
           CAST(SUM(CASE WHEN o_orderstatus = 'F'
                         THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
               / NULLIF(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS avg_f_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    is_f = F.col("o_orderstatus") == "F"
    n_f = F.count(F.when(is_f, 1))
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("o_totalprice") > 150000, 1)).alias("n_big"),
        F.countDistinct(F.when(is_f, F.col("o_custkey"))).alias("n_f_customers"),
        (d(F.sum(F.when(is_f, dec("o_totalprice")))) / F.when(n_f != 0, n_f)).alias(
            "avg_f_price"
        ),
    )


# =====================================================================
# §2.4 A7: pivot-style max(case when …)  per nation × market segment
# =====================================================================
@q(
    "q05_pivot_segments",
    """
    SELECT c_nationkey,
           CAST(MAX(CASE WHEN c_mktsegment = 'BUILDING'
                         THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS max_building,
           CAST(MAX(CASE WHEN c_mktsegment = 'MACHINERY'
                         THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS max_machinery,
           CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE'
                         THEN CAST(c_acctbal AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE)
               AS sum_automobile
    FROM customer
    GROUP BY c_nationkey
    """,
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")

    def seg(s: str) -> F.Column:
        return F.when(F.col("c_mktsegment") == s, dec("c_acctbal"))

    return c.groupBy("c_nationkey").agg(
        d(F.max(seg("BUILDING"))).alias("max_building"),
        d(F.max(seg("MACHINERY"))).alias("max_machinery"),
        d(F.sum(F.coalesce(seg("AUTOMOBILE"), F.lit(0).cast("decimal(18,2)")))).alias(
            "sum_automobile"
        ),
    )


# =====================================================================
# §2.4 A13: global (grand-total) aggregate, no GROUP BY
# =====================================================================
@q(
    "q06_global_kpis",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
           CAST(MIN(l_shipdate) AS DATE) AS first_ship,
           CAST(MAX(l_shipdate) AS DATE) AS last_ship
    FROM lineitem
    """,
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        d(F.sum(dec("l_quantity"))).alias("total_qty"),
        F.min("l_shipdate").cast("date").alias("first_ship"),
        F.max("l_shipdate").cast("date").alias("last_ship"),
    )


# =====================================================================
# §2.4 A12: HAVING on aggregates
# =====================================================================
@q(
    "q07_having",
    """
    SELECT l_suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(*) > 550
    """,
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            d(F.sum(dec("l_quantity"))).alias("total_qty"),
        )
        .filter(F.col("n_items") > 550)
    )


# =====================================================================
# §2.4 A8/A9: stddev (sample) + Pearson corr  (rounded: float aggs)
# =====================================================================
@q(
    "q08_stats",
    """
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
           ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
    )


# =====================================================================
# §2.4 A10/A11 + §2.6 O3: ordered + distinct string aggregation
# =====================================================================
@q(
    "q09_string_agg",
    """
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.functions.agg import string_agg_ordered

    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            string_agg_ordered("n_name", ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


@q(
    "q09b_string_agg_distinct",
    """
    SELECT c_nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), '|') AS segments
    FROM customer
    GROUP BY c_nationkey
    """,
)
def q09b(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.functions.agg import string_agg_distinct

    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        string_agg_distinct("c_mktsegment", "|").alias("segments")
    )


# =====================================================================
# §2.5 W1: row_number top-k per group (ties broken by key)
# =====================================================================
@q(
    "q10_topk_per_nation",
    """
    SELECT c_nationkey, c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal,
           CAST(rn AS INT) AS rn
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "c_nationkey",
            "c_custkey",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            F.col("rn").cast("int").alias("rn"),
        )
    )


# =====================================================================
# §2.5 W2/W3: lag over aggregate output (monthly revenue trend)
# =====================================================================
@q(
    "q11_monthly_trend",
    """
    WITH monthly AS (
      SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS ym,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT ym, revenue,
           lag(revenue) OVER (ORDER BY ym) AS prev_revenue,
           revenue - lag(revenue) OVER (ORDER BY ym) AS revenue_delta
    FROM monthly
    """,
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("int").alias("ym")
    ).agg(d(F.sum(dec("o_totalprice"))).alias("revenue"))
    w = Window.orderBy("ym")
    return monthly.select(
        "ym",
        "revenue",
        F.lag("revenue").over(w).alias("prev_revenue"),
        (F.col("revenue") - F.lag("revenue").over(w)).alias("revenue_delta"),
    )


# =====================================================================
# §2.5 W4: first_value with ordered window (default frame)
# =====================================================================
@q(
    "q12_first_order",
    """
    SELECT o_orderkey, o_custkey,
           CAST(first_value(o_orderdate) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS DATE) AS first_order_date,
           CAST(date_diff('day',
                 CAST(first_value(o_orderdate) OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey) AS DATE),
                 CAST(o_orderdate AS DATE)) AS INT) AS days_since_first
    FROM orders
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    first_dt = F.first("o_orderdate").over(w)
    return o.select(
        "o_orderkey",
        "o_custkey",
        first_dt.cast("date").alias("first_order_date"),
        F.datediff(F.col("o_orderdate").cast("date"), first_dt.cast("date"))
        .cast("int")
        .alias("days_since_first"),
    )


# =====================================================================
# §2.5 W5: percent_rank over global ordering — served by the
# distributed two-phase rank (operators/ranks.py), NOT the naive
# global window: Window.orderBy with no partition funnels the whole
# table through Exchange SinglePartition (the round-3 plan audit
# flagged exactly that here; supplier grows linearly with SF).
# Semantics are identical to SQL percent_rank incl. tie collapse.
# =====================================================================
@q(
    "q13_percent_rank",
    """
    SELECT s_suppkey,
           ROUND(percent_rank() OVER (ORDER BY s_acctbal), 6) AS balance_pct_rank
    FROM supplier
    """,
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.ranks import global_percent_rank

    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    return global_percent_rank(s, "s_acctbal", "s_suppkey").select(
        "s_suppkey", F.round(F.col("pct_rank"), 6).alias("balance_pct_rank")
    )


# =====================================================================
# §2.5 W6: aggregate over partition window (share-of-group)
# =====================================================================
@q(
    "q14_share_of_customer",
    """
    SELECT o_orderkey, o_custkey,
           ROUND(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
                 / NULLIF(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                               OVER (PARTITION BY o_custkey) AS DOUBLE), 0), 6)
               AS share_of_customer
    FROM orders
    """,
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    tot = d(F.sum(dec("o_totalprice")).over(w))
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(d(dec("o_totalprice")) / F.when(tot != 0, tot), 6).alias(
            "share_of_customer"
        ),
    )


# =====================================================================
# §2.5 W7 at scale: grand-total share — NOT over() (single-partition
# shuffle); scalar agg + broadcast cross-join instead (SURVEY §4)
# =====================================================================
@q(
    "q15_nation_revenue_share",
    """
    WITH rev AS (
      SELECT c.c_nationkey,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS nation_rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey
    )
    SELECT c_nationkey,
           CAST(nation_rev AS DOUBLE) AS nation_revenue,
           ROUND(CAST(nation_rev AS DOUBLE)
                 / CAST(SUM(nation_rev) OVER () AS DOUBLE), 6) AS revenue_share
    FROM rev
    """,
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    rev = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o.o_custkey == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(F.sum(dec("o_totalprice")).alias("nation_rev"))
    )
    total = rev.agg(F.sum("nation_rev").alias("total_rev"))
    return rev.crossJoin(F.broadcast(total)).select(
        "c_nationkey",
        d(F.col("nation_rev")).alias("nation_revenue"),
        F.round(d(F.col("nation_rev")) / d(F.col("total_rev")), 6).alias("revenue_share"),
    )


# =====================================================================
# §2.3 J7: self theta-join, unordered pair generation (id < id)
# =====================================================================
@q(
    "q16_supplier_pairs",
    """
    SELECT a.s_nationkey AS nationkey,
           a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
           CAST(ABS(CAST(a.s_acctbal AS DECIMAL(18,2))
                    - CAST(b.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS balance_gap
    FROM supplier a
    JOIN supplier b
      ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
    """,
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    a = s.alias("a")
    b = s.alias("b")
    return a.join(
        b,
        (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
        & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
    ).select(
        F.col("a.s_nationkey").alias("nationkey"),
        F.col("a.s_suppkey").alias("supp_a"),
        F.col("b.s_suppkey").alias("supp_b"),
        d(F.abs(dec(F.col("a.s_acctbal")) - dec(F.col("b.s_acctbal")))).alias(
            "balance_gap"
        ),
    )


# =====================================================================
# §2.3 J8: non-equi residual join (shipped > 90 days after order)
# =====================================================================
@q(
    "q17_late_shipments",
    """
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_late,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS late_value
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
               AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY o.o_orderpriority
    """,
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_late"),
            d(F.sum(dec("l_extendedprice"))).alias("late_value"),
        )
    )


# =====================================================================
# §2.3 J5: full outer join with coalesced key
# =====================================================================
@q(
    "q18_full_outer_nations",
    """
    WITH cust AS (
      SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_rich_customers
      FROM customer WHERE c_acctbal > 7000 GROUP BY c_nationkey
    ), supp AS (
      SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_poor_suppliers
      FROM supplier WHERE s_acctbal < 2000 GROUP BY s_nationkey
    )
    SELECT COALESCE(cust.nk, supp.nk) AS nationkey,
           COALESCE(n_rich_customers, 0) AS n_rich_customers,
           COALESCE(n_poor_suppliers, 0) AS n_poor_suppliers
    FROM cust FULL OUTER JOIN supp ON cust.nk = supp.nk
    """,
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    cust = (
        c.filter(F.col("c_acctbal") > 7000)
        .groupBy(F.col("c_nationkey").alias("nk_c"))
        .agg(F.count(F.lit(1)).alias("n_rich_customers"))
    )
    supp = (
        s.filter(F.col("s_acctbal") < 2000)
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count(F.lit(1)).alias("n_poor_suppliers"))
    )
    return cust.join(supp, cust.nk_c == supp.nk_s, "full_outer").select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("n_rich_customers", F.lit(0)).alias("n_rich_customers"),
        F.coalesce("n_poor_suppliers", F.lit(0)).alias("n_poor_suppliers"),
    )


# =====================================================================
# §2.3 J4: right outer join (keep all customers)
# =====================================================================
@q(
    "q19_orders_per_customer",
    """
    SELECT c.c_custkey,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_open_orders
    FROM (SELECT * FROM orders WHERE o_orderstatus = 'P') o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_open_orders"))
    )


# =====================================================================
# §2.3 J6: cross join of dimension × single-row aggregate
# =====================================================================
@q(
    "q20_region_vs_global",
    """
    SELECT r.r_name,
           CAST(g.global_avg AS DOUBLE) AS global_avg_balance
    FROM region r
    CROSS JOIN (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS global_avg
      FROM customer
    ) g
    """,
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = t(spark, sf_dir, "region")
    c = t(spark, sf_dir, "customer")
    g = c.agg((d(F.sum(dec("c_acctbal"))) / F.count(F.lit(1))).alias("global_avg"))
    return r.crossJoin(F.broadcast(g)).select(
        "r_name", F.col("global_avg").cast("double").alias("global_avg_balance")
    )


# =====================================================================
# §2.3 J10: anti-join (customers with no completed 'F' orders)
# =====================================================================
@q(
    "q21_anti_join",
    """
    SELECT c_custkey, c_nationkey
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    """,
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_nationkey"
    )


# =====================================================================
# §2.3 J11: semi-join (EXISTS)
# =====================================================================
@q(
    "q22_semi_join",
    """
    SELECT c_custkey
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
    """,
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")


# =====================================================================
# §2.7 U1: UNION ALL conformed-KPI stack
# =====================================================================
@q(
    "q23_union_kpis",
    """
    SELECT 'total_customers' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM customer
    UNION ALL
    SELECT 'total_orders' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM orders
    UNION ALL
    SELECT 'total_order_value' AS metric,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS value FROM orders
    """,
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    b1 = c.agg(F.count(F.lit(1)).cast("double").alias("value")).select(
        F.lit("total_customers").alias("metric"), "value"
    )
    b2 = o.agg(F.count(F.lit(1)).cast("double").alias("value")).select(
        F.lit("total_orders").alias("metric"), "value"
    )
    b3 = o.agg(d(F.sum(dec("o_totalprice"))).alias("value")).select(
        F.lit("total_order_value").alias("metric"), "value"
    )
    return b1.unionByName(b2).unionByName(b3)


# =====================================================================
# §2.8 R1: recursive hierarchy walk (WITH RECURSIVE substitute).
# Synthetic binary-tree hierarchy over part: parent(k) = k // 2;
# the driver-side frontier loop mirrors
# int_course_prerequisite_chains.sql:3-36 (depth cap, path string).
# =====================================================================
@q(
    "q24_recursive_hierarchy",
    """
    WITH RECURSIVE chain AS (
      SELECT p_partkey, CAST(0 AS INT) AS depth,
             CAST(p_partkey AS VARCHAR) AS path
      FROM part WHERE p_partkey = 1
      UNION ALL
      SELECT p.p_partkey, c.depth + 1,
             c.path || '->' || CAST(p.p_partkey AS VARCHAR)
      FROM part p JOIN chain c ON p.p_partkey // 2 = c.p_partkey
      WHERE p.p_partkey > 1 AND c.depth < 10
    )
    SELECT p_partkey, depth, path FROM chain
    """,
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    if supports_recursive_cte(spark):
        # Spark 4+: one native recursive query — the engine unrolls the
        # loop internally, no per-step driver round trips. The edge
        # relation is projected to the key column and localCheckpoint-ed
        # first: every recursion level re-joins it, and 11 in-memory
        # probes beat 11 parquet re-scans (measured 2.65 s → 1.65 s
        # warm at sf0.1; on a cluster the same trick is a cached table).
        edges = (
            t(spark, sf_dir, "part")
            .select("p_partkey")
            .localCheckpoint(eager=True)
        )
        edges.createOrReplaceTempView("__q24_parts")
        return spark.sql(
            """
            WITH RECURSIVE chain AS (
              SELECT p_partkey, CAST(0 AS INT) AS depth,
                     CAST(p_partkey AS STRING) AS path
              FROM __q24_parts WHERE p_partkey = 1
              UNION ALL
              SELECT p.p_partkey, CAST(c.depth + 1 AS INT) AS depth,
                     CONCAT(c.path, '->', CAST(p.p_partkey AS STRING)) AS path
              FROM __q24_parts p
              JOIN chain c ON p.p_partkey DIV 2 = c.p_partkey
              WHERE p.p_partkey > 1 AND c.depth < 10
            )
            SELECT p_partkey, depth, path FROM chain
            """
        )
    p = t(spark, sf_dir, "part").select("p_partkey")
    seed = p.filter(F.col("p_partkey") == 1).select(
        "p_partkey",
        F.lit(0).cast("int").alias("depth"),
        F.col("p_partkey").cast("string").alias("path"),
    )
    children = p.filter(F.col("p_partkey") > 1).select(
        "p_partkey", F.floor(F.col("p_partkey") / 2).alias("parent")
    )

    def step(frontier: DataFrame, depth: int) -> DataFrame:
        return (
            children.join(
                frontier.select(
                    F.col("p_partkey").alias("parent_key"),
                    F.col("depth").alias("parent_depth"),
                    F.col("path").alias("parent_path"),
                ),
                F.col("parent") == F.col("parent_key"),
            )
            .filter(F.col("parent_depth") < 10)
            .select(
                "p_partkey",
                (F.col("parent_depth") + 1).cast("int").alias("depth"),
                F.concat(
                    F.col("parent_path"), F.lit("->"), F.col("p_partkey").cast("string")
                ).alias("path"),
            )
        )

    return recursive_loop(seed, step, max_iterations=11)


# =====================================================================
# §2.11 I1/I2: incremental watermark filter (scalar watermark read as a
# literal first — the partition-pruning-friendly plan, SURVEY §4)
# =====================================================================
@q(
    "q25_incremental_watermark",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_new,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS new_value
    FROM events
    WHERE ts > (SELECT MAX(ts) FROM events
                WHERE event_id < (SELECT MAX(event_id) / 2 FROM events))
    GROUP BY event_type
    """,
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    # driver-bound: 1 scalar row — simulated watermark split point
    half = ev.agg((F.max("event_id") / 2).alias("h")).collect()[0]["h"]
    # driver-bound: 1 scalar row — simulated watermark value
    wm = ev.filter(F.col("event_id") < half).agg(F.max("ts").alias("wm")).collect()[0]["wm"]
    return (
        ev.filter(F.col("ts") > F.lit(wm))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            d(F.sum(dec("value"))).alias("new_value"),
        )
    )


# =====================================================================
# Dedup: exact (hash-groupBy on content digest)
# =====================================================================
@q(
    "q26_exact_dedup",
    """
    SELECT md5(text) AS digest,
           CAST(MIN(doc_id) AS BIGINT) AS survivor_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("digest")).agg(
        F.min("doc_id").alias("survivor_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


# =====================================================================
# Text analysis: token counts / punct ratio / quality / fingerprint
# =====================================================================
@q(
    "q27_text_stats",
    r"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks,
             length(text) AS n_chars_total,
             length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS n_punct
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS INT) AS n_distinct_tokens,
           ROUND(CASE WHEN n_chars_total > 0
                      THEN CAST(n_punct AS DOUBLE) / n_chars_total ELSE 0 END, 6)
               AS punct_ratio,
           ROUND(0.5 * least(CAST(len(toks) AS DOUBLE) / 64.0, 1.0)
                 + 0.5 * (CASE WHEN len(toks) > 0
                               THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                               ELSE 0 END)
                 - least(CASE WHEN n_chars_total > 0
                              THEN CAST(n_punct AS DOUBLE) / n_chars_total ELSE 0 END,
                         0.5), 6) AS quality_score,
           md5(array_to_string(list_sort(list_distinct(
               list_transform(toks, x -> lower(x)))), ' ')) AS fingerprint
    FROM tok
    """,
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = text.tokens("text")
    return docs.select(
        "doc_id",
        text.token_count("text").alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(text.punct_ratio("text"), 6).alias("punct_ratio"),
        text.quality_score("text").alias("quality_score"),
        text.fingerprint("text").alias("fingerprint"),
    )


# =====================================================================
# Text analysis: stopword-vote language ID
# =====================================================================
def _langid_oracle() -> str:
    lists = {
        code: ", ".join(f"'{w}'" for w in text.STOPWORDS[code]) for code in text.STOPWORDS
    }
    score = {
        code: (
            f"len(list_filter(list_transform(list_filter(string_split_regex(text, '\\s+'),"
            f" x -> x <> ''), x -> lower(x)), x -> list_contains([{lists[code]}], x)))"
        )
        for code in lists
    }
    return f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {score['en']} AS s_en, {score['es']} AS s_es,
             {score['de']} AS s_de, {score['fr']} AS s_fr
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
                WHEN s_fr = greatest(s_en, s_es, s_de, s_fr) THEN 'fr'
                WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
                WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
                ELSE 'de' END AS lang_pred
    FROM scored
    """


@q("q28_lang_id", _langid_oracle())
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", text.lang_id("text").alias("lang_pred"))


# =====================================================================
# Similarity search: brute-force cosine top-k (exact baseline).
# Rank on ROUNDED cosine + id so Spark/DuckDB orderings agree.
# =====================================================================
@q(
    "q29_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.qv, e.embedding::DOUBLE[])
                   / NULLIF(sqrt(list_dot_product(q.qv, q.qv))
                            * sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                    e.embedding::DOUBLE[])), 0),
                   6) AS cosine
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    out = similarity.brute_force_topk(emb, queries, k=5)
    return out.select(
        "query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank")
    )


# =====================================================================
# Sessionization over the events stream table (gap > 30 min ⇒ new
# session): lag + running sum — batch analogue of stateful streaming.
# =====================================================================
@q(
    "q30_sessionize",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL THEN 1
                  WHEN date_diff('second',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) > 1800 THEN 1
                  ELSE 0 END AS is_new_session
      FROM events
    )
    SELECT user_id,
           CAST(SUM(is_new_session) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM flagged
    GROUP BY user_id
    """,
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir).withColumn(
        # epoch seconds (floor), matching DuckDB date_diff('second', …)
        # boundary-crossing semantics; integer div keeps nanos exact
        "ts_sec",
        F.expr("CAST(ts DIV 1000000000 AS BIGINT)"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_sec = F.lag("ts_sec").over(w)
    is_new = (
        F.when(prev_sec.isNull(), 1)
        .when(F.col("ts_sec") - prev_sec > 1800, 1)
        .otherwise(0)
    )
    return (
        ev.withColumn("is_new_session", is_new)
        .groupBy("user_id")
        .agg(
            F.sum("is_new_session").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# =====================================================================
# JSON property extraction from the events props column
# =====================================================================
@q(
    "q31_json_extract",
    r"""
    SELECT event_type,
           CAST(SUM(CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS BIGINT)
               AS sum_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n")
    )


# =====================================================================
# MinHash+LSH near-dup pipeline vs a GROUND-TRUTH oracle: DuckDB
# brute-forces exact char-5-shingle Jaccard >= 0.7 over all pairs; the
# LSH pipeline's output must equal that set exactly (banding at t=0.7
# has recall 1.0 on this corpus — near-dups are ~0.97+ similar — and
# the verify stage makes precision exact by construction). The sketch
# hashes themselves never need replicating: only the exact-Jaccard
# contract is compared.
# =====================================================================
@q(
    "q32_minhash_near_dups",
    r"""
    WITH sh AS (
      SELECT doc_id,
             CASE WHEN strlen(lower(text)) >= 5 THEN
               list_distinct(list_transform(
                 generate_series(1, strlen(lower(text)) - 4),
                 i -> substr(lower(text), i, 5)))
             ELSE [lower(text)] END AS s
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / len(list_distinct(list_concat(a.s, b.s))) >= 0.7
    """,
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return dedup.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.7)


@q("q33_simhash_near_dups")
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return dedup.simhash_near_pairs(docs, "doc_id", "text", max_hamming=12)


def _q33_oracle(sf_dir: str = "/root/testdata/sf0.01") -> str | None:
    """Expected-pairs VALUES oracle for the SimHash pipeline.

    xxhash64 doesn't exist in DuckDB, but the corpus is fixed and the
    driver compares at sf0.01 — so the oracle recomputes the whole
    pipeline INDEPENDENTLY in pure Python: public-spec XXH64
    (functions/xxh64.py, unit-tested bit-compatible with Spark's
    xxhash64), per-bit token voting, 16-bit-chunk candidate banding,
    hamming ≤ 12 — and inlines the resulting pairs as literals. Any
    divergence in tokenization, voting, banding, or popcount between
    the Spark operator and this replica fails the hash compare.
    """
    import re
    from collections import defaultdict

    import numpy as np

    try:
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
    except Exception:
        return None  # corpus unavailable → driver falls back to rows-only
    from dbt_incremental_ci_spark.functions.xxh64 import xxh64

    shifts = np.arange(64, dtype=np.uint64)
    sigs: dict[int, int] = {}
    for doc_id, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        toks = [tok for tok in re.split(r"\s+", (text or "").lower()) if tok]
        if not toks:
            sigs[doc_id] = 0
            continue
        hashes = np.array(
            [xxh64(tok.encode("utf-8"), 42) for tok in toks], dtype=np.uint64
        )
        ones = ((hashes[:, None] >> shifts[None, :]) & np.uint64(1)).sum(axis=0)
        votes = 2 * ones.astype(np.int64) - len(toks)
        sig = 0
        for b in range(64):
            if votes[b] > 0:
                sig |= 1 << b
        sigs[doc_id] = sig
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for i, s in sigs.items():
        for c in range(4):
            buckets[(c, (s >> (c * 16)) & 0xFFFF)].append(i)
    pairs: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids.sort()
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                pairs.add((ids[x], ids[y]))
    rows = [
        f"({a},{b},{(sigs[a] ^ sigs[b]).bit_count()})"
        for a, b in sorted(pairs)
        if (sigs[a] ^ sigs[b]).bit_count() <= 12
    ]
    if not rows:
        return None
    return (
        "SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, "
        "CAST(hamming AS INT) AS hamming FROM (VALUES "
        + ",".join(rows)
        + ") AS t(id_a, id_b, hamming)"
    )


_LAZY_ORACLES["q33_simhash_near_dups"] = _q33_oracle


@q("q34_lsh_ann_topk")
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.lsh_topk(emb, queries, k=5, dim=64, n_planes=6)


# =====================================================================
# Tumbling-window aggregation over the event stream (batch twin of the
# streaming windowed_event_counts; hour buckets via exact integer
# arithmetic on epoch nanos so Spark and DuckDB agree bit-for-bit)
# =====================================================================
@q(
    "q35_tumbling_windows",
    """
    SELECT CAST(date_part('epoch', date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    hour = F.expr("CAST((ts DIV 3600000000000) * 3600 AS BIGINT)")
    return (
        ev.groupBy(hour.alias("hour_epoch"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            d(F.sum(dec("value"))).alias("total_value"),
        )
    )


# =====================================================================
# Embedding-cosine near-duplicate pairs (LSH-blocked at scale). The
# synthetic corpus has no true near-duplicates (max pairwise cosine
# ≈ 0.44), so the query PLANTS deterministic twins — vec_id < 50 get a
# copy at id+1000000 with each dim scaled by 1 ± ≤3% (cosine ≈ 0.999)
# — and runs the real production threshold 0.95 over the LSH-blocked
# pipeline. Fully value-oracled: the perturbation, the hyperplane
# buckets (inlined constants) and the cosine all reproduce in DuckDB.
# =====================================================================
def _q36_perturbed_union(emb: DataFrame) -> DataFrame:
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    # two steps: perturb first, THEN rename — in a single select the
    # lambda's `vec_id` resolves against the aliased output (id+1000000)
    twins = (
        base.filter(F.col("vec_id") < 50)
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: x
                * (1.0 + ((F.col("vec_id") + i) % 7 - F.lit(3)) / F.lit(100.0)),
            ),
        )
        .select((F.col("vec_id") + 1000000).alias("vec_id"), "embedding")
    )
    return base.unionByName(twins)


@q("q36_embedding_near_dups")
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    unioned = _q36_perturbed_union(emb)
    # Banded SRP-LSH (4 bands × adaptive planes): fixed-plane blocking
    # was quadratic in scale (26.6× wall for the 10× sf1 step); the
    # adaptive plane count keeps expected bucket size ~64 at any n and
    # banding keeps recall up as planes grow. At every correctness SF
    # (sf0.001/0.01/0.1) adaptive resolves to the clamp floor of 6
    # planes — exactly what the DuckDB oracle inlines.
    return dedup.embedding_near_dup_pairs_banded(
        unioned, "vec_id", "embedding", dim=64, threshold=0.95,
        bands=4, planes_per_band=None, target_block=64, seed=42,
    )


def _q36_oracle() -> str:
    """DuckDB replica of q36: same planted twins, same inlined
    hyperplanes per band (q34 technique), same L2-normalize-then-dot
    cosine; candidates = pairs agreeing in ANY of the 4 bands (OR-join
    twin of the banded explode), then the same hamming-estimate
    prefilter over all 24 sign bits (bit_count(xor) ≤ ham_max) the
    operator applies before its exact verify — value-exact, including
    LSH recall behavior. Inlines 6 planes per band: the adaptive plane
    count resolves to its clamp floor of 6 at every correctness SF."""
    import math

    from dbt_incremental_ci_spark.operators.similarity import _hyperplane

    def arr(plane: list[float]) -> str:
        return "[" + ",".join(repr(x) for x in plane) + "]"

    def bucket_terms(band: int) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product(v, {arr(_hyperplane(64, p, 42 + 1000 * band))})"
            f" >= 0 THEN {1 << p} ELSE 0 END)"
            for p in range(6)
        )

    bkt_cols = ",\n                 ".join(
        f"({bucket_terms(band)}) AS bkt{band}" for band in range(4)
    )
    any_band = " OR ".join(f"a.bkt{band} = x.bkt{band}" for band in range(4))
    # same ham_max formula as embedding_near_dup_pairs_banded:
    # bands=4 × planes=6 bits, frac = min(0.45, 2.5·acos(0.95)/π)
    ham_max = int(4 * 6 * min(0.45, 2.5 * math.acos(0.95) / math.pi))
    ham_sum = " + ".join(
        f"bit_count(xor(a.bkt{band}::BIGINT, x.bkt{band}::BIGINT))"
        for band in range(4)
    )
    return f"""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    twins AS (
      SELECT vec_id + 1000000 AS vec_id,
             list_transform(generate_series(1, 64),
                            i -> v[i] * (1.0 + ((vec_id + i - 1) % 7 - 3) / 100.0)) AS v
      FROM base WHERE vec_id < 50
    ),
    u AS (SELECT * FROM base UNION ALL SELECT * FROM twins),
    b AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS v,
                 {bkt_cols}
          FROM u)
    SELECT a.vec_id AS id_a, x.vec_id AS id_b,
           ROUND(list_dot_product(a.v, x.v), 6) AS cosine
    FROM b a JOIN b x ON a.vec_id < x.vec_id AND ({any_band})
    WHERE {ham_sum} <= {ham_max}
      AND ROUND(list_dot_product(a.v, x.v), 6) >= 0.95
    """


ORACLES["q36_embedding_near_dups"] = _q36_oracle()


# =====================================================================
# Multimodal plumbing: synthesize binary payloads from documents, then
# run the Arrow-batched feature extractor. Full value oracle: the stub
# feature is a sha256 derivation, reproducible in DuckDB — each of the
# 8 dims is the digest's i-th 4-byte window as u32; the query emits
# those windows as exact BIGINTs (f0..f7) plus a feature_ok flag
# asserting the operator's array<float> column agrees with them (the
# floats themselves can't be hash-compared across engines).
# =====================================================================
@q(
    "q37_multimodal_features",
    """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           CAST(strlen(text) AS INT) AS n_bytes,
           sha256(text) AS digest,
    """
    + ",\n".join(
        f"           ('0x' || substr(sha256(text), {8 * i + 1}, 8))::BIGINT AS f{i}"
        for i in range(8)
    )
    + """,
           TRUE AS feature_ok
    FROM documents
    """,
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import multimodal as mm

    docs = t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    feats = mm.extract_features(media, dim=8)
    fcols = [
        F.conv(F.substring("digest", 8 * i + 1, 8), 16, 10)
        .cast("bigint")
        .alias(f"f{i}")
        for i in range(8)
    ]
    # |float32(u32/2^32) - u32/2^32| <= 2^-25 — 1e-6 bounds it safely
    ok = F.aggregate(
        F.zip_with(
            F.col("feature"),
            F.array(*[c / F.lit(4294967296.0) for c in fcols]),
            lambda a, b: F.abs(a.cast("double") - b) < 1e-6,
        ),
        F.lit(True),
        lambda acc, x: acc & x,
    )
    return feats.select(
        "media_id", "media_type", "n_bytes", "digest", *fcols, ok.alias("feature_ok")
    )


# =====================================================================
# n-gram (word) Jaccard near-dup verification on a fixed pair set —
# SQL-expressible, so it carries a full DuckDB oracle
# =====================================================================
@q(
    "q38_ngram_jaccard",
    r"""
    WITH grams AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(toks) - 1),
                                          i -> toks[i] || ' ' || toks[i + 1]))
                 AS gset
      FROM (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '') AS toks
        FROM documents WHERE doc_id < 40
      )
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.gset, b.gset)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.gset, b.gset))), 6) AS jaccard
    FROM grams a JOIN grams b ON a.doc_id < b.doc_id
    """,
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    gset = dedup.word_ngrams("text", 2)
    g = docs.select(F.col("doc_id").alias("__sid"), gset.alias("__set"))
    a, b = g.alias("a"), g.alias("b")
    return (
        a.join(b, F.col("a.__sid") < F.col("b.__sid"))
        .select(
            F.col("a.__sid").alias("id_a"),
            F.col("b.__sid").alias("id_b"),
            F.round(
                F.size(F.array_intersect("a.__set", "b.__set")).cast("double")
                / F.size(F.array_union("a.__set", "b.__set")),
                6,
            ).alias("jaccard"),
        )
    )


# =====================================================================
# §2.4 extension surface: ROLLUP hierarchies (noted in SURVEY §2.4 as
# "trivially available" — demonstrated with a full oracle)
# =====================================================================
@q(
    "q39_rollup",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            d(F.sum(dec("l_quantity"))).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


# =====================================================================
# Approximate distinct counting (HLL). The sketch value differs per
# engine, so the oracle checks the CONTRACT instead: the exact count
# hash-matches, and a within_tolerance boolean asserts the sketch is
# inside its configured error envelope (rsd=0.02; bound 5% ≈ 2.5σ).
# =====================================================================
@q(
    "q40_approx_distinct",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS within_tolerance
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    err = F.abs(F.col("approx_orders") - F.col("exact_orders")) / F.col(
        "exact_orders"
    )
    return agg.select(
        "l_returnflag", "exact_orders", (err <= 0.05).alias("within_tolerance")
    )


# =====================================================================
# Approximate quantiles with a tolerance contract (the sketch twin of
# q46's exact path): approx_percentile is a Greenwald-Khanna mergeable
# sketch — one partial-agg pass, no per-group sort — the right plan at
# 100 TB. Accuracy is engine-specific, so the oracle checks the
# CONTRACT: the approximate p50/p90 must land within the 1% rank band
# of the exact distribution (verified in-plan against exact
# percentiles at ranks 0.49/0.51 and 0.89/0.91).
# =====================================================================
@q(
    "q49_approx_quantiles",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS p50_in_band,
           TRUE AS p90_in_band
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("double")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx(qty, F.lit(0.5), F.lit(10000)).alias("a50"),
        F.percentile_approx(qty, F.lit(0.9), F.lit(10000)).alias("a90"),
        F.percentile(qty, F.lit(0.49)).alias("e49"),
        F.percentile(qty, F.lit(0.51)).alias("e51"),
        F.percentile(qty, F.lit(0.89)).alias("e89"),
        F.percentile(qty, F.lit(0.91)).alias("e91"),
    )
    in_band = lambda a, lo, hi: (F.col(a) >= F.col(lo)) & (F.col(a) <= F.col(hi))  # noqa: E731
    return agg.select(
        "l_returnflag",
        "n",
        in_band("a50", "e49", "e51").alias("p50_in_band"),
        in_band("a90", "e89", "e91").alias("p90_in_band"),
    )


# =====================================================================
# Skew-salted fact-to-dim join: identical semantics to the plain join
# (the oracle IS the plain join), but the hot key's rows spread over
# `salts` reducers — the deterministic fallback when AQE's skew split
# can't help (shuffled-hash build, single monster key). Money math in
# decimal before the double cast, per the determinism rules.
# =====================================================================
@q(
    "q50_salted_join",
    """
    SELECT p.p_brand,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
    """,
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_extendedprice", "l_discount"
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = skew.salted_join(li, part, on=["p_partkey"], salts=8)
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return joined.groupBy("p_brand").agg(
        d(F.sum(rev)).alias("revenue"), F.count(F.lit(1)).alias("n_items")
    )


# =====================================================================
# Deterministic hash sampling + train/val/test split (training-data
# reproducibility: a key keeps its sample membership and split forever,
# independent of partitioning/engine — md5-derived uniform, replicated
# verbatim in DuckDB)
# =====================================================================
def _q41_oracle() -> str:
    from dbt_incremental_ci_spark.operators.sampling import hash_uniform_sql

    u1 = hash_uniform_sql("doc_id", "bench")
    u2 = hash_uniform_sql("doc_id", "split")
    # build the CASE with the SAME float accumulation as hash_split
    # (0.8 + 0.1 != 0.9 exactly in binary — the literals must match)
    weights = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    case, hi = "CASE", 0.0
    for name, wgt in weights[:-1]:
        hi += wgt
        case += f" WHEN u2 < {hi!r} THEN '{name}'"
    case += f" ELSE '{weights[-1][0]}' END"
    return f"""
    SELECT doc_id, ROUND(u1, 6) AS u_sample, {case} AS split
    FROM (SELECT doc_id, {u1} AS u1, {u2} AS u2 FROM documents)
    WHERE u1 < 0.5
    """


@q("q41_hash_sample_split", _q41_oracle())
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    sampled = sampling.hash_sample(docs, "doc_id", 0.5, salt="bench")
    split = sampling.hash_split(
        sampled, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="split"
    )
    return split.select(
        "doc_id",
        F.round(sampling.hash_uniform("doc_id", "bench"), 6).alias("u_sample"),
        "split",
    )


# =====================================================================
# Sequence packing (concat-and-chunk) — the distributed prefix sum is
# the scale-critical part: two-phase (range partition → local window →
# broadcast offsets), never a single-task global window. DuckDB's
# single-node global window is the ground truth it must equal.
# =====================================================================
@q(
    "q42_sequence_packing",
    r"""
    WITH tok AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS tok_end
      FROM tok
    )
    SELECT doc_id, n_tokens,
           CAST(tok_end - n_tokens AS BIGINT) AS tok_start,
           CAST(tok_end AS BIGINT) AS tok_end,
           CAST((tok_end - n_tokens) // 2048 AS BIGINT) AS bin_start,
           CAST((tok_end - 1) // 2048 AS BIGINT) AS bin_end
    FROM c
    """,
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    with_tok = docs.select("doc_id", text.token_count("text").alias("n_tok"))
    return packing.pack_sequences(with_tok, "doc_id", "n_tok", context_len=2048)


# =====================================================================
# IVF-style ANN (Voronoi inverted lists + nprobe) — the second
# billion-scale ANN layout next to q34's hyperplane LSH. Centroids are
# deterministic constants, so the full pipeline (assignment, probe
# selection, in-list cosine top-k) replays in DuckDB.
# =====================================================================
def _q43_oracle(dim: int = 64, n_centroids: int = 8, nprobe: int = 2) -> str:
    from dbt_incremental_ci_spark.operators.similarity import ivf_centroid

    def arr(vec: list[float]) -> str:
        return "[" + ",".join(repr(x) for x in vec) + "]"

    dist_terms = ", ".join(
        f"ROUND(list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> (v[i] - ({arr(ivf_centroid(dim, cid))})[i])"
        f" * (v[i] - ({arr(ivf_centroid(dim, cid))})[i]))), 9)"
        for cid in range(n_centroids)
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    d AS (SELECT vec_id, v, [{dist_terms}] AS dists FROM e),
    c AS (SELECT vec_id AS neighbor_id, v AS cv,
                 CAST(list_position(dists, list_min(dists)) - 1 AS INT) AS lst
          FROM d),
    q AS (SELECT vec_id AS query_id, v AS qv,
                 list_transform(
                   list_slice(
                     list_sort(list_transform(generate_series(1, {n_centroids}),
                                              ci -> {{'d': dists[ci], 'c': ci - 1}})),
                     1, {nprobe}),
                   s -> s.c) AS probes
          FROM d WHERE vec_id < 10),
    qp AS (SELECT query_id, qv, unnest(probes) AS probe FROM q),
    scored AS (
      SELECT query_id, neighbor_id,
             ROUND(list_dot_product(qv, cv)
                   / NULLIF(sqrt(list_dot_product(qv, qv))
                            * sqrt(list_dot_product(cv, cv)), 0), 6) AS cosine
      FROM qp JOIN c ON c.lst = qp.probe AND c.neighbor_id <> qp.query_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """


@q("q43_ivf_ann_topk", _q43_oracle())
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.ivf_topk(
        emb, queries, k=5, dim=64, n_centroids=8, nprobe=2
    )


# =====================================================================
# PII scrubbing — regex redaction + audit counts. PII is PLANTED
# deterministically (every 5th doc gets an email/phone/SSN suffix) so
# the redaction paths actually fire; patterns live in the Java∩RE2
# common dialect and DuckDB replays them with the 'g' flag.
# =====================================================================
def _q44_oracle() -> str:
    from dbt_incremental_ci_spark.operators.text import PII_PATTERNS

    em, ph, ssn = PII_PATTERNS["email"], PII_PATTERNS["phone"], PII_PATTERNS["ssn"]
    return f"""
    WITH planted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN
               text || ' contact: user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or 555-123-4567 ssn 123-45-6789'
             ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
               '{em}', '<EMAIL>', 'g'),
               '{ssn}', '<SSN>', 'g'),
               '{ph}', '<PHONE>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(text, '{em}')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(text, '{ph}')) AS INT) AS n_phone,
           CAST(len(regexp_extract_all(text, '{ssn}')) AS INT) AS n_ssn
    FROM planted
    """


@q("q44_pii_scrub", _q44_oracle())
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                "text",
                F.lit(" contact: user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 555-123-4567 ssn 123-45-6789"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    counts = text.pii_counts("text")
    return planted.select(
        "doc_id",
        text.scrub_pii("text").alias("scrubbed"),
        *[c.alias(f"n_{kind}") for kind, c in counts.items()],
    )


# =====================================================================
# Native session windows (F.session_window) — the engine-native form
# of q30's manual gap-and-islands sessionization, shared verbatim with
# the streaming pipeline (streaming/pipeline.session_event_counts).
# Oracle: classic gap-and-islands SQL; a session's end is
# last-event + gap and an event at EXACTLY gap distance opens a new
# session (Spark's [start, last+gap) exclusivity — oracle uses >=).
# =====================================================================
@q(
    "q45_session_windows",
    """
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events
    ),
    f AS (
      SELECT user_id, t,
             CASE WHEN lag(t) OVER w IS NULL
                       OR t - lag(t) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
    ),
    g AS (
      SELECT user_id, t,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS sid
      FROM f
    )
    SELECT user_id,
           epoch_us(MIN(t)) AS session_start_us,
           epoch_us(MAX(t) + INTERVAL 30 MINUTE) AS session_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM g GROUP BY user_id, sid
    """,
)
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.streaming.pipeline import session_event_counts

    ev = events_table(spark, sf_dir).withColumn(
        "t", F.timestamp_micros(F.expr("ts DIV 1000"))
    )
    out = session_event_counts(ev, "t", gap="30 minutes", group_cols=["user_id"])
    return out.select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n_events",
    )


# =====================================================================
# Exact interpolated quantiles per group (the distributed exact path —
# Spark's `percentile` sorts within each group; at scale per-group
# sorting shuffles once on the group key. DuckDB's quantile_cont uses
# the same linear interpolation; results rounded to 6.)
# =====================================================================
@q(
    "q46_quantiles",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS p50,
           ROUND(quantile_cont(CAST(l_quantity AS DOUBLE), 0.9), 6) AS p90,
           ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 6)
               AS price_p50
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile(F.col("l_quantity").cast("double"), F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile(F.col("l_quantity").cast("double"), F.lit(0.9)), 6).alias("p90"),
        F.round(
            F.percentile(F.col("l_extendedprice").cast("double"), F.lit(0.5)), 6
        ).alias("price_p50"),
    )


# =====================================================================
# Backward as-of join (attribution: each purchase event's most recent
# prior view by the same user). Spark has no ASOF JOIN; the operator
# uses the union-merge plan — one shuffle on user_id, per-key sorted
# carry-forward — instead of the quadratic join+argmax rewrite. DuckDB
# replicates via join + row_number argmax with the same (ts desc, id
# desc) tiebreak. Gap is integer seconds on exact nanos, no floats.
# =====================================================================
@q(
    "q47_asof_attribution",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         v AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'view'),
         j AS (
           SELECT p.event_id, p.user_id, v.event_id AS last_view_id,
                  (epoch_ns(p.ts) - epoch_ns(v.ts)) // 1000000000 AS gap_sec,
                  row_number() OVER (PARTITION BY p.event_id
                                     ORDER BY v.ts DESC, v.event_id DESC) AS rn
           FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.ts <= p.ts
         )
    SELECT event_id, user_id, last_view_id,
           CAST(gap_sec AS BIGINT) AS gap_sec
    FROM j WHERE rn = 1
    """,
)
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("vts"),
        F.col("event_id").alias("last_view_id"),
    )
    joined = asof.asof_join_backward(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="vts",
        right_payload=["last_view_id", "vts"],
        tiebreak="last_view_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        "last_view_id",
        F.expr("(ts - vts) DIV 1000000000").alias("gap_sec"),
    )


# =====================================================================
# Keyless range (interval) join: error events within 5 minutes AFTER
# any purchase, cross-user. With no equi key Spark would plan a
# BroadcastNestedLoopJoin (O(|L| x |R|)); the operator buckets the
# time axis into window-width bins and equi-joins on the bin, so each
# qualifying pair meets in exactly one bin. DuckDB brute-forces the
# inequality join as ground truth.
# =====================================================================
@q(
    "q48_range_join",
    """
    SELECT p.event_id AS p_id, e.event_id AS e_id,
           CAST((epoch_ns(e.ts) - epoch_ns(p.ts)) // 1000000000 AS BIGINT)
               AS delta_sec
    FROM events p JOIN events e
      ON p.event_type = 'purchase' AND e.event_type = 'error'
     AND epoch_ns(e.ts) >= epoch_ns(p.ts)
     AND epoch_ns(e.ts) <= epoch_ns(p.ts) + 300000000000
    """,
)
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("ts").alias("pts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"), F.col("ts").alias("ets")
    )
    pairs = asof.range_join(
        purchases, errors, left_ts="pts", right_ts="ets",
        lower=0, upper=300_000_000_000,
    )
    return pairs.select(
        "p_id", "e_id", F.expr("(ets - pts) DIV 1000000000").alias("delta_sec")
    )


# =====================================================================
# Stratified deterministic sampling (training-mix rebalance: keep all
# of the rare languages, downsample the dominant one). Same md5
# variate as q41, so the DuckDB oracle replays it exactly; the rate
# lookup is a CASE chain — still a pure per-row filter, no shuffle.
# =====================================================================
def _q51_oracle() -> str:
    from dbt_incremental_ci_spark.operators.sampling import hash_uniform_sql

    u = hash_uniform_sql("doc_id", "mix")
    rates = ("CASE lang WHEN 'en' THEN 0.25 WHEN 'zh' THEN 0.5 "
             "WHEN 'de' THEN 1.0 WHEN 'fr' THEN 1.0 ELSE 0.0 END")
    return f"""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
           ROUND(SUM({u}), 6) AS u_sum
    FROM documents WHERE {u} < {rates}
    GROUP BY lang
    """


@q("q51_stratified_sample", _q51_oracle())
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    kept = sampling.stratified_hash_sample(
        docs,
        "doc_id",
        "lang",
        {"en": 0.25, "zh": 0.5, "de": 1.0, "fr": 1.0},
        salt="mix",
    )
    u = sampling.hash_uniform("doc_id", "mix")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"), F.round(F.sum(u), 6).alias("u_sum")
    )


# =====================================================================
# Near-dup GROUPS: connected components over the MinHash pair graph
# (pairs alone don't dedup — transitive chains must collapse to one
# survivor per component). Spark side: iterative min-label
# propagation, one shuffle per round, rounds = component diameter.
# DuckDB replays it as WITH RECURSIVE min-reachable-label over the
# same ground-truth exact-Jaccard edges the q32 oracle brute-forces.
# =====================================================================
@q(
    "q52_dedup_components",
    r"""
    WITH RECURSIVE
    sh AS (
      SELECT doc_id,
             CASE WHEN strlen(lower(text)) >= 5 THEN
               list_distinct(list_transform(
                 generate_series(1, strlen(lower(text)) - 4),
                 i -> substr(lower(text), i, 5)))
             ELSE [lower(text)] END AS s
      FROM documents
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.s, b.s))) >= 0.7
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION ALL
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(node, label) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.label FROM edges e JOIN reach r ON r.node = e.v
    ),
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node)
    SELECT d.doc_id,
           COALESCE(c.component, d.doc_id) AS component,
           (COALESCE(c.component, d.doc_id) = d.doc_id) AS is_survivor
    FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    """,
)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import components as cc

    docs = t(spark, sf_dir, "documents")
    pairs = dedup.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.7)
    return cc.dedup_components(
        docs.select("doc_id"), pairs.select("id_a", "id_b"), "doc_id"
    )


# =====================================================================
# Window-function breadth: ntile quartiles, cume_dist, nth_value.
# Ordering carries the c_custkey tiebreak on BOTH sides so tied
# balances bucket identically; nth_value uses an explicit full frame
# (DuckDB's default frame stops at the current row, Spark's nth_value
# needs unbounded-following to see the 2nd row from everywhere).
# =====================================================================
@q(
    "q53_window_family",
    """
    SELECT c_custkey,
           c_mktsegment,
           ntile(4) OVER w AS balance_quartile,
           ROUND(cume_dist() OVER w, 6) AS balance_cume,
           nth_value(c_custkey, 2) OVER
             (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_poorest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("balance_quartile"),
        F.round(F.cume_dist().over(w), 6).alias("balance_cume"),
        F.nth_value("c_custkey", 2).over(wfull).alias("second_poorest"),
    )


# =====================================================================
# Set operations: INTERSECT / EXCEPT (distinct semantics both sides).
# =====================================================================
@q(
    "q54_set_ops",
    """
    SELECT 'both' AS tag, nk FROM (
      SELECT c_nationkey AS nk FROM customer
      INTERSECT
      SELECT s_nationkey AS nk FROM supplier)
    UNION ALL
    SELECT 'customer_only' AS tag, nk FROM (
      SELECT c_nationkey AS nk FROM customer
      EXCEPT
      SELECT s_nationkey AS nk FROM supplier)
    """,
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    supp = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    both = cust.intersect(supp).select(F.lit("both").alias("tag"), "nk")
    # subtract == SQL EXCEPT (distinct semantics)
    only = cust.subtract(supp).select(F.lit("customer_only").alias("tag"), "nk")
    return both.unionByName(only)


# =====================================================================
# CUBE + grouping_id (all four grouping combinations in one pass —
# Spark expands the cube map-side, one shuffle). gid bit order is
# (first col = MSB) in both engines; DuckDB spells it GROUPING(a, b).
# =====================================================================
@q(
    "q55_cube",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            d(F.sum(dec("o_totalprice"))).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "total",
            "n",
        )
    )


# =====================================================================
# UNPIVOT (wide → long): stack() in Spark, spelled as UNION ALL in the
# oracle (engine-portable). Decimal-cast before the per-measure sums.
# =====================================================================
@q(
    "q56_unpivot",
    """
    SELECT measure, CAST(SUM(v) AS DOUBLE) AS total,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT 'extendedprice' AS measure,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS v FROM lineitem
      UNION ALL
      SELECT 'discount', CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
      UNION ALL
      SELECT 'tax', CAST(l_tax AS DECIMAL(18,2)) FROM lineitem
    )
    GROUP BY measure
    """,
)
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    long = li.select(
        F.expr(
            "stack(3, 'extendedprice', CAST(l_extendedprice AS DECIMAL(18,2)),"
            " 'discount', CAST(l_discount AS DECIMAL(18,2)),"
            " 'tax', CAST(l_tax AS DECIMAL(18,2))) AS (measure, v)"
        )
    )
    return long.groupBy("measure").agg(
        d(F.sum("v")).alias("total"), F.count(F.lit(1)).alias("n")
    )


# =====================================================================
# Lateral explode / unnest: tokenize documents and count word
# frequencies per language (top-5 with deterministic tiebreak). The
# explode is map-side — no shuffle until the count agg; DuckDB's
# unnest over string_split_regex is the exact twin of the \s+ split.
# =====================================================================
@q(
    "q57_explode_tokens",
    r"""
    WITH words AS (
      SELECT lang, lower(w) AS word
      FROM documents,
           unnest(string_split_regex(trim(text), '\s+')) AS u(w)
      WHERE strlen(trim(text)) > 0
    ),
    counts AS (
      SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS n
      FROM words GROUP BY lang, word
    )
    SELECT lang, word, n, CAST(rnk AS INT) AS rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY n DESC, word) AS rnk
      FROM counts
    ) WHERE rnk <= 5
    """,
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    words = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select(
            "lang",
            F.explode(F.split(F.trim("text"), r"\s+")).alias("w"),
        )
        .select("lang", F.lower("w").alias("word"))
    )
    counts = words.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("word"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .withColumn("rnk", F.col("rnk").cast("int"))
    )


# =====================================================================
# Fuzzy entity matching: blocked levenshtein self-join (the
# entity-resolution primitive). Blocking on nation bounds the pair
# space to per-block quadratics (the same block-then-verify shape as
# the LSH dedup pipelines — never an unblocked cartesian); edit
# distance is a JVM built-in on both engines.
# =====================================================================
@q(
    "q58_fuzzy_match",
    """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Deletion-neighborhood (FastSS) blocking: lev(a,b) <= 1 iff the
    # {s} ∪ del1(s) variant sets intersect, so the plan is one shuffle
    # on (nation, variant) + bounded levenshtein verify on candidates —
    # LINEAR in rows where the old per-nation all-pairs broadcast was
    # quadratic in block size (49.7× wall for the 10× sf1 step; this
    # plan steps ~linearly). Semantics identical to the oracle's
    # all-pairs SQL — blocking is exact for edit distance 1.
    from dbt_incremental_ci_spark.operators.fuzzy import edit_distance_pairs
    from dbt_incremental_ci_spark.operators.scaling import ensure_min_parallelism

    cust = ensure_min_parallelism(
        t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_name")
    )
    return edit_distance_pairs(
        cust, "c_custkey", "c_name", block_cols=["c_nationkey"]
    ).select("id_a", "id_b", "dist")


# =====================================================================
# Explicit ROWS-frame windows: 7-row moving average and running sum of
# daily revenue (the reference uses only default frames — this covers
# the bounded-frame surface). The unpartitioned window is safe HERE
# because it runs on the post-aggregation daily table (|days| rows,
# thousands at any SF), never on the fact table — the same
# aggregate-then-window shape as the reference's trend models.
# =====================================================================
@q(
    "q59_moving_avg",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    )
    SELECT day,
           ROUND(CAST(SUM(rev) OVER (ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / COUNT(*) OVER (ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7,
           ROUND(CAST(SUM(rev) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE), 4) AS cum_rev
    FROM daily
    """,
)
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    # window sums stay DECIMAL (exact in any accumulation order /
    # segment-tree shape); the double cast + divide happen on already-
    # exact values, so both engines round the same number
    orders = t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.sum(dec("o_totalprice")).alias("rev"))
    w = Window.orderBy("day")
    ma = w.rowsBetween(-6, Window.currentRow)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        F.round(
            d(F.sum("rev").over(ma)) / F.count(F.lit(1)).over(ma), 4
        ).alias("ma7"),
        F.round(d(F.sum("rev").over(cum)), 4).alias("cum_rev"),
    )


# =====================================================================
# Date-function breadth: date_trunc / add_months / last_day / datediff
# / quarter (beyond the §2.9 shim families). Spark's date_trunc emits
# TIMESTAMP — cast back to DATE on both sides; month addition clamps
# month-ends identically in both engines.
# =====================================================================
@q(
    "q60_date_functions",
    """
    SELECT o_orderkey,
           CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
               AS order_month,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
               AS plus3m,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch,
           CAST(quarter(o_orderdate) AS INT) AS qtr
    FROM orders
    """,
)
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    day = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.date_trunc("month", day).cast("date").alias("order_month"),
        F.add_months(day, 3).alias("plus3m"),
        F.last_day(day).alias("month_end"),
        F.datediff(day, F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
    )


# =====================================================================
# String-function breadth: lpad/rpad, split_part, instr/strpos,
# translate, reverse, left — identical semantics across engines.
# =====================================================================
@q(
    "q61_string_functions",
    """
    SELECT p_partkey,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
           split_part(p_name, ' ', 1) AS first_word,
           CAST(strpos(p_name, 'a') AS INT) AS first_a,
           translate(p_brand, '#', '-') AS brand_dashed,
           reverse(left(p_name, 5)) AS rev5,
           rpad(p_type, 12, '.') AS type_padded
    FROM part
    """,
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
        F.split_part("p_name", F.lit(" "), F.lit(1)).alias("first_word"),
        F.instr("p_name", "a").cast("int").alias("first_a"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
        F.reverse(F.expr("left(p_name, 5)")).alias("rev5"),
        F.rpad("p_type", 12, ".").alias("type_padded"),
    )


def _lsh_topk_oracle() -> str:
    """Full value oracle for the LSH ANN path: the hyperplanes are
    deterministic hash-derived constants, so they inline into SQL as
    literal arrays and DuckDB reproduces bucket assignment + ranking."""
    from dbt_incremental_ci_spark.operators.similarity import _hyperplane

    def arr(plane: list[float]) -> str:
        return "[" + ",".join(repr(x) for x in plane) + "]"

    def bucket(col: str) -> str:
        terms = [
            f"(CASE WHEN list_dot_product({col}::DOUBLE[], {arr(_hyperplane(64, p, 42))})"
            f" >= 0 THEN {1 << p} ELSE 0 END)"
            for p in range(6)
        ]
        return "(" + " + ".join(terms) + ")"

    return f"""
    WITH c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
                      {bucket('embedding')} AS bkt
               FROM embeddings),
    qs AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
                  {bucket('embedding')} AS qbkt
           FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT qs.query_id, c.neighbor_id,
             ROUND(list_dot_product(qs.qv, c.cv)
                   / NULLIF(sqrt(list_dot_product(qs.qv, qs.qv))
                            * sqrt(list_dot_product(c.cv, c.cv)), 0), 6) AS cosine
      FROM qs JOIN c ON c.bkt = qs.qbkt AND c.neighbor_id <> qs.query_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """


ORACLES["q34_lsh_ann_topk"] = _lsh_topk_oracle()


# =====================================================================
# TF-IDF top terms per document (text-analysis breadth for the
# training-data pipeline). Shape: explode → two hash aggs (term
# frequency, document frequency) → join → per-doc top-k window. The
# doc-frequency join keys on the term — vocabulary is heavy-tailed, so
# this stays a shuffle join under AQE (broadcasting a 100 TB corpus
# vocabulary is not an option); the corpus size N rides along as a
# broadcast single-row cross join, never a driver-side collect.
# Determinism: tf/doc_len/df are exact integers; ln and the divides are
# IEEE-deterministic on them; round(…, 6) before ranking; word
# tiebreak.
# =====================================================================
@q(
    "q62_tfidf_top_terms",
    r"""
    WITH words AS (
      SELECT doc_id, lower(w) AS word
      FROM documents,
           unnest(string_split_regex(trim(text), '\s+')) AS u(w)
      WHERE strlen(trim(text)) > 0
    ),
    tf AS (
      SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
      FROM words GROUP BY doc_id, word
    ),
    doclen AS (
      SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS doc_len FROM tf GROUP BY doc_id
    ),
    dfreq AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM doclen),
    scored AS (
      SELECT t.doc_id, t.word, t.tf,
             ROUND((CAST(t.tf AS DOUBLE) / dl.doc_len)
                   * (ln((n.n_docs + 1.0) / (d.df + 1.0)) + 1.0), 6) AS tfidf
      FROM tf t
      JOIN doclen dl USING (doc_id)
      JOIN dfreq d USING (word)
      CROSS JOIN n
    )
    SELECT doc_id, word, tf, tfidf, CAST(rnk AS INT) AS rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, word) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
)
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    words = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .select("doc_id", F.lower("w").alias("word"))
    )
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    doclen = tf.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n = doclen.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(doclen, "doc_id")
        .join(dfreq, "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            "tf",
            F.round(
                (F.col("tf").cast("double") / F.col("doc_len"))
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("word"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .withColumn("rnk", F.col("rnk").cast("int"))
    )


# =====================================================================
# Histogram binning: fixed-bound equal-width buckets as pure integer
# arithmetic (no two-pass min/max, no sort — one hash agg at any
# scale), plus each bucket's share of rows via a broadcast single-row
# total (the scale-safe rewrite of `over ()`, same as q15).
# =====================================================================
@q(
    "q63_histogram",
    """
    WITH b AS (
      SELECT LEAST(GREATEST(CAST(FLOOR(o_totalprice / 30000.0) AS INT), 0), 19)
                 AS bucket,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders
    ),
    agg AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(price) AS DOUBLE) AS total
      FROM b GROUP BY bucket
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS all_n FROM agg)
    SELECT bucket, n, total, ROUND(CAST(n AS DOUBLE) / all_n, 6) AS share
    FROM agg CROSS JOIN tot
    """,
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    bucket = F.least(
        F.greatest(F.floor(F.col("o_totalprice") / 30000.0).cast("int"), F.lit(0)),
        F.lit(19),
    )
    agg = orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        d(F.sum(dec("o_totalprice"))).alias("total"),
    )
    tot = agg.agg(F.sum("n").alias("all_n"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n",
        "total",
        F.round(F.col("n").cast("double") / F.col("all_n"), 6).alias("share"),
    )


# =====================================================================
# Per-group z-score normalization (feature scaling for training
# pipelines). stddev over doubles is accumulation-order-dependent, so
# the moments are computed as EXACT integer sums (n, Σx, Σx²) — one
# hash agg — and mean/variance derived from them in closed form; the
# derivation is bit-identical in any engine, so z-scores hash-match
# without tolerance. The tiny per-group moment table broadcasts back
# onto the fact side.
# =====================================================================
@q(
    "q64_zscore_normalize",
    """
    WITH m AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_chars) AS BIGINT) AS s,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS ss
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang, d.n_chars,
           ROUND((d.n_chars - CAST(m.s AS DOUBLE) / m.n)
                 / NULLIF(sqrt((m.ss - CAST(m.s AS DOUBLE) * m.s / m.n)
                               / NULLIF(m.n - 1, 0)), 0), 4) AS z
    FROM documents d JOIN m USING (lang)
    """,
)
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    m = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("n")) / F.nullif(
        (F.col("n") - 1).cast("bigint"), F.lit(0).cast("bigint")
    )
    return docs.join(F.broadcast(m), "lang").select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(
            (F.col("n_chars") - mean) / F.nullif(F.sqrt(var), F.lit(0.0)), 4
        ).alias("z"),
    )


# =====================================================================
# Hopping (sliding) windows: 10-minute windows every 5 minutes via the
# NATIVE F.window(…, windowDuration, slideDuration) operator — each
# event lands in W/H = 2 windows, expanded map-side before the single
# hash agg. events.ts arrives as raw nanoseconds (see events_table);
# truncating to microseconds feeds Spark's timestamp windowing, and
# the oracle replays the same epoch-µs arithmetic. Window starts are
# emitted as epoch seconds (H divides them exactly).
# =====================================================================
@q(
    "q65_hopping_windows",
    """
    WITH e AS (
      SELECT epoch_ns(ts) // 1000 AS us,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events
    ),
    expanded AS (
      SELECT ((us // 300000000) - k.k) * 300 AS win_start,
             v
      FROM e, (SELECT unnest([0, 1]) AS k) k
    )
    SELECT CAST(win_start AS BIGINT) AS win_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(v) AS DOUBLE) AS total_value
    FROM expanded GROUP BY win_start
    """,
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    tstamp = F.timestamp_micros(F.expr("ts DIV 1000"))
    return (
        ev.select(tstamp.alias("t"), dec("value").alias("v"))
        .groupBy(F.window("t", "10 minutes", "5 minutes").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            d(F.sum("v")).alias("total_value"),
        )
        .select(
            F.col("win.start").cast("long").alias("win_start"),
            "n_events",
            "total_value",
        )
    )


# =====================================================================
# Incremental aggregate maintenance: history and new batch are each
# reduced to mergeable state (count + decimal sum — a commutative
# monoid), then merged with a second O(|keys|) aggregation; avg is
# derived at read time. At 100 TB the history state is a stored table
# and only the batch is scanned — the oracle (one flat aggregate over
# everything) IS the semantics being preserved. Operator:
# operators/aggstate.py; split/merge equivalence property-tested in
# tests.
# =====================================================================
@q(
    "q66_partial_agg_merge",
    """
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) AS avg_price
    FROM orders GROUP BY o_custkey
    """,
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import aggstate

    orders = t(spark, sf_dir, "orders").withColumn(
        "price", dec("o_totalprice")
    )
    cutoff = F.lit("1997-01-01").cast("timestamp_ntz")
    measures = {"n_orders": ("count", "o_custkey"), "total_dec": ("sum", "price")}
    history = aggstate.partial_agg(
        orders.filter(F.col("o_orderdate") < cutoff), ["o_custkey"], measures
    )
    batch = aggstate.partial_agg(
        orders.filter(F.col("o_orderdate") >= cutoff), ["o_custkey"], measures
    )
    merged = aggstate.merge_partials([history, batch], ["o_custkey"], measures)
    return merged.select(
        "o_custkey",
        "n_orders",
        d(F.col("total_dec")).alias("total"),
        # no round: the quotient of an exact decimal-derived double by an
        # int is the same IEEE double in every engine; rounding a
        # halfway repr is what diverges (q01's avg_qty rule)
        (d(F.col("total_dec")) / F.col("n_orders")).alias("avg_price"),
    )


# =====================================================================
# Array-function breadth over the embedding column: size / array_max /
# array_min / array_position / slice — all JVM built-ins, no UDFs. The
# 8-element head sum is written as explicit left-associated element
# adds so both engines accumulate in the same order (a fold over the
# full vector is q29's job; per-element expansion beyond ~8 terms is
# the documented plan-bloat landmine — docs/SCALE.md).
# =====================================================================
_Q67_SQL = """
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS vmax,
           ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS vmin,
           CAST(list_position(embedding, list_max(embedding)) AS INT) AS pos_max,
           ROUND(CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
                 + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE)
                 + CAST(embedding[5] AS DOUBLE) + CAST(embedding[6] AS DOUBLE)
                 + CAST(embedding[7] AS DOUBLE) + CAST(embedding[8] AS DOUBLE),
                 6) AS head_sum,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
    FROM embeddings
    """


def _q68_oracle() -> str:
    from dbt_incremental_ci_spark.operators.sampling import hash_uniform_sql

    u = hash_uniform_sql("doc_id", "curate")
    return rf"""
    WITH tok AS (
      SELECT doc_id, lang, text,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks,
             length(text) AS nc,
             length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS np
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang, text, CAST(len(toks) AS INT) AS n_tokens,
             ROUND(0.5 * least(CAST(len(toks) AS DOUBLE) / 64.0, 1.0)
                   + 0.5 * (CASE WHEN len(toks) > 0
                                 THEN CAST(len(list_distinct(toks)) AS DOUBLE)
                                      / len(toks) ELSE 0 END)
                   - least(CASE WHEN nc > 0
                                THEN CAST(np AS DOUBLE) / nc ELSE 0 END,
                           0.5), 6) AS quality
      FROM tok
    ),
    kept AS (SELECT * FROM scored WHERE quality >= 0.60),
    dedup AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY md5(text)
                                     ORDER BY doc_id) AS rn
        FROM kept
      ) WHERE rn = 1
    )
    SELECT doc_id, lang, n_tokens, quality
    FROM dedup WHERE {u} < 0.5
    """


# =====================================================================
# End-to-end curation pipeline — the composed shape a 100 TB
# training-data run actually executes: quality gate (per-row Column
# math, map-side) → exact dedup (one shuffle on the content digest,
# survivor = min id) → deterministic hash sample (per-row filter,
# key-stable across reruns/engines/partitionings). Only ONE shuffle in
# the whole pipeline; every stage reuses an operator that is
# individually oracled (q27 quality, q26 dedup, q41 sampling).
# =====================================================================
@q("q68_curation_pipeline", _q68_oracle())
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import sampling

    docs = t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        "text",
        text.token_count("text").alias("n_tokens"),
        F.round(text.quality_score("text"), 6).alias("quality"),
    )
    kept = scored.filter(F.col("quality") >= 0.60)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = kept.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return deduped.filter(sampling.hash_uniform("doc_id", "curate") < 0.5).select(
        "doc_id", "lang", "n_tokens", "quality"
    )


# =====================================================================
# Heavy hitters via approx_top_k (Spark 4's frequent-items sketch —
# mergeable, one pass, no global sort; the 100 TB replacement for
# ORDER BY count DESC LIMIT k over a high-cardinality domain). The
# sketch tracks 10k items, far above this domain's cardinality, so
# reported counts are exact and the oracle is the exact top-k; on a
# larger-than-tracked domain the contract would weaken to
# within-tolerance (q40's pattern).
# =====================================================================
@q(
    "q69_heavy_hitters",
    """
    SELECT event_type, CAST(cnt AS BIGINT) AS cnt, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT event_type, COUNT(*) AS cnt,
             row_number() OVER (ORDER BY COUNT(*) DESC, event_type) AS rnk
      FROM events GROUP BY event_type
    ) WHERE rnk <= 3
    """,
)
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    topk = ev.agg(F.expr("approx_top_k(event_type, 3)").alias("tk"))
    item = F.explode("tk").alias("e")
    return (
        topk.select(item)
        .select(
            F.col("e.item").alias("event_type"),
            F.col("e.count").cast("bigint").alias("cnt"),
        )
        .withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.col("cnt").desc(), F.col("event_type")))
            .cast("int"),
        )
    )


# =====================================================================
# Mergeable HLL sketch state — q66's incremental-aggregate-maintenance
# pattern extended to APPROX-DISTINCT: per-month sketches built
# independently over history and new batch (hll_sketch_agg), merged
# with hll_union_agg (the sketch is the monoid state; a stored state
# table needs only the batch scanned per run), estimate checked
# against exact COUNT(DISTINCT) with a tolerance contract (HLL lgK=12
# rel. err ≈1.6% ≪ the 5% gate). Estimates are engine-specific, so
# the oracle pins the exact counts + the contract boolean (q40 rule).
# =====================================================================
@q(
    "q70_hll_merge",
    """
    SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
           TRUE AS within_tolerance
    FROM orders GROUP BY 1
    """,
)
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate").cast("date")).cast("date")
    cutoff = F.lit("1997-01-01").cast("timestamp_ntz")
    sketch = lambda df: df.groupBy(month.alias("month")).agg(  # noqa: E731
        F.expr("hll_sketch_agg(o_custkey)").alias("sk")
    )
    history = sketch(orders.filter(F.col("o_orderdate") < cutoff))
    batch = sketch(orders.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        history.unionByName(batch)
        .groupBy("month")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("approx_custs"))
    )
    exact = orders.groupBy(month.alias("month")).agg(
        F.countDistinct("o_custkey").alias("exact_custs")
    )
    err = F.abs(F.col("approx_custs") - F.col("exact_custs")) / F.col("exact_custs")
    return exact.join(merged, "month").select(
        "month", "exact_custs", (err <= 0.05).alias("within_tolerance")
    )


# =====================================================================
# Bitmap-accelerated EXACT distinct (the roaring-bitmap technique of
# Doris/ClickHouse/Databricks, on Spark built-ins): keys map to
# (bucket, bit-position); per (group, bucket) a fixed 4 KB bitmap is
# OR-aggregated, then bitmap_count sums per group. Two cheap hash aggs
# — no count-distinct sort/dedup state, fully mergeable across
# incremental batches — and the result is EXACT, so the oracle is the
# plain COUNT(DISTINCT).
# =====================================================================
@q(
    "q71_bitmap_distinct",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    per_bucket = li.groupBy(
        "l_returnflag",
        F.expr("bitmap_bucket_number(l_suppkey)").alias("bucket"),
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(l_suppkey))").alias("bm"))
    return per_bucket.groupBy("l_returnflag").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_supp")
    )


# =====================================================================
# Regression aggregates (regr_slope / regr_intercept / regr_r2).
# Built-in regr_* accumulate doubles (order-dependent), so the
# hash-compared values are closed forms over EXACT decimal moments
# (q64's rule: n, Σx, Σy, Σxy, Σx², Σy² — decimal sums are exact in
# any order); the built-ins are exercised in-plan and pinned to the
# exact-moment values by 1e-6 consistency flags.
# =====================================================================
@q(
    "q72_regression",
    """
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
               AS intercept,
           ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2,
           TRUE AS regr_consistent
    FROM m
    """,
)
def q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    x, y = dec("l_quantity"), dec("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        d(F.sum(x)).alias("sx"),
        d(F.sum(y)).alias("sy"),
        d(F.sum(x * y)).alias("sxy"),
        d(F.sum(x * x)).alias("sxx"),
        d(F.sum(y * y)).alias("syy"),
        F.regr_slope(F.col("l_extendedprice"), F.col("l_quantity")).alias("b_slope"),
        F.regr_intercept(F.col("l_extendedprice"), F.col("l_quantity")).alias(
            "b_icpt"
        ),
        F.regr_r2(F.col("l_extendedprice"), F.col("l_quantity")).alias("b_r2"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    icpt = (sy - slope * sx) / n
    r2 = ((n * sxy - sx * sy) * (n * sxy - sx * sy)) / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    consistent = (
        (F.abs(F.col("b_slope") - slope) < 1e-6)
        & (F.abs(F.col("b_icpt") - icpt) < 1e-6)
        & (F.abs(F.col("b_r2") - r2) < 1e-6)
    )
    return m.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(icpt, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
        consistent.alias("regr_consistent"),
    )


# =====================================================================
# posexplode — ordinal-preserving lateral explode (token position
# features for sequence models). Map-side expansion, no shuffle at
# all; DuckDB replays ordinals via a two-arg list_transform lambda
# (WITH ORDINALITY is unsupported there).
# =====================================================================
@q(
    "q73_posexplode",
    r"""
    SELECT doc_id, CAST(e.pos AS INT) AS pos, e.tok
    FROM (
      SELECT doc_id,
             unnest(list_transform(string_split_regex(trim(text), '\s+'),
                                   (x, i) -> {'pos': i - 1, 'tok': x})) AS e
      FROM documents
      WHERE strlen(trim(text)) > 0
    )
    """,
)
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return (
        docs.filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "tok"),
        )
        .withColumn("pos", F.col("pos").cast("int"))
    )


# =====================================================================
# GROUPING SETS — the general form behind q39's ROLLUP and q55's CUBE:
# explicitly chosen grouping combinations, one pass, grouping() flags
# disambiguating the all-rows NULL from a real NULL.
# =====================================================================
@q(
    "q74_grouping_sets",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT)
               AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__q74_orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT)
                   AS gid,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM __q74_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# =====================================================================
# Null-safety scalar family: try_divide / try_cast (Spark runs ANSI
# mode — plain ÷0 or bad casts THROW; the try_* forms return NULL,
# which is what a 100 TB pipeline wants instead of a 3 a.m. job
# abort), ifnull / nvl2 / nullif, null-safe equality (<=>, DuckDB
# IS NOT DISTINCT FROM). NULLs are PLANTED (every 7th key) so every
# branch actually fires.
# =====================================================================
@q(
    "q75_null_safety",
    """
    WITH c AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_name END AS name_opt,
             c_acctbal, c_mktsegment
      FROM customer
    )
    SELECT c_custkey,
           CASE WHEN (c_custkey % 5) = 0 THEN NULL
                ELSE c_acctbal / (c_custkey % 5) END AS safe_div,
           TRY_CAST(name_opt AS INTEGER) AS name_as_int,
           ifnull(name_opt, 'missing') AS name_or_default,
           CASE WHEN name_opt IS NOT NULL THEN 'has' ELSE 'none' END AS name_flag,
           nullif(c_mktsegment, 'BUILDING') AS seg_not_building,
           (name_opt IS NOT DISTINCT FROM NULL) AS name_null_safe_eq
    FROM c
    """,
)
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    name_opt = F.when(F.col("c_custkey") % 7 == 0, F.lit(None)).otherwise(
        F.col("c_name")
    )
    return cust.select(
        "c_custkey",
        F.try_divide(F.col("c_acctbal"), F.col("c_custkey") % 5).alias("safe_div"),
        name_opt.try_cast("int").alias("name_as_int"),
        F.ifnull(name_opt, F.lit("missing")).alias("name_or_default"),
        F.nvl2(name_opt, F.lit("has"), F.lit("none")).alias("name_flag"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_not_building"),
        name_opt.eqNullSafe(F.lit(None).cast("string")).alias("name_null_safe_eq"),
    )


# =====================================================================
# Map-type functions: build a map from columns, explode it to rows
# (map_keys/map_values are the non-exploding forms). The driver's
# canonicalizer can't hash map cells, so the query emits exploded
# (key, value) rows; the oracle is the portable UNION ALL spelling.
# =====================================================================
@q(
    "q76_map_functions",
    """
    SELECT p_partkey, 'brand' AS attr, p_brand AS val FROM part
    UNION ALL
    SELECT p_partkey, 'name', p_name FROM part
    UNION ALL
    SELECT p_partkey, 'type', p_type FROM part
    """,
)
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"),
        F.lit("name"), F.col("p_name"),
        F.lit("type"), F.col("p_type"),
    )
    return part.select("p_partkey", F.explode(m).alias("attr", "val"))


# =====================================================================
# Equi-depth (quantile) binning — the stats/optimizer histogram dual
# of q63's equal-width bins: exact global quartiles (one aggregate),
# broadcast back as a 1-row cross join, pure CASE bucketing. At scale
# the quantile pass would use q49's GK sketch; the exact path keeps
# the driver gate bit-deterministic (q46 proved percentile ≡
# quantile_cont, rounded). Boundary comparison uses the ROUNDED
# quantiles on both sides so the bucket edges are engine-identical.
# =====================================================================
@q(
    "q77_equidepth_bins",
    """
    WITH q AS (
      SELECT ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25), 4) AS q1,
             ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.50), 4) AS q2,
             ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75), 4) AS q3
      FROM lineitem
    ),
    b AS (
      SELECT CASE WHEN l_extendedprice < q.q1 THEN 0
                  WHEN l_extendedprice < q.q2 THEN 1
                  WHEN l_extendedprice < q.q3 THEN 2
                  ELSE 3 END AS bucket,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS price
      FROM lineitem CROSS JOIN q
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(price) AS DOUBLE) AS total
    FROM b GROUP BY bucket
    """,
)
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    qs = li.agg(
        F.round(F.percentile(price, F.lit(0.25)), 4).alias("q1"),
        F.round(F.percentile(price, F.lit(0.50)), 4).alias("q2"),
        F.round(F.percentile(price, F.lit(0.75)), 4).alias("q3"),
    )
    bucket = (
        F.when(F.col("l_extendedprice") < F.col("q1"), 0)
        .when(F.col("l_extendedprice") < F.col("q2"), 1)
        .when(F.col("l_extendedprice") < F.col("q3"), 2)
        .otherwise(3)
    )
    return (
        li.crossJoin(F.broadcast(qs))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            d(F.sum(dec("l_extendedprice"))).alias("total"),
        )
    )


# =====================================================================
# Quality-weighted importance sampling: acceptance probability IS the
# document's quality score (keys with better quality are kept more
# often), driven by the same md5 uniform variate as q41/q51 — per-row
# filter, no shuffle, key-stable across engines/reruns, exactly
# replayable in SQL. The training-data pattern for up-weighting clean
# text without a separate weighting pass.
# =====================================================================
def _q78_oracle() -> str:
    from dbt_incremental_ci_spark.operators.sampling import hash_uniform_sql

    u = hash_uniform_sql("doc_id", "wsamp")
    return rf"""
    WITH tok AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks,
             length(text) AS nc,
             length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS np
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang,
             ROUND(0.5 * least(CAST(len(toks) AS DOUBLE) / 64.0, 1.0)
                   + 0.5 * (CASE WHEN len(toks) > 0
                                 THEN CAST(len(list_distinct(toks)) AS DOUBLE)
                                      / len(toks) ELSE 0 END)
                   - least(CASE WHEN nc > 0
                                THEN CAST(np AS DOUBLE) / nc ELSE 0 END,
                           0.5), 6) AS quality
      FROM tok
    )
    SELECT doc_id, lang, quality, ROUND({u}, 6) AS u_accept
    FROM scored WHERE {u} < quality
    """


@q("q78_weighted_sample", _q78_oracle())
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import sampling

    docs = t(spark, sf_dir, "documents")
    u = sampling.hash_uniform("doc_id", "wsamp")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.round(text.quality_score("text"), 6).alias("quality"),
            F.round(u, 6).alias("u_accept"),
            u.alias("__u"),
        )
        .filter(F.col("__u") < F.col("quality"))
        .drop("__u")
    )


# =====================================================================
# Sequential funnel (view → click → purchase, order-constrained): each
# stage's earliest qualifying timestamp must follow the previous
# stage's. Three filtered aggregates chained by broadcast-joinable
# per-user minima — shuffle keys are all user_id, so AQE coalesces the
# chain onto one exchange footprint; all arithmetic on exact nanos.
# =====================================================================
@q(
    "q79_funnel",
    """
    WITH v AS (
      SELECT user_id, MIN(epoch_ns(ts)) AS tv FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(epoch_ns(e.ts)) AS tc
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND epoch_ns(e.ts) > v.tv
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(epoch_ns(e.ts)) AS tp
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > c.tc
      GROUP BY e.user_id
    )
    SELECT 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
    UNION ALL
    SELECT 'click_after_view', CAST(COUNT(*) AS BIGINT) FROM c
    UNION ALL
    SELECT 'purchase_after_click', CAST(COUNT(*) AS BIGINT) FROM p
    """,
)
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir).select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    count_stage = lambda df, name: df.agg(  # noqa: E731
        F.lit(name).alias("stage"), F.count(F.lit(1)).alias("n_users")
    ).select("stage", "n_users")
    return (
        count_stage(v, "view")
        .unionByName(count_stage(c, "click_after_view"))
        .unionByName(count_stage(p, "purchase_after_click"))
    )


# =====================================================================
# Cohort retention: users bucketed by first-seen week; cells count the
# distinct users active at each week offset. Two hash aggs (per-user
# first week; per-cell distinct) — the standard retention-matrix plan;
# weeks are exact integer arithmetic on the nano timeline.
# =====================================================================
@q(
    "q80_cohort_retention",
    """
    WITH wk AS (
      SELECT user_id,
             epoch_ns(ts) // 604800000000000 AS week
      FROM events
    ),
    first_seen AS (
      SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY user_id
    )
    SELECT CAST(f.cohort_week AS BIGINT) AS cohort_week,
           CAST(w.week - f.cohort_week AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_users
    FROM wk w JOIN first_seen f ON w.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    wk = ev.select("user_id", F.expr("ts DIV 604800000000000").alias("week"))
    first_seen = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        wk.join(first_seen, "user_id")
        .groupBy(
            F.col("cohort_week").cast("bigint").alias("cohort_week"),
            (F.col("week") - F.col("cohort_week")).cast("bigint").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# =====================================================================
# argmax/argmin aggregates (max_by / min_by ↔ DuckDB arg_max/arg_min):
# which-row-wins aggregation without a window+filter detour — one hash
# agg instead of a shuffle+sort. max_by is nondeterministic on value
# ties, so the ordering value is a composed UNIQUE integer
# (price-cents ⊕ orderkey) — the same rule as ranked-float tiebreaks.
# The composition is 128-bit (Spark decimal(38,0) / DuckDB HUGEINT)
# with a 10^12 orderkey slot: TPC-H orderkeys stay < 10^12 up to
# ~sf150,000 (>100 TB), so the key never collides across prices at the
# workload's target scale (a 64-bit slot of 10^8 broke at sf>=17).
# =====================================================================
@q(
    "q81_argmax",
    """
    SELECT o_custkey,
           arg_max(o_orderkey,
                   CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                        AS HUGEINT) * 1000000000000 + o_orderkey) AS best_order,
           arg_min(o_orderkey,
                   CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                        AS HUGEINT) * 1000000000000 + o_orderkey) AS worst_order,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS best_price
    FROM orders GROUP BY o_custkey
    """,
)
def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    # double→bigint casts TRUNCATE in Spark but ROUND in DuckDB; the
    # decimal(18,2) hop is exact in both (the workload-wide dec() rule).
    # decimal(20,0) * 13-digit literal -> decimal(34,0): exact 128-bit
    # integer arithmetic matching DuckDB's HUGEINT composition.
    rank_key = (
        (dec("o_totalprice") * 100).cast("bigint").cast("decimal(20,0)")
        * F.lit(1000000000000).cast("decimal(13,0)")
        + F.col("o_orderkey").cast("decimal(20,0)")
    )
    return orders.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", rank_key).alias("best_order"),
        F.min_by("o_orderkey", rank_key).alias("worst_order"),
        d(F.max(dec("o_totalprice"))).alias("best_price"),
    )


# =====================================================================
# Boolean / conditional aggregate family: count_if, bool_and/bool_or
# (every/any), conditional sums — the compact form of CASE-wrapped
# aggregation (reference A4's pattern, first-class functions here).
# =====================================================================
@q(
    "q82_bool_aggs",
    """
    SELECT l_returnflag,
           CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_discounted,
           bool_and(l_quantity > 0) AS all_positive_qty,
           bool_or(l_tax > 0.07) AS any_high_tax,
           CAST(SUM(CASE WHEN l_discount > 0.05
                         THEN CAST(l_extendedprice AS DECIMAL(18,2)) END)
                AS DOUBLE) AS discounted_revenue
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc = F.col("l_discount") > 0.05
    return li.groupBy("l_returnflag").agg(
        F.count_if(disc).alias("n_discounted"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
        d(F.sum(F.when(disc, dec("l_extendedprice")))).alias("discounted_revenue"),
    )


# =====================================================================
# Context-window chunking (operators/chunking.py): fixed-size char
# chunks via sequence → substr → posexplode — map-side row expansion,
# zero shuffle, codegen'd; the UDTF twin is unit-tested equivalent
# (the slow-path template for logic that truly needs Python). md5 of
# each chunk keeps the compared payload small while pinning content.
# =====================================================================
@q(
    "q83_text_chunking",
    """
    SELECT doc_id,
           CAST(e.idx - 1 AS INT) AS chunk_idx,
           md5(e.chunk) AS chunk_md5,
           CAST(strlen(e.chunk) AS INT) AS chunk_len,
           CAST(CEIL(strlen(text) / 200.0) AS INT) AS n_chunks
    FROM (
      SELECT doc_id, text,
             unnest(list_transform(
               generate_series(1, CAST(CEIL(strlen(text) / 200.0) AS INT)),
               i -> {'idx': i, 'chunk': substr(text, (i - 1) * 200 + 1, 200)}
             )) AS e
      FROM documents WHERE strlen(text) > 0
    )
    """,
)
def q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import chunking

    docs = t(spark, sf_dir, "documents")
    out = chunking.chunk_text(docs, "doc_id", "text", size=200)
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.md5("chunk").alias("chunk_md5"),
        F.length("chunk").cast("int").alias("chunk_len"),
        "n_chunks",
    )


# =====================================================================
# Hash / encoding function family: md5, sha2-256, base64, hex — the
# content-addressing primitives the dedup/sampling operators build on,
# exposed as first-class scalars. hex case differs across engines →
# lower() on both sides.
# =====================================================================
@q(
    "q84_hash_functions",
    """
    SELECT p_partkey,
           md5(p_name) AS name_md5,
           sha256(p_name) AS name_sha256,
           to_base64(p_name::BLOB) AS name_b64,
           lower(hex(p_name::BLOB)) AS name_hex
    FROM part
    """,
)
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.md5("p_name").alias("name_md5"),
        F.sha2(F.col("p_name").cast("binary"), 256).alias("name_sha256"),
        F.base64(F.col("p_name").cast("binary")).alias("name_b64"),
        F.lower(F.hex("p_name")).alias("name_hex"),
    )


# =====================================================================
# Numeric scalar family: pow/sqrt/exp/ln/log10, abs/sign, mod/pmod,
# floor/ceil at scale. Transcendentals can differ in the last ulp
# across libm implementations → round(…, 6) (the q29 cosine rule);
# integer mod/sign/floor are exact. pmod has no DuckDB twin →
# ((x % m) + m) % m spelling.
# =====================================================================
@q(
    "q85_numeric_functions",
    """
    SELECT p_partkey,
           ROUND(pow(p_size, 1.5), 6) AS size_pow,
           ROUND(sqrt(p_retailprice), 6) AS price_sqrt,
           ROUND(exp(p_size / 25.0), 6) AS size_exp,
           ROUND(ln(p_retailprice), 6) AS price_ln,
           ROUND(log10(p_retailprice), 6) AS price_log10,
           CAST(abs(p_size - 25) AS BIGINT) AS size_dev,
           CAST(sign(p_size - 25) AS INT) AS size_sign,
           CAST(p_partkey % 7 AS BIGINT) AS key_mod,
           CAST((((p_partkey - 40) % 7) + 7) % 7 AS BIGINT) AS key_pmod,
           CAST(FLOOR(p_retailprice / 100) AS BIGINT) AS price_hundreds,
           CAST(CEIL(p_retailprice / 100) AS BIGINT) AS price_hundreds_up
    FROM part
    """,
)
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    return part.select(
        "p_partkey",
        F.round(F.pow("p_size", F.lit(1.5)), 6).alias("size_pow"),
        F.round(F.sqrt(price), 6).alias("price_sqrt"),
        F.round(F.exp(F.col("p_size") / 25.0), 6).alias("size_exp"),
        F.round(F.log(price), 6).alias("price_ln"),
        F.round(F.log10(price), 6).alias("price_log10"),
        F.abs(F.col("p_size") - 25).cast("bigint").alias("size_dev"),
        F.signum(F.col("p_size") - 25).cast("int").alias("size_sign"),
        (F.col("p_partkey") % 7).cast("bigint").alias("key_mod"),
        F.pmod(F.col("p_partkey") - 40, F.lit(7)).cast("bigint").alias("key_pmod"),
        F.floor(price / 100).cast("bigint").alias("price_hundreds"),
        F.ceil(price / 100).cast("bigint").alias("price_hundreds_up"),
    )


# =====================================================================
# Five-table star join (TPC-H Q5 shape): region→nation→customer dims
# chained onto orders⋈lineitem facts. Every dimension side is
# broadcast-hinted so the fact tables shuffle at most once (on the
# orders⋈lineitem key) — the §2(SCALE) star-schema discipline in one
# query; supplier-nation consistency predicate keeps the local-supply
# semantics of the original.
# =====================================================================
@q(
    "q86_star_join",
    """
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = t(spark, sf_dir, "lineitem")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_nationkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), o.o_custkey == dims.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == F.col("c_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            d(
                F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# =====================================================================
# Value-based RANGE window frames (q59 covered ROWS): trailing-30-day
# revenue per day — the frame is defined by the ORDER-BY VALUE (days),
# so gaps in the calendar shrink the window, which ROWS frames get
# wrong. Runs on the post-aggregation daily table (q59's
# aggregate-then-window shape); decimal window sums keep it exact.
# =====================================================================
@q(
    "q87_range_frames",
    """
    WITH daily AS (
      SELECT CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                  AS BIGINT) AS day_no,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    )
    SELECT day_no,
           CAST(SUM(rev) OVER (ORDER BY day_no
                 RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS rev_30d,
           CAST(COUNT(*) OVER (ORDER BY day_no
                 RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS days_present_30d
    FROM daily
    """,
)
def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        )
        .cast("bigint")
        .alias("day_no")
    ).agg(F.sum(dec("o_totalprice")).alias("rev"))
    w = Window.orderBy("day_no").rangeBetween(-29, Window.currentRow)
    return daily.select(
        "day_no",
        d(F.sum("rev").over(w)).alias("rev_30d"),
        F.count(F.lit(1)).over(w).alias("days_present_30d"),
    )


# =====================================================================
# Bigram frequency table (sequence features — the n>1 companion to
# q57's unigram counts): adjacent-token pairs built by indexing the
# token array (sequence → element_at ‖ element_at), exploded map-side,
# one count agg + per-lang top-k. Docs need ≥2 tokens — guarded on
# BOTH sides (Spark's sequence(1,0) would count DOWN, not come back
# empty).
# =====================================================================
@q(
    "q88_bigram_counts",
    r"""
    WITH toks AS (
      SELECT lang,
             list_transform(
               list_filter(string_split_regex(lower(trim(text)), '\s+'),
                           x -> x <> ''), x -> x) AS l
      FROM documents WHERE strlen(trim(text)) > 0
    ),
    bigrams AS (
      SELECT lang, b
      FROM (
        SELECT lang,
               unnest(list_transform(generate_series(1, len(l) - 1),
                                     i -> l[i] || ' ' || l[i + 1])) AS b
        FROM toks WHERE len(l) >= 2
      )
    ),
    counts AS (
      SELECT lang, b AS bigram, CAST(COUNT(*) AS BIGINT) AS n
      FROM bigrams GROUP BY lang, b
    )
    SELECT lang, bigram, n, CAST(rnk AS INT) AS rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY n DESC, bigram) AS rnk
      FROM counts
    ) WHERE rnk <= 5
    """,
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.trim("text")), r"\s+"), lambda x: x != "")
    base = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select("lang", toks.alias("l"))
        .filter(F.size("l") >= 2)
    )
    bigram = F.transform(
        F.sequence(F.lit(1), F.size("l") - 1),
        lambda i: F.concat(
            F.element_at("l", i), F.lit(" "), F.element_at("l", i + 1)
        ),
    )
    counts = (
        base.select("lang", F.explode(bigram).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .withColumn("rnk", F.col("rnk").cast("int"))
    )


# =====================================================================
# Regex scalar family: extract (group), extract-all count, boolean
# match, global replace — patterns kept in the Java∩RE2∩DuckDB common
# dialect (the q44 PII rule).
# =====================================================================
@q(
    "q89_regex_functions",
    """
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS cust_num,
           CAST(len(regexp_extract_all(c_name, '[0-9]')) AS INT) AS n_digits,
           regexp_matches(c_name, '^Customer') AS is_customer,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked
    FROM customer
    """,
)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("cust_num"),
        F.size(F.regexp_extract_all("c_name", F.lit(r"([0-9])"), 1))
        .cast("int")
        .alias("n_digits"),
        F.col("c_name").rlike("^Customer").alias("is_customer"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("masked"),
    )


# =====================================================================
# Date formatting: Spark's SimpleDateFormat-style patterns vs DuckDB
# strftime — different pattern languages, same rendered strings (the
# oracle is the semantic twin, not a token-for-token copy). Day names
# use each engine's default English locale.
# =====================================================================
@q(
    "q90_date_format",
    """
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS year_month,
           strftime(CAST(o_orderdate AS DATE), '%d') AS day_padded,
           dayname(CAST(o_orderdate AS DATE)) AS day_name,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS iso_day
    FROM orders
    """,
)
def q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    day = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.date_format(day, "yyyy-MM").alias("year_month"),
        F.date_format(day, "dd").alias("day_padded"),
        F.date_format(day, "EEEE").alias("day_name"),
        F.date_format(day, "yyyy-MM-dd").alias("iso_day"),
    )


# =====================================================================
# JSON function family (q31 parses with regex; this is the real JSON
# surface): path extraction as string, schema'd from_json with typed
# field access, missing-path → NULL, and to_json re-serialization
# (int/string fields only — float rendering differs across engines).
# =====================================================================
@q(
    "q91_json_functions",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
           json_extract_string(props, '$.missing') AS missing_field,
           to_json(struct_pack(et := event_type,
                               k := CAST(json_extract_string(props, '$.k')
                                         AS INTEGER))) AS rebuilt
    FROM events
    """,
)
def q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    k_int = F.from_json("props", "k INT").getField("k")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        k_int.alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
        F.to_json(
            F.struct(F.col("event_type").alias("et"), k_int.alias("k"))
        ).alias("rebuilt"),
    )


def _q92_oracle(bits: int = 16) -> str:
    """DuckDB replica of sinks.layout.zorder_key: the same min-max
    scaling and bit interleave, loop-unrolled into SQL (the q34
    inline-the-constants technique applied to bit arithmetic)."""
    bounds = {"p_size": (1.0, 50.0), "p_retailprice": (900.0, 2100.0)}
    scaled = []
    top = (1 << bits) - 1
    for c, (lo, hi) in bounds.items():
        span = hi - lo
        scaled.append(
            f"LEAST(GREATEST(CAST(FLOOR((CAST({c} AS DOUBLE) - {lo!r})"
            f" / {span!r} * {top}) AS BIGINT), 0), {top})"
        )
    terms = []
    for i in range(bits):
        for j, s in enumerate(scaled):
            terms.append(f"((({s} >> {i}) & 1) << {i * len(scaled) + j})")
    return f"""
    SELECT p_partkey, CAST({' | '.join(terms)} AS BIGINT) AS zkey
    FROM part
    """


# =====================================================================
# Z-order key as a value-oracled query (upgrades sinks/layout.py's
# Morton curve from unit-tested to oracle-verified): fixed caller
# bounds, 16 bits/dim, bit-for-bit interleave replicated in DuckDB.
# =====================================================================
@q("q92_zorder_key", _q92_oracle())
def q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.sinks.layout import zorder_key

    part = t(spark, sf_dir, "part")
    key = zorder_key(
        part,
        ["p_size", "p_retailprice"],
        bounds={"p_size": (1.0, 50.0), "p_retailprice": (900.0, 2100.0)},
    )
    return part.select("p_partkey", key.alias("zkey"))


# =====================================================================
# Multimodal frame sampling (operators/multimodal.sample_frames — the
# 1→N mapInPandas fan-out): every 64-byte chunk of the video payload
# becomes a "frame" with a sha256[:16] digest. Oracle chunks the text
# as VARCHAR — valid because the corpus is verified pure-ASCII (char
# positions ≡ byte offsets, UTF-8 of ASCII ≡ the raw bytes); the
# operator itself is byte-based.
# =====================================================================
@q(
    "q93_frame_sampling",
    """
    SELECT doc_id AS media_id,
           CAST(e.i - 1 AS INT) AS frame_idx,
           substr(sha256(substr(text, (e.i - 1) * 64 + 1, 64)), 1, 16)
               AS frame_digest
    FROM (
      SELECT doc_id, text,
             unnest(generate_series(1,
                    CAST(CEIL(strlen(text) / 64.0) AS INT))) AS i
      FROM documents
      WHERE doc_id % 3 = 2 AND strlen(text) > 0
    ) AS e(doc_id, text, i)
    """,
)
def q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import multimodal as mm

    docs = t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
    )
    return mm.sample_frames(media, every_n_bytes=64)


# =====================================================================
# Keyset-free pagination: ORDER BY … LIMIT … OFFSET on a unique total
# order (the offset surface added in Spark 3.4). A global sort + skip
# is the WRONG primitive at 100 TB (each page re-sorts; keyset
# pagination on the ordered key is the scale path — documented here,
# exercised as the API surface).
# =====================================================================
@q(
    "q94_pagination",
    """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 100
    """,
)
def q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", F.col("o_totalprice").cast("double").alias("price"))
        .orderBy("o_orderkey")
        .offset(100)
        .limit(20)
    )


# =====================================================================
# explode_outer — NULL-preserving lateral explode (rows with empty
# token arrays survive with NULL, the LEFT JOIN LATERAL twin). The
# corpus has no token-less docs, so one is PLANTED (doc_id −1, empty
# text — the q44/q36 planted-fixture rule) so the NULL branch is
# actually exercised and compared.
# =====================================================================
@q(
    "q95_explode_outer",
    r"""
    SELECT d.doc_id, u.tok
    FROM (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x <> '') AS toks
      FROM (SELECT doc_id, text FROM documents
            UNION ALL SELECT -1, '')
    ) d
    LEFT JOIN LATERAL unnest(d.toks) AS u(tok) ON TRUE
    """,
)
def q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.unionByName(
        docs.sparkSession.createDataFrame([(-1, "")], "doc_id long, text string")
    )
    toks = F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != "")
    return planted.select("doc_id", F.explode_outer(toks).alias("tok"))


@q("q67_array_functions", _Q67_SQL)
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    el = lambda i: F.element_at("embedding", i).cast("double")  # noqa: E731
    head = el(1) + el(2) + el(3) + el(4) + el(5) + el(6) + el(7) + el(8)
    return emb.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("vmax"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("vmin"),
        F.array_position("embedding", F.array_max("embedding"))
        .cast("int")
        .alias("pos_max"),
        F.round(head, 6).alias("head_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("int").alias("n_pos"),
    )


# =====================================================================
# Keyset pagination — the seek-predicate operator q94 documents as the
# scale path, now callable (operators/pagination.py). The query pages
# orders sequentially by the unique o_orderkey (pages 0-7, size 20,
# cursor = last key of the previous page — the real protocol, no
# offsets anywhere) and returns pages 5-7; the oracle computes the
# same rows 101-160 positionally. Keyset page N ≡ OFFSET page N on a
# unique total order — verified for three consecutive pages.
# =====================================================================
@q(
    "q96_keyset_pagination",
    """
    SELECT o_orderkey, price,
           5 + CAST(FLOOR((rn - 101) / 20.0) AS INT) AS page_idx
    FROM (
      SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price,
             row_number() OVER (ORDER BY o_orderkey) AS rn
      FROM orders
    )
    WHERE rn > 100 AND rn <= 160
    """,
)
def q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.pagination import keyset_page

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
    )
    pages: list[DataFrame] = []
    cursor = None
    for page_idx in range(8):
        page = keyset_page(orders, ["o_orderkey"], 20, cursor)
        if page_idx >= 5:
            pages.append(page.withColumn("page_idx", F.lit(page_idx)))
        # cursor advance: last key of the page — an O(page) scalar read,
        # same class as the incremental watermark, not a data collect
        # driver-bound: page_size rows — keyset cursor demo page
        rows = page.select("o_orderkey").collect()
        cursor = [rows[-1]["o_orderkey"]]
    out = pages[0]
    for p in pages[1:]:
        out = out.unionByName(p)
    return out


# =====================================================================
# Benchmark decontamination: the n-gram-overlap hygiene step every
# pre-training corpus runs against its eval suites. Eval set = every
# 41st document under a FIXED id bound (a benchmark suite does not
# grow with the training corpus — the unbounded slice made eval-side
# work scale with the data and measured 11.0x on the 10x sf1 gate;
# at sf0.01 every doc_id is under the bound, so the oracle value is
# unchanged), held OUT of the corpus; contamination is planted the
# q36-twin way — each eval doc re-enters the corpus under id+2000000
# with a prefix, so its interior 5-grams still overlap. A doc is
# flagged when it shares >= 3 distinct word 5-grams with ANY eval doc.
# Value-exact oracle: same shingling, same plant, joined on the n-gram
# string (Spark joins on xxhash64 of the same string — equal up to
# 2^-64 collisions).
# =====================================================================
@q(
    "q97_decontamination",
    """
    WITH evals AS (SELECT doc_id, text FROM documents
                   WHERE doc_id % 41 = 0 AND doc_id < 10000),
    corp AS (
      SELECT doc_id, text FROM documents
      WHERE NOT (doc_id % 41 = 0 AND doc_id < 10000)
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id,
             'copied from benchmark : ' || text AS text
      FROM evals
    ),
    cng AS (
      SELECT DISTINCT doc_id, ng FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, greatest(0, len(toks) - 4)),
                 i -> array_to_string(toks[i:i+4], ' '))) AS ng
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(trim(text), '\\s+'),
                                 x -> x <> '') AS toks
              FROM corp))
    ),
    eng AS (
      SELECT DISTINCT ng FROM (
        SELECT unnest(list_transform(
                 generate_series(1, greatest(0, len(toks) - 4)),
                 i -> array_to_string(toks[i:i+4], ' '))) AS ng
        FROM (SELECT list_filter(string_split_regex(trim(text), '\\s+'),
                                 x -> x <> '') AS toks
              FROM evals))
    )
    SELECT doc_id, count(*) AS overlap_ngrams
    FROM cng JOIN eng USING (ng)
    GROUP BY doc_id
    HAVING count(*) >= 3
    """,
)
def q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import decontam

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    is_eval = (F.col("doc_id") % 41 == 0) & (F.col("doc_id") < 10000)
    evals = docs.filter(is_eval)
    corpus = docs.filter(~is_eval).unionByName(
        evals.select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat(F.lit("copied from benchmark : "), F.col("text")).alias(
                "text"
            ),
        )
    )
    return decontam.contaminated(
        corpus, evals, id_col="doc_id", text_col="text", n=5, min_overlap=3
    )


# =====================================================================
# Gopher-style repetition/quality filter suite: published pre-training
# heuristics (doc length, duplicate-word fraction, top-bigram
# repetition, mean word length, alphabetic-word fraction,
# symbol-to-word ratio) as pure per-row expressions — a map-only pass
# fused into the scan at any scale. Full value oracle: every metric
# and the combined keep flag replicated in DuckDB list functions.
# Count-fraction (not char-fraction) for the top-bigram rule keeps the
# metric tie-free and deterministic.
# =====================================================================
@q(
    "q98_gopher_quality",
    """
    WITH tk AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS toks,
             text
      FROM documents
    ),
    m AS (
      SELECT doc_id,
        len(toks) AS n_tokens,
        ROUND(CASE WHEN len(toks) > 0
              THEN 1.0 - len(list_distinct(toks))::DOUBLE / len(toks)
              ELSE 0.0 END, 6) AS dup_word_frac,
        ROUND(CASE WHEN len(toks) >= 2 THEN (
          SELECT list_max(list_transform(list_distinct(bgs),
                          x -> len(list_filter(bgs, y -> y = x))))::DOUBLE
                 / len(bgs)
          FROM (SELECT list_transform(generate_series(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1]) AS bgs)
        ) ELSE 0.0 END, 6) AS top_bigram_frac,
        ROUND(CASE WHEN len(toks) > 0
              THEN list_sum(list_transform(toks, t -> len(t)))::DOUBLE
                   / len(toks)
              ELSE 0.0 END, 6) AS mean_word_len,
        ROUND(CASE WHEN len(toks) > 0
              THEN len(list_filter(toks,
                       t -> regexp_matches(t, '[A-Za-z]')))::DOUBLE
                   / len(toks)
              ELSE 0.0 END, 6) AS alpha_word_frac,
        ROUND(CASE WHEN len(toks) > 0
              THEN len(regexp_replace(text, '[^#.]', '', 'g'))::DOUBLE
                   / len(toks)
              ELSE 0.0 END, 6) AS symbol_to_word
      FROM tk
    )
    SELECT *,
           (n_tokens >= 20 AND dup_word_frac <= 0.6
            AND top_bigram_frac <= 0.08
            AND mean_word_len BETWEEN 3.0 AND 10.0
            AND alpha_word_frac >= 0.8
            AND symbol_to_word <= 0.1) AS gopher_keep
    FROM m
    """,
)
def q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return text.gopher_quality(docs).drop("text")


# =====================================================================
# Product-quantization ADC top-k (Jégou et al.; FAISS PQ scan shape):
# the corpus compresses map-side to m=8 codes (ks=8 codewords per
# subspace — the scan side carries 8 ints instead of 64 doubles),
# queries precompute per-subspace lookup tables, and scoring is m
# table lookups per corpus code — no per-pair dot products. Codebooks
# are the deterministic hash-derived defaults so the full pipeline
# (encode, LUT, ADC sum, rank) replays value-exactly in DuckDB with
# inlined codeword literals; train_pq_codebooks() is the fitted path
# (recall-tested in units, same contract as trained IVF).
# =====================================================================
def _q99_oracle(dim: int = 64, m: int = 8, ks: int = 8) -> str:
    from dbt_incremental_ci_spark.operators.similarity import pq_codebooks

    cbs = pq_codebooks(dim, m, ks)
    sub = dim // m

    def arr(vec: list[float]) -> str:
        return "[" + ",".join(repr(x) for x in vec) + "]"

    def dists(j: int, src: str) -> str:
        terms = ", ".join(
            f"ROUND(list_sum(list_transform(generate_series(1, {sub}), "
            f"i -> ({src}[{j * sub}+i] - ({arr(cbs[j][c])})[i])"
            f" * ({src}[{j * sub}+i] - ({arr(cbs[j][c])})[i]))), 9)"
            for c in range(ks)
        )
        return f"[{terms}]"

    code_cols = ", ".join(
        f"list_position({dists(j, 'v')}, list_min({dists(j, 'v')})) AS c{j}"
        for j in range(m)
    )
    lut_cols = ", ".join(f"{dists(j, 'v')} AS l{j}" for j in range(m))
    adc = " + ".join(f"q.l{j}[c.c{j}]" for j in range(m))
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (SELECT vec_id AS neighbor_id, {code_cols} FROM e),
    q AS (SELECT vec_id AS query_id, {lut_cols} FROM e WHERE vec_id < 10),
    scored AS (
      SELECT query_id, neighbor_id, ROUND({adc}, 6) AS approx_dist
      FROM c, q WHERE c.neighbor_id <> q.query_id
    )
    SELECT query_id, neighbor_id, approx_dist, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY approx_dist, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """


@q("q99_pq_adc_topk", _q99_oracle())
def q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.pq_adc_topk(emb, queries, k=5, dim=64, m=8, ks=8)


# =====================================================================
# Target-mixture resampling: rebalance the corpus to a prescribed
# language mix by derived per-category acceptance rates (largest
# corpus achievable by downsampling alone: the binding category keeps
# rate 1.0). Membership is the key-stable md5 variate shared with
# q41/q51 — reproducible across engines, partitionings, and runs. The
# oracle recomputes counts → N* → rates → filter entirely in SQL with
# the same operation order, so the rate doubles (and therefore the
# survivor set) are bit-identical to the Spark side's driver-computed
# literals.
# =====================================================================
_Q100_SHARES = {"en": 0.3, "zh": 0.2, "es": 0.2, "de": 0.15, "fr": 0.15}


def _q100_oracle() -> str:
    from dbt_incremental_ci_spark.operators.sampling import hash_uniform_sql

    shares_rows = ", ".join(f"('{c}', {s})" for c, s in _Q100_SHARES.items())
    u = hash_uniform_sql("d.doc_id", "mix")
    return f"""
    WITH tgt(lang, share) AS (VALUES {shares_rows}),
    cnt AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
    n AS (SELECT min(c / share) AS nmax FROM cnt JOIN tgt USING (lang)
          WHERE share > 0),
    rates AS (
      SELECT t.lang, least(1.0, (t.share * n.nmax) / c.c) AS rate
      FROM tgt t JOIN cnt c USING (lang) CROSS JOIN n
      WHERE t.share > 0
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN rates r USING (lang)
    WHERE {u} < r.rate
    """


@q("q100_mixture_resample", _q100_oracle())
def q100(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return sampling.mixture_resample(
        docs, key_col="doc_id", category_col="lang",
        target_shares=_Q100_SHARES, salt="mix",
    )


# =====================================================================
# Incremental corpus dedup: an incoming batch against the existing
# corpus — the ingestion-time shape of web-corpus dedup. The batch is
# every 17th doc re-entering with a suffix (ids +3000000); the
# operator bands both sides identically and joins batch bands against
# corpus bands (batch side AQE-broadcast, corpus never self-paired).
# Oracle: brute-force exact Jaccard over batch × corpus (q32
# convention) — recall-safe because every true pair in this corpus
# sits at J ≥ 0.844, far above the 0.7 banding midpoint.
# =====================================================================
@q(
    "q101_incremental_dedup",
    r"""
    WITH batch AS (
      SELECT doc_id + 3000000 AS doc_id, text || ' zz9 batch copy' AS text
      FROM documents WHERE doc_id % 17 = 0
    ),
    shc AS (
      SELECT doc_id, CASE WHEN strlen(lower(text)) >= 5 THEN
               list_distinct(list_transform(
                 generate_series(1, strlen(lower(text)) - 4),
                 i -> substr(lower(text), i, 5)))
             ELSE [lower(text)] END AS s
      FROM documents
    ),
    shb AS (
      SELECT doc_id, CASE WHEN strlen(lower(text)) >= 5 THEN
               list_distinct(list_transform(
                 generate_series(1, strlen(lower(text)) - 4),
                 i -> substr(lower(text), i, 5)))
             ELSE [lower(text)] END AS s
      FROM batch
    )
    SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
           CAST(len(list_intersect(b.s, c.s)) AS DOUBLE)
               / len(list_distinct(list_concat(b.s, c.s))) AS jaccard
    FROM shb b, shc c
    WHERE CAST(len(list_intersect(b.s, c.s)) AS DOUBLE)
               / len(list_distinct(list_concat(b.s, c.s))) >= 0.7
    """,
)
def q101(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz9 batch copy")).alias("text"),
    )
    return dedup.cross_corpus_dedup_pairs(
        docs, batch, "doc_id", "text", threshold=0.7
    )


# =====================================================================
# Per-domain frequency capping (C4-style): keep at most K docs per
# source domain, chosen by the key-stable md5 variate so the kept set
# is reproducible and independent of partitioning. One shuffle on the
# domain; no global sort. Oracle: the same windowed rank in SQL over
# the identical variate.
# =====================================================================
@q(
    "q102_domain_cap",
    f"""
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {{u}} ASC, doc_id ASC) AS r
      FROM documents
    ) WHERE r <= 15
    """.replace("{u}", "(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':cap'), 1, 8))::BIGINT / 4294967296.0)"),
)
def q102(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return sampling.per_category_cap(
        docs, key_col="doc_id", category_col="source", cap=15, salt="cap"
    )


# =====================================================================
# Deterministic epoch shuffle: a reproducible, partitioning-
# independent global training order per epoch (rank by the epoch-
# seeded md5 variate). Computed with the packing operator's two-phase
# shape — range partition, local row_numbers, broadcast O(partitions)
# offsets — never a single-task global window. Oracle: plain global
# row_number over the same variate (DuckDB can afford it at sf0.01).
# =====================================================================
@q(
    "q103_epoch_shuffle",
    """
    SELECT doc_id,
           row_number() OVER (ORDER BY
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shuffle:1'), 1, 8))::BIGINT
              / 4294967296.0) ASC, doc_id ASC) AS shuffle_rank
    FROM documents
    """,
)
def q103(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id")
    return sampling.epoch_shuffle_rank(docs, key_col="doc_id", epoch=1)


# =====================================================================
# Perplexity-proxy quality filtering: mean unigram log-probability of
# each doc under the corpus's own unigram LM (the KenLM/CCNet-style
# filter, self-trained). One explode feeds the vocab count, the
# corpus total derives from the vocab (no second pass), and the
# token→vocab join is AQE-broadcast when the vocab fits. The keep
# flag compares the ROUNDED score on both sides so the boolean can
# never disagree with the hashed value column.
# =====================================================================
@q(
    "q104_unigram_ppl_filter",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                x -> x <> '')) AS tk
      FROM documents
    ),
    vocab AS (SELECT tk, count(*) AS c FROM tok GROUP BY tk),
    tot AS (SELECT sum(c) AS n FROM vocab),
    scored AS (
      SELECT doc_id, count(*) AS n_tokens,
             ROUND(avg(ln(c / n)), 6) AS avg_logprob
      FROM tok JOIN vocab USING (tk) CROSS JOIN tot
      GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, avg_logprob,
           avg_logprob >= -3.41 AS ppl_keep
    FROM scored
    """,
)
def q104(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    scored = text.unigram_logprob(docs).withColumn(
        "avg_logprob", F.round("avg_logprob", 6)
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "avg_logprob",
        (F.col("avg_logprob") >= -3.41).alias("ppl_keep"),
    )


# =====================================================================
# ROLLUP hierarchy totals with explicit grouping flags — the OLAP
# subtotal surface (GROUP BY ROLLUP nation → year), exact decimal
# money sums, NULL group labels coalesced to sentinels and
# disambiguated by grouping() so real NULLs can never collide with
# subtotal rows.
# =====================================================================
@q(
    "q105_rollup_revenue",
    """
    WITH j AS (
      SELECT n_name, CAST(year(o_orderdate) AS INT) AS yr,
             CAST(o_totalprice AS DECIMAL(18,2)) AS p
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
    )
    SELECT COALESCE(n_name, '(all)') AS nation,
           COALESCE(yr, -1) AS order_year,
           CAST(GROUPING(n_name) AS INT) AS g_nation,
           CAST(GROUPING(yr) AS INT) AS g_year,
           CAST(SUM(p) AS DOUBLE) AS revenue,
           count(*) AS n_orders
    FROM j
    GROUP BY ROLLUP(n_name, yr)
    """,
)
def q105(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            F.year("o_orderdate").cast("int").alias("yr"),
            dec("o_totalprice").alias("__p"),
        )
    )
    return (
        joined.rollup("n_name", "yr")
        .agg(
            F.sum("__p").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.grouping("yr").cast("int").alias("g_year"),
        )
        .select(
            F.coalesce("n_name", F.lit("(all)")).alias("nation"),
            F.coalesce("yr", F.lit(-1)).alias("order_year"),
            "g_nation",
            "g_year",
            "revenue",
            "n_orders",
        )
    )


# =====================================================================
# End-to-end curation pipeline over the round-3 operator set: Gopher
# quality gate → benchmark decontamination (held-out eval slice) →
# self-trained unigram-LM perplexity filter (vocab from the survivors,
# exactly as the operator chain computes it) → per-source frequency
# cap. Every stage's exact semantics — rounded metric flags, distinct
# 5-gram overlap ≥ 3, rounded score threshold, md5-variate capping —
# replays in one chained DuckDB oracle, so the final kept set and its
# per-doc metrics are value-exact end to end.
# =====================================================================
@q(
    "q106_curation_v2",
    r"""
    WITH evals AS (SELECT doc_id, text FROM documents WHERE doc_id % 41 = 0),
    corpus AS (SELECT doc_id, text, lang, source FROM documents
               WHERE doc_id % 41 <> 0),
    tk AS (
      SELECT doc_id, lang, source, text,
             list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x <> '') AS toks
      FROM corpus
    ),
    m AS (
      SELECT doc_id, lang, source, toks,
        len(toks) AS n_tokens,
        ROUND(CASE WHEN len(toks) > 0
              THEN 1.0 - len(list_distinct(toks))::DOUBLE / len(toks)
              ELSE 0.0 END, 6) AS dup_word_frac,
        ROUND(CASE WHEN len(toks) >= 2 THEN (
          SELECT list_max(list_transform(list_distinct(bgs),
                          x -> len(list_filter(bgs, y -> y = x))))::DOUBLE
                 / len(bgs)
          FROM (SELECT list_transform(generate_series(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1]) AS bgs)
        ) ELSE 0.0 END, 6) AS top_bigram_frac,
        ROUND(CASE WHEN len(toks) > 0
              THEN list_sum(list_transform(toks, t -> len(t)))::DOUBLE
                   / len(toks) ELSE 0.0 END, 6) AS mean_word_len,
        ROUND(CASE WHEN len(toks) > 0
              THEN len(list_filter(toks,
                       t -> regexp_matches(t, '[A-Za-z]')))::DOUBLE
                   / len(toks) ELSE 0.0 END, 6) AS alpha_word_frac,
        ROUND(CASE WHEN len(toks) > 0
              THEN len(regexp_replace(text, '[^#.]', '', 'g'))::DOUBLE
                   / len(toks) ELSE 0.0 END, 6) AS symbol_to_word
      FROM tk
    ),
    g AS (
      SELECT doc_id, lang, source, toks, n_tokens FROM m
      WHERE n_tokens >= 20 AND dup_word_frac <= 0.6
        AND top_bigram_frac <= 0.08 AND mean_word_len BETWEEN 3.0 AND 10.0
        AND alpha_word_frac >= 0.8 AND symbol_to_word <= 0.1
    ),
    gng AS (
      SELECT DISTINCT doc_id, ng FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, greatest(0, len(toks) - 4)),
                 i -> array_to_string(toks[i:i+4], ' '))) AS ng
        FROM g)
    ),
    eng AS (
      SELECT DISTINCT ng FROM (
        SELECT unnest(list_transform(
                 generate_series(1, greatest(0, len(etoks) - 4)),
                 i -> array_to_string(etoks[i:i+4], ' '))) AS ng
        FROM (SELECT list_filter(string_split_regex(trim(text), '\s+'),
                                 x -> x <> '') AS etoks FROM evals))
    ),
    contaminated AS (
      SELECT doc_id FROM gng JOIN eng USING (ng)
      GROUP BY doc_id HAVING count(*) >= 3
    ),
    clean AS (
      SELECT * FROM g
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    tok AS (SELECT doc_id, unnest(toks) AS tkn FROM clean),
    vocab AS (SELECT tkn, count(*) AS c FROM tok GROUP BY tkn),
    tot AS (SELECT sum(c) AS n FROM vocab),
    scored AS (
      SELECT doc_id, ROUND(avg(ln(c / n)), 6) AS avg_logprob
      FROM tok JOIN vocab USING (tkn) CROSS JOIN tot GROUP BY doc_id
    ),
    kept AS (
      SELECT c.doc_id, c.lang, c.source, c.n_tokens, s.avg_logprob
      FROM clean c JOIN scored s USING (doc_id)
      WHERE s.avg_logprob >= -3.42
    )
    SELECT doc_id, lang, source, n_tokens, avg_logprob FROM (
      SELECT *, row_number() OVER (
        PARTITION BY source
        ORDER BY (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':cur'), 1, 8))::BIGINT
                  / 4294967296.0) ASC, doc_id ASC) AS r
      FROM kept
    ) WHERE r <= 10
    """,
)
def q106(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import decontam

    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    evals = docs.filter(F.col("doc_id") % 41 == 0).select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 41 != 0)
    g = text.gopher_quality(corpus).filter("gopher_keep")
    flagged = decontam.contaminated(
        g.select("doc_id", "text"), evals, n=5, min_overlap=3
    )
    clean = g.join(flagged.select("doc_id"), "doc_id", "left_anti")
    scored = (
        text.unigram_logprob(clean.select("doc_id", "text"))
        .withColumn("avg_logprob", F.round("avg_logprob", 6))
        .filter(F.col("avg_logprob") >= -3.42)
        .select("doc_id", "avg_logprob")
    )
    kept = clean.join(scored, "doc_id")
    capped = sampling.per_category_cap(
        kept, key_col="doc_id", category_col="source", cap=10, salt="cur"
    )
    return capped.select("doc_id", "lang", "source", "n_tokens", "avg_logprob")


# =====================================================================
# Corpus-wide repeated n-gram profile (RefinedWeb / Lee et al.
# "Deduplicating Training Data" signal): for every document, the
# fraction of its word trigram positions whose trigram occurs in >= 2
# DISTINCT documents. Spark side explodes positional trigrams keyed by
# xxhash64 (8-byte shuffle keys), counts distinct-document frequency
# with map-side partial agg, and joins the duplicated-hash set back on
# the same key — both shuffles hash-keyed and near-uniform, nothing
# driver-sized. Oracle replays positions/doc-frequency/fraction on the
# raw trigram strings (hash only changes the join key, not the
# result). Full value oracle incl. the rounded fraction and keep flag.
# =====================================================================
@q(
    "q107_repeated_ngrams",
    r"""
    WITH tk AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    pos AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(0, len(toks) - 2)),
               i -> array_to_string(toks[i:i+2], ' '))) AS ng
      FROM tk
    ),
    dfreq AS (
      SELECT ng FROM (SELECT DISTINCT doc_id, ng FROM pos)
      GROUP BY ng HAVING count(*) >= 2
    ),
    per AS (
      SELECT p.doc_id,
             count(*) AS n_ngrams,
             sum(CASE WHEN d.ng IS NOT NULL THEN 1 ELSE 0 END) AS dup_ngrams
      FROM pos p LEFT JOIN dfreq d ON p.ng = d.ng
      GROUP BY p.doc_id
    )
    SELECT t.doc_id,
           CAST(coalesce(per.n_ngrams, 0) AS BIGINT) AS n_ngrams,
           CAST(coalesce(per.dup_ngrams, 0) AS BIGINT) AS dup_ngrams,
           ROUND(CASE WHEN coalesce(per.n_ngrams, 0) > 0
                 THEN per.dup_ngrams::DOUBLE / per.n_ngrams
                 ELSE 0.0 END, 6) AS dup_ngram_frac,
           ROUND(CASE WHEN coalesce(per.n_ngrams, 0) > 0
                 THEN per.dup_ngrams::DOUBLE / per.n_ngrams
                 ELSE 0.0 END, 6) <= 0.6 AS ngram_keep
    FROM tk t LEFT JOIN per USING (doc_id)
    """,
)
def q107(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import ngrams

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return ngrams.flag_repetitive_docs(
        docs, n=3, min_doc_freq=2, max_dup_frac=0.6
    )


# =====================================================================
# fastText-style linear quality classifier: hashed bag-of-words
# buckets (house md5 variate), mean-pooled weights + bias, sigmoid.
# Weights live on a dyadic 2^-20 grid so the pooled sum is EXACT in
# IEEE double — bit-identical across engines regardless of summation
# order; the oracle inlines the same weights as a DuckDB list literal
# (the pq_codebooks pattern) and replays bucket/pool/threshold
# value-exactly. Serving is a map-only expression pass — no shuffle,
# no UDF, any scale; training (train_quality_classifier) is bounded-
# sample driver-side logistic regression, unit-tested separately.
# =====================================================================
def _q108_oracle() -> str:
    from dbt_incremental_ci_spark.operators import classifier

    w = classifier.default_weights(64, "qc")
    score = classifier.linear_score_sql("text", w, 0.0, "qc")
    return f"""
    WITH s AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> x <> '')) AS n_tokens,
             ROUND({score}, 6) AS quality_raw
      FROM documents
    )
    SELECT doc_id, n_tokens, quality_raw,
           ROUND(1.0 / (1.0 + exp(-quality_raw)), 6) AS quality_prob,
           quality_raw >= 0.0 AS quality_keep
    FROM s
    """


@q("q108_quality_classifier", _q108_oracle())
def q108(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import classifier

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return classifier.classify(docs, threshold=0.0, salt="qc")


# =====================================================================
# C4-style line cleaning (Raffel et al. §2.2). The test corpus is a
# flat token stream, so the query synthesizes a deterministic
# multi-line page per document (token-slice lines + planted
# boilerplate: a javascript ad line every 5th doc, a lorem-ipsum line
# every 11th, a too-short line everywhere) identically in both
# engines — the q97 planted-contamination pattern. The operator
# itself (operators/c4.c4_filter) is a pure map-only Column
# expression: terminal-punctuation / min-words / javascript line
# rules, lorem-ipsum / brace / min-lines page rules. Full value
# oracle including the reassembled kept_text string.
# =====================================================================
_C4_DOC2_SQL = r"""
    tk AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    doc2 AS (
      SELECT doc_id,
             coalesce(array_to_string(toks[1:12], ' '), '') || ' .' || chr(10) ||
             (CASE WHEN doc_id % 5 = 0
                   THEN 'click to buy javascript required now .'
                   ELSE coalesce(array_to_string(toks[13:17], ' '), '') END) || chr(10) ||
             (CASE WHEN doc_id % 11 = 0
                   THEN 'lorem ipsum dolor sit amet .'
                   ELSE coalesce(array_to_string(toks[18:28], ' '), '') || ' ?' END) || chr(10) ||
             'tiny .' || chr(10) ||
             coalesce(array_to_string(toks[29:40], ' '), '') || ' .' AS text
      FROM tk
    ),
    lns AS (
      SELECT doc_id, text,
             list_filter(list_transform(string_split(text, chr(10)),
                                        l -> trim(l)),
                         l -> l <> '') AS ls
      FROM doc2
    )
"""


def _c4_doc2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of _C4_DOC2_SQL's doc2 CTE."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    l1 = F.concat(F.concat_ws(" ", F.slice(toks, 1, 12)), F.lit(" ."))
    l2 = F.when(
        F.col("doc_id") % 5 == 0,
        F.lit("click to buy javascript required now ."),
    ).otherwise(F.concat_ws(" ", F.slice(toks, 13, 5)))
    l3 = F.when(
        F.col("doc_id") % 11 == 0, F.lit("lorem ipsum dolor sit amet .")
    ).otherwise(F.concat(F.concat_ws(" ", F.slice(toks, 18, 11)), F.lit(" ?")))
    l5 = F.concat(F.concat_ws(" ", F.slice(toks, 29, 12)), F.lit(" ."))
    return docs.select(
        "doc_id",
        F.concat_ws("\n", l1, l2, l3, F.lit("tiny ."), l5).alias("text"),
    )


@q(
    "q109_c4_line_filter",
    "WITH "
    + _C4_DOC2_SQL
    + r"""
    SELECT doc_id,
           len(ls) AS n_lines,
           len(kept) AS n_kept,
           (NOT contains(lower(text), 'lorem ipsum')
            AND NOT contains(text, '{')
            AND len(kept) >= 3) AS c4_keep,
           array_to_string(kept, chr(10)) AS kept_text
    FROM (
      SELECT doc_id, text, ls,
             list_filter(ls, l ->
               regexp_matches(l, '[.!?"]$')
               AND len(list_filter(string_split_regex(trim(l), '\s+'),
                                   x -> x <> '')) >= 5
               AND NOT contains(lower(l), 'javascript')) AS kept
      FROM lns
    )
    """,
)
def q109(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import c4

    return c4.c4_filter(_c4_doc2(spark, sf_dir), min_words=5, min_lines=3)


# =====================================================================
# Corpus-wide exact line dedup keeping first occurrences (C4's
# repeated-span dedup at line granularity) over the same synthetic
# multi-line corpus: the planted 'tiny .' line appears in every doc
# and survives only at its minimum (doc, pos); boilerplate lines and
# token-slice lines of exact-duplicate documents dedup the same way.
# Spark plan: posexplode -> min-(doc,pos)-per-line-hash (map-side
# combined, 8-byte xxhash64 keys) -> winners join back on the hash ->
# bounded per-doc reassembly. Oracle replays with a row_number window
# on the raw line strings and an ordered string_agg.
# =====================================================================
@q(
    "q110_line_dedup",
    "WITH "
    + _C4_DOC2_SQL
    + r""",
    pos AS (
      SELECT doc_id,
             unnest(generate_series(1, len(ls))) AS pos, ls
      FROM lns
    ),
    pl AS (SELECT doc_id, pos, ls[pos] AS line FROM pos),
    r AS (
      SELECT doc_id, pos, line,
             row_number() OVER (PARTITION BY line
                                ORDER BY doc_id, pos) AS rn
      FROM pl
    ),
    surv AS (
      SELECT doc_id, count(*) AS n_lines_after,
             string_agg(line, chr(10) ORDER BY pos) AS deduped_text
      FROM r WHERE rn = 1 GROUP BY doc_id
    )
    SELECT l.doc_id,
           len(l.ls) AS n_lines_before,
           CAST(coalesce(s.n_lines_after, 0) AS BIGINT) AS n_lines_after,
           coalesce(s.deduped_text, '') AS deduped_text
    FROM lns l LEFT JOIN surv s USING (doc_id)
    """,
)
def q110(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import c4

    return c4.dedup_lines(_c4_doc2(spark, sf_dir))


# =====================================================================
# SemDeDup-style semantic dedup (Abbas et al. 2023) over the q36
# planted-twin corpus: k-means-style cluster assignment against
# broadcast centroid literals (hash-derived defaults — the trained
# path shares the contract via train_ivf_centroids), within-cluster
# pairwise cosine at threshold 0.95, and pairwise-domination keep
# semantics on the (centroid_cos, id) priority. The quadratic is
# bounded by cluster size — n_clusters is the web-scale knob (the
# paper runs ~100k clusters), so k SCALES WITH THE CORPUS here:
# k = clamp(ceil(n/_SD_TARGET), _SD_K, _SD_K_MAX) keeps expected
# cluster size ~_SD_TARGET rows, making within-cluster pair volume
# (and the whole query) linear in n instead of quadratic (the fixed
# k=8 of rounds 3/4a measured 28x on the 10x sf1 gate). At sf0.01
# (n=550) the clamp floors at the original k=8, so the trained
# DuckDB oracle below is byte-identical. _SD_K_MAX bounds the
# driver-side Lloyd sample (8 vectors/cluster); past that a
# distributed trainer is the documented extension (docs/SCALE.md).
# Full value oracle: twins, centroid assignment, cosines, domination
# flags all replayed in DuckDB with inlined centroids.
# =====================================================================
_SD_K, _SD_CAP, _SD_ITERS, _SD_SEED, _SD_SALT = 8, 200, 10, 7, "sd"
_SD_TARGET, _SD_K_MAX = 256, 4096


def _q111_oracle(
    centroids: list[list[float]],
    dim: int = 64,
    thr: float = 0.95,
) -> str:
    def arr(vec: list[float]) -> str:
        return "[" + ",".join(repr(x) for x in vec) + "]"

    dist_terms = ", ".join(
        f"ROUND(list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> (v[i] - ({arr(c)})[i])"
        f" * (v[i] - ({arr(c)})[i]))), 9)"
        for c in centroids
    )
    cents = "[" + ", ".join(arr(c) for c in centroids) + "]"
    return f"""
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    twins AS (
      SELECT vec_id + 1000000 AS vec_id,
             list_transform(generate_series(1, {dim}),
                            i -> v[i] * (1.0 + ((vec_id + i - 1) % 7 - 3) / 100.0)) AS v
      FROM base WHERE vec_id < 50
    ),
    u AS (SELECT * FROM base UNION ALL SELECT * FROM twins),
    d AS (SELECT vec_id, v, [{dist_terms}] AS dists FROM u),
    asg AS (
      SELECT vec_id, v,
             CAST(list_position(dists, list_min(dists)) - 1 AS INT) AS cluster
      FROM d
    ),
    cc AS (
      SELECT vec_id, v, cluster,
             ROUND(CASE WHEN sqrt(list_dot_product(v, v))
                             * sqrt(list_dot_product(({cents})[cluster + 1],
                                                     ({cents})[cluster + 1])) > 0
                   THEN list_dot_product(v, ({cents})[cluster + 1])
                        / (sqrt(list_dot_product(v, v))
                           * sqrt(list_dot_product(({cents})[cluster + 1],
                                                   ({cents})[cluster + 1])))
                   ELSE 0.0 END, 6) AS centroid_cos
      FROM asg
    ),
    pairs AS (
      SELECT a.vec_id AS ida, a.centroid_cos AS cca,
             b.vec_id AS idb, b.centroid_cos AS ccb
      FROM cc a JOIN cc b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      WHERE ROUND(list_dot_product(a.v, b.v)
                  / NULLIF(sqrt(list_dot_product(a.v, a.v))
                           * sqrt(list_dot_product(b.v, b.v)), 0), 6) >= {thr}
    ),
    losers AS (
      SELECT DISTINCT CASE WHEN (cca, ida) > (ccb, idb) THEN ida ELSE idb END AS vec_id
      FROM pairs
    )
    SELECT cc.vec_id, cluster, centroid_cos,
           losers.vec_id IS NULL AS semdedup_keep
    FROM cc LEFT JOIN losers USING (vec_id)
    """


def _q111_trained_oracle(sf_dir: str = "/root/testdata/sf0.01") -> str | None:
    """Replays the IDENTICAL k-means training (twin construction, md5
    sample order, shared numpy lloyd) and inlines the trained centroids
    into the assignment/domination SQL — the q119 trained-state
    pattern, applied to SemDeDup's own clustering step."""
    import os as _os

    from dbt_incremental_ci_spark.operators import clustering

    ep = _os.path.join(sf_dir, "embeddings.parquet")
    if not _os.path.exists(ep):
        return None
    import duckdb as _duck

    con = _duck.connect()
    rows = con.execute(
        f"""SELECT vec_id, embedding::DOUBLE[]
            FROM read_parquet('{ep}') WHERE embedding IS NOT NULL"""
    ).fetchall()
    con.close()
    pool: list[tuple[int, list[float]]] = []
    for vid, v in rows:
        v = list(v)
        pool.append((vid, v))
        if vid < 50:
            pool.append(
                (
                    vid + 1000000,
                    [x * (1.0 + ((vid + j) % 7 - 3) / 100.0)
                     for j, x in enumerate(v)],
                )
            )
    sampled = sorted(
        pool, key=lambda r: clustering.sample_order_key(r[0], _SD_SALT)
    )[:_SD_CAP]
    sampled = sorted(sampled, key=lambda r: r[0])
    cents = clustering.lloyd(
        [v for _, v in sampled], _SD_K, _SD_ITERS, _SD_SEED
    )
    return _q111_oracle(cents)


_LAZY_ORACLES["q111_semdedup"] = _q111_trained_oracle


@q("q111_semdedup")
def q111(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import clustering
    from dbt_incremental_ci_spark.operators import semdedup as sd

    emb = t(spark, sf_dir, "embeddings")
    u = _q36_perturbed_union(emb).localCheckpoint(eager=False)
    # ^ counted once here, then scanned by kmeans_fit's sample and
    # semdedup's assignment — without truncation each re-runs the
    # twin-union projection (cheap, but the count() below would add a
    # third full re-execution of it).
    n = u.count()
    k = min(max(_SD_K, -(-n // _SD_TARGET)), _SD_K_MAX)
    cents = clustering.kmeans_fit(
        u, k=k, id_col="vec_id", vec_col="embedding",
        sample_cap=max(_SD_CAP, 8 * k), iters=_SD_ITERS, seed=_SD_SEED,
        salt=_SD_SALT,
    )
    return sd.semdedup(
        u, dim=64, n_clusters=k, threshold=0.95, centroids=cents
    )


# =====================================================================
# Fixed-point PageRank over the customer->supplier trade graph —
# link-graph centrality as a corpus-curation quality weight (the
# Common-Crawl host-ranking step). Integer fixed-point ranks (units of
# 1e-12) make every per-iteration sum associative and partitioning-
# independent, so the rank vector has exactly one well-defined value;
# the oracle recomputes the whole iteration INDEPENDENTLY in pure
# Python (operators/pagerank.pagerank_replica) and inlines it as
# VALUES — the q33 independent-replica pattern. Suppliers have no
# out-edges, so the dangling-mass redistribution path is exercised on
# every iteration.
# =====================================================================
def _q112_oracle(sf_dir: str = "/root/testdata/sf0.01") -> str | None:
    import os as _os

    from dbt_incremental_ci_spark.operators.pagerank import pagerank_replica

    op = _os.path.join(sf_dir, "orders.parquet")
    lp = _os.path.join(sf_dir, "lineitem.parquet")
    if not (_os.path.exists(op) and _os.path.exists(lp)):
        return None
    import duckdb as _duck

    con = _duck.connect()
    pairs = con.execute(
        f"""
        SELECT DISTINCT o.o_custkey * 10 AS src, l.l_suppkey * 10 + 1 AS dst
        FROM read_parquet('{op}') o
        JOIN read_parquet('{lp}') l ON l.l_orderkey = o.o_orderkey
        """
    ).fetchall()
    con.close()
    ranks = pagerank_replica([(int(s), int(d)) for s, d in pairs], iterations=6)
    rows = ",\n      ".join(
        f"({node}, {fp})" for node, fp in sorted(ranks.items())
    )
    return f"""
    SELECT CAST(node AS BIGINT) AS node,
           CAST(rank_fp AS BIGINT) AS rank_fp,
           rank_fp / 1000000000000.0 AS rank
    FROM (VALUES
      {rows}
    ) t(node, rank_fp)
    """


_LAZY_ORACLES["q112_pagerank"] = _q112_oracle


@q("q112_pagerank")
def q112(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.pagerank import pagerank

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        (F.col("o_custkey") * 10).alias("src"),
        (F.col("l_suppkey") * 10 + 1).alias("dst"),
    )
    return pagerank(edges, iterations=6)


# =====================================================================
# Column profiling — the ANALYZE-style source audit (row counts, null
# fractions, distinct counts, canonicalized min/max) as one row per
# column from a single aggregation pass (stack pivot of a 1-row agg;
# the data never reaches the driver). NULLs are planted in c_phone so
# the null-accounting path actually fires. Floats canonicalize
# through decimal(18,2) before min/max so the rendered strings agree
# across engines. Oracle: per-column UNION ALL replica.
# =====================================================================
def _q113_oracle() -> str:
    cols = [
        ("c_custkey", "bigint", "c_custkey"),
        ("c_name", "string", "c_name"),
        ("c_nationkey", "int", "c_nationkey"),
        ("c_acctbal", "double", "c_acctbal"),
        ("c_mktsegment", "string", "c_mktsegment"),
    ]
    parts = []
    for name, dtype, expr in cols:
        if dtype == "double":
            mn = f"CAST(min(CAST({expr} AS DECIMAL(18,2))) AS VARCHAR)"
            mx = f"CAST(max(CAST({expr} AS DECIMAL(18,2))) AS VARCHAR)"
        else:
            mn = f"CAST(min({expr}) AS VARCHAR)"
            mx = f"CAST(max({expr}) AS VARCHAR)"
        parts.append(
            f"""
      SELECT '{name}' AS "column", '{dtype}' AS dtype,
             count(*) AS n_rows,
             count(*) - count({expr}) AS n_nulls,
             ROUND((count(*) - count({expr}))::DOUBLE / count(*), 6) AS null_frac,
             count(DISTINCT {expr}) AS n_distinct,
             {mn} AS min_val, {mx} AS max_val
      FROM planted"""
        )
    body = "\n      UNION ALL".join(parts)
    return f"""
    WITH planted AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_name END AS c_name,
             c_nationkey, c_acctbal, c_mktsegment
      FROM customer
    )
    {body}
    """


@q("q113_column_profile", _q113_oracle())
def q113(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import profiling

    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_name"))
        .alias("c_name"),
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    )
    return profiling.profile(c, exact_distinct=True)


# =====================================================================
# Bloom-filter membership — the incremental-ingestion "seen before?"
# primitive: build the filter over the accepted corpus (doc_id%3<>0),
# probe EVERY doc, and audit false positives explicitly. m is set
# deliberately small (1024 bits, ~73% fill) so the false-positive
# path genuinely fires and its exact membership is part of the value
# hash. Sparse relational representation: the filter is a table of
# set bit positions (md5 house hash, k=4 salted draws), membership is
# a broadcast join counting all-k hits — every step replays
# value-exactly in DuckDB.
# =====================================================================
def _q114_oracle(m: int = 1024, k: int = 4, salt: str = "bloom") -> str:
    from dbt_incremental_ci_spark.operators.bloom import position_sql

    member_pos = "\n        UNION ALL ".join(
        f"SELECT {position_sql('doc_id', m, salt, i)} AS bit_pos FROM members"
        for i in range(k)
    )
    probe_pos = "\n        UNION ALL ".join(
        f"SELECT doc_id, {position_sql('doc_id', m, salt, i)} AS bit_pos FROM probes"
        for i in range(k)
    )
    return f"""
    WITH members AS (SELECT doc_id FROM documents WHERE doc_id % 3 <> 0),
    probes AS (SELECT doc_id FROM documents),
    bits AS (
      SELECT DISTINCT bit_pos FROM (
        {member_pos}
      )
    ),
    pp AS (
        {probe_pos}
    ),
    hits AS (
      SELECT doc_id,
             count(*) = sum(CASE WHEN b.bit_pos IS NOT NULL THEN 1 ELSE 0 END)
               AS mc
      FROM pp LEFT JOIN bits b USING (bit_pos)
      GROUP BY doc_id
    )
    SELECT p.doc_id,
           coalesce(h.mc, FALSE) AS might_contain,
           p.doc_id % 3 <> 0 AS is_member,
           (coalesce(h.mc, FALSE) AND NOT (p.doc_id % 3 <> 0)) AS false_positive
    FROM probes p LEFT JOIN hits h USING (doc_id)
    """


@q("q114_bloom_membership", _q114_oracle())
def q114(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import bloom

    docs = t(spark, sf_dir, "documents").select("doc_id")
    members = docs.filter(F.col("doc_id") % 3 != 0)
    bits = bloom.bloom_build(members, m=1024, k=4)
    probed = bloom.bloom_might_contain(bits, docs, m=1024, k=4)
    return probed.select(
        "doc_id",
        "might_contain",
        (F.col("doc_id") % 3 != 0).alias("is_member"),
        (F.col("might_contain") & ~(F.col("doc_id") % 3 != 0)).alias(
            "false_positive"
        ),
    )


# =====================================================================
# Temperature (alpha) mixture resampling — the mBERT/XLM-R rebalance:
# shares proportional to count^0.5 over the (skewed) lang column, rates
# derived by the q100 machinery, key-stable md5 membership. The
# oracle is LAZY: it reads the same per-source counts from parquet
# and runs the IDENTICAL Python share/rate computation, inlining the
# resulting rate doubles as literals — so there is no cross-engine
# pow()/summation drift at all; the only SQL is the md5 filter.
# =====================================================================
def _q115_oracle(sf_dir: str = "/root/testdata/sf0.01") -> str | None:
    import os as _os

    from dbt_incremental_ci_spark.operators.sampling import (
        hash_uniform_sql,
        mixture_rates,
        temperature_shares,
    )

    dp = _os.path.join(sf_dir, "documents.parquet")
    if not _os.path.exists(dp):
        return None
    import duckdb as _duck

    con = _duck.connect()
    counts = dict(
        con.execute(
            f"SELECT lang, count(*) FROM read_parquet('{dp}') GROUP BY lang"
        ).fetchall()
    )
    con.close()
    rates = mixture_rates(counts, temperature_shares(counts, alpha=0.5))
    rows = ", ".join(f"('{c}', {r!r})" for c, r in sorted(rates.items()))
    u = hash_uniform_sql("d.doc_id", "temp")
    return f"""
    WITH rates(lang, rate) AS (VALUES {rows})
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN rates r USING (lang)
    WHERE {u} < r.rate
    """


_LAZY_ORACLES["q115_temperature_mixture"] = _q115_oracle


@q("q115_temperature_mixture")
def q115(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return sampling.temperature_resample(
        docs, key_col="doc_id", category_col="lang", alpha=0.5, salt="temp"
    )


# =====================================================================
# Text normalization — the canonical pre-shingle cleanup (accent
# folding, control-char strip, lowercase, whitespace collapse). The
# corpus is pure ASCII, so mess is PLANTED: every 4th doc gains an
# accented prefix, every 6th a control char and tab runs — then both
# engines normalize with the identical translate map and regexes.
# Also emits the house 64-bit fingerprint of the normalized text via
# md5 (so dedup keys downstream are normalization-aware).
# =====================================================================
@q(
    "q116_normalize_text",
    r"""
    WITH planted AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 0
                  THEN 'Héllo WÖRLD Ünïcode ' || text
                  ELSE text END ||
             CASE WHEN doc_id % 6 = 0
                  THEN chr(9) || ' spaced' || chr(7) || 'out  '
                  ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id,
           trim(regexp_replace(
             lower(regexp_replace(
               translate(text,
                 'àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ',
                 'aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUY'),
               '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g')),
             '\s+', ' ', 'g')) AS norm_text,
           substr(md5(trim(regexp_replace(
             lower(regexp_replace(
               translate(text,
                 'àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ',
                 'aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUY'),
               '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g')),
             '\s+', ' ', 'g'))), 1, 16) AS norm_fp
    FROM planted
    """,
)
def q116(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(F.lit("Héllo WÖRLD Ünïcode "), F.col("text")),
            ).otherwise(F.col("text")),
            F.when(
                F.col("doc_id") % 6 == 0,
                F.lit("\t spaced\x07out  "),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    norm = text.normalize_text("text")
    return planted.select(
        "doc_id",
        norm.alias("norm_text"),
        F.substring(F.md5(norm), 1, 16).alias("norm_fp"),
    )


# =====================================================================
# BM25 lexical retrieval: a small literal query set scored against the
# corpus through posting lists only (token-sharded inverted index —
# never an all-pairs product). Per-term partials are rounded to
# DECIMAL(18,10) before the per-(query,doc) sum so the grouped sum is
# order-independent decimal arithmetic in both engines; the final
# score rounds to 6 and ranks with a doc_id tiebreaker.
# =====================================================================
_BM25_QUERIES = [
    ("q1", "spark merge table"),
    ("q2", "hash join window"),
    ("q3", "stream batch vector"),
    ("q4", "slow query scan filter"),
]


@q(
    "q117_bm25_topk",
    r"""
    WITH q(query_id, qtext) AS (
      VALUES ('q1', 'spark merge table'),
             ('q2', 'hash join window'),
             ('q3', 'stream batch vector'),
             ('q4', 'slow query scan filter')
    ),
    tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS token
      FROM documents
    ),
    post AS (SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (
      SELECT count(*) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
      FROM dl
    ),
    dftbl AS (SELECT token, count(DISTINCT doc_id) AS df_t FROM post GROUP BY 1),
    qt AS (
      SELECT DISTINCT query_id,
             unnest(list_filter(string_split_regex(lower(qtext), '\s+'),
                                x -> x <> '')) AS token
      FROM q
    ),
    scored AS (
      SELECT query_id, doc_id,
             ROUND(CAST(SUM(CAST(
               ln(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
               * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
             AS DECIMAL(18,10))) AS DOUBLE), 6) AS score
      FROM qt
      JOIN post USING (token)
      JOIN dl USING (doc_id)
      JOIN dftbl USING (token)
      CROSS JOIN stats
      GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, score, rnk FROM (
      SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id ASC) AS rnk
      FROM scored
    ) WHERE rnk <= 5
    """,
)
def q117(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import retrieval

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    queries = spark.createDataFrame(_BM25_QUERIES, ["query_id", "qtext"])
    return retrieval.bm25_topk(docs, queries, k=5, k1=1.2, b=0.75)


# =====================================================================
# DSIR importance resampling (Xie et al. 2023): rank the raw corpus by
# hashed-unigram target-likeness (target = the 'en' slice) and keep
# the top 100. The feature space is a CONSTANT 64-bucket table, so the
# scoring join broadcasts a 64-row log-ratio table — the corpus is
# only ever touched by its own token explode. Per-token log-ratio
# contributions round to DECIMAL(18,10) before the per-doc sum
# (order-independent); the Spark side ranks through the two-phase
# range-partition shape, never a single-task global window.
# =====================================================================
@q(
    "q118_dsir_selection",
    r"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                x -> x <> '')) AS tk
      FROM documents
    ),
    b AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(tk || ':dsir'), 1, 8))::BIGINT % 64 AS bucket
      FROM tok
    ),
    tc AS (SELECT bucket, count(*) AS ct FROM b WHERE lang = 'en' GROUP BY 1),
    rc AS (SELECT bucket, count(*) AS cr FROM b GROUP BY 1),
    spine AS (SELECT range AS bucket FROM range(64)),
    j AS (
      SELECT spine.bucket, COALESCE(ct, 0) AS ct, COALESCE(cr, 0) AS cr
      FROM spine LEFT JOIN tc USING (bucket) LEFT JOIN rc USING (bucket)
    ),
    tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM j),
    w AS (
      SELECT bucket,
             ln((ct + 0.5) / (tt + 32.0)) - ln((cr + 0.5) / (tr + 32.0))
               AS logratio
      FROM j CROSS JOIN tot
    ),
    scored AS (
      SELECT doc_id, count(*) AS n_tokens,
             ROUND(CAST(SUM(CAST(logratio AS DECIMAL(18,10))) AS DOUBLE), 6)
               AS logweight
      FROM b JOIN w USING (bucket)
      GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, logweight,
           CAST(row_number() OVER (ORDER BY logweight DESC, doc_id ASC)
                AS INT) AS rnk,
           row_number() OVER (ORDER BY logweight DESC, doc_id ASC) <= 100
             AS keep
    FROM scored
    """,
)
def q118(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import dsir

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    target = docs.filter(F.col("lang") == "en")
    return dsir.dsir_select(docs, target, k=100, n_buckets=64, alpha=0.5)


# =====================================================================
# K-means embedding clustering (q119): train on a bounded md5-ordered
# sample (distributed TakeOrderedAndProject, Lloyd in shared numpy),
# assign the corpus map-only against literal centroids, annotate with
# k-row cluster sizes. The lazy oracle replays the IDENTICAL training
# (same md5 sample selection via DuckDB, same numpy code) and inlines
# the resulting centroids into SQL — the q43/q99 pattern extended to
# trained state.
# =====================================================================
_KM_K, _KM_DIM, _KM_CAP, _KM_ITERS, _KM_SEED = 10, 64, 200, 10, 7


def _q119_oracle(sf_dir: str = "/root/testdata/sf0.01") -> str | None:
    import os as _os

    from dbt_incremental_ci_spark.operators import clustering

    ep = _os.path.join(sf_dir, "embeddings.parquet")
    if not _os.path.exists(ep):
        return None
    import duckdb as _duck

    con = _duck.connect()
    rows = con.execute(
        f"""
        SELECT vec_id, embedding::DOUBLE[] FROM read_parquet('{ep}')
        WHERE embedding IS NOT NULL
        ORDER BY md5(vec_id::VARCHAR || ':km') LIMIT {_KM_CAP}
        """
    ).fetchall()
    con.close()
    rows = sorted(rows, key=lambda r: r[0])
    centers = clustering.lloyd(
        [r[1] for r in rows], _KM_K, _KM_ITERS, _KM_SEED
    )

    def arr(vec: list[float]) -> str:
        return "[" + ",".join(repr(x) for x in vec) + "]"

    dist_terms = ", ".join(
        f"ROUND(list_sum(list_transform(generate_series(1, {_KM_DIM}), "
        f"i -> (v[i] - ({arr(c)})[i]) * (v[i] - ({arr(c)})[i]))), 9)"
        for c in centers
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    d AS (SELECT vec_id, [{dist_terms}] AS dists FROM e),
    a AS (
      SELECT vec_id,
             CAST(list_position(dists, list_min(dists)) - 1 AS INT) AS cluster,
             ROUND(list_min(dists), 6) AS dist2
      FROM d
    )
    SELECT vec_id, cluster, dist2,
           count(*) OVER (PARTITION BY cluster) AS cluster_size
    FROM a
    """


_LAZY_ORACLES["q119_kmeans_clusters"] = _q119_oracle


@q("q119_kmeans_clusters")
def q119(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import clustering

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return clustering.kmeans_cluster(
        emb,
        k=_KM_K,
        sample_cap=_KM_CAP,
        iters=_KM_ITERS,
        seed=_KM_SEED,
        salt="km",
    )


# =====================================================================
# Length-bucketed batching (q120): power-of-two token-length buckets,
# md5-variate deterministic order within bucket, fixed-size batch
# cuts, per-row pad waste. Spark ranks through the two-phase
# range-partition shape (a per-bucket window would be a single
# data-sized task at 100 TB — bucket cardinality is only ~log(max
# len)); the oracle can afford the plain per-bucket window at sf0.01.
# =====================================================================
@q(
    "q120_length_batches",
    r"""
    WITH base AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(text, '\s+'),
                             x -> x <> '')) AS n_tokens
      FROM documents
    ),
    b AS (
      SELECT doc_id, n_tokens,
             CAST(pow(2.0, ceil(log2(greatest(n_tokens, 1)))) AS INT)
               AS bucket_len
      FROM base
    )
    SELECT doc_id, n_tokens, bucket_len,
           CAST(floor((row_number() OVER (
             PARTITION BY bucket_len
             ORDER BY (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':batch'), 1, 8))
                       ::BIGINT / 4294967296.0) ASC, doc_id ASC) - 1) / 8)
             AS BIGINT) AS batch_id,
           bucket_len - n_tokens AS pad_waste
    FROM b
    """,
)
def q120(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import batching

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return batching.length_bucketed_batches(docs, batch_size=8, salt="batch")


# =====================================================================
# Robust outlier audit (q121): exact per-group median/MAD over
# lineitem prices, modified-z outlier counts (Iglewicz–Hoaglin), and
# the winsorized mean at [p05, p95]. Exact percentiles are the
# audit-grade complement to the q46/q49 sketch route; Spark
# percentile() and DuckDB quantile_cont() interpolate identically.
# The winsorized mean goes through DECIMAL(18,6) before summing so
# the grouped sum is order-independent.
# =====================================================================
@q(
    "q121_robust_outliers",
    """
    WITH stats AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.5) AS med,
             quantile_cont(l_extendedprice, 0.05) AS p05,
             quantile_cont(l_extendedprice, 0.95) AS p95
      FROM lineitem GROUP BY l_returnflag
    ),
    mad AS (
      SELECT l_returnflag,
             quantile_cont(abs(l_extendedprice - med), 0.5) AS mad
      FROM lineitem JOIN stats USING (l_returnflag)
      GROUP BY l_returnflag
    ),
    j AS (
      SELECT l.l_returnflag, l.l_extendedprice, s.med, s.p05, s.p95, m.mad
      FROM lineitem l
      JOIN stats s USING (l_returnflag) JOIN mad m USING (l_returnflag)
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           ROUND(first(med), 6) AS med, ROUND(first(mad), 6) AS mad,
           ROUND(first(p05), 6) AS p05, ROUND(first(p95), 6) AS p95,
           CAST(count(*) FILTER (WHERE mad > 0
                 AND abs(l_extendedprice - med) > 3.5 * mad / 0.6745)
                AS BIGINT) AS n_outliers,
           ROUND(CAST(SUM(CAST(least(greatest(l_extendedprice, p05), p95)
                               AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4)
             AS winsor_mean
    FROM j
    GROUP BY l_returnflag
    """,
)
def q121(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import robust

    li = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    flagged = robust.flag_outliers(li, ["l_returnflag"], "l_extendedprice")
    wv = robust.winsorize(
        F.col("l_extendedprice").cast("double"), F.col("p05"), F.col("p95")
    )
    return flagged.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.first("med"), 6).alias("med"),
        F.round(F.first("mad"), 6).alias("mad"),
        F.round(F.first("p05"), 6).alias("p05"),
        F.round(F.first("p95"), 6).alias("p95"),
        F.sum(F.col("is_outlier").cast("bigint")).alias("n_outliers"),
        F.round(
            F.sum(wv.cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("winsor_mean"),
    )


# =====================================================================
# Character-entropy screening (q122): per-doc char-unigram entropy,
# distinct-char count, dominant char + share. One doc-sharded char
# explode with map-side combine; H = log2(n) − (Σ c·log2 c)/n with
# decimal-rounded terms so the fold is order-independent; dominant
# char resolves (count desc, char asc) identically in both engines.
# =====================================================================
@q(
    "q122_char_entropy",
    """
    WITH ch AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS ch
      FROM documents
    ),
    counts AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
    per_doc AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
             count(*) AS distinct_chars,
             CAST(SUM(CAST(c * log2(c) AS DECIMAL(18,10))) AS DOUBLE)
               AS clogc
      FROM counts GROUP BY doc_id
    ),
    top AS (
      SELECT doc_id, ch AS top_char, c AS topc
      FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY c DESC, ch ASC) AS rn
            FROM counts)
      WHERE rn = 1
    )
    SELECT doc_id, n_chars, distinct_chars,
           ROUND(log2(n_chars) - clogc / n_chars, 6) AS char_entropy,
           top_char,
           ROUND(CAST(topc AS DOUBLE) / n_chars, 6) AS top_char_frac
    FROM per_doc JOIN top USING (doc_id)
    """,
)
def q122(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return text.char_stats(docs)


# =====================================================================
# BPE tokenizer training (q123): one corpus pass builds the word-
# frequency table; 10 merge rounds then run over the VOCAB only —
# weighted pair-count aggregate, deterministic (count desc, pair asc)
# argmax, map-only regexp merge — the reason BPE training is feasible
# on a 100 TB corpus. The oracle replays training in pure Python from
# DuckDB's word counts (integer arithmetic end to end).
# =====================================================================
def _q123_oracle(sf_dir: str = "/root/testdata/sf0.01") -> str | None:
    import os as _os

    from dbt_incremental_ci_spark.operators import bpe

    dp = _os.path.join(sf_dir, "documents.parquet")
    if not _os.path.exists(dp):
        return None
    import duckdb as _duck

    con = _duck.connect()
    wc = dict(
        con.execute(
            f"""
            SELECT word, count(*) FROM (
              SELECT unnest(list_filter(
                string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS word
              FROM read_parquet('{dp}')
            ) GROUP BY word
            """
        ).fetchall()
    )
    con.close()
    merges = bpe.bpe_train_replica(wc, n_merges=10)
    rows = ", ".join(
        f"({r}, '{l}', '{rt}', {c})" for r, l, rt, c in merges
    )
    return f"""
    SELECT merge_rank, left_sym, right_sym, pair_count
    FROM (VALUES {rows})
      AS t(merge_rank, left_sym, right_sym, pair_count)
    """


_LAZY_ORACLES["q123_bpe_merges"] = _q123_oracle


@q("q123_bpe_merges")
def q123(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import bpe

    docs = t(spark, sf_dir, "documents").select("text")
    merges = bpe.bpe_train(docs, n_merges=10)
    return spark.createDataFrame(
        merges, ["merge_rank", "left_sym", "right_sym", "pair_count"]
    ).select(
        F.col("merge_rank").cast("int"),
        "left_sym",
        "right_sym",
        F.col("pair_count").cast("bigint"),
    )


# =====================================================================
# Boilerplate span removal (q124): any trigram present in >= 10
# distinct docs is boilerplate; every token position it covers is
# dropped corpus-wide and survivors rejoin in order (Lee et al. 2022
# ExactSubstr flavor, span-granular vs q110's line granularity).
# Boilerplate is PLANTED — every 3rd doc gains a newsletter footer —
# identically in both engines; organic repeated trigrams above the
# threshold are removed by both sides too. Integer/string arithmetic
# end to end.
# =====================================================================
@q(
    "q124_boilerplate_removal",
    r"""
    WITH planted AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 3 = 0
                          THEN ' subscribe to our newsletter today'
                          ELSE '' END AS text
      FROM documents
    ),
    tk AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x <> '') AS toks
      FROM planted
    ),
    tok_pos AS (
      SELECT doc_id, unnest(toks) AS tok,
             unnest(generate_series(1, len(toks))) AS pos
      FROM tk
    ),
    grams AS (
      SELECT doc_id,
             unnest(generate_series(1, greatest(0, len(toks) - 2))) AS gpos,
             unnest(list_transform(
               generate_series(1, greatest(0, len(toks) - 2)),
               i -> array_to_string(toks[i:i+2], ' '))) AS ng
      FROM tk
    ),
    boiler AS (
      SELECT ng FROM (SELECT DISTINCT doc_id, ng FROM grams)
      GROUP BY ng HAVING count(*) >= 10
    ),
    covered AS (
      SELECT DISTINCT doc_id,
             unnest(generate_series(gpos, gpos + 2)) AS pos
      FROM grams JOIN boiler USING (ng)
    ),
    kept AS (
      SELECT tok_pos.* FROM tok_pos
      ANTI JOIN covered USING (doc_id, pos)
    ),
    rebuilt AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(tok, ' ' ORDER BY pos) AS cleaned_text
      FROM kept GROUP BY doc_id
    ),
    totals AS (SELECT doc_id, len(toks) AS n_tokens FROM tk)
    SELECT p.doc_id,
           CAST(coalesce(t.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(t.n_tokens, 0) - coalesce(r.n_kept, 0) AS BIGINT)
             AS n_removed,
           coalesce(r.cleaned_text, '') AS cleaned_text
    FROM planted p
    LEFT JOIN totals t USING (doc_id)
    LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def q124(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import ngrams

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit(" subscribe to our newsletter today"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return ngrams.remove_boilerplate_spans(planted, n=3, min_doc_freq=10)


# =====================================================================
# Time-series gap fill + forward fill (q125): per-user daily grid over
# each user's own observed range (per-key sequence explode — spine is
# output-sized, never |keys|×|global range|), decimal-exact daily
# sums, NULL gaps materialized, last-observation-carried-forward via
# an ignore-nulls running window. ts is the house BIGINT-nanos
# contract; DuckDB buckets with integer epoch_ns division.
# =====================================================================
@q(
    "q125_gap_fill_ffill",
    """
    WITH b AS (
      SELECT user_id, epoch_ns(ts) // 86400000000000 AS bucket,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS observed
      FROM events
      GROUP BY 1, 2
    ),
    spine AS (
      SELECT user_id, unnest(generate_series(min(bucket), max(bucket)))
               AS bucket
      FROM b GROUP BY user_id
    ),
    grid AS (
      SELECT s.user_id, s.bucket, b.observed
      FROM spine s LEFT JOIN b USING (user_id, bucket)
    )
    SELECT user_id, bucket, observed,
           observed IS NULL AS is_gap,
           last_value(observed IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM grid
    """,
)
def q125(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import timeseries

    ev = events_table(spark, sf_dir).select("user_id", "ts", "value")
    return timeseries.gap_fill_ffill(ev, "user_id", "ts", "value")


# =====================================================================
# Bloom-filtered join (q126): the semi-join-reduction runtime filter
# as a first-class operator — a bits table over the selective
# customer slice pre-drops non-matching orders map-only before the
# exact join, so the fact shuffle carries a sliver, not the table.
# No false negatives, so the result is EXACTLY the plain inner join —
# which is precisely what the oracle runs.
# =====================================================================
@q(
    "q126_bloom_join",
    """
    SELECT o_orderkey, c_custkey, c_name,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
             AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal > 9900.0
    """,
)
def q126(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import bloom

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900.0)
        .select("c_custkey", "c_name")
    )
    joined = bloom.bloom_filtered_join(
        orders, cust, "o_custkey", "c_custkey"
    )
    return joined.select(
        "o_orderkey",
        "c_custkey",
        "c_name",
        dec("o_totalprice").cast("double").alias("total_price"),
    )


# =====================================================================
# Exact set-similarity join (q127): PPJoin-style prefix filtering.
# Unlike the MinHash/SimHash stack (q32/q33 — banded, probabilistic
# recall), this is EXACT at the threshold: the rarest-first prefix
# equi-join provably generates every pair with J >= t, then a
# candidate-bounded intersection count verifies. The oracle is the
# brute-force DuckDB list_intersect over all pairs — any false
# negative (or extra pair) hash-mismatches.
# =====================================================================
@q(
    "q127_setsim_join",
    """
    WITH ts AS (
      SELECT doc_id,
             list_distinct(list_filter(
               string_split_regex(lower(text), '\\s+'),
               x -> x <> '')) AS tk
      FROM documents
    ),
    nz AS (SELECT * FROM ts WHERE len(tk) > 0)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(a.tk) AS sz_a, len(b.tk) AS sz_b,
           len(list_intersect(a.tk, b.tk)) AS inter,
           ROUND(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
                 / (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))),
                 6) AS jaccard
    FROM nz a JOIN nz b ON a.doc_id < b.doc_id
    WHERE ROUND(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
                / (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))),
                6) >= 0.9
    """,
)
def q127(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import setsim

    docs = t(spark, sf_dir, "documents")
    out = setsim.jaccard_set_join(docs, "doc_id", "text", threshold=0.9)
    return out.select(
        "id_a",
        "id_b",
        F.col("sz_a").cast("long"),
        F.col("sz_b").cast("long"),
        F.col("inter").cast("long"),
        "jaccard",
    )


# =====================================================================
# Containment join (q128): asymmetric |a∩b|/|a| — the quote/subset
# detector symmetric Jaccard under-scores. The contained side is a
# deterministic 1-in-25 slice of the corpus (the "suspect quotes");
# the containing side is the full corpus. Prefix filter on the
# contained side only; the containing side probes all tokens, so big
# containers are found regardless of their size.
# =====================================================================
@q(
    "q128_containment_join",
    """
    WITH ts AS (
      SELECT doc_id,
             list_distinct(list_filter(
               string_split_regex(lower(text), '\\s+'),
               x -> x <> '')) AS tk
      FROM documents
    ),
    nz AS (SELECT * FROM ts WHERE len(tk) > 0),
    small AS (SELECT * FROM nz WHERE doc_id % 25 = 0)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(a.tk) AS sz_a,
           len(list_intersect(a.tk, b.tk)) AS inter,
           ROUND(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
                 / len(a.tk), 6) AS containment
    FROM small a JOIN nz b ON a.doc_id <> b.doc_id
    WHERE ROUND(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
                / len(a.tk), 6) >= 0.9
    """,
)
def q128(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import setsim

    docs = t(spark, sf_dir, "documents")
    small = docs.filter(F.col("doc_id") % 25 == 0)
    out = setsim.containment_join(small, docs, threshold=0.9)
    return out.select(
        "id_a",
        "id_b",
        F.col("sz_a").cast("long"),
        F.col("inter").cast("long"),
        "containment",
    )


# =====================================================================
# Triangle census of the near-dup graph (q129): degree-ordered
# orientation (Suri & Vassilvitskii WWW'11) bounds wedge fan-out by
# O(sqrt(|E|)) so the count survives celebrity nodes at 100 TB. The
# edge set is the EXACT 0.9-Jaccard setsim graph over a
# deterministic 1-in-5 corpus slice — the "census a sample to
# calibrate dedup thresholds" pattern; the full-corpus 0.9 graph on
# this synthetic near-identical corpus is clique soup (308M
# triangles at sf0.1 — correct but uninformative and output-bound).
# The DuckDB oracle rebuilds the same sliced graph brute-force and closes
# triangles with a canonical (u<v) 3-way join. Local clustering
# coefficient separates template cliques from quote-hub stars before
# dedup survivor selection.
# =====================================================================
@q(
    "q129_triangle_census",
    """
    WITH ts AS (
      SELECT doc_id,
             list_distinct(list_filter(
               string_split_regex(lower(text), '\\s+'),
               x -> x <> '')) AS tk
      FROM documents WHERE doc_id % 5 = 0
    ),
    nz AS (SELECT * FROM ts WHERE len(tk) > 0),
    pairs AS (
      SELECT a.doc_id AS u, b.doc_id AS v
      FROM nz a JOIN nz b ON a.doc_id < b.doc_id
      WHERE ROUND(CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
                  / (len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk))),
                  6) >= 0.9
    ),
    deg AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT u AS node FROM pairs UNION ALL SELECT v AS node FROM pairs)
      GROUP BY node
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM pairs e1
      JOIN pairs e2 ON e2.u = e1.v
      JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tcnt AS (
      SELECT node, COUNT(*) AS tri FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b AS node FROM tri
        UNION ALL SELECT c AS node FROM tri)
      GROUP BY node
    )
    SELECT d.doc_id,
           CAST(COALESCE(deg.deg, 0) AS BIGINT) AS deg,
           CAST(COALESCE(tcnt.tri, 0) AS BIGINT) AS tri,
           CASE WHEN COALESCE(deg.deg, 0) >= 2
                THEN ROUND(2.0 * COALESCE(tcnt.tri, 0)
                           / (deg.deg * (deg.deg - 1)), 6)
                ELSE 0.0 END AS lcc
    FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
    LEFT JOIN deg ON deg.node = d.doc_id
    LEFT JOIN tcnt ON tcnt.node = d.doc_id
    """,
)
def q129(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import setsim, triangles

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    edges = setsim.jaccard_set_join(docs, "doc_id", "text", threshold=0.9)
    stats = triangles.node_triangle_stats(
        docs, edges.select("id_a", "id_b"), "doc_id"
    )
    return stats.select(
        F.col("node").alias("doc_id"), "deg", "tri", "lcc"
    )


# =====================================================================
# Weighted sampling without replacement (q130): Efraimidis–Spirakis
# exponential-race keys over the deterministic md5 variate — rank by
# ln(u)/w desc, take the top n. Selection is exactly successive
# weight-proportional draws without replacement, reproducible across
# engines/partitionings (the oracle computes the identical key in
# DuckDB). Plan is TakeOrderedAndProject: per-partition top-n, no
# global sort — the 100 TB shape for "give me 1M docs sampled by
# quality weight".
# =====================================================================
@q(
    "q130_weighted_sample",
    """
    WITH keyed AS (
      SELECT o_orderkey, o_custkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS weight,
             ln((('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':wsr'),
                               1, 8))::BIGINT + 0.5) / 4294967296.0)
               / CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS k
      FROM orders
      WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) > 0
    )
    SELECT o_orderkey, o_custkey, weight,
           CAST(ROW_NUMBER() OVER (ORDER BY k DESC, o_orderkey) AS INT)
             AS wsr_rank
    FROM keyed
    ORDER BY k DESC, o_orderkey
    LIMIT 200
    """,
)
def q130(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        dec("o_totalprice").cast("double").alias("weight"),
    )
    return sampling.weighted_sample_wor(
        orders, "o_orderkey", "weight", n=200, salt="wsr"
    )


# =====================================================================
# Join-delta IVM (q131): maintain orders ⋈ customer under insert-only
# batches without re-joining history. Old state = orders before the
# split date ⋈ customers outside the delta slice; the batch adds late
# orders AND a slice of customers. The maintained view (old view ∪
# delta-rule terms) must equal the full join — which is EXACTLY what
# the oracle computes, so any dropped/duplicated delta term
# hash-mismatches. Per-batch cost is O(batch ⋈ history-matches), not
# O(history ⋈ history): the incremental-marts pattern at 100 TB.
# =====================================================================
@q(
    "q131_join_ivm",
    """
    SELECT o_orderkey, c_custkey, c_name,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
             AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def q131(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.incremental import ivm

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        dec("o_totalprice").cast("double").alias("total_price"),
        "o_orderdate",
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    split = F.lit("1997-01-01").cast("date")
    a_old = orders.filter(F.col("o_orderdate") < split).drop("o_orderdate")
    delta_a = orders.filter(F.col("o_orderdate") >= split).drop("o_orderdate")
    b_old = cust.filter(F.col("c_custkey") % 10 != 0)
    delta_b = cust.filter(F.col("c_custkey") % 10 == 0)
    view = a_old.join(b_old, "c_custkey")
    out = ivm.maintain_join(view, a_old, delta_a, b_old, delta_b, "c_custkey")
    return out.select("o_orderkey", "c_custkey", "c_name", "total_price")


# =====================================================================
# Late-interaction MaxSim retrieval (q132): ColBERT scoring over
# token-level embeddings — docs are 8-vector groups of the embeddings
# table, queries are 4-vector slices (which also live in their "home"
# doc, so rank-1 self-retrieval is a built-in sanity signal). Each
# token-pair cosine rounds to 6 dp before the order-free max; per-doc
# sums run in DECIMAL(18,6), so the full pipeline replays value-exact
# in DuckDB. The no-candidates form is the documented brute baseline;
# the candidates path (ANN over pooled vectors) is the 100 TB route.
# =====================================================================
@q(
    "q132_maxsim_topk",
    """
    WITH base AS (
      -- zero vectors normalize to zero vectors (matches
      -- retrieval.normalize_vec's norm>0 branch; plain division would
      -- give Inf/NaN here vs NULL in Spark)
      SELECT vec_id,
             CASE WHEN sqrt(list_dot_product(embedding::DOUBLE[],
                                             embedding::DOUBLE[])) > 0
                  THEN list_transform(embedding::DOUBLE[],
                    x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                   embedding::DOUBLE[])))
                  ELSE list_transform(embedding::DOUBLE[], x -> 0.0)
             END AS v
      FROM embeddings
    ),
    d AS (SELECT vec_id // 8 AS doc_id, v FROM base),
    qt AS (SELECT vec_id // 40 AS query_id, vec_id AS qtok, v
           FROM base WHERE vec_id % 40 < 4 AND vec_id < 2000),
    mx AS (
      SELECT q.query_id, q.qtok, d.doc_id,
             MAX(ROUND(list_dot_product(q.v, d.v), 6)) AS mxdp
      FROM qt q CROSS JOIN d
      GROUP BY q.query_id, q.qtok, d.doc_id
    ),
    sc AS (
      SELECT query_id, doc_id,
             CAST(SUM(CAST(mxdp AS DECIMAL(18,6))) AS DOUBLE) AS score
      FROM mx GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, score, rnk FROM (
      SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rnk
      FROM sc
    ) WHERE rnk <= 5
    """,
)
def q132(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import retrieval

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    docs = emb.select(
        (F.col("vec_id") / 8).cast("long").alias("doc_id"),
        F.col("embedding").alias("vec"),
    )
    # query set capped at vec_id < 2000 (a no-op at the shipped SFs,
    # where vec_id < 2000 always holds): the ground-truth brute form
    # must keep a FIXED query set as the corpus scales — a query side
    # growing with the data turns the baseline quadratic in corpus
    # size, which is q29's lesson; the candidates path is the scale
    # route either way.
    queries = emb.filter(
        (F.col("vec_id") % 40 < 4) & (F.col("vec_id") < 2000)
    ).select(
        (F.col("vec_id") / 40).cast("long").alias("query_id"),
        F.col("vec_id").alias("qtok"),
        F.col("embedding").alias("vec"),
    )
    return retrieval.maxsim_topk(docs, queries, k=5)


# =====================================================================
# Balanced range bucketing (q133): sampled-exact-quantile boundaries
# (R-7 — Spark percentile == DuckDB quantile_cont) over the
# deterministic md5 sample, then a pure per-row CASE assignment. The
# audit shows per-bucket counts staying near-uniform under
# l_extendedprice's skew — the deterministic twin of what
# repartitionByRange's private RNG sampler does for balanced sorts /
# range-clustered writes. Oracle recomputes sample, boundaries, and
# assignment entirely in SQL.
# =====================================================================
@q(
    "q133_range_buckets",
    """
    WITH v AS (
      SELECT l_orderkey, l_linenumber,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price
      FROM lineitem
    ),
    smp AS (
      SELECT price FROM v
      WHERE (('0x' || substr(md5(CAST(l_orderkey * 10 + l_linenumber
                                      AS VARCHAR) || ':rb'), 1, 8))::BIGINT
             / 4294967296.0) < 0.1
    ),
    b AS (
      SELECT quantile_cont(price,
               [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS bounds
      FROM smp
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(MIN(price), 2) AS min_price,
           ROUND(MAX(price), 2) AS max_price
    FROM (
      SELECT (CASE WHEN price > bounds[1] THEN 1 ELSE 0 END
            + CASE WHEN price > bounds[2] THEN 1 ELSE 0 END
            + CASE WHEN price > bounds[3] THEN 1 ELSE 0 END
            + CASE WHEN price > bounds[4] THEN 1 ELSE 0 END
            + CASE WHEN price > bounds[5] THEN 1 ELSE 0 END
            + CASE WHEN price > bounds[6] THEN 1 ELSE 0 END
            + CASE WHEN price > bounds[7] THEN 1 ELSE 0 END) AS bucket,
             price
      FROM v CROSS JOIN b
    )
    GROUP BY bucket
    """,
)
def q133(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import scaling

    li = t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rk"),
        dec("l_extendedprice").cast("double").alias("price"),
    )
    bucketed, _ = scaling.balanced_range_buckets(
        li, "price", "rk", n_buckets=8, sample_rate=0.1, salt="rb"
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min("price"), 2).alias("min_price"),
        F.round(F.max("price"), 2).alias("max_price"),
    )


# =====================================================================
# Interval union / gaps-and-islands (q134): merge overlapping
# [ts, ts+dur] activity spans per user into maximal disjoint islands
# via the cummax sweep — one shuffle on the key, O(1) window state,
# both window passes sharing a single sort. Complements q30 (point
# sessionize by timeout) with true span-overlap semantics. Integer
# nanosecond arithmetic end-to-end; the oracle replays the sweep with
# the same window frames in DuckDB.
# =====================================================================
@q(
    "q134_interval_union",
    """
    WITH iv AS (
      SELECT user_id,
             epoch_ns(ts) AS s,
             epoch_ns(ts) + (60 + event_id % 240) * 1000000000 AS e
      FROM events
    ),
    m AS (
      SELECT user_id, s, e,
             CASE WHEN max(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  IS NULL
                  OR s > max(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS ni
      FROM iv
    ),
    isl AS (
      SELECT user_id, s, e,
             SUM(ni) OVER (PARTITION BY user_id ORDER BY s, e
                           ROWS UNBOUNDED PRECEDING) AS island
      FROM m
    )
    SELECT user_id,
           MIN(s) AS island_start,
           MAX(e) AS island_end,
           CAST(COUNT(*) AS BIGINT) AS n_spans
    FROM isl GROUP BY user_id, island
    """,
)
def q134(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import intervals

    ev = events_table(spark, sf_dir).select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + (F.lit(60) + F.col("event_id") % 240) * F.lit(1000000000)).alias("e"),
    )
    return intervals.merge_intervals(ev, "user_id", "s", "e").select(
        "user_id",
        F.col("island_start"),
        F.col("island_end"),
        "n_spans",
    )


# =====================================================================
# Distribution drift (q135 PSI, q136 KS): did the order-value
# distribution move between the pre-1998 corpus and the rest? PSI
# buckets the REFERENCE side by its own sampled quantiles (reusing
# the q133 machinery) and compares add-half-smoothed per-bucket mass;
# KS takes max |CDF_a - CDF_b| over every observed value with the
# prefix sums running through the partition-parallel global_cumsum —
# no single-task data-sized window. Both replay value-exact in
# DuckDB.
# =====================================================================
_PSI_BOUNDS_SQL = """
      SELECT quantile_cont(price, [{ps}]) AS bounds
      FROM (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM orders
        WHERE year(o_orderdate) < 1998
          AND (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':psi'),
                               1, 8))::BIGINT / 4294967296.0) < 0.2
      )
""".format(ps=", ".join(str(i / 10) for i in range(1, 10)))

_PSI_BUCKET_SQL = " + ".join(
    f"CASE WHEN price > bounds[{i}] THEN 1 ELSE 0 END" for i in range(1, 10)
)


@q(
    "q135_psi_drift",
    f"""
    WITH b AS ({_PSI_BOUNDS_SQL}),
    ref AS (
      SELECT ({_PSI_BUCKET_SQL}) AS bucket FROM (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM orders WHERE year(o_orderdate) < 1998) CROSS JOIN b
    ),
    cur AS (
      SELECT ({_PSI_BUCKET_SQL}) AS bucket FROM (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM orders WHERE year(o_orderdate) >= 1998) CROSS JOIN b
    ),
    grid AS (SELECT unnest(generate_series(0, 9)) AS bucket),
    cr AS (SELECT bucket, count(*) AS n_ref FROM ref GROUP BY bucket),
    cc AS (SELECT bucket, count(*) AS n_cur FROM cur GROUP BY bucket),
    m AS (
      SELECT g.bucket,
             COALESCE(cr.n_ref, 0) AS n_ref,
             COALESCE(cc.n_cur, 0) AS n_cur
      FROM grid g LEFT JOIN cr USING (bucket) LEFT JOIN cc USING (bucket)
    ),
    t AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc FROM m)
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(n_ref AS BIGINT) AS n_ref,
           CAST(n_cur AS BIGINT) AS n_cur,
           ROUND((n_ref + 0.5) / (tr + 5.0), 6) AS p_ref,
           ROUND((n_cur + 0.5) / (tc + 5.0), 6) AS p_cur,
           ROUND(((n_cur + 0.5) / (tc + 5.0) - (n_ref + 0.5) / (tr + 5.0))
                 * ln(((n_cur + 0.5) / (tc + 5.0))
                      / ((n_ref + 0.5) / (tr + 5.0))), 6) AS contrib
    FROM m CROSS JOIN t
    """,
)
def q135(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import drift

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        dec("o_totalprice").cast("double").alias("price"),
        F.year("o_orderdate").alias("yr"),
    )
    ref = orders.filter(F.col("yr") < 1998)
    cur = orders.filter(F.col("yr") >= 1998)
    return drift.psi_report(
        ref, cur, "price", "o_orderkey", n_buckets=10, sample_rate=0.2,
        salt="psi",
    )


@q(
    "q136_ks_drift",
    """
    WITH a AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS v
      FROM orders WHERE year(o_orderdate) < 1998
    ),
    b AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS v
      FROM orders WHERE year(o_orderdate) >= 1998
    ),
    ca AS (SELECT v, count(*) AS n_a FROM a GROUP BY v),
    cb AS (SELECT v, count(*) AS n_b FROM b GROUP BY v),
    m AS (
      SELECT COALESCE(ca.v, cb.v) AS v,
             COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
      FROM ca FULL OUTER JOIN cb ON ca.v = cb.v
    ),
    c AS (
      SELECT SUM(n_a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_a,
             SUM(n_b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_b
      FROM m
    ),
    t AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM m)
    SELECT CAST(ta AS BIGINT) AS n_a,
           CAST(tb AS BIGINT) AS n_b,
           ROUND(MAX(ABS(cum_a / ta - cum_b / tb)), 6) AS ks
    FROM c CROSS JOIN t GROUP BY ta, tb
    """,
)
def q136(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import drift

    orders = t(spark, sf_dir, "orders").select(
        dec("o_totalprice").cast("double").alias("v"),
        F.year("o_orderdate").alias("yr"),
    )
    return drift.ks_statistic(
        orders.filter(F.col("yr") < 1998).select("v"),
        orders.filter(F.col("yr") >= 1998).select("v"),
        "v",
    )


# =====================================================================
# Snapshot reconciliation (q137): keyed diff of two table versions —
# the "what did the CI run change vs prod" relation the reference's
# copier workflow implies but never materializes (ref SRC/copier.py
# copies tables; this audits the result). One full-outer shuffle on
# the key, all columns compared null-safely in one map-side pass,
# tiny summary aggregate. The synthetic "new" snapshot drops 1-in-97
# keys, bumps total_price for 1-in-13, and adds 1-in-101 under new
# keys; the oracle replays the whole diff with IS NOT DISTINCT FROM.
# =====================================================================
@q(
    "q137_snapshot_diff",
    """
    WITH base AS (
      SELECT o_orderkey, o_custkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
               AS total_price,
             o_orderstatus
      FROM orders
    ),
    newt AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 13 = 0 THEN total_price + 1.0
                  ELSE total_price END AS total_price,
             o_orderstatus
      FROM base WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey, total_price, o_orderstatus
      FROM base WHERE o_orderkey % 101 = 0
    ),
    j AS (
      SELECT o.o_orderkey IS NOT NULL AS in_o,
             n.o_orderkey IS NOT NULL AS in_n,
             NOT (o.o_custkey IS NOT DISTINCT FROM n.o_custkey) AS d_cust,
             NOT (o.total_price IS NOT DISTINCT FROM n.total_price) AS d_price,
             NOT (o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus)
               AS d_status
      FROM base o FULL OUTER JOIN newt n ON o.o_orderkey = n.o_orderkey
    ),
    s AS (
      SELECT CASE WHEN in_o AND NOT in_n THEN 'removed'
                  WHEN in_n AND NOT in_o THEN 'added'
                  WHEN d_cust OR d_price OR d_status THEN 'changed'
                  ELSE 'unchanged' END AS diff_status,
             in_o AND in_n AS both_sides, d_cust, d_price, d_status
      FROM j
    )
    SELECT diff_status, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM s GROUP BY diff_status
    UNION ALL
    SELECT 'col:o_custkey', CAST(COUNT(*) AS BIGINT)
    FROM s WHERE both_sides AND d_cust
    HAVING COUNT(*) > 0
    UNION ALL
    SELECT 'col:total_price', CAST(COUNT(*) AS BIGINT)
    FROM s WHERE both_sides AND d_price
    HAVING COUNT(*) > 0
    UNION ALL
    SELECT 'col:o_orderstatus', CAST(COUNT(*) AS BIGINT)
    FROM s WHERE both_sides AND d_status
    HAVING COUNT(*) > 0
    """,
)
def q137(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import reconcile

    base = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        dec("o_totalprice").cast("double").alias("total_price"),
        "o_orderstatus",
    )
    changed = base.filter(F.col("o_orderkey") % 97 != 0).withColumn(
        "total_price",
        F.when(
            F.col("o_orderkey") % 13 == 0, F.col("total_price") + 1.0
        ).otherwise(F.col("total_price")),
    )
    added = base.filter(F.col("o_orderkey") % 101 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        "o_custkey",
        "total_price",
        "o_orderstatus",
    )
    new = changed.unionByName(added)
    diff = reconcile.snapshot_diff(base, new, "o_orderkey")
    return reconcile.diff_summary(diff)


# =====================================================================
# PMI collocations (q138): Church & Hanks pointwise mutual information
# over adjacent word pairs — one bigram explode (shifted-slice zip),
# two hash aggs, the vocabulary-sized unigram table joined twice
# (AQE-broadcastable), totals inlined as literals. Integer counts all
# the way to one rounded ln. Top-50 by (pmi desc, w1, w2).
# =====================================================================
@q(
    "q138_pmi_collocations",
    r"""
    WITH tk AS (
      SELECT list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    bg AS (
      SELECT unnest(list_transform(
               generate_series(1, greatest(0, len(toks) - 1)),
               i -> [toks[i], toks[i+1]])) AS p
      FROM tk
    ),
    pc AS (
      SELECT p[1] AS w1, p[2] AS w2, count(*) AS n_pair
      FROM bg GROUP BY 1, 2 HAVING count(*) >= 5
    ),
    uc AS (
      SELECT w, count(*) AS n_w
      FROM (SELECT unnest(toks) AS w FROM tk) GROUP BY w
    ),
    tot AS (
      SELECT (SELECT sum(len(toks)) FROM tk) AS n_tok,
             (SELECT sum(greatest(len(toks) - 1, 0)) FROM tk) AS n_bg
    )
    SELECT w1, w2,
           CAST(n_pair AS BIGINT) AS n_pair,
           CAST(u1.n_w AS BIGINT) AS n_w1,
           CAST(u2.n_w AS BIGINT) AS n_w2,
           ROUND(ln((n_pair / n_bg)
                    / ((u1.n_w / n_tok) * (u2.n_w / n_tok))), 6) AS pmi
    FROM pc
    JOIN uc u1 ON u1.w = pc.w1
    JOIN uc u2 ON u2.w = pc.w2
    CROSS JOIN tot
    ORDER BY pmi DESC, w1, w2 LIMIT 50
    """,
)
def q138(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import collocations

    docs = t(spark, sf_dir, "documents")
    return collocations.pmi_collocations(
        docs, "text", min_pair_count=5, top_k=50
    )


# =====================================================================
# Chi-square association audit (q139): is documents.lang independent
# of documents.source? Contingency counts + derived marginals,
# decimal-summed cell terms (order-independent), zero-observed cells
# folded in as n - sum(expected-over-observed) so no dense |A|x|B|
# grid is ever built. One scalar row: chi2 + Cramér's V.
# =====================================================================
@q(
    "q139_chi_square",
    """
    WITH obs AS (
      SELECT COALESCE(lang, '<null>') AS a,
             COALESCE(source, '<null>') AS b,
             count(*) AS o
      FROM documents GROUP BY 1, 2
    ),
    ra AS (SELECT a, sum(o) AS ra FROM obs GROUP BY a),
    cb AS (SELECT b, sum(o) AS cb FROM obs GROUP BY b),
    nn AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM obs),
    cells AS (
      SELECT o, ra.ra * cb.cb / nn.n AS e
      FROM obs JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN nn
    ),
    s AS (
      SELECT SUM(CAST(ROUND((o - e) * (o - e) / e, 10)
                      AS DECIMAL(28,10))) AS sc,
             SUM(CAST(ROUND(e, 10) AS DECIMAL(28,10))) AS se
      FROM cells
    ),
    k AS (SELECT (SELECT count(*) FROM ra) AS n_a,
                 (SELECT count(*) FROM cb) AS n_b)
    SELECT CAST(nn.n AS BIGINT) AS n,
           CAST((k.n_a - 1) * (k.n_b - 1) AS BIGINT) AS df_degrees,
           ROUND(CAST(s.sc AS DOUBLE) + (nn.n - CAST(s.se AS DOUBLE)), 6)
             AS chi2,
           ROUND(sqrt((CAST(s.sc AS DOUBLE) + (nn.n - CAST(s.se AS DOUBLE)))
                      / (nn.n * least(k.n_a - 1, k.n_b - 1))), 6)
             AS cramers_v
    FROM s CROSS JOIN nn CROSS JOIN k
    """,
)
def q139(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import collocations

    docs = t(spark, sf_dir, "documents")
    return collocations.chi_square_association(docs, "lang", "source")


# =====================================================================
# End-to-end entity resolution (q140): fuzzy-match customers by name
# (FastSS deletion-neighborhood blocking, exact for edit distance 1 —
# the q58 pair relation), close the match graph with connected
# components, and keep the min-id survivor per entity cluster — the
# full record-linkage pipeline as ONE composed declarative plan. The
# oracle rebuilds the pairs brute-force and resolves components with
# WITH RECURSIVE min-label reachability (the q52 pattern).
# =====================================================================
@q(
    "q140_entity_resolution",
    """
    WITH RECURSIVE
    n AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
      FROM customer a JOIN customer b
        ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM n
      UNION ALL
      SELECT id_b AS u, id_a AS v FROM n
    ),
    reach(node, label) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.label FROM edges e JOIN reach r ON r.node = e.v
    ),
    comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node)
    SELECT c.c_custkey,
           COALESCE(comp.component, c.c_custkey) AS component,
           (COALESCE(comp.component, c.c_custkey) = c.c_custkey)
             AS is_survivor
    FROM customer c LEFT JOIN comp ON comp.node = c.c_custkey
    """,
)
def q140(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import components as cc
    from dbt_incremental_ci_spark.operators.fuzzy import edit_distance_pairs
    from dbt_incremental_ci_spark.operators.scaling import ensure_min_parallelism

    cust = ensure_min_parallelism(
        t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_name")
    )
    pairs = edit_distance_pairs(
        cust, "c_custkey", "c_name", block_cols=["c_nationkey"]
    )
    return cc.dedup_components(
        cust.select("c_custkey"), pairs.select("id_a", "id_b"), "c_custkey"
    )


# =====================================================================
# Window-function completion (q141): ntile / cume_dist / nth_value —
# the last three ANSI window functions the §2.6 family hadn't
# exercised (row_number/lag/first_value/percent_rank/partition-aggs
# are q10-q15). Ordering is the per-customer unique total order
# (o_orderdate, o_orderkey), so every ranked value is deterministic.
# nth_value needs the full-partition frame in BOTH engines (the
# default frame stops at CURRENT ROW and would return NULL for rows
# before the 2nd).
# =====================================================================
@q(
    "q141_window_completion",
    """
    SELECT o_orderkey, o_custkey,
           CAST(ntile(4) OVER w AS INT) AS spend_quartile,
           ROUND(cume_dist() OVER w, 6) AS cd,
           nth_value(o_orderkey, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q141(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).cast("int").alias("spend_quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_orderkey"),
    )


# =====================================================================
# Referential-integrity audit (q142): the dbt `relationships` /
# `not_null` schema tests (the reference project declares 17 of them)
# as ONE audit relation over the whole star schema — orphan FKs,
# NULL FKs, and never-referenced parents per relationship, via
# anti-joins AQE can broadcast. operators/quality.py.
# =====================================================================
@q(
    "q142_fk_audit",
    """
    SELECT 'orders_customer' AS relationship,
      (SELECT count(*) FROM orders) AS child_rows,
      (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS null_fk,
      (SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL
         AND NOT EXISTS (SELECT 1 FROM customer c
                         WHERE c.c_custkey = o.o_custkey)) AS orphans,
      (SELECT count(*) FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey))
        AS childless_parents
    UNION ALL
    SELECT 'lineitem_orders',
      (SELECT count(*) FROM lineitem),
      (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL),
      (SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
         AND NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_orderkey = l.l_orderkey)),
      (SELECT count(*) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                           WHERE l.l_orderkey = o.o_orderkey))
    UNION ALL
    SELECT 'lineitem_part',
      (SELECT count(*) FROM lineitem),
      (SELECT count(*) FROM lineitem WHERE l_partkey IS NULL),
      (SELECT count(*) FROM lineitem l WHERE l.l_partkey IS NOT NULL
         AND NOT EXISTS (SELECT 1 FROM part p
                         WHERE p.p_partkey = l.l_partkey)),
      (SELECT count(*) FROM part p
         WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                           WHERE l.l_partkey = p.p_partkey))
    UNION ALL
    SELECT 'lineitem_supplier',
      (SELECT count(*) FROM lineitem),
      (SELECT count(*) FROM lineitem WHERE l_suppkey IS NULL),
      (SELECT count(*) FROM lineitem l WHERE l.l_suppkey IS NOT NULL
         AND NOT EXISTS (SELECT 1 FROM supplier s
                         WHERE s.s_suppkey = l.l_suppkey)),
      (SELECT count(*) FROM supplier s
         WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                           WHERE l.l_suppkey = s.s_suppkey))
    """,
)
def q142(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.quality import fk_audit_many

    orders = t(spark, sf_dir, "orders")
    lineitem = t(spark, sf_dir, "lineitem")
    return fk_audit_many(
        [
            (orders, "o_custkey", t(spark, sf_dir, "customer"), "c_custkey",
             "orders_customer"),
            (lineitem, "l_orderkey", orders, "o_orderkey",
             "lineitem_orders"),
            (lineitem, "l_partkey", t(spark, sf_dir, "part"), "p_partkey",
             "lineitem_part"),
            (lineitem, "l_suppkey", t(spark, sf_dir, "supplier"), "s_suppkey",
             "lineitem_supplier"),
        ]
    )


# =====================================================================
# Per-key EWMA (q143): the one ubiquitous sequential statistic a
# window function cannot express (each step MULTIPLIES the
# accumulator) — an ordered in-group fold: sort_array(collect_list)
# + aggregate() in Spark, list(… ORDER BY …) + list_reduce in the
# DuckDB oracle. The fold runs in EXACT decimal arithmetic (values
# quantized to cents, accumulator re-quantized to 10 places each
# step) — a raw double fold differs across engines by an ulp when one
# fuses the multiply-add, and an ulp straddles rounding boundaries.
# operators/timeseries.py:ewma.
# =====================================================================
@q(
    "q143_ewma",
    """
    WITH seq AS (
      SELECT o_custkey,
             list(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                       AS DECIMAL(28,10))
                  ORDER BY o_orderdate, o_orderkey) AS xs
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           CAST(len(xs) AS BIGINT) AS n_obs,
           CAST(xs[-1] AS DOUBLE) AS last_value,
           ROUND(CAST(list_reduce(xs, (acc, x) ->
                   CAST(ROUND(0.300000 * x + 0.700000 * acc, 10)
                        AS DECIMAL(28,10))) AS DOUBLE), 6) AS ewma
    FROM seq
    """,
)
def q143(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import timeseries

    orders = t(spark, sf_dir, "orders")
    out = timeseries.ewma(
        orders, "o_custkey", ["o_orderdate", "o_orderkey"],
        "o_totalprice", alpha=0.3,
    )
    return out.select(
        "o_custkey", "n_obs", "last_value",
        F.round("ewma", 6).alias("ewma"),
    )


# =====================================================================
# Markov transition matrix (q144): P(next event | event) from
# consecutive per-user event pairs — the sequential complement of
# q79's funnel and q30's sessionization. One window shuffle to form
# pairs; the (state, state) aggregate is |states|²-sized regardless
# of data volume. operators/sequences.py.
# =====================================================================
@q(
    "q144_markov_transitions",
    """
    WITH pairs AS (
      SELECT event_type AS from_state,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_state
      FROM events
    ),
    c AS (
      SELECT from_state, to_state, count(*) AS n
      FROM pairs WHERE to_state IS NOT NULL
      GROUP BY from_state, to_state
    )
    SELECT from_state, to_state, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY from_state), 6) AS p
    FROM c
    """,
)
def q144(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.sequences import transition_matrix

    ev = events_table(spark, sf_dir)
    return transition_matrix(ev, "user_id", ["ts", "event_id"], "event_type")


# =====================================================================
# Equi-width histogram (q145): fixed-width bins over the observed
# [min, max] — the equi-WIDTH complement of q133's equi-depth
# buckets. Bin assignment is exact integer arithmetic on decimal(18,2)
# hundredths ((v-lo)*bins div span), so no engine can disagree about
# a boundary value. operators/profiling.py:equi_width_histogram.
# =====================================================================
@q(
    "q145_equi_width_histogram",
    """
    WITH v AS (
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS c
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    b AS (SELECT MIN(c) AS lo, MAX(c) AS hi FROM v),
    binned AS (
      SELECT CAST(CASE WHEN b.hi = b.lo THEN 0
                       ELSE least((v.c - b.lo) * 20 // (b.hi - b.lo), 19)
                  END AS INT) AS bin,
             count(*) AS n
      FROM v CROSS JOIN b GROUP BY 1
    ),
    spine AS (
      SELECT unnest(generate_series(0, 19)) AS bin, b.lo, b.hi FROM b
    )
    SELECT s.bin,
           ROUND(s.lo / 100.0
                 + (s.hi - s.lo) / 100.0 / 20 * s.bin, 6) AS lo,
           ROUND(CASE WHEN s.bin = 19 THEN s.hi / 100.0
                      ELSE s.lo / 100.0
                           + (s.hi - s.lo) / 100.0 / 20 * (s.bin + 1)
                 END, 6) AS hi,
           CAST(COALESCE(n, 0) AS BIGINT) AS n
    FROM spine s LEFT JOIN binned USING (bin)
    """,
)
def q145(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.profiling import (
        equi_width_histogram,
    )

    li = t(spark, sf_dir, "lineitem")
    return equi_width_histogram(li, "l_extendedprice", bins=20)


# =====================================================================
# Multi-source BFS (q146): minimum hop distance from a scattered
# source set through the q24 implicit binary-tree part graph, treated
# UNDIRECTED — distance-to-nearest-source, the graph primitive behind
# dependency depth and k-hop neighborhoods. Frontier expansion with
# an anti-join visited set: rounds = eccentricity, total work O(|E|).
# Oracle: WITH RECURSIVE level exploration + MIN per node.
# operators/bfs.py.
# =====================================================================
@q(
    "q146_bfs_levels",
    """
    WITH RECURSIVE
    e AS (
      SELECT p_partkey AS u, p_partkey // 2 AS v FROM part
      WHERE p_partkey > 1
      UNION ALL
      SELECT p_partkey // 2, p_partkey FROM part WHERE p_partkey > 1
    ),
    walk(node, level) AS (
      SELECT p_partkey, 0 FROM part WHERE p_partkey % 97 = 0
      UNION
      SELECT e.v, w.level + 1 FROM walk w JOIN e ON e.u = w.node
      WHERE w.level < 50
    )
    SELECT node, CAST(MIN(level) AS INT) AS level
    FROM walk GROUP BY node
    """,
)
def q146(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.bfs import bfs_levels
    from dbt_incremental_ci_spark.operators.scaling import (
        ensure_min_parallelism,
    )

    part = ensure_min_parallelism(t(spark, sf_dir, "part"))
    edges = part.where(F.col("p_partkey") > 1).select(
        F.col("p_partkey").alias("src"),
        F.expr("p_partkey div 2").alias("dst"),
    )
    sources = part.where(F.col("p_partkey") % 97 == 0).select(
        F.col("p_partkey").alias("node")
    )
    out = bfs_levels(edges, sources, directed=False)
    return out.select("node", F.col("level").cast("int").alias("level"))


# =====================================================================
# Winnowing fingerprint overlap (q147): rolling-hash document
# fingerprinting (Schleimer et al., SIGMOD'03) — k-gram md5 variates,
# sliding-window minima, distinct fingerprints; pairs sharing >= 2
# rare fingerprints are long-verbatim-overlap candidates. The whole
# derivation is per-row array math (zero shuffle before the postings
# explode); the pair join drops fingerprints with df > 50 (the same
# hot-key cap as the MinHash band join). operators/winnow.py.
# =====================================================================
@q(
    "q147_winnowing_overlap",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    gh AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 4 THEN
               list_transform(range(1, len(t) - 2),
                 i -> ('0x' || substr(md5(array_to_string(t[i:i+3], ' ')
                                          || ':wn'), 1, 8))::BIGINT)
             ELSE []::BIGINT[] END AS g
      FROM toks
    ),
    mins AS (
      SELECT doc_id,
             CASE WHEN len(g) >= 4 THEN
                    list_transform(range(1, len(g) - 2),
                                   i -> list_min(g[i:i+3]))
                  WHEN len(g) >= 1 THEN [list_min(g)]
                  ELSE []::BIGINT[] END AS m
      FROM gh
    ),
    fps AS (
      SELECT DISTINCT doc_id, fp
      FROM mins, LATERAL unnest(list_distinct(m)) AS u(fp)
    ),
    rare AS (
      SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 50
    ),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fps
      FROM fps a JOIN rare USING (fp) JOIN fps b USING (fp)
      WHERE a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, CAST(shared_fps AS BIGINT) AS shared_fps
    FROM pairs WHERE shared_fps >= 2
    """,
)
def q147(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.winnow import (
        fingerprint_overlap_pairs,
    )

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return fingerprint_overlap_pairs(
        docs, k=4, w=4, min_shared=2, max_df=50
    )


# =====================================================================
# Interpolated bigram LM scoring (q148): Jelinek-Mercer-smoothed
# bigram log-probability under the corpus's own LM — the sequence-
# aware upgrade of q104's unigram filter (garbled token ORDER scores
# low even when every token is common). Bigrams from a per-row array
# zip (no positional self-join); three vocabulary-sized joins + a
# 1-row total broadcast; per-term lns round to 8dp and sum in
# DECIMAL(18,8) so the mean is order-independent. operators/text.py.
# =====================================================================
@q(
    "q148_bigram_lm_score",
    """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    big AS (
      SELECT doc_id, t[i] AS prev, t[i+1] AS w
      FROM toks, LATERAL unnest(range(1, len(t))) AS r(i)
      WHERE len(t) >= 2
    ),
    uni AS (
      SELECT tk, count(*) AS c1
      FROM (SELECT unnest(t) AS tk FROM toks) GROUP BY tk
    ),
    tot AS (SELECT sum(c1) AS n FROM uni),
    c2 AS (SELECT prev, w, count(*) AS c2 FROM big GROUP BY prev, w),
    terms AS (
      SELECT b.doc_id,
             ROUND(ln(0.8 * c2.c2 / u1.c1 + 0.2 * u2.c1 / tot.n), 8) AS lp
      FROM big b
      JOIN c2 USING (prev, w)
      JOIN uni u1 ON u1.tk = b.prev
      JOIN uni u2 ON u2.tk = b.w
      CROSS JOIN tot
    ),
    sc AS (
      SELECT doc_id, count(*) AS n_bigrams,
             ROUND(CAST(sum(CAST(lp AS DECIMAL(18,8))) AS DOUBLE)
                   / count(*), 6) AS avg_logprob
      FROM terms GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           sc.avg_logprob,
           sc.avg_logprob >= -3.42 AS lm_keep
    FROM documents d LEFT JOIN sc USING (doc_id)
    """,
)
def q148(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    out = text.bigram_logprob(docs, lam=0.8)
    return out.select(
        "doc_id",
        "n_bigrams",
        "avg_logprob",
        (F.col("avg_logprob") >= -3.42).alias("lm_keep"),
    )


# =====================================================================
# Sequence-pattern matching (q149): MATCH_RECOGNIZE-lite `A (NOT C)* B`
# over per-user event streams — every 'view' paired with its FIRST
# 'purchase' within 6h, vetoed if an 'error' falls strictly between.
# Emits the matched EVENT PAIRS (q79's funnel only counts users).
# Keyed joins + per-A min-struct + left-anti veto; window bound caps
# fan-out per key. operators/patterns.py.
# =====================================================================
@q(
    "q149_event_pattern",
    """
    WITH a AS (
      SELECT user_id, event_id AS a_id, epoch_ns(ts) AS a_ts
      FROM events WHERE event_type = 'view'
    ),
    b AS (
      SELECT user_id, event_id AS b_id, epoch_ns(ts) AS b_ts
      FROM events WHERE event_type = 'purchase'
    ),
    cand AS (
      SELECT a.user_id, a.a_id, a.a_ts, b.b_id, b.b_ts
      FROM a JOIN b USING (user_id)
      WHERE b.b_ts > a.a_ts AND b.b_ts <= a.a_ts + 21600000000000
    ),
    fst AS (
      SELECT user_id, a_id, a_ts, b_id, b_ts
      FROM cand
      QUALIFY row_number() OVER (PARTITION BY a_id ORDER BY b_ts, b_id) = 1
    )
    SELECT f.user_id, f.a_id, f.a_ts, f.b_id, f.b_ts,
           f.b_ts - f.a_ts AS gap
    FROM fst f
    WHERE NOT EXISTS (
      SELECT 1 FROM events c
      WHERE c.event_type = 'error' AND c.user_id = f.user_id
        AND epoch_ns(c.ts) > f.a_ts AND epoch_ns(c.ts) < f.b_ts
    )
    """,
)
def q149(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.patterns import (
        first_match_pattern,
    )

    ev = events_table(spark, sf_dir)
    return first_match_pattern(
        ev, "view", "purchase", within=21_600_000_000_000, veto="error"
    )


# =====================================================================
# k-core decomposition (q150): synchronous parallel peeling (delete
# all degree<k nodes each round) over a mixed hierarchy graph — the
# q146 part tree + grandparent chords + a dense small-key clique, so
# the peel cascades through the hierarchy (8 rounds at sf0.01) and
# leaves a genuine nonempty core. Oracle: the peeling recurrence
# unrolled to a fixed depth (idempotent past the fixpoint, so a
# margin of extra rounds is harmless). operators/kcore.py.
# =====================================================================
def _q150_oracle(k: int = 4, rounds: int = 14) -> str:
    base = """
    WITH base AS (
      SELECT u, v FROM (
        SELECT p_partkey AS u, p_partkey // 2 AS v FROM part WHERE p_partkey > 1
        UNION ALL
        SELECT p_partkey, p_partkey // 4 FROM part WHERE p_partkey > 3
        UNION ALL
        SELECT a.p_partkey, b.p_partkey
        FROM part a JOIN part b ON a.p_partkey < b.p_partkey
        WHERE a.p_partkey <= 12 AND b.p_partkey <= 12
      ) WHERE u <> v
    ),
    e0 AS MATERIALIZED (
      SELECT DISTINCT u, v FROM (
        SELECT u, v FROM base UNION ALL SELECT v, u FROM base
      )
    )"""
    rounds_sql = []
    for r in range(1, rounds + 1):
        p = r - 1
        rounds_sql.append(
            f""",
    k{r} AS MATERIALIZED (SELECT u FROM e{p} GROUP BY u HAVING count(*) >= {k}),
    e{r} AS MATERIALIZED (
      SELECT e.u, e.v FROM e{p} e
      JOIN k{r} ku ON e.u = ku.u
      JOIN k{r} kv ON e.v = kv.u
    )"""
        )
    return (
        base
        + "".join(rounds_sql)
        + f"""
    SELECT u AS node, CAST(count(*) AS BIGINT) AS degree
    FROM e{rounds} GROUP BY u
    """
    )


@q("q150_kcore", _q150_oracle())
def q150(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.kcore import kcore

    p = t(spark, sf_dir, "part").select("p_partkey")
    tree = p.where(F.col("p_partkey") > 1).select(
        F.col("p_partkey").alias("src"), F.expr("p_partkey div 2").alias("dst")
    )
    grand = p.where(F.col("p_partkey") > 3).select(
        F.col("p_partkey").alias("src"), F.expr("p_partkey div 4").alias("dst")
    )
    small = p.where(F.col("p_partkey") <= 12)
    clique = (
        small.select(F.col("p_partkey").alias("src"))
        .crossJoin(small.select(F.col("p_partkey").alias("dst")))
        .where(F.col("src") < F.col("dst"))
    )
    edges = tree.unionByName(grand).unionByName(clique)
    return kcore(edges, k=4)


# =====================================================================
# Binned PR curve (q151): precision/recall/F1 of the hashed-bag
# quality classifier against the lang='en' label at 20 probability
# thresholds — the measurement side of the curation stack. Exact PR
# curves need a data-sized global sort; the binned form is one hash
# agg + an O(bins) spine window (the equi-width-histogram class).
# Bin assignment runs in exact decimal micro-units. evalmetrics.py.
# =====================================================================
def _q151_oracle() -> str:
    from dbt_incremental_ci_spark.operators import classifier

    w = classifier.default_weights(64, "qc")
    score = classifier.linear_score_sql("text", w, 0.0, "qc")
    return f"""
    WITH s AS (
      SELECT ROUND(1.0 / (1.0 + exp(-(ROUND({score}, 6)))), 6) AS prob,
             (lang = 'en') AS y
      FROM documents
    ),
    binned AS (
      SELECT LEAST(CAST((CAST(CAST(prob AS DECIMAL(9,6)) * 1000000 AS BIGINT) * 20
                    - (CAST(CAST(prob AS DECIMAL(9,6)) * 1000000 AS BIGINT) * 20)
                      % 1000000) / 1000000 AS INT), 19) AS bin,
             CAST(y AS INT) AS y
      FROM s
    ),
    per AS (SELECT bin, count(*) AS n, sum(y) AS pos FROM binned GROUP BY bin),
    spine AS (SELECT CAST(i AS INT) AS bin FROM range(20) r(i)),
    fl AS (
      SELECT spine.bin, coalesce(n, 0) AS n, coalesce(pos, 0) AS pos
      FROM spine LEFT JOIN per USING (bin)
    ),
    tot AS (SELECT sum(n) AS n_all, sum(pos) AS pos_all FROM fl),
    cum AS (
      SELECT bin,
             sum(pos) OVER (ORDER BY bin DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
             sum(n) OVER (ORDER BY bin DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - sum(pos) OVER (ORDER BY bin DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp
      FROM fl
    )
    SELECT c.bin, ROUND(c.bin / 20.0, 6) AS threshold,
           CAST(c.tp AS BIGINT) AS tp, CAST(c.fp AS BIGINT) AS fp,
           CAST(t.pos_all - c.tp AS BIGINT) AS fn,
           CAST(t.n_all - c.tp - c.fp - (t.pos_all - c.tp) AS BIGINT) AS tn,
           CASE WHEN c.tp + c.fp > 0
                THEN ROUND(c.tp / (c.tp + c.fp), 6) END AS precision,
           CASE WHEN t.pos_all > 0
                THEN ROUND(c.tp / t.pos_all, 6) END AS recall,
           CASE WHEN 2*c.tp + c.fp + (t.pos_all - c.tp) > 0
                THEN ROUND(2*c.tp / (2*c.tp + c.fp + (t.pos_all - c.tp)), 6)
           END AS f1
    FROM cum c CROSS JOIN tot t
    """


@q("q151_pr_curve", _q151_oracle())
def q151(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import classifier
    from dbt_incremental_ci_spark.operators.evalmetrics import binned_pr_curve

    docs = t(spark, sf_dir, "documents").select("text", "lang")
    raw = F.round(classifier.linear_score("text", classifier.default_weights(64, "qc"), 0.0, "qc"), 6)
    scored = docs.select(
        F.round(classifier.sigmoid(raw), 6).alias("prob"),
        (F.col("lang") == "en").alias("y"),
    )
    return binned_pr_curve(scored, "prob", "y", bins=20)


# =====================================================================
# Cohen's kappa (q152): chance-corrected agreement between two
# curation filters — the classifier's keep flag vs a length rule —
# one map-side-combined 2x2 contingency aggregate, single-row output.
# evalmetrics.py.
# =====================================================================
def _q152_oracle() -> str:
    from dbt_incremental_ci_spark.operators import classifier

    w = classifier.default_weights(64, "qc")
    score = classifier.linear_score_sql("text", w, 0.0, "qc")
    return f"""
    WITH s AS (
      SELECT CAST(ROUND({score}, 6) >= 0.0 AS INT) AS a,
             CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                  x -> x <> '')) >= 50 AS INT) AS b
      FROM documents
    ),
    agg AS (
      SELECT count(*) AS n,
             sum(a * b) AS n11, sum(a * (1 - b)) AS n10,
             sum((1 - a) * b) AS n01, sum((1 - a) * (1 - b)) AS n00
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(n11 AS BIGINT) AS n11,
           CAST(n10 AS BIGINT) AS n10, CAST(n01 AS BIGINT) AS n01,
           CAST(n00 AS BIGINT) AS n00,
           ROUND((n11 + n00) / CAST(n AS DOUBLE), 6) AS po,
           ROUND(((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
                 / (CAST(n AS DOUBLE) * n), 6) AS pe,
           CASE WHEN ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
                     / (CAST(n AS DOUBLE) * n) >= 1.0 THEN 1.0
                ELSE ROUND((((n11 + n00) / CAST(n AS DOUBLE))
                      - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
                        / (CAST(n AS DOUBLE) * n))
                     / (1 - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
                        / (CAST(n AS DOUBLE) * n)), 6)
           END AS kappa
    FROM agg
    """


@q("q152_cohens_kappa", _q152_oracle())
def q152(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import classifier
    from dbt_incremental_ci_spark.operators.evalmetrics import cohens_kappa
    from dbt_incremental_ci_spark.operators.text import token_count

    docs = t(spark, sf_dir, "documents").select("text")
    raw = F.round(classifier.linear_score("text", classifier.default_weights(64, "qc"), 0.0, "qc"), 6)
    rated = docs.select(
        (raw >= 0.0).alias("a"), (token_count("text") >= 50).alias("b")
    )
    return cohens_kappa(rated, "a", "b")


# =====================================================================
# Token-budget data mix (q153): "at most 300 tokens per source" —
# per-category selection in deterministic hash order until the token
# budget is exhausted. The scalable shape is a GLOBAL two-phase
# cumsum over (source, hash) order + O(#sources) broadcast offsets —
# never a per-source window whose frame is data-sized when one
# source dominates. Oracle: the plain per-source window (DuckDB can
# afford it at sf0.01). operators/sampling.py token_budget_mix.
# =====================================================================
@q(
    "q153_token_budget_mix",
    """
    WITH tk AS (
      SELECT doc_id, source,
             len(list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> x <> '')) AS n_tokens,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':tb'), 1, 8))::BIGINT
              / 4294967296.0) AS u
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id)
               AS cum_tokens
      FROM tk
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           cum_tokens <= 300 AS keep
    FROM c
    """,
)
def q153(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.sampling import token_budget_mix
    from dbt_incremental_ci_spark.operators.text import token_count

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "source", token_count("text").alias("n_tokens")
    )
    out = token_budget_mix(docs, "source", "n_tokens", 300, "doc_id")
    return out.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "cum_tokens",
        "keep",
    )


# =====================================================================
# Scalar 8-bit quantization (q154): per-dimension SQ8 — global
# [min,max] per dim (DIM-row aggregate, broadcast back), linear map
# onto {0..255}, dequantized reconstruction + order-independent
# decimal MSE in one pass. Codes serialize to a CSV string for the
# cross-engine hash (array stringification differs between pandas and
# DuckDB). operators/similarity.py scalar_quantize_8bit.
# =====================================================================
@q(
    "q154_sq8_quantization",
    """
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    vals AS (
      SELECT vec_id, i AS pos, v[i] AS val
      FROM base, LATERAL unnest(range(1, len(v) + 1)) AS r(i)
    ),
    dims AS (
      SELECT pos, min(val) AS mn, max(val) AS mx FROM vals GROUP BY pos
    ),
    coded AS (
      SELECT vec_id, pos, val, mn, mx,
             CASE WHEN mx > mn
                  THEN CAST(ROUND((val - mn) * 255.0 / (mx - mn), 0) AS INT)
                  ELSE 0 END AS code
      FROM vals JOIN dims USING (pos)
    ),
    deq AS (
      SELECT vec_id, pos, code,
             val - (CASE WHEN mx > mn
                         THEN mn + code * (mx - mn) / 255.0
                         ELSE mn END) AS err
      FROM coded
    )
    SELECT vec_id,
           array_to_string(list(code ORDER BY pos), ',') AS codes_str,
           ROUND(CAST(sum(CAST(ROUND(err * err, 12) AS DECIMAL(28,12)))
                      AS DOUBLE) / count(*), 9) AS mse
    FROM deq GROUP BY vec_id
    """,
)
def q154(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.similarity import (
        scalar_quantize_8bit,
    )

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    out = scalar_quantize_8bit(emb)
    return out.select(
        "vec_id",
        F.array_join(F.col("codes"), ",").alias("codes_str"),
        "mse",
    )


# =====================================================================
# Semantic decontamination (q155): flag training vectors whose max
# cosine against the EVAL embedding set exceeds a threshold — the
# embedding-space complement of q97's n-gram decontamination (catches
# paraphrased eval leakage that exact n-grams miss). The eval set is
# FIXED-SIZE by definition (vec_id < _Q155_EVAL_BOUND — a benchmark
# suite does not grow with the training corpus; the unbounded %50
# slice of rounds 3/4a made the query quadratic and measured 62x on
# the 10x gate), so total work is |train| × O(1) map-side dots — one
# max per train vector before any shuffle. Dots go through the Arrow
# einsum path (dot_arrow round-6 contract); zero-norm guard matches
# retrieval.normalize_vec. At sf0.01 every vec_id < the bound, so the
# oracle below (same predicate) is value-identical to the old form.
# =====================================================================
@q(
    "q155_semantic_decontam",
    """
    WITH base AS (
      SELECT vec_id,
             CASE WHEN sqrt(list_dot_product(embedding::DOUBLE[],
                                             embedding::DOUBLE[])) > 0
                  THEN list_transform(embedding::DOUBLE[],
                    x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                   embedding::DOUBLE[])))
                  ELSE list_transform(embedding::DOUBLE[], x -> 0.0)
             END AS v
      FROM embeddings
    ),
    ev AS (SELECT vec_id AS eid, v AS evec FROM base
           WHERE vec_id % 50 = 0 AND vec_id < 10000),
    tr AS (SELECT vec_id, v FROM base
           WHERE NOT (vec_id % 50 = 0 AND vec_id < 10000))
    SELECT t.vec_id,
           MAX(ROUND(list_dot_product(t.v, e.evec), 6)) AS max_eval_cos,
           MAX(ROUND(list_dot_product(t.v, e.evec), 6)) >= 0.35
             AS contaminated
    FROM tr t CROSS JOIN ev e
    GROUP BY t.vec_id
    """,
)
def q155(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.retrieval import normalize_vec
    from dbt_incremental_ci_spark.operators.similarity import dot_arrow

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("v")
    )
    n = normalize_vec(emb, "v")
    is_eval = (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 10000)
    ev = n.filter(is_eval).select(F.col("v").alias("evec"))
    tr = n.filter(~is_eval)
    return (
        tr.crossJoin(F.broadcast(ev))
        .withColumn(
            "__c", F.round(dot_arrow()(F.col("v"), F.col("evec")), 6)
        )
        .groupBy("vec_id")
        .agg(F.max("__c").alias("max_eval_cos"))
        .withColumn("contaminated", F.col("max_eval_cos") >= 0.35)
    )


# =====================================================================
# SCD Type-2 history build (q156): compact the event log into validity
# intervals per user — the dbt snapshot materialization's output shape
# (ref: SRC/core.py classifies snapshot models for CI copying), built
# as a timestamp-strategy replay. One shuffle on the key; per-key
# window frames, never data-sized. operators/scd.py.
# =====================================================================
@q(
    "q156_scd2_build",
    """
    WITH e AS (
      SELECT user_id, event_type, epoch_ns(ts) AS tsn, event_id FROM events
    ),
    d AS (
      SELECT user_id, event_type, tsn, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY tsn, event_id) AS prev
      FROM e
    ),
    o AS (
      SELECT user_id, event_type, tsn, event_id FROM d
      WHERE prev IS NULL OR prev IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type, tsn AS valid_from,
           lead(tsn) OVER (PARTITION BY user_id ORDER BY tsn, event_id)
             AS valid_to,
           lead(tsn) OVER (PARTITION BY user_id ORDER BY tsn, event_id)
             IS NULL AS is_current
    FROM o
    """,
)
def q156(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.scd import scd2_from_events

    ev = events_table(spark, sf_dir).select(
        "user_id", "event_type", "ts", "event_id"
    )
    return scd2_from_events(
        ev, "user_id", ["event_type"], "ts", tiebreak_col="event_id"
    )


# =====================================================================
# k-anonymity / l-diversity audit (q157): per quasi-identifier group
# size and sensitive-value diversity — the pre-release privacy gate.
# Single hash aggregate; count_distinct is the two-phase partial
# distinct, so no group materializes members. operators/privacy.py.
# =====================================================================
@q(
    "q157_k_anonymity",
    """
    SELECT c_nationkey,
           CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
           CAST(count(*) AS BIGINT) AS grp_n,
           CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l_distinct,
           count(*) >= 5 AS k_ok,
           count(DISTINCT c_mktsegment) >= 2 AS l_ok
    FROM customer
    GROUP BY 1, 2
    """,
)
def q157(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.privacy import k_anonymity_audit

    c = t(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_bucket"),
        "c_mktsegment",
    )
    return k_anonymity_audit(
        c, ["c_nationkey", "bal_bucket"], "c_mktsegment", k=5, l=2
    )


# =====================================================================
# Typed JSON extraction (q158): from_json with an explicit schema —
# parse once inside codegen, then the struct field behaves like a real
# column (pruned, pushed, aggregated JVM-side). Malformed payloads
# count as parse failures, never silently dropped.
# operators/semistructured.py.
# =====================================================================
@q(
    "q158_json_extract",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN json_valid(props) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_parsed,
           CAST(SUM(CAST(CAST(props->>'k' AS INT) AS DECIMAL(18,2)))
                AS DOUBLE) AS sum_k,
           max(CAST(props->>'k' AS INT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q158(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.semistructured import json_typed

    ev = t(spark, sf_dir, "events").select("event_type", "props")
    typed = json_typed(ev, "props", "k INT")
    return typed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("parse_ok"), 1).otherwise(0)).alias("n_parsed"),
        d(F.sum(dec(F.col("parsed.k")))).alias("sum_k"),
        F.max(F.col("parsed.k")).alias("max_k"),
    )


def _q159_oracle() -> str:
    from dbt_incremental_ci_spark.operators.countmin import (
        _bucket_sql,
        countmin_sketch_sql,
    )

    depth, width = 4, 256
    sketch = countmin_sketch_sql("events", "user_id", depth, width)
    probes = " UNION ALL ".join(
        f"SELECT user_id, {r} AS r, "
        f"{_bucket_sql('user_id', r, width, '')} AS b FROM keys"
        for r in range(depth)
    )
    return f"""
    WITH sketch AS ({sketch}),
    keys AS (SELECT user_id, count(*) AS exact_n FROM events GROUP BY user_id),
    probes AS ({probes}),
    est AS (
      SELECT p.user_id, min(coalesce(s.cnt, 0)) AS cm_est
      FROM probes p LEFT JOIN sketch s ON s.r = p.r AND s.b = p.b
      GROUP BY p.user_id
    )
    SELECT k.user_id, CAST(k.exact_n AS BIGINT) AS exact_n,
           CAST(e.cm_est AS BIGINT) AS cm_est,
           CAST(e.cm_est - k.exact_n AS BIGINT) AS overcount
    FROM keys k JOIN est e USING (user_id)
    """


# =====================================================================
# Count-min sketch (q159): mergeable d×w frequency sketch, one-sided
# error (est >= exact, checked per key in the output). Build shuffles
# at most d·w cells per partition (map-side combine); estimates are a
# broadcast join of the tiny sketch. operators/countmin.py.
# =====================================================================
@q("q159_countmin", _q159_oracle())
def q159(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import countmin

    depth, width = 4, 256
    ev = t(spark, sf_dir, "events").select("user_id")
    sk = countmin.countmin_build(ev, "user_id", depth=depth, width=width)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    est = countmin.countmin_estimate(
        sk, exact.select("user_id"), "user_id", depth=depth, width=width
    )
    return exact.join(est, on="user_id").select(
        "user_id",
        "exact_n",
        "cm_est",
        (F.col("cm_est") - F.col("exact_n")).alias("overcount"),
    )


def _q160_oracle() -> str:
    import math

    wa1, wd1 = math.log2(0.9 / 0.001), math.log2(0.1 / 0.999)
    wa2, wd2 = math.log2(0.8 / 0.1), math.log2(0.2 / 0.9)
    w = (
        f"(CASE WHEN agree_suffix THEN {wa1!r} ELSE {wd1!r} END) + "
        f"(CASE WHEN agree_bal THEN {wa2!r} ELSE {wd2!r} END)"
    )
    return f"""
    WITH p AS (
      SELECT c_custkey, s_suppkey,
             substr(c_name, length(c_name) - 2, 3)
               = substr(s_name, length(s_name) - 2, 3) AS agree_suffix,
             floor(c_acctbal / 1000) = floor(s_acctbal / 1000) AS agree_bal
      FROM customer JOIN supplier
        ON c_nationkey = s_nationkey
       AND substr(c_name, length(c_name) - 2, 3)
             = substr(s_name, length(s_name) - 2, 3)
    ),
    s AS (
      SELECT c_custkey, s_suppkey, agree_suffix, agree_bal,
             ROUND({w}, 6) AS fs_weight
      FROM p
    )
    SELECT *,
           CASE WHEN fs_weight >= 5.0 THEN 'link'
                WHEN fs_weight <= -2.0 THEN 'non_link'
                ELSE 'possible' END AS decision
    FROM s
    WHERE fs_weight >= 5.0
    """


# =====================================================================
# Fellegi-Sunter record linkage (q160): blocked candidate pairs,
# per-field agreement flags, summed log2(m/u) match weights, link
# decision. The m/u weights fold to compile-time literals, so scoring
# is one codegen'd expression over the pair frame. Blocking is the
# scale knob (operators/linkage.py): with these weights the link band
# (fs_weight >= 5.0) is EXACTLY the suffix-agreeing pairs (max
# non-suffix weight = wd1+wa2 = -0.32), so blocking on
# (nationkey, 3-char name suffix) generates every link candidate with
# ZERO false negatives while keeping pair volume ~|C|·|S|/(25·1000) —
# linear at scale. The round-3/4a form blocked on nationkey alone and
# emitted the 'possible' band, whose size is Θ(|C|·|S|) by definition
# (measured 43x on the 10x gate): a pair-quadratic OUTPUT cannot
# scale, so the query emits confirmed links and the review band stays
# behind the blocking knob. operators/linkage.py.
# =====================================================================
@q("q160_fs_linkage", _q160_oracle())
def q160(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import linkage

    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.col("c_nationkey").alias("nationkey"),
        "c_acctbal",
        F.col("c_name").substr(F.length("c_name") - 2, F.lit(3)).alias("sfx"),
    )
    s = t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        F.col("s_nationkey").alias("nationkey"),
        "s_acctbal",
        F.col("s_name").substr(F.length("s_name") - 2, F.lit(3)).alias("sfx"),
    )
    pairs = linkage.block_pairs(c, s, ["nationkey", "sfx"])
    suffix = F.col("c_name").substr(
        F.length("c_name") - 2, F.lit(3)
    ) == F.col("s_name").substr(F.length("s_name") - 2, F.lit(3))
    bal = F.floor(F.col("c_acctbal") / 1000) == F.floor(
        F.col("s_acctbal") / 1000
    )
    scored = linkage.fs_score(
        pairs,
        {"suffix": (suffix, 0.9, 0.001), "bal": (bal, 0.8, 0.1)},
    )
    out = linkage.classify(scored, upper=5.0, lower=-2.0)
    return out.filter(F.col("fs_weight") >= 5.0).select(
        "c_custkey",
        "s_suppkey",
        "agree_suffix",
        "agree_bal",
        "fs_weight",
        "decision",
    )


def _q161_oracle() -> str:
    from dbt_incremental_ci_spark.operators.privacy import dp_group_counts_sql

    return dp_group_counts_sql("customer", ["c_mktsegment"], epsilon=1.0)


# =====================================================================
# Differentially-private release (q161): Laplace-noised group counts,
# seed = md5(group key) so the release is reproducible (and exactly
# twinned in the oracle). The exact count never leaves the aggregate —
# only the noised value is emitted, as a DP release requires.
# operators/privacy.py.
# =====================================================================
@q("q161_dp_counts", _q161_oracle())
def q161(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.privacy import dp_group_counts

    c = t(spark, sf_dir, "customer")
    return dp_group_counts(c, ["c_mktsegment"], epsilon=1.0)


def _q162_oracle() -> str:
    bits, top = 8, 255
    sx = "CAST(least(greatest(floor((CAST(x AS DOUBLE) - 0.0) / 255.0 * 255), 0), 255) AS BIGINT)"
    sy = "CAST(least(greatest(floor((CAST(y AS DOUBLE) - 0.0) / 255.0 * 255), 0), 255) AS BIGINT)"
    terms = []
    for i in range(bits):
        terms.append(f"(((sx >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"(((sy >> {i}) & 1) * {1 << (2 * i + 1)})")
    z = " + ".join(terms)
    return f"""
    WITH base AS (
      SELECT o_orderkey,
             o_custkey % 256 AS x,
             date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
               % 256 AS y
      FROM orders
    ),
    scaled AS (
      SELECT o_orderkey, x, y, {sx} AS sx, {sy} AS sy FROM base
    )
    SELECT o_orderkey, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
           CAST({z} AS BIGINT) AS zkey,
           CAST(({z}) >> 10 AS BIGINT) AS zbucket
    FROM scaled
    """


# =====================================================================
# Z-order clustering key (q162): Morton-interleave two predicate
# columns so range-partitioned files cover tight hyper-boxes on BOTH —
# parquet min/max stats then prune scans for predicates on either
# column (the write-side data-skipping story, sinks/layout.py
# write_zordered). The key is a pure codegen expression; the oracle
# reproduces the interleave arithmetically. sinks/layout.py:97.
# =====================================================================
@q("q162_zorder_key", _q162_oracle())
def q162(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.sinks.layout import zorder_key

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 256).alias("x"),
        (
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1992-01-01").cast("date"),
            )
            % 256
        ).cast("bigint").alias("y"),
    )
    zk = zorder_key(o, ["x", "y"], bounds={"x": (0, 255), "y": (0, 255)}, bits=8)
    return o.select(
        "o_orderkey",
        F.col("x").cast("bigint").alias("x"),
        "y",
        zk.alias("zkey"),
        F.shiftright(zk, 10).cast("bigint").alias("zbucket"),
    )


# =====================================================================
# CDC changelog apply (q163): reduce an ordered upsert/delete stream
# to its latest surviving state — one max(struct) hash aggregate
# (argmax by sequence with deterministic tiebreak), shuffled bytes
# O(|keys|) not O(|changelog|), no window sort. Deletes (here: a key
# whose last event is an 'error') drop the key. operators/cdc.py.
# =====================================================================
@q(
    "q163_cdc_apply",
    """
    WITH e AS (
      SELECT user_id, epoch_ns(ts) AS ts, event_id, event_type, value,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      FROM events
    ),
    w AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM e
    )
    SELECT user_id, ts, event_id, event_type, value, op
    FROM w WHERE rn = 1 AND op <> 'D'
    """,
)
def q163(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.cdc import cdc_latest_state

    ev = events_table(spark, sf_dir).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    return cdc_latest_state(
        ev, ["user_id"], "ts", "op", delete_op="D", tiebreak_col="event_id"
    )


def _q164_oracle() -> str:
    from dbt_incremental_ci_spark.operators.sampling import (
        neyman_stratified_sample_sql,
    )

    return neyman_stratified_sample_sql(
        "events",
        "t.event_id",
        "event_type",
        "value",
        2000,
        "t.event_id, t.event_type, t.value",
    )


# =====================================================================
# Neyman stratified sampling (q164): allocate a fixed sample budget
# across strata ∝ N_h·S_h (variance-optimal for the stratified mean).
# Strata stats come from one exact-decimal aggregate so the derived
# rates are bit-identical across engines; membership is the usual
# md5-hash filter — input never shuffles. operators/sampling.py
# neyman_stratified_sample.
# =====================================================================
@q("q164_neyman_sample", _q164_oracle())
def q164(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.sampling import (
        neyman_stratified_sample,
    )

    ev = events_table(spark, sf_dir).select("event_id", "event_type", "value")
    out = neyman_stratified_sample(
        ev, "event_id", "event_type", "value", n_target=2000
    )
    return out.select("event_id", "event_type", "value", "sample_rate")


def _q165_oracle() -> str:
    from dbt_incremental_ci_spark.operators import classifier

    w = classifier.default_weights(64, "qc")
    score = classifier.linear_score_sql("text", w, 0.0, "qc")
    return f"""
    WITH s AS (
      SELECT ROUND({score}, 6) AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    g AS (SELECT score, count(*) AS cnt, sum(y) AS pos FROM s GROUP BY score),
    c AS (SELECT *, sum(cnt) OVER (ORDER BY score) AS cum FROM g),
    t AS (
      SELECT sum(cnt) AS n, sum(pos) AS n_pos,
             CAST(sum(CAST(pos * (2 * (cum - cnt) + cnt + 1)
                           AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
      FROM c
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
           CAST(n - n_pos AS BIGINT) AS n_neg,
           ROUND((CAST(s2 AS DOUBLE) - CAST(n_pos * (n_pos + 1) AS DOUBLE))
                 / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n - n_pos AS DOUBLE)),
                 9) AS auc
    FROM t
    """


# =====================================================================
# Exact ROC-AUC (q165): Mann-Whitney rank-sum with tie-averaged ranks
# over the quality-classifier score, label = lang='en'. Rank
# arithmetic stays integer (2·avg_rank), summed as decimal — one float
# division total, so the metric is engine-exact; cumulative ranks come
# from the two-phase global_cumsum, never a single-task window.
# operators/evalmetrics.py roc_auc.
# =====================================================================
@q("q165_roc_auc", _q165_oracle())
def q165(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import classifier
    from dbt_incremental_ci_spark.operators.evalmetrics import roc_auc

    docs = t(spark, sf_dir, "documents").select("text", "lang")
    scored = docs.select(
        F.round(
            classifier.linear_score(
                "text", classifier.default_weights(64, "qc"), 0.0, "qc"
            ),
            6,
        ).alias("score"),
        (F.col("lang") == "en").alias("y"),
    )
    return roc_auc(scored, "score", "y")


# =====================================================================
# Volume anomaly monitor (q166): per event-type hourly counts
# z-scored against that type's own mean/std across observed hours —
# integer count sums are exact, so mean/std/z reproduce bit-for-bit.
# Two hash aggregates + one keys-sized join (AQE-broadcastable).
# operators/timeseries.py count_anomaly_zscore.
# =====================================================================
@q(
    "q166_count_anomaly",
    """
    WITH e AS (
      SELECT event_type,
             epoch_ns(ts) // 3600000000000 AS bucket
      FROM events
    ),
    per AS (
      SELECT event_type, bucket, count(*) AS cnt
      FROM e GROUP BY event_type, bucket
    ),
    st AS (
      SELECT event_type, count(*) AS nb, sum(cnt) AS s1,
             sum(cnt * cnt) AS s2
      FROM per GROUP BY event_type
    ),
    j AS (
      SELECT p.event_type, p.bucket, p.cnt,
             CAST(s1 AS DOUBLE) / CAST(nb AS DOUBLE) AS mean_c,
             CASE WHEN nb > 1
                  THEN sqrt(greatest((CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                           / CAST(nb AS DOUBLE))
                         / (CAST(nb AS DOUBLE) - 1.0), 0.0))
                  ELSE 0.0 END AS std_c
      FROM per p JOIN st USING (event_type)
    )
    SELECT event_type, bucket, CAST(cnt AS BIGINT) AS cnt,
           ROUND(mean_c, 6) AS mean_cnt,
           ROUND(std_c, 6) AS std_cnt,
           ROUND(CASE WHEN std_c > 0
                      THEN (CAST(cnt AS DOUBLE) - mean_c) / std_c
                      ELSE 0.0 END, 6) AS z,
           abs(CASE WHEN std_c > 0
                    THEN (CAST(cnt AS DOUBLE) - mean_c) / std_c
                    ELSE 0.0 END) >= 2.0 AS is_anomaly
    FROM j
    """,
)
def q166(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.timeseries import (
        count_anomaly_zscore,
    )

    ev = events_table(spark, sf_dir).select(
        "event_type",
        # integer div: ns timestamps exceed 2^53, double division here
        # would be lossy at bucket boundaries
        F.expr("ts div 3600000000000").alias("bucket"),
    )
    out = count_anomaly_zscore(ev, ["event_type"], "bucket", z_thresh=2.0)
    return out


# =====================================================================
# Aggregate-delta IVM (q167): maintain a grouped count/sum view under
# a mixed insert/retract batch without rescanning the base — one
# batch-sized delta aggregate + one full-outer key join (classic
# count-algebra; groups retracted to zero support vanish). Oracle
# recomputes the effective relation directly. incremental/ivm.py
# agg_delta_apply.
# =====================================================================
@q(
    "q167_agg_ivm",
    """
    WITH base AS (
      SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
    ),
    eff AS (
      SELECT * FROM base WHERE o_orderkey % 17 <> 0
      UNION ALL
      SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_total
    FROM eff GROUP BY o_orderstatus
    """,
)
def q167(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.incremental.ivm import agg_delta_apply

    o = t(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("timestamp_ntz")
    base = o.filter(F.col("o_orderdate") < cutoff)
    view = base.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(dec("o_totalprice")).alias("sum_o_totalprice"),
    )
    dels = base.filter(F.col("o_orderkey") % 17 == 0).withColumn(
        "op", F.lit("D")
    )
    ins = o.filter(F.col("o_orderdate") >= cutoff).withColumn(
        "op", F.lit("I")
    )
    delta = dels.unionByName(ins)
    out = agg_delta_apply(
        view,
        delta,
        ["o_orderstatus"],
        count_col="cnt",
        sum_cols=["o_totalprice"],
        op_col="op",
    )
    return out.select(
        "o_orderstatus",
        F.col("cnt").cast("bigint").alias("cnt"),
        d(F.col("sum_o_totalprice")).alias("sum_total"),
    )


def _q168_oracle() -> str:
    from dbt_incremental_ci_spark.operators.sampling import hash_uniform_sql

    u = hash_uniform_sql("user_id", "ab")
    return f"""
    WITH units AS (
      SELECT user_id,
             CASE WHEN {u} < 0.5 THEN 'A' ELSE 'B' END AS variant,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
               AS converted
      FROM events GROUP BY user_id
    ),
    wide AS (
      SELECT sum(CASE WHEN variant = 'A' THEN 1 END) AS n_a,
             sum(CASE WHEN variant = 'A' AND converted THEN 1 ELSE 0 END)
               AS c_a,
             sum(CASE WHEN variant = 'B' THEN 1 END) AS n_b,
             sum(CASE WHEN variant = 'B' AND converted THEN 1 ELSE 0 END)
               AS c_b
      FROM units
    ),
    calc AS (
      SELECT *,
             CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
             CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
             (CAST(c_a AS DOUBLE) + CAST(c_b AS DOUBLE))
               / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS pool
      FROM wide
    ),
    zc AS (
      SELECT *,
             sqrt(pool * (1.0 - pool)
                  * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
               AS se
      FROM calc
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(c_a AS BIGINT) AS c_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(c_b AS BIGINT) AS c_b,
           ROUND(pa, 6) AS rate_a, ROUND(pb, 6) AS rate_b,
           ROUND(pa - pb, 6) AS lift,
           ROUND(CASE WHEN se > 0 THEN (pa - pb) / se ELSE 0.0 END, 6) AS z,
           abs(CASE WHEN se > 0 THEN (pa - pb) / se ELSE 0.0 END)
             >= 1.959963984540054 AS significant
    FROM zc
    """


# =====================================================================
# A/B experiment readout (q168): deterministic hash assignment of
# users to variants, unit-level conversion (any purchase), pooled
# two-proportion z-test. Unit aggregate + 1-row pivot; the statistic
# is a fixed double expression over exact integer counts.
# operators/evalmetrics.py two_proportion_ztest.
# =====================================================================
@q("q168_ab_test", _q168_oracle())
def q168(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.evalmetrics import (
        two_proportion_ztest,
    )
    from dbt_incremental_ci_spark.operators.sampling import hash_uniform

    units = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            (
                F.max(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                == 1
            ).alias("converted")
        )
        .select(
            F.when(hash_uniform("user_id", "ab") < 0.5, F.lit("A"))
            .otherwise(F.lit("B"))
            .alias("variant"),
            "converted",
        )
    )
    return two_proportion_ztest(units, "variant", "converted")


# =====================================================================
# Eval-set n-gram coverage (q169): fraction of each eval doc's
# distinct trigrams present anywhere in the training corpus — the
# recall-side complement of q97's leakage check (low coverage = the
# corpus never discusses the benchmark's domain). Hash-keyed explode +
# distinct corpus set + one left join; 8-byte join keys.
# operators/decontam.py eval_coverage.
# =====================================================================
@q(
    "q169_eval_coverage",
    """
    WITH evals AS (SELECT doc_id, text FROM documents
                   WHERE doc_id % 97 = 0 AND doc_id < 10000),
    corp AS (SELECT doc_id, text FROM documents
             WHERE NOT (doc_id % 97 = 0 AND doc_id < 10000)),
    eng AS (
      SELECT DISTINCT doc_id, ng FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, greatest(0, len(toks) - 2)),
                 i -> array_to_string(toks[i:i+2], ' '))) AS ng
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(trim(text), '\\s+'),
                                 x -> x <> '') AS toks
              FROM evals))
    ),
    cng AS (
      SELECT DISTINCT ng FROM (
        SELECT unnest(list_transform(
                 generate_series(1, greatest(0, len(toks) - 2)),
                 i -> array_to_string(toks[i:i+2], ' '))) AS ng
        FROM (SELECT list_filter(string_split_regex(trim(text), '\\s+'),
                                 x -> x <> '') AS toks
              FROM corp))
    )
    SELECT e.doc_id,
           CAST(count(*) AS BIGINT) AS n_eval_ngrams,
           CAST(sum(CASE WHEN c.ng IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_covered,
           ROUND(sum(CASE WHEN c.ng IS NOT NULL THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS coverage
    FROM eng e LEFT JOIN cng c USING (ng)
    GROUP BY e.doc_id
    """,
)
def q169(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.decontam import eval_coverage

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    # fixed-bound eval slice: benchmark suites do not grow with the
    # corpus (the q97/q155 scale rule)
    is_eval = (F.col("doc_id") % 97 == 0) & (F.col("doc_id") < 10000)
    evals = docs.filter(is_eval)
    corpus = docs.filter(~is_eval)
    return eval_coverage(corpus, evals, n=3)


# =====================================================================
# Reciprocal Rank Fusion (q170): fuse two per-nation supplier
# rankings — balance-sheet rank and exact-decimal revenue rank — with
# RRF 1/(60+r) scoring (Cormack et al. SIGIR'09), the hybrid-retrieval
# combiner (BM25 + dense) applied to the warehouse. Each run reduces
# to one row per supplier before the key-only full-outer fuse;
# suppliers absent from a run contribute nothing.
# operators/retrieval.py rrf_fuse.
# =====================================================================
@q(
    "q170_rrf_fusion",
    """
    WITH a AS (
      SELECT s_nationkey, s_suppkey,
             row_number() OVER (PARTITION BY s_nationkey
                                ORDER BY s_acctbal DESC, s_suppkey)
               AS rank_bal
      FROM supplier
    ),
    rv AS (
      SELECT s.s_nationkey, l.l_suppkey AS s_suppkey,
             sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS rev
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY s.s_nationkey, l.l_suppkey
    ),
    b AS (
      SELECT s_nationkey, s_suppkey,
             row_number() OVER (PARTITION BY s_nationkey
                                ORDER BY rev DESC, s_suppkey) AS rank_rev
      FROM rv
    )
    SELECT s_nationkey, s_suppkey, a.rank_bal, b.rank_rev,
           ROUND(coalesce(1.0 / (60 + a.rank_bal), 0)
                 + coalesce(1.0 / (60 + b.rank_rev), 0), 9) AS rrf_score
    FROM a FULL OUTER JOIN b USING (s_nationkey, s_suppkey)
    """,
)
def q170(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from dbt_incremental_ci_spark.operators.retrieval import rrf_fuse

    s = t(spark, sf_dir, "supplier").select(
        "s_nationkey", "s_suppkey", "s_acctbal"
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    wa = Window.partitionBy("s_nationkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    run_a = s.select(
        "s_nationkey",
        "s_suppkey",
        F.row_number().over(wa).alias("rank_bal"),
    )
    rv = (
        li.join(s.select("s_suppkey", "s_nationkey"),
                li["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(
                dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
            ).alias("__rev")
        )
        .select(
            "s_nationkey", F.col("l_suppkey").alias("s_suppkey"), "__rev"
        )
    )
    wb = Window.partitionBy("s_nationkey").orderBy(
        F.desc("__rev"), F.asc("s_suppkey")
    )
    run_b = rv.select(
        "s_nationkey",
        "s_suppkey",
        F.row_number().over(wb).alias("rank_rev"),
    )
    return rrf_fuse(
        [run_a, run_b],
        ["s_nationkey", "s_suppkey"],
        ["rank_bal", "rank_rev"],
        k=60,
    )


def _q171_oracle() -> str:
    from dbt_incremental_ci_spark.operators.hll import hll_cardinality_sql

    return hll_cardinality_sql(
        "FROM (SELECT unnest(list_filter("
        "string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS tok"
        " FROM documents) u",
        "tok",
        m=128,
        salt="vocab",
    )


# =====================================================================
# HLL vocabulary cardinality (q171): HyperLogLog distinct-token
# estimate over the corpus vocabulary, self-graded against the exact
# distinct — the mergeable-sketch answer to "how big is the vocab"
# that reduces map-side to 128 registers per partition at any scale
# (the built-in approx_count_distinct is HLL++ but JVM-private, hence
# un-oracle-able; this sketch replays bit-for-bit in DuckDB).
# operators/hll.py.
# =====================================================================
@q("q171_hll_vocab", _q171_oracle())
def q171(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.hll import hll_cardinality

    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("token")
    )
    return hll_cardinality(toks, "token", m=128, salt="vocab")


def _q172_oracle() -> str:
    from dbt_incremental_ci_spark.operators import classifier

    w = classifier.default_weights(64, "qc")
    score = classifier.linear_score_sql("text", w, 0.0, "qc")
    return f"""
    WITH s AS (
      SELECT ROUND(1.0 / (1.0 + exp(-(ROUND({score}, 6)))), 6) AS prob,
             (lang = 'en') AS y
      FROM documents
    ),
    m AS (
      SELECT CAST(CAST(prob AS DECIMAL(9,6)) * 1000000 AS BIGINT) AS mi,
             CAST(y AS INT) AS y
      FROM s
    ),
    binned AS (
      SELECT LEAST(CAST((mi * 10 - (mi * 10) % 1000000) / 1000000 AS INT),
                   9) AS bin,
             mi, y
      FROM m
    ),
    per AS (
      SELECT bin, count(*) AS n, sum(mi) AS smi, sum(y) AS pos
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT sum(n) AS n_all FROM per),
    spine AS (SELECT CAST(i AS INT) AS bin FROM range(10) r(i)),
    fl AS (
      SELECT spine.bin, coalesce(n, 0) AS n, smi, coalesce(pos, 0) AS pos
      FROM spine LEFT JOIN per USING (bin)
    )
    SELECT fl.bin, ROUND(fl.bin / 10.0, 6) AS bin_lo,
           CAST(n AS BIGINT) AS n,
           CASE WHEN n > 0
                THEN ROUND(smi / (n * 1000000.0), 6) END AS mean_prob,
           CASE WHEN n > 0
                THEN ROUND(pos / CAST(n AS DOUBLE), 6) END AS pos_rate,
           CASE WHEN n > 0
                THEN ROUND(abs(ROUND(smi / (n * 1000000.0), 6)
                               - ROUND(pos / CAST(n AS DOUBLE), 6)), 6)
           END AS gap,
           CASE WHEN n > 0
                THEN ROUND(ROUND(abs(ROUND(smi / (n * 1000000.0), 6)
                                     - ROUND(pos / CAST(n AS DOUBLE), 6)), 6)
                           * n / t.n_all, 9)
                ELSE 0.0 END AS ece_term
    FROM fl CROSS JOIN tot t
    """


# =====================================================================
# Calibration / reliability bins (q172): is the quality classifier's
# probability honest? Equal-width probability bins over the q151
# scored frame; per-bin mean predicted probability (EXACT micro-unit
# integer sum, one division), observed positive rate, and weighted
# ECE terms (Naeini et al. 2015). One hash aggregate + O(bins) spine.
# operators/evalmetrics.py calibration_bins.
# =====================================================================
@q("q172_calibration", _q172_oracle())
def q172(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import classifier
    from dbt_incremental_ci_spark.operators.evalmetrics import (
        calibration_bins,
    )

    docs = t(spark, sf_dir, "documents").select("text", "lang")
    raw = F.round(
        classifier.linear_score(
            "text", classifier.default_weights(64, "qc"), 0.0, "qc"
        ),
        6,
    )
    scored = docs.select(
        F.round(classifier.sigmoid(raw), 6).alias("prob"),
        (F.col("lang") == "en").alias("y"),
    )
    return calibration_bins(scored, "prob", "y", bins=10)


# =====================================================================
# Sequential funnel (q173): users reaching view -> click -> purchase,
# each step strictly after the previous step's first qualifying time —
# the product-analytics staple, as len(steps) linear min-aggregates
# + user-keyed joins (the frame shrinks every step); rate pass runs
# on a 3-row frame. Complements q149 (single A->B pattern with a veto
# event). operators/patterns.py funnel_counts.
# =====================================================================
@q(
    "q173_funnel",
    """
    WITH e AS (
      SELECT user_id, event_type, epoch_ns(ts) AS tsn FROM events
    ),
    s0 AS (
      SELECT user_id, min(tsn) AS t FROM e
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s1 AS (
      SELECT e.user_id, min(e.tsn) AS t
      FROM e JOIN s0 ON e.user_id = s0.user_id AND e.tsn > s0.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.tsn) AS t
      FROM e JOIN s1 ON e.user_id = s1.user_id AND e.tsn > s1.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    c AS (
      SELECT 0 AS step_idx, 'view' AS step, count(*) AS users FROM s0
      UNION ALL SELECT 1, 'click', count(*) FROM s1
      UNION ALL SELECT 2, 'purchase', count(*) FROM s2
    )
    SELECT CAST(step_idx AS INT) AS step_idx, step,
           CAST(users AS BIGINT) AS users,
           CASE WHEN lag(users) OVER (ORDER BY step_idx) > 0
                THEN ROUND(users / CAST(lag(users) OVER (ORDER BY step_idx)
                                        AS DOUBLE), 6)
           END AS conv_from_prev,
           CASE WHEN step_idx > 0
                     AND first_value(users) OVER (ORDER BY step_idx) > 0
                THEN ROUND(users
                           / CAST(first_value(users) OVER (ORDER BY step_idx)
                                  AS DOUBLE), 6)
           END AS conv_from_first
    FROM c
    """,
)
def q173(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.patterns import funnel_counts

    ev = events_table(spark, sf_dir).select("user_id", "ts", "event_type")
    return funnel_counts(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )


def _q174_oracle() -> str:
    from dbt_incremental_ci_spark.operators.hll import hll_cardinality_sql

    inner = hll_cardinality_sql(
        "FROM (SELECT unnest(list_filter("
        "string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS tok"
        " FROM documents) u",
        "tok",
        m=64,
        salt="vocab2",
    )
    return f"SELECT m, n_active, estimate FROM ({inner}) full_sketch"


# =====================================================================
# Incremental HLL state maintenance (q174): the corpus is sketched in
# two shards (stored state + new batch), the register frames merged by
# max-per-bucket, and the estimator applied to the MERGED state — the
# streaming/incremental path that never rescans history. The oracle
# sketches the FULL corpus directly: mergeability says the two answers
# are IDENTICAL (not approximately — register-exact), so the value
# match is itself the proof of the merge contract. operators/hll.py
# hll_registers / hll_merge / hll_estimate.
# =====================================================================
@q("q174_hll_merge", _q174_oracle())
def q174(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.hll import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("token"),
    )
    state = hll_registers(
        toks.filter(F.col("doc_id") % 5 != 0), "token", m=64, salt="vocab2"
    )
    batch = hll_registers(
        toks.filter(F.col("doc_id") % 5 == 0), "token", m=64, salt="vocab2"
    )
    return hll_estimate(hll_merge(state, batch), m=64)


def _q175_oracle() -> str:
    return """
    WITH base AS (
      SELECT vec_id,
             CASE WHEN sqrt(list_dot_product(embedding::DOUBLE[],
                                             embedding::DOUBLE[])) > 0
                  THEN list_transform(embedding::DOUBLE[],
                    x -> x / sqrt(list_dot_product(embedding::DOUBLE[],
                                                   embedding::DOUBLE[])))
                  ELSE list_transform(embedding::DOUBLE[], x -> 0.0)
             END AS v
      FROM embeddings
    ),
    anch AS (
      SELECT vec_id AS anchor_id, v AS av, vec_id % 7 AS adom
      FROM base WHERE vec_id % 100 = 0 AND vec_id < 10000
    ),
    cand AS (SELECT vec_id AS neg_id, v AS cv, vec_id % 7 AS cdom FROM base),
    scored AS (
      SELECT a.anchor_id, c.neg_id,
             ROUND(list_dot_product(a.av, c.cv), 6) AS cos
      FROM anch a JOIN cand c
        ON c.cdom <> a.adom AND c.neg_id <> a.anchor_id
    )
    SELECT anchor_id, neg_id, cos, CAST(rnk AS INT) AS rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY anchor_id
                                   ORDER BY cos DESC, neg_id) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """


# =====================================================================
# Hard-negative mining (q175): for each anchor in a FIXED probe set
# (bounded like q155's eval set — probes don't grow with the corpus),
# the top-3 most-similar vectors from a DIFFERENT domain (vec_id % 7
# as the synthetic domain label) — the contrastive-training negative
# selector: nearest non-matches make the hardest negatives. Work is
# |corpus| × O(1) Arrow dots map-side; the per-anchor top-3 window
# partitions on anchor (bounded frames). operators/retrieval.py
# normalize_vec + similarity.dot_arrow.
# =====================================================================
@q("q175_hard_negatives", _q175_oracle())
def q175(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from dbt_incremental_ci_spark.operators.retrieval import normalize_vec
    from dbt_incremental_ci_spark.operators.similarity import dot_arrow

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("v")
    )
    nv = normalize_vec(emb, "v")
    anch = nv.filter(
        (F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 10000)
    ).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("v").alias("av"),
        (F.col("vec_id") % 7).alias("adom"),
    )
    cand = nv.select(
        F.col("vec_id").alias("neg_id"),
        F.col("v").alias("cv"),
        (F.col("vec_id") % 7).alias("cdom"),
    )
    scored = (
        cand.crossJoin(F.broadcast(anch))
        .filter(
            (F.col("cdom") != F.col("adom"))
            & (F.col("neg_id") != F.col("anchor_id"))
        )
        .select(
            "anchor_id",
            "neg_id",
            F.round(dot_arrow()(F.col("av"), F.col("cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cos"), F.asc("neg_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
    )


# =====================================================================
# Negative sampling (q176): k deterministic candidate items per
# customer (md5-slot hashing onto the item key space) minus the items
# the customer actually bought (anti-join on the interaction set) —
# the recommender-training staple. Candidate generation is a map-side
# explode of a k-literal sequence; the interaction set is one
# distinct projection of orders✕lineitem; the anti-join shuffles on
# (customer, item) only. All hashing replays exactly in the oracle.
# =====================================================================
@q(
    "q176_negative_sampling",
    """
    WITH maxp AS (SELECT max(p_partkey) AS mp FROM part),
    inter AS (
      SELECT DISTINCT o.o_custkey, l.l_partkey
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    cust AS (SELECT DISTINCT o_custkey FROM orders),
    cand AS (
      SELECT c.o_custkey, s.i AS slot,
             1 + (('0x' || substr(md5(CAST(c.o_custkey AS VARCHAR) || ':'
                                      || CAST(s.i AS VARCHAR) || ':neg'),
                                  1, 8))::BIGINT % m.mp) AS cand_item
      FROM cust c CROSS JOIN (SELECT unnest(range(5)) AS i) s
      CROSS JOIN maxp m
    )
    SELECT cd.o_custkey, CAST(cd.slot AS INT) AS slot, cd.cand_item
    FROM cand cd
    ANTI JOIN inter i
      ON i.o_custkey = cd.o_custkey AND i.l_partkey = cd.cand_item
    """,
)
def q176(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    maxp = t(spark, sf_dir, "part").agg(F.max("p_partkey").alias("__mp"))
    inter = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    cust = o.select("o_custkey").distinct()
    cand = (
        cust.withColumn("slot", F.explode(F.sequence(F.lit(0), F.lit(4))))
        .crossJoin(F.broadcast(maxp))
        .select(
            "o_custkey",
            F.col("slot").cast("int").alias("slot"),
            (
                F.lit(1)
                + F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("o_custkey").cast("string"),
                                F.lit(":"),
                                F.col("slot").cast("string"),
                                F.lit(":neg"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % F.col("__mp")
            ).alias("cand_item"),
        )
    )
    return cand.join(
        inter,
        (cand["o_custkey"] == inter["o_custkey"])
        & (cand["cand_item"] == inter["l_partkey"]),
        "left_anti",
    )


def _q177_oracle() -> str:
    from dbt_incremental_ci_spark.operators.sampling import hash_uniform_sql

    u = hash_uniform_sql("user_id", "srm")
    return f"""
    WITH units AS (
      SELECT user_id,
             CASE WHEN {u} < 0.4 THEN 'A'
                  WHEN {u} < 0.8 THEN 'B' ELSE 'H' END AS variant
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    per AS (SELECT variant, count(*) AS n FROM units GROUP BY variant),
    exp AS (
      SELECT * FROM (VALUES ('A', CAST(0.4 AS DOUBLE)),
                            ('B', CAST(0.4 AS DOUBLE)),
                            ('H', CAST(0.2 AS DOUBLE)))
        e(variant, expected_share)
    ),
    tot AS (SELECT sum(n) AS n_all FROM per),
    j AS (
      SELECT e.variant, coalesce(p.n, 0) AS n, e.expected_share, t.n_all
      FROM exp e LEFT JOIN per p USING (variant) CROSS JOIN tot t
    ),
    terms AS (
      SELECT variant, n, expected_share,
             expected_share * n_all AS en,
             CASE WHEN expected_share * n_all > 0
                  THEN pow(n - expected_share * n_all, 2)
                       / (expected_share * n_all)
                  ELSE 0.0 END AS term
      FROM j
    )
    SELECT variant, CAST(n AS BIGINT) AS n, expected_share,
           ROUND(en, 6) AS expected_n,
           ROUND(term, 9) AS chi2_term,
           CAST(sum(CAST(ROUND(term, 9) AS DECIMAL(28,9))) OVER ()
                AS DOUBLE) AS chi2,
           CAST(sum(CAST(ROUND(term, 9) AS DECIMAL(28,9))) OVER ()
                AS DOUBLE) >= 5.991464547107979 AS srm
    FROM terms
    """


# =====================================================================
# Sample Ratio Mismatch check (q177): chi-square goodness-of-fit of
# observed variant assignment counts vs the 40/40/20 design — the
# experiment-health gate read before any A/B metric (complements
# q168's effect readout). |variants|-row frame; the chi-square is a
# decimal-exact fold of round-9 terms so the 3-row window sum cannot
# drift an ulp between engines. operators/evalmetrics.py srm_check.
# =====================================================================
@q("q177_srm_check", _q177_oracle())
def q177(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.evalmetrics import srm_check
    from dbt_incremental_ci_spark.operators.sampling import hash_uniform

    u = hash_uniform("user_id", "srm")
    units = (
        events_table(spark, sf_dir)
        .select("user_id")
        .distinct()
        .select(
            F.when(u < 0.4, F.lit("A"))
            .when(u < 0.8, F.lit("B"))
            .otherwise(F.lit("H"))
            .alias("variant")
        )
    )
    return srm_check(
        units,
        "variant",
        {"A": 0.4, "B": 0.4, "H": 0.2},
        chi2_crit=5.991464547107979,
    )


# =====================================================================
# Linear multi-touch attribution (q178): split each purchase's value
# equally across the user's view/click/signup touches in the 6h
# window before it. Pair volume is the per-user activity bound (the
# q149 event-join class), never a corpus product; attributed value is
# integer micro-unit floor shares (value_micro div n) so bigint sums
# reproduce bit-for-bit on any partitioning — the sub-micro remainder
# is deliberately dropped, not order-dependently assigned.
# operators/attribution.py linear_attribution.
# =====================================================================
@q(
    "q178_attribution",
    """
    WITH conv AS (
      SELECT user_id, epoch_ns(ts) AS cts, event_id,
             CAST(CAST(ROUND(value, 6) AS DECIMAL(18,6)) * 1000000
                  AS BIGINT) AS vm,
             CAST(user_id AS VARCHAR) || ':' || CAST(epoch_ns(ts) AS VARCHAR)
               || ':' || CAST(event_id AS VARCHAR) AS cid
      FROM events WHERE event_type = 'purchase' AND value > 0
    ),
    tch AS (
      SELECT user_id, epoch_ns(ts) AS tts, event_type AS ch
      FROM events WHERE event_type IN ('view', 'click', 'signup')
    ),
    pairs AS (
      SELECT c.cid, c.vm, t.ch
      FROM conv c JOIN tch t ON t.user_id = c.user_id
      WHERE t.tts < c.cts AND t.tts >= c.cts - 21600000000000
    ),
    per_conv AS (SELECT cid, count(*) AS n FROM pairs GROUP BY cid),
    shared AS (
      SELECT p.ch, p.cid, p.vm // pc.n AS share
      FROM pairs p JOIN per_conv pc USING (cid)
    )
    SELECT ch AS channel,
           CAST(count(*) AS BIGINT) AS touches,
           CAST(count(DISTINCT cid) AS BIGINT) AS conversions,
           CAST(sum(share) AS BIGINT) AS attributed_micro,
           ROUND(sum(share) / 1000000.0, 6) AS attributed
    FROM shared
    GROUP BY ch
    """,
)
def q178(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.attribution import (
        linear_attribution,
    )

    ev = events_table(spark, sf_dir)
    conv = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 0)
    ).select("user_id", "ts", "event_id", "value")
    tch = ev.filter(
        F.col("event_type").isin("view", "click", "signup")
    ).select("user_id", "ts", F.col("event_type").alias("channel"))
    return linear_attribution(
        conv,
        tch,
        user_col="user_id",
        ts_col="ts",
        value_col="value",
        channel_col="channel",
        lookback=21_600_000_000_000,
        id_col="event_id",
    )


# =====================================================================
# Data-quality expectation suite (q179): the dbt generic tests
# (not_null / unique / accepted_values / relationships — the reference
# project's schema.yml surface) as count-only aggregates unioned into
# one report; one check is deliberately violated so the fail path is
# exercised. Each check is a single hash aggregate or anti-join
# emitting ONE row — output bounded by suite size at any scale.
# operators/expectations.py.
# =====================================================================
@q(
    "q179_expectation_suite",
    """
    SELECT 'not_null:o_custkey' AS check_name,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS violations,
           sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'unique:o_orderkey',
           CAST(coalesce(sum(c - 1), 0) AS BIGINT),
           coalesce(sum(c - 1), 0) = 0
    FROM (SELECT count(*) AS c FROM orders
          WHERE o_orderkey IS NOT NULL GROUP BY o_orderkey)
    UNION ALL
    SELECT 'accepted_values:o_orderstatus',
           CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
                          AND o_orderstatus NOT IN ('O', 'F', 'P')
                         THEN 1 ELSE 0 END) AS BIGINT),
           sum(CASE WHEN o_orderstatus IS NOT NULL
                     AND o_orderstatus NOT IN ('O', 'F', 'P')
                    THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'relationships:o_custkey',
           CAST(count(*) AS BIGINT), count(*) = 0
    FROM (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL) o
    ANTI JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'accepted_values:o_orderpriority',
           CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
                          AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT),
           sum(CASE WHEN o_orderpriority IS NOT NULL
                     AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) = 0
    FROM orders
    """,
)
def q179(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators import expectations as ex

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return ex.suite(
        [
            ex.not_null(o, "o_custkey"),
            ex.unique(o, "o_orderkey"),
            ex.accepted_values(o, "o_orderstatus", ["O", "F", "P"]),
            ex.relationships(o, "o_custkey", c, "c_custkey"),
            ex.accepted_values(
                o, "o_orderpriority", ["1-URGENT", "2-HIGH"]
            ),
        ]
    )


# =====================================================================
# Golden-record compaction (q180): one survivor row per user from the
# event stream — latest event type by (ts, event_id), latest NON-NULL
# value (survivorship takes the freshest observed field, not the
# freshest row — the MDM "coalesce latest non-null" rule), first/last
# seen, event count. Two user-partitioned rn=1 windows (per-user
# frames) + one aggregate; user-keyed shuffles only.
# =====================================================================
@q(
    "q180_golden_record",
    """
    WITH e AS (
      SELECT user_id, event_type, value, epoch_ns(ts) AS tsn, event_id
      FROM events
    ),
    latest AS (
      SELECT user_id, event_type AS last_type
      FROM e
      QUALIFY row_number() OVER (PARTITION BY user_id
                                 ORDER BY tsn DESC, event_id DESC) = 1
    ),
    lastval AS (
      SELECT user_id, ROUND(value, 6) AS last_value
      FROM e WHERE value IS NOT NULL
      QUALIFY row_number() OVER (PARTITION BY user_id
                                 ORDER BY tsn DESC, event_id DESC) = 1
    ),
    base AS (
      SELECT user_id, min(tsn) AS first_seen, max(tsn) AS last_seen,
             count(*) AS n_events
      FROM e GROUP BY user_id
    )
    SELECT b.user_id, l.last_type, v.last_value,
           b.first_seen, b.last_seen, CAST(b.n_events AS BIGINT) AS n_events
    FROM base b
    JOIN latest l USING (user_id)
    LEFT JOIN lastval v USING (user_id)
    """,
)
def q180(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = events_table(spark, sf_dir).select(
        "user_id", "event_type", "value", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    latest = (
        e.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", F.col("event_type").alias("last_type"))
    )
    lastval = (
        e.filter(F.col("value").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", F.round("value", 6).alias("last_value"))
    )
    base = e.groupBy("user_id").agg(
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return (
        base.join(latest, "user_id")
        .join(lastval, "user_id", "left")
        .select(
            "user_id",
            "last_type",
            "last_value",
            "first_seen",
            "last_seen",
            "n_events",
        )
    )


# =====================================================================
# Seasonal decomposition (q181): per-nation monthly revenue, centered
# 3-month moving-average trend, seasonal ratio — the classical
# ratio-to-moving-average step. Month arithmetic runs on integer month
# indexes (year*12+month-1) and the trend only emits where the
# previous/next months are actually CONSECUTIVE, so calendar gaps
# yield NULL instead of misaligned frames. Revenue sums are decimal-
# exact; the trend's single double division is order-free. Per-nation
# windows over O(#months) frames.
# =====================================================================
@q(
    "q181_seasonal_decompose",
    """
    WITH m AS (
      SELECT c.c_nationkey AS nationkey,
             year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1 AS midx,
             sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    w AS (
      SELECT nationkey, midx, rev,
             lag(midx)  OVER (PARTITION BY nationkey ORDER BY midx) AS pm,
             lag(rev)   OVER (PARTITION BY nationkey ORDER BY midx) AS pr,
             lead(midx) OVER (PARTITION BY nationkey ORDER BY midx) AS nm,
             lead(rev)  OVER (PARTITION BY nationkey ORDER BY midx) AS nr
      FROM m
    )
    SELECT nationkey, CAST(midx AS BIGINT) AS midx,
           CAST(rev AS DOUBLE) AS rev,
           CASE WHEN pm = midx - 1 AND nm = midx + 1
                THEN ROUND(CAST(pr + rev + nr AS DOUBLE) / 3.0, 6)
           END AS trend,
           CASE WHEN pm = midx - 1 AND nm = midx + 1
                     AND CAST(pr + rev + nr AS DOUBLE) > 0
                THEN ROUND(CAST(rev AS DOUBLE)
                           / (CAST(pr + rev + nr AS DOUBLE) / 3.0), 6)
           END AS seasonal_ratio
    FROM w
    """,
)
def q181(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    m = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_nationkey").alias("nationkey"),
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
            ).alias("midx"),
            dec("o_totalprice").alias("__p"),
        )
        .groupBy("nationkey", "midx")
        .agg(F.sum("__p").alias("rev"))
    )
    w = Window.partitionBy("nationkey").orderBy("midx")
    pm, pr = F.lag("midx").over(w), F.lag("rev").over(w)
    nm, nr = F.lead("midx").over(w), F.lead("rev").over(w)
    consec = (pm == F.col("midx") - 1) & (nm == F.col("midx") + 1)
    s3 = (pr + F.col("rev") + nr).cast("double")
    return m.select(
        "nationkey",
        F.col("midx").cast("bigint").alias("midx"),
        F.col("rev").cast("double").alias("rev"),
        F.when(consec, F.round(s3 / 3.0, 6)).alias("trend"),
        F.when(
            consec & (s3 > 0),
            F.round(F.col("rev").cast("double") / (s3 / 3.0), 6),
        ).alias("seasonal_ratio"),
        pm.alias("__pm"), nm.alias("__nm"),
    ).drop("__pm", "__nm")


# =====================================================================
# Session metrics (q182): the metrics layer over q30's gap
# sessionization — per user: session count, bounce rate (1-event
# sessions), average and max session duration in integer seconds
# (exact second arithmetic; the average is one double division).
# Session ids come from the running sum of new-session flags — a
# per-user frame, never data-sized.
# =====================================================================
@q(
    "q182_session_metrics",
    """
    WITH flagged AS (
      SELECT user_id, epoch_ns(ts) // 1000000000 AS sec, event_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL THEN 1
                  WHEN date_diff('second',
                       lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id),
                       ts) > 1800 THEN 1
                  ELSE 0 END AS is_new
      FROM events
    ),
    sess AS (
      SELECT user_id, sec,
             sum(is_new) OVER (PARTITION BY user_id
                               ORDER BY sec, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS sid
      FROM flagged
    ),
    per AS (
      SELECT user_id, sid, count(*) AS n_ev,
             max(sec) - min(sec) AS dur
      FROM sess GROUP BY user_id, sid
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS bounces,
           ROUND(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS bounce_rate,
           ROUND(sum(dur) / CAST(count(*) AS DOUBLE), 6)
             AS avg_session_sec,
           CAST(max(dur) AS BIGINT) AS max_session_sec
    FROM per
    GROUP BY user_id
    """,
)
def q182(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = events_table(spark, sf_dir).withColumn(
        "sec", F.expr("CAST(ts DIV 1000000000 AS BIGINT)")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_sec = F.lag("sec").over(w)
    is_new = (
        F.when(prev_sec.isNull(), 1)
        .when(F.col("sec") - prev_sec > 1800, 1)
        .otherwise(0)
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = ev.withColumn("__new", is_new).withColumn(
        "sid", F.sum("__new").over(ws)
    )
    per = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("__n_ev"),
        (F.max("sec") - F.min("sec")).alias("__dur"),
    )
    return per.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum(F.when(F.col("__n_ev") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("bounces"),
        F.round(
            F.sum(F.when(F.col("__n_ev") == 1, 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("bounce_rate"),
        F.round(
            F.sum("__dur") / F.count(F.lit(1)).cast("double"), 6
        ).alias("avg_session_sec"),
        F.max("__dur").cast("bigint").alias("max_session_sec"),
    )


# =====================================================================
# Cohort retention (q183): users cohorted by first-active week;
# retention(cohort, k) = share of the cohort active k weeks later.
# Weeks are integer epoch-week indexes (sec // 86400 // 7 — exact in
# both engines); the activity set is a distinct (user, week)
# projection, cohorts a per-user min — all key-hash aggregates, output
# bounded by weeks². The product-analytics retention triangle.
# =====================================================================
@q(
    "q183_cohort_retention",
    """
    WITH act AS (
      SELECT DISTINCT user_id,
             (epoch_ns(ts) // 1000000000) // 86400 // 7 AS wk
      FROM events
    ),
    cohort AS (SELECT user_id, min(wk) AS cw FROM act GROUP BY user_id),
    sizes AS (SELECT cw, count(*) AS cohort_size FROM cohort GROUP BY cw),
    joined AS (
      SELECT c.cw, a.wk - c.cw AS offset_weeks, a.user_id
      FROM act a JOIN cohort c USING (user_id)
    ),
    ret AS (
      SELECT cw, offset_weeks, count(DISTINCT user_id) AS active_users
      FROM joined GROUP BY cw, offset_weeks
    )
    SELECT CAST(r.cw AS BIGINT) AS cohort_week,
           CAST(r.offset_weeks AS BIGINT) AS offset_weeks,
           CAST(r.active_users AS BIGINT) AS active_users,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           ROUND(r.active_users / CAST(s.cohort_size AS DOUBLE), 6)
             AS retention
    FROM ret r JOIN sizes s USING (cw)
    """,
)
def q183(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    act = ev.select(
        "user_id",
        F.expr(
            "CAST(ts DIV 1000000000 AS BIGINT) DIV 86400 DIV 7"
        ).alias("wk"),
    ).distinct()
    cohort = act.groupBy("user_id").agg(F.min("wk").alias("cw"))
    sizes = cohort.groupBy("cw").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    joined = act.join(cohort, "user_id").select(
        "cw", (F.col("wk") - F.col("cw")).alias("offset_weeks"), "user_id"
    )
    ret = joined.groupBy("cw", "offset_weeks").agg(
        F.count_distinct("user_id").alias("active_users")
    )
    return ret.join(sizes, "cw").select(
        F.col("cw").cast("bigint").alias("cohort_week"),
        F.col("offset_weeks").cast("bigint").alias("offset_weeks"),
        F.col("active_users").cast("bigint").alias("active_users"),
        F.col("cohort_size").cast("bigint").alias("cohort_size"),
        F.round(
            F.col("active_users") / F.col("cohort_size").cast("double"), 6
        ).alias("retention"),
    )


# =====================================================================
# Market-basket association rules (q184): support / confidence / lift
# over order-basket item pairs (Apriori levels 1-2 — the "also
# bought" pipeline). Pair volume is the per-basket bound
# sum C(|basket|,2), never |items|^2; metrics are single divisions of
# exact integer counts. operators/association.py.
# =====================================================================
@q(
    "q184_association_rules",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
    ),
    nb AS (SELECT count(DISTINCT b) AS n FROM items),
    supp AS (SELECT i, count(*) AS cnt FROM items GROUP BY i),
    pairs AS (
      SELECT a.i AS item_a, b.i AS item_b, count(*) AS pair_count
      FROM items a JOIN items b ON a.b = b.b AND a.i < b.i
      GROUP BY a.i, b.i
      HAVING count(*) >= 2
    )
    SELECT p.item_a, p.item_b,
           CAST(p.pair_count AS BIGINT) AS pair_count,
           ROUND(p.pair_count / CAST(nb.n AS DOUBLE), 6) AS support,
           ROUND(p.pair_count / CAST(sa.cnt AS DOUBLE), 6) AS conf_a_to_b,
           ROUND(p.pair_count / CAST(sb.cnt AS DOUBLE), 6) AS conf_b_to_a,
           ROUND(CAST(p.pair_count * nb.n AS DOUBLE)
                 / CAST(sa.cnt * sb.cnt AS DOUBLE), 6) AS lift
    FROM pairs p
    JOIN supp sa ON sa.i = p.item_a
    JOIN supp sb ON sb.i = p.item_b
    CROSS JOIN nb
    """,
)
def q184(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dbt_incremental_ci_spark.operators.association import (
        association_rules,
    )

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return association_rules(
        li, "l_orderkey", "l_partkey", min_pair_count=2
    )
