"""Relational analytics over the driver's TPC-H-ish star schema.

The reference (fastcdc-rs) has no relational operators at all (SURVEY.md
§2.A "categories that do NOT exist"), so everything here is Spark
built-ins — the point is to prove join/aggregate/window parity on the fact
tables the driver ships (lineitem 600k rows at sf0.1) with plans that hold
at 100 TB:

* ``pricing_summary``   — TPC-H Q1 shape: scan-filter → hash aggregate.
  One shuffle on a 6-value group key; Catalyst pushes the shipdate filter
  and prunes columns at the parquet scan (verified by plan tests).
* ``revenue_by_nation`` — TPC-H Q5 shape: fact⨝fact shuffle join on
  orderkey, dimension joins explicitly ``broadcast()`` (nation: 25 rows —
  at CC scale a dimension under spark.sql.autoBroadcastJoinThreshold).
* ``top_customers_per_nation`` — aggregate then window top-N per group;
  the window runs over the *aggregated* (customer-grain) frame, never the
  fact table, so the per-partition sort is bounded by customers/nation.
* ``late_order_priority`` — left-semi join (EXISTS) from orders into
  lineitem, then a tiny aggregate on priority.

Cross-engine exactness: every monetary column in the driver data is an
exact 2-decimal value stored as its nearest double, so all sums are done
in DECIMAL arithmetic (cast at the leaf: decimal(10,2)/decimal(3,2), far
from any 6th-decimal rounding boundary) — the decimal sums are exact and
bit-identical in Spark and DuckDB; only the final scalar is converted to
DOUBLE. Averages divide two exact quantities in IEEE double and round.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = [
    "pricing_summary",
    "revenue_by_nation",
    "top_customers_per_nation",
    "late_order_priority",
    "customers_without_orders",
    "orders_rollup",
    "customer_balance_quartiles",
]

_PRICE = "decimal(10,2)"  # |values| < 1e8, exact 2-decimal data
_PCT = "decimal(3,2)"     # discount/tax in [0, 0.10], 2-decimal steps
_TOTAL = "decimal(12,2)"  # o_totalprice < 1e10


def pricing_summary(lineitem: DataFrame, cutoff: str = "2000-09-02") -> DataFrame:
    """TPC-H Q1: per (returnflag, linestatus) pricing summary at ``cutoff``.

    Single wide aggregate over the fact table — the filter and the 8-column
    projection reach the parquet scan (PushedFilters/ReadSchema), and the
    group key has ~6 values so the shuffle after partial aggregation is a
    few rows per partition regardless of input size.
    """
    ext = F.col("l_extendedprice").cast(_PRICE)
    disc = F.col("l_discount").cast(_PCT)
    tax = F.col("l_tax").cast(_PCT)
    one = F.lit(1).cast("decimal(1,0)")
    disc_price = ext * (one - disc)            # decimal, exact
    charge = disc_price * (one + tax)          # decimal, exact
    agg = (
        lineitem.where(F.col("l_shipdate") <= F.to_timestamp(F.lit(cutoff)))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(ext).alias("_sum_base"),
            F.sum(disc_price).alias("_sum_disc"),
            F.sum(charge).alias("_sum_charge"),
            F.sum(disc).alias("_sum_discount"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    cnt = F.col("count_order").cast("double")
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        F.col("_sum_base").cast("double").alias("sum_base_price"),
        F.col("_sum_disc").cast("double").alias("sum_disc_price"),
        F.col("_sum_charge").cast("double").alias("sum_charge"),
        F.round(F.col("sum_qty").cast("double") / cnt, 6).alias("avg_qty"),
        F.round(F.col("_sum_base").cast("double") / cnt, 6).alias("avg_price"),
        F.round(F.col("_sum_discount").cast("double") / cnt, 6).alias("avg_disc"),
        "count_order",
    )


def revenue_by_nation(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: revenue per customer nation in a date window.

    Join order is fact-first: lineitem⨝orders is the one shuffle join
    (both sides keyed on orderkey); customer arrives via the orders side
    (shuffle on custkey) and nation is broadcast (25 rows — any real
    deployment keeps dimensions under the broadcast threshold).
    """
    ext = F.col("l_extendedprice").cast(_PRICE)
    disc = F.col("l_discount").cast(_PCT)
    one = F.lit(1).cast("decimal(1,0)")
    o = orders.where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit(date_from)))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit(date_to)))
    ).select("o_orderkey", "o_custkey")
    rev = (
        lineitem.select("l_orderkey", (ext * (one - disc)).alias("rev"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.sum("rev").alias("_rev"))
    )
    return rev.select("n_name", F.col("_rev").cast("double").alias("revenue"))


def top_customers_per_nation(
    customer: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    k: int = 3,
) -> DataFrame:
    """Top-k customers by total order value within each nation.

    The window (row_number over revenue desc) runs on the customer-grain
    aggregate — one row per customer — so partition sort size is bounded
    by customers-per-nation, not by the orders fact table.
    """
    per_cust = (
        orders.select("o_custkey", F.col("o_totalprice").cast(_TOTAL).alias("tp"))
        .groupBy("o_custkey")
        .agg(F.sum("tp").alias("_rev"), F.count(F.lit(1)).alias("n_orders"))
    )
    joined = (
        per_cust.join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("_rev").desc(), F.col("c_custkey").asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "n_name",
            "c_custkey",
            F.col("_rev").cast("double").alias("revenue"),
            "n_orders",
            "rank",
        )
    )


def orders_rollup(orders: DataFrame) -> DataFrame:
    """Revenue by (order year, priority) with ROLLUP subtotals + grand
    total — grouping-sets coverage. Subtotal rows carry NULL group keys
    in both engines; sums are decimal-exact."""
    tp = F.col("o_totalprice").cast(_TOTAL)
    agg = (
        orders.select(
            F.year("o_orderdate").alias("order_year"),
            F.col("o_orderpriority"),
            tp.alias("tp"),
        )
        .rollup("order_year", "o_orderpriority")
        .agg(F.sum("tp").alias("_rev"), F.count(F.lit(1)).alias("n_orders"))
    )
    return agg.select(
        "order_year",
        "o_orderpriority",
        F.col("_rev").cast("double").alias("revenue"),
        "n_orders",
    )


def customer_balance_quartiles(customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Per-nation account-balance quartiles (ntile window) with the
    nation dimension broadcast; ties broken deterministically by key."""
    w = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    joined = customer.select("c_custkey", "c_nationkey", "c_acctbal").join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    per_cust = joined.select(
        "n_name", "c_custkey",
        F.col("c_acctbal").cast(_TOTAL).alias("bal"),
        F.ntile(4).over(w).alias("quartile"),
    )
    return (
        per_cust.groupBy("n_name", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("bal").alias("_b"),
        )
        .select(
            "n_name", "quartile", "n_customers",
            F.col("_b").cast("double").alias("total_balance"),
        )
    )


def late_order_priority(
    orders: DataFrame, lineitem: DataFrame, late_days: int = 60
) -> DataFrame:
    """TPC-H Q4 shape: orders with any line shipped > ``late_days`` after
    the order date, counted per priority (left-semi join = EXISTS)."""
    late = orders.join(
        lineitem.select("l_orderkey", "l_shipdate"),
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_late_orders")
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """NOT EXISTS (left-anti join): customers that never placed an order.

    The complement of ``late_order_priority``'s semi join — together they
    cover both EXISTS shapes. The anti join hash-partitions on custkey
    like any equi-join; the orders side is pruned to the single join key
    column at the scan, so at fact-table scale the shuffled payload is
    just keys."""
    return customer.join(
        orders.select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
        "left_anti",
    ).select("c_custkey", "c_name", "c_acctbal")
