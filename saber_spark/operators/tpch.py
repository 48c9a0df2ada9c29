"""Classic relational workloads over the driver's TPC-H-ish tables.

These exercise the relational vehicles the KG rebuild introduced
(SURVEY.md §2.1 note: the reference has no joins/aggs; the Spark rebuild's
joins, aggregations, windows and set-ops are enumerated as first-class,
oracle-checked operators).

Determinism note: money aggregates run in DECIMAL (exact, engine-portable);
double sums are order-sensitive across engines and would make value-hash
comparison flaky.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Tight decimal types keep the full product chain inside precision 38 so
# Spark never truncates scale (literal 1 as decimal(1,0) is load-bearing:
# a plain lit(1) types as decimal(10,0) and pushes ep*(1-disc)*(1+tax) past
# 38 digits, triggering Spark's allowPrecisionLoss scale reduction).
MONEY = "decimal(12,2)"
RATE = "decimal(5,4)"


def _one():
    return F.lit(1).cast("decimal(1,0)")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: grouped pricing summary with decimal-exact sums."""
    ep = F.col("l_extendedprice").cast(MONEY)
    disc = F.col("l_discount").cast(RATE)
    tax = F.col("l_tax").cast(RATE)
    qty = F.col("l_quantity").cast(MONEY)
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("2024-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(ep).cast("double").alias("sum_base_price"),
            F.sum(ep * (_one() - disc)).cast("double").alias("sum_disc_price"),
            # round the scale-10 decimal to 6 before the double cast: the
            # raw unscaled value exceeds 2^53, where a naive decimal->double
            # conversion double-rounds and engines disagree in the last bits
            F.round(F.sum(ep * (_one() - disc) * (_one() + tax)), 6)
            .cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def top_orders_by_revenue(customer: DataFrame, orders: DataFrame,
                          lineitem: DataFrame, segment: str = "BUILDING",
                          k: int = 10) -> DataFrame:
    """TPC-H Q3 shape: join c⋈o⋈l, revenue per order, deterministic top-k.

    Join strategy is left to Catalyst/AQE: customer and orders scale with
    the fact data (forcing a broadcast would break at 1000 executors), and
    AQE downgrades to broadcast at runtime when the filtered side is small.
    """
    ep = F.col("l_extendedprice").cast(MONEY)
    disc = F.col("l_discount").cast(RATE)
    revenue = (
        lineitem.join(
            orders.join(
                customer.filter(F.col("c_mktsegment") == segment)
                .select("c_custkey"),
                orders.o_custkey == F.col("c_custkey"))
            .select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(ep * (_one() - disc)).cast("double").alias("revenue"))
    )
    return (revenue
            .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
            .limit(k)
            .select("o_orderkey", "revenue"))


def revenue_by_nation(customer: DataFrame, orders: DataFrame,
                      lineitem: DataFrame, nation: DataFrame,
                      region: DataFrame) -> DataFrame:
    """TPC-H Q5 shape: 5-way join, tiny dims broadcast, facts shuffle-joined.

    nation/region are bounded-size -> explicit broadcast; customer/orders
    scale with data -> shuffle join (AQE downgrades when actually small).
    """
    ep = F.col("l_extendedprice").cast(MONEY)
    disc = F.col("l_discount").cast(RATE)
    dims = (customer
            .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
            .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
            .select("c_custkey", "n_name", "r_name"))
    return (
        lineitem
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(dims, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(ep * (_one() - disc)).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )
