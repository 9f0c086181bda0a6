"""Window-function and as-of-join analytics.

The reference has no window functions or temporal joins (SURVEY.md
§2.5 'No ... window functions ... exist in the reference'; §2.4 'No
... as-of joins'), but both are table stakes for an analytics engine
a reference user would migrate to — per-group ranking is the general
form of the reference's ORDER BY + LIMIT top-k (A3), and as-of joins
are the standard event-to-latest-state lookup in event pipelines.
All three queries here are DuckDB-oracle-checked (DuckDB has native
window functions and ASOF JOIN, so the oracles are first-class SQL).

Scale notes:
- customer_order_ranks: one shuffle keyed by customer; per-key groups
  are order counts per customer (bounded), so no skewed reducer.
- monthly_revenue_running: aggregates THEN windows — the global
  (unpartitioned) running window runs on the ~tens-of-rows monthly
  rollup, never on raw orders, so the single-partition window stage
  is O(months) at any corpus size.
- events_asof_purchase: implemented as union + last(ignorenulls)
  over a per-user ordered window (the partition-merge as-of
  algorithm): ONE shuffle of events+purchases keyed by user, no
  row-explosion — unlike the naive join-filter-argmax which builds
  every (event, earlier-purchase) pair before reducing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from simpleetlpipeline_spark.io import read_table
from simpleetlpipeline_spark.plans.analytics import COMPLETED
from simpleetlpipeline_spark.session import ensure_session_conf


def customer_order_ranks(spark: SparkSession, sf_dir: str,
                         k: int = 3) -> DataFrame:
    """Top-k orders per customer by value: row_number() over a
    per-customer window — the grouped generalization of the
    reference's global ORDER BY ... LIMIT top-k (main.py:672-685)."""
    ensure_session_conf(spark)
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("order_rank", F.row_number().over(w))
        .filter(F.col("order_rank") <= k)
        .select("o_custkey", "o_orderkey", "order_rank", "o_totalprice")
    )


def monthly_revenue_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with cumulative total and 3-month moving
    average (running/frame windows over the A1 monthly rollup).

    Rounding contract: monthly revenue is round()ed BEFORE the
    running sums, so both engines fold the identical 2-decimal
    doubles in the identical (month-ordered) sequence — bit-equal
    accumulations, stable under the final round(2).
    """
    ensure_session_conf(spark)
    orders = read_table(spark, sf_dir, "orders")
    monthly = (
        orders.filter(F.col("o_orderstatus") == COMPLETED)
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
             F.count(F.lit(1)).alias("n_orders"))
    )
    w_run = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    w_mov3 = Window.orderBy("month").rowsBetween(-2, Window.currentRow)
    return monthly.select(
        "month", "revenue", "n_orders",
        F.round(F.sum("revenue").over(w_run), 2).alias("running_revenue"),
        F.round(F.avg("revenue").over(w_mov3), 2).alias("mov3_revenue"),
    )


def events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the same user's most recent
    STRICTLY-EARLIER purchase event.

    Spark has no ASOF JOIN operator; the scalable re-expression is
    the partition-merge trick: union both sides tagged, sort within
    each user by (ts, tag) — purchases sort AFTER events at equal ts,
    giving strict '<' semantics — and carry the latest purchase
    payload forward with last(ignorenulls) over a running window.
    Purchases are first reduced to one row per (user, ts) (max
    event_id) so the match is deterministic. Inner semantics: events
    with no prior purchase are dropped, mirroring DuckDB ASOF JOIN.
    """
    ensure_session_conf(spark)
    events = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_event_id"))
        .select("user_id", "ts", F.lit(1).alias("tag"),
                F.struct(F.col("ts").alias("p_ts"),
                         "purchase_event_id").alias("p"))
    )
    left = events.select(
        "user_id", "ts", F.lit(0).alias("tag"),
        F.lit(None).cast(purchases.schema["p"].dataType).alias("p"),
        "event_id", "event_type")
    merged = purchases.select(
        "user_id", "ts", "tag", "p",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
    ).unionByName(left)
    w = (Window.partitionBy("user_id")
         .orderBy("ts", "tag", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        merged.withColumn("asof", F.last("p", ignorenulls=True).over(w))
        .filter((F.col("tag") == 0) & F.col("asof").isNotNull())
        .select(
            "event_id", "user_id", "event_type",
            F.col("asof.purchase_event_id").alias("purchase_event_id"),
            (F.unix_micros("ts") - F.unix_micros("asof.p_ts"))
            .alias("micros_since_purchase"),
        )
    )


QUERIES = {
    "customer_order_ranks": customer_order_ranks,
    "monthly_revenue_running": monthly_revenue_running,
    "events_asof_purchase": events_asof_purchase,
}

ORACLE_SQL = {
    "customer_order_ranks": """
        SELECT o_custkey, o_orderkey,
               CAST(row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT)
                   AS order_rank,
               o_totalprice
        FROM orders
        QUALIFY order_rank <= 3
    """,
    "monthly_revenue_running": """
        WITH m AS (
            SELECT strftime(o_orderdate, '%Y-%m') AS month,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders
            WHERE o_orderstatus = 'F'
            GROUP BY 1
        )
        SELECT month, revenue, n_orders,
               round(sum(revenue) OVER (
                   ORDER BY month
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_revenue,
               round(avg(revenue) OVER (
                   ORDER BY month
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
                   AS mov3_revenue
        FROM m
    """,
    "events_asof_purchase": """
        WITH p AS (
            SELECT user_id, ts,
                   max(event_id) AS purchase_event_id
            FROM events
            WHERE event_type = 'purchase'
            GROUP BY 1, 2
        )
        SELECT e.event_id, e.user_id, e.event_type,
               p.purchase_event_id,
               epoch_us(e.ts) - epoch_us(p.ts) AS micros_since_purchase
        FROM events e
        ASOF JOIN p ON e.user_id = p.user_id AND e.ts > p.ts
    """,
}
