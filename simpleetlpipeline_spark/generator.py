"""Distributed synthetic data generator (SURVEY.md §2.1 S10).

The reference generates its sample e-commerce CSVs with seeded numpy
on the driver (main.py:237-375: np.random.seed(42), weighted
np.random.choice). The Spark-first re-expression is spark.range(n)
plus seeded rand()/xxhash64-derived columns with when-ladder weighted
sampling — fully distributed, no driver materialization, so the same
generator produces 4k rows or 4B rows.

Deliberate dirtiness is reproduced because it is load-bearing for
the transform layer (SURVEY.md §2.3 F2/F5/F6, §6):
- some emails lack '@' (dropped by filter_valid_email)
- country appears as US/USA/UK/... (standardize_values unifies)
- some stock quantities are negative (clamp_floor)
- a seeded fraction of orders/items get a small total error beyond
  the ±0.01 tolerance (filter_tolerance drops them, mirroring the
  reference's verified 14%/42% drops).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from simpleetlpipeline_spark.io import write_csv

SEED = 42
ANCHOR_DATE = "2025-07-04"  # reference's committed run date


def _pick(id_col: Column, salt: int, *choices: str) -> Column:
    """Uniform deterministic categorical pick via xxhash64."""
    arr = F.array(*[F.lit(c) for c in choices])
    return F.element_at(
        arr, (F.pmod(F.xxhash64(id_col, F.lit(salt)), F.lit(len(choices))) + 1)
        .cast("int"))


def _weighted(r: Column, *weighted_choices: tuple[str, float]) -> Column:
    """Weighted categorical sampling as a cumulative when-ladder —
    the declarative analog of np.random.choice(p=[...])
    (reference main.py:284,334,343)."""
    expr = None
    cum = 0.0
    for value, weight in weighted_choices[:-1]:
        cum += weight
        branch = F.when(r < cum, F.lit(value))
        expr = branch if expr is None else expr.when(r < cum, F.lit(value))
    last = F.lit(weighted_choices[-1][0])
    return expr.otherwise(last) if expr is not None else last


def _rand(seed_offset: int) -> Column:
    return F.rand(SEED + seed_offset)


#: Target rows per generation task (round 12, guide §2.2/§6):
#: spark.range defaults to one partition per core, so a 50k-row
#: source table generated on local[32] became 32 ~1,500-row tasks,
#: 32 tiny CSV files, and 32-task scan/write/dup-count jobs all the
#: way down the per-table load chain — pure scheduling overhead at
#: bench scale (28 jobs x 32 tasks for ~36 MB of data). Sizing the
#: range by ROWS instead makes the partitioning scale-adaptive in
#: both directions: each task emits a several-MB CSV shard, the
#: downstream extract reads that many splits, and a 100-TB-sized n
#: still fans out to every core (the core count stays the cap, so
#: the driver's low-core bench runs keep their parallelism
#: semantics).
GEN_ROWS_PER_TASK = 100_000


def _gen_partitions(spark: SparkSession, n_rows: int) -> int:
    cap = spark.sparkContext.defaultParallelism
    return max(1, min(-(-n_rows // GEN_ROWS_PER_TASK), cap))


def gen_customers(spark: SparkSession, n: int = 2000) -> DataFrame:
    """Reference main.py:266-286. ~2% of emails are invalid."""
    ids = (spark.range(1, n + 1, 1, _gen_partitions(spark, n))
           .withColumnRenamed("id", "customer_id"))
    first = _pick(F.col("customer_id"), 1,
                  "James", "Mary", "John", "Patricia", "Robert", "Jennifer",
                  "Michael", "Linda", "David", "Elizabeth")
    last = _pick(F.col("customer_id"), 2,
                 "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia",
                 "Miller", "Davis", "Rodriguez", "Martinez")
    email_ok = _rand(3) >= 0.02
    return ids.select(
        "customer_id",
        first.alias("first_name"),
        last.alias("last_name"),
        F.when(
            email_ok,
            F.concat(F.lower(first), F.lit("."), F.lower(last),
                     F.col("customer_id").cast("string"), F.lit("@example.com")),
        ).otherwise(
            F.concat(F.lower(first), F.lit(".invalid.example.com"))
        ).alias("email"),
        F.concat(F.lit("+1-555-"),
                 F.lpad((F.pmod(F.xxhash64("customer_id"), F.lit(10000)))
                        .cast("string"), 4, "0")).alias("phone"),
        F.date_sub(F.lit(ANCHOR_DATE).cast("date"),
                   (F.floor(_rand(4) * 1460)).cast("int"))
        .alias("registration_date"),
        _weighted(_rand(5), ("USA", 0.3), ("US", 0.1),
                  ("United States", 0.05), ("UK", 0.1), ("Britain", 0.05),
                  ("Canada", 0.2), ("Germany", 0.2)).alias("country"),
        _pick(F.col("customer_id"), 6, "New York", "London", "Toronto",
              "Berlin", "Chicago", "Manchester").alias("city"),
        _weighted(_rand(7), ("Premium", 0.2), ("Standard", 0.5),
                  ("Basic", 0.3)).alias("customer_segment"),
        F.lit(0).alias("total_orders"),
        F.lit(0.0).alias("total_spent"),
    )


def gen_products(spark: SparkSession, n: int = 500) -> DataFrame:
    """Reference main.py:288-311. ~5% negative stock (clamped later)."""
    ids = (spark.range(1, n + 1, 1, _gen_partitions(spark, n))
           .withColumnRenamed("id", "product_id"))
    unit_price = F.round(_rand(11) * 495 + 5, 2)
    return ids.select(
        "product_id",
        F.concat(F.lit("Product-"), F.col("product_id")).alias("product_name"),
        _weighted(_rand(12), ("Electronics", 0.3), ("Clothing", 0.25),
                  ("Home", 0.2), ("Sports", 0.15), ("Books", 0.1))
        .alias("category"),
        _pick(F.col("product_id"), 13, "SubA", "SubB", "SubC", "SubD")
        .alias("subcategory"),
        _pick(F.col("product_id"), 14, "BrandX", "BrandY", "BrandZ", "Acme")
        .alias("brand"),
        unit_price.alias("unit_price"),
        F.round(unit_price * (_rand(15) * 0.4 + 0.4), 2).alias("cost_price"),
        F.when(_rand(16) < 0.05,
               (-F.floor(_rand(17) * 20) - 1).cast("int"))
        .otherwise(F.floor(_rand(17) * 500).cast("int"))
        .alias("stock_quantity"),
        F.round(_rand(18) * 20 + 0.1, 2).alias("weight_kg"),
        (F.pmod(F.xxhash64("product_id", F.lit(19)), F.lit(50)) + 1)
        .cast("int").alias("supplier_id"),
        (_rand(20) < 0.9).alias("is_active"),
    )


def gen_orders(spark: SparkSession, n: int = 1500,
               n_customers: int = 2000,
               num_partitions: int | None = None) -> DataFrame:
    """Reference main.py:313-347. ~15% get a total_amount that
    violates the ±0.01 consistency tolerance (reference's verified
    behavior: 216/1500 dropped).

    Two-phase select, and this is load-bearing (round-11 bug fix):
    every F.rand() DRAW is materialized as a column in the first
    projection, and all derived columns (tax from subtotal, the
    consistent/broken totals) are computed from those columns in
    the second. In the old single-select form each column slot held
    its OWN instance of the shared rand expression, and an instance
    inside a when() branch only advances its stream on rows where
    the branch is taken — so the discount slot's copy of the
    subtotal stream desynced from the subtotal column after the
    first 70%-probability branch skip, and ~99.8% of totals came
    out inconsistent instead of the intended ~15% (caught while
    building the etl_pipeline_run DuckDB oracle; invisible to the
    parity goldens, which run on the reference's committed CSVs).
    Catalyst does not collapse the two Projects because inlining a
    multiply-referenced nondeterministic column is unsound — which
    is exactly the guarantee the split relies on.

    num_partitions pins the parallelism of the source range (default:
    the session's). F.rand streams are seeded PER PARTITION, so the
    generated rows — and which of them pass the tolerance filters —
    legitimately vary with this value; the consistency-fraction
    regression test generates under two different values to assert
    the draw/derived-column sync holds under any partitioning."""
    ids = spark.range(
        1, n + 1, 1, num_partitions or _gen_partitions(spark, n)
    ).withColumnRenamed("id", "order_id")
    draws = ids.select(
        "order_id",
        _rand(21).alias("r_sub"), _rand(22).alias("r_ship"),
        _rand(23).alias("r_disc"), _rand(24).alias("r_break"),
        _rand(26).alias("r_date"), _rand(27).alias("r_status"),
        _rand(28).alias("r_shipm"), _rand(29).alias("r_pay"),
        _rand(30).alias("r_broken"),
    )
    subtotal = F.round(F.col("r_sub") * 990 + 10, 2)
    tax = F.round(subtotal * 0.08, 2)
    shipping = F.round(F.col("r_ship") * 20, 2)
    discount = F.round(
        F.when(F.col("r_disc") < 0.3, subtotal * 0.1).otherwise(0.0), 2)
    consistent_total = F.round(subtotal + tax + shipping - discount, 2)
    broken_total = F.round(
        consistent_total + 0.02 + F.col("r_break") * 5, 2)
    return draws.select(
        "order_id",
        (F.pmod(F.xxhash64("order_id", F.lit(25)), F.lit(n_customers)) + 1)
        .alias("customer_id"),
        F.date_sub(F.lit(ANCHOR_DATE).cast("date"),
                   (F.floor(F.col("r_date") * 730)).cast("int"))
        .alias("order_date"),
        _weighted(F.col("r_status"), ("Completed", 0.6), ("Pending", 0.15),
                  ("Shipped", 0.15), ("Cancelled", 0.1)).alias("order_status"),
        _weighted(F.col("r_shipm"), ("Standard", 0.6), ("Express", 0.3),
                  ("Overnight", 0.1)).alias("shipping_method"),
        _weighted(F.col("r_pay"), ("Credit Card", 0.5), ("PayPal", 0.3),
                  ("Bank Transfer", 0.2)).alias("payment_method"),
        subtotal.alias("subtotal"),
        tax.alias("tax_amount"),
        shipping.alias("shipping_cost"),
        discount.alias("discount_amount"),
        F.when(F.col("r_broken") < 0.15, broken_total)
        .otherwise(consistent_total).alias("total_amount"),
    )


def gen_order_items(spark: SparkSession, n_orders: int = 1500,
                    n_products: int = 500,
                    num_partitions: int | None = None) -> DataFrame:
    """Reference main.py:349-375: 1-5 items per order; ~40% of line
    totals computed from an unrounded discount (the reference's CSV
    rounding bug, verified to drop 1879/4474 items).

    num_partitions: see gen_orders — pins the source-range
    parallelism so tests can vary the per-partition rand streams."""
    base = (
        # explode emits ~3 items/order: size the range by OUTPUT rows
        spark.range(1, n_orders + 1, 1,
                    num_partitions or _gen_partitions(spark, n_orders * 3))
        .withColumnRenamed("id", "order_id")
        .select("order_id",
                F.explode(F.sequence(
                    F.lit(1),
                    (F.pmod(F.xxhash64("order_id", F.lit(31)), F.lit(5)) + 1)
                    .cast("int"))).alias("seq"))
    )
    # Dense global row_number would need a single-partition sort;
    # (order_id*8 + seq) is unique (seq<=5), deterministic, and
    # computable without any shuffle at any scale.
    #
    # Same two-phase draw/derive split as gen_orders (round-11 bug
    # fix): line_total's copies of the price/discount rand streams
    # desynced from the published columns via the 40%-probability
    # when() branch, breaking ~all line consistency instead of the
    # intended ~40%. Draws live in their own projection ABOVE the
    # explode-carrying one (the explode trap: expressions in the
    # same select as explode() evaluate per exploded row — here
    # that's wanted, one draw per ITEM, but they must still be
    # drawn exactly once).
    draws = base.select(
        "order_id", "seq",
        _rand(33).alias("r_price"), _rand(34).alias("r_disc"),
        _rand(36).alias("r_drift"),
    )
    item_id = F.col("order_id") * 8 + F.col("seq")
    qty = (F.pmod(F.xxhash64("order_id", "seq", F.lit(32)), F.lit(10)) + 1)
    price = F.round(F.col("r_price") * 495 + 5, 2)
    disc_raw = F.col("r_disc") * 25
    disc_rounded = F.round(disc_raw, 2)
    consistent = F.round(qty * price * (1 - disc_rounded / 100), 2)
    drifted = F.round(qty * price * (1 - disc_raw / 100), 2)
    return draws.select(
        item_id.alias("item_id"),
        "order_id",
        (F.pmod(F.xxhash64("order_id", "seq", F.lit(35)), F.lit(n_products)) + 1)
        .alias("product_id"),
        qty.cast("int").alias("quantity"),
        price.alias("unit_price"),
        disc_rounded.alias("discount_percent"),
        F.when(F.col("r_drift") < 0.4, drifted).otherwise(consistent)
        .alias("line_total"),
    )


def table_builders(spark: SparkSession, n_customers: int = 2000,
                   n_products: int = 500,
                   n_orders: int = 1500) -> dict[str, DataFrame]:
    """The four source-table plans, keyed by table name. The sizes
    couple the tables (orders reference n_customers, items reference
    n_orders/n_products) but the PLANS are independent spark.range
    DAGs — safe to build and run in any order or concurrently."""
    return {
        "customers": gen_customers(spark, n_customers),
        "products": gen_products(spark, n_products),
        "orders": gen_orders(spark, n_orders, n_customers),
        "order_items": gen_order_items(spark, n_orders, n_products),
    }


def generate_sample_data(spark: SparkSession, out_dir: str,
                         n_customers: int = 2000, n_products: int = 500,
                         n_orders: int = 1500) -> dict[str, str]:
    """Write the four CSV sources (reference main.py:237-264) and
    return {table: path}. CSV to mirror the reference's interchange
    format; the warehouse side is parquet."""
    dfs = table_builders(spark, n_customers, n_products, n_orders)
    # The four table plans are independent spark.range DAGs writing to
    # separate directories — submit them from concurrent threads so
    # the scheduler overlaps their stages (same pattern as
    # pipeline.run_full_pipeline's parallel loads).
    from concurrent.futures import ThreadPoolExecutor

    def _write(item: tuple[str, object]) -> tuple[str, str]:
        name, df = item
        path = os.path.join(out_dir, f"{name}.csv")
        write_csv(df, path)
        return name, path

    with ThreadPoolExecutor(max_workers=len(dfs)) as ex:
        return dict(ex.map(_write, dfs.items()))
