"""Reference-parity goldens (SURVEY.md §5 item 3).

Runs this engine's transform semantics over the reference's own
committed sample CSVs (read-only at /root/reference/) and asserts
the counts empirically verified against the reference's committed
SQLite database:

- orders:      1500 raw -> 1284 kept by the ±0.01 tolerance filter
- order_items: 4474 raw -> 2595 kept (discount rounding drift)
- customers:   2000 raw -> 2000 kept (all emails valid)
- orphans:     372 surviving items reference a dropped order

These numbers come from SURVEY.md §1/§2.3 (verified claims), not
from reading reference code at test time.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

from simpleetlpipeline_spark.io import read_csv
from simpleetlpipeline_spark.operators import transforms as T
from simpleetlpipeline_spark.operators.joins import orphan_rows

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF}/sample_orders.csv"),
    reason="reference sample data not present")


def _st(*fields):
    return StructType([StructField(n, t) for n, t in fields])


ORDERS_CSV = _st(
    ("order_id", LongType()), ("customer_id", LongType()),
    ("order_date", DateType()), ("order_status", StringType()),
    ("shipping_method", StringType()), ("payment_method", StringType()),
    ("subtotal", DoubleType()), ("tax_amount", DoubleType()),
    ("shipping_cost", DoubleType()), ("discount_amount", DoubleType()),
    ("total_amount", DoubleType()), ("shipping_address", StringType()),
    ("order_priority", StringType()),
)

ITEMS_CSV = _st(
    ("item_id", LongType()), ("order_id", LongType()),
    ("product_id", LongType()), ("quantity", IntegerType()),
    ("unit_price", DoubleType()), ("discount_percent", DoubleType()),
    ("line_total", DoubleType()),
)

CUSTOMERS_CSV = _st(
    ("customer_id", LongType()), ("first_name", StringType()),
    ("last_name", StringType()), ("email", StringType()),
    ("phone", StringType()), ("registration_date", DateType()),
    ("country", StringType()), ("city", StringType()),
    ("customer_segment", StringType()),
)

PRODUCTS_CSV = _st(
    ("product_id", LongType()), ("product_name", StringType()),
    ("category", StringType()), ("subcategory", StringType()),
    ("brand", StringType()), ("unit_price", DoubleType()),
    ("cost_price", DoubleType()), ("stock_quantity", IntegerType()),
    ("weight_kg", DoubleType()), ("supplier_id", IntegerType()),
)


@pytest.fixture(scope="module")
def ref(spark):
    return {
        "orders": read_csv(spark, f"{REF}/sample_orders.csv", ORDERS_CSV),
        "items": read_csv(spark, f"{REF}/sample_order_items.csv", ITEMS_CSV),
        "customers": read_csv(
            spark, f"{REF}/sample_customers.csv", CUSTOMERS_CSV),
        "products": read_csv(spark, f"{REF}/sample_products.csv", PRODUCTS_CSV),
    }


def test_orders_tolerance_golden(spark, ref):
    assert ref["orders"].count() == 1500
    assert T.transform_orders(ref["orders"]).count() == 1284


def test_items_tolerance_golden(spark, ref):
    assert ref["items"].count() == 4474
    assert T.transform_order_items(ref["items"]).count() == 2595


def test_customers_golden(spark, ref):
    assert ref["customers"].count() == 2000
    out = T.transform_customers(ref["customers"])
    assert out.count() == 2000
    # country standardization applied
    countries = {r["country"] for r in out.select("country").distinct().collect()}
    assert "US" not in countries and "Britain" not in countries


def test_products_golden(spark, ref):
    assert ref["products"].count() == 500
    out = T.transform_products(ref["products"])
    assert out.count() == 500
    assert out.filter(F.col("profit_margin") <= 0).count() == 0


def test_orphan_items_golden(spark, ref):
    """372 surviving order_items reference orders dropped by the
    tolerance filter (the reference's unenforced-FK behavior,
    verified in its committed DB)."""
    orders = T.transform_orders(ref["orders"])
    items = T.transform_order_items(ref["items"])
    assert orphan_rows(items, orders, "order_id", "order_id").count() == 372


def test_monthly_sales_analytics_golden(spark, ref):
    """A1 golden from the committed DB (BASELINE.md): 13 month groups
    over Completed orders, 915 orders / 492,040.34 revenue total,
    first group 2024-07 = 74 orders / 36,943.30."""
    orders = T.transform_orders(ref["orders"]).filter(
        F.col("order_status") == "Completed")
    rows = {r["month"]: r for r in (
        orders.groupBy(F.date_format("order_date", "yyyy-MM").alias("month"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("total_amount"), 2).alias("rev"))
        .collect())}
    assert len(rows) == 13
    assert sum(r["n"] for r in rows.values()) == 915
    assert abs(sum(r["rev"] for r in rows.values()) - 492040.34) < 0.05
    assert rows["2024-07"]["n"] == 74
    assert abs(rows["2024-07"]["rev"] - 36943.30) < 0.01


def test_segment_rollup_analytics_golden(spark, ref):
    """A2 golden from the committed DB (BASELINE.md): per-segment
    customer counts and totals AFTER the J2 per-customer rollup."""
    from simpleetlpipeline_spark.operators.joins import rollup_update

    customers = T.transform_customers(ref["customers"])
    completed = T.transform_orders(ref["orders"]).filter(
        F.col("order_status") == "Completed")
    enriched = rollup_update(
        customers.drop("total_orders", "total_spent"), completed,
        dim_key="customer_id", fact_key="customer_id",
        count_col="order_id", sum_col="total_amount")
    seg = {r["customer_segment"]: r for r in (
        enriched.groupBy("customer_segment")
        .agg(F.count(F.lit(1)).alias("n"),
             F.avg("total_spent").alias("avg_spent"),
             F.sum("total_spent").alias("sum_spent"))
        .collect())}
    golden = {
        "Regular": (990, 250.758485, 248250.90),
        "Budget": (585, 230.432855, 134803.22),
        "Premium": (221, 277.568145, 61342.56),
        "VIP": (204, 233.547353, 47643.66),
    }
    assert set(seg) == set(golden)
    for name, (n, avg_s, sum_s) in golden.items():
        assert seg[name]["n"] == n
        assert abs(seg[name]["avg_spent"] - avg_s) < 1e-4
        assert abs(seg[name]["sum_spent"] - sum_s) < 0.05
