"""Unit tests for the transform catalog (SURVEY.md §2.2-2.3).

Golden values mirror the reference's verified behavior on its own
sample data (SURVEY.md §2.3: the +-0.01 tolerance filters are
load-bearing — they drop inconsistent rows).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from simpleetlpipeline_spark.operators import transforms as T


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_trim_string_columns(spark):
    df = spark.createDataFrame(
        [("  a  ", 1), ("b ", 2), (None, 3)], ["s", "i"])
    got = {r["i"]: r["s"] for r in T.trim_string_columns(df).collect()}
    # Spark-native null semantics: null stays null (intentional
    # deviation from pandas astype(str) -> 'nan'; SURVEY.md §7).
    assert got == {1: "a", 2: "b", 3: None}


def test_standardize_values_country_map(spark):
    df = spark.createDataFrame(
        [("US",), ("United States",), ("UK",), ("Britain",), ("France",), (None,)],
        ["country"])
    got = [r["country"] for r in T.standardize_values(df, "country", T.COUNTRY_MAP).collect()]
    assert got == ["USA", "USA", "United Kingdom", "United Kingdom", "France", None]


def test_parse_date(spark):
    df = spark.createDataFrame([("2024-03-05",)], ["d"])
    out = T.parse_date(df, "d")
    assert out.schema["d"].dataType.simpleString() == "date"
    assert str(out.collect()[0]["d"]) == "2024-03-05"


def test_derive_profit_margin(spark):
    df = spark.createDataFrame([(100.0, 60.0)], ["unit_price", "cost_price"])
    assert T.derive_profit_margin(df).collect()[0]["profit_margin"] == 40.0


def test_clamp_floor(spark):
    df = spark.createDataFrame([(-5,), (0,), (7,)], ["stock_quantity"])
    got = [r["stock_quantity"] for r in T.clamp_floor(df, "stock_quantity").collect()]
    assert got == [0, 0, 7]


def test_filter_valid_email(spark):
    df = spark.createDataFrame(
        [("a@b.com",), ("nope",), (None,)], ["email"])
    got = [r["email"] for r in T.filter_valid_email(df).collect()]
    assert got == ["a@b.com"]


def test_drop_all_null_rows(spark):
    df = spark.createDataFrame(
        [(None, None), ("x", None), (None, 1)], ["a", "b"])
    assert T.drop_all_null_rows(df).count() == 2


def test_filter_positive_and_non_negative(spark):
    df = spark.createDataFrame([(1.0, 0.0), (0.0, 5.0), (2.0, -1.0)], ["p", "q"])
    assert T.filter_positive(df, "p").count() == 2
    assert T.filter_positive(df, "p", "q").count() == 0  # q=0 not > 0
    assert T.filter_non_negative(df, "p", "q").count() == 2


def test_tolerance_filter_semantics(spark):
    """F5: |total - (sub+tax+ship-disc)| < 0.01, reference main.py:483-484."""
    df = spark.createDataFrame(
        [
            (100.0, 90.0, 5.0, 5.0, 0.0),     # exact -> keep
            (100.0, 90.0, 5.0, 5.0, 0.005),   # off by .005 -> keep
            (100.0, 90.0, 5.0, 5.0, 0.02),    # off by .02 -> drop
        ],
        ["total_amount", "subtotal", "tax_amount", "shipping_cost", "x"],
    ).withColumn("discount_amount", F.col("x")).drop("x")
    out = T.filter_tolerance(df, "total_amount", T.recomputed_order_total())
    assert out.count() == 2


def test_transform_orders_pipeline(spark):
    cols = ["order_id", "customer_id", "order_date", "order_status",
            "shipping_method", "payment_method", "subtotal", "tax_amount",
            "shipping_cost", "discount_amount", "total_amount"]
    good = (1, 10, "2024-01-02", "Completed", "Standard", "PayPal",
            90.0, 5.0, 5.0, 0.0, 100.0)
    bad_tolerance = (2, 11, "2024-01-03", "Completed", "Standard", "PayPal",
                     90.0, 5.0, 5.0, 0.0, 120.0)
    bad_negative = (3, 12, "2024-01-04", "Completed", "Standard", "PayPal",
                    -1.0, 5.0, 5.0, 0.0, 9.0)
    df = spark.createDataFrame([good, bad_tolerance, bad_negative], cols)
    out = T.transform_orders(df)
    assert [r["order_id"] for r in out.collect()] == [1]
    assert out.schema["order_date"].dataType.simpleString() == "date"


def test_transform_order_items_pipeline(spark):
    cols = ["item_id", "order_id", "product_id", "quantity", "unit_price",
            "discount_percent", "line_total"]
    good = (1, 1, 1, 2, 10.0, 0.0, 20.0)
    bad_qty = (2, 1, 1, 0, 10.0, 0.0, 0.0)
    bad_total = (3, 1, 1, 2, 10.0, 0.0, 25.0)  # 25 != 20 beyond tolerance
    df = spark.createDataFrame([good, bad_qty, bad_total], cols)
    out = T.transform_order_items(df)
    assert [r["item_id"] for r in out.collect()] == [1]


def test_transform_customers_pipeline(spark):
    cols = ["customer_id", "first_name", "last_name", "email", "phone",
            "registration_date", "country", "city", "customer_segment"]
    df = spark.createDataFrame(
        [
            (1, " A ", "B", "a@b.com", "1", "2024-01-01", "US", "NYC", "VIP"),
            (2, "C", "D", "invalid", "2", "2024-01-01", "UK", "LDN", "Regular"),
        ],
        cols)
    out = T.transform_customers(df)
    got = out.collect()
    assert len(got) == 1  # email without '@' dropped
    row = got[0]
    assert row["first_name"] == "A"           # trimmed
    assert row["country"] == "USA"            # standardized
    assert row["total_orders"] == 0 and row["total_spent"] == 0.0


def test_transform_products_keeps_margin_as_query_column(spark):
    cols = ["product_id", "product_name", "category", "subcategory", "brand",
            "unit_price", "cost_price", "stock_quantity", "weight_kg",
            "supplier_id"]
    df = spark.createDataFrame(
        [
            (1, "P1", "C", "S", "B", 100.0, 60.0, -3, 1.0, 1),
            (2, "P2", "C", "S", "B", 0.0, 60.0, 5, 1.0, 1),   # dropped: price<=0
        ],
        cols)
    out = T.transform_products(df)
    got = out.collect()
    assert len(got) == 1
    assert got[0]["profit_margin"] == 40.0
    assert got[0]["stock_quantity"] == 0  # clamped
