"""Transform catalog — projections and filters (SURVEY.md §2.2-2.3).

Each operator is a pure DataFrame -> DataFrame function built from
pyspark.sql.functions only (JVM-side, whole-stage-codegen friendly;
no Python UDFs), so chains of them stay inside a single codegen
stage and filters are pushed to the parquet/CSV scan by Catalyst.

Per-table pipelines at the bottom mirror the reference's transform
dispatch (reference main.py:413-420 -> _transform_customers
m:437-455, _transform_products m:457-470, _transform_orders
m:472-486, _transform_order_items m:488-499), including the
behaviorally load-bearing +-0.01 float-tolerance filters
(m:483-484, m:496-497).

Intentional deviation (SURVEY.md §7): the reference's
.astype(str).str.strip() turns NaN into the literal string 'nan'
(m:430); we keep Spark-native null semantics (trim preserves null).
Reference sample data has no nulls, so parity goldens are unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# Reference main.py:443-447 country standardization map (P2).
COUNTRY_MAP = {
    "US": "USA",
    "United States": "USA",
    "UK": "United Kingdom",
    "Britain": "United Kingdom",
}

MONEY_TOLERANCE = 0.01  # reference main.py:484,497 — float money, not Decimal


# --- P-series: projections / derived columns ------------------------------

def trim_string_columns(df: DataFrame) -> DataFrame:
    """P1: whitespace-trim every string column (reference main.py:428-430).

    One narrow projection — no shuffle, stays in codegen.
    """
    return df.select(*[
        F.trim(F.col(f.name)).alias(f.name)
        if isinstance(f.dataType, StringType) else F.col(f.name)
        for f in df.schema.fields
    ])


def standardize_values(df: DataFrame, column: str,
                       mapping: dict[str, str]) -> DataFrame:
    """P2: dict-replace on a column (reference main.py:443-447).

    Expressed as a when-chain so Catalyst constant-folds it; for a
    huge mapping a broadcast-join against a mapping table would be
    the scale path, but reference maps are 4 entries.
    """
    expr = None
    for src, dst in mapping.items():
        cond = F.col(column) == F.lit(src)
        expr = F.when(cond, F.lit(dst)) if expr is None else expr.when(cond, F.lit(dst))
    if expr is None:
        return df
    return df.withColumn(column, expr.otherwise(F.col(column)))


def parse_date(df: DataFrame, column: str, fmt: str = "yyyy-MM-dd") -> DataFrame:
    """P3: string -> DateType (reference main.py:450,475)."""
    return df.withColumn(column, F.to_date(F.col(column), fmt))


def init_constant(df: DataFrame, column: str, value) -> DataFrame:
    """P4: constant-initialized column (reference main.py:453-454)."""
    return df.withColumn(column, F.lit(value))


def derive_profit_margin(df: DataFrame,
                         price: str = "unit_price",
                         cost: str = "cost_price",
                         out: str = "profit_margin") -> DataFrame:
    """P5: margin %% = (price-cost)/price*100 rounded 2dp (main.py:465)."""
    return df.withColumn(
        out, F.round((F.col(price) - F.col(cost)) / F.col(price) * 100, 2))


def clamp_floor(df: DataFrame, column: str, floor: float = 0) -> DataFrame:
    """P6: clamp values below floor up to floor (reference main.py:468)."""
    return df.withColumn(column, F.greatest(F.lit(floor), F.col(column)))


def recomputed_order_total(subtotal="subtotal", tax="tax_amount",
                           shipping="shipping_cost",
                           discount="discount_amount") -> F.Column:
    """P7a: expected order total expression (reference main.py:483)."""
    return F.col(subtotal) + F.col(tax) + F.col(shipping) - F.col(discount)


def recomputed_line_total(qty="quantity", price="unit_price",
                          disc_pct="discount_percent") -> F.Column:
    """P7b: expected line total expression (reference main.py:496)."""
    return F.col(qty) * F.col(price) * (1 - F.col(disc_pct) / 100)


# --- F-series: filters / predicates ---------------------------------------

def drop_all_null_rows(df: DataFrame) -> DataFrame:
    """F1: drop rows where every column is null (reference main.py:433)."""
    return df.na.drop(how="all")


def filter_valid_email(df: DataFrame, column: str = "email") -> DataFrame:
    """F2: keep rows whose email contains '@' (reference main.py:440)."""
    return df.filter(F.col(column).contains("@"))


def filter_positive(df: DataFrame, *columns: str) -> DataFrame:
    """F3/F7: conjunctive col > 0 filters (reference main.py:461-462,491)."""
    cond = F.lit(True)
    for c in columns:
        cond = cond & (F.col(c) > 0)
    return df.filter(cond)


def filter_non_negative(df: DataFrame, *columns: str) -> DataFrame:
    """F4: conjunctive col >= 0 filters (reference main.py:477-480)."""
    cond = F.lit(True)
    for c in columns:
        cond = cond & (F.col(c) >= 0)
    return df.filter(cond)


def filter_tolerance(df: DataFrame, actual: str, expected: F.Column,
                     tolerance: float = MONEY_TOLERANCE) -> DataFrame:
    """F5/F6: |actual - expected| < tolerance (main.py:483-484,496-497).

    Behaviorally load-bearing in the reference: drops 216/1500
    sample orders and 1879/4474 sample items (SURVEY.md §2.3).
    """
    return df.filter(F.abs(F.col(actual) - expected) < tolerance)


# --- Per-table pipelines (reference transform dispatch m:413-420) ---------

def transform_customers(df: DataFrame) -> DataFrame:
    """Reference _transform_customers (main.py:437-455)."""
    df = trim_string_columns(df)
    df = drop_all_null_rows(df)
    df = filter_valid_email(df)
    df = standardize_values(df, "country", COUNTRY_MAP)
    df = parse_date(df, "registration_date")
    df = init_constant(df, "total_orders", 0)
    df = init_constant(df, "total_spent", 0.0)
    return df


def transform_products(df: DataFrame) -> DataFrame:
    """Reference _transform_products (main.py:457-470).

    Keeps the derived profit_margin as a query-layer column; the
    load step projects it away (fixes the reference's verified
    products-load failure, SURVEY.md §3).
    """
    df = trim_string_columns(df)
    df = drop_all_null_rows(df)
    df = filter_positive(df, "unit_price", "cost_price")
    df = derive_profit_margin(df)
    df = clamp_floor(df, "stock_quantity", 0)
    return df


def transform_orders(df: DataFrame) -> DataFrame:
    """Reference _transform_orders (main.py:472-486)."""
    df = trim_string_columns(df)
    df = drop_all_null_rows(df)
    df = parse_date(df, "order_date")
    df = filter_non_negative(
        df, "subtotal", "tax_amount", "shipping_cost", "total_amount")
    df = filter_tolerance(df, "total_amount", recomputed_order_total())
    return df


def transform_order_items(df: DataFrame) -> DataFrame:
    """Reference _transform_order_items (main.py:488-499)."""
    df = trim_string_columns(df)
    df = drop_all_null_rows(df)
    df = filter_positive(df, "quantity")
    df = filter_non_negative(df, "unit_price", "line_total")
    df = filter_tolerance(df, "line_total", recomputed_line_total())
    return df


TRANSFORM_DISPATCH = {
    "customers": transform_customers,
    "products": transform_products,
    "orders": transform_orders,
    "order_items": transform_order_items,
}
