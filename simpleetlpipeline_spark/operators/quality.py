"""Data-quality profiling (SURVEY.md §2.5 A7-A10) and content hashing.

Reference: DataQualityChecker.check_data_quality (main.py:50-76)
computes per-column null counts, duplicate-row count, and a 0-100
quality score; load_data records an md5 content checksum
(main.py:507).

Spark disposition: the whole profile is TWO distributed passes (one
aggregate for row count + null counts, one distinct-count for
duplicates) regardless of column count — no per-column jobs, no
collect of data rows. The checksum becomes an order-insensitive
64-bit content hash (sum of xxhash64 over canonicalized rows):
pandas' md5(df.to_string()) is order-dependent and impossible to
reproduce distributed, but the *capability* — a content fingerprint
for lineage — is what the metadata table needs (SURVEY.md §7).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


@dataclass
class QualityReport:
    """Mirror of the reference's quality-report dict (main.py:56-66)."""

    table_name: str
    row_count: int
    column_count: int
    null_counts: dict[str, int] = field(default_factory=dict)
    duplicate_rows: int = 0
    quality_score: float = 100.0


def null_counts_expr(df: DataFrame) -> list[F.Column]:
    """A7: per-column null counts as one aggregate projection."""
    return [
        F.sum(F.col(f.name).isNull().cast("long")).alias(f.name)
        for f in df.schema.fields
    ]


def duplicate_row_count(df: DataFrame) -> int:
    """A8: rows minus first occurrences == pandas duplicated().sum()."""
    total = df.count()
    distinct = df.dropDuplicates().count()
    return total - distinct


def quality_score(row_count: int, column_count: int, total_nulls: int,
                  duplicate_rows: int) -> float:
    """A10: reference scoring formula (main.py:68-74), exactly:
    max(0, (cells - missing - dup_rows*ncols) / cells * 100) round 2.
    """
    cells = row_count * column_count
    if cells == 0:
        return 0.0
    score = (cells - total_nulls - duplicate_rows * column_count) / cells * 100
    return round(max(0.0, score), 2)


def check_data_quality(df: DataFrame, table_name: str) -> QualityReport:
    """Full profile in two jobs (A7+A9 fused, then A8)."""
    agg_row: Row = df.agg(
        F.count(F.lit(1)).alias("__rows"), *null_counts_expr(df)
    ).collect()[0]
    row_count = agg_row["__rows"]
    nulls = {f.name: int(agg_row[f.name] or 0) for f in df.schema.fields}
    dup = df.count() - df.dropDuplicates().count() if row_count else 0
    ncols = len(df.columns)
    return QualityReport(
        table_name=table_name,
        row_count=row_count,
        column_count=ncols,
        null_counts=nulls,
        duplicate_rows=dup,
        quality_score=quality_score(row_count, ncols, sum(nulls.values()), dup),
    )


def content_hash(df: DataFrame) -> str:
    """Order-insensitive dataset fingerprint (replaces main.py:507).

    xxhash64 over all columns per row, summed with 64-bit wraparound.
    Commutative, so partition/order changes don't alter it; fully
    distributed (one aggregate, no collect of rows).
    """
    h = df.select(
        F.xxhash64(*[F.col(c).cast("string") for c in df.columns]).alias("h")
    ).agg(F.sum("h").alias("s")).collect()[0]["s"]
    return format((h or 0) & 0xFFFFFFFFFFFFFFFF, "016x")
