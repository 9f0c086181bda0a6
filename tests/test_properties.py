"""Property-based invariants (SURVEY.md §5 item 4) via hypothesis.

Few examples per property (each round-trips through Spark), chosen
to hit the structural edges: empty tables, all-null rows, duplicate
rows, epsilon monotonicity.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

from simpleetlpipeline_spark.operators.quality import (
    check_data_quality, content_hash,
)
from simpleetlpipeline_spark.operators.transforms import filter_tolerance

SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("s", StringType()),
    StructField("v", DoubleType()),
])

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-10, max_value=10),
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        st.one_of(st.none(),
                  st.floats(min_value=-100, max_value=100,
                            allow_nan=False, allow_infinity=False)),
    ),
    max_size=25,
)

SET = settings(max_examples=8, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(rows=rows_strategy)
@SET
def test_quality_score_bounded(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    report = check_data_quality(df, "t")
    assert 0.0 <= report.quality_score <= 100.0
    assert report.duplicate_rows >= 0
    assert all(0 <= n <= report.row_count for n in report.null_counts.values())


@given(rows=st.lists(
    st.tuples(st.integers(-5, 5), st.just("x"),
              st.floats(0, 10, allow_nan=False)), min_size=1, max_size=20))
@SET
def test_content_hash_order_insensitive(spark, rows):
    df1 = spark.createDataFrame(rows, SCHEMA).repartition(4)
    df2 = spark.createDataFrame(list(reversed(rows)), SCHEMA).repartition(2)
    assert content_hash(df1) == content_hash(df2)


def test_content_hash_distinguishes_null_position(spark):
    """('a', NULL) vs (NULL, 'a') must hash differently — xxhash64
    skips null args, so a non-canonicalized hash would collapse
    them (ADVICE r1)."""
    df1 = spark.createDataFrame([("a", None)], "x string, y string")
    df2 = spark.createDataFrame([(None, "a")], "x string, y string")
    assert content_hash(df1) != content_hash(df2)
    r1 = check_data_quality(df1, "t", with_content_hash=True)
    r2 = check_data_quality(df2, "t", with_content_hash=True)
    assert r1.content_hash != r2.content_hash
    # and the lineage hash equals the standalone fingerprint
    assert r1.content_hash == content_hash(df1)


@given(rows=st.lists(
    st.tuples(st.floats(0, 100, allow_nan=False),
              st.floats(0, 100, allow_nan=False)), max_size=25),
    eps_small=st.floats(0.001, 0.01), eps_big=st.floats(0.02, 1.0))
@SET
def test_tolerance_filter_monotone_in_epsilon(spark, rows, eps_small, eps_big):
    """Rows kept at epsilon e1 <= rows kept at e2 when e1 <= e2."""
    schema = StructType([StructField("actual", DoubleType()),
                         StructField("expected", DoubleType())])
    df = spark.createDataFrame(rows, schema)
    kept_small = filter_tolerance(
        df, "actual", F.col("expected"), tolerance=eps_small).count()
    kept_big = filter_tolerance(
        df, "actual", F.col("expected"), tolerance=eps_big).count()
    assert kept_small <= kept_big
