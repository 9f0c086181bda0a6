"""Skew-aware aggregation (SURVEY.md §7 scale notes; build brief
'salting for skew').

Spark's hash aggregate already does map-side partial combine, which
defuses most key skew for algebraic aggregates. The residual hazard
at 100 TB is a LOW-cardinality groupBy (few reducers own everything)
or a hot key whose partials still swamp one task. salted_agg makes
the standard fix explicit and reusable: stage 1 aggregates on
(keys + pmod(xxhash64(salt-source), n_salts)) spreading each hot key
over n_salts reducers; stage 2 merges the n_salts partials per key.
Only algebraic aggregates (count/sum/min/max, avg as sum/count) can
be merged this way — holistic ones (median, distinct) need different
machinery (approx sketches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (stage1 partial, stage2 merge) expression builders per agg kind.
#: COUNT keeps SQL semantics: count('*') counts rows, count(col)
#: counts non-null values — the partial must look at the column or
#: ('count', col) / the avg decomposition would silently count nulls.
_MERGES = {
    "count": (lambda c: F.count(F.lit(1)) if c in ("*", None, "")
              else F.count(F.col(c)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(df: DataFrame, keys: list[str],
               aggs: dict[str, tuple[str, str]],
               n_salts: int = 32,
               salt_source: Column | None = None) -> DataFrame:
    """Two-stage salted aggregation.

    aggs maps output column -> (kind, input column), kind in
    {count, sum, min, max, avg}. avg decomposes into sum+count
    partials merged as sum(sum)/sum(count).
    """
    expanded: dict[str, tuple[str, str]] = {}
    avg_cols: list[str] = []
    for out, (kind, col) in aggs.items():
        if kind == "avg":
            expanded[f"__{out}_sum"] = ("sum", col)
            expanded[f"__{out}_cnt"] = ("count", col)
            avg_cols.append(out)
        elif kind in _MERGES:
            expanded[out] = (kind, col)
        else:
            raise ValueError(f"non-algebraic aggregate: {kind}")

    salt = F.pmod(
        F.xxhash64(salt_source if salt_source is not None
                   else F.spark_partition_id()),
        F.lit(n_salts)).alias("__salt")
    partial = df.groupBy(*keys, salt).agg(*[
        _MERGES[kind][0](col).alias(out)
        for out, (kind, col) in expanded.items()
    ])
    merged = partial.groupBy(*keys).agg(*[
        _MERGES[kind][1](out).alias(out)
        for out, (kind, col) in expanded.items()
    ])
    for out in avg_cols:
        merged = merged.withColumn(
            out, F.col(f"__{out}_sum") / F.col(f"__{out}_cnt")
        ).drop(f"__{out}_sum", f"__{out}_cnt")
    return merged


def key_skew_report(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Skew diagnosis for a prospective shuffle key: the top-N
    heaviest key values with their share of all rows and the running
    cumulative share.

    This is the report you run BEFORE picking a partitioning/salting
    strategy: a top key owning >1/executor-count of the rows means
    its reducer becomes the stage's straggler, and salted_agg (or
    AQE skew-join splitting) is warranted. Cost: one map-side-combined
    count per key + a broadcast of the single-row total; the top-N
    plans as TakeOrderedAndProject.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__total"))
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n_rows"), F.asc(key))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share",
                    F.floor(F.col("n_rows") / F.col("__total") * 1000000)
                    / 1000000)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .withColumn("cum_share",
                    F.floor(F.sum("n_rows").over(
                        w.rowsBetween(Window.unboundedPreceding, 0))
                        / F.col("__total") * 1000000) / 1000000)
        .select(F.col(key).alias("key"), "rank", "n_rows", "share",
                "cum_share")
    )


def salted_topk(df: DataFrame, keys: list[str], order_by: list[Column],
                k: int, n_salts: int = 16,
                salt_source: Column | None = None) -> DataFrame:
    """Two-phase skew-proof top-k per key.

    A plain `row_number() OVER (PARTITION BY keys ORDER BY ...)`
    sorts EVERY row of a key inside one task — a hot key at 100 TB
    is a straggler or an OOM. Stage 1 ranks within (keys, salt)
    so no task ever sorts more than ~|hot key|/n_salts rows and
    keeps only k survivors per salt; stage 2 re-ranks the <=
    k*n_salts survivors per key — a bounded, trivially small sort.

    Identical results to the single window iff `order_by` is a
    TOTAL order (pass a unique tiebreaker column last) — otherwise
    tied rows at the k boundary may legitimately differ, same as
    any underspecified SQL top-k. Only the final rank column
    `topk_rank` is appended (rename it downstream if needed); a
    pre-existing column of that name is an error (it would be
    silently clobbered otherwise), and the internal temp columns
    pick non-colliding names so the helper composes with its own
    output.
    """
    from pyspark.sql import Window

    rank_col = "topk_rank"
    if rank_col in df.columns:
        raise ValueError(
            f"salted_topk would clobber existing column {rank_col!r}; "
            "rename it first")
    salt_c, r1_c = "__salt", "__r1"
    while salt_c in df.columns:
        salt_c += "_"
    while r1_c in df.columns:
        r1_c += "_"
    # the salt must vary WITHIN a key (salting by key alone spreads
    # nothing): default is a hash of the whole row
    salt = F.pmod(
        salt_source if salt_source is not None
        else F.xxhash64(*[F.col(c) for c in df.columns]),
        F.lit(n_salts))
    w1 = Window.partitionBy(*keys, salt_c).orderBy(*order_by)
    w2 = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(salt_c, salt)
        .withColumn(r1_c, F.row_number().over(w1))
        .filter(F.col(r1_c) <= k)
        .withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
        .drop(salt_c, r1_c)
    )
