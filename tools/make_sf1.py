"""Build a local sf1 testdata set by 10x-upsampling sf0.1.

The driver ships sf{0.001,0.01,0.1}; the scale claims in the
dedup/similarity docstrings ("linear shuffle", "no quadratic stage")
deserve at least one measured decade, so this tool fabricates an
sf1-sized documents/embeddings/events trio (the tables behind the
bench heavy tail) with the STATISTICAL SHAPE of a 10x corpus rather
than 10 literal copies:

- documents: copy k suffixes every token with `_k`, so each copy's
  shingle universe is disjoint from every other copy's. Per-gram
  document frequencies — the thing the df-capped pair graph and the
  LSH band load are functions of — are therefore IDENTICAL to
  sf0.1's within each copy, and the total workload is exactly 10x:
  the right null hypothesis for a linearity measurement. (Verbatim
  copies would instead collapse in the exact-dedup pre-pass and
  near-dup explode across copies — both non-linear by construction.)
- embeddings: copy k circularly rolls the 64 dims by k. A rolled
  gaussian vector is ~orthogonal to its original (E[cos] = 0), so no
  planted cross-copy near-dups; norms and per-dim distributions are
  preserved.
- events: ids/users offset per copy, ts shifted k seconds; 10x
  users with the same per-user event shape, so streaming state
  grows 10x without changing per-key behavior.

Ids offset by k*10_000_000 (well above any sf0.1 id). Output dir:
$SPARK_GRAFT_SF1_DIR (default /tmp/spark_graft_sf1). Deterministic —
re-running reproduces byte-identical logical content.

Usage: python tools/make_sf1.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

STRIDE = 10_000_000
COPIES = 10
DEFAULT_OUT = "/tmp/spark_graft_sf1"


def _union_copies(base: DataFrame, transform) -> DataFrame:
    out = None
    for k in range(COPIES):
        c = transform(base, k)
        out = c if out is None else out.unionByName(c)
    return out


def upsample_documents(docs: DataFrame) -> DataFrame:
    def copy_k(df, k):
        if k == 0:
            return df
        text = F.regexp_replace("text", r"(\S+)", f"$1_{k}")
        return df.select(
            (F.col("doc_id") + k * STRIDE).alias("doc_id"),
            text.alias("text"),
            "lang", "source",
            F.length(text).cast("long").alias("n_chars"),
        )
    return _union_copies(docs, copy_k)


def upsample_embeddings(emb: DataFrame) -> DataFrame:
    def copy_k(df, k):
        if k == 0:
            return df
        e = F.col("embedding")
        rolled = F.concat(F.slice(e, k + 1, 64 - k), F.slice(e, 1, k))
        return df.select(
            (F.col("vec_id") + k * STRIDE).alias("vec_id"),
            rolled.alias("embedding"),
            "label",
        )
    return _union_copies(emb, copy_k)


def upsample_events(ev: DataFrame) -> DataFrame:
    def copy_k(df, k):
        if k == 0:
            return df
        return df.select(
            (F.col("event_id") + k * STRIDE).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {k} SECONDS")).alias("ts"),
            (F.col("user_id") + k * STRIDE).alias("user_id"),
            "event_type", "value", "props",
        )
    return _union_copies(ev, copy_k)


def upsample_keyed(key_cols: tuple[str, ...]):
    """Generic TPC-H fact/dim upsampler: every copy offsets its id
    columns by k*STRIDE CONSISTENTLY across tables (customer key k in
    orders matches customer key k in customer), so join fan-in per key
    is identical to sf0.1 and the total workload is exactly 10x — the
    same null hypothesis as the documents upsampler. Non-key columns
    (dates, amounts, enums) ride unchanged: per-group bucket counts
    stay fixed while rows-per-bucket grow 10x, which is how TPC-H
    itself scales."""
    def up(df: DataFrame) -> DataFrame:
        def copy_k(d, k):
            if k == 0:
                return d
            return d.select(*[
                (F.col(c) + k * STRIDE).alias(c) if c in key_cols
                else F.col(c)
                for c in d.columns])
        return _union_copies(df, copy_k)
    return up


def passthrough(df: DataFrame) -> DataFrame:
    """region/nation are constant-size at every TPC-H SF — copying
    them unchanged IS the faithful scale behavior (and keeps the
    nation/region broadcast joins broadcast-sized, as at 100 TB)."""
    return df


#: All ten driver tables; single-file layout matching the testdata.
UPSAMPLERS = [
    ("region", passthrough),
    ("nation", passthrough),
    ("customer", upsample_keyed(("c_custkey",))),
    ("supplier", upsample_keyed(("s_suppkey",))),
    ("part", upsample_keyed(("p_partkey",))),
    ("orders", upsample_keyed(("o_orderkey", "o_custkey"))),
    ("lineitem", upsample_keyed(("l_orderkey", "l_partkey", "l_suppkey"))),
    ("documents", upsample_documents),
    ("embeddings", upsample_embeddings),
    ("events", upsample_events),
]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (sys.argv[2] if len(sys.argv) > 2
           else os.environ.get("SPARK_GRAFT_SF1_DIR", DEFAULT_OUT))
    from simpleetlpipeline_spark.io import read_table
    from simpleetlpipeline_spark.session import get_spark

    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    for name, up in UPSAMPLERS:
        # Single-FILE tables, exactly like the driver testdata layout:
        # the streaming source globs on the literal file name
        # (pathGlobFilter=events.parquet), so a directory table would
        # silently stream zero rows.
        tmp = os.path.join(out, f".{name}.tmpdir")
        dst = os.path.join(out, f"{name}.parquet")
        df = up(read_table(spark, src, name))
        # 8 MB row groups (default 128 MB): a single-file table with
        # ONE giant row group cannot be split — every scan of the
        # round-8 fixture's 113 MB lineitem ran as a single task,
        # which is what the old sf1 "ratio ~7" tail actually
        # measured. Many row groups + the session's 16 MB
        # maxPartitionBytes give the 10x fixture the parallel-scan
        # behavior any real at-scale table has.
        (df.coalesce(1).write.mode("overwrite")
         .option("parquet.block.size", str(8 << 20))
         .parquet(tmp))
        part = next(p for p in os.listdir(tmp)
                    if p.startswith("part-") and p.endswith(".parquet"))
        if os.path.isdir(dst):
            import shutil
            shutil.rmtree(dst)
        os.replace(os.path.join(tmp, part), dst)
        import shutil
        shutil.rmtree(tmp)
        print(f"{name}: {spark.read.parquet(dst).count()} rows -> {dst}")
    spark.stop()


if __name__ == "__main__":
    main()
