"""Capture .explain("formatted") output for catalog queries into
plan files the optimization-round deliverables require:

    python tools/capture_plans.py --out plans/r12 --suffix after \
        [--repo DIR] query [query ...]

``--repo`` points at the source tree to import the engine from
(default /root/repo) — pointing it at a git worktree of a previous
commit produces the matching "_before" plans for the same queries.

``bpe_train_merges`` is special-cased: its returned DataFrame is a
driver-side createDataFrame of the learned merge table, so its
explain says nothing about the loop. For it we capture the plan of
ONE training round's two frames — the pair-frequency aggregate and
the merge-application projection — reconstructed exactly as the
loop builds them (the variant is auto-detected from the source: the
round-11 form applies merges with an Arrow pandas_udf over symbol
arrays; the round-12 form with a JVM string replace over the
guard-delimited symbol string).
"""

from __future__ import annotations

import argparse
import inspect
import os
import sys


def explain_str(df, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString(mode))


def bpe_round_frames(spark, sf_dir: str):
    """(pairs, applied) frames of BPE round 1, built the way the
    loop in the IMPORTED tree builds them."""
    from pyspark.sql import functions as F

    from simpleetlpipeline_spark.functions import text as text_mod
    from simpleetlpipeline_spark.functions.text import (
        bpe_train_merges, tokens_col)
    from simpleetlpipeline_spark.io import read_table

    src = inspect.getsource(bpe_train_merges)
    words = (read_table(spark, sf_dir, "documents")
             .select(F.explode(tokens_col(F.col("text"))).alias("w"))
             .filter(F.col("w") != "")
             .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))
    a, b = "t", "h"  # a plausible first merge; plan shape is

    # representation-dependent, not value-dependent
    if "F.replace(" in src:  # round-12 JVM-replace variant
        g = "\x01"
        vocab = words.select(
            F.regexp_replace(F.col("w"), "(.)", f"{g}$1{g}").alias("s"),
            "freq")
        syms = F.split(F.col("s").substr(
            F.lit(2), F.length("s") - 2), g + g)
        pairs = (vocab.select(syms.alias("sym"), "freq")
                 .filter(F.size(syms) >= 2)
                 .select(F.explode(F.arrays_zip(
                     F.slice("sym", 1, F.size("sym") - 1).alias("a"),
                     F.slice("sym", 2, F.size("sym") - 1).alias("b")))
                     .alias("p"), "freq")
                 .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                 .agg(F.sum("freq").alias("pf")))
        applied = vocab.select(
            F.replace(F.col("s"), F.lit(f"{g}{a}{g}{g}{b}{g}"),
                      F.lit(f"{g}{a}{b}{g}")).alias("s"), "freq")
        return pairs, applied
    # round-11 Arrow pandas_udf variant
    vocab = words.select(F.split(F.col("w"), "").alias("sym"), "freq")
    n = F.size("sym")
    pairs = (vocab.filter(n >= 2)
             .select(F.explode(F.arrays_zip(
                 F.slice("sym", 1, n - 1).alias("a"),
                 F.slice("sym", 2, n - 1).alias("b"))).alias("p"),
                 "freq")
             .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
             .agg(F.sum("freq").alias("pf")))

    def _apply(sym):
        def merge_one(xs):
            out, i = [], 0
            while i < len(xs):
                if i + 1 < len(xs) and xs[i] == a and xs[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(xs[i])
                    i += 1
            return out
        return sym.map(merge_one)

    apply_merge = F.pandas_udf(_apply, "array<string>")
    applied = vocab.select(apply_merge("sym").alias("sym"), "freq")
    del text_mod
    return pairs, applied


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plans/r12")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--repo", default="/root/repo")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    from simpleetlpipeline_spark.plans import catalog
    from simpleetlpipeline_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    for name in args.queries:
        if name == "bpe_train_merges":
            pairs, applied = bpe_round_frames(spark, args.sf)
            txt = ("== bpe_train_merges: round-1 pair-frequency "
                   "aggregate ==\n" + explain_str(pairs)
                   + "\n== bpe_train_merges: round-1 merge-application "
                   "projection ==\n" + explain_str(applied))
        else:
            df = catalog.QUERIES[name](spark, args.sf)
            txt = explain_str(df)
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
