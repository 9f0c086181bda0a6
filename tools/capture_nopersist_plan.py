"""Capture .explain("formatted") of a catalog query's FULL lineage
with DataFrame.persist()/count() neutralized, for queries that
eagerly materialize an internal cache (the MinHash-LSH family):
their returned frame otherwise explains as an InMemoryTableScan,
hiding the pipeline the optimization actually changed. Usage:

    python tools/capture_nopersist_plan.py --out plans/r12 \
        --suffix after query [query...]

persist() becomes a no-op (returns self) and count() returns 0
during CONSTRUCTION only — count()'s value feeds nothing that
changes plan shape in these queries (connected_components' regime
probe is downstream of the returned frame, and the in-function
counts are pure materialization ordering).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plans/r12")
    ap.add_argument("--suffix", default="after")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from pyspark.sql import DataFrame

    from simpleetlpipeline_spark.plans import catalog
    from simpleetlpipeline_spark.session import get_spark

    spark = get_spark("capture-nopersist")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    orig_persist, orig_count = DataFrame.persist, DataFrame.count
    DataFrame.persist = lambda self, *a, **k: self
    DataFrame.count = lambda self: 0
    try:
        frames = {name: catalog.QUERIES[name](spark, args.sf)
                  for name in args.queries}
    finally:
        DataFrame.persist, DataFrame.count = orig_persist, orig_count

    for name, df in frames.items():
        txt = df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
