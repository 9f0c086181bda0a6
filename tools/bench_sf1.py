"""Scale smoke: measure the bench heavy tail at sf0.1 AND the
upsampled sf1 (tools/make_sf1.py) and record the growth ratio.

The point is the DECADE, not the absolute numbers: every query below
claims a linear (or n log n) scale story in its docstring, so its
wall-clock at 10x the data should grow ~10x plus constant overheads.
The recorded artifact (BENCH_sf1.json) carries both timings, the
ratio, and a pass/fail flag at ratio <= 15 (10x data, 1.5x allowance
for fixed per-query overheads, AQE re-planning, and this VM's
documented 20% run-to-run variance).

Excluded by design: embedding_neardup (exact all-pairs — quadratic
by construction and guarded at scale; embedding_neardup_lsh is its
scale path and IS measured), etl_pipeline_run (generator-driven, has
its own sf knob).

Usage: python tools/bench_sf1.py  (expects make_sf1.py output at
$SPARK_GRAFT_SF1_DIR, default /tmp/spark_graft_sf1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: The measured set: the most expensive catalog entries over the
#: three upsampled tables (documents/embeddings/events).
HEAVY_TAIL = [
    "dedup_pairs_all",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_clusters_exact",
    "dedup_simhash",
    "tfidf_top_terms",
    "doc_logprob",
    "bigram_pmi",
    "ann_topk",
    "ann_ivf_topk",
    "embedding_neardup_lsh",
    "kmeans_assign",
    "streaming_purchase_view_join",
    "streaming_user_totals_stateful",
]

RATIO_LIMIT = 15.0


def run_set(spark, sf_dir: str) -> dict[str, dict]:
    from simpleetlpipeline_spark.cache import release_caches
    from simpleetlpipeline_spark.plans import catalog

    out: dict[str, dict] = {}
    for name in HEAVY_TAIL:
        best, n = None, 0
        # Best of 2: a scale RATIO is meaningless if one side ate a
        # one-time cost (codegen for the new plan, GC growth from the
        # previous query, Python worker respawn) — observed as a
        # phantom 17x on a query that is flat when warm.
        for _ in range(2):
            t0 = time.perf_counter()
            n = catalog.QUERIES[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            # Release cross-query caches between runs so each query is
            # charged its own full pipeline (the catalog bench
            # amortizes them; here isolation beats realism).
            release_caches()
        out[name] = {"sec": round(best, 3), "rows": n}
    return out


def main() -> None:
    sf01 = "/root/testdata/sf0.1"
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
    if not os.path.exists(os.path.join(sf1, "documents.parquet")):
        raise SystemExit(f"run tools/make_sf1.py first (no data at {sf1})")

    from simpleetlpipeline_spark.plans import catalog
    from simpleetlpipeline_spark.session import get_spark

    spark = get_spark("bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm-up (JVM, codegen, Python worker pool, streaming machinery)
    # — same reasoning as bench.py.
    catalog.QUERIES["dedup_exact"](spark, "/root/testdata/sf0.001").count()
    catalog.QUERIES["media_meta_extract"](
        spark, "/root/testdata/sf0.001").count()
    catalog.QUERIES["streaming_events_hourly"](
        spark, "/root/testdata/sf0.001").collect()

    t01 = run_set(spark, sf01)
    t1 = run_set(spark, sf1)

    queries = {}
    worst = 0.0
    for name in HEAVY_TAIL:
        a, b = t01[name], t1[name]
        ratio = round(b["sec"] / max(a["sec"], 1e-3), 2)
        worst = max(worst, ratio)
        queries[name] = {
            "sf0.1_sec": a["sec"], "sf1_sec": b["sec"],
            "sf0.1_rows": a["rows"], "sf1_rows": b["rows"],
            "ratio": ratio, "linear_ok": ratio <= RATIO_LIMIT,
        }
    result = {
        "metric": "sf1_over_sf0.1_runtime_ratio",
        "value": worst,
        "unit": "ratio",
        "ratio_limit": RATIO_LIMIT,
        "all_linear_ok": all(q["linear_ok"] for q in queries.values()),
        "queries": queries,
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_sf1.json"), "w") as fh:
        json.dump(result, fh, indent=1)
        fh.write("\n")
    print(json.dumps(result, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
