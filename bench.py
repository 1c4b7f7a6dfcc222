"""Benchmark harness: runs headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "ts_instant_last",      # raw selector + staleness lookback
    "ts_sum_over_time",     # windowed agg
    "ts_rate",              # extrapolated rate w/ reset correction
    "ts_agg_sum_rate",      # sum(rate(...)) — the QueryInMemoryBenchmark shape
    "ts_quantile_over_time",
    "ts_agg_topk",
    "ts_join_ratio",        # vector-vector join
    "tpch_q1",
    "tpch_q5",
    "doc_dedup_exact",
    "doc_minhash_lsh",
    "ann_bruteforce",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = sf_dir

    import filodb_spark
    from filodb_spark.driver_queries import all_queries
    spark = filodb_spark.get_spark("filodb-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries, _ = all_queries()
    # warm-up: JVM/codegen/file-index init out of the timed path
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    timings = {}
    total = 0.0
    for name in HEADLINE:
        fn = queries[name]
        # warm the plan (parquet footer reads etc.) without timing data scan
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.2f}s rows={n}", file=sys.stderr)

    print(json.dumps({
        "metric": "headline_query_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
