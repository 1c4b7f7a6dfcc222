"""Scaling probe for the label-churn finder: per-label activity and
cardinality stats on N-times-replicated series.

Replication axis = MORE DISTINCT SERIES: replica k re-labels every
series (user -> user + k * max_user), so series count grows linearly
while the label-name set stays fixed. The job is two hash aggregations
(per-series max ts, then per-(ws, label) counts + HLL); wall-clock
should grow ~linearly with the multiplier and the output stays at
one row per (ws, label) — the shape that holds on a 1000-executor
cluster where the reference job scans billions of part keys.

Usage: python scripts/scale_check_churn.py [sf_dir] [multipliers...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mults = [int(m) for m in sys.argv[2:]] or [1, 4, 16]

    import filodb_spark
    from pyspark.sql import functions as F
    from filodb_spark.operators.label_churn import label_churn_stats
    from filodb_spark.tsdf import events_labels_ts

    spark = filodb_spark.get_spark("scale-check-churn")
    spark.sparkContext.setLogLevel("ERROR")
    base = events_labels_ts(spark, sf_dir)
    now = base.agg(F.max("ts")).first()[0]
    max_user = base.select(
        F.max(F.col("labels")["user"].cast("long"))).first()[0] or 0

    results = []
    for mult in mults:
        reps = spark.range(mult).select(F.col("id").alias("_rep"))
        df = (base.crossJoin(reps)
              .withColumn(
                  "labels",
                  F.map_concat(
                      F.map_filter(F.col("labels"),
                                   lambda k, _: k != "user"),
                      F.create_map(
                          F.lit("user"),
                          (F.col("labels")["user"].cast("long")
                           + F.col("_rep") * (max_user + 1)).cast("string"))))
              .drop("_rep"))
        t0 = time.time()
        out = label_churn_stats(df, int(now)).collect()
        wall = time.time() - t0
        user_row = next(r for r in out if r["label"] == "user")
        results.append({"mult": mult, "rows": len(out),
                        "card_user_7d": int(user_row["card_7d"]),
                        "sec": round(wall, 2)})
        print(json.dumps(results[-1]))

    base_s = results[0]["sec"]
    print(json.dumps({
        "probe": "label_churn",
        "linear_ok": all(r["sec"] <= base_s * r["mult"] * 1.5 + 2.0
                         for r in results),
        "results": results}))


if __name__ == "__main__":
    main()
