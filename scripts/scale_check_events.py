"""Scaling probe for the event-analytics family: funnel, cohort
retention, and session transitions on user-replicated events.

Replication shifts user_ids (each replica is a disjoint user
population with identical behavior), so per-user funnel/session
structure is constant while the population grows linearly — the shape
every op here shuffles on. Linear-ish wall-clock = the per-key
joins/windows hold; super-linear would indicate a skewed key or an
accidental cross-user window.

Usage: python scripts/scale_check_events.py [sf_dir] [multipliers...]
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
    from functools import reduce
    from pyspark.sql import functions as F
    from filodb_spark.operators.timeseries import (cohort_retention,
                                                   funnel,
                                                   session_transitions)
    from filodb_spark.tsdf import ts_ms

    spark = filodb_spark.get_spark("scale-check-events")
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_dtype = ev.schema["ts"].dataType
    base = ev.select("user_id", ts_ms(F.col("ts"), ts_dtype).alias("ts"),
                     "event_type", "event_id")
    n_base = base.count()

    def replicate(k: int):
        parts = [base.select(
            (F.col("user_id") + i * 10_000_000).alias("user_id"), "ts",
            "event_type", (F.col("event_id") + i * 10_000_000)
            .alias("event_id")) for i in range(k)]
        return reduce(lambda a, b: a.unionByName(b), parts) \
            .repartition(spark.sparkContext.defaultParallelism) \
            .localCheckpoint(eager=True)

    week = 7 * 24 * 3600 * 1000
    out = {"sf_dir": sf_dir, "base_events": n_base, "points": []}
    for k in mults:
        d = replicate(k)
        t0 = time.time()
        n_f = funnel(d, ["signup", "view", "click", "purchase"],
                     window_ms=week).count()
        t_f = round(time.time() - t0, 2)
        t0 = time.time()
        n_c = cohort_retention(d, period_ms=week).count()
        t_c = round(time.time() - t0, 2)
        t0 = time.time()
        n_t = session_transitions(d, ["user_id"],
                                  gap_ms=12 * 3600 * 1000,
                                  tie_col="event_id").count()
        t_t = round(time.time() - t0, 2)
        pt = {"mult": k, "events": n_base * k, "funnel_s": t_f,
              "funnel_rows": n_f, "cohort_s": t_c, "cohort_rows": n_c,
              "transitions_s": t_t, "transition_rows": n_t}
        out["points"].append(pt)
        print(json.dumps(pt), flush=True)
        d.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
