"""Scale probe: pre-aggregation routing under the producer's output at
shape (r7 verdict item 6).

The r7 preagg producer closed the routing loop functionally
(TestRouterLoop); this probe exercises it at shape: a SKEWED metric
(one hot workspace holds ~90% of the series) across a 100x sample
density sweep, measuring sum-by-retained-label query wall time with
the router ON (preagg mounted + fresh watermark) vs OFF
(no_optimize(...) — the reference's hint, LogicalPlan.scala:74-119),
and asserting the answers agree inside the freshness watermark.

Expected: the raw path grows with density (it re-aggregates every
sample under the window); the routed path is ~flat (it reads
O(buckets x retained-groups) preagg rows — density folded in at
publish time). The skew rides along untouched: preagg output is
grouped by the retained labels, so the hot workspace collapses to the
same group count as the cold ones.

Usage: python scripts/scale_check_preagg.py [densities...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from filodb_spark.promql.compiler import AggRule, PromQLEngine, TsStore
from filodb_spark.session import get_spark
from filodb_spark.streaming.preagg import build_preagg, preagg_ready_until

T0 = 1_704_067_200_000
HOURS = 4
RES = 300_000            # 5m publish resolution
WINDOW_MS = 1_800_000    # 30m query window
STEP_MS = 600_000        # 10m step
N_JOBS = 8
BASE_SERIES = 400        # per density; 90% land in the hot workspace


def corpus(spark, density: int):
    """BASE_SERIES series, each with HOURS*density*12 samples (scrape
    = 5m/density); instance cardinality is skewed onto ws 'hot'."""
    scrape = RES // (12 * density) * 12  # keep divisor of RES
    scrape = max(scrape, 1_000)
    n = HOURS * 3_600_000 // scrape
    return (spark.range(BASE_SERIES * n)
            .select(F.create_map(
                        F.lit("__name__"), F.lit("cpu"),
                        F.lit("_ws_"),
                        F.when((F.col("id") % BASE_SERIES) % 10 < 9,
                               F.lit("hot")).otherwise(F.lit("cold")),
                        F.lit("job"),
                        F.concat(F.lit("j"), ((F.col("id") % BASE_SERIES)
                                              % N_JOBS).cast("string")),
                        F.lit("instance"),
                        (F.col("id") % BASE_SERIES).cast("string"))
                    .alias("labels"),
                    (F.lit(T0) + (F.col("id") / BASE_SERIES).cast("long")
                     * scrape).alias("ts"),
                    (F.col("id") % 997).cast("double").alias("value")))


def main() -> None:
    densities = [int(x) for x in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark("scale-check-preagg", shuffle_partitions=32)
    rules = {"cpu": (AggRule(suffix="byjob", include=frozenset({"job"})),)}
    q = "sum by (job) (sum_over_time(cpu[30m]))"
    print(f"{'density':>8} {'samples':>12} {'raw_s':>8} {'routed_s':>9} "
          f"{'max_rel_diff':>13}")
    for d in densities:
        raw = corpus(spark, d).cache()
        n = raw.count()
        pre = build_preagg(raw, rules, RES).cache()
        pre.count()
        ready = preagg_ready_until(pre, RES)
        store = TsStore(raw.unionByName(pre), agg_rules=rules,
                        preagg_ready_until_ms=ready)
        eng = PromQLEngine(spark, store, lookback_ms=WINDOW_MS)
        # grid instants sit 1ms off the bucket boundary (tTime
        # convention): the inclusive raw window [t-w, t] must not pick
        # up the boundary sample that lives in the next bucket
        # (same offset as TestRouterLoop)
        start = T0 + WINDOW_MS - 1
        hi = min(ready, T0 + HOURS * 3_600_000) - 1
        end = start + ((hi - start) // STEP_MS) * STEP_MS

        def run(promql: str):
            t0 = time.time()
            rows = eng.query_range(promql, start, end, STEP_MS).collect()
            return time.time() - t0, {(r["labels"]["job"], r["t"]):
                                      r["value"] for r in rows}

        run(q), run(f"no_optimize({q})")  # warm both plans
        routed_s, routed = run(q)
        raw_s, raw_ans = run(f"no_optimize({q})")
        assert routed.keys() == raw_ans.keys(), "key sets diverge"
        rel = max(abs(routed[k] - raw_ans[k])
                  / max(abs(raw_ans[k]), 1e-12) for k in routed)
        assert rel < 1e-9, f"routed answer diverges: {rel}"
        print(f"{d:>8} {n:>12} {raw_s:>8.2f} {routed_s:>9.2f} {rel:>13.2e}")
        raw.unpersist()
        pre.unpersist()
    print("expected: raw_s grows with density; routed_s flat; diffs ~0")


if __name__ == "__main__":
    main()
