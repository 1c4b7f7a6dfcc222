"""Executor-scale evidence point (r13 verdict item 7).

The driver bench runs at sf0.1 where scans are 2-11 MB and per-query
wall time is dominated by driver-side plan construction plus the AQE
stage floor — every 8-vs-32-core ratio is ~1 and executor-side scale
behavior is unexercised. This script produces the missing evidence: a
deterministic synthetic fixture 50-100x sf0.1 (replicated events with
disjoint user populations AND disjoint series, replicated lineitem,
synthetic distinct-shingle documents), then times the REAL declared
query functions (driver_queries registry, unmodified) against it with
the noop sink, so executor compute dominates and core-count scaling is
measurable.

This is a one-off evidence harness: the generated fixture lives under
/tmp, nothing here is imported by bench.py or any query path, and every
timed run recomputes from the generated parquet.

Usage:
  python scripts/scale_evidence_r14.py gen /tmp/scale_r14 [ev_mult] [li_mult] [n_docs]
  SPARK_GRAFT_CPUS=32 python scripts/scale_evidence_r14.py run /tmp/scale_r14
  SPARK_GRAFT_CPUS=8  python scripts/scale_evidence_r14.py run /tmp/scale_r14
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"

# the bench headline shapes whose 100 TB claims need an executor-bound
# measurement: rate family (grid explode + two-level agg), windowed agg,
# instant, the daily-pair join, scan+agg (q1), and the dedup family
QUERIES = [
    "ts_instant_last",
    "ts_sum_over_time",
    "ts_rate",
    "ts_agg_sum_rate",
    "ts_agg_topk",
    "ts_join_ratio",
    "tpch_q1",
    "doc_dedup_exact",
    "doc_minhash_lsh",
]

RUNS = 3


def gen(out_dir: str, ev_mult: int, li_mult: int, n_docs: int):
    import filodb_spark
    from pyspark.sql import functions as F

    spark = filodb_spark.get_spark("scale-evidence-gen")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    # events: each replica is a disjoint user population AND a disjoint
    # series set (event_type suffixed), so series cardinality scales with
    # the data — the dedupe/lag/explode pipelines shuffle on series keys
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    r = F.explode(F.sequence(F.lit(0), F.lit(ev_mult - 1))).alias("rep")
    scaled = (ev.select("*", r)
                .select((F.col("event_id") + F.col("rep") * 10_000_000)
                        .alias("event_id"),
                        "ts",
                        (F.col("user_id") + F.col("rep") * 10_000_000)
                        .alias("user_id"),
                        F.concat_ws("_", "event_type",
                                    F.col("rep").cast("string"))
                        .alias("event_type"),
                        "value", "props"))
    scaled.repartition(32).write.mode("overwrite") \
        .parquet(f"{out_dir}/events.parquet")

    # ts_join_ratio filters event_type == 'purchase'/'error' exactly; the
    # suffixed replicas would leave only replica 0. Keep replica series
    # distinct for the range-fn family but ALSO write a user-replicated
    # twin with original event_type values for the daily-pair join.
    joined = (ev.select("*", r)
                .select((F.col("event_id") + F.col("rep") * 10_000_000)
                        .alias("event_id"),
                        "ts",
                        (F.col("user_id") + F.col("rep") * 10_000_000)
                        .alias("user_id"),
                        "event_type", "value", "props"))
    joined.repartition(32).write.mode("overwrite") \
        .parquet(f"{out_dir}_users/events.parquet")

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    rl = F.explode(F.sequence(F.lit(0), F.lit(li_mult - 1))).alias("rep")
    (li.select("*", rl)
       .select((F.col("l_orderkey") + F.col("rep") * 100_000_000)
               .alias("l_orderkey"),
               *[c for c in li.columns if c != "l_orderkey"])
       .drop("rep")
       .repartition(32).write.mode("overwrite")
       .parquet(f"{out_dir}/lineitem.parquet"))

    # documents: synthetic distinct-shingle docs (replicating real docs
    # makes every replica pair a near-duplicate — LSH pair volume would
    # grow quadratically, which is a different workload, not scale).
    # 200 tokens per doc from a 5000-token vocab, deterministic in
    # (doc_id, position) via xxhash64.
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(0), F.lit(199)),
            lambda i: F.concat(F.lit("tok"),
                               F.pmod(F.xxhash64(F.col("id"), i),
                                      F.lit(5000)).cast("string"))))
        .alias("text"),
        F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                     (F.pmod(F.xxhash64(F.col("id")), F.lit(3)) + 1)
                     .cast("int")).alias("lang"),
        F.lit("synthetic").alias("source"))
    docs = docs.withColumn("n_chars", F.length("text").cast("long"))
    # a deterministic 2% of docs get an exact twin so doc_dedup_exact
    # has real work beyond the hash-agg scan
    twins = (docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(50)) == 0)
                 .withColumn("doc_id", F.col("doc_id") + n_docs * 10))
    docs.unionByName(twins).repartition(32).write.mode("overwrite") \
        .parquet(f"{out_dir}/documents.parquet")

    n_ev = spark.read.parquet(f"{out_dir}/events.parquet").count()
    n_li = spark.read.parquet(f"{out_dir}/lineitem.parquet").count()
    n_do = spark.read.parquet(f"{out_dir}/documents.parquet").count()
    print(json.dumps({"gen": out_dir, "events": n_ev, "lineitem": n_li,
                      "documents": n_do}))


def run(data_dir: str, only: list[str] | None = None):
    import filodb_spark
    from filodb_spark.driver_queries import all_queries

    names = [q for q in QUERIES if not only or q in only]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = filodb_spark.get_spark("scale-evidence-run")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = all_queries()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()
        return 1

    # events cache build is timed separately (ingest-side term): it is
    # the dedupe shuffle + materialized lag the bench builds untimed
    from filodb_spark.driver_queries.promql_events import _events_cached
    t0 = time.time()
    _events_cached(spark, data_dir).count()
    cache_series = round(time.time() - t0, 2)
    t0 = time.time()
    _events_cached(spark, data_dir + "_users",
                   ("event_type", "user_id")).count()
    cache_users = round(time.time() - t0, 2)

    # full untimed warm-up sweep first (bench.py protocol): JIT tiers,
    # codegen and allocator state settle before the first measurement —
    # without it the first timed queries absorb global settling (the
    # initial run of this script measured ts_sum_over_time with a 22 s
    # max-min spread for exactly that reason)
    for name in names:
        qdir = data_dir + "_users" if name == "ts_join_ratio" else data_dir
        try:
            noop(queries[name](spark, qdir))
        except Exception as exc:
            print(f"# warm-up {name}: {exc}", file=sys.stderr, flush=True)

    timings, spreads = {}, {}
    for name in names:
        qdir = data_dir + "_users" if name == "ts_join_ratio" else data_dir
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"scale-evidence {name}")
        try:
            noop(fn(spark, qdir))          # discarded warm-up
            ts = []
            for _ in range(RUNS):
                t0 = time.time()
                noop(fn(spark, qdir))
                ts.append(time.time() - t0)
            timings[name] = round(statistics.median(ts), 2)
            spreads[name] = round(max(ts) - min(ts), 2)
            print(f"# {name}: {timings[name]}s (spread {spreads[name]}s)",
                  file=sys.stderr, flush=True)
        except Exception as exc:
            timings[name] = None
            print(f"# {name}: FAILED {exc}", file=sys.stderr, flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)

    print(json.dumps({"data_dir": data_dir, "cpus": int(cpus),
                      "cache_build_series_sec": cache_series,
                      "cache_build_users_sec": cache_users,
                      "queries": timings, "spread": spreads,
                      "loadavg": [round(x, 2) for x in os.getloadavg()]}))


if __name__ == "__main__":
    if sys.argv[1] == "gen":
        gen(sys.argv[2],
            int(sys.argv[3]) if len(sys.argv) > 3 else 100,
            int(sys.argv[4]) if len(sys.argv) > 4 else 50,
            int(sys.argv[5]) if len(sys.argv) > 5 else 50_000)
    elif sys.argv[1] == "run":
        run(sys.argv[2], sys.argv[3].split(",") if len(sys.argv) > 3 else None)
    else:
        raise SystemExit(f"unknown subcommand {sys.argv[1]}")
