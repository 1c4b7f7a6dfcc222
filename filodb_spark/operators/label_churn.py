"""Label churn finder — the reference's LabelChurnFinder Spark job
re-expressed over the series table.

Reference: ``spark-jobs/src/main/scala/filodb/labelchurnfinder/
LabelChurnFinder.scala`` (:128-207 computeChurnAndUsage): scan part keys
with their retention end-times, explode each series' label pairs, and
per (workspace, label name) count the series active NOW / in the last
3d / 7d plus the distinct-label-VALUE cardinality at each horizon (HLL
sketches in the reference). High 7d-to-active cardinality ratios flag
churny labels feeding the pre-aggregation rule manager.

Spark shape: one groupBy over per-series max-timestamps (map-side
combine), one explode of the label map, one hash aggregation with
conditional counts + approx_count_distinct (the same HLL sketch family
the reference uses). No window functions, no driver-side loops — the
exact plan the reference job runs, minus the Cassandra token-split scan
that parquet partition pruning replaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from filodb_spark.kernels.binary import canonical_labels

DAY_MS = 24 * 3600 * 1000


def label_churn_stats(df: DataFrame, now_ms: int,
                      active_ms: int = 3600_000,
                      horizons_ms: tuple[int, ...] = (3 * DAY_MS, 7 * DAY_MS),
                      ws_label: str = "_ws_",
                      exact: bool = False,
                      labels_col: str = "labels",
                      ts_col: str = "ts") -> DataFrame:
    """Per-(workspace, label name) activity and cardinality stats.

    A series' end-time is its last sample timestamp (the part-key
    endTime analog; a currently-ingesting series has endTime==MaxValue
    in the reference — here "active" means end_ts >= now - active_ms).

    Output columns: ws, label, ats_active, ats_<h>, card_active,
    card_<h>, churn_<h> (= card_<h> / card_active; the reference derives
    the same ratio from its sketch estimates) — one ats/card/churn
    triple per horizon, horizons named in days when whole days.

    `exact=True` swaps approx_count_distinct (HLL, the scale path and
    the reference's sketch) for exact count_distinct — the verifiable
    twin used by the driver oracle.
    """
    labels = F.col(labels_col)
    series = (df.withColumn("_sk", canonical_labels(labels))
                .groupBy("_sk")
                .agg(F.max(ts_col).alias("_end"),
                     F.first(labels_col).alias(labels_col)))
    ws = F.coalesce(labels[ws_label], F.lit("All"))
    kv = series.select(ws.alias("ws"), F.col("_end"),
                       F.explode(labels).alias("label", "label_val"))
    cd = F.count_distinct if exact else F.approx_count_distinct

    def name(h: int) -> str:
        return f"{h // DAY_MS}d" if h % DAY_MS == 0 else f"{h}ms"

    active = F.col("_end") >= F.lit(now_ms - active_ms)
    aggs = [F.count(F.when(active, F.col("label_val"))).alias("ats_active"),
            cd(F.when(active, F.col("label_val"))).alias("card_active")]
    for h in horizons_ms:
        in_h = F.col("_end") >= F.lit(now_ms - h)
        aggs.append(F.count(F.when(in_h, F.col("label_val")))
                    .alias(f"ats_{name(h)}"))
        aggs.append(cd(F.when(in_h, F.col("label_val")))
                    .alias(f"card_{name(h)}"))
    out = kv.groupBy("ws", "label").agg(*aggs)
    for h in horizons_ms:
        out = out.withColumn(
            f"churn_{name(h)}",
            F.col(f"card_{name(h)}") /
            F.greatest(F.col("card_active").cast("double"), F.lit(1.0)))
    return out
