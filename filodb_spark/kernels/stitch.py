"""StitchRvsExec analog: merge the same series' samples arriving from
multiple sources (shard splits, remote+local federation, raw+downsample
overlap).

Reference: ``query/src/main/scala/filodb/query/exec/StitchRvsExec.scala``
(:47-95 merge rule): at each timestamp take the non-NaN samples across
sources — exactly one real sample wins; MORE than one is a conflict and
emits NaN (unless the approximately-equal check is enabled and all reals
truncate to the same value at the given decimal tolerance, in which case
one of them wins); none emits NaN.

Spark shape: union + one hash aggregation on (series, t) — map-side
partial counts, no sort, no window function. The disjoint raw/DS stitch
(streaming/downsample.stitch_raw_ds) stays a plain union since its step
sets cannot overlap.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stitch_rvs(frames: Sequence[DataFrame],
               series_cols: Sequence[str] = ("labels",),
               t_col: str = "t", value_col: str = "value",
               approx_equal: bool = False,
               tolerance_decimals: int = 10) -> DataFrame:
    """Merge per-(series, t) samples from several frames.

    Output: one row per (series, t) present in ANY input; NaN value for
    all-stale or conflicting timestamps (callers under the engine's
    NaN-as-stale rendering may filter those rows).
    """
    if not frames:
        raise ValueError("stitch_rvs needs at least one input frame")
    cols = [*series_cols, t_col, value_col]
    allf = reduce(lambda a, b: a.unionByName(b),
                  (f.select(*cols) for f in frames))
    v = F.col(value_col)
    real = F.when(~F.isnan(v) & v.isNotNull(), v)
    weight = float(10 ** tolerance_decimals)
    # (x * 10^d).toLong / 10^d — truncation toward zero, like the
    # reference's approximate-equality normalization (:87)
    truncated = ((real * weight).cast("long") / weight)
    aggs = [F.count(real).alias("_n"),
            F.first(real, ignorenulls=True).alias("_v"),
            F.size(F.collect_set(truncated)).alias("_nd")]
    out = allf.groupBy(*series_cols, t_col).agg(*aggs)
    value = F.when(F.col("_n") == 1, F.col("_v"))
    if approx_equal:
        value = value.when((F.col("_n") > 1) & (F.col("_nd") == 1),
                           F.col("_v"))
    value = value.otherwise(F.lit(float("nan")))
    return out.select(*series_cols, t_col, value.alias(value_col))
