"""Driver queries: histogram type over events observations.

Builds cumulative-LE histograms from raw event values per (series,
window), then applies histogram_quantile / bucket-wise sum — the
engine's histogram surface (Histogram.scala semantics) with exact SQL
oracles (interpolation formula mirrored as a CASE chain).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from filodb_spark.driver_queries.promql_events import (_base, _series, STEP,
                                                       WINDOW)
from filodb_spark.kernels.grid import drop_nan, explode_to_steps
from filodb_spark.kernels.histogram import (bucketize, hist_fraction,
                                            hist_quantile, hist_sum)

LES = [1.0, 2.0, 5.0, 10.0, 20.0, 50.0, 100.0, 200.0, 500.0]
Q = 0.9


def q_hist_quantile(spark, sf_dir):
    ev, grid = _series(spark, sf_dir)
    ex = explode_to_steps(drop_nan(ev), grid, WINDOW)
    h = bucketize(ex, ["event_type", "t"], LES)
    return h.select("event_type", "t",
                    F.round(hist_quantile(Q, F.col("hist")), 6).alias("value"))


def q_hist_sum_quantile(spark, sf_dir):
    ev, grid = _series(spark, sf_dir)
    ex = explode_to_steps(drop_nan(ev), grid, WINDOW)
    h = bucketize(ex, ["event_type", "t"], LES)
    summed = hist_sum(h, ["t"])
    return summed.select("t",
                         F.round(hist_quantile(Q, F.col("hist")), 6)
                         .alias("value"))


FRAC_LO, FRAC_HI = 2.0, 100.0   # exact bucket bounds: interpolation is exact
BUCKET_LE = 10.0


def q_hist_fraction(spark, sf_dir):
    """histogram_fraction(lo, hi, h) with lo/hi on bucket boundaries —
    the in-bucket interpolation factor is exactly 1.0, so the result is
    a pure cumulative-count ratio and the SQL oracle is exact."""
    ev, grid = _series(spark, sf_dir)
    ex = explode_to_steps(drop_nan(ev), grid, WINDOW)
    h = bucketize(ex, ["event_type", "t"], LES)
    return h.select(
        "event_type", "t",
        F.round(hist_fraction(FRAC_LO, FRAC_HI, F.col("hist")), 9)
        .alias("value"))


def q_hist_bucket(spark, sf_dir):
    """histogram_bucket(le, h): extract one cumulative bucket as a series
    (InstantFunction.scala:117)."""
    ev, grid = _series(spark, sf_dir)
    ex = explode_to_steps(drop_nan(ev), grid, WINDOW)
    h = bucketize(ex, ["event_type", "t"], LES)
    hc = F.col("hist")
    idx = F.array_position(hc["les"], BUCKET_LE)
    val = F.when(idx > 0, F.element_at(hc["values"], idx.cast("int"))) \
        .otherwise(F.lit(float("nan")))
    return h.select("event_type", "t", val.alias("value"))


def _quantile_case_sql(q: float, group: str, out_group: str) -> str:
    """CASE-chain mirror of Histogram.quantile over conditional-count
    buckets c0..cN (cumulative, cN = total)."""
    sums = ",\n         ".join(
        f"CAST(sum(CASE WHEN value <= {b} THEN 1 ELSE 0 END) AS DOUBLE) AS c{i}"
        for i, b in enumerate(LES))
    whens = []
    for i, b in enumerate(LES):
        lo_le = 0.0 if i == 0 else LES[i - 1]
        lo_cum = "0.0" if i == 0 else f"c{i - 1}"
        whens.append(
            f"WHEN c{i} >= rank THEN {lo_le} + ({b} - {lo_le}) * "
            f"((rank - {lo_cum}) / (c{i} - {lo_cum}))")
    case = "CASE " + " ".join(whens) + f" ELSE {LES[-1]} END"
    sel = f"{group}, t" if group else "t"
    out_sel = f"{out_group}, t" if out_group else "t"
    return f""",
h AS (
  SELECT {sel},
         {sums},
         CAST(count(*) AS DOUBLE) AS ctot
  FROM w GROUP BY {sel}
),
r AS (SELECT *, {q} * ctot AS rank FROM h)
SELECT {out_sel}, round({case}, 6) AS value FROM r"""


QUERIES = {
    "ts_hist_quantile": q_hist_quantile,
    "ts_hist_sum_quantile": q_hist_sum_quantile,
    "ts_hist_fraction": q_hist_fraction,
    "ts_hist_bucket": q_hist_bucket,
}

ORACLES = {
    "ts_hist_quantile": _base(STEP, WINDOW)
        + _quantile_case_sql(Q, "sk", "sk AS event_type"),
    "ts_hist_sum_quantile": _base(STEP, WINDOW) + _quantile_case_sql(Q, "", ""),
    "ts_hist_fraction": _base(STEP, WINDOW) + f"""
SELECT sk AS event_type, t,
       round((CAST(sum(CASE WHEN value <= {FRAC_HI} THEN 1 ELSE 0 END) AS DOUBLE)
              - CAST(sum(CASE WHEN value <= {FRAC_LO} THEN 1 ELSE 0 END) AS DOUBLE))
             / CAST(count(*) AS DOUBLE), 9) AS value
FROM w GROUP BY sk, t""",
    "ts_hist_bucket": _base(STEP, WINDOW) + f"""
SELECT sk AS event_type, t,
       CAST(sum(CASE WHEN value <= {BUCKET_LE} THEN 1 ELSE 0 END) AS DOUBLE) AS value
FROM w GROUP BY sk, t""",
}
