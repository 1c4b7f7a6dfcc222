"""Per-query statistics and warnings (reference: QueryStats /
QueryWarnings, core/src/main/scala/filodb.core/query/
QueryContext.scala:59-110,385-470; rendered into the Prometheus JSON
response as queryStats / queryWarnings by
prometheus/.../query/PrometheusModel.scala:102-115,240-256 and
query/src/main/scala/filodb/query/PromQueryResponse.scala:10-31).

Spark-first mapping: the reference counts samples/series at each leaf
as its chunk iterators run; here each leaf scan gets a
`DataFrame.observe` metric node — accumulator-style, computed by the
SAME job that executes the query, no extra pass, no extra shuffle.
Groups are keyed by metric name (the reference uses
(clusterType, dataset, ws, ns, metric); we have no cluster/dataset
axis). dataBytesScanned is reported as samples x 16 bytes (one long ts
+ one double value) — the uncompressed-sample volume; the reference
counts compressed chunk bytes, which have no Spark-side equivalent
without a listener. cpuNanos is the driver-observed wall time of
execute+render for the whole query, attributed to the head group like
the reference's Nil-group convention.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from filodb_spark.kernels.binary import canonical_labels

SAMPLE_BYTES = 16      # long ts + double value


class QueryStatsCollector:
    """Collects one Observation per leaf scan; `groups()` resolves them
    after the query's action has run (Observation.get blocks until the
    first action that executed the observed node completes)."""

    def __init__(self):
        self._obs: list[tuple[tuple[str, ...], Observation]] = []
        self.cpu_nanos: int = 0
        self.result_bytes: int = 0

    def observe_scan(self, df: DataFrame, group: tuple[str, ...]) -> DataFrame:
        obs = Observation(f"filodb_scan_{len(self._obs)}")
        self._obs.append((group, obs))
        return df.observe(
            obs,
            F.count(F.lit(1)).alias("samples"),
            F.approx_count_distinct(
                canonical_labels(F.col("labels"))).alias("series"))

    def groups(self) -> list[dict]:
        """One dict per leaf group, reference QueryStatistics shape
        (PromQueryResponse.scala:20-21). Leaves whose observed node was
        pruned from the executed plan (e.g. a selector folded away)
        report zeros rather than blocking."""
        out: dict[tuple, dict] = {}
        for group, obs in self._obs:
            samples = series = 0
            # non-blocking probe first: a leaf whose observed node was
            # pruned (or never acted on) must report zeros, not hang —
            # Observation.get alone would block forever on it. Once the
            # probe confirms the metrics exist, Observation.get returns
            # immediately (and handles schema-less empty-result rows).
            try:
                jopt = obs._jo.getRowOrEmpty() if obs._jo is not None else None
                if jopt is not None and jopt.isDefined():
                    # positional read (samples, series — the observe expr
                    # order): the metrics row of an empty scan comes back
                    # schema-less, which breaks name-based access; a leaf
                    # whose plan was folded empty (PropagateEmptyRelation)
                    # reports a ZERO-LENGTH row — that's a zero-sample scan
                    jrow = jopt.get()
                    if jrow.size() >= 2:
                        samples = int(jrow.get(0) or 0)
                        series = int(jrow.get(1) or 0)
            except Exception:
                # the probe uses private PySpark/JVM accessors
                # (Observation._jo + private[sql] getRowOrEmpty) that a
                # Spark upgrade or Spark Connect may remove — degrade to
                # the documented pruned-leaf zeros rather than failing
                # the query response at render time
                samples = series = 0
            g = out.setdefault(group, {
                "group": list(group), "timeSeriesScanned": 0,
                "dataBytesScanned": 0, "samplesScanned": 0,
                "resultBytes": 0, "cpuNanos": 0})
            g["timeSeriesScanned"] += series
            g["samplesScanned"] += samples
            g["dataBytesScanned"] += samples * SAMPLE_BYTES
        rows = list(out.values())
        if rows:                       # head-group convention for
            rows[0]["resultBytes"] = self.result_bytes      # query-level
            rows[0]["cpuNanos"] = self.cpu_nanos            # counters
        return rows


@dataclass(frozen=True)
class PerQueryLimits:
    """Soft warn thresholds (QueryContext.scala PerQueryLimits
    warnLimits analog). A warning field is populated only when its
    observed value exceeds the threshold — matching hasWarnings()
    semantics (a QueryWarnings full of zeros is 'no warnings')."""
    warn_time_series_scanned: int | None = None
    warn_samples_scanned_bytes: int | None = None
    warn_result_bytes: int | None = None
    # HARD limit, enforced BEFORE execution from a plan-time estimate
    # (PromQLEngine.enforce_plan_limits; ExecPlan.scala:214-226 /
    # QueryContext.scala:385-470 semantics): queries whose pruned leaf
    # scans are estimated to touch more series are rejected with a
    # 413-mapped QueryLimitException without running their full job.
    enforce_time_series_scanned: int | None = None


def warnings_response(stats_rows: list[dict],
                      limits: PerQueryLimits | None) -> dict:
    """QueryWarningsResponse shape (PromQueryResponse.scala:22-31),
    fields populated only past their warn limits."""
    w = {"execPlanSamples": 0, "execPlanLeafSamples": 0,
         "execPlanResultBytes": 0, "groupByCardinality": 0,
         "joinQueryCardinality": 0, "timeSeriesSamplesScannedBytes": 0,
         "timeSeriesScanned": 0, "rawScannedBytes": 0}
    if limits is None:
        return w
    ts = sum(r["timeSeriesScanned"] for r in stats_rows)
    sb = sum(r["dataBytesScanned"] for r in stats_rows)
    rb = sum(r["resultBytes"] for r in stats_rows)
    if limits.warn_time_series_scanned is not None and \
            ts > limits.warn_time_series_scanned:
        w["timeSeriesScanned"] = ts
    if limits.warn_samples_scanned_bytes is not None and \
            sb > limits.warn_samples_scanned_bytes:
        w["timeSeriesSamplesScannedBytes"] = sb
        w["rawScannedBytes"] = sb
    if limits.warn_result_bytes is not None and \
            rb > limits.warn_result_bytes:
        w["execPlanResultBytes"] = rb
    return w
