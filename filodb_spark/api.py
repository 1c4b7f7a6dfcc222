"""Prometheus HTTP API result shapes.

The reference renders QueryResult to Prometheus JSON
(prometheus/.../query/PrometheusModel.scala:1-256; routes
http/src/main/scala/filodb/http/PrometheusApiRoute.scala:49,68). These
helpers produce the same response dicts from engine result DataFrames —
the serving layer a REST front-end would return verbatim.
"""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import DataFrame


def _fmt(v: float) -> str:
    # Prometheus sample values are strings; integral floats render bare,
    # infinities as +Inf/-Inf (PrometheusModel value rendering)
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _hist_sampl(t_ms: int, hist) -> dict:
    """HistSampl (PromQueryResponse.scala:59; rendered by
    PrometheusModel.toHistResult:176-200): histogram sample as
    {timestamp, buckets: {le_string: cumulative_count}}, +Inf rendered
    Prometheus-style."""
    buckets = {}
    for le, v in zip(hist["les"], hist["values"]):
        key = "+Inf" if math.isinf(le) and le > 0 else _fmt(float(le))
        buckets[key] = v
    return {"timestamp": t_ms / 1000.0, "buckets": buckets}


def _hist_matrix_response(df: DataFrame) -> dict:
    series: dict = defaultdict(list)
    keys: dict = {}
    for row in df.collect():
        labels = dict(row["labels"] or {})
        if row["hist"] is None or not row["hist"]["les"]:
            continue            # empty histograms dropped (numBuckets>0)
        k = tuple(sorted(labels.items()))
        keys[k] = labels
        series[k].append(_hist_sampl(row["t"], row["hist"]))
    result = [{"metric": keys[k],
               "values": sorted(vs, key=lambda s: s["timestamp"])}
              for k, vs in series.items()]
    result.sort(key=lambda r: sorted(r["metric"].items()))
    return {"status": "success",
            "data": {"resultType": "matrix", "result": result}}


def to_matrix_response(df: DataFrame, histogram_map: bool = False) -> dict:
    """Range-query response: resultType=matrix. NaN points are dropped
    (stale/absent), empty series omitted.

    Histogram-schema results (hist struct column) are auto-converted to
    Prometheus bucket vectors — one series per bucket with an `le`
    label and a `_bucket` metric suffix — matching the reference route's
    default; `histogram_map=True` (the `histogramMap=true` query param)
    renders native HistSampl buckets maps instead
    (PrometheusApiRouteSpec.scala:146-193)."""
    if "hist" in df.columns:
        if histogram_map:
            return _hist_matrix_response(df)
        from filodb_spark.kernels.histogram import \
            hist_to_prom_bucket_vectors
        return to_matrix_response(hist_to_prom_bucket_vectors(df))
    series: dict = defaultdict(list)
    keys: dict = {}
    for row in df.collect():
        labels = dict(row["labels"] or {})
        v = row["value"]
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        k = tuple(sorted(labels.items()))
        keys[k] = labels
        series[k].append((row["t"] / 1000.0, _fmt(v)))
    result = [{"metric": keys[k], "values": sorted(vs)}
              for k, vs in series.items()]
    result.sort(key=lambda r: sorted(r["metric"].items()))
    return {"status": "success",
            "data": {"resultType": "matrix", "result": result}}


def to_vector_response(df: DataFrame, histogram_map: bool = False) -> dict:
    """Instant-query response: resultType=vector (single timestep).
    Histogram-schema results default to Prom bucket vectors like the
    matrix path; histogram_map=True renders one HistSampl per series
    (toHistResult InstantVector branch)."""
    if "hist" in df.columns and not histogram_map:
        from filodb_spark.kernels.histogram import \
            hist_to_prom_bucket_vectors
        return to_vector_response(hist_to_prom_bucket_vectors(df))
    if "hist" in df.columns:
        out = []
        for row in df.collect():
            if row["hist"] is None or not row["hist"]["les"]:
                continue
            out.append({"metric": dict(row["labels"] or {}),
                        "value": _hist_sampl(row["t"], row["hist"])})
        out.sort(key=lambda r: sorted(r["metric"].items()))
        return {"status": "success",
                "data": {"resultType": "vector", "result": out}}
    out = []
    for row in df.collect():
        v = row["value"]
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        out.append({"metric": dict(row["labels"] or {}),
                    "value": (row["t"] / 1000.0, _fmt(v))})
    out.sort(key=lambda r: sorted(r["metric"].items()))
    return {"status": "success",
            "data": {"resultType": "vector", "result": out}}


def _with_stats(run, render, limits):
    """Execute a query with a QueryStats collector attached and append
    queryStats / queryWarnings to the rendered response (SuccessResponse
    shape, PromQueryResponse.scala:10-14; stats rendered like
    PrometheusModel.toQueryStatistics / toQueryWarningsResponse)."""
    import json as _json
    import time as _time

    from filodb_spark.promql.stats import (QueryStatsCollector,
                                           warnings_response)
    col = QueryStatsCollector()
    t0 = _time.monotonic_ns()
    resp = render(run(col))          # render collects -> metrics land
    col.cpu_nanos = _time.monotonic_ns() - t0
    col.result_bytes = len(_json.dumps(resp["data"]).encode())
    rows = col.groups()
    resp["queryStats"] = rows
    resp["queryWarnings"] = warnings_response(rows, limits)
    return resp


def explain_response(df: DataFrame) -> dict:
    """ExplainPlanResponse shape (PromQueryResponse.scala:16-18;
    rendered by PrometheusModel.toPromExplainPlanResponse from
    ExecPlan.getPlan()). The reference prints its materialized ExecPlan
    tree; the Spark-first equivalent of that tree IS the Catalyst query
    execution — parsed/analyzed/optimized/physical — so debugInfo
    carries its full printout (the artifact you read to check pushdown
    and join strategy)."""
    lines = df._jdf.queryExecution().toString().splitlines()
    return {"status": "success", "debugInfo": lines}


def explain_range_api(engine, query: str, start_s: float, end_s: float,
                      step_s: float) -> dict:
    """GET /api/v1/query_range?explainOnly=true equivalent — plan the
    query, run nothing."""
    df = engine.query_range(query, int(start_s * 1000),
                            int(end_s * 1000), int(step_s * 1000))
    return explain_response(df)


def query_range_api(engine, query: str, start_s: float, end_s: float,
                    step_s: float, stats: bool = False,
                    limits=None, histogram_map: bool = False) -> dict:
    """GET /api/v1/query_range equivalent. stats=True appends
    queryStats/queryWarnings (reference returns them always; here
    opt-in so stat-less responses stay byte-stable). histogram_map
    mirrors the &histogramMap=true param (native buckets maps instead
    of the default Prom bucket-vector conversion)."""
    import functools
    args = (query, int(start_s * 1000), int(end_s * 1000),
            int(step_s * 1000))
    render_fn = functools.partial(to_matrix_response,
                                  histogram_map=histogram_map)
    if not stats:
        return render_fn(engine.query_range(*args))
    return _with_stats(
        lambda col: engine.query_range(*args, stats_collector=col),
        render_fn, limits)


def query_api(engine, query: str, time_s: float, stats: bool = False,
              limits=None, histogram_map: bool = False) -> dict:
    """GET /api/v1/query equivalent."""
    import functools
    render_fn = functools.partial(to_vector_response,
                                  histogram_map=histogram_map)
    if not stats:
        return render_fn(engine.query_instant(query, int(time_s * 1000)))
    return _with_stats(
        lambda col: engine.query_instant(query, int(time_s * 1000),
                                         stats_collector=col),
        render_fn, limits)
